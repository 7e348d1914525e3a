#!/usr/bin/env bash
# Multi-seed sweep — equivalent of the reference's enrico/run_parallel.sh /
# mimic/run_parallel.sh (S background OS jobs), but the S seeds train
# SIMULTANEOUSLY in one vmapped XLA program on one chip.
#
# Usage: scripts/run_parallel.sh <dataset> <num_seeds> [base_seed]
set -euo pipefail
DATASET="${1:?usage: run_parallel.sh <dataset> <num_seeds> [base_seed]}"
NUM_SEEDS="${2:?num_seeds required}"
BASE_SEED="${3:-0}"
exec python main.py --dir "$DATASET" --seed "$BASE_SEED" --set "num_seeds=$NUM_SEEDS"
