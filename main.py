"""CLI entry point: ``python main.py --dir <dataset>``.

Byte-compatible with the reference CLI (main.py:1-19) but dispatches through
the benchmark registry instead of hand-written if/elif imports, and supports
all nine benchmarks (the reference wires only cremad/food101/enrico/mimic).
Extra flags: ``--seed N`` and repeatable ``--set key=value`` config
overrides.
"""

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from multimodal_clinical_tpu.benchmarks import get_benchmark
from multimodal_clinical_tpu.config import setup_configs
from multimodal_clinical_tpu.engine.run import run_benchmark


def run_training(argv=None):
    args = setup_configs(argv)
    # multi-host bring-up (no-op unless dist_* config keys are set):
    # after this, build_loaders shards the input stream per host
    from multimodal_clinical_tpu.parallel.distributed import (
        initialize_if_requested,
    )

    initialize_if_requested(args)
    benchmark = get_benchmark(args.dir)
    num_seeds = int(getattr(args, "num_seeds", 1) or 1)
    if num_seeds > 1:
        # vmapped S-seed sweep in one XLA program (the reference forks S
        # OS processes, enrico/run_parallel.sh)
        from multimodal_clinical_tpu.engine.multiseed import run_multiseed

        seeds = list(range(int(args.seed), int(args.seed) + num_seeds))
        summary = run_multiseed(args, benchmark, seeds)
    else:
        # --set profile_dir=/path captures a jax.profiler trace of epoch 1
        summary = run_benchmark(args, benchmark,
                                profile_dir=getattr(args, "profile_dir",
                                                    None))
    print({k: round(v, 4) for k, v in summary.items()})
    return summary


if __name__ == "__main__":
    run_training()
