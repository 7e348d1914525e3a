"""Per-compile XLA options for the hot train/eval steps.

Swept empirically on the VGGSound train step (tools/flag_sweep.py, v5e):
raising the scoped-VMEM budget from the default to 64 MiB speeds the step
~4% (158.1 -> 152.1 ms; 1417 -> 1473 samples/s) by letting larger conv+
BN-stats fusions keep their buffers on-chip.  96/128 MiB measured slightly
worse; everything else swept (rwb_fusion, lp_llo_scheduler, nested loop
fusion, scavenging, fusion cost model) was neutral or regressed.

TPU-only flags can't ride XLA_FLAGS here (the client-side parser dies on
unknown flags before the axon tunnel forwards them); ``jax.jit``'s
proto-backed ``compiler_options`` is forwarded per-compile and works.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

_TPU_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def tpu_compiler_options() -> Optional[Dict[str, str]]:
    """Options dict for jax.jit(compiler_options=...) — None off-TPU
    (the CPU/GPU compilers reject TPU-only option names)."""
    try:
        if jax.default_backend() == "tpu":
            return dict(_TPU_OPTIONS)
    except Exception:
        pass
    return None
