"""Persistent XLA compilation cache.

First compiles through this image's remote-TPU tunnel cost 1-10 minutes per
program; the persistent cache makes every entry point (CLI, bench, driver
hooks) reuse executables across processes.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    # process-level host setup rides along: glibc arena tuning for the
    # lazy-memory VM (utils/hostmem.py — 600x on first-touch-bound stacks)
    from .hostmem import warm_heap

    warm_heap()
    import jax

    cache_dir = cache_dir or os.environ.get(
        "MMCT_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # cache is an optimization, never fatal
        print(f"[cache] persistent compilation cache disabled: {exc}")
