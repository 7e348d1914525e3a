"""Persistent XLA compilation cache.

First compiles through this image's remote-TPU tunnel cost 1-10 minutes per
program; the persistent cache makes every DEVICE entry point (CLI, bench,
driver hooks) reuse executables across processes.

CPU processes get NO persistent cache.  Measured on this image (round 5,
two-process probe): XLA:CPU AOT entries embed compile-time tuning
pseudo-features (``+prefer-no-gather``, ``+prefer-no-scatter``) that host
feature detection never reports, so EVERY cross-process load — same host,
same jaxlib, entries written seconds earlier — trips the
``cpu_aot_loader.cc`` feature check ("could lead to execution errors such
as SIGILL").  A persistent CPU cache can therefore only ever be loaded
*through* that warning; within one process the in-memory executable cache
already deduplicates.  ``enable_persistent_cache`` resolves the process's
PRIMARY platform and simply skips cache setup on CPU (pytest's virtual
mesh, the driver's dryrun children run uncached); device processes keep
the shared ``.jax_cache``.  The host-fingerprint/marker helpers remain for
the dryrun's handling of driver-inherited cache dirs.
"""

from __future__ import annotations

import hashlib
import os

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def host_fingerprint() -> str:
    """Short stable id for THIS host's CPU generation.  CPU XLA executables
    embed machine features (AVX level etc.); sharing a cache dir across
    machine generations trips the AOT feature check and risks SIGILL."""
    try:
        with open("/proc/cpuinfo") as f:
            lines = {ln for ln in f.read().splitlines()
                     if ln.startswith(("model name", "flags"))}
        blob = "\n".join(sorted(lines))
    except OSError:
        import platform

        blob = platform.machine() + platform.processor()
    return hashlib.sha1(blob.encode()).hexdigest()[:10]


def _effective_platform() -> str:
    """The PRIMARY platform this process will compile for, WITHOUT
    initializing a backend (a probe that opened a TPU client would violate
    the one-TPU-process rule while another run is live).  jax.config wins
    over the env var because this image's sitecustomize plugin forces
    ``axon`` over JAX_PLATFORMS — processes that really run CPU (tests,
    dryrun children) set jax.config.update("jax_platforms", "cpu") after
    import.  jax_platforms is a priority LIST: this image's plugin sets
    ``"axon,cpu"`` (TPU with CPU fallback), and only the first entry is
    what the process compiles for — a substring test on the whole list
    would misroute every TPU run into the CPU cache dir."""
    try:
        import jax

        cfg = jax.config.jax_platforms
    except Exception:
        cfg = None
    platforms = str(cfg or os.environ.get("JAX_PLATFORMS") or "")
    return platforms.split(",")[0].strip()


def resolve_cache_dir(root: str | None = None) -> str:
    """Default cache dir for this process: platform-split under ``root``
    (the repo dir unless overridden for tests)."""
    root = root or _REPO_DIR
    if _effective_platform() == "cpu":
        # name retained for explicit callers/diagnostics; the default
        # enable path never uses it (CPU runs uncached — module docstring)
        return os.path.join(root, f".jax_cache_cpu-{host_fingerprint()}")
    return os.path.join(root, ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    # process-level host setup rides along: glibc arena tuning for the
    # lazy-memory VM (utils/hostmem.py — 600x on first-touch-bound stacks)
    from .hostmem import warm_heap

    warm_heap()
    import jax

    explicit = cache_dir or os.environ.get("MMCT_JAX_CACHE")
    try:
        if explicit:
            # user/driver-owned dir: honored verbatim, never purged (it may
            # hold TPU entries with 1-10-minute compile costs)
            cache_dir = explicit
            os.makedirs(cache_dir, exist_ok=True)
        else:
            if _effective_platform() == "cpu":
                # no persistent cache on CPU: every cross-process AOT load
                # trips the feature check on this image (module docstring)
                return
            cache_dir = resolve_cache_dir()
            os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # cache is an optimization, never fatal
        print(f"[cache] persistent compilation cache disabled: {exc}")
