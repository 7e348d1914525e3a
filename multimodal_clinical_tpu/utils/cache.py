"""Persistent XLA compilation cache.

First compiles through this image's remote-TPU tunnel cost 1-10 minutes per
program; the persistent cache makes every entry point (CLI, bench, driver
hooks) reuse executables across processes.

CPU and TPU executables must never share a cache dir: XLA:CPU AOT entries
embed host machine features (AVX level, compile-time tuning pseudo-features
like +prefer-no-gather) that the loader checks against the running host —
loading through the "could lead to SIGILL" warning is a latent crash.
``enable_persistent_cache`` therefore resolves the directory by the
process's effective platform: CPU processes (pytest's virtual mesh, the
driver's dryrun children) get a host-fingerprinted ``.jax_cache_cpu-<fp>``
dir that self-purges when its marker (fingerprint + jaxlib version) no
longer matches; device processes keep the shared ``.jax_cache``.
"""

from __future__ import annotations

import hashlib
import os
import shutil

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_MARKER = "HOST_MARKER"


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


def _marker_text() -> str:
    import jaxlib

    return f"{host_fingerprint()}:jaxlib-{getattr(jaxlib, '__version__', '?')}"


def _purge_on_marker_mismatch(cache_dir: str, marker_text: str) -> bool:
    """Create/validate ``cache_dir``'s host marker.  On mismatch the dir is
    purged and re-created (returns True): its AOT entries were produced by
    a different host generation or jaxlib and the loader would either
    reject them per-entry (stderr noise) or load through the feature
    warning (SIGILL risk).  Only called on dirs this module names itself —
    never on a user-provided MMCT_JAX_CACHE."""
    marker_path = os.path.join(cache_dir, _MARKER)
    purged = False
    if os.path.isdir(cache_dir):
        try:
            with open(marker_path) as f:
                ok = f.read().strip() == marker_text
        except OSError:
            # no marker: a pre-marker-era dir — treat as unknown provenance
            ok = not os.listdir(cache_dir)
        if not ok:
            print(f"[cache] host/jaxlib marker mismatch — purging {cache_dir}")
            shutil.rmtree(cache_dir, ignore_errors=True)
            purged = True
    os.makedirs(cache_dir, exist_ok=True)
    if not os.path.exists(marker_path):
        with open(marker_path, "w") as f:
            f.write(marker_text)
    return purged


def resolve_cache_dir(root: str | None = None) -> str:
    """Default cache dir for this process: platform-split under ``root``
    (the repo dir unless overridden for tests)."""
    root = root or _REPO_DIR
    if _effective_platform() == "cpu":
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
            cache_dir = resolve_cache_dir()
            if cache_dir.rpartition(os.sep)[2].startswith(".jax_cache_cpu-"):
                _purge_on_marker_mismatch(cache_dir, _marker_text())
            else:
                os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # cache is an optimization, never fatal
        print(f"[cache] persistent compilation cache disabled: {exc}")
