"""Compile-cache hygiene beyond the dryrun (VERDICT r4 missing #2 / weak #2).

CPU AOT executables embed host machine features; loading entries compiled by
another host generation or jaxlib emits cpu_aot_loader "could lead to SIGILL"
warnings and risks a real SIGILL.  utils/cache.py therefore (a) splits the
cache dir by platform (tests/dryruns use `.jax_cache_cpu-<fp>`, device
processes keep `.jax_cache`), (b) self-purges the CPU dir on a host/jaxlib
marker mismatch, and (c) is never invoked at tool IMPORT time — importing
tools/*.py from a test must not repoint the session's cache.
"""

import ast
import glob
import os

import jax

from multimodal_clinical_tpu.utils import cache as cache_mod


def test_resolve_cache_dir_is_platform_split(tmp_path):
    """Under the pytest CPU platform, the default dir is the fingerprinted
    CPU dir; a TPU-looking platform resolves to the shared .jax_cache."""
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
    into the CPU dir, where marker churn purged 1-10-minute TPU compiles
    (observed live in round 5)."""
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


def test_dryrun_purge_leaves_a_valid_marker(tmp_path):
    """__graft_entry__'s feature-mismatch purge rmtree's its own CPU dir —
    marker included — and its child recreates the dir WITHOUT a marker
    (explicit MMCT_JAX_CACHE dirs are honored verbatim).  The parent must
    re-mark the dir after purging, or the next marker-checking process
    treats the fresh entries as unknown provenance and purges them again
    (cache thrash between the dryrun and every other entry point)."""
    import __graft_entry__ as graft

    d = tmp_path / ".jax_cache_cpu-fp"
    d.mkdir()
    (d / "entry.bin").write_bytes(b"x")
    (d / cache_mod._MARKER).write_text(cache_mod._marker_text())

    # simulate the dryrun's purge path: rmtree + re-mark
    import shutil

    shutil.rmtree(d)
    graft._remark_cpu_cache(str(d))
    marker = d / cache_mod._MARKER
    assert marker.read_text() == cache_mod._marker_text()
    # the child then compiles fresh entries into the marked dir ...
    (d / "fresh.bin").write_bytes(b"compiled by child")
    # ... and the next marker-checking process must NOT purge them
    assert not cache_mod._purge_on_marker_mismatch(
        str(d), cache_mod._marker_text())
    assert (d / "fresh.bin").exists()

    # the pre-child validation purges a stale-marker dir instead of
    # laundering it under a fresh marker
    (d / cache_mod._MARKER).write_text("otherhost:jaxlib-0")
    assert graft._validate_cache_marker(str(d), cache_mod._marker_text())
    assert not (d / "fresh.bin").exists()
    assert marker.read_text() == cache_mod._marker_text()


def test_marker_mismatch_purges_planted_entry(tmp_path):
    """Plant a cache entry under a stale marker: the resolver must purge
    the dir (the entry is another host generation's AOT executable) and
    write the current marker.  A matching marker must preserve entries."""
    d = tmp_path / ".jax_cache_cpu-fp"
    d.mkdir()
    (d / "stale_executable.bin").write_bytes(b"compiled elsewhere")
    (d / cache_mod._MARKER).write_text("otherhost:jaxlib-0.0.1")

    purged = cache_mod._purge_on_marker_mismatch(str(d), "thishost:jaxlib-9")
    assert purged
    assert not (d / "stale_executable.bin").exists()
    assert (d / cache_mod._MARKER).read_text() == "thishost:jaxlib-9"

    (d / "fresh.bin").write_bytes(b"compiled here")
    purged = cache_mod._purge_on_marker_mismatch(str(d), "thishost:jaxlib-9")
    assert not purged
    assert (d / "fresh.bin").exists()


def test_premarker_dir_with_entries_is_purged(tmp_path):
    """A non-empty dir with NO marker predates the marker scheme — unknown
    provenance, purge; an empty markerless dir is simply adopted."""
    d = tmp_path / "cache"
    d.mkdir()
    (d / "old.bin").write_bytes(b"?")
    assert cache_mod._purge_on_marker_mismatch(str(d), "m")
    assert not (d / "old.bin").exists()

    e = tmp_path / "empty"
    e.mkdir()
    assert not cache_mod._purge_on_marker_mismatch(str(e), "m")


def test_explicit_cache_dir_is_never_purged(tmp_path, monkeypatch):
    """A user/driver-provided MMCT_JAX_CACHE may hold TPU entries with
    1-10-minute compile costs — enable_persistent_cache must honor it
    verbatim and never delete anything in it."""
    d = tmp_path / "shared"
    d.mkdir()
    (d / "tpu_entry.bin").write_bytes(b"expensive")
    monkeypatch.setenv("MMCT_JAX_CACHE", str(d))
    before = jax.config.jax_compilation_cache_dir
    try:
        cache_mod.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir == str(d)
        assert (d / "tpu_entry.bin").exists()
        assert not (d / cache_mod._MARKER).exists()
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


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


def test_session_cache_dir_is_the_fingerprinted_cpu_dir():
    """conftest.py enabled the persistent cache for this session; it must
    point at the host-fingerprinted CPU dir with a current marker, so zero
    cpu_aot_loader feature warnings can occur."""
    d = str(jax.config.jax_compilation_cache_dir)
    assert os.path.basename(d) == (
        f".jax_cache_cpu-{cache_mod.host_fingerprint()}")
    marker = os.path.join(d, cache_mod._MARKER)
    assert open(marker).read().strip() == cache_mod._marker_text()
