"""Pallas TPU max-pool (3x3 / stride-2 / pad-1) with stored-index backward.

XLA differentiates ``reduce_window`` max-pools into ``select-and-scatter``,
which re-scans the *input* feature map to rediscover each window's argmax:
on the profiled VGGSound train step that is 9.1 ms against a ~5.6 ms
traffic floor (ROADMAP.md).  This version changes the algorithm instead of
the schedule:

  * forward: one Pallas kernel produces the pooled maximum AND a per-window
    tap index (0..8, row-major scan order, FIRST maximal element — the same
    routing as torch ``MaxPool2d`` / XLA select-and-scatter).  The index is
    stored in the FEATURE dtype (bf16/f32 — 0..8 are exact; Mosaic has no
    efficient int8 vector stores), so the idx array costs the same bytes as
    ``y``, not 1 byte/element.
  * backward: a second kernel routes ``dy`` by the stored index.  Its HBM
    traffic is ``write dx + read dy + read idx`` (idx at feature-dtype
    width) vs select-and-scatter's re-read of the full-resolution input.

MEASURED (v5e, tools/microbench_pool_iso.py / microbench_maxpool.py): the
backward wins in isolation (visual 8.7 vs 10.4 ms, audio 4.4 vs 4.9) but
the forward+index pass loses 7.0 vs 3.0 ms — Mosaic lacks bf16 vector
compares (the f32 interior doubles VPU work), tap extraction lowers to
VMEM copies, and the index array adds ~0.7 GB of writes.  Net in-context
NEGATIVE (-1.3/-1.5 ms per pass), so the default stays ``pool_kernel=
"xla"``; this op is kept as tested, flag-gated infrastructure and as the
reference implementation of the (H, W, C, N) bitcast + halo-edge-ref
kernel pattern.

Layout: both kernels run over ``(H, W, C, N)`` views.  XLA keeps conv
feature maps batch-minor (physical layout {0,3,2,1}), so the
``jnp.transpose(x, (1, 2, 3, 0))`` into the kernel and the transpose back
are BITCASTS (measured relayout-free, tools/probe_pallas_layout.py) — the
custom call pays only its own VMEM traffic.  N is the lane dimension
(896 = 7x128 on the bench), C the sublane dimension (64).

Halos: a window row/column straddles pooled-block boundaries by at most one
element, so each kernel takes the same operand four times with shifted
index maps (main block + one-row / one-column / corner edge blocks) and
assembles the extended tile in VMEM scratch — no overlapping BlockSpecs,
no manual DMA.  Out-of-range rows are masked with -inf (forward) or zero
contribution (backward).

Semantics match the reference stems' ``MaxPool2d(3, 2, 1)``
(cremad/backbone.py:76): gradient routes to the first maximal element per
window; bf16 equality against the running max is exact because max returns
one of its inputs bit-for-bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


import os

_BI = int(os.environ.get("MMCT_POOL_BI", "4"))
_BJ = int(os.environ.get("MMCT_POOL_BJ", "4"))
_NB = int(os.environ.get("MMCT_POOL_NB", "128"))


def _block_sizes(ho: int, wo: int, n: int):
    return min(_BI, ho), min(_BJ, wo), min(_NB, n)


# ---------------------------------------------------------------- forward


def _fwd_kernel(h, w, bi, bj, x_m, x_t, x_l, x_c, y_ref, idx_ref, ext):
    # ext is (2bi+2, 2bj+2, C, Nb); the final row/column stay uninitialised
    # garbage — they only ever land in the discarded parity half of the
    # reshape-based tap extraction below (Mosaic has no strided vector
    # slices, so stride-2 taps are a major-dim reshape + unit slice).
    i = pl.program_id(0)
    j = pl.program_id(1)
    ext[0:1, 0:1] = x_c[...]
    ext[0:1, 1:2 * bj + 1] = x_t[...]
    ext[1:2 * bi + 1, 0:1] = x_l[...]
    ext[1:2 * bi + 1, 1:2 * bj + 1] = x_m[...]
    # all in-kernel compute runs in f32 (exact for bf16 inputs): v5e
    # Mosaic has no bf16 vector compares, and i1 masks cannot relayout
    # between the f32 (8, 128) and bf16 (16, 128) tilings.
    e = ext[...].astype(jnp.float32)
    rows = (2 * bi * i - 1) + jax.lax.broadcasted_iota(
        jnp.int32, (2 * bi + 2, 1, 1, 1), 0)
    cols = (2 * bj * j - 1) + jax.lax.broadcasted_iota(
        jnp.int32, (1, 2 * bj + 2, 1, 1), 1)
    valid = ((rows >= 0) & (rows < h)) & ((cols >= 0) & (cols < w))
    valid = jnp.broadcast_to(valid, e.shape)
    e = jnp.where(valid, e, jnp.float32(float("-inf")))

    c, nb = e.shape[2], e.shape[3]

    def tap(a, b):
        t = jax.lax.slice(e, (a, b, 0, 0), (a + 2 * bi, b + 2 * bj, c, nb))
        t = t.reshape(bi, 2, 2 * bj, c, nb)
        t = jax.lax.slice(t, (0, 0, 0, 0, 0), (bi, 1, 2 * bj, c, nb))
        t = t.reshape(bi, bj, 2, c, nb)
        t = jax.lax.slice(t, (0, 0, 0, 0, 0), (bi, bj, 1, c, nb))
        return t.reshape(bi, bj, c, nb)

    # the tap index is stored in the FEATURE dtype (0..8 are exact in
    # bf16), keeping every HBM array at one tiling.
    y = tap(0, 0)
    idx = jnp.zeros(y.shape, jnp.float32)
    t = 0
    for a in range(3):
        for b in range(3):
            if t:
                v = tap(a, b)
                better = v > y
                y = jnp.maximum(y, v)
                idx = jnp.where(better, jnp.float32(t), idx)
            t += 1
    y_ref[...] = y.astype(y_ref.dtype)
    idx_ref[...] = idx.astype(idx_ref.dtype)


def _pool_fwd_pallas(xt: jnp.ndarray):
    """xt: (H, W, C, N) -> (y, idx) in (Ho, Wo, C, N)."""
    h, w, c, n = xt.shape
    ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    bi, bj, nb = _block_sizes(ho, wo, n)
    grid = (pl.cdiv(ho, bi), pl.cdiv(wo, bj), pl.cdiv(n, nb))

    def at(i, j, nn_):
        return (i, j, 0, nn_)

    in_specs = [
        pl.BlockSpec((2 * bi, 2 * bj, c, nb), at, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * bj, c, nb),
                     lambda i, j, nn_: (jnp.maximum(2 * bi * i - 1, 0), j,
                                        0, nn_),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * bi, 1, c, nb),
                     lambda i, j, nn_: (i, jnp.maximum(2 * bj * j - 1, 0),
                                        0, nn_),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c, nb),
                     lambda i, j, nn_: (jnp.maximum(2 * bi * i - 1, 0),
                                        jnp.maximum(2 * bj * j - 1, 0),
                                        0, nn_),
                     memory_space=pltpu.VMEM),
    ]
    y, idx = pl.pallas_call(
        partial(_fwd_kernel, h, w, bi, bj),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bi, bj, c, nb), at, memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, bj, c, nb), at, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ho, wo, c, n), xt.dtype),
            jax.ShapeDtypeStruct((ho, wo, c, n), xt.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * bi + 2, 2 * bj + 2, c, nb), xt.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xt, xt, xt, xt)
    return y, idx


# --------------------------------------------------------------- backward


def _bwd_kernel(ho, wo, bi, bj, dy_m, dy_b, dy_r, dy_c,
                ix_m, ix_b, ix_r, ix_c, dx_ref, edy, eix):
    i = pl.program_id(0)
    j = pl.program_id(1)
    edy[0:bi, 0:bj] = dy_m[...]
    edy[bi:, 0:bj] = dy_b[...]
    edy[0:bi, bj:] = dy_r[...]
    edy[bi:, bj:] = dy_c[...]
    eix[0:bi, 0:bj] = ix_m[...]
    eix[bi:, 0:bj] = ix_b[...]
    eix[0:bi, bj:] = ix_r[...]
    eix[bi:, bj:] = ix_c[...]
    rows = bi * i + jax.lax.broadcasted_iota(jnp.int32, (bi + 1, 1, 1, 1), 0)
    cols = bj * j + jax.lax.broadcasted_iota(jnp.int32, (1, bj + 1, 1, 1), 1)
    valid = (rows < ho) & (cols < wo)
    # f32 interior for the same Mosaic tiling reasons as the forward
    d32 = edy[...].astype(jnp.float32)
    valid = jnp.broadcast_to(valid, d32.shape)
    d = jnp.where(valid, d32, jnp.float32(0))
    ix = eix[...].astype(jnp.float32)
    c, nb = d.shape[2], d.shape[3]

    def tap(t, r0, c0):
        """Routed contribution of tap ``t`` from windows at offset
        (r0, c0) within the extended tile."""
        dv = jax.lax.slice(d, (r0, c0, 0, 0), (r0 + bi, c0 + bj, c, nb))
        iv = jax.lax.slice(ix, (r0, c0, 0, 0), (r0 + bi, c0 + bj, c, nb))
        return jnp.where(iv == jnp.float32(t), dv, jnp.float32(0))

    # dx[2r+p, 2s+q]: parity (p, q) decides which window taps contribute
    # (t = 3a + b; window (r, s) covers input row 2r + a - 1).
    ee = tap(4, 0, 0)
    eo = tap(5, 0, 0) + tap(3, 0, 1)
    oe = tap(7, 0, 0) + tap(1, 1, 0)
    oo = tap(8, 0, 0) + tap(6, 0, 1) + tap(2, 1, 0) + tap(0, 1, 1)
    even = jnp.stack([ee, eo], axis=2).reshape(bi, 2 * bj, c, nb)
    odd = jnp.stack([oe, oo], axis=2).reshape(bi, 2 * bj, c, nb)
    dx_ref[...] = jnp.stack([even, odd], axis=1).reshape(
        2 * bi, 2 * bj, c, nb).astype(dx_ref.dtype)


def _pool_bwd_pallas(dyt: jnp.ndarray, idxt: jnp.ndarray, h: int, w: int):
    """dyt/idxt: (Ho, Wo, C, N) -> dx (H, W, C, N)."""
    ho, wo, c, n = dyt.shape
    bi, bj, nb = _block_sizes(ho, wo, n)
    grid = (pl.cdiv(ho, bi), pl.cdiv(wo, bj), pl.cdiv(n, nb))

    def main(i, j, nn_):
        return (i, j, 0, nn_)

    def bot(i, j, nn_):
        return (jnp.minimum(bi * (i + 1), ho - 1), j, 0, nn_)

    def right(i, j, nn_):
        return (i, jnp.minimum(bj * (j + 1), wo - 1), 0, nn_)

    def corner(i, j, nn_):
        return (jnp.minimum(bi * (i + 1), ho - 1),
                jnp.minimum(bj * (j + 1), wo - 1), 0, nn_)

    def specs():
        return [
            pl.BlockSpec((bi, bj, c, nb), main, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bj, c, nb), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, 1, c, nb), right, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, nb), corner, memory_space=pltpu.VMEM),
        ]

    dx = pl.pallas_call(
        partial(_bwd_kernel, ho, wo, bi, bj),
        grid=grid,
        in_specs=specs() + specs(),
        out_specs=pl.BlockSpec((2 * bi, 2 * bj, c, nb), main,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, c, n), dyt.dtype),
        scratch_shapes=[
            pltpu.VMEM((bi + 1, bj + 1, c, nb), dyt.dtype),
            pltpu.VMEM((bi + 1, bj + 1, c, nb), idxt.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(dyt, dyt, dyt, dyt, idxt, idxt, idxt, idxt)
    return dx


# ------------------------------------------------------------- public op


@jax.custom_vjp
def max_pool_3x3_s2_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), C) max pool, window 3,
    stride 2, pad 1 — the reference stems' ``MaxPool2d(3, 2, 1)``
    (cremad/backbone.py:76).  The undifferentiated primal stays on XLA's
    ``reduce_window`` (no index array needed for inference); training
    forward/backward run the Pallas kernels above."""
    return nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)])


def _mp_fwd(x):
    xt = jnp.transpose(x, (1, 2, 3, 0))
    y, idx = _pool_fwd_pallas(xt)
    return jnp.transpose(y, (3, 0, 1, 2)), (idx, x.shape[1], x.shape[2])


def _mp_bwd(res, dy):
    idx, h, w = res
    dyt = jnp.transpose(dy, (1, 2, 3, 0))
    dxt = _pool_bwd_pallas(dyt, idx, h, w)
    return (jnp.transpose(dxt, (3, 0, 1, 2)),)


max_pool_3x3_s2_pallas.defvjp(_mp_fwd, _mp_bwd)
