"""Overlapping max-pool (3x3/stride-2/pad-1) with a fast backward.

XLA differentiates ``reduce_window`` max-pools into ``select-and-scatter``,
which costs 9.1 ms/step on the profiled VGGSound train step (the two
ResNet stems' pools are the only overlapping pools in the suite).  This
custom-vjp version keeps the fast ``reduce_window`` forward and replaces
the backward with a parity-decomposed gather formulation built purely from
strided slices, compares, and interleaves — all fusable elementwise XLA.

Semantics match select-and-scatter / torch MaxPool2d exactly: the gradient
routes to the FIRST maximal element in each window (row-major window scan
order), implemented with a priority chain over the 9 taps.  bf16 equality
against the pooled maximum is exact because the forward max returns one of
its inputs bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_NEG = float("-inf")


def _fwd_pool(x):
    return nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)])


@jax.custom_vjp
def max_pool_3x3_s2(x):
    """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), C), window 3, stride 2,
    SAME-style padding 1 (the torch ``MaxPool2d(3, 2, 1)`` geometry used by
    the reference ResNet stem, cremad/backbone.py:76)."""
    return _fwd_pool(x)


def _mp_fwd(x):
    y = _fwd_pool(x)
    return y, (x, y)


def _mp_bwd(res, dy):
    x, y = res
    b, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=_NEG)
    dy32 = dy

    # per-tap routed gradients with first-argmax priority (row-major taps)
    taken = jnp.zeros(y.shape, bool)
    routed = {}
    for a in range(3):
        for bb in range(3):
            xs = jax.lax.slice(
                xp, (0, a, bb, 0),
                (b, a + 2 * ho - 1, bb + 2 * wo - 1, c),
                (1, 2, 2, 1))
            is_max = xs == y
            first = jnp.logical_and(is_max, jnp.logical_not(taken))
            taken = jnp.logical_or(taken, is_max)
            routed[(a, bb)] = jnp.where(first, dy32, 0)

    # scatter-by-parity: contribution of tap (a, b) lands at padded input
    # position (2i + a, 2j + b).  For each parity class the taps are
    # disjoint dilated grids, so the scatter becomes shifted adds followed
    # by a 2x2 interleave.
    oh, ow = ho + 1, wo + 1

    def pad_to(t, di, dj):
        """place t at (i + di, j + dj) inside an (oh, ow) canvas."""
        return jnp.pad(t, ((0, 0), (di, oh - ho - di), (dj, ow - wo - dj),
                           (0, 0)))

    def comb(taps_i, taps_j):
        """sum taps for one parity: a in taps_i, b in taps_j.
        u = 2i + a: a = p -> offset 0; a = p + 2 -> offset 1 (i shifted)."""
        acc = jnp.zeros((b, oh, ow, c), dy.dtype)
        for a in taps_i:
            for bb in taps_j:
                di = 1 if a >= 2 else 0
                dj = 1 if bb >= 2 else 0
                acc = acc + pad_to(routed[(a, bb)], di, dj)
        return acc

    ee = comb((0, 2), (0, 2))   # u even, v even
    eo = comb((0, 2), (1,))     # u even, v odd
    oe = comb((1,), (0, 2))
    oo = comb((1,), (1,))

    # interleave parities into the padded-input canvas (2*oh, 2*ow)
    even_rows = jnp.stack([ee, eo], axis=3).reshape(b, oh, 2 * ow, c)
    odd_rows = jnp.stack([oe, oo], axis=3).reshape(b, oh, 2 * ow, c)
    dxp = jnp.stack([even_rows, odd_rows], axis=2).reshape(
        b, 2 * oh, 2 * ow, c)
    dx = dxp[:, 1:h + 1, 1:w + 1, :]
    return (dx,)


max_pool_3x3_s2.defvjp(_mp_fwd, _mp_bwd)
