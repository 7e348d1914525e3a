"""Fused training-mode BatchNorm with Pallas channel-reduction kernels.

Why: the profiled VGGSound train step (ROADMAP.md) spends ~32 ms/step in
XLA's ``convert_reduce_fusion`` BN-statistics passes — each running at
<20% of HBM bandwidth because the bf16->f32 convert + multi-stage channel
reduction vectorizes poorly at C=64.  The Pallas kernels here stream the
feature map once at near-DMA bandwidth, accumulating f32 per-channel
sums in VMEM.  The elementwise normalize/apply and the dx formula stay in
plain jnp so XLA keeps fusing them into neighboring convs.

Math (reference: torch BatchNorm2d semantics, used by the scratch ResNet
at cremad/backbone.py:16-55 via nn.BatchNorm2d defaults):

    mean = sum(x) / M            (reduce over all but the channel axis)
    var  = sumsq / M - mean^2    (biased, used for normalization)
    y    = (x - mean) * rsqrt(var + eps) * gamma + beta

    dbeta  = sum(dy)
    dgamma = sum(dy * xhat)
    dx     = gamma * rstd * (dy - dbeta / M - xhat * dgamma / M)

Lane packing: for C < 128 (128 % C == 0) the (M, C) view is reinterpreted
as (M * C / 128, 128) so the VPU reduces with full lanes; the (128,) partial
sums fold back to (C,) outside the kernel (channel c = sum of lanes
c, c + C, ...).  This is exact — same additions, different order.

Sharding note: the pure-jnp path (CPU, and any tracing where Pallas is
unavailable) partitions under GSPMD like any reduction (sync-BN over the
mesh batch axis).  The Pallas path is used on single-chip TPU hot loops;
under pjit GSPMD would replicate its operand, so multi-chip training on
real TPU should flip ``use_pallas=False`` until a shard_map wrapper lands.

The custom_vjp treats the ``mean``/``var`` outputs as stop-gradient (they
feed only the running-statistics update, which Flax keeps out of autodiff;
torch does the same with ``running_mean``/``running_var``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8
# Block-size targets are set by the ~16 MB VMEM budget: Mosaic keeps the
# kernel's f32 temporaries (converts, squares/products) live on the stack,
# ~4x the bf16 block per input, on top of the double-buffered input blocks.
_FWD_BLOCK_BYTES = 1 << 20   # 1 input  -> ~2 MB buffers + ~4 MB temps
_BWD_BLOCK_BYTES = 512 << 10  # 2 inputs -> ~2 MB buffers + ~4 MB temps


def _block_rows(m: int, c: int, itemsize: int,
                target: int = _FWD_BLOCK_BYTES) -> int:
    r = target // (c * itemsize)
    r = max(_SUBLANES, (r // _SUBLANES) * _SUBLANES)
    return min(r, ((m + _SUBLANES - 1) // _SUBLANES) * _SUBLANES)


def _pack_lanes(x2d: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """(M, C) -> (M*C/128, 128) view when exact; returns (packed, fold)."""
    m, c = x2d.shape
    if c < _LANES and _LANES % c == 0 and (m * c) % _LANES == 0:
        fold = _LANES // c
        return x2d.reshape(m * c // _LANES, _LANES), fold
    return x2d, 1


def _fold_channels(v128: jnp.ndarray, c: int, fold: int) -> jnp.ndarray:
    """(128,) lane sums -> (C,) channel sums (lane l holds channel l % C)."""
    if fold == 1:
        return v128
    return v128.reshape(fold, c).sum(axis=0)


# ---------------------------------------------------------------------------
# kernel 1: per-channel sum / sum-of-squares in one pass
# ---------------------------------------------------------------------------

def _sums_kernel(x_ref, out_ref, *, m_total, rows):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    if m_total % rows:
        base = i * rows
        ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + base
        x = jnp.where(ids < m_total, x, 0.0)
    s = jnp.sum(x, axis=0, keepdims=True)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    part = jnp.concatenate([s, s2], axis=0)  # (2, C)

    @pl.when(i == 0)
    def _():
        out_ref[:] = part

    @pl.when(i > 0)
    def _():
        out_ref[:] = out_ref[:] + part


def _channel_sums_pallas(x2d: jnp.ndarray, interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    c_orig = x2d.shape[1]
    xp, fold = _pack_lanes(x2d)
    m, c = xp.shape
    rows = _block_rows(m, c, xp.dtype.itemsize)
    grid = pl.cdiv(m, rows)
    out = pl.pallas_call(
        partial(_sums_kernel, m_total=m, rows=rows),
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=interpret,
    )(xp)
    return (_fold_channels(out[0], c_orig, fold),
            _fold_channels(out[1], c_orig, fold))


# ---------------------------------------------------------------------------
# kernel 2: backward reductions sum(dy), sum(dy * xhat) in one pass
# ---------------------------------------------------------------------------

def _bwd_sums_kernel(dy_ref, x_ref, mean_ref, rstd_ref, out_ref,
                     *, m_total, rows):
    i = pl.program_id(0)
    dy = dy_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    if m_total % rows:
        base = i * rows
        ids = jax.lax.broadcasted_iota(jnp.int32, dy.shape, 0) + base
        valid = ids < m_total
        dy = jnp.where(valid, dy, 0.0)
        # out-of-bounds pad rows may hold non-finite garbage: 0 * inf = nan
        x = jnp.where(valid, x, 0.0)
    xhat = (x - mean_ref[0, :]) * rstd_ref[0, :]
    s = jnp.sum(dy, axis=0, keepdims=True)
    s2 = jnp.sum(dy * xhat, axis=0, keepdims=True)
    part = jnp.concatenate([s, s2], axis=0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = part

    @pl.when(i > 0)
    def _():
        out_ref[:] = out_ref[:] + part


def _bwd_sums_pallas(dy2d, x2d, mean, rstd, interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    c_orig = x2d.shape[1]
    dyp, fold = _pack_lanes(dy2d)
    xp, _ = _pack_lanes(x2d)
    m, c = xp.shape
    # lane l of a packed row holds channel l % C -> tile the stats to 128
    mean_l = jnp.tile(mean, fold).reshape(1, c).astype(jnp.float32)
    rstd_l = jnp.tile(rstd, fold).reshape(1, c).astype(jnp.float32)
    rows = _block_rows(m, c, xp.dtype.itemsize, _BWD_BLOCK_BYTES)
    grid = pl.cdiv(m, rows)
    out = pl.pallas_call(
        partial(_bwd_sums_kernel, m_total=m, rows=rows),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=interpret,
    )(dyp, xp, mean_l, rstd_l)
    return (_fold_channels(out[0], c_orig, fold),
            _fold_channels(out[1], c_orig, fold))


# ---------------------------------------------------------------------------
# jnp fallbacks (CPU tests, GSPMD multi-chip)
# ---------------------------------------------------------------------------

def _channel_sums_jnp(x2d):
    x32 = x2d.astype(jnp.float32)
    return x32.sum(axis=0), (x32 * x32).sum(axis=0)


def _bwd_sums_jnp(dy2d, x2d, mean, rstd):
    dy32 = dy2d.astype(jnp.float32)
    xhat = (x2d.astype(jnp.float32) - mean) * rstd
    return dy32.sum(axis=0), (dy32 * xhat).sum(axis=0)


def _use_pallas_default() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# custom_vjp batch norm (training mode)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _batch_norm_train(x, scale, bias, eps: float, use_pallas: bool,
                      interpret: bool):
    (y, mean, var), _ = _bn_fwd(x, scale, bias, eps, use_pallas, interpret)
    return y, mean, var


def _bn_fwd(x, scale, bias, eps, use_pallas, interpret):
    shape = x.shape
    c = shape[-1]
    m = x.size // c
    x2d = x.reshape(m, c)
    if use_pallas:
        s, s2 = _channel_sums_pallas(x2d, interpret)
    else:
        s, s2 = _channel_sums_jnp(x2d)
    mean = s / m
    var = jnp.maximum(s2 / m - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    # fold into one multiply-add; XLA fuses this into the producing conv
    scale_eff = scale.astype(jnp.float32) * rstd
    bias_eff = bias.astype(jnp.float32) - mean * scale_eff
    y = (x.astype(jnp.float32) * scale_eff + bias_eff).astype(x.dtype)
    return (y, mean, var), (x, scale, mean, rstd)


def _bn_fwd_vjp(x, scale, bias, eps, use_pallas, interpret):
    return _bn_fwd(x, scale, bias, eps, use_pallas, interpret)


def _bn_bwd(eps, use_pallas, interpret, res, cotangents):
    # d_mean / d_var are treated as zero: the stats outputs feed only the
    # running-statistics update, which sits outside autodiff (torch
    # semantics for running_mean/running_var)
    dy, _, _ = cotangents
    x, scale, mean, rstd = res
    shape = x.shape
    c = shape[-1]
    m = x.size // c
    x2d = x.reshape(m, c)
    dy2d = dy.reshape(m, c)
    if use_pallas:
        sum_dy, sum_dy_xhat = _bwd_sums_pallas(dy2d, x2d, mean, rstd,
                                               interpret)
    else:
        sum_dy, sum_dy_xhat = _bwd_sums_jnp(dy2d, x2d, mean, rstd)
    dgamma = sum_dy_xhat.astype(scale.dtype)
    dbeta = sum_dy.astype(scale.dtype)
    g = scale.astype(jnp.float32) * rstd
    # dx = g * (dy - dbeta/M - xhat * dgamma/M); expand xhat to fold into
    # one fused elementwise pass over x and dy
    k1 = g / m
    dx = (g * dy.astype(jnp.float32)
          - k1 * sum_dy
          - (k1 * sum_dy_xhat * rstd) * (x.astype(jnp.float32) - mean))
    return dx.astype(x.dtype), dgamma, dbeta


_batch_norm_train.defvjp(_bn_fwd_vjp, _bn_bwd)


def batch_norm_train_stats(x, scale, bias, eps: float = 1e-5,
                           use_pallas=None, interpret: bool = False):
    """Training-mode BN: returns (y, mean, var(biased)).

    ``y`` is differentiable w.r.t. (x, scale, bias); ``mean``/``var`` are
    stop-gradient extras for the running-statistics update.
    """
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    return _batch_norm_train(x, scale, bias, float(eps), bool(use_pallas),
                             bool(interpret))


def batch_norm_inference(x, scale, bias, mean, var, eps: float = 1e-5):
    """Eval-mode BN from running stats — pure elementwise, XLA-fused."""
    rstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale_eff = scale.astype(jnp.float32) * rstd
    bias_eff = bias.astype(jnp.float32) - mean.astype(jnp.float32) * scale_eff
    return (x.astype(jnp.float32) * scale_eff + bias_eff).astype(x.dtype)
