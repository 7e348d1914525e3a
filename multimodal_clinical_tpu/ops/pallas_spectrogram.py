"""Pallas TPU kernel: fused framing + window + DFT + log-magnitude STFT.

The XLA path (ops/spectrogram.log_spectrogram) materializes the framed
tensor (B, T, n_fft) in HBM between the gather and the DFT matmul — for the
VGGSound geometry that is an extra 2x write+read of ~64 MB per 224-batch of
5-second waveforms.  This kernel keeps the whole pipeline in VMEM per batch
row and never materializes frames at all:

With hop == n_fft/2, frame t is the concatenation of half-hops
(h_t, h_{t+1}), so the windowed DFT factorizes into two half matmuls:

    frames @ (diag(win) @ DFT) = h @ W_top  +  shift_up(h @ W_bot)

where W_top/W_bot are the window-folded top/bottom halves of the DFT
matrix.  Two (T+1, half) x (half, bins) MXU matmuls per component + a
sublane roll — no gather, no concat, no frame buffer.  (A plain
``jnp.concatenate`` of offset slices is rejected by Mosaic: "result/input
offset mismatch on non-concat dimension".)

Constraints: ``hop == n_fft // 2`` (the VGGSound/librosa default geometry);
general hops fall back to the XLA implementation.

VMEM per grid step (n_fft=256, 5 s @ 16 kHz): halves 321 KB + 4 half-DFT
mats 264 KB + partials ~650 KB + out 325 KB ≈ 1.6 MB — far under the
~16 MB/core budget, so the grid pipeline double-buffers batch rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spectrogram import log_spectrogram as _xla_log_spectrogram


def _kernel(halves_ref, cos_top_ref, cos_bot_ref, sin_top_ref, sin_bot_ref,
            out_ref, *, num_frames, eps):
    h = halves_ref[0, :, :]                               # (T+1, half)
    # HIGHEST: full-f32 MXU passes — the log amplifies rounding error in
    # near-zero bins, and the default bf16 passes cost ~8% relative
    # magnitude error there
    dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    a_re = dot(h, cos_top_ref[:, :])
    b_re = dot(h, cos_bot_ref[:, :])
    a_im = dot(h, sin_top_ref[:, :])
    b_im = dot(h, sin_bot_ref[:, :])
    # frame t = h_t (top) + h_{t+1} (bottom): shift the bottom partials up
    # by one row (pltpu.roll requires non-negative shifts: rows-1 == -1)
    re = (a_re + pltpu.roll(b_re, shift=num_frames, axis=0))[:num_frames]
    im = (a_im + pltpu.roll(b_im, shift=num_frames, axis=0))[:num_frames]
    mag = jnp.sqrt(re * re + im * im)
    out_ref[0, :, :] = jnp.log(mag + eps).T               # (F, T)


@partial(jax.jit, static_argnames=("n_fft", "hop", "eps", "interpret"))
def pallas_log_spectrogram(
    waveform: jnp.ndarray,
    n_fft: int = 256,
    hop: int = 128,
    eps: float = 1e-7,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N) float32 -> (B, n_fft//2+1, T) log-|STFT| (hann, centered).

    Matches ops/spectrogram.log_spectrogram (itself matched to librosa
    defaults); requires hop == n_fft // 2, else falls back to the XLA path.
    """
    if hop != n_fft // 2:
        return _xla_log_spectrogram(waveform, n_fft=n_fft, hop=hop, eps=eps)
    waveform = waveform.astype(jnp.float32)
    b, n = waveform.shape
    half = n_fft // 2
    # centered: reflect-pad half a window both sides (librosa center=True)
    padded = jnp.pad(waveform, ((0, 0), (half, half)), mode="reflect")
    total = padded.shape[1]
    num_frames = 1 + (total - n_fft) // hop
    # expose half-hops as a 3-D array so the Pallas block (1, T+1, half)
    # satisfies the TPU tiling rule (last two dims equal the array dims)
    padded = padded[:, : (num_frames + 1) * half]
    halves3d = padded.reshape(b, num_frames + 1, half)

    n_bins = half + 1
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    win = np.hanning(n_fft + 1)[:-1][:, None]
    dft_cos = np.cos(ang) * win
    dft_sin = np.sin(ang) * win
    cos_top = jnp.asarray(dft_cos[:half], jnp.float32)
    cos_bot = jnp.asarray(dft_cos[half:], jnp.float32)
    sin_top = jnp.asarray(dft_sin[:half], jnp.float32)
    sin_bot = jnp.asarray(dft_sin[half:], jnp.float32)

    kernel = partial(_kernel, num_frames=num_frames, eps=eps)
    mat_spec = pl.BlockSpec((half, n_bins), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, num_frames + 1, half), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec, mat_spec, mat_spec,
        ],
        out_specs=pl.BlockSpec((1, n_bins, num_frames), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_bins, num_frames), jnp.float32),
        interpret=interpret,
    )(halves3d, cos_top, cos_bot, sin_top, sin_bot)
