"""On-device audio front-end: STFT log-spectrograms as XLA matmuls.

Replaces the reference's host-side librosa/scipy pipelines:
  * vggsound/get_data.py:106-125 — librosa.stft(n_fft=256, hop=128) ->
    log(abs + 1e-7), computed per sample in DataLoader workers (the
    documented input bottleneck, SURVEY §7 "hard parts");
  * cremad/video_preprocessing.py:111-130 — scipy.signal.spectrogram
    (nperseg=512, noverlap=353, scipy defaults: tukey(0.25) window,
    constant detrend, one-sided density PSD) -> log -> per-clip
    standardize (offline); same math at ave/video_preprocessing.py:267.

Design: framing is a strided gather; windowing + DFT fold into ONE matmul
``frames (B*T, n_fft) x dft (n_fft, 2*n_bins)`` — exactly MXU shaped — then
|.|^2 / log fuse into the surrounding elementwise graph.  This runs inside
jit on the device, so raw 5-second waveforms (80k samples) stream to the
TPU instead of (129, 626) float spectrograms: 1.6x fewer bytes over PCIe
and zero host DSP.

The DFT-matrix approach beats an FFT here: n_fft is tiny (256/512), the
batch of frames is huge, and a (256 x 258) matmul at bf16 saturates the MXU
while jnp.fft falls to the VPU with awkward complex layouts.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _dft_matrices(n_fft: int, dtype=jnp.float32):
    """Real/imag DFT analysis matrices, (n_fft, n_fft//2 + 1)."""
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    return (jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype))


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int,
                 center: bool = True) -> jnp.ndarray:
    """(B, N) -> (B, T, frame_length) frames (librosa-style reflect pad)."""
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n = x.shape[-1]
    num_frames = 1 + (n - frame_length) // hop
    idx = (jnp.arange(num_frames)[:, None] * hop
           + jnp.arange(frame_length)[None, :])
    return x[:, idx]  # gather -> (B, T, frame_length)


@partial(jax.jit, static_argnames=("n_fft", "hop", "window", "center", "eps"))
def log_spectrogram(
    waveform: jnp.ndarray,
    n_fft: int = 256,
    hop: int = 128,
    window: Optional[str] = "hann",
    center: bool = True,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """(B, N) float32 waveform -> (B, n_fft//2+1, T) log-magnitude STFT.

    Matches librosa.stft defaults (hann window, centered reflect pad) as
    used by vggsound/get_data.py:118-119: log(|STFT| + eps).
    """
    frames = frame_signal(waveform.astype(jnp.float32), n_fft, hop, center)
    if window == "hann":
        win = jnp.asarray(np.hanning(n_fft + 1)[:-1], jnp.float32)
        frames = frames * win
    cos_m, sin_m = _dft_matrices(n_fft)
    # one big MXU matmul over all frames of the batch
    b, t, _ = frames.shape
    flat = frames.reshape(b * t, n_fft)
    re = jnp.dot(flat, cos_m, preferred_element_type=jnp.float32)
    im = jnp.dot(flat, sin_m, preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im + 0.0)
    out = jnp.log(mag + eps)
    return out.reshape(b, t, n_fft // 2 + 1).transpose(0, 2, 1)


def _tukey_periodic(M: int, alpha: float) -> np.ndarray:
    """Periodic (fftbins=True) Tukey window — scipy.signal.get_window's
    construction: tukey(M + 1, alpha, sym=True) truncated by one sample."""
    n = np.arange(M + 1, dtype=np.float64)
    m = M  # = (M + 1) - 1
    width = int(np.floor(alpha * m / 2.0))
    w = np.ones(M + 1, dtype=np.float64)
    n1 = n[: width + 1]
    w[: width + 1] = 0.5 * (1 + np.cos(np.pi * (-1 + 2.0 * n1 / alpha / m)))
    n3 = n[-(width + 1):]
    w[-(width + 1):] = 0.5 * (
        1 + np.cos(np.pi * (-2.0 / alpha + 1 + 2.0 * n3 / alpha / m))
    )
    return w[:-1]


@partial(jax.jit,
         static_argnames=("nperseg", "noverlap", "fs", "standardize", "eps"))
def cremad_spectrogram(
    waveform: jnp.ndarray,
    nperseg: int = 512,
    noverlap: int = 353,
    fs: int = 16000,
    standardize: bool = True,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """scipy.signal.spectrogram-exact PSD -> log -> per-clip standardize,
    matching the Crema-D/AVE offline pipelines
    (cremad/video_preprocessing.py:234-238, ave/video_preprocessing.py:267-271
    — both at sr=16000).

    Reproduces every scipy.signal.spectrogram default the reference relies
    on: tukey(0.25) periodic window, per-segment constant detrend,
    one-sided density scaling (x2 for all bins except DC and Nyquist,
    /(fs * sum(win^2))), boundary=None/padded=False framing.  The final
    standardization uses the reference's (std + 1e-9) guard.
    """
    hop = nperseg - noverlap
    frames = frame_signal(waveform.astype(jnp.float32), nperseg, hop,
                          center=False)
    # detrend='constant': remove each segment's mean before windowing
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    win_np = _tukey_periodic(nperseg, 0.25)
    frames = frames * jnp.asarray(win_np, jnp.float32)
    cos_m, sin_m = _dft_matrices(nperseg)
    b, t, _ = frames.shape
    flat = frames.reshape(b * t, nperseg)
    re = jnp.dot(flat, cos_m, preferred_element_type=jnp.float32)
    im = jnp.dot(flat, sin_m, preferred_element_type=jnp.float32)
    power = (re * re + im * im).reshape(b, t, nperseg // 2 + 1)
    # scaling='density', mode='psd', one-sided (nperseg even -> last bin
    # is Nyquist, not doubled)
    n_bins = nperseg // 2 + 1
    scale = 1.0 / (float(fs) * float(np.sum(win_np ** 2)))
    sided = np.full((n_bins,), 2.0, np.float32)
    sided[0] = 1.0
    if nperseg % 2 == 0:
        sided[-1] = 1.0
    power = power * (jnp.asarray(sided) * scale)
    power = power.transpose(0, 2, 1)  # (B, F, T)
    out = jnp.log(power + eps)
    if standardize:
        mean = jnp.mean(out, axis=(1, 2), keepdims=True)
        std = jnp.std(out, axis=(1, 2), keepdims=True)
        out = (out - mean) / (std + 1e-9)
    return out
