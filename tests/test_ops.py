"""On-device DSP ops vs numpy/scipy goldens."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_clinical_tpu.ops.specaugment import spec_augment
from multimodal_clinical_tpu.ops.spectrogram import (
    cremad_spectrogram,
    frame_signal,
    log_spectrogram,
)


def _np_stft_mag(x, n_fft, hop):
    """Centered hann STFT magnitude via numpy FFT (librosa semantics)."""
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    win = np.hanning(n_fft + 1)[:-1]
    num = 1 + (len(xp) - n_fft) // hop
    frames = np.stack([xp[i * hop:i * hop + n_fft] * win for i in range(num)])
    return np.abs(np.fft.rfft(frames, axis=-1)).T  # (n_bins, T)


def test_log_spectrogram_matches_fft_golden():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16000)).astype(np.float32)
    got = np.asarray(log_spectrogram(jnp.asarray(x), n_fft=256, hop=128))
    for b in range(2):
        want = np.log(_np_stft_mag(x[b], 256, 128) + 1e-7)
        np.testing.assert_allclose(got[b], want, rtol=1e-3, atol=1e-3)


def test_log_spectrogram_vggsound_geometry():
    """5 s @ 16 kHz with n_fft=256/hop=128 -> (129, 626) like the reference
    batch shape (vggsound/get_data.py)."""
    x = np.zeros((1, 80000), np.float32)
    out = log_spectrogram(jnp.asarray(x), n_fft=256, hop=128)
    assert out.shape == (1, 129, 626)


def test_frame_signal_uncentered():
    x = jnp.asarray(np.arange(20, dtype=np.float32)[None])
    frames = frame_signal(x, 8, 4, center=False)
    assert frames.shape == (1, 4, 8)
    np.testing.assert_array_equal(np.asarray(frames[0, 1]),
                                  np.arange(4, 12, dtype=np.float32))


def test_cremad_spectrogram_standardized():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32000)).astype(np.float32)
    out = np.asarray(cremad_spectrogram(jnp.asarray(x)))
    assert out.shape[1] == 257  # nperseg 512 -> 257 bins
    # per-clip standardization
    np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=(1, 2)), 1.0, atol=1e-3)


def _scipy_reference_spectrogram(x, fs=16000):
    """The reference's exact offline pipeline
    (cremad/video_preprocessing.py:234-238): scipy.signal.spectrogram with
    all defaults (tukey(0.25), constant detrend, one-sided density PSD) ->
    log(+1e-7) -> standardize (std + 1e-9)."""
    from scipy import signal

    _, _, spec = signal.spectrogram(x, fs, nperseg=512, noverlap=353)
    spec = np.log(np.abs(spec) + 1e-7)
    return (spec - spec.mean()) / (spec.std() + 1e-9)


def test_cremad_spectrogram_matches_scipy_golden():
    """Value-level pin vs scipy.signal.spectrogram's own output — the
    on-device path and reference-preprocessed pickles must be
    interchangeable (VERDICT r3 missing #4)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 32000)).astype(np.float32) * 0.3
    # add a DC offset per clip so the constant-detrend term matters
    x[0] += 0.25
    x[1] -= 0.1
    got = np.asarray(cremad_spectrogram(jnp.asarray(x)))
    for b in range(2):
        want = _scipy_reference_spectrogram(x[b])
        assert got[b].shape == want.shape
        np.testing.assert_allclose(got[b], want, rtol=2e-3, atol=2e-3)


def test_cremad_spectrogram_reference_geometry():
    """10 s @ 16 kHz -> (257, 1004), the shape the reference pickles carry
    (cremad/video_preprocessing.py:239 prints it)."""
    x = np.zeros((1, 160000), np.float32)
    out = cremad_spectrogram(jnp.asarray(x))
    assert out.shape == (1, 257, 1004)


def test_tukey_periodic_matches_scipy():
    from scipy.signal import get_window

    from multimodal_clinical_tpu.ops.spectrogram import _tukey_periodic

    want = get_window(("tukey", 0.25), 512, fftbins=True)
    np.testing.assert_allclose(_tukey_periodic(512, 0.25), want, atol=1e-12)


def test_spec_augment_masks_bands():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((4, 64, 128))
    out = np.asarray(spec_augment(rng, x, freq_mask_param=16,
                                  time_mask_param=32))
    assert out.shape == (4, 64, 128)
    assert out.min() == 0.0 or (out == 1.0).all()  # bands zeroed (or width-0)
    assert out.max() == 1.0
    # unmasked values unchanged
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_spec_augment_preserves_channel_dim():
    rng = jax.random.PRNGKey(1)
    x = jnp.ones((2, 64, 100, 1))
    out = spec_augment(rng, x)
    assert out.shape == (2, 64, 100, 1)


def test_pallas_log_spectrogram_interpret_matches_xla():
    from multimodal_clinical_tpu.ops.pallas_spectrogram import (
        pallas_log_spectrogram,
    )

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 16000)).astype(np.float32)
    want = np.asarray(log_spectrogram(jnp.asarray(x), n_fft=256, hop=128))
    got = np.asarray(pallas_log_spectrogram(jnp.asarray(x), interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_pallas_log_spectrogram_general_hop_falls_back():
    from multimodal_clinical_tpu.ops.pallas_spectrogram import (
        pallas_log_spectrogram,
    )

    x = jnp.zeros((1, 4000), jnp.float32)
    want = log_spectrogram(x, n_fft=256, hop=100)
    got = pallas_log_spectrogram(x, n_fft=256, hop=100)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
