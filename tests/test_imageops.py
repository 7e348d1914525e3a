"""Host frame transforms (RandomResizedCrop / Resize / normalize) parity."""

import io

import numpy as np
from PIL import Image

from multimodal_clinical_tpu.data.imageops import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    load_frame_eval,
    load_frame_train,
    random_resized_crop_box,
)


def _save_jpeg(tmp_path, arr, name="img.jpg"):
    path = str(tmp_path / name)
    Image.fromarray(arr).save(path, quality=95)
    return path


def test_random_resized_crop_box_bounds():
    rng = np.random.default_rng(0)
    for _ in range(200):
        l, t, r, b = random_resized_crop_box(rng, 320, 180)
        assert 0 <= l < r <= 320
        assert 0 <= t < b <= 180
        area_frac = (r - l) * (b - t) / (320 * 180)
        assert 0.05 < area_frac <= 1.01
        aspect = (r - l) / (b - t)
        assert 0.7 < aspect < 1.45


def test_load_frame_eval_matches_torch_normalize(tmp_path):
    rng = np.random.default_rng(1)
    arr = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    path = _save_jpeg(tmp_path, arr)
    out = load_frame_eval(path, size=32)
    assert out.shape == (32, 32, 3)
    # undo normalization: values should land back in ~[0, 1]
    raw = out * IMAGENET_STD + IMAGENET_MEAN
    assert raw.min() > -0.05 and raw.max() < 1.05


def test_load_frame_train_shapes_and_determinism(tmp_path):
    rng1 = np.random.default_rng(3)
    rng2 = np.random.default_rng(3)
    arr = np.zeros((100, 120, 3), np.uint8)
    arr[:50] = 255
    path = _save_jpeg(tmp_path, arr)
    a = load_frame_train(path, rng1, size=32)
    b = load_frame_train(path, rng2, size=32)
    assert a.shape == (32, 32, 3)
    np.testing.assert_array_equal(a, b)  # same rng stream -> same crop/flip


def test_uint8_ship_plus_device_normalize_matches_host_pipeline(tmp_path):
    """Shipping uint8 + on-device ToTensor/Normalize must equal the host
    float pipeline EXACTLY (same uint8 source, same fp32 affine) — the
    transfer-format change is not allowed to move any value."""
    import jax.numpy as jnp

    from multimodal_clinical_tpu.data.imageops import (
        load_frame_eval_u8,
        load_frame_train_u8,
        normalize_frames_device,
    )

    rng = np.random.default_rng(2)
    arr = (rng.uniform(0, 255, (96, 80, 3))).astype(np.uint8)
    path = _save_jpeg(tmp_path, arr)

    u8 = load_frame_eval_u8(path, size=32)
    assert u8.dtype == np.uint8
    host = load_frame_eval(path, size=32)
    dev = np.asarray(normalize_frames_device(jnp.asarray(u8)))
    np.testing.assert_allclose(dev, host, rtol=0, atol=1e-6)

    u8t = load_frame_train_u8(path, np.random.default_rng(7), size=32)
    hostt = load_frame_train(path, np.random.default_rng(7), size=32)
    devt = np.asarray(normalize_frames_device(jnp.asarray(u8t)))
    np.testing.assert_allclose(devt, hostt, rtol=0, atol=1e-6)

    # float input passes through unchanged (synthetic twins)
    f32 = np.ones((4, 4, 3), np.float32) * 0.3
    np.testing.assert_array_equal(
        np.asarray(normalize_frames_device(jnp.asarray(f32))), f32)
