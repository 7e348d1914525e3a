"""Native C++ data-path library: correctness vs numpy and distribution checks."""

import numpy as np
import pytest

from multimodal_clinical_tpu.utils import native
from multimodal_clinical_tpu.data.sampler import WeightedSampler

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


@needs_native
def test_alias_table_matches_target_distribution():
    rng = np.random.default_rng(0)
    weights = rng.uniform(0.1, 5.0, size=1000)
    table = native.AliasTable(weights)
    draws = table.sample(200_000, seed=42)
    assert draws.min() >= 0 and draws.max() < 1000
    counts = np.bincount(draws, minlength=1000)
    target = weights / weights.sum()
    empirical = counts / counts.sum()
    # chi-square-ish closeness
    assert np.abs(empirical - target).max() < 5e-3
    # determinism per seed
    np.testing.assert_array_equal(draws[:100], table.sample(100, seed=42))
    assert not np.array_equal(draws[:100], table.sample(100, seed=43))


@needs_native
def test_alias_table_degenerate_single_class():
    table = native.AliasTable(np.array([0.0, 1.0, 0.0]))
    draws = table.sample(1000, seed=1)
    assert (draws == 1).all()


@needs_native
def test_pcm16_to_float_matches_numpy():
    rng = np.random.default_rng(1)
    pcm = rng.integers(-32768, 32767, size=4000).astype(np.int16)
    # mono
    got = native.pcm16_to_float_mono(pcm, 1)
    np.testing.assert_allclose(got, pcm / 32768.0, atol=1e-7)
    # stereo mixdown
    got2 = native.pcm16_to_float_mono(pcm, 2)
    want2 = (pcm.reshape(-1, 2).mean(axis=1) / 32768.0).astype(np.float32)
    np.testing.assert_allclose(got2, want2, atol=1e-6)


def test_weighted_sampler_balances_classes_any_backend():
    labels = np.array([0] * 900 + [1] * 100)
    sampler = WeightedSampler(labels, seed=3)
    idx = sampler.indices(epoch=0)
    drawn = labels[idx]
    frac1 = (drawn == 1).mean()
    assert 0.4 < frac1 < 0.6  # inverse-frequency balancing
    # per-epoch determinism, cross-epoch variation
    np.testing.assert_array_equal(idx, sampler.indices(0))
    assert not np.array_equal(idx, sampler.indices(1))


def test_host_sharded_index_streams():
    """Per-host strided shards partition the same global stream."""
    from multimodal_clinical_tpu.data.sampler import RandomSampler

    full = RandomSampler(100, seed=7).indices(epoch=3)
    shards = [RandomSampler(100, seed=7, process_index=i,
                            process_count=4).indices(epoch=3)
              for i in range(4)]
    recombined = np.empty(100, np.int64)
    for i, shard in enumerate(shards):
        recombined[i::4] = shard
    np.testing.assert_array_equal(recombined, full)


@needs_native
def test_decode_jpeg_matches_pil():
    import io

    from PIL import Image

    rng = np.random.default_rng(5)
    # smooth synthetic image so JPEG loss is small
    base = rng.normal(size=(8, 12, 3))
    img = np.clip(
        np.kron(base, np.ones((40, 40, 1))) * 0.2 + 0.5, 0, 1)
    pil = Image.fromarray((img * 255).astype(np.uint8))
    buf = io.BytesIO()
    pil.save(buf, format="JPEG", quality=95)
    data = buf.getvalue()

    got = native.decode_jpeg(data, 160, 240)
    assert got is not None and got.shape == (160, 240, 3)
    want = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (240, 160), Image.BILINEAR),
        np.float32) / 255.0
    # different decode paths (DCT-domain downscale vs full decode +
    # bilinear): distributionally close; isolated block-edge pixels differ
    diff = np.abs(got - want)
    assert diff.mean() < 0.01
    assert np.quantile(diff, 0.99) < 0.1


@needs_native
def test_decode_jpeg_rejects_garbage():
    assert native.decode_jpeg(b"not a jpeg at all", 32, 32) is None


@needs_native
def test_jpeg_dims_header_probe():
    import io

    from PIL import Image

    img = Image.new("RGB", (320, 200), (40, 80, 120))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    assert native.jpeg_dims(buf.getvalue()) == (200, 320)
    assert native.jpeg_dims(b"garbage") is None


@needs_native
def test_decode_jpeg_crop_matches_pil():
    """Native crop+resize vs PIL box-resize: same crop semantics
    (distributional tolerance — decode/resample engines differ)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, (180, 260, 3), dtype=np.uint8).astype(
        np.uint8)
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    data = buf.getvalue()

    box = (30, 20, 190, 140)  # left, top, right, bottom
    got = native.decode_jpeg_crop(data, box, 96, 96)
    assert got is not None and got.shape == (96, 96, 3)
    want = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (96, 96), Image.BILINEAR, box=box),
        np.float32) / 255.0
    diff = np.abs(got - want)
    assert diff.mean() < 0.02
    assert np.quantile(diff, 0.99) < 0.15


@needs_native
def test_decode_jpeg_crop_degenerate_box():
    import io

    from PIL import Image

    img = Image.new("RGB", (64, 64), (10, 200, 30))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    # tiny 1x1 crop upscaled: all pixels ~ the solid color
    out = native.decode_jpeg_crop(buf.getvalue(), (10, 10, 11, 11), 32, 32)
    assert out is not None
    assert np.abs(out - out[0, 0]).max() < 0.05
