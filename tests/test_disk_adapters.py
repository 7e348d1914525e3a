"""Real-data adapter regressions driven over fabricated on-disk corpora."""

import csv
import os
import pickle
import wave

import numpy as np
import pytest
from PIL import Image

from types import SimpleNamespace


def _write_wav(path, seconds=1, sr=16000):
    pcm = (np.sin(np.linspace(0, 440, sr * seconds)) * 20000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _write_frames(dir_path, n, size=(64, 48)):
    os.makedirs(dir_path, exist_ok=True)
    w, h = size
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        # textured gradient so crops are distinguishable from resizes
        arr = np.stack([
            np.full((h, w), 10 * i),
            (255 * xx / max(w - 1, 1)),
            (255 * yy / max(h - 1, 1)),
        ], axis=-1).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(dir_path, f"f{i:03d}.jpg"))


def test_vggsound_shared_class_map_across_splits(tmp_path):
    """Train and test rows of the same class string must get the SAME id
    even when first-occurrence order differs between splits (the reference
    maps both splits through the train-derived dict,
    vggsound/get_data.py:88-101)."""
    from multimodal_clinical_tpu.benchmarks import vggsound

    d = tmp_path
    rows = [
        ("vidA", "0", "dog", "train"),
        ("vidB", "0", "cat", "train"),
        # test split lists cat BEFORE dog — per-split maps would swap ids
        ("vidC", "0", "cat", "test"),
        ("vidD", "0", "dog", "test"),
    ]
    with open(d / "vggsound.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    os.makedirs(d / "audio")
    for clip, start, _, _ in rows:
        # producers zero-pad the start time (get_data.py:70-71, zfill(6))
        _write_wav(d / "audio" / f"{clip}_{start.zfill(6)}.wav")
        _write_frames(str(d / "frames" / f"{clip}_{start.zfill(6)}"), 3)

    args = SimpleNamespace(data_path=str(d) + "/", seed=0, num_classes=2,
                           use_video_frames=2, model_type="jprobas")
    bundle = vggsound.get_data(args)
    train_map = dict(zip([c for c, _ in bundle.train.items],
                         bundle.train.labels))
    test_map = dict(zip([c for c, _ in bundle.test.items],
                        bundle.test.labels))
    assert train_map["vidA_000000"] == test_map["vidD_000000"]  # dog == dog
    assert train_map["vidB_000000"] == test_map["vidC_000000"]  # cat == cat
    assert train_map["vidA_000000"] != train_map["vidB_000000"]

    batch = bundle.train.gather(np.array([0, 1]))
    assert batch["x1_waveform"].shape == (2, 80000)
    assert batch["x2"].shape == (2, 2, 224, 224, 3)
    # frames ship as pre-normalization uint8 (ToTensor+Normalize runs on
    # device via device_preprocess — half the H2D bytes of bf16)
    assert batch["x2"].dtype == np.uint8


def test_vggsound_real_layout_init_and_train_step(tmp_path):
    """REGRESSION: the real vggsound adapter ships raw waveforms
    (x1_waveform — no x1 key), so state init must map the sample batch
    through spec.device_preprocess before indexing x1..xM; indexing the
    raw gather crashed `--dir vggsound` on real data while the synthetic
    twin (which ships a ready spectrogram) passed."""
    from multimodal_clinical_tpu.benchmarks import vggsound
    from multimodal_clinical_tpu.engine.run import (
        build_loaders, init_state_on_mesh,
    )
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.parallel.mesh import make_mesh

    d = tmp_path
    rows = [(f"vid{i}", "0", "dog" if i % 2 else "cat", "train")
            for i in range(4)] + [("vidT", "0", "cat", "test")]
    with open(d / "vggsound.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    os.makedirs(d / "audio")
    for clip, start, _, _ in rows:
        _write_wav(d / "audio" / f"{clip}_{start.zfill(6)}.wav")
        _write_frames(str(d / "frames" / f"{clip}_{start.zfill(6)}"), 3)

    args = SimpleNamespace(data_path=str(d) + "/", seed=0, num_classes=2,
                           use_video_frames=2, model_type="jprobas",
                           batch_size=8, learning_rate=1e-3, num_epochs=1,
                           use_scheduler=False, mesh_shape=None,
                           compute_dtype="bfloat16")
    bundle = vggsound.get_data(args)
    assert not bundle.synthetic
    mesh = make_mesh()
    spec, opt_kwargs = vggsound.get_model_spec(args, n_train=len(bundle.train))
    state = init_state_on_mesh(spec, args, bundle, mesh, opt_kwargs)
    train_loader, _, _ = build_loaders(args, bundle, mesh)
    train_loader.set_epoch(0)
    step = make_train_step(spec)
    with mesh:
        state, metrics = step(state, next(iter(train_loader)))
    assert np.isfinite(float(metrics["train_loss"]))


def test_vggsound_eval_audio_crop_is_random_like_reference(tmp_path):
    """The reference crops the 5 s audio window at random.randint(0, SR*5)
    UNCONDITIONALLY — eval/test included (vggsound/get_data.py:113), just
    like its random frame choice.  Our eval dataset must draw the same way
    from the stateless per-(seed, epoch, index) stream: not pinned to
    start=0, and reproducible at equal seed."""
    from multimodal_clinical_tpu.benchmarks.vggsound import (
        SR, VGGSoundDiskDataset)
    from multimodal_clinical_tpu.data.core import sample_rng

    d = tmp_path
    os.makedirs(d / "audio")
    # a 10 s integer ramp (scaled into [-1, 1)) so the crop start is
    # recoverable from the first sample value
    sr = SR
    ramp = (np.arange(sr * 10) % 20000).astype(np.int16)
    with wave.open(str(d / "audio" / "vidR_000000.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(ramp.tobytes())
    _write_frames(str(d / "frames" / "vidR_000000"), 3)

    def crop_start(seed):
        ds = VGGSoundDiskDataset(str(d), [("vidR_000000", 0)], train=False,
                                 use_video_frames=1, seed=seed)
        wav = ds.gather(np.array([0]))["x1_waveform"][0]
        # invert the int16 scaling to recover the ramp position
        return int(round(float(wav[0]) * 32768.0))

    starts = {crop_start(seed) for seed in range(4)}
    assert starts != {0}, "eval crop pinned to start=0 (reference is random)"
    # the draw is the documented stateless stream: reproducible per seed
    for seed in (0, 3):
        expected = int(sample_rng(seed, 0, 0).integers(0, SR * 5 + 1)) % 20000
        assert crop_start(seed) == expected
    assert crop_start(1) == crop_start(1)


def test_enrico_real_layout_u8_init_and_step(tmp_path):
    """Real-layout enrico corpus: the eagerly-loaded dataset holds uint8
    (4x less RAM/H2D than float32), the noise transforms operate on it,
    and init + one train step run through device_preprocess's /255."""
    from multimodal_clinical_tpu.benchmarks import enrico
    from multimodal_clinical_tpu.engine.run import (
        build_loaders, init_state_on_mesh,
    )
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.parallel.mesh import make_mesh

    d = tmp_path
    os.makedirs(d / "screenshots")
    os.makedirs(d / "wireframes")
    rng = np.random.default_rng(0)
    with open(d / "design_topics.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["screen_id", "topic"])
        for i in range(12):
            sid = str(1000 + i)
            w.writerow([sid, "news" if i % 2 else "chat"])
            arr = rng.integers(0, 255, (300, 150, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / "screenshots" / f"{sid}.jpg")
            Image.fromarray(arr[::-1]).save(d / "wireframes" / f"{sid}.png")

    args = SimpleNamespace(data_path=str(d) + "/", seed=0, num_classes=2,
                           batch_size=8, learning_rate=1e-3, num_epochs=1,
                           use_scheduler=False, mesh_shape=None,
                           compute_dtype="bfloat16", model_type="ensemble",
                           noise_p=0.3, label_noise_p=0.2)
    bundle = enrico.get_data(args)
    assert not bundle.synthetic
    assert bundle.train.modalities[0].dtype == np.uint8
    assert bundle.train.modalities[1].dtype == np.uint8
    mesh = make_mesh()
    spec, opt_kwargs = enrico.get_model_spec(args, n_train=len(bundle.train))
    state = init_state_on_mesh(spec, args, bundle, mesh, opt_kwargs)
    train_loader, _, _ = build_loaders(args, bundle, mesh)
    train_loader.set_epoch(0)
    step = make_train_step(spec)
    with mesh:
        state, metrics = step(state, next(iter(train_loader)))
    assert np.isfinite(float(metrics["train_loss"]))


def test_ave_loads_six_distinct_frames(tmp_path):
    """AVE reads the REFERENCE on-disk layout: Audio-1004-SE/<clip>.pkl
    + Image-01-FPS-SE/<clip>/ (ave/get_data.py:66-95), 6 frames."""
    from multimodal_clinical_tpu.benchmarks.ave import AveDiskDataset

    d = tmp_path
    os.makedirs(d / "Audio-1004-SE")
    with open(d / "Audio-1004-SE" / "clip.pkl", "wb") as f:
        pickle.dump(np.zeros((257, 1004), np.float32), f)
    _write_frames(str(d / "Image-01-FPS-SE" / "clip"), 8)

    ds = AveDiskDataset(str(d), [("clip", 0)], train=False, seed=0)
    batch = ds.gather(np.array([0]))
    frames = batch["x2"][0]
    assert frames.shape == (6, 224, 224, 3)
    # 6 DISTINCT frames (each f{i}.jpg has a different red level)
    reds = [float(frames[i, :, :, 0].mean()) for i in range(6)]
    assert len({round(r, 3) for r in reds}) == 6


def test_ave_real_layout_admission_and_class_order(tmp_path):
    """get_data over a reference-layout AVE corpus: class ids follow
    FIRST-APPEARANCE order in testSet.txt (ave/get_data.py:79-87, not
    sorted), repeated clips are deduped (:97-100), and clips missing
    either modality artifact are skipped (:95-101)."""
    from multimodal_clinical_tpu.benchmarks import ave

    d = tmp_path
    os.makedirs(d / "Audio-1004-SE")

    def _mk(clip, with_pkl=True, with_frames=True):
        if with_pkl:
            with open(d / "Audio-1004-SE" / f"{clip}.pkl", "wb") as f:
                pickle.dump(np.zeros((257, 1004), np.float32), f)
        if with_frames:
            _write_frames(str(d / "Image-01-FPS-SE" / clip), 6)

    for clip in ("vidA", "vidB", "vidC"):
        _mk(clip)
    _mk("vidNoPkl", with_pkl=False)
    _mk("vidNoFrames", with_frames=False)

    # Zebra before Aardvark: sorted() would swap the ids
    (d / "testSet.txt").write_text(
        "Zebra&vidA&good&0&10\nAardvark&vidB&good&0&10\n"
        "Zebra&vidC&good&0&10\n")
    (d / "trainSet.txt").write_text(
        "Zebra&vidA&good&0&10\nZebra&vidA&good&0&10\n"  # dup row
        "Aardvark&vidB&good&0&10\n"
        "Zebra&vidNoPkl&good&0&10\nAardvark&vidNoFrames&good&0&10\n")
    (d / "valSet.txt").write_text("Aardvark&vidB&good&0&10\n")

    args = SimpleNamespace(data_path=str(d) + "/", seed=0, num_classes=2)
    bundle = ave.get_data(args)
    assert not bundle.synthetic
    train_map = dict(bundle.train.items)
    assert train_map == {"vidA": 0, "vidB": 1}  # Zebra=0 (first seen)
    assert len(bundle.train) == 2  # dup + 2 missing-artifact clips dropped
    assert len(bundle.val) == 1 and len(bundle.test) == 3
    batch = bundle.train.gather(np.array([0, 1]))
    assert batch["x1"].shape == (2, 257, 1004, 1)
    assert batch["x2"].shape == (2, 6, 224, 224, 3)
    assert batch["x2"].dtype == np.uint8


def test_ave_window_waveform_matches_reference_math():
    """AveDiskDataset._window_waveform replicates extractWav_SE's host
    math (ave/video_preprocessing.py:254-266): slice [start, end) s,
    tile x10, tile x10 again if still short, truncate to 10 s, clip."""
    from multimodal_clinical_tpu.benchmarks.ave import AveDiskDataset

    sr, target = 16000, 160000
    rng = np.random.default_rng(0)

    def _reference(wav, start, end):
        samples = wav[sr * start: sr * end]
        res = np.tile(samples, 10)
        res = (np.tile(res, 10)[:target] if len(res) < target
               else res[:target])
        return np.clip(res, -1.0, 1.0)

    # 1 s segment: tile x10 lands exactly on 10 s (no second tile)
    wav = (rng.normal(scale=0.6, size=sr * 3)).astype(np.float32)
    ds = AveDiskDataset(".", [], train=False, segments={"c": (1, 2)})
    np.testing.assert_allclose(ds._window_waveform(wav, "c"),
                               _reference(wav, 1, 2), atol=0)

    # segment longer than the wav tail: numpy slicing clamps, like the
    # reference's samples[sr*start:sr*end]; second tile x10 kicks in
    ds2 = AveDiskDataset(".", [], train=False, segments={"c": (2, 10)})
    np.testing.assert_allclose(ds2._window_waveform(wav, "c"),
                               _reference(wav, 2, 10), atol=0)

    # empty segment is an actionable error, not an infinite-pad loop
    ds3 = AveDiskDataset(".", [], train=False, segments={"c": (3, 3)})
    with pytest.raises(ValueError, match="empty audio segment"):
        ds3._window_waveform(wav, "c")

    # no annotation row: video2frame_update_SE defaults (0, 10)
    ds4 = AveDiskDataset(".", [], train=False)
    np.testing.assert_allclose(ds4._window_waveform(wav, "c"),
                               _reference(wav, 0, 10), atol=0)

    # sub-0.1 s slice: the reference's at-most-twice tiling would fall
    # short of 10 s (its own pickles then crash its DataLoader at stack
    # time); here tiling continues to exactly the 10 s target
    short = (rng.normal(scale=0.4, size=sr)).astype(np.float32)
    tiny = short[: sr // 100]  # 0.01 s
    ds5 = AveDiskDataset(".", [], train=False, segments={"c": (0, 1)})
    out = ds5._window_waveform(tiny, "c")
    assert out.shape == (target,)
    np.testing.assert_allclose(
        out, np.clip(np.tile(tiny, -(-target // len(tiny)))[:target],
                     -1.0, 1.0), atol=0)


def test_ave_stream_fps_tops_up_short_segments():
    """Segments shorter than num_frames seconds raise the stream tick
    rate so num_frames DISTINCT frames come out of the window (the
    reference's offline top-up analog, ave/video_preprocessing.py:131-158);
    long segments stay on the offline 1 FPS grid."""
    from multimodal_clinical_tpu.benchmarks.ave import AveDiskDataset

    ds = AveDiskDataset(".", [], train=False,
                        segments={"short": (2, 3), "long": (0, 9)})
    # [2, 4) window (end inclusive -> +1), 2 s < 6 frames -> 3 fps
    assert ds._stream_fps("short") == pytest.approx(6.0 / 2.0)
    assert ds._stream_fps("long") == 1.0


def test_ave_stream_admission_drops_empty_segments(tmp_path, capsys):
    """Stream mode drops start>=end Annotations rows at dataset
    construction (with a warning) instead of raising inside a
    training-time prefetch gather (ADVICE r3)."""
    from multimodal_clinical_tpu.benchmarks.ave import (
        _read_annotations, _read_split_txt)
    from multimodal_clinical_tpu.benchmarks.cremad import _StreamProbe

    d = tmp_path
    (d / "Audios").mkdir()
    for clip in ("good", "bad"):
        _write_wav(d / "Audios" / f"{clip}.wav", seconds=4)
        _write_frames(str(d / "Image-01-FPS-SE" / clip), 2)
    (d / "Annotations.txt").write_text(
        "category&clip&quality&start&end\n"
        "Dog&good&good&1&3\n"
        "Dog&bad&good&0&0\n")
    (d / "t.txt").write_text("Dog&good\nDog&bad\n")

    from multimodal_clinical_tpu.benchmarks.ave import AveDiskDataset

    probe = _StreamProbe(str(d), AveDiskDataset)
    segments = _read_annotations(str(d))
    items = _read_split_txt(str(d), "t.txt", {"Dog": 0}, "stream", probe,
                            segments)
    assert [c for c, _ in items] == ["good"]
    assert "empty Annotations.txt segment" in capsys.readouterr().out


def test_cremad_train_vs_eval_transforms(tmp_path):
    from multimodal_clinical_tpu.benchmarks.cremad import CremadDiskDataset

    d = tmp_path
    os.makedirs(d / "audio_spec")
    with open(d / "audio_spec" / "clip.pkl", "wb") as f:
        pickle.dump(np.zeros((64, 80), np.float32), f)
    _write_frames(str(d / "image" / "clip"), 3, size=(300, 260))

    train_ds = CremadDiskDataset(str(d), [("clip", 1)], train=True, seed=0)
    eval_ds = CremadDiskDataset(str(d), [("clip", 1)], train=False, seed=0)
    tb = train_ds.gather(np.array([0]))
    eb = eval_ds.gather(np.array([0]))
    assert tb["x2"].shape == eb["x2"].shape == (1, 3, 224, 224, 3)
    # eval is deterministic, train is stochastically cropped
    eb2 = CremadDiskDataset(str(d), [("clip", 1)], train=False,
                            seed=9).gather(np.array([0]))
    np.testing.assert_allclose(eb["x2"], eb2["x2"], atol=1e-6)
    assert not np.allclose(tb["x2"], eb["x2"], atol=1e-3)


def test_cremad_gather_worker_invariant(tmp_path):
    """Augmentation rng is stateless per (seed, epoch, index)
    (data/core.sample_rng): any Loader worker split and any gather
    chunking produce identical batches; epochs change the draws."""
    from multimodal_clinical_tpu.benchmarks.cremad import CremadDiskDataset
    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler

    d = tmp_path
    os.makedirs(d / "audio_spec")
    items = []
    for i in range(8):
        clip = f"clip{i}"
        with open(d / "audio_spec" / f"{clip}.pkl", "wb") as f:
            pickle.dump(np.full((64, 80), i, np.float32), f)
        _write_frames(str(d / "image" / clip), 3, size=(300, 260))
        items.append((clip, i % 6))

    def epoch_batches(workers, epoch):
        ds = CremadDiskDataset(str(d), items, train=True, seed=3)
        loader = Loader(ds, 4, SequentialSampler(len(items)),
                        workers=workers)
        loader.set_epoch(epoch)
        return [{k: np.asarray(v) for k, v in b.items()} for b in loader]

    a = epoch_batches(workers=1, epoch=0)
    b = epoch_batches(workers=4, epoch=0)
    assert len(a) == len(b) == 2
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])

    # whole-batch gather (no loader chunking) agrees too
    ds = CremadDiskDataset(str(d), items, train=True, seed=3)
    ds.set_epoch(0)
    whole = ds.gather(np.arange(8))
    np.testing.assert_array_equal(
        whole["x2"], np.concatenate([a[0]["x2"], a[1]["x2"]], axis=0))

    # a different epoch re-draws the augmentations
    c = epoch_batches(workers=1, epoch=1)
    assert not np.allclose(a[0]["x2"], c[0]["x2"], atol=1e-3)


def test_vggsound_wav_resampled_and_empty_audio_guarded(tmp_path):
    """Wavs not at 16 kHz are resampled (the reference's librosa.load
    resamples, vggsound/get_data.py:106); an empty decode raises instead
    of looping forever in the pad-by-tiling loop."""
    from multimodal_clinical_tpu.benchmarks import vggsound

    d = tmp_path
    rows = [("vidA", "0", "dog", "train"), ("vidB", "0", "cat", "train"),
            ("vidA", "0", "dog", "test")]
    with open(d / "vggsound.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    os.makedirs(d / "audio")
    _write_wav(d / "audio" / "vidA_000000.wav", seconds=2, sr=32000)
    _write_wav(d / "audio" / "vidB_000000.wav", seconds=0, sr=16000)  # empty
    for clip in ("vidA_000000", "vidB_000000"):
        _write_frames(str(d / "frames" / clip), 2)

    # unit level: 2 s at 32 kHz -> 32000 samples at 16 kHz
    wav = vggsound._read_wav(str(d / "audio" / "vidA_000000.wav"))
    assert abs(len(wav) - 32000) <= 1

    args = SimpleNamespace(data_path=str(d) + "/", seed=0, num_classes=2,
                           use_video_frames=2, model_type="jprobas")
    bundle = vggsound.get_data(args)
    batch = bundle.train.gather(np.array([0]))
    assert batch["x1_waveform"].shape == (1, 80000)
    with pytest.raises(ValueError, match="empty"):
        bundle.train.gather(np.array([1]))


def test_food101_legacy_label_space_is_train_derived(tmp_path):
    """A food absent from the test csv must not renumber later classes:
    all splits share the train-derived label map (same policy as the
    vggsound shared class map)."""
    from multimodal_clinical_tpu.data.food101_legacy import (
        Food101LegacyDiskDataset,
    )

    (tmp_path / "texts_train.csv").write_text(
        "apple_pie_0001.jpg,some text,apple_pie\n"
        "baklava_0001.jpg,other text,baklava\n"
        "carrot_cake_0001.jpg,more text,carrot_cake\n")
    # test split lacks 'baklava' — per-split maps would give carrot_cake
    # id 1 here vs 2 in train
    (tmp_path / "texts_test.csv").write_text(
        "apple_pie_0002.jpg,t,apple_pie\n"
        "carrot_cake_0002.jpg,t,carrot_cake\n")
    args = SimpleNamespace(max_seq_len=8, legacy_bert_vocab=100, seed=0)
    train = Food101LegacyDiskDataset(str(tmp_path), "train", args)
    test = Food101LegacyDiskDataset(str(tmp_path), "test", args)
    assert dict(zip([f for _, _, f in train.items], train.labels))[
        "carrot_cake"] == 2
    assert dict(zip([f for _, _, f in test.items], test.labels))[
        "carrot_cake"] == 2

    # a test-only food is an error, not a silent new class
    (tmp_path / "texts_test.csv").write_text("durian_0001.jpg,t,durian\n")
    with pytest.raises(ValueError, match="durian"):
        Food101LegacyDiskDataset(str(tmp_path), "test", args)
