"""Offline preprocessing CLI: cremad-audio, check-frames, fix-missing."""

import csv
import os
import pickle
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import preprocess  # noqa: E402


def _write_wav(path, samples, sr=16000):
    pcm = (np.clip(samples, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_cremad_audio_spectrograms(tmp_path):
    wav_dir = tmp_path / "wav"
    out_dir = tmp_path / "spec"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        _write_wav(str(wav_dir / f"clip{i}.wav"),
                   rng.normal(scale=0.1, size=16000 * 2).astype(np.float32))
    preprocess.main(["cremad-audio", "--wav-dir", str(wav_dir),
                     "--out", str(out_dir), "--batch-size", "2"])
    files = sorted(os.listdir(out_dir))
    assert files == ["clip0.pkl", "clip1.pkl", "clip2.pkl"]
    with open(out_dir / "clip0.pkl", "rb") as f:
        spec = pickle.load(f)
    assert spec.shape[0] == 257  # nperseg 512 -> 257 bins
    # standardized per clip (video_preprocessing.py:126-128)
    assert abs(float(spec.mean())) < 1e-3
    assert abs(float(spec.std()) - 1.0) < 1e-2


def test_check_frames_and_fix_missing(tmp_path, capsys):
    root = tmp_path / "frames"
    for clip, n in (("a", 6), ("b", 2)):
        d = root / clip
        d.mkdir(parents=True)
        for i in range(n):
            (d / f"f{i}.jpg").touch()
    preprocess.main(["check-frames", "--frames-root", str(root),
                     "--min-frames", "6"])
    out = capsys.readouterr().out
    assert "b" in out and "1 clip dirs" in out

    data_root = tmp_path / "wavs"
    data_root.mkdir()
    (data_root / "a.wav").touch()
    csv_file = tmp_path / "list.csv"
    with open(csv_file, "w", newline="") as f:
        csv.writer(f).writerows([["a", "cls1"], ["missing", "cls2"]])
    out_csv = tmp_path / "fixed.csv"
    preprocess.main(["fix-missing", "--csv-file", str(csv_file),
                     "--data-root", str(data_root), "--out", str(out_csv)])
    rows = list(csv.reader(open(out_csv)))
    assert rows == [["a", "cls1"]]


def test_noise_sweep_writes_reference_artifact_shapes(tmp_path, monkeypatch):
    import noise_sweep

    # shrink the synthetic enrico geometry for speed
    import multimodal_clinical_tpu.data.synthetic as syn
    monkeypatch.setitem(syn.BENCHMARK_SHAPES, "enrico",
                        [(32, 16, 3), (32, 16, 3)])
    noise_sweep.main([
        "--mode", "x1", "--probs", "0", "0.5",
        "--model-types", "jlogits",
        "--num-seeds", "2", "--num-epochs", "1",
        "--out-dir", str(tmp_path),
    ])
    for name in ("data.csv", "data_x1.csv", "data_x2.csv"):
        rows = list(csv.reader(open(tmp_path / name)))
        assert rows[0] == ["noise_p", "jlogits_acc", "jlogits_std"]
        assert len(rows) == 3  # header + 2 probabilities
        float(rows[1][1])


def test_food101_tokens_pixel_path(tmp_path):
    from PIL import Image

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    Image.new("RGB", (300, 200), (120, 30, 60)).save(img_root / "dish.jpg")
    list_file = tmp_path / "list.tsv"
    list_file.write_text("dish.jpg\tdelicious synthetic dish\n")
    out = tmp_path / "tokens"
    preprocess.main(["food101-tokens", "--list-file", str(list_file),
                     "--image-root", str(img_root), "--out", str(out),
                     "--tokenizer", "/nonexistent"])
    px = np.load(out / "dish_pixel_values.npy")
    # reference stores CHW with the SigLIP 0.5/0.5 normalization
    assert px.shape == (1, 3, 224, 224)
    assert -1.01 <= px.min() and px.max() <= 1.01
