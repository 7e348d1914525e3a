"""tools/parity_run.py harness: trains, exports the reference CSV layout,
prints a verdict — and refuses to verdict on synthetic twins."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

pytestmark = pytest.mark.slow


def test_parity_run_refuses_synthetic_without_flag(tmp_path, capsys):
    from tools.parity_run import main

    rc = main(["--dir", "mimic", "--model-type", "jlogits", "--seeds", "1",
               "--set", "num_epochs=1",
               "--set", f"data_path={tmp_path}/",
               "--set", f"ckpt_dir={tmp_path}/ckpts"])
    assert rc == 2
    assert "SYNTHETIC twin" in capsys.readouterr().out


def test_parity_run_synthetic_report_only(tmp_path, capsys):
    from tools.parity_run import main

    out_csv = str(tmp_path / "export.csv")
    rc = main(["--dir", "mimic", "--model-type", "jlogits", "--seeds", "1",
               "--allow-synthetic", "--out", out_csv,
               "--set", "num_epochs=1",
               "--set", f"data_path={tmp_path}/",
               "--set", f"ckpt_dir={tmp_path}/ckpts"])
    out = capsys.readouterr().out
    assert rc == 0, out
    # synthetic run: targets are shown but never PASS/FAIL
    assert "REPORT-ONLY (synthetic)" in out
    assert "FAIL" not in out and " PASS" not in out
    assert os.path.exists(out_csv)
    with open(out_csv) as f:
        header = f.readline()
    assert "test_acc_epoch" in header  # the reference's W&B export layout


def test_parity_run_fixture_mode(tmp_path, capsys):
    """--fixture fabricates a tiny real-format cremad corpus and drives
    the FULL train -> CSV -> verdict path (real on-disk layout, so the
    synthetic-twin refusal must NOT trip); the harness stays
    regression-tested on machines without data (VERDICT r3 item 8)."""
    from tools.parity_run import main

    out_csv = str(tmp_path / "export.csv")
    rc = main(["--dir", "cremad", "--fixture", "--out", out_csv,
               "--set", "compute_dtype=float32"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "synthetic=False" in out
    assert "report-only" in out  # cremad has no published accuracy
    assert os.path.exists(out_csv)
    with open(out_csv) as f:
        header = f.readline()
    assert "test_acc_epoch" in header


def test_parity_run_fixture_mimic_targets_report_only(tmp_path, capsys):
    """--fixture on MIMIC — the 50-seed parity workflow's actual target
    benchmark (mimic_jlogits.csv): fabricates a real-format im.pk (pickle
    keys, inf/nan cells, 6-way label construction), runs the multi-seed
    path end to end, and the published targets print REPORT-ONLY (a
    fixture-scale accuracy must never PASS/FAIL against 0.7727)."""
    from tools.parity_run import main

    out_csv = str(tmp_path / "export.csv")
    rc = main(["--dir", "mimic", "--model-type", "jlogits", "--fixture",
               "--seeds", "2", "--out", out_csv])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "synthetic=False" in out
    assert "REPORT-ONLY (fixture)" in out
    assert "FAIL" not in out and ": PASS" not in out
    assert os.path.exists(out_csv)
    with open(out_csv) as f:
        header = f.readline()
    assert "test_acc_epoch" in header


def test_parity_run_fixture_enrico(tmp_path, capsys):
    """--fixture on enrico: real csv+screenshot/wireframe layout through
    the adapter's shuffle-split + native decode, report-only verdict."""
    from tools.parity_run import main

    out_csv = str(tmp_path / "export.csv")
    rc = main(["--dir", "enrico", "--fixture", "--out", out_csv,
               "--set", "compute_dtype=float32"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "synthetic=False" in out
    assert os.path.exists(out_csv)


def test_parity_run_fixture_rejects_other_dirs(capsys):
    from tools.parity_run import main

    assert main(["--dir", "food101", "--fixture"]) == 2
