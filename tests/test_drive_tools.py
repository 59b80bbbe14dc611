"""Unit tests for the quality-drive tooling (scripts/collect_drive_artifacts.py,
scripts/eval_drive_quality.py) — the log parser, curve renderer, and MCD-DTW metric
these drives' artifacts depend on."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "scripts"))

import collect_drive_artifacts as cda  # noqa: E402
import eval_drive_quality as edq  # noqa: E402


def test_parse_log_step_lines(tmp_path):
    log = tmp_path / "train.log"
    log.write_text(
        "epoch 0 starting\n"
        "step 10: loss_mel=2.5 loss_d=1.0 lr=1e-4\n"
        "garbage line\n"
        "step 20: loss_mel=1.25 loss_d=0.5 lr=9e-05\n")
    rows = cda.parse_log(str(log))
    assert [r["step"] for r in rows] == [10, 20]
    assert rows[0]["loss_mel"] == 2.5
    assert rows[1]["lr"] == 9e-05


def test_render_curve_writes_png(tmp_path):
    out = tmp_path / "c.png"
    cda.render_curve([0, 10, 20], [2.0, 1.0, 0.5], str(out), title="loss")
    assert out.exists() and out.stat().st_size > 0


def test_mcd_dtw_identical_is_zero():
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(40, 80)).astype(np.float32)
    assert edq.mcd_dtw(mel, mel) == 0.0


def test_mcd_dtw_alignment_invariance():
    # DTW must absorb a pure time-stretch: repeating every frame twice should score
    # (near) zero against the original, while a genuinely different sequence doesn't.
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(30, 80)).astype(np.float32)
    stretched = np.repeat(mel, 2, axis=0)
    other = rng.normal(size=(30, 80)).astype(np.float32)
    assert edq.mcd_dtw(mel, stretched) < 1e-6
    assert edq.mcd_dtw(mel, other) > 1.0


def test_mcd_dtw_scales_with_distortion():
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(50, 80)).astype(np.float32)
    small = edq.mcd_dtw(mel, mel + 0.01)
    large = edq.mcd_dtw(mel, mel + 0.1)
    assert 0 < small < large


def test_voiced_ratio_bounds():
    silent = np.full((20, 80), -6.0, np.float32)
    loud = np.zeros((20, 80), np.float32)
    assert edq.voiced_ratio(silent) == 0.0
    assert edq.voiced_ratio(loud) == 1.0
