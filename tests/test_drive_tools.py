"""Unit tests for the quality-drive tooling (scripts/collect_drive_artifacts.py,
scripts/eval_drive_quality.py) — the log parser, curve renderer, and the MCD-DTW /
F0 / VUV metrics these drives' artifacts depend on."""

import importlib.util
import os

import numpy as np

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "scripts")


def _load(name):
    # load by explicit file path instead of sys.path.insert(0, scripts/): generically
    # named scripts modules (patch.py, g2p.py, ...) must not shadow stdlib/package
    # imports for the rest of the pytest session
    spec = importlib.util.spec_from_file_location(
        f"drive_tools_{name}", os.path.join(_SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


cda = _load("collect_drive_artifacts")
edq = _load("eval_drive_quality")


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


def test_parse_log_restarted_step_counter(tmp_path):
    # a weights-only resume (cross-round restore) restarts the in-log counter at 0;
    # the parser must offset each new ascending segment so curves stay monotonic
    log = tmp_path / "train.log"
    log.write_text(
        "step 50: loss_mel=2.0\n"
        "step 100: loss_mel=1.5\n"
        "\tepoch 2 (12.0s) val: loss_mel=1.4\n"
        "step 50: loss_mel=1.3\n"      # resumed run, counter restarted
        "step 100: loss_mel=1.1\n"
        "step 50: loss_mel=1.0\n")     # a second resume
    rows = cda.parse_log(str(log))
    assert [r["step"] for r in rows] == [50, 100, 150, 200, 250]
    assert [r["loss_mel"] for r in rows] == [2.0, 1.5, 1.3, 1.1, 1.0]


def test_render_curve_writes_png(tmp_path):
    out = tmp_path / "c.png"
    cda.render_curve([0, 10, 20], [2.0, 1.0, 0.5], str(out), title="loss")
    assert out.exists() and out.stat().st_size > 0


def test_mcd_dtw_identical_is_zero():
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(40, 80)).astype(np.float32)
    mcd, path = edq.mcd_dtw(mel, mel)
    assert mcd == 0.0
    assert path == [(i, i) for i in range(40)]  # identity alignment


def test_mcd_dtw_alignment_invariance():
    # DTW must absorb a pure time-stretch: repeating every frame twice should score
    # (near) zero against the original, while a genuinely different sequence doesn't.
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(30, 80)).astype(np.float32)
    stretched = np.repeat(mel, 2, axis=0)
    other = rng.normal(size=(30, 80)).astype(np.float32)
    assert edq.mcd_dtw(mel, stretched)[0] < 1e-6
    assert edq.mcd_dtw(mel, other)[0] > 1.0


def test_mcd_dtw_scales_with_distortion():
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(50, 80)).astype(np.float32)
    small = edq.mcd_dtw(mel, mel + 0.01)[0]
    large = edq.mcd_dtw(mel, mel + 0.1)[0]
    assert 0 < small < large


def test_f0_metrics_perfect_match():
    f0 = np.array([0, 120, 125, 130, 0, 0, 140, 0], np.float32)
    path = [(i, i) for i in range(len(f0))]
    rmse, vuv = edq.f0_metrics(f0, f0, path)
    assert rmse == 0.0 and vuv == 0.0


def test_f0_metrics_offset_and_vuv():
    a = np.array([0, 100, 100, 100, 0], np.float32)
    b = np.array([0, 110, 110, 110, 110], np.float32)  # +10 Hz, one extra voiced frame
    path = [(i, i) for i in range(5)]
    rmse, vuv = edq.f0_metrics(a, b, path)
    assert abs(rmse - 10.0) < 1e-6
    assert abs(vuv - 0.2) < 1e-6  # 1 of 5 aligned frames disagrees on voicing


def test_f0_metrics_all_unvoiced_is_nan_rmse():
    a = np.zeros(6, np.float32)
    path = [(i, i) for i in range(6)]
    rmse, vuv = edq.f0_metrics(a, a, path)
    assert np.isnan(rmse) and vuv == 0.0


def test_voiced_ratio_bounds():
    silent = np.full((20, 80), -6.0, np.float32)
    loud = np.zeros((20, 80), np.float32)
    assert edq.voiced_ratio(silent) == 0.0
    assert edq.voiced_ratio(loud) == 1.0


def test_chance_floor_pairs_same_speaker_never_self():
    uids = [f"SPK{s}_{i:08d}" for s in range(3) for i in range(4)]
    pairs = edq.chance_floor_pairs(uids)
    assert len(pairs) == len(uids)
    for uid, partner in pairs:
        assert partner != uid
        assert partner.split("_")[0] == uid.split("_")[0]  # same speaker available
    # deterministic: same input -> same assignment (round-over-round floors compare)
    assert pairs == edq.chance_floor_pairs(list(uids))


def test_chance_floor_pairs_falls_back_across_speakers():
    uids = ["SPK0_00000000", "SPK1_00000000"]  # one utterance per speaker
    pairs = edq.chance_floor_pairs(uids)
    assert pairs == [("SPK0_00000000", "SPK1_00000000"),
                     ("SPK1_00000000", "SPK0_00000000")]
    assert edq.chance_floor_pairs(["SPK0_00000000"]) == []
