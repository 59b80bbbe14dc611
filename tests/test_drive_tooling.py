"""Drive-tooling behavior locks: loss-log parsing across resume flavors and the
artifact README's trend-comparability surfacing.

These scripts package the round deliverable (training curves + quality metrics),
so their edge cases are pinned here like any other component:
- `collect_drive_artifacts.parse_log`: a same-round ``--resume`` with `.opt.last`
  intact REPLAYS steps after the last checkpoint (step counter carried) — replayed
  rows must replace the stale ones, not double-count; a weights-only restart rewinds
  the counter to ~0 — a new monotonic segment must be offset, not merged.
- `eval_drive_quality` trend protocol: a baseline evaluated on a different devset
  pair list must be marked non-comparable, and `make_drive_readme` must surface
  that instead of improved/regressed arrows.
"""

import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_log(path, steps):
    with open(path, "w") as f:
        for s, v in steps:
            f.write(f"step {s}: loss_mel={v}\n")


def test_parse_log_monotonic_passthrough(tmp_path):
    log = tmp_path / "a.log"
    _write_log(log, [(50, 1.0), (100, 0.9), (150, 0.8)])
    rows = _load("collect_drive_artifacts").parse_log(str(log))
    assert [r["step"] for r in rows] == [50, 100, 150]


def test_parse_log_opt_resume_replay_dedupes(tmp_path):
    # kill after step 200, resume from the step-150 checkpoint: 150/200 replayed
    log = tmp_path / "a.log"
    _write_log(log, [(50, 1.0), (100, 0.9), (150, 0.85), (200, 0.8),
                     (150, 0.85), (200, 0.79), (250, 0.75)])
    rows = _load("collect_drive_artifacts").parse_log(str(log))
    assert [r["step"] for r in rows] == [50, 100, 150, 200, 250]
    # the replayed values win over the stale pre-kill rows
    assert rows[3]["loss_mel"] == 0.79


def test_parse_log_weights_only_restart_offsets(tmp_path):
    # cross-round weights-only resume: counter restarts near zero -> new segment
    log = tmp_path / "a.log"
    _write_log(log, [(50, 1.0), (200, 0.8), (50, 0.78), (100, 0.75)])
    rows = _load("collect_drive_artifacts").parse_log(str(log))
    assert [r["step"] for r in rows] == [50, 200, 250, 300]


def test_parse_log_replay_then_restart(tmp_path):
    log = tmp_path / "a.log"
    _write_log(log, [(100, 1.0), (200, 0.9),      # segment 1
                     (150, 0.95), (200, 0.89),     # small rewind: replay
                     (50, 0.7)])                   # big rewind: restart
    rows = _load("collect_drive_artifacts").parse_log(str(log))
    assert [r["step"] for r in rows] == [100, 150, 200, 250]
    assert rows[-1]["loss_mel"] == 0.7


def _metrics(pairs, trend=None):
    m = {"pairs": [{"id": p} for p in pairs], "n_pairs": len(pairs),
         "mean_mcd_dtw_db": 40.0, "mean_f0_rmse_hz": 30.0,
         "mean_vuv_error_pct": 10.0, "mean_dur_error_pct": 5.0,
         "mean_voiced_ratio_synth": 0.8}
    if trend is not None:
        m["trend_vs_baseline"] = trend
    return m


def test_readme_surfaces_non_comparable_trend(tmp_path):
    out = tmp_path / "art"
    out.mkdir()
    trend = {"baseline_file": "old.json", "baseline_n_pairs": 2,
             "comparable": False,
             "reason": "baseline was evaluated on a different devset pair list",
             "metrics": {"mean_mcd_dtw_db":
                         {"baseline": 45.0, "now": 40.0, "delta": -5.0}}}
    json.dump(_metrics(["A", "B"], trend), open(out / "quality_metrics.json", "w"))
    mod = _load("make_drive_readme")
    mod.build_readme(str(out))
    text = open(out / "README.md").read()
    assert "NOT COMPARABLE" in text
    assert "not comparable" in text
    assert "regressed" not in text and "improved" not in text


def test_readme_comparable_trend_and_hf_section(tmp_path):
    out = tmp_path / "art"
    (out / "hf").mkdir(parents=True)
    trend = {"baseline_file": "prev.json", "baseline_n_pairs": 2,
             "comparable": True,
             "metrics": {"mean_mcd_dtw_db":
                         {"baseline": 45.0, "now": 40.0, "delta": -5.0}}}
    json.dump(_metrics(["A", "B"], trend), open(out / "quality_metrics.json", "w"))
    hf_trend = {"baseline_file": "quality_metrics.json", "baseline_n_pairs": 2,
                "comparable": True,
                "metrics": {"mean_mcd_dtw_db":
                            {"baseline": 40.0, "now": 41.0, "delta": 1.0}}}
    json.dump(_metrics(["A", "B"], hf_trend),
              open(out / "hf" / "quality_metrics.json", "w"))
    mod = _load("make_drive_readme")
    mod.build_readme(str(out))
    text = open(out / "README.md").read()
    assert "improved" in text
    assert "HF-conditioned variant" in text
    assert "main 40.0 -> hf 41.0" in text
