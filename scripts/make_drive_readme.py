"""Regenerate a quality-drive artifact README from the artifacts themselves.

Reads {main_,hf_}losses.csv, phonemizer_final.txt and quality_metrics.json out of
--dir and writes README.md (drive config header, final losses, metric trend table vs
the baseline metrics json recorded inside quality_metrics.json). Shared by
scripts/drive_quality_r4.sh (initial drive) and drive_quality_r4_extend.sh (resume /
salvage re-eval) so a re-evaluated artifact dir never carries a stale README.
(Reference workflow being documented: /root/reference/TRAINING.md steps 1-3.)
"""

import argparse
import csv
import json
import os


def build_readme(out, speakers="3", sentences="220", title="Quality drive"):
    lines = [
        f"# {title}",
        "",
        f"Corpus: {speakers} synthetic speakers x {sentences} sentences"
        " (scripts/make_demo_corpus.py),",
        "imported via scripts/import_blizzard_2023.py; main Cubegan run step range",
        "below (batch 16, plain generator path). A resumed run continues from the",
        "committed cross-round checkpoint (scripts/drive_restore_ckpt.sh) — the",
        "losses.csv step axis is monotonic across resumes. Phonemizer: aligned,",
        "PACC/SACC below. Pipeline: corpus -> phonemizer -> GAN runs -> export_model",
        "-> split-volume reassembly -> TTSCube API synthesis (api_*.wav) -> devset",
        "free synthesis (synth_*.wav vs orig_*.wav) -> MCD-DTW/F0/VUV/duration",
        "metrics. (Reference workflow: /root/reference/TRAINING.md steps 1-3.)",
        "",
    ]
    pf = os.path.join(out, "phonemizer_final.txt")
    if os.path.exists(pf):
        final = open(pf).read().strip()
        if final:
            lines += ["Phonemizer final: " + final.split("\n")[-1].strip(), ""]
    for pref in ("main_", "hf_"):
        c = os.path.join(out, f"{pref}losses.csv")
        if os.path.exists(c):
            rows = list(csv.DictReader(open(c)))
            if rows:
                first, last = rows[0], rows[-1]
                lines += [f"{pref}run: step {first['step']} -> {last['step']}, "
                          f"loss_mel {float(first.get('loss_mel', 'nan')):.3f} -> "
                          f"{float(last.get('loss_mel', 'nan')):.3f}"]
    q = os.path.join(out, "quality_metrics.json")
    if os.path.exists(q):
        m = json.load(open(q))
        lines += ["", f"## Metrics ({m.get('n_pairs')} devset pairs, free synthesis)",
                  ""]
        for k in ("mean_mcd_dtw_db", "mean_f0_rmse_hz", "mean_vuv_error_pct",
                  "mean_dur_error_pct", "mean_voiced_ratio_synth"):
            if m.get(k) is not None:
                lines.append(f"- {k}: {m[k]}")
        cal = m.get("calibration", {})
        if cal.get("chance_floor_mcd_dtw_db") is not None:
            lines.append(
                f"- chance floor (mismatched originals): "
                f"{cal['chance_floor_mcd_dtw_db']} dB — margin below it: "
                f"**{cal.get('margin_below_chance_db'):+.2f} dB**")
        t = m.get("trend_vs_baseline", {})
        if t.get("metrics"):
            lines += ["", f"## Trend vs baseline `{t.get('baseline_file', '?')}` "
                          f"({t.get('baseline_n_pairs')} pairs)", ""]
            if t.get("comparable") is False:
                lines += ["**NOT COMPARABLE**: " + t.get(
                    "reason", "baseline used a different devset pair list"), ""]
            if os.path.exists(os.path.join(out, "README_5k.md")):
                lines += ["(Previous 5k-step drive + metric-scale calibration: "
                          "README_5k.md — chance floor 49.5 dB, oracle floor 1.4 dB.)",
                          ""]
            for k, d in t["metrics"].items():
                if t.get("comparable") is False:
                    arrow = "not comparable"
                else:
                    arrow = ("improved" if d["delta"] < 0
                             else "flat" if d["delta"] == 0 else "regressed")
                lines.append(f"- {k}: {d['baseline']} -> {d['now']} "
                             f"({d['delta']:+.3f}, {arrow})")
    qh = os.path.join(out, "hf", "quality_metrics.json")
    if os.path.exists(qh):
        m = json.load(open(qh))
        lines += ["", f"## HF-conditioned variant ({m.get('n_pairs')} pairs, "
                      "same protocol — hf/quality_metrics.json)", ""]
        for k in ("mean_mcd_dtw_db", "mean_f0_rmse_hz", "mean_vuv_error_pct",
                  "mean_dur_error_pct", "mean_voiced_ratio_synth"):
            if m.get(k) is not None:
                lines.append(f"- {k}: {m[k]}")
        cal = m.get("calibration", {})
        if cal.get("chance_floor_mcd_dtw_db") is not None:
            lines.append(
                f"- chance floor (mismatched originals): "
                f"{cal['chance_floor_mcd_dtw_db']} dB — margin below it: "
                f"**{cal.get('margin_below_chance_db'):+.2f} dB**")
        t = m.get("trend_vs_baseline", {})
        if t.get("metrics") and t.get("comparable"):
            lines += ["", "vs the main run (negative delta = HF variant better):", ""]
            for k, d in t["metrics"].items():
                lines.append(f"- {k}: main {d['baseline']} -> hf {d['now']} "
                             f"({d['delta']:+.3f})")
    path = os.path.join(out, "README.md")
    open(path, "w").write("\n".join(lines) + "\n")
    return path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--speakers", default="3")
    ap.add_argument("--sentences", default="220")
    ap.add_argument("--title", default="Quality drive")
    a = ap.parse_args()
    print("wrote", build_readme(a.dir, a.speakers, a.sentences, a.title))
