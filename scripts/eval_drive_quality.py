"""Quantitative quality metrics for a quality-drive run.

For each devset pair ``orig_<id>.wav`` / ``synth_<id>.wav`` in an artifacts folder
(written by collect_drive_artifacts.py + drive_quality_r4.sh), computes:

- **MCD-DTW** (dB): mel-cepstral distortion over a DTW alignment of the two log-mel
  sequences. Free synthesis uses *predicted* durations, so the sequences differ in
  length; DTW is the standard alignment for this (same metric family the TTS
  literature reports; the reference never computed one — it relied on listening,
  /root/reference/TRAINING.md "Suggestion" paragraph).
- **F0-RMSE** (Hz) over DTW-aligned frames voiced in BOTH signals (RAPT pitch,
  dsp/pitch.py — the same extractor the importers use, reference
  import_blizzard_2023.py:110-111).
- **VUV error** (%): fraction of DTW-aligned frames whose voicing decisions disagree.
- **duration error** (%): |len(synth) − len(orig)| / len(orig) — free synthesis uses
  predicted durations, so this scores the duration model end-to-end (reference duration
  head: modules.py:941-953).
- **voiced ratio** of the synthesized audio (frames with energy above the floor) as
  a degenerate-output guard (all-silence synthesis scores deceptively well on
  distance metrics).

Writes ``<out>/quality_metrics.json`` and prints a per-pair table; ``--baseline`` adds
a trend row against a previous drive's json (VERDICT r3 item 6).

Trend protocol (VERDICT r4 weak item 1): deltas between drives only mean something
when both were evaluated on the same corpus and devset pair list. The committed
manifest ``artifacts/eval_protocol.json`` pins that contract; this script records the
evaluated pair list + manifest into the metrics json, warns when the evaluated pairs
deviate from the manifest, and marks ``trend_vs_baseline.comparable = false`` (with a
reason) when the baseline's pair list differs from the current one — downstream README
generation surfaces that flag instead of printing meaningless arrows.

Usage:
    JAX_PLATFORMS=cpu python scripts/eval_drive_quality.py \
        --dir artifacts/quality_drive_r4 \
        [--baseline artifacts/quality_drive_r2/quality_metrics.json]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu_jax():
    """Offline metric — never occupy the TPU. The JAX_PLATFORMS env var alone loses
    to the axon plugin (see .claude/skills/verify/SKILL.md), so set the config too."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def log_mel(wav: np.ndarray, sr: int) -> np.ndarray:
    """(T, 80) log10-mel at the framework's feature convention (dsp/mel.py)."""
    import jax

    from ttscube_tpu.dsp.mel import MelSpec, feature_mel_config

    spec = jax.jit(MelSpec(feature_mel_config(sr)))
    return np.asarray(spec(np.asarray(wav, np.float32)))


def mel_to_cepstra(logmel10: np.ndarray, n_coef: int = 13) -> np.ndarray:
    """Orthonormal DCT-II of the *natural-log* mel -> mel cepstra (literature MCD
    convention; our feature mel is log10, dsp/mel.py:156-166, so convert by ln10)."""
    n_mels = logmel10.shape[1]
    k = np.arange(n_mels)
    basis = np.cos(np.pi * np.outer(np.arange(n_coef), (k + 0.5) / n_mels))
    basis *= np.sqrt(2.0 / n_mels)
    basis[0] /= np.sqrt(2.0)
    return (logmel10 * np.log(10.0)) @ basis.T  # (T, n_coef)


def dtw_path(a: np.ndarray, b: np.ndarray):
    """Classic O(T1*T2) DTW over euclidean frame distances; returns (total cost,
    path) where path is a list of (i, j) frame index pairs along the alignment."""
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))  # (T1, T2)
    T1, T2 = d.shape
    acc = np.full((T1 + 1, T2 + 1), np.inf)
    move = np.zeros((T1 + 1, T2 + 1), np.int8)  # 0=diag 1=up(i-1) 2=left(j-1)
    acc[0, 0] = 0.0
    # the (i, j-1) dependency forbids vectorizing over j; T1*T2 is ~500x500 here
    for i in range(1, T1 + 1):
        for j in range(1, T2 + 1):
            cands = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
            k = int(np.argmin(cands))
            acc[i, j] = d[i - 1, j - 1] + cands[k]
            move[i, j] = k
    path = []
    i, j = T1, T2
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        k = move[i, j]
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    path.reverse()
    return float(acc[T1, T2]), path


def mcd_dtw(logmel_a: np.ndarray, logmel_b: np.ndarray):
    """MCD in dB: (10/ln10)*sqrt(2) * mean path distance over cepstra c1..c12.
    Returns (mcd_db, path) so pitch metrics reuse the same alignment."""
    ca = mel_to_cepstra(logmel_a)[:, 1:]
    cb = mel_to_cepstra(logmel_b)[:, 1:]
    cost, path = dtw_path(ca, cb)
    return (10.0 / np.log(10.0)) * np.sqrt(2.0) * cost / max(len(path), 1), path


def f0_metrics(f0_a: np.ndarray, f0_b: np.ndarray, path) -> tuple[float, float]:
    """(F0-RMSE over both-voiced aligned frames, VUV disagreement rate) along a DTW
    path computed on mel frames (same 10 ms hop as the pitch tracks)."""
    ii = np.array([min(i, len(f0_a) - 1) for i, _ in path])
    jj = np.array([min(j, len(f0_b) - 1) for _, j in path])
    va, vb = f0_a[ii] > 0, f0_b[jj] > 0
    vuv_err = float((va != vb).mean()) if len(path) else 0.0
    both = va & vb
    if both.sum() == 0:
        return float("nan"), vuv_err
    rmse = float(np.sqrt(((f0_a[ii][both] - f0_b[jj][both]) ** 2).mean()))
    return rmse, vuv_err


def voiced_ratio(logmel: np.ndarray, floor_db: float = -4.0) -> float:
    """Fraction of frames whose mean log10-mel exceeds a near-silence floor."""
    return float((logmel.mean(axis=1) > floor_db).mean())


def chance_floor_pairs(uids: list) -> list:
    """Mismatched-pair assignment for the chance floor: each uid scored against a
    DIFFERENT uid, same speaker when possible (uid format ``SPK<k>_<sentence>``).
    Deterministic, so every round's floor uses the same assignment."""
    out = []
    for uid in uids:
        spk = uid.split("_")[0]
        same_spk = [u for u in uids if u != uid and u.split("_")[0] == spk]
        pool = same_spk or [u for u in uids if u != uid]
        if not pool:
            continue
        partner = pool[(uids.index(uid) + 1) % len(pool)] if len(pool) > 1 else pool[0]
        out.append((uid, partner))
    return out


def main(args):
    _force_cpu_jax()
    from ttscube_tpu.dsp.pitch import rapt_pitch
    from ttscube_tpu.utils.wavio import read_wav

    pairs = []
    for orig in sorted(glob.glob(os.path.join(args.dir, "orig_*.wav"))):
        uid = os.path.basename(orig)[len("orig_"):-len(".wav")]
        synth = os.path.join(args.dir, f"synth_{uid}.wav")
        if os.path.exists(synth):
            pairs.append((uid, orig, synth))
    if not pairs:
        raise SystemExit(f"no orig_/synth_ wav pairs under {args.dir}")

    rows = []
    orig_mels = {}  # uid -> log-mel of the original (reused for the chance floor)
    for uid, orig, synth in pairs:
        wo, sr = read_wav(orig)
        ws, sr2 = read_wav(synth)
        assert sr == sr2, (sr, sr2)
        mo, ms = log_mel(wo, sr), log_mel(ws, sr)
        orig_mels[uid] = mo
        mcd, path = mcd_dtw(mo, ms)
        f0o = rapt_pitch(np.asarray(wo, np.float32), sr=sr)
        f0s = rapt_pitch(np.asarray(ws, np.float32), sr=sr)
        f0_rmse, vuv_err = f0_metrics(np.asarray(f0o), np.asarray(f0s), path)
        dur_o, dur_s = len(wo) / sr, len(ws) / sr
        row = {
            "id": uid,
            "mcd_dtw_db": round(mcd, 3),
            "f0_rmse_hz": round(f0_rmse, 2) if np.isfinite(f0_rmse) else None,
            "vuv_error_pct": round(100.0 * vuv_err, 2),
            "dur_error_pct": round(100.0 * abs(dur_s - dur_o) / max(dur_o, 1e-9), 2),
            "dur_orig_s": round(dur_o, 2),
            "dur_synth_s": round(dur_s, 2),
            "voiced_ratio_synth": round(voiced_ratio(ms), 3),
            "voiced_ratio_orig": round(voiced_ratio(mo), 3),
        }
        rows.append(row)
        print(f"{uid}: MCD-DTW {row['mcd_dtw_db']:.2f} dB  "
              f"F0-RMSE {row['f0_rmse_hz'] if row['f0_rmse_hz'] is not None else 'n/a'} Hz  "
              f"VUV-err {row['vuv_error_pct']:.1f}%  "
              f"dur {row['dur_orig_s']:.2f}s->{row['dur_synth_s']:.2f}s "
              f"({row['dur_error_pct']:.1f}%)  "
              f"voiced {row['voiced_ratio_orig']:.2f}->{row['voiced_ratio_synth']:.2f}")

    def _mean(key):
        vals = [r[key] for r in rows if r[key] is not None]
        return round(float(np.mean(vals)), 3) if vals else None

    summary = {
        "pairs": rows,
        "n_pairs": len(rows),
        "mean_mcd_dtw_db": _mean("mcd_dtw_db"),
        "mean_f0_rmse_hz": _mean("f0_rmse_hz"),
        "mean_vuv_error_pct": _mean("vuv_error_pct"),
        "mean_dur_error_pct": _mean("dur_error_pct"),
        "mean_voiced_ratio_synth": _mean("voiced_ratio_synth"),
    }
    # Chance floor (r4 README_5k.md calibration, now computed every run): MCD-DTW
    # between MISMATCHED original pairs — each devset recording scored against a
    # different sentence, same speaker when possible. A mean MCD near this line means
    # "no better than comparing arbitrary corpus audio"; the deliverable is a margin
    # clearly below it. (The oracle floor — corpus-generator re-synthesis under a
    # different noise realization, 1.39 dB in r4 — needs corpus internals and stays a
    # documented one-off.)
    uids = [r["id"] for r in rows]
    chance_pairs, chance_vals = [], []
    for uid, partner in chance_floor_pairs(uids):
        mcd_x, _ = mcd_dtw(orig_mels[uid], orig_mels[partner])
        chance_pairs.append([uid, partner])
        chance_vals.append(mcd_x)
    if chance_vals:
        floor = round(float(np.mean(chance_vals)), 3)
        summary["calibration"] = {
            "chance_floor_mcd_dtw_db": floor,
            "chance_pairs": chance_pairs,
            "margin_below_chance_db": (round(floor - summary["mean_mcd_dtw_db"], 3)
                                       if summary["mean_mcd_dtw_db"] is not None
                                       else None),
        }
        print(f"chance floor (mismatched originals): {floor:.2f} dB — "
              f"mean MCD margin below it: "
              f"{summary['calibration']['margin_below_chance_db']:+.2f} dB")
    pair_ids = sorted(r["id"] for r in rows)
    summary["protocol"] = {"pair_ids": pair_ids}
    if args.protocol and os.path.exists(args.protocol):
        manifest = json.load(open(args.protocol))
        summary["protocol"]["manifest_file"] = args.protocol
        summary["protocol"]["corpus"] = manifest.get("corpus")
        want = sorted(manifest.get("pair_ids", []))
        if want and want != pair_ids:
            summary["protocol"]["matches_manifest"] = False
            print(f"WARNING: evaluated pairs deviate from {args.protocol} — "
                  f"extra={sorted(set(pair_ids) - set(want))} "
                  f"missing={sorted(set(want) - set(pair_ids))}", file=sys.stderr)
        else:
            summary["protocol"]["matches_manifest"] = bool(want)
    if args.baseline and os.path.exists(args.baseline):
        base = json.load(open(args.baseline))
        base_ids = sorted(p.get("id") for p in base.get("pairs", []))
        comparable = base_ids == pair_ids
        trend = {}
        for k in ("mean_mcd_dtw_db", "mean_f0_rmse_hz", "mean_vuv_error_pct",
                  "mean_dur_error_pct"):
            if base.get(k) is not None and summary.get(k) is not None:
                trend[k] = {"baseline": base[k], "now": summary[k],
                            "delta": round(summary[k] - base[k], 3)}
        summary["trend_vs_baseline"] = {"baseline_file": args.baseline,
                                        "baseline_n_pairs": base.get("n_pairs",
                                                                     len(base.get("pairs", []))),
                                        "comparable": comparable,
                                        "metrics": trend}
        if not comparable:
            summary["trend_vs_baseline"]["reason"] = (
                "baseline was evaluated on a different devset pair list — deltas are "
                "not meaningful (VERDICT r4: r4-vs-r2 compared incomparables)")
            print(f"WARNING: baseline {args.baseline} pair list differs from this "
                  f"eval's — trend marked non-comparable", file=sys.stderr)
        for k, t in trend.items():
            arrow = ("improved" if t["delta"] < 0
                     else "flat" if t["delta"] == 0 else "regressed")
            if not comparable:
                arrow = "NOT COMPARABLE (different pair list)"
            print(f"trend {k}: {t['baseline']} -> {t['now']} ({t['delta']:+.3f}, {arrow})")
    out = os.path.join(args.dir, "quality_metrics.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"mean MCD-DTW {summary['mean_mcd_dtw_db']:.2f} dB over {len(rows)} pairs "
          f"-> {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--baseline", default=None,
                    help="previous drive's quality_metrics.json for a trend table")
    ap.add_argument("--protocol",
                    default=os.path.join(
                        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", "eval_protocol.json"),
                    help="pinned corpus/devset manifest (committed); pass '' to skip")
    main(ap.parse_args())
