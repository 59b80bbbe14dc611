"""Quantitative quality metrics for a quality-drive run.

For each devset pair ``orig_<id>.wav`` / ``synth_<id>.wav`` in an artifacts folder
(written by collect_drive_artifacts.py + drive_quality_r3.sh), computes:

- **MCD-DTW** (dB): mel-cepstral distortion over a DTW alignment of the two log-mel
  sequences. Free synthesis uses *predicted* durations, so the sequences differ in
  length; DTW is the standard alignment for this (same metric family the TTS
  literature reports; the reference never computed one — it relied on listening,
  /root/reference/TRAINING.md "Suggestion" paragraph).
- **voiced ratio** of the synthesized audio (frames with energy above the floor) as
  a degenerate-output guard (all-silence synthesis scores deceptively well on
  distance metrics).

Writes ``<out>/quality_metrics.json`` and prints a per-pair table.

Usage:
    JAX_PLATFORMS=cpu python scripts/eval_drive_quality.py \
        --dir artifacts/quality_drive_r3
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def dtw_path_cost(a: np.ndarray, b: np.ndarray) -> tuple[float, int]:
    """Classic O(T1*T2) DTW over euclidean frame distances; returns (total cost,
    path length) so the caller can take a per-frame mean."""
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))  # (T1, T2)
    T1, T2 = d.shape
    acc = np.full((T1 + 1, T2 + 1), np.inf)
    steps = np.zeros((T1 + 1, T2 + 1), np.int32)
    acc[0, 0] = 0.0
    # the (i, j-1) dependency forbids vectorizing over j; T1*T2 is ~500x500 here
    for i in range(1, T1 + 1):
        for j in range(1, T2 + 1):
            cands = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
            k = int(np.argmin(cands))
            acc[i, j] = d[i - 1, j - 1] + cands[k]
            steps[i, j] = (steps[i - 1, j - 1], steps[i - 1, j], steps[i, j - 1])[k] + 1
    return float(acc[T1, T2]), int(steps[T1, T2])


def mcd_dtw(logmel_a: np.ndarray, logmel_b: np.ndarray) -> float:
    """MCD in dB: (10/ln10)*sqrt(2) * mean path distance over cepstra c1..c12."""
    ca = mel_to_cepstra(logmel_a)[:, 1:]
    cb = mel_to_cepstra(logmel_b)[:, 1:]
    cost, length = dtw_path_cost(ca, cb)
    return (10.0 / np.log(10.0)) * np.sqrt(2.0) * cost / max(length, 1)


def voiced_ratio(logmel: np.ndarray, floor_db: float = -4.0) -> float:
    """Fraction of frames whose mean log10-mel exceeds a near-silence floor."""
    return float((logmel.mean(axis=1) > floor_db).mean())


def main(args):
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
    for uid, orig, synth in pairs:
        wo, sr = read_wav(orig)
        ws, sr2 = read_wav(synth)
        assert sr == sr2, (sr, sr2)
        mo, ms = log_mel(wo, sr), log_mel(ws, sr)
        row = {
            "id": uid,
            "mcd_dtw_db": round(mcd_dtw(mo, ms), 3),
            "dur_orig_s": round(len(wo) / sr, 2),
            "dur_synth_s": round(len(ws) / sr, 2),
            "voiced_ratio_synth": round(voiced_ratio(ms), 3),
            "voiced_ratio_orig": round(voiced_ratio(mo), 3),
        }
        rows.append(row)
        print(f"{uid}: MCD-DTW {row['mcd_dtw_db']:.2f} dB  "
              f"dur {row['dur_orig_s']:.2f}s->{row['dur_synth_s']:.2f}s  "
              f"voiced {row['voiced_ratio_orig']:.2f}->{row['voiced_ratio_synth']:.2f}")

    summary = {
        "pairs": rows,
        "mean_mcd_dtw_db": round(float(np.mean([r["mcd_dtw_db"] for r in rows])), 3),
        "mean_voiced_ratio_synth": round(
            float(np.mean([r["voiced_ratio_synth"] for r in rows])), 3),
    }
    out = os.path.join(args.dir, "quality_metrics.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"mean MCD-DTW {summary['mean_mcd_dtw_db']:.2f} dB over {len(rows)} pairs "
          f"-> {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    main(ap.parse_args())
