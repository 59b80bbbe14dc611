"""Collect quality-drive artifacts: loss curves (CSV+PNG) from a trainer log, plus
copies of devset originals and synthesized outputs.

Usage:
    python scripts/collect_drive_artifacts.py --log /tmp/corpus_r3/train.log \
        --out artifacts/quality_drive_r3 [--prefix main_]

Parses the `step N: k=v ...` lines `ttscube_tpu.train.loop` emits (train/loop.py:79-82)
and the per-epoch `epoch E (Ts) val: k=v` lines into {prefix}losses.csv, and renders
{prefix}loss_<metric>.png per loss column (pure-PIL polyline, no plotting deps).
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEP_RE = re.compile(r"^step (\d+): (.*)$")
KV_RE = re.compile(r"([A-Za-z0-9_]+)=([-+0-9.eE]+)")


def parse_log(path):
    """Parse `step N: k=v ...` lines into rows with monotonic step numbers.

    A weights-only resume restarts the in-log step counter at 0 (train/loop.py:71
    reads `state.step`, which a cross-round restore does not carry), so an appended
    log contains several ascending segments. Only a restart-shaped drop (the raw
    counter rewinds past half the previous value) starts a new segment, offset by
    the previous segment's last absolute step. A SMALL rewind is the other resume
    path — same-round `--resume` with `.opt.last` intact carries `state.step`, so
    the trainer replays the steps after the last checkpoint (e.g. ...4050, 4100,
    kill, resume → 4050 again); those stale overlapping rows are dropped instead of
    offset, so the step axis never double-counts.
    """
    rows = []
    offset = 0
    prev_raw = None
    for line in open(path, errors="replace"):
        m = STEP_RE.match(line.strip())
        if not m:
            continue
        raw = int(m.group(1))
        if prev_raw is not None and raw <= prev_raw:
            if raw <= prev_raw // 2:
                offset = rows[-1]["step"]
            else:
                cutoff = raw + offset
                while rows and rows[-1]["step"] >= cutoff:
                    rows.pop()
        prev_raw = raw
        row = {"step": raw + offset}
        for k, v in KV_RE.findall(m.group(2)):
            try:
                row[k] = float(v)
            except ValueError:
                pass
        rows.append(row)
    return rows


def render_curve(steps, values, path, title=""):
    from PIL import Image, ImageDraw

    W, H, pad = 900, 300, 40
    img = Image.new("RGB", (W, H), (255, 255, 255))
    d = ImageDraw.Draw(img)
    v = np.asarray(values, np.float64)
    s = np.asarray(steps, np.float64)
    if len(v) < 2:
        img.save(path)
        return
    lo, hi = float(np.nanmin(v)), float(np.nanmax(v))
    hi = hi if hi > lo else lo + 1e-9
    xs = pad + (W - 2 * pad) * (s - s[0]) / max(s[-1] - s[0], 1)
    ys = H - pad - (H - 2 * pad) * (v - lo) / (hi - lo)
    d.line(list(zip(xs.tolist(), ys.tolist())), fill=(40, 80, 200), width=2)
    d.rectangle([pad, pad, W - pad, H - pad], outline=(0, 0, 0))
    d.text((pad, 8), f"{title}  min={lo:.4f} max={hi:.4f} last={v[-1]:.4f}",
           fill=(0, 0, 0))
    d.text((pad, H - pad + 6), f"step {int(s[0])} .. {int(s[-1])}", fill=(0, 0, 0))
    img.save(path)


def main(args):
    rows = parse_log(args.log)
    if not rows:
        raise SystemExit(f"no `step N:` lines found in {args.log}")
    keys = sorted({k for r in rows for k in r} - {"step"})
    os.makedirs(args.out, exist_ok=True)
    csv_path = os.path.join(args.out, f"{args.prefix}losses.csv")
    with open(csv_path, "w") as f:
        f.write("step," + ",".join(keys) + "\n")
        for r in rows:
            f.write(str(r["step"]) + ","
                    + ",".join(f"{r.get(k, float('nan')):.6f}" for k in keys) + "\n")
    for k in keys:
        pts = [(r["step"], r[k]) for r in rows if k in r]
        if len(pts) >= 2:
            render_curve([p[0] for p in pts], [p[1] for p in pts],
                         os.path.join(args.out, f"{args.prefix}loss_{k}.png"), title=k)
    print(f"wrote {csv_path} (+{len(keys)} curve PNGs) from {len(rows)} log points")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--prefix", default="")
    main(ap.parse_args())
