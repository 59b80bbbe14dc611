#!/bin/bash
# Round-5 post-drive TPU measurement window (VERDICT r4 items 2+3+4): run ONLY when
# no training drive is on the axon backend (the relay serializes compiles across
# processes — a profiler sharing the TPU queues a trainer's compiles behind its own).
#
# Produces, in artifacts/:
#   profile_b16_fp32.json   — honest per-phase fp32 table at the trainer's real batch
#                             (post-DCE-fix: every phase reduces every output leaf)
#   profile_b16_bf16.json   — same table with --compute-dtype bfloat16 (the drive's
#                             training mode) -> the committed bf16 win record
#   profile_b16_fused_fp32.json / profile_b16_fused_bf16.json — full-step time with
#                             the fused-tail custom-VJP path FORCED at B=16
#                             (--fused-max-batch 16) -> re-gates
#                             HifiganConfig.fused_train_max_batch from measurement
#
# Usage: bash scripts/r5_tpu_window.sh [LOGDIR=/tmp/r5_window]
set -euo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
LOGDIR=${1:-/tmp/r5_window}
mkdir -p "$LOGDIR" artifacts

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

# PHASES: the decisive subset (full step + the three dominant rows from the r4
# profile) — each phase costs ~40-55 s of relay compile, so the full 11-phase table
# x 4 configs doesn't fit an end-of-round window. Override with PHASES="" for all.
PHASES=${PHASES-"--only train_step d_value_grad msd_fwd forward optimizer"}

stamp "1/4 per-phase fp32 table, B=16 (honest, post-DCE-fix)"
python -u scripts/profile_train.py --batch 16 $PHASES \
    --json artifacts/profile_b16_fp32.json 2>&1 | tee "$LOGDIR/fp32.log" | tail -20

stamp "2/4 per-phase bf16 table, B=16 (the drive's training mode)"
python -u scripts/profile_train.py --batch 16 --compute-dtype bfloat16 $PHASES \
    --json artifacts/profile_b16_bf16.json 2>&1 | tee "$LOGDIR/bf16.log" | tail -20

stamp "3/4 fused-tail FORCED at B=16, fp32 (train_step only; expect ~30 s trace + ~40 s compile one-time)"
python -u scripts/profile_train.py --batch 16 --fused-tail-train --fused-max-batch 16 \
    --only train_step \
    --json artifacts/profile_b16_fused_fp32.json 2>&1 | tee "$LOGDIR/fused_fp32.log" | tail -10

stamp "4/4 fused-tail FORCED at B=16, bf16 (train_step only)"
python -u scripts/profile_train.py --batch 16 --fused-tail-train --fused-max-batch 16 \
    --compute-dtype bfloat16 --only train_step \
    --json artifacts/profile_b16_fused_bf16.json 2>&1 | tee "$LOGDIR/fused_bf16.log" | tail -10

stamp "DONE — summary:"
python - <<'EOF'
import json
for name in ("fp32", "bf16", "fused_fp32", "fused_bf16"):
    try:
        d = json.load(open(f"artifacts/profile_b16_{name}.json"))
    except FileNotFoundError:
        print(f"{name:>11}: MISSING"); continue
    phases = d.get("phases", d)
    ts = phases.get("train_step", {})
    print(f"{name:>11}: train_step {ts.get('ms', '?')} ms "
          f"(compile {ts.get('compile_s', '?')} s)")
EOF
