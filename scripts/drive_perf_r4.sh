#!/bin/bash
# Round-4 performance measurement batch (run on an otherwise-idle TPU):
#  1. per-phase B=16 train profile (plain / fused-tail / bf16-compute) — VERDICT
#     items 3+4; 2. unroll=2 train-step compile+step time — item 9; 3. per-stage
#     B=128 serving profile with polyphase variants — item 5.
# Writes logs + JSONs under /tmp/perf_r4/.
set -uo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
OUT=/tmp/perf_r4
mkdir -p "$OUT"
stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

stamp "1a: B=16 plain full-phase profile"
python -u scripts/profile_train.py --batch 16 --reps 10 \
    --json "$OUT/b16_plain.json" 2>&1 | tee "$OUT/b16_plain.log"

stamp "1b: B=16 fused-tail train_step"
python -u scripts/profile_train.py --batch 16 --reps 10 --fused-tail-train \
    --only train_step --json "$OUT/b16_fused.json" 2>&1 | tee "$OUT/b16_fused.log"

stamp "1c: B=16 bf16-compute (step + D phases)"
python -u scripts/profile_train.py --batch 16 --reps 10 --compute-dtype bfloat16 \
    --only train_step forward forward+pullback d_value_grad mpd_fwd msd_fwd \
    --json "$OUT/b16_bf16.json" 2>&1 | tee "$OUT/b16_bf16.log"

stamp "2: unroll=2 train_step (compile + step)"
python -u scripts/profile_train.py --batch 16 --reps 10 --unroll 2 \
    --only train_step forward --json "$OUT/b16_unroll2.json" 2>&1 | tee "$OUT/b16_unroll2.log"

stamp "3: B=128 serving per-stage + polyphase variants"
python -u scripts/profile_synthesis.py --batch 128 --reps 10 \
    2>&1 | tee "$OUT/serve_b128.log"
python -u scripts/profile_synthesis.py --batch 128 --reps 10 --polyphase 32,64 \
    2>&1 | tee "$OUT/serve_b128_poly.log"

stamp "DONE -> $OUT"
