#!/bin/bash
# Persist a (possibly deadline-killed) quality-drive training state ACROSS ROUNDS by
# committing it into the repo: /tmp does not survive round boundaries (fresh box each
# round, repo re-cloned from git — measured end of r4), so the only durable store is
# git itself. Saves the weights-only checkpoint (.last, ~390 MB fp32), the encodings,
# the phonemizer model files (skips a 4-min retrain), and the train log (losses.csv
# continuity). Deliberately SKIPS `.opt.last` (~1.2 GB Adam moments — incompressible;
# weights-only resume is supported, utils/checkpoint.py fallback).
#
# Usage: bash scripts/drive_save_ckpt.sh [ROOT=/tmp/drive_r5] [DEST=artifacts/drive_ckpt]
# Env: SPEAKERS/SENTENCES/SEED — corpus params recorded into ckpt_meta.txt so
#      drive_restore_ckpt.sh regenerates the SAME corpus (mismatched vocab ->
#      zero durations). Defaults match drive_quality_r4.sh / make_demo_corpus.py.
#
# Git-history note: the ~390 MB fp32 .last does not delta-compress, so every
# committed save adds a permanent blob. Overwrite-in-place is the layout; when
# re-saving within a round, AMEND the previous checkpoint commit
# (`git commit --amend`) instead of stacking fresh commits, so superseded blobs
# stay unreachable.
set -euo pipefail
ROOT=${1:-/tmp/drive_r5}
REPO=$(cd "$(dirname "$0")/.." && pwd)
DEST=${2:-$REPO/artifacts/drive_ckpt}
SPEAKERS=${SPEAKERS:-3}
SENTENCES=${SENTENCES:-220}
SEED=${SEED:-7}

mkdir -p "$DEST"
for f in cubegan.last cubegan.encodings cubegan.yaml; do
    [ -e "$ROOT/models/$f" ] || { echo "missing $ROOT/models/$f" >&2; exit 1; }
    cp "$ROOT/models/$f" "$DEST/"
done
# phonemizer: all small model files (weights + encodings + config)
cp "$ROOT"/models/phonemizer.* "$DEST/" 2>/dev/null || true
cp "$ROOT/train_main.log" "$DEST/" 2>/dev/null || true
# corpus contract: restore must regenerate the exact corpus these encodings came from
{ echo "SPEAKERS=$SPEAKERS"; echo "SENTENCES=$SENTENCES"; echo "SEED=$SEED"; } \
    > "$DEST/ckpt_meta.txt"
# record roughly which step the checkpoint corresponds to: the last "Stored .last"
# epoch line + the last training-step log line (weights-only resume restarts the
# in-log step counter at 0, so absolute progress must be summed across round logs)
{ grep -aE "Stored .*\.last" "$ROOT/train_main.log" | tail -1;
  grep -aE "^step [0-9]+:" "$ROOT/train_main.log" | tail -1; } \
    > "$DEST/ckpt_step.txt" 2>/dev/null || true
du -sh "$DEST"
ls -la "$DEST"
