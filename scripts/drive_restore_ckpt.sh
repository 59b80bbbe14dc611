#!/bin/bash
# Rebuild a quality-drive ROOT on a FRESH BOX from the committed cross-round training
# state (artifacts/drive_ckpt, written by scripts/drive_save_ckpt.sh): regenerate the
# seeded demo corpus + imported features (deterministic — the r4 restart replayed the
# committed loss curve exactly), restore the cubegan checkpoint + encodings + the
# already-trained phonemizer, then hand off to drive_quality_r4_extend.sh to resume
# training and package/eval.
#
# Usage: bash scripts/drive_restore_ckpt.sh [ROOT=/tmp/drive_r5]
#   then: MAIN_STEPS=<target> bash scripts/drive_quality_r4_extend.sh $ROOT
# Env: SRC=artifacts/drive_ckpt   committed checkpoint dir
set -euo pipefail
ROOT=${1:-/tmp/drive_r5}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
SRC=${SRC:-artifacts/drive_ckpt}

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

[ -e "$SRC/cubegan.last" ] || { echo "no committed checkpoint in $SRC" >&2; exit 1; }
# corpus contract: regenerate the exact corpus the committed encodings came from
# (drive_save_ckpt.sh records it; mismatched phone vocab -> zero durations). Env
# overrides still win, but only on top of the recorded values.
if [ -e "$SRC/ckpt_meta.txt" ]; then
    # shellcheck disable=SC1090
    . <(sed 's/^/REC_/' "$SRC/ckpt_meta.txt")
    SPEAKERS=${SPEAKERS:-${REC_SPEAKERS:-3}}
    SENTENCES=${SENTENCES:-${REC_SENTENCES:-220}}
    SEED=${SEED:-${REC_SEED:-7}}
else
    echo "WARNING: $SRC/ckpt_meta.txt missing — trusting env/default corpus params" >&2
    SPEAKERS=${SPEAKERS:-3}
    SENTENCES=${SENTENCES:-220}
    SEED=${SEED:-7}
fi

if [ -z "${SKIP_PREP:-}" ]; then
    rm -rf "$ROOT"
    mkdir -p "$ROOT"/{models,export,assembled}
    stamp "1/3 regenerate seeded corpus ($SPEAKERS x $SENTENCES, seed $SEED)"
    python -u scripts/make_demo_corpus.py --output "$ROOT/corpus" \
        --sentences "$SENTENCES" --speakers "$SPEAKERS" --seed "$SEED"
    stamp "2/3 re-import features"
    for k in $(seq 0 $((SPEAKERS - 1))); do
        python -u scripts/import_blizzard_2023.py \
            --input-file "$ROOT/corpus/align_spk$k.txt" \
            --speaker "spk$k" --prefix "SPK$k" --dev-ratio 0.02 \
            --train-output "$ROOT/processed/train" --dev-output "$ROOT/processed/dev"
    done
fi

stamp "3/3 restore checkpoint + phonemizer from $SRC"
mkdir -p "$ROOT/models"
cp "$SRC"/cubegan.* "$SRC"/phonemizer.* "$ROOT/models/"
cp "$SRC/train_main.log" "$ROOT/" 2>/dev/null || true
ls -la "$ROOT/models"
stamp "ready — resume with: MAIN_STEPS=<target> bash scripts/drive_quality_r4_extend.sh $ROOT"
