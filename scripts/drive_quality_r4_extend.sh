#!/bin/bash
# Round-4 quality drive EXTENSION: resume the committed 5k-step main Cubegan run to
# $MAIN_STEPS (default 30k), re-synthesize the devset from the final weights,
# re-export + API-synthesize, and re-evaluate MCD-DTW/F0/VUV/duration into
# $OUT — with a trend table vs the 5k-step drive's metrics (the r4 diagnosis showed
# MCD tracks mel L1 ~linearly; more steps is the lever). HF artifacts from the base
# drive are left as-is.
#
# Usage: bash scripts/drive_quality_r4_extend.sh [ROOT=/tmp/drive_r3]
# Env: SKIP_TRAIN=1 skips stage 1 and packages/evaluates whatever checkpoint is in
#      $ROOT/models/cubegan.last already (e.g. after a deadline-killed run — the
#      trainer saves .last on the opt-save cadence, so the tail is salvageable).
set -euo pipefail
ROOT=${1:-/tmp/drive_r3}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
OUT=${OUT:-artifacts/quality_drive_r4}
MAIN_STEPS=${MAIN_STEPS:-30000}

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

if [ -z "${SKIP_TRAIN:-}" ]; then
stamp "1/5 resume main Cubegan run -> $MAIN_STEPS steps"
python -u scripts/train_cubegan.py \
    --output-base "$ROOT/models/cubegan" \
    --train-folder "$ROOT/processed/train" --dev-folder "$ROOT/processed/dev" \
    --max-steps "$MAIN_STEPS" --resume \
    --epoch-generation 0 --opt-save-every 25 \
    >> "$ROOT/train_main.log" 2>&1
tail -3 "$ROOT/train_main.log"
else
stamp "1/5 skipped (SKIP_TRAIN=1, packaging $ROOT/models/cubegan.last as-is)"
fi

stamp "2/5 final devset synthesis (free, all dev utterances)"
rm -rf generated_files/free
python -u - "$ROOT" <<'EOF'
import sys, os
root = sys.argv[1]
sys.path.insert(0, ".")
from ttscube_tpu.train.runtime import synthesize_from_checkpoint
synthesize_from_checkpoint(
    os.path.join(root, "models/cubegan"),
    dev_folder=os.path.join(root, "processed/dev"),
    out_folder="generated_files/free/", limit=-1)
EOF

stamp "3/5 re-export + reassembly + API synthesis (main variant)"
python -u scripts/export_model.py \
    --input-model "$ROOT/models/cubegan" \
    --input-phonemizer "$ROOT/models/phonemizer" \
    --output-model "$ROOT/export/cubegan" \
    --version 1.1 --language en-demo --description "r4 quality drive (extended)"
rm -rf "$ROOT/assembled/cubegan"; mkdir -p "$ROOT/assembled/cubegan"
cat "$ROOT/export/cubegan"-?? > "$ROOT/assembled/cubegan/model.tar.gz"
tar -xzf "$ROOT/assembled/cubegan/model.tar.gz" -C "$ROOT/assembled/cubegan"
python -u - "$ROOT" <<'EOF'
import sys, os
root = sys.argv[1]
from ttscube_tpu.api import TTSCube
from ttscube_tpu.utils.wavio import write_wav
texts = ["ama sano tivo muna lori .", "selami tokun mirade fulosa ."]
base = os.path.join(root, "assembled", "cubegan")
cube = TTSCube(os.path.join(base, "cubegan"), os.path.join(base, "phonemizer"))
for i, t in enumerate(texts):
    wav = cube(t, speaker="spk0")
    out = os.path.join(root, f"api_cubegan_{i}.wav")
    write_wav(out, wav, 24000)
    print(f"cubegan[{i}] '{t}' -> {out} ({wav.shape[0]/24000:.2f}s)")
EOF

stamp "4/5 refresh artifacts ($OUT)"
# keep the base drive's metrics as the trend baseline for the re-eval (don't clobber
# the snapshot when re-running the extension — quality_metrics.json is now the
# extended one). Legacy name quality_metrics_5k.json (r4's base drive was 5k steps)
# is honored; new snapshots use the generic _base name.
BASE_METRICS="$OUT/quality_metrics_5k.json"
[ -e "$BASE_METRICS" ] || BASE_METRICS="$OUT/quality_metrics_base.json"
[ -e "$BASE_METRICS" ] || cp "$OUT/quality_metrics.json" "$BASE_METRICS"
python -u scripts/collect_drive_artifacts.py --log "$ROOT/train_main.log" \
    --out "$OUT" --prefix main_
cp "$ROOT"/api_cubegan_?.wav "$OUT"/ 2>/dev/null || true
rm -f "$OUT"/synth_*.wav "$OUT"/synth_*.png
for f in generated_files/free/*.wav generated_files/free/*.png; do
    [ -e "$f" ] && cp "$f" "$OUT/synth_$(basename "$f")"
done

stamp "5/5 re-evaluate quality metrics (CPU) + regenerate README"
JAX_PLATFORMS=cpu python -u scripts/eval_drive_quality.py \
    --dir "$OUT" \
    --baseline "$BASE_METRICS" || true
# keep the artifact README in sync with the re-evaluated metrics (a stale README
# from the base drive would misreport the extended run)
python -u scripts/make_drive_readme.py --dir "$OUT" \
    --title "${README_TITLE:-Quality drive (extended)}" || true
stamp "DONE"
