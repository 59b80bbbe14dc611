#!/bin/bash
# Round-4 quality drive (VERDICT r3 item 1): multi-speaker demo corpus -> aligned
# phonemizer -> main Cubegan run -> HF-conditioned Cubegan run (local demo LM, no
# hub) -> export -> volume reassembly -> TTSCube synthesis -> MCD-DTW/F0/VUV/duration
# metrics -> artifacts/quality_drive_r4. Mirrors the reference TRAINING.md step 1-3
# workflow (/root/reference/TRAINING.md; cube/io_utils/runtime.py:83-109).
#
# Usage: bash scripts/drive_quality_r4.sh [ROOT=/tmp/drive_r4]
# Env: SKIP_PREP=1 reuses $ROOT/processed, SKIP_PHON=1 reuses $ROOT/models/phonemizer.*,
#      SKIP_MAIN=1 reuses $ROOT/models/cubegan.* AND the devset synthesis already in
#      generated_files/free (resume after an interrupted stage 6+)
set -euo pipefail
ROOT=${1:-/tmp/drive_r4}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
OUT=${OUT:-artifacts/quality_drive_r4}

SPEAKERS=${SPEAKERS:-3}
SENTENCES=${SENTENCES:-220}
MAIN_STEPS=${MAIN_STEPS:-5000}
HF_STEPS=${HF_STEPS:-1000}
PHON_STEPS=${PHON_STEPS:-1500}
# trend baseline for the metric eval — point at the previous drive's metrics json
# (e.g. artifacts/quality_drive_r4/quality_metrics_5k.json for an extended run)
BASELINE=${BASELINE:-artifacts/quality_drive_r2/quality_metrics.json}
# devset-synthesis cadence + .opt.last save cadence during the main run (each opt
# save fetches the full opt tree through the relay — raise for long runs)
EPOCH_GEN=${EPOCH_GEN:-40}
OPT_SAVE=${OPT_SAVE:-25}
# Fused-tail training defaults OFF for drives: the custom-VJP program at the
# trainer's B=16 needs a long remote compile (r3 measured >30 min before the
# compile-cost fix; quality drives don't need the kernel). Opt in with
# FUSED_FLAG=--fused-tail-train.
FUSED_FLAG=${FUSED_FLAG-}
# Training compute dtype (VERDICT r4 item 2): bfloat16 runs generator AND
# discriminator convs at bf16 (fp32 accumulation, fp32 params/grads) — the B=16
# step is disc-fmap-HBM-bound, so this is the cheapest real speedup. Grad-parity
# guard: tests/test_cubegan.py.
COMPUTE_DTYPE=${COMPUTE_DTYPE:-float32}

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

# Run train_cubegan.py with automatic retry: a relay/worker hiccup mid-run
# (e.g. a killed concurrent compile aborting the worker — happened in r5) must
# not cost a multi-hour drive. On failure, wait out the worker's ~3-5 min
# auto-recovery and retry with --resume when a checkpoint exists.
#   usage: train_with_retry <output-base> <log> [extra train_cubegan args...]
train_with_retry() {
    local base=$1 log=$2; shift 2
    local tries=${MAIN_TRIES:-3} try=0 resume=
    : > "$log"
    until python -u scripts/train_cubegan.py --output-base "$base" \
        --train-folder "$ROOT/processed/train" --dev-folder "$ROOT/processed/dev" \
        $resume "$@" >> "$log" 2>&1; do
        try=$((try+1))
        if [ "$try" -ge "$tries" ]; then
            echo "trainer failed $try times — giving up" >&2
            tail -5 "$log" >&2
            return 1
        fi
        if [ -e "$base.last" ]; then resume=--resume; else resume=; fi
        stamp "trainer died (attempt $try) — sleeping 240s for worker recovery," \
              "then ${resume:---fresh restart}"
        tail -2 "$log"
        sleep 240
    done
}

# SKIP_PREP=1 reuses an existing $ROOT/processed (corpus gen + feature import are the
# slow CPU stages; the trainers re-read everything from disk)
if [ -z "${SKIP_PREP:-}" ]; then
    rm -rf "$ROOT" generated_files/free
    mkdir -p "$ROOT"/{models,export,assembled}

    stamp "1/8 corpus: $SPEAKERS speakers x $SENTENCES sentences"
    python -u scripts/make_demo_corpus.py --output "$ROOT/corpus" \
        --sentences "$SENTENCES" --speakers "$SPEAKERS"

    stamp "2/8 local demo LM (HF-format BERT + WordPiece tokenizer)"
    python -u scripts/make_demo_lm.py --output "$ROOT/demo_lm"

    stamp "3/8 import (per-speaker align files)"
    for k in $(seq 0 $((SPEAKERS - 1))); do
        python -u scripts/import_blizzard_2023.py \
            --input-file "$ROOT/corpus/align_spk$k.txt" \
            --speaker "spk$k" --prefix "SPK$k" --dev-ratio 0.02 \
            --train-output "$ROOT/processed/train" --dev-output "$ROOT/processed/dev"
    done
else
    stamp "1-3/8 skipped (SKIP_PREP=1, reusing $ROOT/processed)"
    mkdir -p "$ROOT"/{models,export,assembled}
    [ -z "${SKIP_MAIN:-}" ] && rm -rf generated_files/free
fi
# SKIP_PHON=1 reuses $ROOT/models/phonemizer.* from a previous (partial) run
if [ -z "${SKIP_PHON:-}" ]; then
    cat "$ROOT"/corpus/align_spk*.txt > "$ROOT/corpus/align_all.txt"
    # dev-ratio matters: the trainer's PACC/SACC model selection (and export's
    # .sacc.best default) need a non-empty devset
    python -u scripts/import_phonemizer_blizzard.py \
        --input-file "$ROOT/corpus/align_all.txt" --dev-ratio 0.02 \
        --output-base "$ROOT/phonemizer-data"

    stamp "4/8 phonemizer (aligned, $PHON_STEPS steps)"
    python -u scripts/train_phonemizer.py --model-type aligned \
        --train-file "$ROOT/phonemizer-data.train" --dev-file "$ROOT/phonemizer-data.dev" \
        --output-base "$ROOT/models/phonemizer" --max-steps "$PHON_STEPS" \
        > "$ROOT/phonemizer.log" 2>&1
    grep -E "epoch" "$ROOT/phonemizer.log" | tail -3
else
    stamp "4/8 skipped (SKIP_PHON=1, reusing $ROOT/models/phonemizer.*)"
fi

if [ -n "${SKIP_MAIN:-}" ]; then
    stamp "5+5b/8 skipped (SKIP_MAIN=1, reusing $ROOT/models/cubegan.* + generated_files/free)"
else
stamp "5/8 main Cubegan run ($MAIN_STEPS steps${FUSED_FLAG:+, fused-tail training}, dtype $COMPUTE_DTYPE)"
train_with_retry "$ROOT/models/cubegan" "$ROOT/train_main.log" \
    --max-steps "$MAIN_STEPS" $FUSED_FLAG --compute-dtype "$COMPUTE_DTYPE" \
    --epoch-generation "$EPOCH_GEN" --generation-limit -1 --opt-save-every "$OPT_SAVE"
tail -3 "$ROOT/train_main.log"

# final devset synthesis from the finished weights (epoch-generation cadence may not
# land on the terminal epoch; the metrics below must measure the trained model)
stamp "5b/8 final devset synthesis (all dev utterances)"
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
fi

stamp "6/8 HF-conditioned Cubegan run ($HF_STEPS steps, lm=hf:$ROOT/demo_lm)"
train_with_retry "$ROOT/models/cubegan_hf" "$ROOT/train_hf.log" \
    --max-steps "$HF_STEPS" --lm "hf:$ROOT/demo_lm" $FUSED_FLAG \
    --compute-dtype "$COMPUTE_DTYPE" \
    --epoch-generation 0 --opt-save-every 25
tail -3 "$ROOT/train_hf.log"

# HF devset synthesis (VERDICT r4 missing item 3): score the conditioned variant
# with the same protocol as the main run, not just API demo wavs
stamp "6b/8 HF devset synthesis (all dev utterances)"
rm -rf generated_files/free_hf
python -u - "$ROOT" <<'EOF'
import sys, os
root = sys.argv[1]
sys.path.insert(0, ".")
from ttscube_tpu.train.runtime import synthesize_from_checkpoint
synthesize_from_checkpoint(
    os.path.join(root, "models/cubegan_hf"),
    dev_folder=os.path.join(root, "processed/dev"),
    out_folder="generated_files/free_hf/", limit=-1)
EOF

stamp "7/8 export + volume reassembly + TTSCube synthesis"
for variant in cubegan cubegan_hf; do
    python -u scripts/export_model.py \
        --input-model "$ROOT/models/$variant" \
        --input-phonemizer "$ROOT/models/phonemizer" \
        --output-model "$ROOT/export/$variant" \
        --version 1.0 --language en-demo --description "r4 quality drive ($variant)"
    # reassemble the split volumes exactly like utils/repository.download_model
    mkdir -p "$ROOT/assembled/$variant"
    cat "$ROOT/export/$variant"-?? > "$ROOT/assembled/$variant/model.tar.gz"
    tar -xzf "$ROOT/assembled/$variant/model.tar.gz" -C "$ROOT/assembled/$variant"
done
python -u - "$ROOT" <<'EOF'
import sys, os
root = sys.argv[1]
from ttscube_tpu.api import TTSCube
from ttscube_tpu.utils.wavio import write_wav
texts = ["ama sano tivo muna lori .", "selami tokun mirade fulosa ."]
for variant in ("cubegan", "cubegan_hf"):
    base = os.path.join(root, "assembled", variant)
    cube = TTSCube(os.path.join(base, "cubegan"), os.path.join(base, "phonemizer"))
    for i, t in enumerate(texts):
        wav = cube(t, speaker="spk0")
        out = os.path.join(root, f"api_{variant}_{i}.wav")
        write_wav(out, wav, 24000)
        print(f"{variant}[{i}] '{t}' -> {out} ({wav.shape[0]/24000:.2f}s)")
EOF

stamp "8/8 collect artifacts"
python -u scripts/collect_drive_artifacts.py --log "$ROOT/train_main.log" \
    --out "$OUT" --prefix main_
python -u scripts/collect_drive_artifacts.py --log "$ROOT/train_hf.log" \
    --out "$OUT" --prefix hf_
grep -aE "PACC|SACC" "$ROOT/phonemizer.log" | tail -2 > "$OUT/phonemizer_final.txt" || true
cp "$ROOT"/api_*.wav "$OUT"/ 2>/dev/null || true
# devset free-synthesis outputs (trainer writes cwd-relative) + matching originals
for f in generated_files/free/*.wav generated_files/free/*.png; do
    [ -e "$f" ] && cp "$f" "$OUT/synth_$(basename "$f")"
done
for f in "$OUT"/synth_*.wav; do
    id=$(basename "$f" .wav); id=${id#synth_}
    [ -e "$ROOT/processed/dev/$id.wav" ] && \
        cp "$ROOT/processed/dev/$id.wav" "$OUT/orig_$id.wav"
done
# quantitative quality: MCD-DTW + F0-RMSE + VUV + duration error over ALL devset
# pairs, with a trend table vs the previous drive (CPU jax — don't occupy the TPU
# for an offline metric)
JAX_PLATFORMS=cpu python -u scripts/eval_drive_quality.py \
    --dir "$OUT" \
    --baseline "$BASELINE" || true

# HF-conditioned variant: same pairs, same metrics, into $OUT/hf — with the MAIN
# run's fresh metrics as the baseline so the trend table is a direct
# conditioned-vs-plain comparison on an identical protocol
if compgen -G "generated_files/free_hf/*.wav" > /dev/null; then
    mkdir -p "$OUT/hf"
    for f in generated_files/free_hf/*.wav; do
        cp "$f" "$OUT/hf/synth_$(basename "$f")"
    done
    for f in "$OUT"/hf/synth_*.wav; do
        id=$(basename "$f" .wav); id=${id#synth_}
        [ -e "$ROOT/processed/dev/$id.wav" ] && \
            cp "$ROOT/processed/dev/$id.wav" "$OUT/hf/orig_$id.wav"
    done
    JAX_PLATFORMS=cpu python -u scripts/eval_drive_quality.py \
        --dir "$OUT/hf" \
        --baseline "$OUT/quality_metrics.json" || true
fi

# artifact README: drive config, final losses, metric trends (shared generator —
# the extend drive regenerates it after re-eval with the same module)
python -u scripts/make_drive_readme.py --dir "$OUT" \
    --speakers "$SPEAKERS" --sentences "$SENTENCES" \
    --title "${README_TITLE:-Quality drive}"
stamp "DONE"
