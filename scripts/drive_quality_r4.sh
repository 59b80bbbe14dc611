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
stamp "5/8 main Cubegan run ($MAIN_STEPS steps${FUSED_FLAG:+, fused-tail training})"
python -u scripts/train_cubegan.py \
    --output-base "$ROOT/models/cubegan" \
    --train-folder "$ROOT/processed/train" --dev-folder "$ROOT/processed/dev" \
    --max-steps "$MAIN_STEPS" $FUSED_FLAG --compute-dtype "$COMPUTE_DTYPE" \
    --epoch-generation "$EPOCH_GEN" --generation-limit -1 --opt-save-every "$OPT_SAVE" \
    > "$ROOT/train_main.log" 2>&1
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
python -u scripts/train_cubegan.py \
    --output-base "$ROOT/models/cubegan_hf" \
    --train-folder "$ROOT/processed/train" --dev-folder "$ROOT/processed/dev" \
    --max-steps "$HF_STEPS" --lm "hf:$ROOT/demo_lm" $FUSED_FLAG \
    --compute-dtype "$COMPUTE_DTYPE" \
    --epoch-generation 0 --opt-save-every 25 \
    > "$ROOT/train_hf.log" 2>&1
tail -3 "$ROOT/train_hf.log"

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

# artifact README: drive config, final losses, metric trend vs the r2 drive
python -u - "$OUT" "$SPEAKERS" "$SENTENCES" "$MAIN_STEPS" "$HF_STEPS" "$BASELINE" <<'EOF'
import json, sys, os, csv
out, spk, sent, main_steps, hf_steps, baseline = sys.argv[1:7]
lines = [
    "# Quality drive — round 4",
    "",
    f"Corpus: {spk} synthetic speakers x {sent} sentences (scripts/make_demo_corpus.py),",
    f"imported via scripts/import_blizzard_2023.py. Main Cubegan run {main_steps} steps",
    f"(batch 16, plain generator path); HF-conditioned run {hf_steps} steps with the",
    "local demo BERT (scripts/make_demo_lm.py). Phonemizer: aligned, PACC/SACC below.",
    "Pipeline: corpus -> phonemizer -> GAN runs -> export_model -> split-volume",
    "reassembly -> TTSCube API synthesis (api_*.wav) -> devset free synthesis",
    "(synth_*.wav vs orig_*.wav) -> MCD-DTW/F0/VUV/duration metrics.",
    "(Reference workflow: /root/reference/TRAINING.md steps 1-3.)",
    "",
]
pf = os.path.join(out, "phonemizer_final.txt")
if os.path.exists(pf):
    lines += ["Phonemizer final: " + open(pf).read().strip().split("\n")[-1].strip(), ""]
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
    lines += ["", f"## Metrics ({m.get('n_pairs')} devset pairs, free synthesis)", ""]
    for k in ("mean_mcd_dtw_db", "mean_f0_rmse_hz", "mean_vuv_error_pct",
              "mean_dur_error_pct", "mean_voiced_ratio_synth"):
        if m.get(k) is not None:
            lines.append(f"- {k}: {m[k]}")
    t = m.get("trend_vs_baseline", {})
    if t.get("metrics"):
        lines += ["", f"## Trend vs baseline `{baseline}` "
                      f"({t.get('baseline_n_pairs')} pairs)", ""]
        if os.path.exists(os.path.join(out, "README_5k.md")):
            lines += ["(Previous 5k-step drive + metric-scale calibration: "
                      "README_5k.md — chance floor 49.5 dB, oracle floor 1.4 dB.)", ""]
        for k, d in t["metrics"].items():
            arrow = "improved" if d["delta"] < 0 else "regressed"
            lines.append(f"- {k}: {d['baseline']} -> {d['now']} ({d['delta']:+.3f}, {arrow})")
open(os.path.join(out, "README.md"), "w").write("\n".join(lines) + "\n")
print("wrote", os.path.join(out, "README.md"))
EOF
stamp "DONE"
