#!/bin/bash
# Post-training pipeline for a run: EMA sampling sweep at >=100 samples
# (honest diversity at the reference's protocol scale) + markdown report.
# Usage: bash scripts/post_train_pipeline.sh synth_r3_v4
set -euo pipefail
RUN=${1:?run name}
CKPT_DIR="ckpt/${RUN}"
LATEST=$(ls "${CKPT_DIR}" | grep -E '^[0-9]+$' | sort -n | tail -1)
echo "latest checkpoint: ${CKPT_DIR}/${LATEST}"

OUT="results/${RUN}_sweep"
python scripts/sample.py \
    --config configs/synthetic_tpu_v4.yaml \
    --weights "${CKPT_DIR}" \
    --min_length 64 --max_length 256 --length_step 16 \
    --samples_per_length 8 \
    --output_dir "${OUT}"

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/report_training.py \
    --ckpt_dir "${CKPT_DIR}" \
    --eval_dir "eval_outputs/${RUN}" \
    --out "${CKPT_DIR}/REPORT.md"
echo "report: ${CKPT_DIR}/REPORT.md"

# Git-committable single-file weights (orbax dirs are gitignored and do
# not survive workspace resets; the npz lets the next round warm-start).
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/export_params.py \
    --ckpt_dir "${CKPT_DIR}" \
    --out "${CKPT_DIR}/params_${LATEST}.npz"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<EOF
import json
s = json.load(open("${OUT}/summary.json"))
print("sweep summary:", s)
EOF
