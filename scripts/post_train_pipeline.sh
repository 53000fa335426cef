#!/bin/bash
# Post-training pipeline for a run: EMA sampling sweep at >=100 samples
# (honest diversity at the reference's protocol scale) + markdown report.
# Usage: bash scripts/post_train_pipeline.sh synth_r3_v4
set -euo pipefail
RUN=${1:?run name}
# Config: second arg, or derived from the run name (synth_r3_v5 ->
# configs/synthetic_tpu_v5.yaml), so a run never sweeps under a
# mismatched config.
CONFIG=${2:-}
if [ -z "${CONFIG}" ]; then
  SUFFIX=$(echo "${RUN}" | grep -oE 'v[0-9]+$' || true)
  CONFIG="configs/synthetic_tpu${SUFFIX:+_${SUFFIX}}.yaml"
fi
[ -f "${CONFIG}" ] || { echo "config not found: ${CONFIG} (pass it as arg 2)"; exit 1; }
echo "sweep config: ${CONFIG}"
CKPT_DIR="ckpt/${RUN}"
LATEST=$(ls "${CKPT_DIR}" | grep -E '^[0-9]+$' | sort -n | tail -1)
echo "latest checkpoint: ${CKPT_DIR}/${LATEST}"

OUT="results/${RUN}_sweep"
# Length grid: override for runs trained past 256 (the v6 curriculum
# goes to 512, the reference samples to 500 — inference.yaml:18-24).
MIN_LEN=${SWEEP_MIN_LEN:-64}
MAX_LEN=${SWEEP_MAX_LEN:-256}
LEN_STEP=${SWEEP_LEN_STEP:-16}
SAMPLES=${SWEEP_SAMPLES:-8}
python scripts/sample.py \
    --config "${CONFIG}" \
    --weights "${CKPT_DIR}" \
    --min_length "${MIN_LEN}" --max_length "${MAX_LEN}" \
    --length_step "${LEN_STEP}" \
    --samples_per_length "${SAMPLES}" \
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
