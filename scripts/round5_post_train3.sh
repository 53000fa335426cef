#!/bin/bash
# Round-5 closing chip queue: after the v8 bond-hinge fine-tune exits,
# run the 104-sample EMA protocol sweep (same grid as the v7/v6b
# sweeps: lengths 64-512 step 64 x13, identical config protocol) and
# build the v7-vs-v8 A/B table. The axon relay serializes python
# processes on the TPU lease — exactly one stage at a time.
# Usage: nohup bash scripts/round5_post_train3.sh > /tmp/post_train3_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RUN=synth_r5_v8
CONFIG=configs/synthetic_tpu_v8.yaml

TRAIN_PID=$(cat /tmp/train_v8.pid 2>/dev/null || echo "")
if [ -n "$TRAIN_PID" ]; then
  echo "[$(date -u +%H:%M:%S)] waiting for train pid $TRAIN_PID"
  while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(date -u +%H:%M:%S)] training exited; last metrics line:"
tail -1 "ckpt/$RUN/metrics.jsonl"

echo "[$(date -u +%H:%M:%S)] === stage A: protocol sweep 64-512 x13"
SWEEP_MIN_LEN=64 SWEEP_MAX_LEN=512 SWEEP_LEN_STEP=64 SWEEP_SAMPLES=13 \
  bash scripts/post_train_pipeline.sh "$RUN" "$CONFIG" \
  || echo "stage A FAILED"

echo "[$(date -u +%H:%M:%S)] === stage B: v7 vs v8 A/B table"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/compare_sweeps.py \
  --a results/synth_r5_v7_sweep --label_a v7 \
  --b results/${RUN}_sweep --label_b v8 \
  --out results/bond_ab_r5.json \
  || echo "stage B FAILED"

echo "[$(date -u +%H:%M:%S)] === queue done"
