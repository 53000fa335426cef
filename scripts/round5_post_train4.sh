#!/bin/bash
# Round-5 v9 (train-to-640) chip queue: after the v9 train exits, run
# the protocol sweep EXTENDED to 640 (lengths 64-640 step 64 x13 =
# 130 samples — same per-length density as the v7/v8 sweeps, two more
# length buckets since 576/640 are now in-distribution), build the
# v8-vs-v9 A/B table on the shared 64-512 grid, and finish with a clean
# uncontended bench snapshot. One stage at a time — the axon relay
# serializes python processes on the TPU lease.
# Usage: nohup bash scripts/round5_post_train4.sh > /tmp/post_train4_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RUN=synth_r5_v9
CONFIG=configs/synthetic_tpu_v9.yaml

TRAIN_PID=$(cat /tmp/train_v9.pid 2>/dev/null || echo "")
if [ -n "$TRAIN_PID" ]; then
  echo "[$(date -u +%H:%M:%S)] waiting for train pid $TRAIN_PID"
  while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(date -u +%H:%M:%S)] training exited; last metrics line:"
tail -1 "ckpt/$RUN/metrics.jsonl"

echo "[$(date -u +%H:%M:%S)] === stage A: protocol sweep 64-640 x13"
SWEEP_MIN_LEN=64 SWEEP_MAX_LEN=640 SWEEP_LEN_STEP=64 SWEEP_SAMPLES=13 \
  bash scripts/post_train_pipeline.sh "$RUN" "$CONFIG" \
  || echo "stage A FAILED"

echo "[$(date -u +%H:%M:%S)] === stage B: v8 vs v9 A/B table"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/compare_sweeps.py \
  --a results/synth_r5_v8_sweep --label_a v8 \
  --b results/${RUN}_sweep --label_b v9 \
  --out results/len640_ab_r5.json \
  || echo "stage B FAILED"

echo "[$(date -u +%H:%M:%S)] === stage C: clean bench snapshot"
python bench.py > /tmp/bench_r5_final.log 2>&1 \
  && tail -1 /tmp/bench_r5_final.log \
  || echo "stage C FAILED"

echo "[$(date -u +%H:%M:%S)] === queue done"
