#!/bin/bash
# Round-5 post-training chip queue. Waits for the live v7 train process to
# exit, then runs each evaluation stage sequentially (the axon relay
# serializes python processes on the TPU lease — exactly one at a time):
#   A. 104-sample EMA protocol sweep, lengths 64-512 (VERDICT #1)
#   B. clash-guidance A/B on the SAME weights at the clashy lengths
#      (attributes loss-side vs sampler-side gains, VERDICT #1)
#   C. num_t quality-vs-cost sweep (VERDICT #6)
#   D. length 576/640 extrapolation past the reference's 512 wall
#      (VERDICT #7)
# Stages are independent: a failure logs and moves on.
#
# Usage: nohup bash scripts/round5_post_train.sh > /tmp/post_train_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RUN=synth_r5_v7
CONFIG=configs/synthetic_tpu_v7.yaml

TRAIN_PID=$(cat /tmp/train_v7.pid 2>/dev/null || echo "")
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

echo "[$(date -u +%H:%M:%S)] === stage B: clash-guidance A/B at 320/416/512"
python scripts/sample.py --config "$CONFIG" --weights "ckpt/$RUN" \
  --min_length 320 --max_length 512 --length_step 96 \
  --samples_per_length 8 --clash_guidance_weight 1.0 \
  --output_dir "results/${RUN}_guidance" \
  || echo "stage B FAILED"

echo "[$(date -u +%H:%M:%S)] === stage C: num_t tradeoff"
bash scripts/num_t_tradeoff.sh "ckpt/$RUN" results/num_t "$CONFIG" \
  || echo "stage C FAILED"

echo "[$(date -u +%H:%M:%S)] === stage D: length 576/640 extrapolation"
python scripts/sample.py --config "$CONFIG" --weights "ckpt/$RUN" \
  --min_length 576 --max_length 640 --length_step 64 \
  --samples_per_length 8 \
  --output_dir "results/${RUN}_len640" \
  || echo "stage D FAILED"

echo "[$(date -u +%H:%M:%S)] === queue done"
