#!/bin/bash
# Round-5 chip queue, part 2 — runs after scripts/round5_post_train.sh:
#   E. v6b 104-sample re-sweep under the SAME metric stack (TM-align
#      diversity; per-length buckets) -> the honest A/B for the v7
#      clash-penalty run, and the recomputed v6b diversity VERDICT #3
#      asks for (the round-4 per-sample PDBs were deleted, so
#      re-sampling from the committed v6b weights is the only way).
#   F. clean uncontended bench snapshot (VERDICT #4).
# Usage: nohup bash scripts/round5_post_train2.sh > /tmp/post_train2_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

Q1=$(cat /tmp/post_train.pid 2>/dev/null || echo "")
if [ -n "$Q1" ]; then
  echo "[$(date -u +%H:%M:%S)] waiting for queue-1 pid $Q1"
  while kill -0 "$Q1" 2>/dev/null; do sleep 60; done
fi

echo "[$(date -u +%H:%M:%S)] === stage E: v6b re-sweep (TM-align metrics A/B)"
python scripts/sample.py --config configs/synthetic_tpu_v6.yaml \
  --weights ckpt/synth_r4_v6b/params_90000.npz \
  --min_length 64 --max_length 512 --length_step 64 \
  --samples_per_length 13 \
  --output_dir results/synth_r4_v6b_resweep_r5 \
  || echo "stage E FAILED"

echo "[$(date -u +%H:%M:%S)] === stage F: clean bench snapshot"
python bench.py || echo "stage F FAILED"

echo "[$(date -u +%H:%M:%S)] === queue-2 done"
