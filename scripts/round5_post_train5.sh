#!/bin/bash
# Round-5 chip queue, stage 2: after the v9 post-train queue
# (round5_post_train4.sh — sweep/A-B/bench) releases the TPU lease,
# re-scan the sampler batch size at the num_t=200 protocol. The round-4
# sweep that fixed B=4 as optimal (results/sampler_batch_sweep_r4.json)
# ran at num_t=500; the headline protocol changed to 200 steps
# (results/num_t_tradeoff.json) and the optimum may have moved — shorter
# trajectories shift the compile/dispatch overhead balance.
# Usage: nohup bash scripts/round5_post_train5.sh > /tmp/post_train5_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

QUEUE_PID=${1:-28482}
echo "[$(date -u +%H:%M:%S)] waiting for post_train4 queue pid $QUEUE_PID"
while kill -0 "$QUEUE_PID" 2>/dev/null; do sleep 60; done

echo "[$(date -u +%H:%M:%S)] === batch sweep at num_t=200"
python scripts/bench_sampler_batch.py \
  --lens 300 --batches 2,4,8,16 --num_t 200 \
  --out results/sampler_batch_sweep_numt200.json \
  || echo "batch sweep FAILED"

# XLA-vs-Pallas IPA re-measure (CLAUDE.md: these flipped between
# toolchain builds — revalidate the XLA-default decision each round).
echo "[$(date -u +%H:%M:%S)] === IPA impl re-measure (end-to-end sampler)"
python scripts/bench_sampler_impls.py > /tmp/ipa_impls_r5.log 2>&1 \
  && tail -5 /tmp/ipa_impls_r5.log \
  || echo "IPA re-measure FAILED"

echo "[$(date -u +%H:%M:%S)] queue done"
