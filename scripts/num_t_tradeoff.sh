#!/bin/bash
# Quality-vs-cost curve over reverse-step count (round-5 VERDICT #6).
#
# The reference burns num_t=500 reverse steps per sample
# (`config/inference.yaml:18-37`); this sweeps num_t x integrator on the
# SAME weights and length grid so the quality cost of fewer steps is
# measured instead of guessed:
#   num_t in {50, 100, 200, 500}  x  {SDE noise_scale 0.1, prob-flow ODE}
#   lengths {128, 320, 512}, 8 samples each.
# Aggregate with scripts/num_t_aggregate.py -> results/num_t_tradeoff.json.
#
# Usage: bash scripts/num_t_tradeoff.sh ckpt/synth_r5_v7 [results/num_t] [config.yaml]
# One TPU process at a time (axon lease); ~12 compiles dominate wall time.
set -euo pipefail
WEIGHTS=${1:?weights dir}
OUT=${2:-results/num_t}
CONFIG=${3:-configs/synthetic_tpu_v7.yaml}
for NT in 50 100 200 500; do
  for MODE in sde ode; do
    FLAGS=""
    if [ "$MODE" = ode ]; then FLAGS="--probability_flow"; fi
    echo "=== num_t=$NT $MODE"
    python scripts/sample.py \
      --config "$CONFIG" \
      --weights "$WEIGHTS" \
      --min_length 128 --max_length 512 --length_step 192 \
      --samples_per_length 8 \
      --num_t "$NT" --noise_scale 0.1 $FLAGS \
      --output_dir "$OUT/${MODE}_t${NT}"
  done
done
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/num_t_aggregate.py \
  --root "$OUT" --out results/num_t_tradeoff.json
