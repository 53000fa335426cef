#!/bin/bash
# Round-5 final chip queue (v8 weights — no v9 train run fits the round
# budget; the demos and perf re-measures are the remaining chip work).
# Stages run strictly sequentially: the axon relay serializes python
# processes on the TPU lease.
#  A) Sampler batch re-scan at the num_t=200 headline protocol — the
#     round-4 optimum (B=4) was measured at num_t=500; shorter
#     trajectories shift the dispatch/compile balance, and bench.py's
#     default batch should track the measured optimum.
#  B) Partial-diffusion demo: diversify one v8 length-256 sample at a
#     t_start ladder. TM-to-input should fall monotonically with
#     t_start while CA-CA validity holds.
#  C) Motif-scaffolding demo: re-scaffold residues 40-67 of the same
#     input; motif RMSD ~0 by construction, designs report standard
#     geometry metrics.
#  D) XLA-vs-Pallas IPA re-measure (CLAUDE.md: flips between toolchain
#     builds — revalidate each round).
# Usage: nohup bash scripts/round5_final_queue.sh > /tmp/final_queue_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
CONFIG=configs/synthetic_tpu_v8.yaml
WEIGHTS=ckpt/synth_r5_v8/params_40000.npz
INPUT=results/synth_r5_v8_sweep/length_256/sample_0/sample_1.pdb

echo "[$(date -u +%H:%M:%S)] === A: sampler batch sweep at num_t=200"
python scripts/bench_sampler_batch.py \
  --lens 300 --batches 2,4,8,16 --num_t 200 \
  --out results/sampler_batch_sweep_numt200.json \
  || echo "stage A FAILED"

echo "[$(date -u +%H:%M:%S)] === B: diversify t_start ladder"
for T in 0.2 0.4 0.7; do
  python scripts/diversify.py --pdb "$INPUT" \
    --config "$CONFIG" --weights "$WEIGHTS" \
    --t_start "$T" --num_samples 8 --num_t 200 \
    --output_dir "results/diversify_demo_r5/t$T" \
    || echo "diversify t=$T FAILED"
done

echo "[$(date -u +%H:%M:%S)] === C: scaffold demo (motif = res 40-67 of input)"
python scripts/scaffold.py --contig "20-40,A40-67,20-40" \
  --motif_pdb "$INPUT" \
  --config "$CONFIG" --weights "$WEIGHTS" \
  --num_designs 8 --num_t 200 \
  --output_dir results/scaffold_demo_r5 \
  || echo "stage C FAILED"

echo "[$(date -u +%H:%M:%S)] === D: IPA impl re-measure (end-to-end sampler)"
python scripts/bench_sampler_impls.py > /tmp/ipa_impls_r5.log 2>&1 \
  && tail -5 /tmp/ipa_impls_r5.log \
  || echo "stage D FAILED"

echo "[$(date -u +%H:%M:%S)] === queue done"
