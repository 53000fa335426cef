#!/bin/bash
# Round-5 chip queue, stage 3: real-weight demos of the conditional
# sampling surfaces added this round, using the trained v9 EMA weights.
#  A) Partial diffusion (scripts/diversify.py): diversify one v9 sample
#     at a t_start ladder; TM-to-input should fall monotonically with
#     t_start while CA-CA validity holds — the measurable
#     local-resampling story.
#  B) Motif scaffolding (scripts/scaffold.py): re-scaffold a 28-residue
#     motif cut from a v9 sample; motif RMSD ~0 by construction, designs
#     report the standard geometry metrics.
# Usage: nohup bash scripts/round5_post_train6.sh <stage2_pid> > /tmp/post_train6_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RUN=synth_r5_v9
CONFIG=configs/synthetic_tpu_v9.yaml

QUEUE_PID=${1:?stage-2 pid}
echo "[$(date -u +%H:%M:%S)] waiting for stage-2 queue pid $QUEUE_PID"
while kill -0 "$QUEUE_PID" 2>/dev/null; do sleep 60; done

# Input structure: the first length-256 sample from the v9 protocol sweep.
INPUT=$(ls results/${RUN}_sweep/length_256/sample_0/sample*.pdb 2>/dev/null | head -1)
if [ -z "$INPUT" ]; then
  INPUT=$(find results/${RUN}_sweep -name "sample*.pdb" | sort | head -1)
fi
echo "[$(date -u +%H:%M:%S)] input structure: $INPUT"
[ -n "$INPUT" ] || { echo "no sweep sample found; aborting"; exit 1; }

echo "[$(date -u +%H:%M:%S)] === A: diversify t_start ladder"
for T in 0.2 0.4 0.7; do
  python scripts/diversify.py --pdb "$INPUT" \
    --config "$CONFIG" --weights "ckpt/$RUN" \
    --t_start "$T" --num_samples 8 --num_t 200 \
    --output_dir "results/diversify_demo_r5/t$T" \
    || echo "diversify t=$T FAILED"
done

echo "[$(date -u +%H:%M:%S)] === B: scaffold demo (motif = res 40-67 of input)"
python scripts/scaffold.py --contig "20-40,A40-67,20-40" \
  --motif_pdb "$INPUT" \
  --config "$CONFIG" --weights "ckpt/$RUN" \
  --num_designs 8 --num_t 200 \
  --output_dir results/scaffold_demo_r5 \
  || echo "scaffold demo FAILED"

echo "[$(date -u +%H:%M:%S)] queue done"
