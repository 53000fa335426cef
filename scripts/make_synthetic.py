"""Generate a synthetic training curriculum (see data/synthetic.py).

Usage:
    python scripts/make_synthetic.py --out datasets/synthetic_v2 \
        --num_topologies 500 --snapshots 3 --min_len 60 --max_len 256

Output follows the processed-dataset contract of the reference's
`data/process_pdb_dataset.py` (.pkl per chain + metadata.csv), so the
training stack consumes it unchanged.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from se3_diffusion_tpu.data import synthetic as syn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--num_topologies", type=int, default=400)
    p.add_argument("--snapshots", type=int, default=3)
    p.add_argument("--min_len", type=int, default=60)
    p.add_argument("--max_len", type=int, default=256)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument(
        "--ss_probs",
        default=",".join(str(x) for x in syn.DEFAULT_SS_PROBS),
        help="comma probabilities over segment types H,S,E,L",
    )
    p.add_argument("--max_strands", type=int, default=3)
    p.add_argument(
        "--batched",
        action="store_true",
        help="use the XLA-batched generator (data/synthetic_batch.py)",
    )
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument(
        "--long_frac",
        type=float,
        default=0.0,
        help="fraction of chains drawn uniformly from [long_min, max_len]",
    )
    p.add_argument("--long_min", type=int, default=320)
    p.add_argument("--descending", action="store_true",
                   help="batched mode: generate longest chains first")
    p.add_argument("--steps_mult", type=int, default=4,
                   help="pivot-MC step budget multiplier (per residue)")
    p.add_argument("--anneal_moves", action="store_true",
                   help="shrink pivot size along the collapse (long chains)")
    args = p.parse_args()

    ss_probs = tuple(float(x) for x in args.ss_probs.split(","))
    assert abs(sum(ss_probs) - 1.0) < 1e-6, ss_probs

    cfg = syn.CurriculumConfig(
        num_topologies=args.num_topologies,
        snapshots_per_topology=args.snapshots,
        min_len=args.min_len,
        max_len=args.max_len,
        seed=args.seed,
        ss_probs=ss_probs,
        max_strands=args.max_strands,
    )
    if args.batched:
        from se3_diffusion_tpu.data import synthetic_batch as sb

        csv = sb.generate_dataset_batch(
            args.out,
            cfg,
            batch_size=args.batch_size,
            long_frac=args.long_frac,
            long_min=args.long_min,
            descending=args.descending,
            steps_mult=args.steps_mult,
            anneal_moves=args.anneal_moves,
        )
    else:
        csv = syn.generate_dataset(args.out, cfg, num_processes=args.num_processes)
    print(csv)


if __name__ == "__main__":
    main()
