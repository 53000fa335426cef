"""Combine synthetic curriculum datasets into one metadata.csv.

Writes a metadata.csv whose processed_path entries are relative to the
output csv's directory (PdbDataset resolves them against the csv
location), so no pkl files are copied.

Usage:
    python scripts/combine_datasets.py --out datasets/synthetic_combined_v4 \
        datasets/synthetic_v1 datasets/synthetic_v2 datasets/synthetic_v3

With --max_ca_clashes N, chains whose ground truth has more than N
non-adjacent CA pairs closer than 1.5 A (the eval clash metric,
reference `analysis/metrics.py:127-132`) are dropped — the pivot-MC
generator occasionally produces overlapping long-range contacts, and
training on them teaches the model to clash. Counts are cached per
input dir in ca_clashes.csv so re-runs are cheap.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

CLASH_DIST = 1.5  # se3_diffusion_tpu.evaluation.metrics.CLASH_DIST


def count_ca_clashes(pkl_path: str) -> int:
    import pickle

    with open(pkl_path, "rb") as f:
        d = pickle.load(f)
    mask = d["atom_mask"][:, 1] > 0.5
    ca = d["atom_positions"][mask, 1]
    idx = np.arange(len(d["atom_mask"]))[mask]
    dist = np.linalg.norm(ca[:, None] - ca[None, :], axis=-1)
    sep = np.abs(idx[:, None] - idx[None, :])
    return int(((dist < CLASH_DIST) & (sep >= 2)).sum() // 2)


def clash_counts_for_dir(d: str, names, paths) -> pd.Series:
    """num_ca_clashes per pdb_name, cached in <dir>/ca_clashes.csv."""
    cache_path = os.path.join(d, "ca_clashes.csv")
    cache = {}
    if os.path.exists(cache_path):
        cdf = pd.read_csv(cache_path)
        cache = dict(zip(cdf.pdb_name, cdf.num_ca_clashes))
    missing = [(n, q) for n, q in zip(names, paths) if n not in cache]
    for i, (n, q) in enumerate(missing):
        cache[n] = count_ca_clashes(q)
        if i and i % 2000 == 0:
            print(f"  {d}: scanned {i}/{len(missing)}", flush=True)
    if missing:
        pd.DataFrame(
            {"pdb_name": list(cache), "num_ca_clashes": list(cache.values())}
        ).to_csv(cache_path, index=False)
    return pd.Series([cache[n] for n in names], index=range(len(names)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+", help="dataset dirs with metadata.csv")
    p.add_argument("--out", required=True)
    p.add_argument(
        "--max_ca_clashes",
        type=int,
        default=None,
        help="drop chains with more ground-truth CA clashes than this",
    )
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    out_abs = os.path.abspath(args.out)
    frames = []
    for d in args.inputs:
        csv = os.path.join(d, "metadata.csv")
        df = pd.read_csv(csv)
        base = os.path.dirname(os.path.abspath(csv))

        def rel(pth):
            ap = (
                pth
                if os.path.isabs(pth)
                else os.path.normpath(os.path.join(base, pth))
            )
            return os.path.relpath(ap, out_abs)

        df["processed_path"] = df.processed_path.map(rel)
        missing = [
            q for q in df.processed_path
            if not os.path.exists(os.path.join(out_abs, q))
        ]
        assert not missing, (d, missing[:3])
        if args.max_ca_clashes is not None:
            abs_paths = [os.path.join(out_abs, q) for q in df.processed_path]
            clashes = clash_counts_for_dir(d, list(df.pdb_name), abs_paths)
            keep = clashes.values <= args.max_ca_clashes
            print(
                f"{d}: dropping {int((~keep).sum())}/{len(df)} chains with "
                f">{args.max_ca_clashes} GT CA clashes",
                flush=True,
            )
            df = df[keep].reset_index(drop=True)
        frames.append(df)
    merged = pd.concat(frames, ignore_index=True)
    out_csv = os.path.join(args.out, "metadata.csv")
    merged.to_csv(out_csv, index=False)
    ss = {
        c: round(float(merged[c].mean()), 4)
        for c in ("helix_percent", "strand_percent", "coil_percent")
    }
    print(f"{out_csv}: {len(merged)} chains, mean SS {ss}")


if __name__ == "__main__":
    main()
