"""Combine synthetic curriculum datasets into one metadata.csv.

Writes a metadata.csv whose processed_path entries are relative to the
output csv's directory (PdbDataset resolves them against the csv
location), so no pkl files are copied.

Usage:
    python scripts/combine_datasets.py --out datasets/synthetic_combined_v4 \
        datasets/synthetic_v1 datasets/synthetic_v2 datasets/synthetic_v3
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+", help="dataset dirs with metadata.csv")
    p.add_argument("--out", required=True)
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
