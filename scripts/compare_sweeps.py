"""Compare two protocol sweeps (A/B) into one markdown + JSON table.

Round-5 use: attribute the clash-penalty training run's effect —
  A = results/synth_r4_v6b_resweep_r5   (v6b weights, no clash loss)
  B = results/synth_r5_v7_sweep         (v7 weights, clash hinge on)
plus optional guidance/extrapolation sweeps. Reports, per sweep and per
length: CA-CA validity, mean/max CA clashes, AF2 between-residue
clash/bond violations, strand%, diversity (TM-align), and the headline
aggregates the VERDICT bars are written against.

Usage:
    python scripts/compare_sweeps.py \
        --a results/synth_r4_v6b_resweep_r5 --label_a v6b \
        --b results/synth_r5_v7_sweep --label_b v7 \
        --out results/clash_ab_r5.json
"""
import argparse
import json
import os
import sys

import numpy as np
import pandas as pd

AGG_COLS = {
    "ca_ca_valid_percent": "mean",
    "num_ca_clashes": "mean",
    "violations_between_residue_clash": "mean",
    "violations_between_residue_bond": "mean",
    "strand_percent": "mean",
    "helix_percent": "mean",
}


def load_sweep(path):
    df = pd.read_csv(os.path.join(path, "metrics.csv"))
    summary = {}
    sp = os.path.join(path, "summary.json")
    if os.path.exists(sp):
        summary = json.load(open(sp))
    return df, summary


def sweep_report(df, summary):
    rep = {
        "n_samples": int(len(df)),
        "overall": {k: float(df[k].mean()) for k in AGG_COLS if k in df},
        "by_length": {},
    }
    for length, g in df.groupby("length"):
        rep["by_length"][str(int(length))] = {
            k: float(g[k].mean()) for k in AGG_COLS if k in g
        }
        rep["by_length"][str(int(length))]["max_ca_clashes"] = float(
            g["num_ca_clashes"].max()
        )
    for k in ("diversity", "num_clusters", "diversity_by_length"):
        if k in summary:
            rep[k] = summary[k]
    return rep


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--a", required=True)
    p.add_argument("--label_a", default="A")
    p.add_argument("--b", required=True)
    p.add_argument("--label_b", default="B")
    p.add_argument("--c", default=None,
                   help="optional third sweep (progression table)")
    p.add_argument("--label_c", default="C")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    runs = [(args.label_a, args.a), (args.label_b, args.b)]
    if args.c:
        runs.append((args.label_c, args.c))
    out = {}
    for label, path in runs:
        df, summary = load_sweep(path)
        out[label] = sweep_report(df, summary)

    # Markdown table: per-length CA clashes + validity side by side.
    labels = [label for label, _ in runs]
    lengths = sorted(
        set.intersection(*(set(out[l]["by_length"]) for l in labels)), key=int
    )
    cols = [
        ("validity", "ca_ca_valid_percent", ".3f"),
        ("CA clashes", "num_ca_clashes", ".1f"),
        ("res-clash viol", "violations_between_residue_clash", ".3f"),
    ]
    header = " | ".join(
        f"{name} {l}" for name, _, _ in cols for l in labels
    )
    print(f"| length | {header} |")
    print("|---" * (1 + len(cols) * len(labels)) + "|")
    for L in lengths:
        cells = [
            format(out[l]["by_length"][L][key], fmt)
            for _, key, fmt in cols
            for l in labels
        ]
        print(f"| {L} | " + " | ".join(cells) + " |")
    for label in labels:
        o = out[label]["overall"]
        print(
            f"{label}: n={out[label]['n_samples']} "
            f"validity={o['ca_ca_valid_percent']:.3f} "
            f"clashes={o['num_ca_clashes']:.2f} "
            f"res_clash={o['violations_between_residue_clash']:.3f} "
            f"bond={o['violations_between_residue_bond']:.3f} "
            f"strand={o['strand_percent']:.3f} "
            f"diversity={out[label].get('diversity')}"
        )

    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
