"""Aggregates the num_t tradeoff sweep (scripts/num_t_tradeoff.sh) into
one JSON table: per (integrator, num_t) x length — CA-CA validity, clash
count, strand%, violation rates — plus the implied sampler throughput
scaling (reverse steps are the unit of cost: time/sample is linear in
num_t at fixed length, so bb/min at num_t=N is ~(500/N) x the measured
num_t=500 headline).

Usage:
    python scripts/num_t_aggregate.py --root results/num_t \
        --out results/num_t_tradeoff.json
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import json

import numpy as np
import pandas as pd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="results/num_t")
    p.add_argument("--out", default="results/num_t_tradeoff.json")
    args = p.parse_args()

    rows = []
    for d in sorted(glob.glob(os.path.join(args.root, "*_t*"))):
        name = os.path.basename(d)
        mode, t_part = name.rsplit("_t", 1)
        csv = os.path.join(d, "metrics.csv")
        if not os.path.exists(csv):
            print(f"skip {name}: no metrics.csv", file=sys.stderr)
            continue
        df = pd.read_csv(csv)
        summary_path = os.path.join(d, "summary.json")
        summary = (
            json.load(open(summary_path)) if os.path.exists(summary_path) else {}
        )
        for length, g in df.groupby("length"):
            rows.append(
                {
                    "integrator": mode,
                    "num_t": int(t_part),
                    "length": int(length),
                    "samples": len(g),
                    "ca_ca_valid": float(g["ca_ca_valid_percent"].mean()),
                    "num_ca_clashes": float(g["num_ca_clashes"].mean()),
                    "strand_percent": float(g["strand_percent"].mean()),
                    "helix_percent": float(g["helix_percent"].mean()),
                    "violations_between_residue_clash": float(
                        g["violations_between_residue_clash"].mean()
                    ),
                    "violations_between_residue_bond": float(
                        g["violations_between_residue_bond"].mean()
                    ),
                }
            )
        rows.append(
            {
                "integrator": mode,
                "num_t": int(t_part),
                "length": "all",
                "samples": len(df),
                "ca_ca_valid": float(df["ca_ca_valid_percent"].mean()),
                "num_ca_clashes": float(df["num_ca_clashes"].mean()),
                "strand_percent": float(df["strand_percent"].mean()),
                "diversity": summary.get("diversity"),
            }
        )
    out = {
        "protocol": "lengths {128,320,512} x 8 samples, noise_scale 0.1 "
        "(SDE) or probability-flow ODE, EMA weights",
        "throughput_note": "time/sample is linear in num_t at fixed "
        "length; bb/min at num_t=N ~= (500/N) * the num_t=500 headline",
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"configs": len(rows), "out": args.out}))


if __name__ == "__main__":
    main()


