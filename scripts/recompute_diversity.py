"""Recompute a finished sweep directory's summary.json diversity block
from its sample PDBs (used when the metric definition changes after the
sweep ran — e.g. the round-5 TM-align strict/aggressive split).

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/recompute_diversity.py results/synth_r5_v7_sweep
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_ca(pdb_path):
    cas = []
    for line in open(pdb_path):
        if line.startswith("ATOM") and line[12:16].strip() == "CA":
            cas.append(
                [float(line[30:38]), float(line[38:46]), float(line[46:54])]
            )
    return np.asarray(cas, np.float32)


def main():
    sweep_dir = sys.argv[1]
    from se3_diffusion_tpu.evaluation import metrics as metrics_lib

    import pandas as pd

    df = pd.read_csv(os.path.join(sweep_dir, "metrics.csv"))
    samples = [
        (int(r["length"]), load_ca(r["sample_path"])) for _, r in df.iterrows()
    ]
    print(f"{len(samples)} samples")

    cas = [c for _, c in samples]
    summary_path = os.path.join(sweep_dir, "summary.json")
    summary = json.load(open(summary_path)) if os.path.exists(summary_path) else {}
    summary.update(metrics_lib.diversity(cas))
    per_len = {}
    lengths = sorted({l for l, _ in samples})
    for L in lengths:
        group = [c for l, c in samples if l == L]
        if len(group) >= 2:
            per_len[str(L)] = metrics_lib.diversity(group)["diversity"]
    summary["diversity_by_length"] = per_len
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
