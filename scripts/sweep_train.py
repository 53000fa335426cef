"""Hyperparameter sweep driver.

Covers the reference's Hydra-multirun + joblib launcher capability
(`config/base.yaml:3-4,123-128`, SURVEY.md section 2.9 "hyperparameter
parallelism") with an explicit driver: one training run per override
combination, each in its own checkpoint/eval namespace. Runs are
sequential per host (one accelerator per process); launch this script
once per host with disjoint --shard for multi-host sweeps.

Usage:
    python scripts/sweep_train.py --csv_path data/metadata.csv \
        --set experiment.learning_rate=1e-4,5e-5 \
        --set experiment.separate_rot_loss=true,false \
        [--max_steps 1000] [--shard 0/2]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import itertools
import logging


def parse_value(raw: str):
    if raw.lower() in ("true", "false"):
        return raw.lower() == "true"
    for cast in (int, float):
        try:
            return cast(raw)
        except ValueError:
            continue
    return raw


def apply_override(cfg, dotted: str, value):
    """Returns cfg with `a.b.c` replaced (frozen dataclasses)."""
    parts = dotted.split(".")
    if len(parts) == 1:
        return dataclasses.replace(cfg, **{parts[0]: value})
    child = getattr(cfg, parts[0])
    return dataclasses.replace(
        cfg, **{parts[0]: apply_override(child, ".".join(parts[1:]), value)}
    )


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--csv_path", required=True)
    p.add_argument("--cluster_path", default=None)
    p.add_argument("--set", action="append", default=[],
                   help="dotted.key=v1,v2,... (cartesian product over all --set)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--name", default="sweep")
    p.add_argument("--shard", default="0/1", help="i/n: run every n-th combo")
    args = p.parse_args()

    from se3_diffusion_tpu import config as config_lib
    from se3_diffusion_tpu.data.dataset import PdbDataset
    from se3_diffusion_tpu.training.experiment import Experiment

    axes = []
    for spec in args.set:
        key, _, vals = spec.partition("=")
        axes.append([(key, parse_value(v)) for v in vals.split(",")])
    combos = list(itertools.product(*axes)) if axes else [()]
    shard_i, shard_n = (int(x) for x in args.shard.split("/"))

    for idx, combo in enumerate(combos):
        if idx % shard_n != shard_i:
            continue
        cfg = config_lib.Config()
        cfg = apply_override(cfg, "data.csv_path", args.csv_path)
        if args.cluster_path is not None:
            cfg = apply_override(cfg, "data.cluster_path", args.cluster_path)
        tag = "_".join(f"{k.split('.')[-1]}={v}" for k, v in combo) or "default"
        cfg = apply_override(cfg, "experiment.name", f"{args.name}_{idx}_{tag}")
        for key, value in combo:
            cfg = apply_override(cfg, key, value)
        logging.info("=== run %d/%d: %s ===", idx + 1, len(combos), tag)
        exp = Experiment(cfg)
        exp.train(
            PdbDataset(cfg.data, is_training=True),
            valid_dataset=None,
            max_steps=args.max_steps,
        )
        exp.ckpt_mgr.close()


if __name__ == "__main__":
    main()
