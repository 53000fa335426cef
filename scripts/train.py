"""Training CLI.

Usage:
    python scripts/train.py [--config cfg.yaml] [--csv_path ...] \
        [--name run1] [--max_steps N]

Equivalent entry point to the reference's hydra-run
`experiments/train_se3_diffusion.py`; configuration is the typed tree in
`se3_diffusion_tpu.config` with YAML overrides.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import logging

from se3_diffusion_tpu import config as config_lib
from se3_diffusion_tpu.data.dataset import PdbDataset
from se3_diffusion_tpu.training.experiment import Experiment


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="YAML override file")
    p.add_argument("--preset", default=None,
                   help="base | icml_published | pure_dsm")
    p.add_argument("--csv_path", default=None)
    p.add_argument("--cluster_path", default=None)
    p.add_argument("--name", default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--warm_start", default=None)
    p.add_argument("--no_eval", action="store_true")
    p.add_argument("--log_freq", type=int, default=None)
    p.add_argument("--ckpt_freq", type=int, default=None)
    args = p.parse_args()

    if args.preset:
        from se3_diffusion_tpu import presets

        cfg = presets.get(args.preset)
    elif args.config:
        cfg = config_lib.load_yaml(args.config)
    else:
        cfg = config_lib.Config()
    if args.csv_path:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, csv_path=args.csv_path)
        )
    if args.cluster_path:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, cluster_path=args.cluster_path)
        )
    exp_over = {}
    if args.name:
        exp_over["name"] = args.name
    if args.warm_start:
        exp_over["warm_start"] = args.warm_start
    if args.log_freq is not None:
        exp_over["log_freq"] = args.log_freq
    if args.ckpt_freq is not None:
        exp_over["ckpt_freq"] = args.ckpt_freq
    if exp_over:
        cfg = dataclasses.replace(
            cfg, experiment=dataclasses.replace(cfg.experiment, **exp_over)
        )

    train_ds = PdbDataset(cfg.data, is_training=True)
    valid_ds = None if args.no_eval else PdbDataset(cfg.data, is_training=False)
    exp = Experiment(cfg)
    exp.train(train_ds, valid_ds, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
