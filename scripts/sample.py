"""Sampling/inference CLI.

Usage:
    python scripts/sample.py --weights ckpt_dir_or_torch.pth \
        [--min_length 100 --max_length 500 --length_step 5] \
        [--samples_per_length 10] [--num_t 500] [--output_dir out/]

Equivalent entry point to the reference's
`experiments/inference_se3_diffusion.py` (length sweep + resumable
sample dirs + trajectory PDBs). Self-consistency runs when a sequence
designer + folder are available (see sampling/inference.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import logging

import jax

from se3_diffusion_tpu import config as config_lib
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.models.score_network import ScoreNetwork, dummy_features
from se3_diffusion_tpu.sampling.inference import InferenceRunner
from se3_diffusion_tpu.training import checkpoints as ckpt_lib


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--weights", default=None, help="orbax dir or torch .pth")
    p.add_argument("--min_length", type=int, default=None)
    p.add_argument("--max_length", type=int, default=None)
    p.add_argument("--length_step", type=int, default=None)
    p.add_argument("--samples_per_length", type=int, default=None)
    p.add_argument("--num_t", type=int, default=None)
    p.add_argument("--noise_scale", type=float, default=None)
    p.add_argument("--probability_flow", action="store_true")
    p.add_argument("--output_dir", default=None)
    p.add_argument(
        "--raw_params", action="store_true",
        help="use raw (non-EMA) params from an orbax checkpoint",
    )
    p.add_argument(
        "--clash_guidance_weight", type=float, default=None,
        help="reverse-time CA-CA clash guidance strength (0 = off, the "
        "reference-faithful default; framework addition)",
    )
    p.add_argument("--clash_guidance_margin", type=float, default=None)
    p.add_argument("--clash_guidance_t_max", type=float, default=None)
    args = p.parse_args()

    cfg = config_lib.load_yaml(args.config) if args.config else config_lib.Config()
    samples = cfg.inference.samples
    for k in ("min_length", "max_length", "length_step", "samples_per_length"):
        if getattr(args, k) is not None:
            samples = dataclasses.replace(samples, **{k: getattr(args, k)})
    diffusion = cfg.inference.diffusion
    if args.num_t is not None:
        diffusion = dataclasses.replace(diffusion, num_t=args.num_t)
    for k in ("clash_guidance_weight", "clash_guidance_margin",
              "clash_guidance_t_max"):
        if getattr(args, k) is not None:
            diffusion = dataclasses.replace(diffusion, **{k: getattr(args, k)})
    if args.noise_scale is not None:
        diffusion = dataclasses.replace(diffusion, noise_scale=args.noise_scale)
    if args.probability_flow:
        diffusion = dataclasses.replace(diffusion, probability_flow=True)
    inference = dataclasses.replace(
        cfg.inference,
        samples=samples,
        diffusion=diffusion,
        output_dir=args.output_dir or cfg.inference.output_dir,
    )
    cfg = dataclasses.replace(cfg, inference=inference)
    # Apply the reference's YAML interpolations (ipa.c_s tracks
    # node_embed_size etc.) before the model is built — without this a
    # config that overrides embedding sizes builds a mismatched trunk.
    cfg = config_lib.resolve(cfg)

    diffuser = SE3Diffuser.create(cfg.diffuser)
    model = ScoreNetwork(cfg.model)
    if args.weights:
        params = ckpt_lib.warm_start_params(
            args.weights, cfg.model, prefer_ema=not args.raw_params
        )
    else:
        logging.warning("No --weights given; sampling with random init")
        params = model.init(jax.random.PRNGKey(0), dummy_features(1, 8))["params"]

    # Wire the self-consistency legs when backends/weights are available
    # (reference always runs design+fold, `inference_se3_diffusion.py:295`);
    # with neither, the sweep still reports backbone metrics + diversity.
    from se3_diffusion_tpu.sampling.design import make_designer_from_config
    from se3_diffusion_tpu.sampling.folding import make_folder_from_config

    designer = make_designer_from_config(cfg.inference.design)
    folder = make_folder_from_config(cfg.inference.folding)
    if designer is None or folder is None:
        logging.warning(
            "Self-consistency disabled (designer=%s, folder=%s): "
            "missing weights or backend — see inference.design / "
            "inference.folding config",
            "on" if designer else "off", "on" if folder else "off",
        )

    runner = InferenceRunner(
        cfg=cfg, model=model, params=params, diffuser=diffuser,
        sequence_designer=designer, folder=folder,
    )
    df = runner.run_sampling()
    print(df.to_string() if len(df) else "nothing to do (all dirs exist)")


if __name__ == "__main__":
    main()
