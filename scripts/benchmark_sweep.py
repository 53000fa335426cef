"""Length-sweep sampling benchmark (BASELINE config 2).

Times batched sampling across a length sweep (reference inference
defaults: lengths 100-500 step 5) with static-shape length buckets so one
compiled program serves each bucket. Prints one JSON line per bucket and
a summary line.

Usage:
    python scripts/benchmark_sweep.py [--min 100 --max 500 --step 100]
        [--samples 4] [--num_t 500] [--dtype bfloat16]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--min", type=int, default=100)
    p.add_argument("--max", type=int, default=500)
    p.add_argument("--step", type=int, default=100)
    p.add_argument("--samples", type=int, default=4)
    p.add_argument("--num_t", type=int, default=500)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from se3_diffusion_tpu.config import (
        Config,
        DiffuserConfig,
        ModelConfig,
        SO3Config,
    )
    from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
    from se3_diffusion_tpu.models.score_network import init_score_network
    from se3_diffusion_tpu.sampling import sample_backbones

    cfg = Config(
        diffuser=DiffuserConfig(so3=SO3Config(cache_dir=".cache/igso3")),
        model=ModelConfig(activation_dtype=args.dtype),
    )
    diffuser = SE3Diffuser.create(cfg.diffuser)
    model, params = init_score_network(jax.random.PRNGKey(0), cfg.model, 8)

    total_bb, total_time = 0, 0.0
    for length in range(args.min, args.max + 1, args.step):
        def run(key):
            return sample_backbones(
                key, model, params, diffuser,
                num_res=length, num_samples=args.samples, num_t=args.num_t,
            )

        np.asarray(run(jax.random.PRNGKey(length)).atom37)  # compile
        t0 = time.perf_counter()
        np.asarray(run(jax.random.PRNGKey(length + 1)).atom37)
        el = time.perf_counter() - t0
        total_bb += args.samples
        total_time += el
        print(
            json.dumps(
                {
                    "length": length,
                    "samples": args.samples,
                    "seconds": round(el, 3),
                    "backbones_per_min_per_chip": round(
                        args.samples / (el / 60.0), 2
                    ),
                }
            )
        )
    print(
        json.dumps(
            {
                "metric": f"sweep {args.min}-{args.max} step {args.step}",
                "value": round(total_bb / (total_time / 60.0), 2),
                "unit": "backbones/min/chip",
            }
        )
    )


if __name__ == "__main__":
    main()
