"""Sampler batch-size throughput sweep on the real chip.

VERDICT round-3 weak #2: headline throughput has been measured at
BENCH_BATCH=4 for three rounds without ever scanning the batch size.
This sweeps B at fixed length/num_t inside ONE process (model built
once, one AOT compile per (B, len) shape) and records
backbones/min/chip per point so the throughput-optimal batch is known.

Usage (real TPU, default axon env):
    python scripts/bench_sampler_batch.py \
        --lens 300,100 --batches 4,8,16,32 --num_t 500 \
        --out results/sampler_batch_sweep_r4.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lens", default="300,100")
    p.add_argument("--batches", default="4,8,16,32")
    p.add_argument("--num_t", type=int, default=500)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--out", default="results/sampler_batch_sweep_r4.json")
    args = p.parse_args()

    import jax
    import numpy as np

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
    n_chips = max(1, len(jax.devices()))

    points = []
    for num_res in (int(x) for x in args.lens.split(",")):
        for batch in (int(x) for x in args.batches.split(",")):

            def run(key):
                return sample_backbones(
                    key, model, params, diffuser,
                    num_res=num_res, num_samples=batch, num_t=args.num_t,
                )

            t0 = time.perf_counter()
            np.asarray(run(jax.random.PRNGKey(0)).atom37)  # compile
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(run(jax.random.PRNGKey(1)).atom37)
            elapsed = time.perf_counter() - t0
            pt = {
                "num_res": num_res,
                "batch": batch,
                "num_t": args.num_t,
                "dtype": args.dtype,
                "elapsed_s": round(elapsed, 3),
                "compile_plus_first_run_s": round(compile_s, 1),
                "backbones_per_min_chip": round(
                    batch / (elapsed / 60.0) / n_chips, 3
                ),
                "step_ms": round(elapsed / args.num_t * 1000.0, 3),
            }
            points.append(pt)
            print(json.dumps(pt), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"points": points, "n_chips": n_chips}, f, indent=1)
    best = max(points, key=lambda q: q["backbones_per_min_chip"])
    print("best:", json.dumps(best))


if __name__ == "__main__":
    main()
