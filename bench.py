"""Sampler throughput benchmark. Prints ONE JSON line.

Metric: backbones/min/chip at length 300, full production model, 500
reverse steps/sample (the reference inference default,
`config/inference.yaml:18-24`).

Baseline (BASELINE.md north star): 100 length-300 backbones < 1 min on a
v5e-8 at parity designability => 12.5 backbones/min/chip. vs_baseline is
value / 12.5.
"""
import json
import os
import sys
import time

NORTH_STAR_PER_CHIP = 12.5  # backbones/min/chip @ len 300


def main():
    import jax

    from se3_diffusion_tpu.config import Config, DiffuserConfig, SO3Config
    from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
    from se3_diffusion_tpu.models.score_network import init_score_network
    from se3_diffusion_tpu.sampling import sample_backbones

    from se3_diffusion_tpu.config import ModelConfig

    num_res = int(os.environ.get("BENCH_LEN", 300))
    batch = int(os.environ.get("BENCH_BATCH", 4))
    num_t = int(os.environ.get("BENCH_NUM_T", 500))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    cfg = Config(
        diffuser=DiffuserConfig(so3=SO3Config(cache_dir=".cache/igso3")),
        model=ModelConfig(activation_dtype=dtype),
    )
    diffuser = SE3Diffuser.create(cfg.diffuser)
    model, params = init_score_network(jax.random.PRNGKey(0), cfg.model, 8)

    def run(key):
        return sample_backbones(
            key, model, params, diffuser,
            num_res=num_res, num_samples=batch, num_t=num_t,
        )

    import numpy as np

    # Compile (excluded from timing). np.asarray forces a device->host
    # sync; block_until_ready alone does not block through the axon relay.
    out = run(jax.random.PRNGKey(0))
    np.asarray(out.atom37)

    t0 = time.perf_counter()
    out = run(jax.random.PRNGKey(1))
    np.asarray(out.atom37)
    elapsed = time.perf_counter() - t0

    backbones_per_min = batch / (elapsed / 60.0)
    n_chips = max(1, len(jax.devices()))
    value = backbones_per_min / n_chips
    print(
        json.dumps(
            {
                "metric": f"backbones/min/chip len{num_res} num_t={num_t}",
                "value": round(value, 3),
                "unit": "backbones/min/chip",
                "vs_baseline": round(value / NORTH_STAR_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
