"""Times the full sampler with XLA vs Pallas IPA attention (real chip)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import numpy as np

from se3_diffusion_tpu.config import (
    Config,
    DiffuserConfig,
    IpaConfig,
    ModelConfig,
    SO3Config,
)
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.models.score_network import init_score_network
from se3_diffusion_tpu.sampling import sample_backbones


def run(impl, num_res=300, batch=4, num_t=100, dtype="bfloat16"):
    cfg = Config(
        diffuser=DiffuserConfig(so3=SO3Config(cache_dir=".cache/igso3")),
        model=ModelConfig(
            activation_dtype=dtype,
            ipa=dataclasses.replace(IpaConfig(), attention_impl=impl),
        ),
    )
    diffuser = SE3Diffuser.create(cfg.diffuser)
    model, params = init_score_network(jax.random.PRNGKey(0), cfg.model, 8)

    def go(key):
        return sample_backbones(
            key, model, params, diffuser,
            num_res=num_res, num_samples=batch, num_t=num_t,
        )

    np.asarray(go(jax.random.PRNGKey(0)).atom37)  # compile
    t0 = time.perf_counter()
    np.asarray(go(jax.random.PRNGKey(1)).atom37)
    el = time.perf_counter() - t0
    bb_min = batch / (el / 60.0)
    print(f"{impl:7s} len{num_res} num_t={num_t} {dtype}: {el:.2f}s "
          f"= {bb_min:.1f} bb/min ({el / num_t * 1000:.1f} ms/step)",
          flush=True)
    return el


if __name__ == "__main__":
    for impl in ("xla", "pallas"):
        try:
            run(impl)
        except Exception as e:  # noqa: BLE001
            print(f"{impl} FAILED: {type(e).__name__}: {e}", flush=True)
