"""Times the IPA module XLA vs Pallas on the real chip (B=4, N=384)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from se3_diffusion_tpu.config import IpaConfig
from se3_diffusion_tpu.geometry import quat as ql
from se3_diffusion_tpu.geometry.rigid import Rigid
from se3_diffusion_tpu.models.ipa import InvariantPointAttention


def run(impl: str, dtype_name: str, batch=4, num_res=384, iters=20):
    conf = dataclasses.replace(IpaConfig(), attention_impl=impl)
    dt = jnp.bfloat16 if dtype_name == "bfloat16" else None
    mod = InvariantPointAttention(conf, dtype=dt)
    key = jax.random.PRNGKey(0)
    s = jax.random.normal(key, (batch, num_res, conf.c_s), jnp.float32)
    z = jax.random.normal(key, (batch, num_res, num_res, conf.c_z), jnp.float32)
    quats = ql.quat_normalize(jax.random.normal(key, (batch, num_res, 4)))
    trans = jax.random.normal(key, (batch, num_res, 3))
    r = Rigid(quat=quats, trans=trans)
    mask = jnp.ones((batch, num_res), jnp.float32)
    params = mod.init(key, s, z, r, mask)["params"]

    @jax.jit
    def fwd(params, s, z, r, mask):
        return mod.apply({"params": params}, s, z, r, mask)

    out = fwd(params, s, z, r, mask)
    np.asarray(out)  # sync through relay
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, s + 0.0 * out.astype(s.dtype), z, r, mask)
    np.asarray(out)
    ms = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{impl:7s} {dtype_name:9s} fwd {ms:8.3f} ms", flush=True)
    return ms


if __name__ == "__main__":
    results = {}
    for dtype_name in ("bfloat16", "float32"):
        for impl in ("xla", "pallas"):
            try:
                results[(impl, dtype_name)] = run(impl, dtype_name)
            except Exception as e:  # noqa: BLE001
                print(f"{impl} {dtype_name} FAILED: {type(e).__name__}: {e}",
                      flush=True)
    print(results)
