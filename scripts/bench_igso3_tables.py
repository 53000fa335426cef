"""A/B the IGSO3 table geometry/dtype against train-step time.

Round-3 profile finding (results/train_profile): at B=4/N=384 the
compiled train step spends ~6.8% of device time in `copy-start` ops on
the f32[1000,1000] IGSO3 tables — 1000 is not a multiple of the TPU
(8,128) tile, so XLA re-lays the tables out every step. Candidates:
tile-aligned 1024 grids, smaller 512 grids, bf16 storage.

Usage (real TPU env):  python scripts/bench_igso3_tables.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import numpy as np

    np.asarray(x)


def bench_step(so3_kw, table_dtype, bsz, num_res, iters=10):
    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.config import Config, ModelConfig, DiffuserConfig, SO3Config
    from se3_diffusion_tpu.diffusion import igso3
    from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
    from se3_diffusion_tpu.geometry import quat as ql
    from se3_diffusion_tpu.geometry.rigid import Rigid
    from se3_diffusion_tpu.models.score_network import ScoreNetwork
    from se3_diffusion_tpu.training import create_train_state, make_train_step

    cfg = Config(
        model=ModelConfig(activation_dtype="bfloat16"),
        diffuser=DiffuserConfig(so3=SO3Config(**so3_kw)),
    )
    diffuser = SE3Diffuser.create(cfg.diffuser)
    if table_dtype != "float32":
        dt = jnp.dtype(table_dtype)
        diffuser = diffuser.replace(
            tables=jax.tree_util.tree_map(
                lambda x: x.astype(dt), diffuser.tables
            )
        )
    model = ScoreNetwork(cfg.model)
    state = create_train_state(jax.random.PRNGKey(0), cfg, model, 16)
    step = make_train_step(model, cfg, mesh=None)

    key = jax.random.PRNGKey(1)
    quats = ql.quat_normalize(jax.random.normal(key, (bsz, num_res, 4)))
    trans = jax.random.normal(key, (bsz, num_res, 3)) * 10.0
    batch = {
        "rigids_0": Rigid(quat=quats, trans=trans).to_tensor_7(),
        "res_mask": jnp.ones((bsz, num_res), jnp.float32),
        "fixed_mask": jnp.zeros((bsz, num_res), jnp.float32),
        "seq_idx": jnp.tile(jnp.arange(num_res)[None], (bsz, 1)),
        "torsion_angles_sin_cos": jnp.zeros((bsz, num_res, 7, 2)),
    }
    state, aux = step(state, diffuser, batch, jax.random.PRNGKey(2))
    _sync(aux["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, aux = step(state, diffuser, batch, jax.random.PRNGKey(3 + i))
    _sync(aux["loss"])
    ms = (time.perf_counter() - t0) / iters * 1000.0
    loss = float(aux["loss"])
    return ms, loss


def main():
    configs = [
        ("base_1000_f32", dict(num_omega=1000, num_sigma=1000), "float32"),
        ("tile_1024_f32", dict(num_omega=1024, num_sigma=1024), "float32"),
        ("small_512_f32", dict(num_omega=512, num_sigma=512), "float32"),
        ("tile_1024_bf16", dict(num_omega=1024, num_sigma=1024), "bfloat16"),
    ]
    out = {}
    for name, kw, dt in configs:
        for bsz, num_res in ((4, 384), (8, 128)):
            ms, loss = bench_step(kw, dt, bsz, num_res)
            out[f"{name}_b{bsz}n{num_res}"] = {
                "ms": round(ms, 2),
                "loss": round(loss, 4),
            }
            print(name, f"b{bsz}n{num_res}", f"{ms:.2f} ms", f"loss {loss:.4f}",
                  flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/igso3_table_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
