"""Profile the fused train step on the real chip (VERDICT r2 item 9).

Captures a jax.profiler trace of the production train step at the bench
shapes (B=8/N=128 and B=4/N=384 bf16), prints the top XLA ops by self
time (via tensorboard_plugin_profile's xplane converter when available),
and times the isolated components (noising, model fwd, fwd+bwd) so the
MFU story is attributable to specific modules.

Usage (real TPU env, one process):
    python scripts/profile_train_step.py --out results/train_profile
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import numpy as np

    np.asarray(x)  # block_until_ready does not sync through the relay


def build(cfg_dtype="bfloat16", tiny=False):
    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.config import (
        Config,
        DiffuserConfig,
        IpaConfig,
        ModelConfig,
        SO3Config,
    )
    from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
    from se3_diffusion_tpu.models.score_network import ScoreNetwork
    from se3_diffusion_tpu.training import create_train_state, make_train_step

    if tiny:
        cfg = Config(
            model=ModelConfig(
                node_embed_size=32,
                edge_embed_size=16,
                activation_dtype=cfg_dtype,
                ipa=IpaConfig(
                    c_s=32, c_z=16, c_hidden=16, c_skip=8, no_heads=2,
                    no_qk_points=4, no_v_points=6, seq_tfmr_num_heads=2,
                    seq_tfmr_num_layers=1, num_blocks=2,
                ),
            ),
            diffuser=DiffuserConfig(
                so3=SO3Config(num_omega=100, num_sigma=50, cache_dir="",
                              series_l=200)
            ),
        )
    else:
        cfg = Config(model=ModelConfig(activation_dtype=cfg_dtype))
    diffuser = SE3Diffuser.create(cfg.diffuser)
    model = ScoreNetwork(cfg.model)
    state = create_train_state(jax.random.PRNGKey(0), cfg, model, 16)
    step = make_train_step(model, cfg, mesh=None)
    return cfg, diffuser, model, state, step


def make_batch(batch_size, num_res):
    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.geometry import quat as ql
    from se3_diffusion_tpu.geometry.rigid import Rigid

    key = jax.random.PRNGKey(1)
    quats = ql.quat_normalize(jax.random.normal(key, (batch_size, num_res, 4)))
    trans = jax.random.normal(key, (batch_size, num_res, 3)) * 10.0
    return {
        "rigids_0": Rigid(quat=quats, trans=trans).to_tensor_7(),
        "res_mask": jnp.ones((batch_size, num_res), jnp.float32),
        "fixed_mask": jnp.zeros((batch_size, num_res), jnp.float32),
        "seq_idx": jnp.tile(jnp.arange(num_res)[None], (batch_size, 1)),
        "torsion_angles_sin_cos": jnp.zeros((batch_size, num_res, 7, 2)),
    }


def time_fn(fn, *args, iters=10):
    out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def component_times(cfg, diffuser, model, state, batch, key):
    """Isolated fwd / fwd+bwd / noising timings (ms)."""
    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.score_network import score_network_forward

    b, n = batch["res_mask"].shape
    feats = {
        "rigids_t": batch["rigids_0"],
        "t": jnp.full((b,), 0.5),
        "seq_idx": batch["seq_idx"],
        "res_mask": batch["res_mask"],
        "fixed_mask": batch["fixed_mask"],
        "sc_ca_t": jnp.zeros((b, n, 3)),
        "torsion_angles_sin_cos": batch["torsion_angles_sin_cos"],
    }

    @jax.jit
    def fwd(params, feats):
        out = score_network_forward(model, params, feats, diffuser)
        return out["rigids"], out["psi"]

    @jax.jit
    def fwd_bwd(params, feats):
        def loss(p):
            out = score_network_forward(model, p, feats, diffuser)
            return (
                jnp.mean(out["rot_score"] ** 2)
                + jnp.mean(out["trans_score"] ** 2)
                + jnp.mean(out["psi"] ** 2)
            )

        return jax.value_and_grad(loss)(params)

    from se3_diffusion_tpu.geometry.rigid import Rigid

    @jax.jit
    def noise(key):
        out = diffuser.forward_marginal(
            key,
            Rigid.from_tensor_7(batch["rigids_0"]),
            jnp.full((b,), 0.5),
            diffuse_mask=batch["res_mask"],
        )
        return out["rot_score"], out["trans_score"]

    out = {}
    out["model_fwd_ms"] = time_fn(fwd, state.params, feats)
    out["model_fwd_bwd_ms"] = time_fn(fwd_bwd, state.params, feats)
    try:
        out["noising_ms"] = time_fn(noise, key)
    except Exception as e:  # signature drift tolerated; fwd/bwd is the story
        out["noising_note"] = f"{type(e).__name__}: {e}"
    return out


def top_ops_from_trace(trace_dir, top=25):
    """Parses the xplane trace into a per-op self-time table."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        return {"error": "no xplane.pb found"}
    # Parse the XSpace proto directly (the tensorboard profile plugin's
    # pywrap API is incompatible with the installed TF build): aggregate
    # event durations by op name per plane, report the device plane.
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        xs = xplane_pb2.XSpace()
        with open(paths[-1], "rb") as f:
            xs.ParseFromString(f.read())
        out = {"xplane": paths[-1]}
        for plane in xs.planes:
            if not plane.lines:
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            agg = {}
            for line in plane.lines:
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    dur, cnt = agg.get(name, (0, 0))
                    agg[name] = (dur + ev.duration_ps, cnt + 1)
            ranked = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
            total_ps = sum(d for d, _ in agg.values())
            out[plane.name] = [
                {
                    "op": name,
                    "total_ms": round(dur / 1e9, 3),
                    "count": cnt,
                    "frac": round(dur / max(total_ps, 1), 4),
                }
                for name, (dur, cnt) in ranked
            ]
        return out
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}", "xplane": paths[-1]}


def main():
    global jax
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results/train_profile")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--tiny", action="store_true", help="tiny dims smoke test")
    args = p.parse_args()

    import jax

    os.makedirs(args.out, exist_ok=True)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    cfg, diffuser, model, state, step = build(tiny=args.tiny)
    report = {"device": str(dev.device_kind if hasattr(dev, 'device_kind') else dev)}

    shapes = ((2, 16),) if args.tiny else ((8, 128), (4, 384))
    for bsz, num_res in shapes:
        tag = f"b{bsz}_n{num_res}"
        batch = make_batch(bsz, num_res)
        key = jax.random.PRNGKey(2)

        st, aux = step(state, diffuser, batch, key)
        _sync(aux["loss"])  # compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, aux = step(st, diffuser, batch, jax.random.PRNGKey(3 + i))
        _sync(aux["loss"])
        full_ms = (time.perf_counter() - t0) / args.iters * 1000.0

        comp = component_times(cfg, diffuser, model, state, batch, key)
        entry = {"full_step_ms": round(full_ms, 2)}
        entry.update({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in comp.items()})

        trace_dir = os.path.join(args.out, f"trace_{tag}")
        try:
            jax.profiler.start_trace(trace_dir)
            for i in range(3):
                st, aux = step(st, diffuser, batch, jax.random.PRNGKey(50 + i))
            _sync(aux["loss"])
            jax.profiler.stop_trace()
            entry["top_ops"] = top_ops_from_trace(trace_dir)
        except Exception as e:
            entry["trace_error"] = f"{type(e).__name__}: {e}"

        report[tag] = entry
        print(tag, json.dumps(entry)[:600])

    with open(os.path.join(args.out, "profile.json"), "w") as f:
        json.dump(report, f, indent=1, default=str)
    print("wrote", os.path.join(args.out, "profile.json"))


if __name__ == "__main__":
    main()
