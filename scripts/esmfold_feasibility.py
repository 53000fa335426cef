"""Full-scale ESMFold feasibility run on the real chip.

Instantiates `esmfold_v1_config()` (ESM-2 3B encoder, 48-block folding
trunk — the dims the reference loads via `esm.pretrained.esmfold_v1()`,
`inference_se3_diffusion.py:125,409-416`) with RANDOM bf16 weights and
runs one recycled forward at a production length, recording parameter
count, compile time, steady-state ms/fold and the device-memory
high-water mark. This proves (or disproves) that BASELINE config 5's
folding leg fits a single chip; real fair-esm weights remain unmounted
in this environment.

Usage (real TPU env, one process):
    python scripts/esmfold_feasibility.py --length 300 --recycles 1
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--length", type=int, default=300)
    p.add_argument("--recycles", type=int, default=1)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument(
        "--out", default="results/esmfold_feasibility.json"
    )
    p.add_argument(
        "--tiny", action="store_true", help="tiny dims (CPU smoke test)"
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from se3_diffusion_tpu.models.esmfold import (
        ESMFold,
        esmfold_tiny_config,
        esmfold_v1_config,
    )

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    cfg = esmfold_tiny_config() if args.tiny else esmfold_v1_config()
    model = ESMFold(cfg, dtype=jnp.bfloat16)
    b, n = 1, args.length
    aatype = jnp.zeros((b, n), jnp.int32)
    mask = jnp.ones((b, n), jnp.float32)

    # Parameter tree via eval_shape (no memory), then materialize random
    # bf16 leaves on-device in one jitted program: full-precision init of
    # a 3.7B-param model would not fit host+device comfortably, and for a
    # feasibility timing only shapes matter.
    t0 = time.time()
    shapes = jax.eval_shape(
        lambda k: model.init(k, aatype, mask, num_recycles=args.recycles),
        jax.random.PRNGKey(0),
    )["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    n_params = int(sum(np.prod(l.shape) for l in leaves))
    print(f"params: {n_params/1e9:.3f}B  (eval_shape {time.time()-t0:.1f}s)")

    @jax.jit
    def make_params(key):
        out = []
        for i, leaf in enumerate(leaves):
            k = jax.random.fold_in(key, i)
            out.append(
                0.02 * jax.random.normal(k, leaf.shape, jnp.bfloat16)
            )
        return jax.tree_util.tree_unflatten(treedef, out)

    t0 = time.time()
    params = make_params(jax.random.PRNGKey(1))
    # Force materialization through the relay (block_until_ready does not
    # synchronize through it).
    _ = np.asarray(jax.tree_util.tree_leaves(params)[0][..., :1])
    t_params = time.time() - t0
    print(f"random bf16 params materialized in {t_params:.1f}s")

    def fwd(params, aatype, mask):
        out = model.apply(
            {"params": params}, aatype, mask, num_recycles=args.recycles
        )
        return out["atom37"], out["plddt"], out["ptm"]

    jfwd = jax.jit(fwd)
    t0 = time.time()
    atom37, plddt, ptm = jfwd(params, aatype, mask)
    _ = np.asarray(atom37)
    t_compile = time.time() - t0
    print(f"first call (compile + run): {t_compile:.1f}s")

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        atom37, plddt, ptm = jfwd(params, aatype, mask)
        _ = np.asarray(atom37)
        times.append(time.time() - t0)
    ms_fold = float(np.median(times) * 1000)
    print(f"steady-state: {ms_fold:.0f} ms/fold at N={n} "
          f"(recycles={args.recycles}), runs={['%.2fs' % t for t in times]}")

    mem = {}
    try:
        stats = dev.memory_stats()
        mem = {
            "bytes_in_use": int(stats.get("bytes_in_use", -1)),
            "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", -1)),
        }
        print(
            f"HBM: in_use={mem['bytes_in_use']/2**30:.2f} GiB, "
            f"peak={mem['peak_bytes_in_use']/2**30:.2f} GiB"
        )
    except Exception as e:  # relay may not expose memory stats
        mem = {"error": str(e)}
        print(f"memory_stats unavailable: {e}")

    result = {
        "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
        "length": n,
        "recycles": args.recycles,
        "params_b": n_params / 1e9,
        "dtype": "bfloat16",
        "compile_plus_first_run_s": round(t_compile, 1),
        "ms_per_fold": round(ms_fold, 1),
        "folds_per_min": round(60000.0 / ms_fold, 2),
        "memory": mem,
        "note": "random weights; timing/memory feasibility only "
        "(fair-esm esmfold_v1 weights not mounted in this environment)",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
