"""Export trained parameters from an orbax run dir to a single .npz.

Orbax checkpoint directories are large (full optimizer state) and are
not committed (see .gitignore `ckpt/*/[0-9]*/`), so trained models die
with the workspace. This exports just the parameters (raw + EMA) as one
compressed, git-committable file that `warm_start_params` /
`scripts/sample.py --weights model.npz` load directly.

Usage:
    python scripts/export_params.py --ckpt_dir ckpt/synth_r3_v4 \
        --out ckpt/synth_r3_v4/params_150k.npz
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np
import orbax.checkpoint as ocp

from se3_diffusion_tpu.training import checkpoints as ckpt_lib


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True, help="orbax run dir")
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args()

    mgr = ocp.CheckpointManager(os.path.abspath(args.ckpt_dir))
    step = mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoint under {args.ckpt_dir}")
    # Restore every leaf as host numpy: the checkpoint remembers the
    # device shardings it was saved under (e.g. a TPU), which do not
    # exist in a CPU-only export process.
    state_path = os.path.join(os.path.abspath(args.ckpt_dir), str(step), "state")
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(state_path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), dict(tree)
    )
    state = ckptr.restore(
        state_path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
    )
    ckpt_lib.save_params_npz(
        args.out, state["params"], ema_params=state.get("ema_params")
    )
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"exported step {step} -> {args.out} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
