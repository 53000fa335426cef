"""Convert reference FrameDiff / ProteinMPNN torch checkpoints to orbax.

Usage:
    python scripts/convert_weights.py --torch paper_weights.pth --out ckpt/paper
    python scripts/convert_weights.py --torch v_48_020.pt --kind mpnn --out ckpt/mpnn
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch", required=True, dest="torch_path")
    p.add_argument("--out", required=True)
    p.add_argument("--kind", choices=["framediff", "mpnn"], default="framediff")
    args = p.parse_args()

    import jax
    import orbax.checkpoint as ocp

    if args.kind == "framediff":
        from se3_diffusion_tpu.config import ModelConfig
        from se3_diffusion_tpu.interop.torch_convert import convert_checkpoint

        params, extras = convert_checkpoint(args.torch_path, ModelConfig())
        print(f"Converted FrameDiff checkpoint (extras: {sorted(extras)})")
    else:
        from se3_diffusion_tpu.interop.mpnn_convert import load_mpnn_checkpoint

        params, extras = load_mpnn_checkpoint(args.torch_path)
        print(f"Converted ProteinMPNN checkpoint (meta: {sorted(extras)})")

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), {"params": params})
    ckptr.wait_until_finished()
    print(f"Saved {n/1e6:.2f}M params -> {args.out}")


if __name__ == "__main__":
    main()
