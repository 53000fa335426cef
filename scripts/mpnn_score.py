"""ProteinMPNN scoring CLI.

Mirrors the scoring modes of the reference's vendored CLI
(`/root/reference/ProteinMPNN/protein_mpnn_run.py`):

    --mode score          == --score_only        (masked mean NLL per order)
    --mode conditional    == --conditional_probs_only
    --mode conditional_bb == --conditional_probs_only_backbone
    --mode unconditional  == --unconditional_probs_only

One .npz per input PDB, same payload spirit as the reference's
score_only/conditional_probs_only output files.

Usage:
    python scripts/mpnn_score.py --pdb a.pdb [b.pdb ...] \
        --weights /path/v_48_020.pt --mode score --num_orders 8 \
        --out_dir ./mpnn_scores
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import logging

import numpy as np

logger = logging.getLogger(__name__)


def featurize(prot, seq_override=None):
    """Protein -> (x [1,N,4,3], seq [1,N], mask [1,N], residue_idx,
    chain_labels) in the MPNN input convention: backbone N/CA/C/O atoms,
    MPNN alphabet tokens, within-chain sequential residue indices (the
    reference's `tied_featurize` numbers residues by array position with
    +100 jumps between chains; single-chain here)."""
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.protein_mpnn import MPNN_ALPHABET
    from se3_diffusion_tpu.proteins import residue_constants as rc

    n = prot.aatype.shape[0]
    x = prot.atom_positions[:, [0, 1, 2, 4], :]  # N, CA, C, O
    mask = prot.atom_mask[:, 1].astype(np.float32)  # CA present
    if seq_override is not None:
        if len(seq_override) != n:
            raise ValueError(
                f"--seq length {len(seq_override)} != structure length {n}"
            )
        letters = seq_override.upper()
    else:
        letters = "".join(
            rc.RESTYPES[a] if a < rc.RESTYPE_NUM else "X"
            for a in prot.aatype
        )
    seq = np.array([MPNN_ALPHABET.index(c) for c in letters], np.int32)
    return (
        jnp.asarray(x, jnp.float32)[None],
        jnp.asarray(seq)[None],
        jnp.asarray(mask)[None],
        jnp.arange(n, dtype=jnp.int32)[None],
        jnp.zeros((1, n), jnp.int32),
        letters,
    )


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--pdb", nargs="+", required=True)
    p.add_argument("--weights", default=None,
                   help="released ProteinMPNN .pt checkpoint")
    p.add_argument("--random_init", action="store_true",
                   help="random-init params (smoke testing without weights)")
    p.add_argument("--mode", default="score",
                   choices=["score", "conditional", "conditional_bb",
                            "unconditional"])
    p.add_argument("--seq", default=None,
                   help="score this sequence instead of the PDB's")
    p.add_argument("--num_orders", type=int, default=1,
                   help="decoding orders to average over (score mode; the "
                   "reference's --num_seq_per_target batches)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", default="./mpnn_scores")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.protein_mpnn import (
        MPNNConfig,
        ProteinMPNN,
        conditional_probs,
        score_sequences,
        unconditional_probs,
    )
    from se3_diffusion_tpu.proteins import protein as protein_lib

    cfg = MPNNConfig()
    model = ProteinMPNN(cfg)
    if args.weights:
        from se3_diffusion_tpu.interop.mpnn_convert import (
            load_mpnn_checkpoint,
        )

        params, _ = load_mpnn_checkpoint(args.weights, cfg)
    elif args.random_init:
        logger.warning("--random_init: scores are meaningless smoke output")
        dummy = jnp.zeros((1, 8, 4, 3)), jnp.zeros((1, 8), jnp.int32)
        params = model.init(
            jax.random.PRNGKey(0), dummy[0], dummy[1],
            jnp.ones((1, 8)), jnp.zeros((1, 8), jnp.int32),
            jnp.zeros((1, 8), jnp.int32),
            jnp.tile(jnp.arange(8)[None], (1, 1)),
        )["params"]
    else:
        raise SystemExit("need --weights (or --random_init for smoke runs)")

    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    for path in args.pdb:
        with open(path) as f:
            prot = protein_lib.from_pdb_string(f.read())
        x, seq, mask, ridx, ch, letters = featurize(prot, args.seq)
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.out_dir, f"{name}.npz")
        if args.mode == "score":
            scores, nlls = [], []
            for _ in range(args.num_orders):
                key, sub = jax.random.split(key)
                randn = jax.random.normal(sub, mask.shape)
                order = jnp.argsort((mask + 1e-4) * jnp.abs(randn), axis=-1)
                out = score_sequences(
                    model, params, x, seq, mask, ridx, ch, order
                )
                scores.append(float(out["score"][0]))
                nlls.append(np.asarray(out["nll"][0]))
            np.savez(
                out_path, score=np.array(scores), nll=np.stack(nlls),
                sequence=letters,
            )
            logger.info(
                "%s: score %.4f +- %.4f over %d orders", name,
                np.mean(scores), np.std(scores), args.num_orders,
            )
        elif args.mode in ("conditional", "conditional_bb"):
            key, sub = jax.random.split(key)
            randn = jax.random.normal(sub, mask.shape)
            lp = conditional_probs(
                model, params, x, seq, mask, ridx, ch, randn,
                backbone_only=args.mode == "conditional_bb",
            )
            np.savez(
                out_path, log_probs=np.asarray(lp[0]),
                S=np.asarray(seq[0]), mask=np.asarray(mask[0]),
                sequence=letters,
            )
            logger.info("%s: conditional log-probs %s", name, lp.shape)
        else:
            lp = unconditional_probs(model, params, x, mask, ridx, ch)
            np.savez(
                out_path, log_probs=np.asarray(lp[0]),
                S=np.asarray(seq[0]), mask=np.asarray(mask[0]),
                sequence=letters,
            )
            logger.info("%s: unconditional log-probs %s", name, lp.shape)
    print(f"wrote {len(args.pdb)} npz file(s) to {args.out_dir}")


if __name__ == "__main__":
    main()
