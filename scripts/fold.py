"""Folding CLI: sequence(s) -> PDB via the configured ESMFold backend.

Usage:
    python scripts/fold.py --seq MKTAYIAKQR... --out folded.pdb
    python scripts/fold.py --fasta seqs.fasta --out_dir folded/
    [--backend auto|jax|torch|none] [--weights path.pt] [--num_recycles N]

Counterpart of the reference's embedded `run_folding`
(`experiments/inference_se3_diffusion.py:409-416`), exposed standalone.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_fasta(path):
    seqs = {}
    name = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                name = line[1:].split()[0]
                seqs[name] = ""
            elif line and name is not None:
                seqs[name] += line
    return seqs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq", default=None)
    p.add_argument("--fasta", default=None)
    p.add_argument("--out", default="folded.pdb")
    p.add_argument("--out_dir", default="folded")
    p.add_argument("--backend", default="auto")
    p.add_argument("--weights", default="./weights/esmfold_3B_v1.pt")
    p.add_argument("--num_recycles", type=int, default=None)
    args = p.parse_args()

    import numpy as np

    from se3_diffusion_tpu.config import FoldingConfig
    from se3_diffusion_tpu.proteins import protein, residue_constants as rc
    from se3_diffusion_tpu.sampling.folding import make_folder_from_config

    folder = make_folder_from_config(
        FoldingConfig(
            backend=args.backend,
            esmfold_weights_path=args.weights,
            num_recycles=args.num_recycles,
        )
    )
    if folder is None:
        raise SystemExit(
            "No folding backend available: install fair-esm or provide "
            "--weights (see interop/esmfold_convert.py)."
        )

    def fold_to_pdb(seq, out_path):
        atom37 = folder(seq)
        aatype = np.asarray(
            [rc.RESTYPE_ORDER.get(c, rc.RESTYPE_NUM) for c in seq]
        )
        with open(out_path, "w") as f:
            f.write(
                protein.to_pdb(protein.create_protein(atom37, aatype=aatype))
            )
        print(f"{out_path}: {len(seq)} residues")

    if args.seq:
        fold_to_pdb(args.seq, args.out)
    elif args.fasta:
        os.makedirs(args.out_dir, exist_ok=True)
        for name, seq in read_fasta(args.fasta).items():
            fold_to_pdb(seq, os.path.join(args.out_dir, f"{name}.pdb"))
    else:
        raise SystemExit("Provide --seq or --fasta")


if __name__ == "__main__":
    main()
