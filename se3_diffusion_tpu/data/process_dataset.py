"""Offline preprocessing CLI: mmCIF dir -> per-chain .pkl + metadata.csv.

Same contract as the reference `data/process_pdb_dataset.py` (walks
2-letter shard dirs, per-file size/resolution/length filters, per-chain
atom37 features, CA-centering, secondary-structure + radius-of-gyration
metadata, multiprocessing pool), with the Biopython/mdtraj dependencies
replaced by the in-repo mmCIF parser and DSSP-lite.

Usage:
    python -m se3_diffusion_tpu.data.process_dataset \
        --mmcif_dir <dir> --write_dir ./data/processed_pdb [--num_processes 16]
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import multiprocessing as mp
import os
import time
from typing import List, Optional

import numpy as np
import pandas as pd

from se3_diffusion_tpu.data import mmcif, utils as du
from se3_diffusion_tpu.evaluation import secondary_structure as ss_lib
from se3_diffusion_tpu.proteins import residue_constants as rc


class DataError(Exception):
    """Filtering-by-exception during preprocessing (reference
    `data/errors.py`)."""


@dataclasses.dataclass
class Args:
    mmcif_dir: str
    write_dir: str
    num_processes: int = 16
    min_file_size: int = 1000
    max_file_size: int = 3_000_000
    max_resolution: float = 5.0
    min_len: int = 20
    max_len: int = 2048
    debug: bool = False


def collect_mmcif_paths(args: Args) -> List[str]:
    """Collects .cif/.cif.gz and (process_pdb_files-style) .pdb inputs."""
    paths = []
    for root, _, files in os.walk(args.mmcif_dir):
        for fn in files:
            if not fn.endswith((".cif", ".cif.gz", ".pdb", ".pdb.gz")):
                continue
            p = os.path.join(root, fn)
            size = os.path.getsize(p)
            if args.min_file_size <= size <= args.max_file_size:
                paths.append(p)
    return sorted(paths)


def _parse_structure(path: str) -> mmcif.ParsedMmcif:
    """Parses either an mmCIF or a PDB file into the common chain format
    (the reference splits this across process_pdb_dataset.py and the
    untested process_pdb_files.py; here one CLI handles both)."""
    if path.endswith((".cif", ".cif.gz")):
        return mmcif.parse_mmcif_file(path)
    import gzip

    from se3_diffusion_tpu.proteins import protein as protein_lib
    from se3_diffusion_tpu.proteins import residue_constants as rc

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        prot = protein_lib.from_pdb_string(f.read())
    chains = {}
    for cid in np.unique(prot.chain_index):
        sel = prot.chain_index == cid
        chains[rc.CHAIN_IDS[int(cid)]] = mmcif.ParsedChain(
            chain_id=rc.CHAIN_IDS[int(cid)],
            aatype=prot.aatype[sel],
            atom_positions=prot.atom_positions[sel],
            atom_mask=prot.atom_mask[sel],
            b_factors=prot.b_factors[sel],
            residue_index=prot.residue_index[sel],
        )
    return mmcif.ParsedMmcif(
        entry_id=os.path.basename(path).split(".")[0],
        resolution=None,
        oligomeric_details=["unknown"],
        oligomeric_count=[],
        chains=chains,
        raw_fields={},
    )


def process_one(path: str, args: Args) -> Optional[List[dict]]:
    """Parses one mmCIF file into per-chain pkl files + metadata rows.
    Returns None (filtered) or the metadata rows."""
    pdb_name = os.path.basename(path).split(".")[0].lower()
    try:
        parsed = _parse_structure(path)
        if parsed.resolution is not None and parsed.resolution > args.max_resolution:
            raise DataError(f"resolution {parsed.resolution}")
        if parsed.resolution == 0.0:
            raise DataError("invalid resolution 0.0")
        oligomeric = (
            parsed.oligomeric_details[0] if parsed.oligomeric_details else "unknown"
        )
        rows = []
        for chain_id, chain in parsed.chains.items():
            n = len(chain.aatype)
            if n < args.min_len or n > args.max_len:
                continue
            bb_mask = chain.atom_mask[:, 0] * chain.atom_mask[:, 1] * chain.atom_mask[:, 2]
            modeled = int(bb_mask.sum())
            if modeled < args.min_len:
                continue
            # CA-center the chain (reference `du.parse_chain_feats`).
            ca = chain.atom_positions[:, 1]
            center = (ca * bb_mask[:, None]).sum(0) / (bb_mask.sum() + 1e-5)
            pos = (chain.atom_positions - center) * chain.atom_mask[..., None]

            ss = ss_lib.ss_percentages(pos, chain.atom_mask)
            rg = ss_lib.radius_of_gyration(ca, bb_mask)

            out_name = f"{pdb_name}_{chain_id}.pkl"
            out_path = os.path.join(args.write_dir, pdb_name[1:3], out_name)
            du.write_pkl(
                out_path,
                {
                    "aatype": chain.aatype,
                    "atom_positions": pos.astype(np.float32),
                    "atom_mask": chain.atom_mask.astype(np.float32),
                    "b_factors": chain.b_factors.astype(np.float32),
                    "residue_index": chain.residue_index,
                },
            )
            rows.append(
                {
                    "pdb_name": f"{pdb_name}_{chain_id}",
                    "processed_path": os.path.abspath(out_path),
                    "resolution": parsed.resolution,
                    "oligomeric_detail": oligomeric,
                    "seq_len": n,
                    "modeled_seq_len": modeled,
                    "radius_gyration": rg,
                    **ss,
                }
            )
        if not rows:
            raise DataError("no valid chains")
        return rows
    except DataError as e:
        if args.debug:
            print(f"[skip] {pdb_name}: {e}")
        return None
    except Exception as e:  # malformed files are data, not crashes
        if args.debug:
            raise
        print(f"[error] {pdb_name}: {type(e).__name__}: {e}")
        return None


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(Args):
        flag = f"--{f.name}"
        if f.type == "bool" or f.type is bool:
            p.add_argument(flag, action="store_true")
        else:
            kwargs = {"type": eval(f.type) if isinstance(f.type, str) else f.type}
            if f.default is not dataclasses.MISSING:
                kwargs["default"] = f.default
            else:
                kwargs["required"] = True
            p.add_argument(flag, **kwargs)
    args = Args(**vars(p.parse_args(argv)))

    paths = collect_mmcif_paths(args)
    print(f"Processing {len(paths)} mmCIF files -> {args.write_dir}")
    os.makedirs(args.write_dir, exist_ok=True)
    t0 = time.time()
    fn = functools.partial(process_one, args=args)
    if args.num_processes > 1:
        with mp.Pool(args.num_processes) as pool:
            results = pool.map(fn, paths)
    else:
        results = [fn(p) for p in paths]
    rows = [r for rs in results if rs for r in rs]
    csv_path = os.path.join(args.write_dir, "metadata.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    print(
        f"Wrote {len(rows)} chains from {sum(1 for r in results if r)} files "
        f"in {time.time() - t0:.1f}s -> {csv_path}"
    )


if __name__ == "__main__":
    main()
