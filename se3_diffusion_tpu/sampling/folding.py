"""Folding backends for the self-consistency pipeline.

The reference hard-wires fair-esm ESMFold
(`experiments/inference_se3_diffusion.py:125-126,407-416`); here folding
is a `Folder` callable (see `sampling/inference.py`) with two real
implementations:

* `make_jax_esmfold_folder` — the in-repo JAX ESMFold
  (`models/esmfold.py`), one jit per length bucket, TPU-ready. Load
  converted weights via `interop/esmfold_convert.load_esmfold_checkpoint`.
* `make_torch_esmfold_folder` — adapter around pip fair-esm (torch),
  for environments where the package + weights exist; imports lazily.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import numpy as np

from se3_diffusion_tpu.proteins import residue_constants as rc


def _seq_to_aatype(seq: str) -> np.ndarray:
    return np.asarray(
        [rc.RESTYPE_ORDER.get(c, rc.RESTYPE_NUM) for c in seq], np.int32
    )


def round_up(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def make_jax_esmfold_folder(
    model,
    params,
    num_recycles: Optional[int] = None,
    buckets: Sequence[int] = (64, 128, 192, 256, 320, 384, 448, 512),
) -> Callable[[str], np.ndarray]:
    """Folder backed by the JAX ESMFold.

    Pads sequences to static length buckets so the whole length sweep
    compiles a handful of programs instead of one per length.
    """
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("num_recycles",))
    def _fold(params, aatype, mask, num_recycles):
        out = model.apply(
            {"params": params}, aatype, mask, num_recycles=num_recycles
        )
        return out["atom37"], out["plddt"], out["ptm"]

    def folder(seq: str) -> np.ndarray:
        n = len(seq)
        padded = round_up(n, buckets)
        aatype = np.zeros((1, padded), np.int32)
        aatype[0, :n] = _seq_to_aatype(seq)
        mask = np.zeros((1, padded), np.float32)
        mask[0, :n] = 1.0
        atom37, _, _ = _fold(
            params, jnp.asarray(aatype), jnp.asarray(mask), num_recycles
        )
        return np.asarray(atom37)[0, :n]

    return folder


def make_torch_esmfold_folder(
    device: str = "cpu", num_recycles: Optional[int] = None
) -> Callable[[str], np.ndarray]:
    """Folder backed by pip fair-esm (torch), when installed.

    Mirrors the reference's `run_folding`
    (`inference_se3_diffusion.py:409-416`): infer_pdb per sequence, parse
    the PDB back to atom37.
    """
    import importlib

    esm = importlib.import_module("esm")  # raises ImportError if absent

    model = esm.pretrained.esmfold_v1().eval()
    model = model.to(device)

    def folder(seq: str) -> np.ndarray:
        import torch

        from se3_diffusion_tpu.proteins import protein

        with torch.no_grad():
            if num_recycles is not None:
                pdb_str = model.infer_pdb(seq, num_recycles=num_recycles)
            else:
                pdb_str = model.infer_pdb(seq)
        prot = protein.from_pdb_string(pdb_str)
        return np.asarray(prot.atom_positions, np.float32)

    return folder


def make_folder_from_config(folding_cfg) -> Optional[Callable[[str], np.ndarray]]:
    """Builds a Folder from `config.FoldingConfig`, or None when no
    backend is available (the pipeline then skips the folding leg).

    'auto' preference order mirrors deployment reality: pip fair-esm if
    importable (weights bundled with the package), else the JAX ESMFold
    with converted weights from `esmfold_weights_path`.
    """
    import os

    backend = folding_cfg.backend
    if backend == "none":
        return None

    def _torch():
        return make_torch_esmfold_folder(
            device=folding_cfg.device, num_recycles=folding_cfg.num_recycles
        )

    def _jax():
        from se3_diffusion_tpu.interop.esmfold_convert import (
            load_esmfold_checkpoint,
        )
        from se3_diffusion_tpu.models.esmfold import ESMFold, esmfold_v1_config

        cfg = esmfold_v1_config()
        params, report = load_esmfold_checkpoint(
            folding_cfg.esmfold_weights_path, cfg
        )
        if report["missing"]:
            raise ValueError(
                f"incomplete ESMFold checkpoint: {len(report['missing'])} "
                f"parameters missing (first: {report['missing'][:3]})"
            )
        model = ESMFold(cfg)
        return make_jax_esmfold_folder(
            model, params, num_recycles=folding_cfg.num_recycles
        )

    if backend == "torch":
        return _torch()
    if backend == "jax":
        return _jax()
    if backend != "auto":
        raise ValueError(f"Unknown folding backend {backend!r}")
    try:
        return _torch()
    except ImportError:
        pass
    if os.path.exists(folding_cfg.esmfold_weights_path):
        return _jax()
    return None
