"""Sequence-design backends for the self-consistency pipeline.

The reference subprocesses the vendored torch ProteinMPNN CLI with ≤5
retries (`experiments/inference_se3_diffusion.py:315-356`); here the
designer is the in-repo JAX ProteinMPNN (`models/protein_mpnn.py`)
running in-process, built from `config.DesignConfig`.
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional

import numpy as np


def make_designer_from_config(
    design_cfg, mpnn_cfg=None
) -> Optional[Callable[[np.ndarray, int, int], List[str]]]:
    """Builds a SequenceDesigner from `config.DesignConfig`, or None when
    no backend is available (the pipeline then skips self-consistency).

    mpnn_cfg overrides the model architecture (default: released
    v_48_020 dims, `models.protein_mpnn.MPNNConfig`)."""
    backend = design_cfg.backend
    if backend == "none":
        return None
    if backend not in ("auto", "jax"):
        raise ValueError(f"Unknown design backend {backend!r}")
    path = design_cfg.mpnn_weights_path
    if not os.path.exists(path):
        if backend == "jax":
            raise FileNotFoundError(f"ProteinMPNN weights not found: {path}")
        return None

    from se3_diffusion_tpu.interop.mpnn_convert import load_mpnn_checkpoint
    from se3_diffusion_tpu.models.protein_mpnn import (
        MPNNConfig,
        ProteinMPNN,
        make_sequence_designer,
    )

    cfg = mpnn_cfg if mpnn_cfg is not None else MPNNConfig()
    params, _ = load_mpnn_checkpoint(path, cfg)
    model = ProteinMPNN(cfg)
    return make_sequence_designer(
        model, params, temperature=design_cfg.temperature
    )
