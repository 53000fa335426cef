"""ProteinMPNN torch checkpoint -> flax params.

Converts the released ProteinMPNN weight files (torch-pickled dicts with
'model_state_dict'; e.g. vanilla v_48_020.pt) into the
`models.protein_mpnn.ProteinMPNN` parameter tree. Same transpose rules as
`torch_convert`; `W_s` is an embedding table and is NOT transposed.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from se3_diffusion_tpu.models.protein_mpnn import MPNNConfig


def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      dtype=np.float32)


def _dense(sd, p):
    out = {"kernel": np.ascontiguousarray(_np(sd.pop(f"{p}.weight")).T)}
    if f"{p}.bias" in sd:
        out["bias"] = _np(sd.pop(f"{p}.bias"))
    return out


def _ln(sd, p):
    return {"scale": _np(sd.pop(f"{p}.weight")), "bias": _np(sd.pop(f"{p}.bias"))}


def _pwff(sd, p):
    return {"W_in": _dense(sd, f"{p}.W_in"), "W_out": _dense(sd, f"{p}.W_out")}


def _enc(sd, p):
    return {
        **{w: _dense(sd, f"{p}.{w}") for w in ("W1", "W2", "W3", "W11", "W12", "W13")},
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "norm3": _ln(sd, f"{p}.norm3"),
        "dense": _pwff(sd, f"{p}.dense"),
    }


def _dec(sd, p):
    return {
        **{w: _dense(sd, f"{p}.{w}") for w in ("W1", "W2", "W3")},
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "dense": _pwff(sd, f"{p}.dense"),
    }


def convert_mpnn_state_dict(
    state_dict: Dict[str, Any], cfg: MPNNConfig = MPNNConfig()
) -> Dict[str, Any]:
    sd = {k: v for k, v in state_dict.items()}
    if cfg.ca_only:
        # The reference's CA model initializes features.node_embedding,
        # features.norm_nodes, and W_v but its forward never uses them
        # (`protein_mpnn_utils.py:735-738,1012`); drop the dead weights.
        for dead in (
            "features.node_embedding.weight",
            "features.norm_nodes.weight", "features.norm_nodes.bias",
            "W_v.weight", "W_v.bias",
        ):
            sd.pop(dead, None)
    params: Dict[str, Any] = {
        "features": {
            "pos_linear": _dense(sd, "features.embeddings.linear"),
            "edge_embedding": _dense(sd, "features.edge_embedding"),
            "norm_edges": _ln(sd, "features.norm_edges"),
        },
        "W_e": _dense(sd, "W_e"),
        "W_s": {"embedding": _np(sd.pop("W_s.weight"))},
        "W_out": _dense(sd, "W_out"),
    }
    for i in range(cfg.num_encoder_layers):
        params[f"enc_{i}"] = _enc(sd, f"encoder_layers.{i}")
    for i in range(cfg.num_decoder_layers):
        params[f"dec_{i}"] = _dec(sd, f"decoder_layers.{i}")
    if sd:
        raise ValueError(f"Unconsumed MPNN keys: {sorted(sd)[:10]} ...")
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_mpnn_checkpoint(path: str, cfg: MPNNConfig = MPNNConfig()):
    """Loads a released ProteinMPNN .pt file -> (flax params, metadata)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model_state_dict", data)
    meta = {k: v for k, v in data.items() if k != "model_state_dict"}
    return convert_mpnn_state_dict(sd, cfg), meta
