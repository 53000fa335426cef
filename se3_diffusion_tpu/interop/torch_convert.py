"""Torch checkpoint -> flax params converter.

Converts reference FrameDiff checkpoints (`weights/paper_weights.pth`
format: torch-pickled {'model': state_dict, 'conf', 'optimizer', 'epoch',
'step'}, see reference `data/utils.py:324-362`) into this framework's
parameter pytree.

Key facts encoded here (SURVEY.md hard part 2 — hidden torch conventions):

* torch Linear stores weight [out, in]; flax Dense kernel is [in, out]
  => transpose every kernel.
* torch MultiheadAttention packs q,k,v as one in_proj_weight [3E, E]
  (rows: Wq; Wk; Wv) => our packed in_proj kernel is its transpose.
* torch LayerNorm (weight, bias) => flax (scale, bias); eps already
  matched at 1e-5 in the model definition.
* Vestigial reference weights are dropped: `linear_rbf` in every IPA
  block (`ipa_pytorch.py:300-301`) and `linear_3` in TorsionAngles
  (`ipa_pytorch.py:484-485`) — both unused by the reference forward pass.
* DDP-prefixed keys ('module.') are stripped, matching
  `train_se3_diffusion.py:133`.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from se3_diffusion_tpu.config import ModelConfig

# Reference state-dict keys that exist only for checkpoint compatibility.
_VESTIGIAL_SUBSTRINGS = ("linear_rbf", "torsion_pred.linear_3")


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _linear(sd: Dict[str, np.ndarray], torch_prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd.pop(f"{torch_prefix}.weight"))}
    if f"{torch_prefix}.bias" in sd:
        out["bias"] = sd.pop(f"{torch_prefix}.bias")
    return out


def _layernorm(sd, torch_prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": sd.pop(f"{torch_prefix}.weight"),
        "bias": sd.pop(f"{torch_prefix}.bias"),
    }


def _mlp3(sd, torch_prefix: str) -> Dict[str, Any]:
    """Sequential(Linear, ReLU, Linear, ReLU, Linear, LayerNorm)."""
    return {
        "linear_0": {"dense": _linear(sd, f"{torch_prefix}.0")},
        "linear_1": {"dense": _linear(sd, f"{torch_prefix}.2")},
        "linear_2": {"dense": _linear(sd, f"{torch_prefix}.4")},
        "ln_out": {"ln": _layernorm(sd, f"{torch_prefix}.5")},
    }


def _tfmr_layer(sd, torch_prefix: str) -> Dict[str, Any]:
    """torch.nn.TransformerEncoderLayer -> TorchTransformerEncoderLayer."""
    return {
        "self_attn": {
            "in_proj": {
                "kernel": _t(sd.pop(f"{torch_prefix}.self_attn.in_proj_weight")),
                "bias": sd.pop(f"{torch_prefix}.self_attn.in_proj_bias"),
            },
            "out_proj": _linear(sd, f"{torch_prefix}.self_attn.out_proj"),
        },
        "linear1": _linear(sd, f"{torch_prefix}.linear1"),
        "linear2": _linear(sd, f"{torch_prefix}.linear2"),
        "norm1": _layernorm(sd, f"{torch_prefix}.norm1"),
        "norm2": _layernorm(sd, f"{torch_prefix}.norm2"),
    }


def _ipa(sd, p: str) -> Dict[str, Any]:
    return {
        "linear_q": {"dense": _linear(sd, f"{p}.linear_q")},
        "linear_kv": {"dense": _linear(sd, f"{p}.linear_kv")},
        "linear_q_points": {"dense": _linear(sd, f"{p}.linear_q_points")},
        "linear_kv_points": {"dense": _linear(sd, f"{p}.linear_kv_points")},
        "linear_b": {"dense": _linear(sd, f"{p}.linear_b")},
        "down_z": {"dense": _linear(sd, f"{p}.down_z")},
        "linear_out": {"dense": _linear(sd, f"{p}.linear_out")},
        "head_weights": sd.pop(f"{p}.head_weights"),
    }


def _transition(sd, p: str) -> Dict[str, Any]:
    return {
        "linear_1": {"dense": _linear(sd, f"{p}.linear_1")},
        "linear_2": {"dense": _linear(sd, f"{p}.linear_2")},
        "linear_3": {"dense": _linear(sd, f"{p}.linear_3")},
        "ln": _layernorm(sd, f"{p}.ln"),
    }


def _edge_transition(sd, p: str) -> Dict[str, Any]:
    return {
        "initial_embed": {"dense": _linear(sd, f"{p}.initial_embed")},
        "trunk_0": {"dense": _linear(sd, f"{p}.trunk.0")},
        "trunk_1": {"dense": _linear(sd, f"{p}.trunk.2")},
        "final_layer": {"dense": _linear(sd, f"{p}.final_layer")},
        "ln": _layernorm(sd, f"{p}.layer_norm"),
    }


def _torsion(sd, p: str) -> Dict[str, Any]:
    return {
        "linear_1": {"dense": _linear(sd, f"{p}.linear_1")},
        "linear_2": {"dense": _linear(sd, f"{p}.linear_2")},
        "linear_final": {"dense": _linear(sd, f"{p}.linear_final")},
    }


def convert_state_dict(
    state_dict: Dict[str, Any], model_conf: ModelConfig
) -> Dict[str, Any]:
    """Converts a reference ScoreNetwork state dict to our param tree.

    Raises if any non-vestigial torch key is left unconsumed (so silent
    partial conversions are impossible).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("module.")
        if any(s in k for s in _VESTIGIAL_SUBSTRINGS):
            continue
        sd[k] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            dtype=np.float32,
        )

    params: Dict[str, Any] = {
        "embedder": {
            "node_embedder": _mlp3(sd, "embedding_layer.node_embedder"),
            "edge_embedder": _mlp3(sd, "embedding_layer.edge_embedder"),
        }
    }
    trunk: Dict[str, Any] = {}
    tp = "score_model.trunk"
    for b in range(model_conf.ipa.num_blocks):
        trunk[f"ipa_{b}"] = _ipa(sd, f"{tp}.ipa_{b}")
        trunk[f"ipa_ln_{b}"] = _layernorm(sd, f"{tp}.ipa_ln_{b}")
        trunk[f"skip_embed_{b}"] = {"dense": _linear(sd, f"{tp}.skip_embed_{b}")}
        trunk[f"seq_tfmr_{b}"] = {
            f"layer_{i}": _tfmr_layer(sd, f"{tp}.seq_tfmr_{b}.layers.{i}")
            for i in range(model_conf.ipa.seq_tfmr_num_layers)
        }
        trunk[f"post_tfmr_{b}"] = {"dense": _linear(sd, f"{tp}.post_tfmr_{b}")}
        trunk[f"node_transition_{b}"] = _transition(
            sd, f"{tp}.node_transition_{b}"
        )
        trunk[f"bb_update_{b}"] = {
            "linear": {"dense": _linear(sd, f"{tp}.bb_update_{b}.linear")}
        }
        if b < model_conf.ipa.num_blocks - 1:
            trunk[f"edge_transition_{b}"] = _edge_transition(
                sd, f"{tp}.edge_transition_{b}"
            )
    trunk["torsion_pred"] = _torsion(sd, "score_model.torsion_pred")
    params["trunk"] = trunk

    if sd:
        raise ValueError(f"Unconsumed torch keys: {sorted(sd)[:10]} ...")
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_torch_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Loads a reference .pth checkpoint; returns (state_dict, extras)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = data.get("model", data)
    extras = {k: v for k, v in data.items() if k != "model"}
    return state_dict, extras


def convert_checkpoint(path: str, model_conf: ModelConfig):
    """paper_weights.pth -> flax params (BASELINE configs 1/3 gate)."""
    state_dict, extras = load_torch_checkpoint(path)
    return convert_state_dict(state_dict, model_conf), extras
