"""fair-esm ESMFold checkpoint -> flax params converter.

Converts the released `esmfold_3B_v1.pt` state dict (fair-esm
`esm/esmfold/v1/esmfold.py`, loaded by the reference at
`experiments/inference_se3_diffusion.py:125-126`) into parameters for
`models/esmfold.ESMFold`. Weights are not present in this environment
(`.MISSING_LARGE_BLOBS`), so the converter is exercised in tests with
synthetic state dicts shaped exactly like fair-esm's; it is weight-drop
ready the day the blob appears (same recipe as `interop/mpnn_convert.py`).

Strategy: initialize the flax model to get the parameter template, then
fill every leaf from the torch state dict via a path->key mapping.
Scanned collections (esm layers, trunk blocks) are stacked along axis 0.
Missing/unused keys are reported, never silently dropped.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np

from se3_diffusion_tpu.models.esmfold import ESMFold, ESMFoldConfig


def _t(w):  # torch Linear weight [out, in] -> flax kernel [in, out]
    return np.ascontiguousarray(np.asarray(w).T)


def _np(w):
    return np.asarray(w)


# flax leaf path (joined with '/') -> (torch key template, transform).
# '{i}' marks the scanned axis (esm layers / trunk blocks).
def _mappings() -> Dict[str, Tuple[str, object]]:
    m: Dict[str, Tuple[str, object]] = {}

    def lin(flax_prefix, torch_prefix, bias=True):
        m[f"{flax_prefix}/dense/kernel"] = (f"{torch_prefix}.weight", _t)
        if bias:
            m[f"{flax_prefix}/dense/bias"] = (f"{torch_prefix}.bias", _np)

    def raw_lin(flax_prefix, torch_prefix, bias=True):
        m[f"{flax_prefix}/kernel"] = (f"{torch_prefix}.weight", _t)
        if bias:
            m[f"{flax_prefix}/bias"] = (f"{torch_prefix}.bias", _np)

    def ln(flax_prefix, torch_prefix, wrapped=True):
        inner = f"{flax_prefix}/ln" if wrapped else flax_prefix
        m[f"{inner}/scale"] = (f"{torch_prefix}.weight", _np)
        m[f"{inner}/bias"] = (f"{torch_prefix}.bias", _np)

    # -- ESM-2 encoder ---------------------------------------------------------
    m["esm/embed_tokens/embedding"] = ("esm.embed_tokens.weight", _np)
    L = "esm/layers"
    ln(f"{L}/self_attn_layer_norm", "esm.layers.{i}.self_attn_layer_norm",
       wrapped=False)
    ln(f"{L}/final_layer_norm", "esm.layers.{i}.final_layer_norm",
       wrapped=False)
    for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
        raw_lin(f"{L}/self_attn/{p}", "esm.layers.{i}.self_attn." + p)
    raw_lin(f"{L}/fc1", "esm.layers.{i}.fc1")
    raw_lin(f"{L}/fc2", "esm.layers.{i}.fc2")
    ln("esm/emb_layer_norm_after", "esm.emb_layer_norm_after", wrapped=False)

    # -- ESMFold wrapper -------------------------------------------------------
    m["esm_s_combine"] = ("esm_s_combine", _np)
    ln("esm_s_mlp_ln", "esm_s_mlp.0")
    lin("esm_s_mlp_0", "esm_s_mlp.1")
    lin("esm_s_mlp_1", "esm_s_mlp.3")
    m["embedding/embedding"] = ("embedding.weight", _np)
    lin("distogram_head", "distogram_head")
    lin("ptm_head", "ptm_head")
    lin("lm_head", "lm_head")
    ln("lddt_head_ln", "lddt_head.0")
    lin("lddt_head_0", "lddt_head.1")
    lin("lddt_head_1", "lddt_head.2")
    lin("lddt_head_2", "lddt_head.3")

    # -- trunk -----------------------------------------------------------------
    m["trunk/pairwise_positional_embedding/embedding"] = (
        "trunk.pairwise_positional_embedding.embedding.weight", _np,
    )
    ln("trunk/recycle_s_norm", "trunk.recycle_s_norm")
    ln("trunk/recycle_z_norm", "trunk.recycle_z_norm")
    m["trunk/recycle_disto/embedding"] = ("trunk.recycle_disto.weight", _np)
    lin("trunk/trunk2sm_s", "trunk.trunk2sm_s")
    lin("trunk/trunk2sm_z", "trunk.trunk2sm_z")

    B = "trunk/blocks"
    TB = "trunk.blocks.{i}"
    ln(f"{B}/layernorm_1", f"{TB}.layernorm_1")
    ln(f"{B}/pair_to_sequence/layernorm", f"{TB}.pair_to_sequence.layernorm")
    lin(f"{B}/pair_to_sequence/linear", f"{TB}.pair_to_sequence.linear",
        bias=False)
    lin(f"{B}/seq_attention/proj", f"{TB}.seq_attention.proj", bias=False)
    lin(f"{B}/seq_attention/g_proj", f"{TB}.seq_attention.g_proj")
    lin(f"{B}/seq_attention/o_proj", f"{TB}.seq_attention.o_proj")
    ln(f"{B}/sequence_to_pair/layernorm", f"{TB}.sequence_to_pair.layernorm")
    lin(f"{B}/sequence_to_pair/proj", f"{TB}.sequence_to_pair.proj")
    lin(f"{B}/sequence_to_pair/o_proj", f"{TB}.sequence_to_pair.o_proj")
    for mlp, tm in (("mlp_seq", "mlp_seq"), ("mlp_pair", "mlp_pair")):
        ln(f"{B}/{mlp}/norm", f"{TB}.{tm}.mlp.0")
        lin(f"{B}/{mlp}/linear_1", f"{TB}.{tm}.mlp.1")
        lin(f"{B}/{mlp}/linear_2", f"{TB}.{tm}.mlp.3")
    for tri, tt in (("tri_mul_out", "tri_mul_out"), ("tri_mul_in", "tri_mul_in")):
        ln(f"{B}/{tri}/layer_norm_in", f"{TB}.{tt}.layer_norm_in")
        ln(f"{B}/{tri}/layer_norm_out", f"{TB}.{tt}.layer_norm_out")
        for p in ("linear_a_p", "linear_a_g", "linear_b_p", "linear_b_g",
                  "linear_g", "linear_z"):
            lin(f"{B}/{tri}/{p}", f"{TB}.{tt}.{p}")
    for att, ta in (("tri_att_start", "tri_att_start"),
                    ("tri_att_end", "tri_att_end")):
        ln(f"{B}/{att}/layer_norm", f"{TB}.{ta}.layer_norm")
        lin(f"{B}/{att}/linear", f"{TB}.{ta}.linear", bias=False)
        for p, tp in (("mha_linear_q", "mha.linear_q"),
                      ("mha_linear_k", "mha.linear_k"),
                      ("mha_linear_v", "mha.linear_v")):
            lin(f"{B}/{att}/{p}", f"{TB}.{ta}.{tp}", bias=False)
        lin(f"{B}/{att}/mha_linear_o", f"{TB}.{ta}.mha.linear_o")
        lin(f"{B}/{att}/mha_linear_g", f"{TB}.{ta}.mha.linear_g")

    # -- structure module --------------------------------------------------------
    S = "trunk/structure_module"
    TS = "trunk.structure_module"
    ln(f"{S}/layer_norm_s", f"{TS}.layer_norm_s")
    ln(f"{S}/layer_norm_z", f"{TS}.layer_norm_z")
    ln(f"{S}/layer_norm_ipa", f"{TS}.layer_norm_ipa")
    ln(f"{S}/layer_norm_transition", f"{TS}.transition.layer_norm")
    lin(f"{S}/linear_in", f"{TS}.linear_in")
    m[f"{S}/ipa/head_weights"] = (f"{TS}.ipa.head_weights", _np)
    for p in ("linear_q", "linear_kv", "linear_q_points", "linear_kv_points",
              "linear_b", "linear_out"):
        lin(f"{S}/ipa/{p}", f"{TS}.ipa.{p}")
    lin(f"{S}/bb_update", f"{TS}.bb_update.linear")
    lin(f"{S}/angle_resnet/linear_in", f"{TS}.angle_resnet.linear_in")
    lin(f"{S}/angle_resnet/linear_initial", f"{TS}.angle_resnet.linear_initial")
    lin(f"{S}/angle_resnet/linear_out", f"{TS}.angle_resnet.linear_out")
    for j in range(8):  # more than any real config; unmatched are pruned
        for k in (1, 2):
            lin(
                f"{S}/angle_resnet/resblock_{j}_linear_{k}",
                f"{TS}.angle_resnet.layers.{j}.linear_{k}",
            )
    for j in range(8):
        for k in (1, 2, 3):
            lin(
                f"{S}/trans_{j}_linear_{k}",
                f"{TS}.transition.layers.{j}.linear_{k}",
            )
    return m


# fair-esm keys that have no flax equivalent (buffers, unused heads).
_IGNORED_PREFIXES = (
    "esm.lm_head", "esm.contact_head",
)
_IGNORED_SUFFIXES = (
    "rot_emb.inv_freq", ".num_batches_tracked",
)


def convert_state_dict(
    state_dict: Dict[str, np.ndarray],
    cfg: ESMFoldConfig,
    num_res: int = 8,
):
    """Returns (flax params, report dict with 'missing'/'unused' lists)."""
    import flax

    model = ESMFold(cfg)
    import jax.numpy as jnp

    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, num_res), jnp.int32),
        jnp.ones((1, num_res), jnp.float32),
        num_recycles=0,
    )["params"]
    flat = flax.traverse_util.flatten_dict(template, sep="/")
    mapping = _mappings()

    used = set()
    missing = []
    out = {}
    for path, value in flat.items():
        spec = mapping.get(path)
        if spec is None:
            missing.append(path)
            out[path] = value
            continue
        key_tmpl, tf = spec
        if "{i}" in key_tmpl:
            n = value.shape[0]
            stack = []
            ok = True
            for i in range(n):
                k = key_tmpl.format(i=i)
                if k not in state_dict:
                    ok = False
                    break
                stack.append(tf(state_dict[k]))
                used.add(k)
            if not ok:
                missing.append(path)
                out[path] = value
                continue
            arr = np.stack(stack, axis=0)
        else:
            if key_tmpl not in state_dict:
                missing.append(path)
                out[path] = value
                continue
            arr = tf(state_dict[key_tmpl])
            used.add(key_tmpl)
        if arr.shape != value.shape:
            raise ValueError(
                f"shape mismatch at {path}: torch {arr.shape} vs "
                f"flax {value.shape}"
            )
        out[path] = arr.astype(np.asarray(value).dtype)

    unused = [
        k
        for k in state_dict
        if k not in used
        and not k.startswith(_IGNORED_PREFIXES)
        and not k.endswith(_IGNORED_SUFFIXES)
    ]
    params = flax.traverse_util.unflatten_dict(out, sep="/")
    return params, {"missing": missing, "unused": unused}


def load_esmfold_checkpoint(path: str, cfg: ESMFoldConfig = None):
    """Loads a fair-esm `.pt` checkpoint file and converts it.

    The released file holds {'model': state_dict, 'cfg': ...}; bare state
    dicts are accepted too.
    """
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model", data) if isinstance(data, dict) else data
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    if cfg is None:
        from se3_diffusion_tpu.models.esmfold import esmfold_v1_config

        cfg = esmfold_v1_config()
    return convert_state_dict(sd, cfg)


def synthetic_state_dict(cfg: ESMFoldConfig, seed: int = 0, num_res: int = 8):
    """Builds a random state dict with fair-esm's exact key schema/shapes
    (for converter tests while the real blob is absent)."""
    import flax
    import jax.numpy as jnp

    model = ESMFold(cfg)
    template = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, num_res), jnp.int32),
        jnp.ones((1, num_res), jnp.float32),
        num_recycles=0,
    )["params"]
    flat = flax.traverse_util.flatten_dict(template, sep="/")
    rng = np.random.RandomState(seed)
    mapping = _mappings()
    sd = {}
    for path, value in flat.items():
        spec = mapping.get(path)
        if spec is None:
            continue
        key_tmpl, tf = spec
        shape = np.asarray(value).shape

        def torch_shape(s):
            # invert the flax transform: kernels were transposed.
            if tf is _t:
                return (s[1], s[0])
            return s

        if "{i}" in key_tmpl:
            for i in range(shape[0]):
                sd[key_tmpl.format(i=i)] = rng.randn(
                    *torch_shape(shape[1:])
                ).astype(np.float32) * 0.02
        else:
            sd[key_tmpl] = rng.randn(*torch_shape(shape)).astype(
                np.float32
            ) * 0.02
    return sd
