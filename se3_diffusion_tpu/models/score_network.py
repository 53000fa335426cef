"""ScoreNetwork: embedder + IPA trunk + denoise-then-score conversion.

Equivalent of reference `model/score_network.py:157-215` ScoreNetwork: the
network predicts clean frames (x0 parametrization via iterative updates);
closed-form diffuser formulas convert (x_t, x0_hat, t) into rotation and
translation scores. Here the nn.Module is pure structure prediction and
the score conversion is a standalone function, so the same trunk serves
training, sampling, and any alternative parametrization.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from se3_diffusion_tpu.config import ModelConfig
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.geometry.rigid import Rigid
from se3_diffusion_tpu.models.embedder import Embedder
from se3_diffusion_tpu.models.ipa import IpaTrunk
from se3_diffusion_tpu.proteins import backbone

Array = jax.Array


class ScoreNetwork(nn.Module):
    """Predicts clean frames + psi from noised frames and conditioning."""

    model_conf: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: Dict[str, Array]):
        """
        Args:
            feats: dict with
                rigids_t: [B, N, 7] noised frames (tensor_7).
                t: [B] diffusion times.
                seq_idx: [B, N] residue indices.
                res_mask: [B, N].
                fixed_mask: [B, N] (1 = motif/fixed).
                sc_ca_t: [B, N, 3] self-conditioning Ca positions.

        Returns:
            dict with rigids_pred (Rigid), psi [B, N, 2], node_embed.
        """
        bb_mask = feats["res_mask"].astype(jnp.float32)
        fixed_mask = feats["fixed_mask"].astype(jnp.float32)
        edge_mask = bb_mask[..., :, None] * bb_mask[..., None, :]
        diffuse_mask = (1.0 - fixed_mask) * bb_mask

        dtype = self.dtype
        if dtype is None and self.model_conf.activation_dtype != "float32":
            dtype = jnp.dtype(self.model_conf.activation_dtype)

        node_embed, edge_embed = Embedder(
            self.model_conf, dtype=dtype, name="embedder"
        )(
            seq_idx=feats["seq_idx"],
            t=feats["t"],
            fixed_mask=fixed_mask,
            self_conditioning_ca=feats["sc_ca_t"],
        )
        node_embed = node_embed * bb_mask.astype(node_embed.dtype)[..., None]
        edge_embed = edge_embed * edge_mask.astype(edge_embed.dtype)[..., None]

        rigids_in = Rigid.from_tensor_7(feats["rigids_t"].astype(jnp.float32))
        rigids_pred, psi, node_out = IpaTrunk(
            self.model_conf, dtype=dtype, name="trunk"
        )(node_embed, edge_embed, rigids_in, bb_mask, diffuse_mask)

        return {
            "rigids_pred": rigids_pred,
            "psi": psi,
            "node_embed": node_out,
        }


def score_network_forward(
    model: ScoreNetwork,
    params,
    feats: Dict[str, Array],
    diffuser: SE3Diffuser,
) -> Dict[str, Any]:
    """Full forward pass: trunk + score conversion + backbone atoms.

    Output contract matches reference `ScoreNetwork.forward`
    (`score_network.py:170-215`): psi (motif-blended), rot_score,
    trans_score, rigids (tensor_7), atom37, atom14.
    """
    bb_mask = feats["res_mask"].astype(jnp.float32)
    fixed_mask = feats["fixed_mask"].astype(jnp.float32)

    out = model.apply({"params": params}, feats)
    rigids_pred: Rigid = out["rigids_pred"]
    rigids_in = Rigid.from_tensor_7(feats["rigids_t"].astype(jnp.float32))
    t = feats["t"]

    # Denoise-then-score (reference `ipa_pytorch.py:650-664`).
    rot_score = diffuser.calc_rot_score(rigids_in.quat, rigids_pred.quat, t)
    rot_score = rot_score * bb_mask[..., None]
    trans_score = diffuser.calc_trans_score(
        rigids_in.trans, rigids_pred.trans, t, scale_inputs=True
    )
    trans_score = trans_score * bb_mask[..., None]

    # Motif residues keep ground-truth psi (reference
    # `score_network.py:201-203`).
    psi_pred = out["psi"]
    if "torsion_angles_sin_cos" in feats:
        gt_psi = feats["torsion_angles_sin_cos"][..., 2, :]
        blend = (1.0 - fixed_mask[..., None])
        psi_pred = blend * psi_pred + (1.0 - blend) * gt_psi

    atom37, atom37_mask, atom14 = backbone.compute_backbone(rigids_pred, psi_pred)
    return {
        "psi": psi_pred,
        "rot_score": rot_score,
        "trans_score": trans_score,
        "rigids": rigids_pred.to_tensor_7(),
        "rigids_pred": rigids_pred,
        "atom37": atom37,
        "atom37_mask": atom37_mask,
        "atom14": atom14,
    }


def init_score_network(
    key: jax.Array, model_conf: ModelConfig, num_res: int = 16, dtype=None
):
    """Initializes a ScoreNetwork and returns (model, params)."""
    model = ScoreNetwork(model_conf, dtype=dtype)
    feats = dummy_features(1, num_res)
    params = model.init(key, feats)["params"]
    return model, params


def dummy_features(batch: int, num_res: int) -> Dict[str, Array]:
    """Minimal, well-formed input features (identity frames)."""
    return {
        "rigids_t": Rigid.identity((batch, num_res)).to_tensor_7(),
        "t": jnp.full((batch,), 0.5, dtype=jnp.float32),
        "seq_idx": jnp.tile(jnp.arange(num_res)[None], (batch, 1)),
        "res_mask": jnp.ones((batch, num_res), dtype=jnp.float32),
        "fixed_mask": jnp.zeros((batch, num_res), dtype=jnp.float32),
        "sc_ca_t": jnp.zeros((batch, num_res, 3), dtype=jnp.float32),
        "torsion_angles_sin_cos": jnp.zeros(
            (batch, num_res, 7, 2), dtype=jnp.float32
        ),
    }
