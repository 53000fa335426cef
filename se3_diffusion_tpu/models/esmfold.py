"""ESMFold (flax): ESM-2 encoder + folding trunk + confidence heads.

Re-derivation of fair-esm `esm/esmfold/v1/esmfold.py` — the folding model
the reference loads for self-consistency evaluation
(`experiments/inference_se3_diffusion.py:125-126`) and runs per designed
sequence (:407-416). Weight layout matches fair-esm so the released
`esmfold_3B_v1.pt` converts 1:1 via `interop/esmfold_convert.py`.

Output contract (what the designability pipeline consumes): backbone
atom37 coordinates (N/CA/C/CB/O placed from predicted frames + psi —
sidechain torsion placement is out of scope; the reference pipeline only
reads CA positions from the folded PDBs), per-residue pLDDT, pTM and the
distogram/LM logits.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from se3_diffusion_tpu.models import esm2 as esm2_lib
from se3_diffusion_tpu.models.esm2 import ESM2, ESM2Config
from se3_diffusion_tpu.models.folding import (
    FoldingTrunk,
    TrunkConfig,
    trunk_tiny_config,
)
from se3_diffusion_tpu.models.layers import LayerNorm, Linear

Array = jax.Array

DISTOGRAM_BINS = 64
PTM_BINS = 64
LDDT_BINS = 50
N_TOKENS_EMBED = 23  # 20 aa + X + gap + mask (fair-esm esmfold constant)


@dataclasses.dataclass(frozen=True)
class ESMFoldConfig:
    esm: ESM2Config = dataclasses.field(default_factory=ESM2Config)
    trunk: TrunkConfig = dataclasses.field(default_factory=TrunkConfig)
    lddt_head_hidden_dim: int = 128


def esmfold_v1_config() -> ESMFoldConfig:
    """Production dims of fair-esm esmfold_v1 (ESM-2 3B encoder)."""
    return ESMFoldConfig()


def esmfold_tiny_config(**kw) -> ESMFoldConfig:
    return ESMFoldConfig(
        esm=esm2_lib.esm2_tiny_config(),
        trunk=trunk_tiny_config(),
        lddt_head_hidden_dim=16,
        **kw,
    )


class ESMFold(nn.Module):
    cfg: ESMFoldConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        aatype: Array,  # [B, N] AF2 aatype ids
        mask: Array,  # [B, N]
        residx: Optional[Array] = None,  # [B, N] residue indices
        num_recycles: Optional[int] = None,
    ) -> Dict[str, Array]:
        cfg = self.cfg
        dt = self.dtype or jnp.float32
        b, n = aatype.shape
        if residx is None:
            residx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (b, 1))

        # -- language model leg ------------------------------------------------
        tokens = esm2_lib.af2_idx_to_esm_tokens(aatype, mask)
        esm_s_combine = self.param(
            "esm_s_combine",
            nn.initializers.zeros_init(),
            (cfg.esm.num_layers + 1,),
            jnp.float32,
        )
        weights = jax.nn.softmax(esm_s_combine)
        esm_s = ESM2(cfg.esm, dtype=dt, name="esm")(tokens, weights)
        esm_s = esm_s[:, 1 : n + 1]  # strip cls/eos framing
        esm_s = jax.lax.stop_gradient(esm_s)  # LM frozen in esmfold v1

        s_s_0 = LayerNorm(name="esm_s_mlp_ln")(
            esm_s.astype(jnp.float32)
        ).astype(dt)
        s_s_0 = Linear(
            cfg.trunk.sequence_state_dim, dtype=dt, name="esm_s_mlp_0"
        )(s_s_0)
        s_s_0 = jax.nn.relu(s_s_0)
        s_s_0 = Linear(
            cfg.trunk.sequence_state_dim, dtype=dt, name="esm_s_mlp_1"
        )(s_s_0)
        s_s_0 = s_s_0 + nn.Embed(
            N_TOKENS_EMBED,
            cfg.trunk.sequence_state_dim,
            dtype=dt,
            name="embedding",
        )(aatype)
        s_z_0 = jnp.zeros(
            (b, n, n, cfg.trunk.pairwise_state_dim), dt
        )

        # -- trunk + structure -------------------------------------------------
        structure = FoldingTrunk(cfg.trunk, dtype=dt, name="trunk")(
            s_s_0, s_z_0, residx, mask, num_recycles=num_recycles
        )

        # -- heads ---------------------------------------------------------------
        s_s, s_z = structure["s_s"], structure["s_z"]
        structure["distogram_logits"] = Linear(
            DISTOGRAM_BINS, dtype=dt, name="distogram_head"
        )(s_z)
        structure["ptm_logits"] = Linear(PTM_BINS, dtype=dt, name="ptm_head")(
            s_z
        )
        structure["lm_logits"] = Linear(
            N_TOKENS_EMBED, dtype=dt, name="lm_head"
        )(s_s)

        states = structure["states"]  # [B, N, c_s_sm]
        h = LayerNorm(name="lddt_head_ln")(states.astype(jnp.float32))
        h = Linear(cfg.lddt_head_hidden_dim, name="lddt_head_0")(h)
        h = Linear(cfg.lddt_head_hidden_dim, name="lddt_head_1")(h)
        lddt_logits = Linear(37 * LDDT_BINS, name="lddt_head_2")(h).reshape(
            b, n, 37, LDDT_BINS
        )
        structure["lddt_logits"] = lddt_logits
        structure["plddt"] = categorical_lddt(lddt_logits)  # [B, N, 37]
        structure["ptm"] = compute_tm(
            structure["ptm_logits"].astype(jnp.float32), mask
        )

        # -- coordinates -----------------------------------------------------------
        from se3_diffusion_tpu.geometry.rigid import Rigid
        from se3_diffusion_tpu.proteins import backbone

        frames = Rigid.from_tensor_7(structure["frames"])
        psi = structure["angles"][..., 2, :]
        atom37, atom37_mask, _ = backbone.compute_backbone(frames, psi)
        structure["atom37"] = atom37 * mask[..., None, None]
        structure["atom37_mask"] = atom37_mask * mask[..., None]
        return structure


def categorical_lddt(logits: Array, bins: int = LDDT_BINS) -> Array:
    """Expected lddt in [0, 1] from binned logits (openfold
    `compute_plddt` semantics: bin centers at (i+0.5)/bins)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    centers = (jnp.arange(bins, dtype=jnp.float32) + 0.5) / bins
    return jnp.sum(probs * centers, axis=-1)


def compute_tm(
    ptm_logits: Array, mask: Array, max_bin: float = 31.0
) -> Array:
    """Predicted TM-score from pairwise error logits (AF2 pTM head).

    ptm_logits: [B, N, N, bins]; bins span [0, max_bin] Angstrom error.
    """
    b, n = ptm_logits.shape[0], ptm_logits.shape[1]
    bins = ptm_logits.shape[-1]
    step = max_bin / bins
    centers = jnp.arange(bins, dtype=jnp.float32) * step + step / 2
    probs = jax.nn.softmax(ptm_logits, axis=-1)
    lengths = jnp.maximum(mask.sum(-1), 19.0)  # d0 formula floor
    d0 = 1.24 * (lengths - 15.0) ** (1.0 / 3.0) - 1.8  # [B]
    f = 1.0 / (1.0 + (centers[None, None, None, :] / d0[:, None, None, None]) ** 2)
    e_tm = jnp.sum(probs * f, axis=-1)  # [B, N, N]
    pair_mask = mask[:, :, None] * mask[:, None, :]
    per_query = jnp.sum(e_tm * pair_mask, axis=-1) / jnp.maximum(
        jnp.sum(pair_mask, axis=-1), 1.0
    )
    per_query = jnp.where(mask > 0.5, per_query, -1.0)
    return jnp.max(per_query, axis=-1)


def init_esmfold(key: jax.Array, cfg: ESMFoldConfig, num_res: int = 8):
    """Builds model + params on dummy inputs."""
    model = ESMFold(cfg)
    aatype = jnp.zeros((1, num_res), jnp.int32)
    mask = jnp.ones((1, num_res), jnp.float32)
    params = model.init(key, aatype, mask, num_recycles=0)["params"]
    return model, params
