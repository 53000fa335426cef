"""Input featurization: time/index embeddings, node & edge embedders.

Functional equivalent of the reference Embedder (`model/score_network.py:49-154`):
node features = [timestep embedding, fixed-mask bit, positional embedding];
edge features = cross-concat of per-node time features + relative-offset
embedding + self-conditioning Ca distogram. Projected by 3-layer MLPs with
trailing LayerNorm.

TPU notes: the [B, N, N, *] edge tensor is built directly in 4D (the
reference flattens to [B, N^2, *] for its MLP; XLA fuses either way) and
the distogram uses a single pairwise-distance computation feeding a
one-hot bucketization expressed with broadcast compares (VPU-friendly).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from se3_diffusion_tpu.config import EmbedConfig, ModelConfig
from se3_diffusion_tpu.models.layers import MLP

Array = jax.Array


def index_embedding(indices: Array, embed_size: int, max_len: int = 2056) -> Array:
    """Sin/cos positional features of (possibly relative) integer indices.

    Matches reference `get_index_embedding` (`score_network.py:14-32`):
    frequencies max_len^(2k/d), scaled by pi.
    """
    k = jnp.arange(embed_size // 2, dtype=jnp.float32)
    denom = max_len ** (2.0 * k / embed_size)
    angles = indices[..., None].astype(jnp.float32) * jnp.pi / denom
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


def timestep_embedding(
    t: Array, embedding_dim: int, max_positions: int = 10000
) -> Array:
    """DDPM-style timestep embedding of t in [0,1] (reference
    `score_network.py:35-47`): t is scaled by max_positions first."""
    half = embedding_dim // 2
    freqs = jnp.exp(
        -math.log(max_positions) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    angles = (t * max_positions)[..., None].astype(jnp.float32) * freqs
    emb = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def calc_distogram(
    pos: Array, min_bin: float, max_bin: float, num_bins: int
) -> Array:
    """One-hot distance bins over pairwise distances.

    Open-interval bucketization (d > lower) & (d < upper) with the last bin
    extending to infinity — identical semantics to reference
    `data/utils.py:570-580`.

    Args:
        pos: [..., N, 3].

    Returns:
        [..., N, N, num_bins] float one-hot(ish) distogram.
    """
    dists = jnp.linalg.norm(
        pos[..., :, None, :] - pos[..., None, :, :], axis=-1
    )[..., None]
    lower = jnp.linspace(min_bin, max_bin, num_bins, dtype=pos.dtype)
    upper = jnp.concatenate([lower[1:], jnp.asarray([1e8], dtype=pos.dtype)])
    return ((dists > lower) & (dists < upper)).astype(pos.dtype)


def cross_concat(feats_1d: Array) -> Array:
    """[B, N, C] -> [B, N, N, 2C] tiling (i-features ++ j-features)."""
    n = feats_1d.shape[-2]
    fi = jnp.repeat(feats_1d[..., :, None, :], n, axis=-2)
    fj = jnp.repeat(feats_1d[..., None, :, :], n, axis=-3)
    return jnp.concatenate([fi, fj], axis=-1)


class Embedder(nn.Module):
    """Node/edge input embedder."""

    model_conf: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        *,
        seq_idx: Array,
        t: Array,
        fixed_mask: Array,
        self_conditioning_ca: Array,
    ):
        """
        Args:
            seq_idx: [B, N] integer residue indices.
            t: [B] diffusion times.
            fixed_mask: [B, N] motif mask (1 = fixed).
            self_conditioning_ca: [B, N, 3] predicted Ca from the previous
                model call (zeros when self-conditioning is off for a step).

        Returns:
            node_embed [B, N, c_node], edge_embed [B, N, N, c_edge].
        """
        ec: EmbedConfig = self.model_conf.embed
        num_res = seq_idx.shape[-1]

        t_embed = timestep_embedding(t, ec.index_embed_size)  # [B, D]
        t_embed = jnp.repeat(t_embed[..., None, :], num_res, axis=-2)  # [B,N,D]
        prot_t_embed = jnp.concatenate(
            [t_embed, fixed_mask[..., None].astype(t_embed.dtype)], axis=-1
        )

        node_feats = [prot_t_embed, index_embedding(seq_idx, ec.index_embed_size)]
        pair_feats = [cross_concat(prot_t_embed)]

        rel_offset = seq_idx[..., :, None] - seq_idx[..., None, :]
        pair_feats.append(index_embedding(rel_offset, ec.index_embed_size))

        if ec.embed_self_conditioning:
            pair_feats.append(
                calc_distogram(
                    self_conditioning_ca, ec.min_bin, ec.max_bin, ec.num_bins
                )
            )

        c_node = self.model_conf.node_embed_size
        c_edge = self.model_conf.edge_embed_size
        node_embed = MLP(
            (c_node, c_node, c_node),
            final_layer_norm=True,
            dtype=self.dtype,
            name="node_embedder",
        )(jnp.concatenate(node_feats, axis=-1))
        from se3_diffusion_tpu.parallel.sp import annotate_pair

        edge_embed = MLP(
            (c_edge, c_edge, c_edge),
            final_layer_norm=True,
            dtype=self.dtype,
            name="edge_embedder",
        )(annotate_pair(jnp.concatenate(pair_feats, axis=-1)))
        return node_embed, annotate_pair(edge_embed)
