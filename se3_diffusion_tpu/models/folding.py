"""ESMFold folding trunk (flax): triangular pair blocks + recycling.

Re-derivation of fair-esm's `esm/esmfold/v1/trunk.py` +
`tri_self_attn_block.py` (whose triangular ops follow the openfold
modules vendored — dead — in the reference:
`/root/reference/openfold/model/triangular_multiplicative_update.py:26-135`,
`triangular_attention.py:31-126`). The reference invokes ESMFold through
fair-esm at `experiments/inference_se3_diffusion.py:125-126,407-416`.

TPU-first notes:
* all 48 trunk blocks run under one ``nn.scan`` with optional
  ``jax.checkpoint`` (rematerialize the [B,N,N,C] pair activations
  instead of keeping 48 copies in HBM);
* triangle multiplicative updates are einsums over the hidden dim
  (MXU-shaped [N,N,C] x [N,N,C] contractions), triangle attention is a
  batched softmax-attention over rows/columns — no per-node loops;
* recycling is a static python loop (ESMFold inference semantics:
  fixed recycle count, no grad through early passes needed at
  inference); the distogram binning is branchless bucket counting.

Dropout is omitted (inference-first; ESMFold applies it only in
training). Weight layout matches fair-esm for 1:1 conversion.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from se3_diffusion_tpu.models.layers import LayerNorm, Linear
from se3_diffusion_tpu.models.structure_module import (
    StructureModule,
    StructureModuleConfig,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrunkConfig:
    num_blocks: int = 48
    sequence_state_dim: int = 1024
    pairwise_state_dim: int = 128
    sequence_head_width: int = 32
    pairwise_head_width: int = 32
    position_bins: int = 32
    recycle_bins: int = 15
    max_recycles: int = 4
    remat: bool = True
    structure_module: StructureModuleConfig = dataclasses.field(
        default_factory=StructureModuleConfig
    )


def trunk_tiny_config(**kw) -> TrunkConfig:
    from se3_diffusion_tpu.models.structure_module import (
        structure_module_tiny_config,
    )

    return TrunkConfig(
        **{
            "num_blocks": 2,
            "sequence_state_dim": 32,
            "pairwise_state_dim": 16,
            "sequence_head_width": 16,
            "pairwise_head_width": 8,
            "max_recycles": 1,
            "remat": False,
            "structure_module": structure_module_tiny_config(),
            **kw,
        }
    )


class GatedAttention(nn.Module):
    """fair-esm esmfold Attention: fused qkv (no bias), sigmoid gate,
    per-head bias add."""

    embed_dim: int
    num_heads: int
    head_width: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: Array, mask: Optional[Array], bias: Optional[Array]
    ) -> Array:
        h, d = self.num_heads, self.head_width
        b, n, _ = x.shape
        dt = self.dtype or jnp.float32
        qkv = Linear(3 * h * d, use_bias=False, dtype=dt, name="proj")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, h, 3 * d), 3, axis=-1)
        q = q.transpose(0, 2, 1, 3) * (d ** -0.5)  # [B, H, N, D]
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        if bias is not None:  # [B, N, N, H]
            logits = logits + bias.astype(jnp.float32).transpose(0, 3, 1, 2)
        if mask is not None:  # [B, N] key mask
            logits = jnp.where(
                mask[:, None, None, :] > 0.5, logits, -1e9
            )
        a = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3)
        o = o.reshape(b, n, h * d)
        g = jax.nn.sigmoid(
            Linear(h * d, init="gating", dtype=dt, name="g_proj")(x)
        )
        return Linear(self.embed_dim, dtype=dt, name="o_proj")(o * g)


class SequenceToPair(nn.Module):
    """Outer product/difference features (fair-esm SequenceToPair)."""

    inner_dim: int
    pairwise_state_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, s: Array) -> Array:
        dt = self.dtype or jnp.float32
        s = LayerNorm(name="layernorm")(s.astype(jnp.float32)).astype(dt)
        qk = Linear(2 * self.inner_dim, dtype=dt, name="proj")(s)
        q, k = jnp.split(qk, 2, axis=-1)
        prod = q[:, :, None, :] * k[:, None, :, :]
        diff = q[:, :, None, :] - k[:, None, :, :]
        x = jnp.concatenate([prod, diff], axis=-1)
        return Linear(self.pairwise_state_dim, dtype=dt, name="o_proj")(x)


class PairToSequence(nn.Module):
    """Pairwise bias head for sequence attention (fair-esm PairToSequence)."""

    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z: Array) -> Array:
        dt = self.dtype or jnp.float32
        z = LayerNorm(name="layernorm")(z.astype(jnp.float32)).astype(dt)
        return Linear(
            self.num_heads, use_bias=False, dtype=dt, name="linear"
        )(z)


class TriangleMultiplication(nn.Module):
    """AF2 Alg. 11/12 (openfold TriangleMultiplicativeUpdate contract)."""

    c_z: int
    c_hidden: int
    outgoing: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z: Array, mask2d: Array) -> Array:
        dt = self.dtype or jnp.float32
        z = LayerNorm(name="layer_norm_in")(z.astype(jnp.float32)).astype(dt)
        m = mask2d[..., None].astype(dt)
        a = Linear(self.c_hidden, dtype=dt, name="linear_a_p")(z) * jax.nn.sigmoid(
            Linear(self.c_hidden, init="gating", dtype=dt, name="linear_a_g")(z)
        ) * m
        b = Linear(self.c_hidden, dtype=dt, name="linear_b_p")(z) * jax.nn.sigmoid(
            Linear(self.c_hidden, init="gating", dtype=dt, name="linear_b_g")(z)
        ) * m
        if self.outgoing:
            x = jnp.einsum("bikc,bjkc->bijc", a, b)
        else:
            x = jnp.einsum("bkic,bkjc->bijc", a, b)
        x = LayerNorm(name="layer_norm_out")(x.astype(jnp.float32)).astype(dt)
        x = Linear(self.c_z, init="final", dtype=dt, name="linear_z")(x)
        g = jax.nn.sigmoid(
            Linear(self.c_z, init="gating", dtype=dt, name="linear_g")(z)
        )
        return x * g


class TriangleAttention(nn.Module):
    """AF2 Alg. 13/14 (openfold TriangleAttention contract)."""

    c_z: int
    c_hidden: int  # per-head
    num_heads: int
    starting: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z: Array, mask2d: Array) -> Array:
        dt = self.dtype or jnp.float32
        if not self.starting:
            z = jnp.swapaxes(z, 1, 2)
            mask2d = jnp.swapaxes(mask2d, 1, 2)
        x = LayerNorm(name="layer_norm")(z.astype(jnp.float32)).astype(dt)
        b_, i_, j_, _ = x.shape
        h, d = self.num_heads, self.c_hidden
        tri_bias = Linear(
            h, use_bias=False, init="normal", dtype=dt, name="linear"
        )(x)  # [B, I, J, H]

        def proj(name):
            return Linear(h * d, use_bias=False, dtype=dt, name=name)

        q = proj("mha_linear_q")(x).reshape(b_, i_, j_, h, d) * (d ** -0.5)
        k = proj("mha_linear_k")(x).reshape(b_, i_, j_, h, d)
        v = proj("mha_linear_v")(x).reshape(b_, i_, j_, h, d)
        # rows attend within themselves: [B, I, H, J(q), J(k)]
        logits = jnp.einsum("bijhd,bikhd->bihjk", q, k).astype(jnp.float32)
        logits = logits + tri_bias.astype(jnp.float32).transpose(
            0, 3, 1, 2
        )[:, None, :, :, :]
        logits = jnp.where(
            mask2d[:, :, None, None, :] > 0.5, logits, -1e9
        )
        a = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bihjk,bikhd->bijhd", a, v).reshape(b_, i_, j_, h * d)
        g = jax.nn.sigmoid(
            Linear(h * d, init="gating", dtype=dt, name="mha_linear_g")(x)
        )
        out = Linear(self.c_z, init="final", dtype=dt, name="mha_linear_o")(
            o * g
        )
        if not self.starting:
            out = jnp.swapaxes(out, 1, 2)
        return out


class ResidueMLP(nn.Module):
    """x + Linear(relu(Linear(LN(x)))) (fair-esm ResidueMLP)."""

    dim: int
    inner: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = self.dtype or jnp.float32
        y = LayerNorm(name="norm")(x.astype(jnp.float32)).astype(dt)
        y = Linear(self.inner, dtype=dt, name="linear_1")(y)
        y = jax.nn.relu(y)
        y = Linear(self.dim, dtype=dt, name="linear_2")(y)
        return x + y


class TriangularSelfAttentionBlock(nn.Module):
    """One ESMFold trunk block (fair-esm TriangularSelfAttentionBlock)."""

    cfg: TrunkConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, s: Array, z: Array, mask: Array
    ) -> Tuple[Array, Array]:
        c = self.cfg
        dt = self.dtype or jnp.float32
        seq_heads = c.sequence_state_dim // c.sequence_head_width
        pair_heads = c.pairwise_state_dim // c.pairwise_head_width

        # Sequence track: pair-biased gated self-attention + MLP.
        bias = PairToSequence(seq_heads, dtype=dt, name="pair_to_sequence")(z)
        y = LayerNorm(name="layernorm_1")(s.astype(jnp.float32)).astype(dt)
        y = GatedAttention(
            c.sequence_state_dim,
            seq_heads,
            c.sequence_head_width,
            dtype=dt,
            name="seq_attention",
        )(y, mask, bias)
        s = s + y
        s = ResidueMLP(
            c.sequence_state_dim,
            4 * c.sequence_state_dim,
            dtype=dt,
            name="mlp_seq",
        )(s)

        # Pair track: outer update then the 4 triangular ops.
        z = z + SequenceToPair(
            c.pairwise_state_dim // 2,
            c.pairwise_state_dim,
            dtype=dt,
            name="sequence_to_pair",
        )(s)
        mask2d = mask[:, :, None] * mask[:, None, :]
        z = z + TriangleMultiplication(
            c.pairwise_state_dim, c.pairwise_state_dim, True,
            dtype=dt, name="tri_mul_out",
        )(z, mask2d)
        z = z + TriangleMultiplication(
            c.pairwise_state_dim, c.pairwise_state_dim, False,
            dtype=dt, name="tri_mul_in",
        )(z, mask2d)
        z = z + TriangleAttention(
            c.pairwise_state_dim, c.pairwise_head_width, pair_heads, True,
            dtype=dt, name="tri_att_start",
        )(z, mask2d)
        z = z + TriangleAttention(
            c.pairwise_state_dim, c.pairwise_head_width, pair_heads, False,
            dtype=dt, name="tri_att_end",
        )(z, mask2d)
        z = ResidueMLP(
            c.pairwise_state_dim,
            4 * c.pairwise_state_dim,
            dtype=dt,
            name="mlp_pair",
        )(z)
        return s, z


def relative_position_bins(residx: Array, bins: int) -> Array:
    """Clipped relative-offset bucket ids (fair-esm RelativePosition):
    diff clamped to [-bins, bins], shifted to [0, 2*bins]; one extra
    'distant' id is reserved (2*bins+1) for cross-chain in fair-esm —
    single-chain here never emits it."""
    diff = residx[:, None, :] - residx[:, :, None]
    diff = jnp.clip(diff, -bins, bins) + bins
    return diff.astype(jnp.int32)


def recycle_distogram(coords_nca_c: Array, num_bins: int) -> Array:
    """Bins inferred-CB pairwise distances for recycling (fair-esm
    trunk.distogram): boundaries linspace(3.375, 21.375, bins-1)^2."""
    n_, ca, c_ = (
        coords_nca_c[..., 0, :],
        coords_nca_c[..., 1, :],
        coords_nca_c[..., 2, :],
    )
    b = ca - n_
    c2 = c_ - ca
    a = jnp.cross(b, c2)
    cb = -0.58273431 * a + 0.56802827 * b - 0.54067466 * c2 + ca
    d2 = jnp.sum(
        (cb[..., None, :, :] - cb[..., :, None, :]) ** 2, axis=-1
    )
    bounds = jnp.linspace(3.375, 21.375, num_bins - 1) ** 2
    return jnp.sum(d2[..., None] > bounds, axis=-1).astype(jnp.int32)


class FoldingTrunk(nn.Module):
    """ESMFold trunk: recycled triangular blocks + structure module."""

    cfg: TrunkConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        s_s_0: Array,  # [B, N, c_s]
        s_z_0: Array,  # [B, N, N, c_z]
        residx: Array,  # [B, N] int
        mask: Array,  # [B, N]
        num_recycles: Optional[int] = None,
    ):
        c = self.cfg
        dt = self.dtype or jnp.float32
        b, n = s_s_0.shape[0], s_s_0.shape[1]

        pos_emb = nn.Embed(
            2 * c.position_bins + 2,
            c.pairwise_state_dim,
            dtype=dt,
            name="pairwise_positional_embedding",
        )
        rel_bins = relative_position_bins(residx, c.position_bins)

        block = TriangularSelfAttentionBlock(c, dtype=dt, name="blocks")

        def body(blk, carry, _):
            s, z = carry
            s, z = blk(s, z, mask)
            return (s, z), None

        if c.remat:
            body = nn.remat(body, prevent_cse=False)
        stack = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.num_blocks,
        )

        recycle_s_norm = LayerNorm(name="recycle_s_norm")
        recycle_z_norm = LayerNorm(name="recycle_z_norm")
        recycle_disto = nn.Embed(
            c.recycle_bins, c.pairwise_state_dim, dtype=dt, name="recycle_disto"
        )
        sm = StructureModule(c.structure_module, dtype=dt, name="structure_module")
        trunk2sm_s = Linear(
            c.structure_module.c_s, dtype=dt, name="trunk2sm_s"
        )
        trunk2sm_z = Linear(
            c.structure_module.c_z, dtype=dt, name="trunk2sm_z"
        )

        passes = (
            c.max_recycles if num_recycles is None else num_recycles
        ) + 1
        recycle_s = jnp.zeros_like(s_s_0)
        recycle_z = jnp.zeros_like(s_z_0)
        recycle_bins = jnp.zeros((b, n, n), jnp.int32)
        structure = None
        s_s = s_s_0
        s_z = s_z_0
        for it in range(passes):
            s_s = s_s_0 + recycle_s_norm(
                recycle_s.astype(jnp.float32)
            ).astype(dt)
            s_z = s_z_0 + recycle_z_norm(
                recycle_z.astype(jnp.float32)
            ).astype(dt)
            # Added unconditionally, like fair-esm (which zeroes embedding
            # row 0 at init so the first pass — all bins 0 — contributes
            # nothing; converted checkpoints carry that zeroed row).
            s_z = s_z + recycle_disto(recycle_bins)
            s_z = s_z + pos_emb(rel_bins)
            (s_s, s_z), _ = stack(block, (s_s, s_z), None)
            structure = sm(trunk2sm_s(s_s), trunk2sm_z(s_z), mask)
            if it + 1 < passes:
                from se3_diffusion_tpu.geometry.rigid import Rigid
                from se3_diffusion_tpu.proteins import backbone

                frames = Rigid.from_tensor_7(
                    jax.lax.stop_gradient(structure["frames"])
                )
                psi = jax.lax.stop_gradient(structure["angles"][..., 2, :])
                atom37, _, _ = backbone.compute_backbone(frames, psi)
                bbfirst3 = atom37[..., :3, :]  # N, CA, C
                recycle_bins = recycle_distogram(bbfirst3, c.recycle_bins)
                recycle_s = jax.lax.stop_gradient(s_s)
                recycle_z = jax.lax.stop_gradient(s_z)

        structure["s_s"] = s_s
        structure["s_z"] = s_z
        return structure
