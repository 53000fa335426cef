"""Shared nn building blocks: initializer zoo + torch-compatible layers.

The initializers mirror the AF2 conventions the reference uses
(`model/ipa_pytorch.py:49-86`, `model/layers.py:258-295`): lecun truncated
normal (default), he ("relu"), glorot, zeros ("final"), gating
(W=0, b=1). LayerNorm uses eps=1e-5 (torch default) everywhere so converted
torch checkpoints are bit-compatible; flax's default would be 1e-6.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# torch.nn.LayerNorm default epsilon; required for checkpoint parity.
LAYER_NORM_EPS = 1e-5


def get_initializer(init: str) -> Callable:
    if init == "default":
        return nn.initializers.lecun_normal()
    if init == "relu":
        return nn.initializers.he_normal()
    if init == "glorot":
        return nn.initializers.glorot_uniform()
    if init in ("final", "gating"):
        return nn.initializers.zeros_init()
    if init == "normal":
        return nn.initializers.normal(stddev=1.0)
    raise ValueError(f"Unknown init: {init}")


class Linear(nn.Module):
    """Dense layer with the AF2 init vocabulary.

    init="gating" sets bias to 1 (sigmoid-gate opens at init), everything
    else zero-initializes the bias, matching the reference Linear wrapper
    (`model/ipa_pytorch.py:101-166`).
    """

    features: int
    use_bias: bool = True
    init: str = "default"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        bias_init = (
            nn.initializers.ones_init()
            if self.init == "gating"
            else nn.initializers.zeros_init()
        )
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=get_initializer(self.init),
            bias_init=bias_init,
            dtype=self.dtype,
            name="dense",
        )(x)


class LayerNorm(nn.Module):
    """LayerNorm with torch's epsilon."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=LAYER_NORM_EPS, dtype=self.dtype, name="ln")(x)


class MLP(nn.Module):
    """Linear/ReLU stack with optional trailing LayerNorm.

    `dims` are the output dims of each Linear; ReLU between layers (not
    after the last).
    """

    dims: tuple
    final_layer_norm: bool = False
    init: str = "default"
    final_init: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, d in enumerate(self.dims):
            is_last = i == len(self.dims) - 1
            init = (self.final_init or self.init) if is_last else self.init
            x = Linear(d, init=init, dtype=self.dtype, name=f"linear_{i}")(x)
            if not is_last:
                x = jax.nn.relu(x)
        if self.final_layer_norm:
            x = LayerNorm(dtype=self.dtype, name="ln_out")(x)
        return x


class TorchMultiheadSelfAttention(nn.Module):
    """Self-attention matching torch.nn.MultiheadAttention semantics.

    Packed qkv projection (single [3E, E] in_proj in torch; stored here as
    one Dense of 3E features so checkpoint conversion is a transpose), plus
    out_proj. Key-padding mask only (that is all the reference's seq
    transformer uses, `model/ipa_pytorch.py:636-637`).
    """

    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, key_padding_mask: Optional[Array] = None) -> Array:
        # x: [B, N, E]; key_padding_mask: [B, N] with 1 = valid.
        e = x.shape[-1]
        h = self.num_heads
        d = e // h
        qkv = nn.Dense(3 * e, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[:-1] + (h, d)).swapaxes(-2, -3)  # [B,H,N,d]

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        logits = jnp.einsum("...hid,...hjd->...hij", q, k) / jnp.sqrt(d).astype(
            x.dtype
        )
        if key_padding_mask is not None:
            bias = (1.0 - key_padding_mask[..., None, None, :]) * -1e9
            logits = logits + bias.astype(logits.dtype)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("...hij,...hjd->...hid", attn, v)
        out = out.swapaxes(-2, -3).reshape(x.shape)
        return nn.Dense(e, dtype=self.dtype, name="out_proj")(out)


class TorchTransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer with torch 1.x semantics.

    Matches torch.nn.TransformerEncoderLayer(norm_first=False, relu FFN,
    dropout=0), the exact configuration of the reference's per-block
    sequence transformer (`model/ipa_pytorch.py:584-593`):
        x = LN1(x + SelfAttn(x)); x = LN2(x + W2 relu(W1 x)).
    """

    num_heads: int
    dim_feedforward: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, key_padding_mask: Optional[Array] = None) -> Array:
        attn = TorchMultiheadSelfAttention(
            self.num_heads, dtype=self.dtype, name="self_attn"
        )(x, key_padding_mask)
        x = nn.LayerNorm(epsilon=LAYER_NORM_EPS, dtype=self.dtype, name="norm1")(
            x + attn
        )
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        ff = nn.Dense(x.shape[-1], dtype=self.dtype, name="linear2")(
            jax.nn.relu(ff)
        )
        return nn.LayerNorm(epsilon=LAYER_NORM_EPS, dtype=self.dtype, name="norm2")(
            x + ff
        )


class TorchTransformerEncoder(nn.Module):
    """Stack of TorchTransformerEncoderLayer."""

    num_layers: int
    num_heads: int
    dim_feedforward: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, key_padding_mask: Optional[Array] = None) -> Array:
        for i in range(self.num_layers):
            x = TorchTransformerEncoderLayer(
                self.num_heads,
                self.dim_feedforward,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, key_padding_mask)
        return x
