"""Fused IPA attention Pallas kernel (TPU).

Fuses the entire Invariant Point Attention core — scalar-qk logits +
pair bias + point-distance bias, masking, online softmax, and the three
aggregations (scalar values, point values, pair features) — into one
VMEM-resident pass, FlashAttention-style. The XLA path in `models/ipa.py`
materializes several [B, H, N, N] float32 intermediates in HBM; this
kernel streams them through VMEM and writes only output-sized tensors.

Structure (Mosaic constraints shaped all of this):
* Grid (batch, query tile i, key tile j) with j innermost ("arbitrary");
  the output blocks are indexed by i only, so they stay resident while
  the online-softmax state for the i-tile lives in VMEM scratch,
  initialized at j==0 and finalized at j==last.
* Inputs are head-major ([H, N, C]); contractions are H-batched 3D
  dot_generals (leading batch dims, Mosaic's supported batched form) —
  in-kernel reshapes/transposes that re-tile the lane dim are not.
* Everything is expressed as matmuls (Mosaic's fast path): the
  point-distance bias is one augmented matmul
  (w_h-scaled [-2qf, 1, |qf|^2] . [kf, |kf|^2, 1]^T) and the
  pair-feature aggregation o_pair[i,c] = sum_j p[i,j] z[i,j,c] is a
  TI-batched matvec per head.
* Logits/softmax accumulate in float32 regardless of input dtype.

Measured history on v5e-1 (B=4, N=384, production dims):

* round 1 (per-batch python loop over pallas_calls): module fwd
  fp32 6.4 ms vs 9.5 ms XLA; bf16 5.6 ms vs 4.0 ms XLA.
* round 2 (this version: one (B, I, J) grid, bias in storage dtype):
  module fwd bf16 4.4 ms, fp32 5.9 ms. BUT the surrounding toolchain
  (libtpu cl/854318611) also moved: standalone XLA now measures
  bf16 ~70 ms / fp32 5.3 ms, while END-TO-END (full sampler, len 300,
  num_t 100, bf16) XLA does 13.9 ms/step vs 17.1 ms/step with this
  kernel — inside the full graph XLA fuses the attention with its
  neighbors and wins; the standalone-module gap is a measurement
  artifact of isolated-call layouts.

Verdict (round 2, `scripts/bench_sampler_impls.py`): `attention_impl`
defaults to 'xla' in all dtypes; this kernel stays as the alternative
implementation (re-evaluate on toolchain bumps — the r1->r2 swing shows
these numbers are build-sensitive), bit-checked against the XLA path in
tests (CPU interpret mode).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30


def _kernel(
    q_ref,        # [1, H, TI, C]
    k_ref,        # [1, H, TJ, C]
    v_ref,        # [1, H, TJ, C]
    qfa_ref,      # [1, H, TI, P3+2] augmented points: [-2*qf, 1, |qf|^2]
    kfa_ref,      # [1, H, TJ, P3+2] augmented points: [kf, |kf|^2, 1]
    vp_ref,       # [1, H, TJ, PV3]
    bias_ref,     # [1, H, TI, TJ]  pair bias, pre-scaled by 1/sqrt(3)
    z_ref,        # [1, TI, TJ, CZ] down-projected pair rep
    maskb_ref,    # [1, 1, TJ] additive key-mask bias ((mask-1)*1e5)
    o_ref,        # [1, H, TI, C]    (resident across j)
    opt_ref,      # [1, H, TI, PV3]
    opair_ref,    # [1, H, TI, CZ]
    m_scr,        # [H, TI, 1]
    l_scr,        # [H, TI, 1]
    acco_scr,     # [H, TI, C]
    accpt_scr,    # [H, TI, PV3]
    accpair_scr,  # [H, TI, CZ]
    *,
    num_heads: int,
    scale_qk: float,
):
    j = pl.program_id(2)
    num_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acco_scr[...] = jnp.zeros_like(acco_scr)
        accpt_scr[...] = jnp.zeros_like(accpt_scr)
        accpair_scr[...] = jnp.zeros_like(accpair_scr)

    mask_bias = maskb_ref[0].astype(jnp.float32)  # [1, TJ]
    z_blk = z_ref[0]                              # [TI, TJ, CZ], storage dtype

    # All contractions are H-batched 3D dot_generals (leading batch dims,
    # Mosaic's supported batched-matmul form); inputs stay in their storage
    # dtype (bf16 in production, 2x MXU rate), accumulation in float32.
    q_b = q_ref[0]      # [H, TI, C]
    k_b = k_ref[0]      # [H, TJ, C]
    qfa_b = qfa_ref[0].astype(jnp.float32)  # geometry in f32
    kfa_b = kfa_ref[0].astype(jnp.float32)
    hbatch = (((2,), (2,)), ((0,), (0,)))

    logits = (
        jax.lax.dot_general(
            q_b, k_b, hbatch, preferred_element_type=jnp.float32
        )
        * scale_qk
    )  # [H, TI, TJ]
    # Point-distance term as one batched matmul; the per-head weight and
    # the -0.5 factor are folded into qfa on the host, so this directly
    # yields -0.5 * w_h * |qp_i - kp_j|^2.
    sq_d = jax.lax.dot_general(
        qfa_b, kfa_b, hbatch, preferred_element_type=jnp.float32
    )
    logits = logits + sq_d
    logits = logits + bias_ref[0].astype(jnp.float32)
    logits = logits + mask_bias[None]

    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)  # [H, TI, 1]
    p = jnp.exp(logits - m_new)      # [H, TI, TJ]
    m_scr[...] = m_new
    l_scr[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    v_b = v_ref[0]
    vp_b = vp_ref[0]
    p_v = p.astype(v_b.dtype)
    pbatch = (((2,), (1,)), ((0,), (0,)))
    acco_scr[...] = acco_scr[...] * alpha + jax.lax.dot_general(
        p_v, v_b, pbatch, preferred_element_type=jnp.float32
    )
    accpt_scr[...] = accpt_scr[...] * alpha + jax.lax.dot_general(
        p_v, vp_b, pbatch, preferred_element_type=jnp.float32
    )
    # Pair aggregation per head: a TI-batched matvec on the MXU. Reshape
    # on the f32 vector (bf16 sublane retile is unsupported), then cast.
    for h in range(num_heads):
        pair = jax.lax.dot_general(
            p[h][:, None, :].astype(z_blk.dtype), z_blk,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TI, 1, CZ]
        accpair_scr[h] = accpair_scr[h] * alpha[h] + pair[:, 0, :]

    @pl.when(j == num_j - 1)
    def _finalize():
        for h in range(num_heads):
            l_safe = jnp.maximum(l_scr[h], 1e-20)
            o_ref[0, h] = (acco_scr[h] / l_safe).astype(o_ref.dtype)
            opt_ref[0, h] = (accpt_scr[h] / l_safe).astype(opt_ref.dtype)
            opair_ref[0, h] = (accpair_scr[h] / l_safe).astype(
                opair_ref.dtype
            )


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "tile_q", "tile_n", "interpret"),
)
def fused_ipa_attention(
    q: Array,        # [B, N, H, C] scalar queries
    k: Array,        # [B, N, H, C]
    v: Array,        # [B, N, H, C]
    q_pts: Array,    # [B, N, H, P, 3] frame-lifted query points
    k_pts: Array,    # [B, N, H, P, 3]
    v_pts: Array,    # [B, N, H, PV, 3]
    pair_bias: Array,  # [B, N, N, H] (raw linear_b output)
    pair_z: Array,   # [B, N, N, CZ] (down_z output)
    mask: Array,     # [B, N]
    head_weights: Array,  # [H] softplus'd, pre-scaled by sqrt(2/(9P))
    *,
    num_heads: int,
    tile_q: int = 128,
    tile_n: int = 128,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Returns (o [B,N,H*C], o_pt_global [B,N,H,PV,3], o_pair [B,N,H*CZ]).

    Semantics identical to the XLA path in `models/ipa.py` (same scaling
    constants); padding beyond a tile multiple is handled by the caller
    via `mask`.
    """
    b, n, h, c = q.shape
    p = q_pts.shape[-2]
    pv = v_pts.shape[-2]
    cz = pair_z.shape[-1]
    if n % tile_q or n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile sizes")

    scale_qk = math.sqrt(1.0 / (3 * c))

    # Head-major layouts.
    to_hm = lambda x: jnp.moveaxis(x, 2, 1)  # [B, H, N, C]
    qs, ks_, vs = to_hm(q), to_hm(k), to_hm(v)
    qf = to_hm(q_pts.reshape(b, n, h, p * 3)).astype(jnp.float32)
    kf = to_hm(k_pts.reshape(b, n, h, p * 3)).astype(jnp.float32)
    vp = to_hm(v_pts.reshape(b, n, h, pv * 3)).astype(q.dtype)
    # Augment so the in-kernel point-distance term is one matmul:
    # qfa . kfa^T = -0.5 * w_h * (|qf|^2 + |kf|^2 - 2 qf.kf); the per-head
    # softplus weight (pre-scaled) and the -0.5 are folded in here.
    ones = jnp.ones(qf.shape[:-1] + (1,), jnp.float32)
    w_col = (-0.5 * head_weights.astype(jnp.float32)).reshape(1, h, 1, 1)
    qfa = w_col * jnp.concatenate(
        [-2.0 * qf, ones, jnp.sum(qf * qf, -1, keepdims=True)], axis=-1
    )
    kfa = jnp.concatenate(
        [kf, jnp.sum(kf * kf, -1, keepdims=True), ones], axis=-1
    )
    # Bias travels in the storage dtype (bf16 in production — halves its
    # HBM traffic); the kernel upcasts to f32 before the logit add, same
    # as the XLA path upcasts the bf16 linear_b output.
    bias_hm = (jnp.moveaxis(pair_bias, 3, 1) * math.sqrt(1.0 / 3)).astype(
        q.dtype
    )  # [B, H, N, N]
    maskb = ((mask - 1.0) * 1e5).astype(jnp.float32)[:, None, :]  # [B,1,N]
    pa = p * 3 + 2  # augmented point feature width

    kernel = functools.partial(_kernel, num_heads=h, scale_qk=scale_qk)
    # One call, batch on the outer grid axis: the per-batch python loop of
    # the first version serialized B kernel launches (and their operand
    # staging); a (B, I, J) grid pipelines them. Scratch state is per
    # (batch, i) tile and re-initialized at j==0, so the carry semantics
    # are unchanged.
    grid = (b, n // tile_q, n // tile_n)
    out_dt = q.dtype
    out_shapes = (
        jax.ShapeDtypeStruct((b, h, n, c), out_dt),
        jax.ShapeDtypeStruct((b, h, n, pv * 3), jnp.float32),
        jax.ShapeDtypeStruct((b, h, n, cz), out_dt),
    )
    scratch_shapes = [
        pltpu.VMEM((h, tile_q, 1), jnp.float32),
        pltpu.VMEM((h, tile_q, 1), jnp.float32),
        pltpu.VMEM((h, tile_q, c), jnp.float32),
        pltpu.VMEM((h, tile_q, pv * 3), jnp.float32),
        pltpu.VMEM((h, tile_q, cz), jnp.float32),
    ]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, tile_q, c), lambda bi, i, j: (bi, 0, i, 0)),
            pl.BlockSpec((1, h, tile_n, c), lambda bi, i, j: (bi, 0, j, 0)),
            pl.BlockSpec((1, h, tile_n, c), lambda bi, i, j: (bi, 0, j, 0)),
            pl.BlockSpec((1, h, tile_q, pa), lambda bi, i, j: (bi, 0, i, 0)),
            pl.BlockSpec((1, h, tile_n, pa), lambda bi, i, j: (bi, 0, j, 0)),
            pl.BlockSpec((1, h, tile_n, pv * 3), lambda bi, i, j: (bi, 0, j, 0)),
            pl.BlockSpec((1, h, tile_q, tile_n), lambda bi, i, j: (bi, 0, i, j)),
            pl.BlockSpec((1, tile_q, tile_n, cz), lambda bi, i, j: (bi, i, j, 0)),
            pl.BlockSpec((1, 1, tile_n), lambda bi, i, j: (bi, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, h, tile_q, c), lambda bi, i, j: (bi, 0, i, 0)),
            pl.BlockSpec((1, h, tile_q, pv * 3), lambda bi, i, j: (bi, 0, i, 0)),
            pl.BlockSpec((1, h, tile_q, cz), lambda bi, i, j: (bi, 0, i, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # The axon AOT pipeline accounts whole operands against the
            # scoped-vmem limit; v5e has headroom far beyond the 16MB
            # default.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    o_hm, opt_hm, opair = call(
        qs, ks_, vs, qfa, kfa, vp, bias_hm, pair_z, maskb
    )

    o = jnp.moveaxis(o_hm, 1, 2).reshape(b, n, h * c)
    opt = jnp.moveaxis(opt_hm, 1, 2).reshape(b, n, h, pv, 3)
    opair_bnh = jnp.moveaxis(opair, 1, 2).reshape(b, n, h * cz)
    return o.astype(jnp.float32), opt, opair_bnh.astype(jnp.float32)
