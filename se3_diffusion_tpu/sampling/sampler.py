"""On-device Euler-Maruyama reverse sampler as a single lax.scan.

The reference's sampler ping-pongs between the GPU model forward and a
numpy diffuser step on the host every iteration
(`experiments/train_se3_diffusion.py:718-818`, device->host->device at
:768-777). Here the entire reverse trajectory — model forward,
self-conditioning update, SE(3) reverse step — is one jitted
`lax.scan` over time, compiled once per (batch, length) shape; host code
only sees the final (or optionally stacked) tensors.

Batched over samples; mixed lengths are handled by padding masks, so one
compiled program serves a whole length bucket.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.geometry import quat as quat_lib
from se3_diffusion_tpu.geometry.rigid import Rigid
from se3_diffusion_tpu.models.score_network import (
    ScoreNetwork,
    score_network_forward,
)
from se3_diffusion_tpu.proteins import backbone

Array = jax.Array


class SampleOutput(NamedTuple):
    """Final sample + optional per-step trajectories (index 0 = t~0)."""

    rigids: Array  # [B, N, 7] final frames
    psi: Array  # [B, N, 2]
    atom37: Array  # [B, N, 37, 3]
    atom37_mask: Array  # [B, N, 37]
    rigid_traj: Optional[Array] = None  # [T+1, B, N, 7]
    atom37_traj: Optional[Array] = None  # [T, B, N, 37, 3]
    x0_traj: Optional[Array] = None  # [T, B, N, 37, 3] model x0 predictions


def _base_feats(
    rigids_t: Array, res_mask: Array, fixed_mask: Array, t: Array, sc_ca: Array
) -> Dict[str, Array]:
    num_res = res_mask.shape[-1]
    return {
        "rigids_t": rigids_t,
        "t": t,
        "seq_idx": jnp.tile(jnp.arange(num_res)[None], (res_mask.shape[0], 1)),
        "res_mask": res_mask,
        "fixed_mask": fixed_mask,
        "sc_ca_t": sc_ca,
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "num_t",
        "self_condition",
        "prime_self_conditioning",
        "center",
        "aux_traj",
        "probability_flow",
        "clash_guidance_weight",
        "clash_guidance_margin",
        "clash_guidance_t_max",
    ),
)
def sample_fn(
    params,
    diffuser: SE3Diffuser,
    key: jax.Array,
    init_rigids: Array,
    res_mask: Array,
    fixed_mask: Array,
    motif_torsions: Optional[Array] = None,
    *,
    model: ScoreNetwork,
    num_t: int = 500,
    min_t: float = 0.01,
    noise_scale: float = 0.1,
    self_condition: bool = True,
    prime_self_conditioning: bool = True,
    center: bool = True,
    aux_traj: bool = False,
    probability_flow: bool = False,
    clash_guidance_weight: float = 0.0,
    clash_guidance_margin: float = 3.8,
    clash_guidance_t_max: float = 0.25,
    t_start: float = 1.0,
) -> SampleOutput:
    """Runs the full reverse diffusion for a batch of proteins.

    Args:
        params: ScoreNetwork params.
        init_rigids: [B, N, 7] frames sampled from the reference
            distribution (see `SE3Diffuser.sample_ref`).
        res_mask: [B, N] 1 for real residues (padding support).
        fixed_mask: [B, N] 1 for motif residues held fixed.
        num_t: number of reverse steps (reference inference default 500).
        min_t: final time (reverse integrates 1 -> min_t).
        noise_scale: sampling temperature on the Brownian term.
        prime_self_conditioning: DOCUMENTED DEVIATION from the reference:
            when True (default), an extra t=1 forward primes `sc_ca_t`
            before the first reverse step; the reference starts from
            zeros (`train_se3_diffusion.py:744-747`). Priming matches
            what the model saw in training (sc features populated) at
            the cost of one extra forward; set False for
            trajectory-level parity with the reference.
        aux_traj: also return stacked trajectories (costs T x state HBM).
        clash_guidance_weight: framework addition (0 = off, reference
            parity). Adds -w * grad of a CA-CA steric hinge potential
            (non-adjacent pairs below `clash_guidance_margin` Angstroms)
            to the translation score for t < `clash_guidance_t_max`,
            steering late reverse steps away from the clash artifacts
            the eval counts (`analysis/metrics.py:127-132`). The
            potential is local — zero for clash-free structures — so
            clean geometry is untouched. Useful weights are small
            (~1e-3..1e-1): the gradient is divided by
            coordinate_scaling to live in the same scaled space as the
            model's score.

    Returns:
        SampleOutput. Step semantics match the reference `inference_fn`
        (`train_se3_diffusion.py:744-818`): Euler-Maruyama with noise for
        t > min_t, and the model's x0 prediction taken directly at the
        final step.
    """
    # t_start < 1 runs a PARTIAL reverse process (framework addition for
    # structure diversification, RFdiffusion-style "partial diffusion"):
    # init_rigids must then come from `forward_marginal` of a clean
    # structure at t_start, not `sample_ref`. dt = t_start/num_t keeps the
    # reference's dt = 1/num_t semantics exactly when t_start == 1.
    reverse_steps = jnp.linspace(min_t, t_start, num_t)[::-1]
    dt = t_start / num_t
    batch = init_rigids.shape[0]
    num_res = res_mask.shape[-1]
    diffuse_mask = (1.0 - fixed_mask) * res_mask

    if clash_guidance_weight > 0.0:
        ridx = jnp.arange(num_res)
        nonadjacent = (jnp.abs(ridx[:, None] - ridx[None, :]) >= 2).astype(
            jnp.float32
        )
        clash_pair_mask = (
            diffuse_mask[:, :, None] * res_mask[:, None, :] * nonadjacent[None]
        )

        def clash_energy(trans):
            d = quat_lib.safe_norm(trans[:, :, None] - trans[:, None, :])
            hinge = jnp.maximum(clash_guidance_margin - d, 0.0) ** 2
            return (hinge * clash_pair_mask).sum()

        coord_scaling = diffuser.cfg.r3.coordinate_scaling

        def guide_trans_score(trans_score, rigids_t, t_scalar):
            # grad is w.r.t. unscaled Angstrom coords; the score lives in
            # scaled space (x_s = c * x), so chain-rule divides by c.
            g = jax.grad(clash_energy)(rigids_t[..., 4:])
            gate = (t_scalar < clash_guidance_t_max).astype(trans_score.dtype)
            return trans_score - gate * (
                clash_guidance_weight / coord_scaling
            ) * g.astype(trans_score.dtype)

    else:

        def guide_trans_score(trans_score, rigids_t, t_scalar):
            return trans_score

    def forward(rigids_t, t_scalar, sc_ca):
        t = jnp.full((batch,), t_scalar, dtype=jnp.float32)
        feats = _base_feats(rigids_t, res_mask, fixed_mask, t, sc_ca)
        if motif_torsions is not None:
            # Ground-truth psi for fixed (motif) residues, blended by the
            # score network (reference `score_network.py:201-203`).
            feats["torsion_angles_sin_cos"] = motif_torsions
        return score_network_forward(model, params, feats, diffuser)

    sc_init = jnp.zeros(init_rigids.shape[:-1] + (3,), init_rigids.dtype)
    if self_condition and prime_self_conditioning:
        out0 = forward(init_rigids, reverse_steps[0], sc_init)
        sc_init = out0["rigids"][..., 4:]

    def step(carry, t_scalar):
        rigids_t, sc_ca, k = carry
        k, sub = jax.random.split(k)
        out = forward(rigids_t, t_scalar, sc_ca)
        rigids_next = diffuser.reverse(
            sub,
            Rigid.from_tensor_7(rigids_t),
            out["rot_score"],
            guide_trans_score(out["trans_score"], rigids_t, t_scalar),
            t_scalar,
            dt,
            diffuse_mask=diffuse_mask,
            center=center,
            noise_scale=noise_scale,
            probability_flow=probability_flow,
        ).to_tensor_7()
        sc_next = out["rigids"][..., 4:] if self_condition else sc_ca
        aux = None
        if aux_traj:
            atom37_t, _, _ = backbone.compute_backbone(
                Rigid.from_tensor_7(rigids_next), out["psi"]
            )
            x0_atom37, _, _ = backbone.compute_backbone(
                Rigid.from_tensor_7(out["rigids"]), out["psi"]
            )
            aux = (rigids_next, atom37_t, x0_atom37)
        return (rigids_next, sc_next, k), aux

    # All steps except the last apply the stochastic reverse kernel; the
    # final step takes the model's clean-frame prediction directly.
    (rigids_t, sc_ca, key), traj = jax.lax.scan(
        step, (init_rigids, sc_init, key), reverse_steps[:-1]
    )
    final = forward(rigids_t, reverse_steps[-1], sc_ca)
    final_rigids = final["rigids"]
    atom37, atom37_mask, _ = backbone.compute_backbone(
        Rigid.from_tensor_7(final_rigids), final["psi"]
    )

    if aux_traj:
        rigid_traj, atom37_traj, x0_traj = traj
        # Append the final state; flip so index 0 = end of sampling (t~0),
        # matching the reference's visualization convention
        # (`train_se3_diffusion.py:801-805`).
        rigid_traj = jnp.concatenate(
            [init_rigids[None], rigid_traj, final_rigids[None]], axis=0
        )[::-1]
        atom37_traj = jnp.concatenate([atom37_traj, atom37[None]], axis=0)[::-1]
        x0_traj = jnp.concatenate([x0_traj, atom37[None]], axis=0)[::-1]
    else:
        rigid_traj = atom37_traj = x0_traj = None

    return SampleOutput(
        rigids=final_rigids,
        psi=final["psi"],
        atom37=atom37,
        atom37_mask=atom37_mask,
        rigid_traj=rigid_traj,
        atom37_traj=atom37_traj,
        x0_traj=x0_traj,
    )


def sample_backbones(
    key: jax.Array,
    model: ScoreNetwork,
    params,
    diffuser: SE3Diffuser,
    num_res: int,
    num_samples: int = 1,
    num_t: int = 500,
    min_t: float = 0.01,
    noise_scale: float = 0.1,
    self_condition: bool = True,
    aux_traj: bool = False,
    probability_flow: bool = False,
    clash_guidance_weight: float = 0.0,
    clash_guidance_margin: float = 3.8,
    clash_guidance_t_max: float = 0.25,
) -> SampleOutput:
    """Convenience wrapper: sample `num_samples` unconditional backbones of
    length `num_res` (reference `inference_se3_diffusion.py:418-459`)."""
    key_init, key_scan = jax.random.split(key)
    ref = diffuser.sample_ref(key_init, num_samples * num_res)["rigids_t"]
    init_rigids = ref.to_tensor_7().reshape(num_samples, num_res, 7)
    res_mask = jnp.ones((num_samples, num_res), dtype=jnp.float32)
    fixed_mask = jnp.zeros_like(res_mask)
    return sample_fn(
        params,
        diffuser,
        key_scan,
        init_rigids,
        res_mask,
        fixed_mask,
        model=model,
        num_t=num_t,
        min_t=min_t,
        noise_scale=noise_scale,
        self_condition=self_condition,
        aux_traj=aux_traj,
        probability_flow=probability_flow,
        clash_guidance_weight=clash_guidance_weight,
        clash_guidance_margin=clash_guidance_margin,
        clash_guidance_t_max=clash_guidance_t_max,
    )


def diversify_backbones(
    key: jax.Array,
    model: ScoreNetwork,
    params,
    diffuser: SE3Diffuser,
    atom37: Array,
    atom37_mask: Optional[Array] = None,
    t_start: float = 0.5,
    num_samples: int = 1,
    num_t: int = 500,
    min_t: float = 0.01,
    noise_scale: float = 0.1,
    self_condition: bool = True,
    aux_traj: bool = False,
    probability_flow: bool = False,
) -> SampleOutput:
    """Structure diversification by partial diffusion (framework addition;
    the capability RFdiffusion ships as `partial_T` — the reference
    FrameDiff has no counterpart). Noises an existing backbone forward to
    `t_start` with the exact training-time marginal, then runs the reverse
    process from there: small `t_start` resamples local detail around the
    input fold, large `t_start` explores further; `t_start=1` recovers
    unconditional sampling from scratch.

    Args:
        atom37: [N, 37, 3] clean input backbone (one structure; it is
            tiled to `num_samples` independent diversifications).
        t_start: forward-noising time in (min_t, 1].
        num_t: step count of the FULL 1->min_t protocol; the partial leg
            runs round(num_t * t_start) steps so the effective dt matches
            the unconditional protocol's 1/num_t.
    """
    from se3_diffusion_tpu.proteins import transforms

    atom37 = jnp.asarray(atom37)
    if atom37_mask is None:
        atom37_mask = jnp.any(atom37 != 0.0, axis=-1).astype(jnp.float32)
    frames, frame_mask = transforms.backbone_frames_from_atom37(
        atom37, atom37_mask
    )
    res_mask = frame_mask.astype(jnp.float32)
    # Center on the masked CA centroid, as training data is centered
    # (reference `pdb_data_loader.py` CoM removal).
    com = (frames.trans * res_mask[:, None]).sum(0) / jnp.maximum(
        res_mask.sum(), 1.0
    )
    frames = Rigid(quat=frames.quat, trans=frames.trans - com[None])
    tile = lambda x: jnp.tile(x[None], (num_samples,) + (1,) * x.ndim)
    frames_b = Rigid(quat=tile(frames.quat), trans=tile(frames.trans))
    res_mask_b = tile(res_mask)

    key_noise, key_scan = jax.random.split(key)
    noised = diffuser.forward_marginal(
        key_noise,
        frames_b,
        jnp.full((num_samples,), t_start, jnp.float32),
        diffuse_mask=res_mask_b,
    )
    init_rigids = noised["rigids_t"].to_tensor_7()
    num_t_eff = max(int(round(num_t * t_start)), 2)
    return sample_fn(
        params,
        diffuser,
        key_scan,
        init_rigids,
        res_mask_b,
        jnp.zeros_like(res_mask_b),
        model=model,
        num_t=num_t_eff,
        min_t=min_t,
        noise_scale=noise_scale,
        self_condition=self_condition,
        aux_traj=aux_traj,
        probability_flow=probability_flow,
        t_start=t_start,
    )
