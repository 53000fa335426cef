"""SE(3) diffusion: IGSO(3) rotations x VP-SDE translations, composed.

Functional rewrite of the reference ``SE3Diffuser`` (`data/se3_diffuser.py`).
The diffuser object is itself a pytree (IGSO3 tables as leaves, configs as
static metadata) so it threads through `jit`/`scan`/`shard_map` unchanged;
every method is pure: (key, data, t) -> data.

Frames are `geometry.Rigid` (quaternion + translation) throughout; rotation
vectors only appear at the diffuser boundary. All diffusion ops run
on-device — the reference round-trips to numpy/scipy per call
(`se3_diffuser.py:11-29`), and per sampler step (`train_se3_diffusion.py:768`).
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from se3_diffusion_tpu.config import DiffuserConfig
from se3_diffusion_tpu.diffusion import igso3, r3, so3
from se3_diffusion_tpu.geometry import quat as quat_lib
from se3_diffusion_tpu.geometry.rigid import Rigid

Array = jax.Array


def _mask_blend(x_diff: Array, x_fixed: Array, diff_mask: Array) -> Array:
    """diff_mask==1 takes the diffused value (reference `se3_diffuser.py:127-128`)."""
    return diff_mask * x_diff + (1.0 - diff_mask) * x_fixed


@flax.struct.dataclass
class SE3Diffuser:
    """SE(3)^N diffusion process. Construct with `create`."""

    tables: igso3.IGSO3Tables
    cfg: DiffuserConfig = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, cfg: DiffuserConfig, cache_dir: Optional[str] = None):
        tables = igso3.build_tables(cfg.so3, cache_dir=cache_dir)
        return cls(tables=tables, cfg=cfg)

    # -- schedules -----------------------------------------------------------

    def score_scaling(self, t: Array):
        """(rot_score_scaling, trans_score_scaling) at time t."""
        return (
            so3.score_scaling(self.tables, self.cfg.so3, t),
            r3.score_scaling(self.cfg.r3, t),
        )

    # -- forward process -----------------------------------------------------

    def forward_marginal(
        self,
        key: jax.Array,
        rigids_0: Rigid,
        t: Array,
        diffuse_mask: Array | None = None,
    ) -> dict:
        """Noises clean frames to time t and returns training targets.

        Args:
            rigids_0: [..., N] clean frames.
            t: per-example times in [min_t, 1], broadcastable to rigids_0
               batch dims. The VP-SDE score is singular at exactly t=0
               (conditional variance 0); callers sample t >= min_t
               (reference `pdb_data_loader.py:250`, min_t=0.01).
            diffuse_mask: [..., N] 1 = diffuse, 0 = keep fixed (motif).

        Returns dict with `rigids_t` (Rigid), `rot_score`/`trans_score`
        [..., N, 3], and scalar-per-example score scalings — the same
        contract as reference `se3_diffuser.py:43-110`, minus the
        numpy/torch round trips.
        """
        key_rot, key_trans = jax.random.split(key)
        rot_0 = rigids_0.rotvecs()
        trans_0 = rigids_0.trans
        t = jnp.asarray(t)

        if self.cfg.diffuse_rot:
            rot_t, rot_score = so3.forward_marginal(
                key_rot, self.tables, self.cfg.so3, rot_0, t
            )
            rot_score_scaling = so3.score_scaling(self.tables, self.cfg.so3, t)
        else:
            rot_t = rot_0
            rot_score = jnp.zeros_like(rot_0)
            rot_score_scaling = jnp.ones_like(t)

        if self.cfg.diffuse_trans:
            trans_t, trans_score = r3.forward_marginal(
                key_trans, self.cfg.r3, trans_0, t
            )
            trans_score_scaling = r3.score_scaling(self.cfg.r3, t)
        else:
            trans_t = trans_0
            trans_score = jnp.zeros_like(trans_0)
            trans_score_scaling = jnp.ones_like(t)

        if diffuse_mask is not None:
            m = diffuse_mask[..., None]
            rot_t = _mask_blend(rot_t, rot_0, m)
            trans_t = _mask_blend(trans_t, trans_0, m)
            rot_score = _mask_blend(rot_score, jnp.zeros_like(rot_score), m)
            trans_score = _mask_blend(trans_score, jnp.zeros_like(trans_score), m)

        return {
            "rigids_t": Rigid.from_rotvec(rot_t, trans_t),
            "rot_score": rot_score,
            "trans_score": trans_score,
            "rot_score_scaling": rot_score_scaling,
            "trans_score_scaling": trans_score_scaling,
        }

    # -- score computation (model-side) --------------------------------------

    def calc_rot_score(self, quats_t: Array, quats_0: Array, t: Array) -> Array:
        """Score of rot_t given predicted rot_0: IGSO3 score of Log(R0^-1 Rt).

        Pure quaternion path (reference converts through eigh-derived quats,
        `se3_diffuser.py:119-125`).
        """
        q_0t = quat_lib.quat_multiply(quat_lib.quat_invert(quats_0), quats_t)
        rotvec_0t = quat_lib.quat_to_rotvec(q_0t)
        return so3.score(self.tables, self.cfg.so3, rotvec_0t, t)

    def calc_trans_score(
        self, trans_t: Array, trans_0: Array, t: Array, scale_inputs: bool = True
    ) -> Array:
        return r3.score(self.cfg.r3, trans_t, trans_0, t, scale_inputs=scale_inputs)

    def calc_trans_0(self, trans_score: Array, trans_t: Array, t: Array) -> Array:
        return r3.calc_trans_0(self.cfg.r3, trans_score, trans_t, t)

    # -- reverse process -----------------------------------------------------

    def reverse(
        self,
        key: jax.Array,
        rigid_t: Rigid,
        rot_score: Array,
        trans_score: Array,
        t: Array,
        dt: Array,
        diffuse_mask: Array | None = None,
        center: bool = True,
        noise_scale: float = 1.0,
        probability_flow: bool = False,
    ) -> Rigid:
        """One joint reverse step (reference `se3_diffuser.py:160-214`).

        probability_flow integrates the deterministic ODE instead of the
        SDE (see so3/r3 reverse_step)."""
        key_rot, key_trans = jax.random.split(key)
        rot_t = rigid_t.rotvecs()
        trans_t = rigid_t.trans

        if self.cfg.diffuse_rot:
            rot_next = so3.reverse_step(
                key_rot,
                self.cfg.so3,
                rot_t,
                rot_score,
                t,
                dt,
                noise_scale=noise_scale,
                probability_flow=probability_flow,
            )
        else:
            rot_next = rot_t

        if self.cfg.diffuse_trans:
            trans_next = r3.reverse_step(
                key_trans,
                self.cfg.r3,
                trans_t,
                trans_score,
                t,
                dt,
                mask=diffuse_mask if diffuse_mask is not None else None,
                center=center,
                noise_scale=noise_scale,
                probability_flow=probability_flow,
            )
        else:
            trans_next = trans_t

        if diffuse_mask is not None:
            m = diffuse_mask[..., None]
            rot_next = _mask_blend(rot_next, rot_t, m)
            trans_next = _mask_blend(trans_next, trans_t, m)
        return Rigid.from_rotvec(rot_next, trans_next)

    def forward_trajectory(
        self, key: jax.Array, trans_0: Array, min_t: float, num_t: int
    ) -> Array:
        """Forward-diffusion trajectory of translations (scaled space), a
        lax.scan port of reference `forward_traj`
        (`train_se3_diffusion.py:708-716`). Returns [num_t, ..., 3]."""
        ts = jnp.linspace(min_t, 1.0, num_t)[:-1]

        def step(carry, inp):
            x, k = carry
            k, sub = jax.random.split(k)
            t = inp
            x_next = r3.forward_step(sub, self.cfg.r3, x, t, num_t)
            # forward_step returns scaled coords; keep the chain in
            # unscaled space like the reference loop.
            x_next = r3.unscale(self.cfg.r3, x_next)
            return (x_next, k), x_next

        (_, _), traj = jax.lax.scan(step, (trans_0, key), ts)
        return jnp.concatenate([trans_0[None], traj], axis=0)

    # -- reference distribution ----------------------------------------------

    def sample_ref(
        self,
        key: jax.Array,
        n_samples: int,
        impute: Rigid | None = None,
        diffuse_mask: Array | None = None,
    ) -> dict:
        """Samples frames from the t=1 reference distribution.

        Uniform-ish IGSO3(sigma_max) rotations x N(0, I) translations in
        scaled space, with motif imputation (reference
        `se3_diffuser.py:216-268`).
        """
        key_rot, key_trans = jax.random.split(key)
        if (diffuse_mask is not None or not self.cfg.diffuse_rot
                or not self.cfg.diffuse_trans) and impute is None:
            raise ValueError("Must provide imputation values.")

        if self.cfg.diffuse_rot:
            rot_ref = so3.sample_ref(key_rot, self.tables, self.cfg.so3, n_samples)
        else:
            rot_ref = impute.rotvecs().reshape(n_samples, 3)

        if self.cfg.diffuse_trans:
            trans_ref = r3.sample_ref(key_trans, self.cfg.r3, (n_samples,))
        else:
            trans_ref = impute.trans.reshape(n_samples, 3)

        if diffuse_mask is not None:
            m = diffuse_mask[..., None]
            rot_ref = _mask_blend(rot_ref, impute.rotvecs().reshape(n_samples, 3), m)
            trans_ref = _mask_blend(
                trans_ref, impute.trans.reshape(n_samples, 3), m
            )
        return {"rigids_t": Rigid.from_rotvec(rot_ref, trans_ref)}
