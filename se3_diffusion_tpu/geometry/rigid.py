"""Rigid transforms on SE(3) as a JAX pytree.

TPU-native replacement for the reference's ``Rigid``/``Rotation`` classes
(``openfold/utils/rigid_utils.py`` in jasonkyuyim/se3_diffusion). Design
differences, deliberate:

* Rotations are carried as **quaternions end-to-end** ([..., 4] wxyz).
  The reference stores rotation matrices in most places and converts
  rot->quat with ``torch.linalg.eigh`` when it needs quaternion updates;
  carrying quats makes ``compose_q_update_vec`` (the AF2 backbone update,
  reference ``rigid_utils.py:587-616, 1039-1063``) a pure VPU op and
  removes the eigh entirely.
* ``Rigid`` is a frozen flax dataclass => a registered pytree: it jits,
  vmaps, scans and shards like any array pair.
* All ops are pure functions of the fields; nothing mutates.
"""
from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from se3_diffusion_tpu.geometry import quat as quat_lib

Array = jax.Array


@flax.struct.dataclass
class Rigid:
    """A batch of rigid transforms: rotation quaternion + translation.

    Attributes:
        quat: [..., 4] wxyz quaternions (unit unless noted).
        trans: [..., 3] translations.
    """

    quat: Array
    trans: Array

    # -- constructors -------------------------------------------------------

    @classmethod
    def identity(cls, batch_shape: Tuple[int, ...], dtype=jnp.float32) -> "Rigid":
        quat = jnp.zeros(batch_shape + (4,), dtype=dtype).at[..., 0].set(1.0)
        trans = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return cls(quat=quat, trans=trans)

    @classmethod
    def from_tensor_7(cls, t: Array, normalize_quats: bool = False) -> "Rigid":
        """[..., 7] = (quat wxyz, trans) codec; mirrors reference
        ``rigid_utils.py:1215-1231`` (default: no normalization)."""
        quat = t[..., :4]
        if normalize_quats:
            quat = quat_lib.quat_normalize(quat)
        return cls(quat=quat, trans=t[..., 4:])

    def to_tensor_7(self) -> Array:
        return jnp.concatenate([self.quat, self.trans], axis=-1)

    @classmethod
    def from_tensor_4x4(cls, t: Array) -> "Rigid":
        """[..., 4, 4] homogeneous transform -> Rigid."""
        return cls(
            quat=quat_lib.rotmat_to_quat(t[..., :3, :3]), trans=t[..., :3, 3]
        )

    def to_tensor_4x4(self) -> Array:
        out = jnp.zeros(self.shape + (4, 4), dtype=self.trans.dtype)
        out = out.at[..., :3, :3].set(self.rot_mats())
        out = out.at[..., :3, 3].set(self.trans)
        return out.at[..., 3, 3].set(1.0)

    @classmethod
    def from_rotmat(cls, rot: Array, trans: Array) -> "Rigid":
        return cls(quat=quat_lib.rotmat_to_quat(rot), trans=trans)

    @classmethod
    def from_rotvec(cls, rotvec: Array, trans: Array) -> "Rigid":
        return cls(quat=quat_lib.rotvec_to_quat(rotvec), trans=trans)

    @classmethod
    def from_3_points(
        cls, p_neg_x_axis: Array, origin: Array, p_xy_plane: Array, eps: float = 1e-8
    ) -> "Rigid":
        """Gram-Schmidt frame construction (AF2 algorithm 21).

        Same construction as reference ``rigid_utils.py:1233-1275``: for a
        backbone residue call with (N, CA, C).
        """
        e0 = origin - p_neg_x_axis
        e1 = p_xy_plane - origin
        e0 = e0 / jnp.sqrt(jnp.sum(e0 * e0, axis=-1, keepdims=True) + eps)
        e1 = e1 - e0 * jnp.sum(e0 * e1, axis=-1, keepdims=True)
        e1 = e1 / jnp.sqrt(jnp.sum(e1 * e1, axis=-1, keepdims=True) + eps)
        e2 = jnp.cross(e0, e1)
        rot = jnp.stack([e0, e1, e2], axis=-1)  # columns are the basis
        return cls(quat=quat_lib.rotmat_to_quat(rot), trans=origin)

    # -- core ops ------------------------------------------------------------

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.trans.shape[:-1]

    def rot_mats(self) -> Array:
        return quat_lib.quat_to_rotmat(self.quat)

    def rotvecs(self) -> Array:
        return quat_lib.quat_to_rotvec(self.quat)

    def apply(self, pts: Array) -> Array:
        """Maps local points to global: R p + t. Broadcasts over [..., 3]."""
        return quat_lib.rot_apply(self.rot_mats(), pts) + self.trans

    def invert_apply(self, pts: Array) -> Array:
        """Maps global points to local: R^T (p - t)."""
        return quat_lib.rot_invert_apply(self.rot_mats(), pts - self.trans)

    def compose(self, other: "Rigid") -> "Rigid":
        """Composition self * other (applies `other` first in local coords)."""
        return Rigid(
            quat=quat_lib.quat_normalize(
                quat_lib.quat_multiply(self.quat, other.quat)
            ),
            trans=self.apply(other.trans),
        )

    def invert(self) -> "Rigid":
        inv_q = quat_lib.quat_invert(self.quat)
        return Rigid(
            quat=inv_q,
            trans=-quat_lib.rot_invert_apply(self.rot_mats(), self.trans),
        )

    def compose_q_update_vec(
        self, update: Array, update_mask: Array | None = None
    ) -> "Rigid":
        """AF2 backbone update: [..., 6] = (b, c, d, tx, ty, tz).

        (1, b, c, d) is the unnormalized quaternion update; the translation
        update is rotated into the global frame. Matches reference semantics
        (``rigid_utils.py:587-616`` + ``:1039-1063``) exactly: the *additive*
        quaternion delta is masked, then the sum is normalized.
        """
        q_vec, t_vec = update[..., :3], update[..., 3:]
        quat_update = quat_lib.quat_multiply_by_vec(self.quat, q_vec)
        trans_update = quat_lib.rot_apply(self.rot_mats(), t_vec)
        if update_mask is not None:
            quat_update = quat_update * update_mask
            trans_update = trans_update * update_mask
        new_quat = quat_lib.quat_normalize(self.quat + quat_update)
        return Rigid(quat=new_quat, trans=self.trans + trans_update)

    # -- transforms of fields --------------------------------------------------

    def scale_translation(self, factor) -> "Rigid":
        return Rigid(quat=self.quat, trans=self.trans * factor)

    def stop_rot_gradient(self) -> "Rigid":
        return Rigid(quat=jax.lax.stop_gradient(self.quat), trans=self.trans)

    def astype(self, dtype) -> "Rigid":
        return Rigid(quat=self.quat.astype(dtype), trans=self.trans.astype(dtype))

    def __getitem__(self, idx) -> "Rigid":
        """Indexes batch dims only (the trailing component dim is preserved),
        so `r[..., None]` broadcasts frames over a new point axis."""
        if not isinstance(idx, tuple):
            idx = (idx,)
        return Rigid(
            quat=self.quat[idx + (slice(None),)],
            trans=self.trans[idx + (slice(None),)],
        )
