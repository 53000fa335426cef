"""Branchless quaternion / rotation-vector / rotation-matrix algebra.

Pure jax functions, all jit/vmap/grad-safe with static shapes. Quaternions are
stored ``[w, x, y, z]`` (scalar first), matching the convention of the
reference implementation (``openfold/utils/rigid_utils.py`` in
jasonkyuyim/se3_diffusion). Unlike the reference, rotation-matrix ->
quaternion conversion is a branchless Shepperd select instead of
``torch.linalg.eigh`` (reference ``rigid_utils.py:208-227``), which is both
differentiable almost everywhere and orders of magnitude cheaper on TPU.

All small-angle limits are handled with Taylor blends guarded by the
"double-where" trick so gradients never see NaN.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Threshold matching reference `data/utils.py:582-599` small-angle branch.
_SMALL_ANGLE = 1e-3


def safe_norm(x: Array, axis: int = -1, keepdims: bool = False, eps: float = 1e-12) -> Array:
    """L2 norm with a non-NaN gradient at x = 0.

    jnp.linalg.norm's gradient at the zero vector is NaN; torch defines the
    subgradient there as 0 (which is the only reason the reference's loss —
    norms of masked-out scores, diagonal pairwise distances — trains at
    all). sqrt(sum + eps) gives finite gradients and |error| <= sqrt(eps).
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def quat_normalize(quat: Array, eps: float = 1e-12) -> Array:
    """Normalizes quaternions to unit norm."""
    norm = jnp.sqrt(jnp.sum(quat * quat, axis=-1, keepdims=True) + eps)
    return quat / norm


def quat_multiply(q1: Array, q2: Array) -> Array:
    """Hamilton product q1 (x) q2 for [..., 4] wxyz quaternions.

    Direct closed form (equivalent to the reference's `_QUAT_MULTIPLY` tensor
    contraction, `rigid_utils.py:230-260`, but VPU-friendly).
    """
    w1, x1, y1, z1 = jnp.split(q1, 4, axis=-1)
    w2, x2, y2, z2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_multiply_by_vec(quat: Array, vec: Array) -> Array:
    """Computes quat (x) (0, vec) for a [..., 3] pure-imaginary update.

    Matches reference `quat_multiply_by_vec` (`rigid_utils.py:263-270`).
    """
    w, x, y, z = jnp.split(quat, 4, axis=-1)
    vx, vy, vz = jnp.split(vec, 3, axis=-1)
    return jnp.concatenate(
        [
            -x * vx - y * vy - z * vz,
            w * vx + y * vz - z * vy,
            w * vy - x * vz + z * vx,
            w * vz + x * vy - y * vx,
        ],
        axis=-1,
    )


def quat_invert(quat: Array) -> Array:
    """Conjugate of a (unit) quaternion: rotation inverse."""
    return quat * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=quat.dtype)


def quat_to_rotmat(quat: Array) -> Array:
    """Converts [..., 4] wxyz quaternions to [..., 3, 3] rotation matrices.

    Uses the norm-invariant form (divides by |q|^2) so unnormalized
    quaternions still map to orthonormal matrices; with unit quats this
    coincides with the reference's homogeneous `quat_to_rot`
    (`rigid_utils.py:185-205`).
    """
    w, x, y, z = jnp.split(quat, 4, axis=-1)
    n = w * w + x * x + y * y + z * z + 1e-12
    s = 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    rows = [
        1.0 - (yy + zz), xy - wz, xz + wy,
        xy + wz, 1.0 - (xx + zz), yz - wx,
        xz - wy, yz + wx, 1.0 - (xx + yy),
    ]
    flat = jnp.stack([r[..., 0] for r in rows], axis=-1)
    return flat.reshape(flat.shape[:-1] + (3, 3))


def rotmat_to_quat(rot: Array) -> Array:
    """Branchless Shepperd rotation-matrix -> wxyz quaternion.

    Computes all four candidate quaternions (one per dominant diagonal
    element / trace) and selects the numerically best with `where`, so it is
    jittable and differentiable a.e. Replaces the reference's eigh-based
    `rot_to_quat` (`rigid_utils.py:208-227`).

    Returned quaternion has w >= 0.
    """
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidates, each valid when its pivot 1 + ... is largest.
    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    qw = jnp.stack(
        [tw, m21 - m12, m02 - m20, m10 - m01], axis=-1
    ) / (2.0 * _safe_sqrt(tw))[..., None]
    qx = jnp.stack(
        [m21 - m12, tx, m01 + m10, m02 + m20], axis=-1
    ) / (2.0 * _safe_sqrt(tx))[..., None]
    qy = jnp.stack(
        [m02 - m20, m01 + m10, ty, m12 + m21], axis=-1
    ) / (2.0 * _safe_sqrt(ty))[..., None]
    qz = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, tz], axis=-1
    ) / (2.0 * _safe_sqrt(tz))[..., None]

    pivots = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(pivots, axis=-1)[..., None]
    q = jnp.where(
        best == 0, qw, jnp.where(best == 1, qx, jnp.where(best == 2, qy, qz))
    )
    # Canonicalize sign: w >= 0.
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q * sign)


def quat_to_rotvec(quat: Array, eps: float = 1e-6) -> Array:
    """wxyz quaternion -> axis-angle rotation vector.

    Replicates the Taylor-blended scipy-style conversion of the reference
    (`data/utils.py:582-599`): sign-flip so w >= 0 (angle in [0, pi]),
    angle = 2 atan2(|v|, w), with a small-angle series for the scale.
    """
    flip = (quat[..., :1] < 0).astype(quat.dtype)
    quat = (-quat) * flip + (1.0 - flip) * quat

    im_norm = safe_norm(quat[..., 1:], axis=-1)
    angle = 2.0 * jnp.arctan2(im_norm, quat[..., 0])

    angle2 = angle * angle
    small_scale = 2.0 + angle2 / 12.0 + 7.0 * angle2 * angle2 / 2880.0
    # Double-where: keep sin() away from 0 in the branch not taken.
    is_small = angle <= _SMALL_ANGLE
    safe_angle = jnp.where(is_small, jnp.pi / 2, angle)
    large_scale = safe_angle / jnp.sin(safe_angle / 2.0 + eps)
    scale = jnp.where(is_small, small_scale, large_scale)
    return scale[..., None] * quat[..., 1:]


def rotvec_to_quat(rotvec: Array) -> Array:
    """Axis-angle rotation vector -> unit wxyz quaternion."""
    angle = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    half = angle / 2.0
    # sin(theta/2)/theta with Taylor for small theta.
    is_small = angle[..., 0] <= _SMALL_ANGLE
    safe_angle = jnp.where(is_small, 1.0, angle[..., 0])[..., None]
    sinc_half = jnp.where(
        is_small[..., None],
        0.5 - angle * angle / 48.0,
        jnp.sin(safe_angle / 2.0) / safe_angle,
    )
    w = jnp.cos(half)
    xyz = sinc_half * rotvec
    return jnp.concatenate([w, xyz], axis=-1)


def rotvec_to_rotmat(rotvec: Array) -> Array:
    """Rodrigues' formula, Taylor-safe at theta -> 0 (so3 Exp map)."""
    theta2 = jnp.sum(rotvec * rotvec, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-24)
    is_small = theta <= _SMALL_ANGLE
    safe_theta = jnp.where(is_small, 1.0, theta)
    # sin(t)/t and (1 - cos t)/t^2 with series fallbacks.
    a = jnp.where(is_small, 1.0 - theta2 / 6.0, jnp.sin(safe_theta) / safe_theta)
    b = jnp.where(
        is_small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_theta)) / (safe_theta**2)
    )
    kx, ky, kz = rotvec[..., 0], rotvec[..., 1], rotvec[..., 2]
    zero = jnp.zeros_like(kx)
    k = jnp.stack(
        [zero, -kz, ky, kz, zero, -kx, -ky, kx, zero], axis=-1
    ).reshape(rotvec.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * (k @ k)


def rotmat_to_rotvec(rot: Array) -> Array:
    """Rotation matrix -> axis-angle vector (so3 Log map)."""
    return quat_to_rotvec(rotmat_to_quat(rot))


def compose_rotvec(r1: Array, r2: Array) -> Array:
    """Composes rotation vectors: result = R(r1) @ R(r2) as a rotvec.

    Matches reference `data/utils.py:184-189` (right-multiplication).
    """
    q = quat_multiply(rotvec_to_quat(r1), rotvec_to_quat(r2))
    return quat_to_rotvec(q)


def rot_apply(rot: Array, pts: Array) -> Array:
    """Applies [..., 3, 3] rotation matrices to [..., 3] points."""
    return jnp.einsum("...ij,...j->...i", rot, pts)


def rot_invert_apply(rot: Array, pts: Array) -> Array:
    """Applies the inverse (transpose) rotation to [..., 3] points."""
    return jnp.einsum("...ji,...j->...i", rot, pts)
