"""Pure-numpy twin of `proteins/transforms.py` for the host data path.

The dataset featurizes examples on the host (unpickle -> frames/torsions
-> pad/collate); running those ops through jax would put dozens of tiny
dispatches per example on the *accelerator* backend — catastrophic when
the TPU sits behind a remote relay (observed: minutes per batch), and
wasteful even locally. The reference likewise featurizes in CPU
dataloader workers (`pdb_data_loader.py:132-188`).

Semantics are bit-matched to the jax implementations (same eps guards):
`backbone_frames_from_atom37` == Rigid.from_3_points + rotmat_to_quat,
`psi_from_atom37`, `chain_features_from_atom37`. Parity is pinned by
`tests/test_transforms.py::TestNumpyTwin`.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

# atom37 slot indices (proteins.residue_constants.ATOM_ORDER).
N_IDX, CA_IDX, C_IDX, CB_IDX, O_IDX = 0, 1, 2, 3, 4


def rotmat_to_quat_np(rot: np.ndarray) -> np.ndarray:
    """Branchless Shepperd rot->quat, numpy twin of
    `geometry/quat.rotmat_to_quat` (same pivot selection, w >= 0)."""
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _safe_sqrt(v):
        return np.sqrt(np.maximum(v, 1e-12))

    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    qw = np.stack([tw, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (
        2.0 * _safe_sqrt(tw)
    )[..., None]
    qx = np.stack([m21 - m12, tx, m01 + m10, m02 + m20], axis=-1) / (
        2.0 * _safe_sqrt(tx)
    )[..., None]
    qy = np.stack([m02 - m20, m01 + m10, ty, m12 + m21], axis=-1) / (
        2.0 * _safe_sqrt(ty)
    )[..., None]
    qz = np.stack([m10 - m01, m02 + m20, m12 + m21, tz], axis=-1) / (
        2.0 * _safe_sqrt(tz)
    )[..., None]

    pivots = np.stack([tw, tx, ty, tz], axis=-1)
    best = np.argmax(pivots, axis=-1)[..., None]
    q = np.where(
        best == 0, qw, np.where(best == 1, qx, np.where(best == 2, qy, qz))
    )
    q = q * np.where(q[..., :1] < 0, -1.0, 1.0)
    return q / np.sqrt(np.sum(q * q, axis=-1, keepdims=True) + 1e-12)


def frames_from_3_points_np(
    p_neg_x_axis: np.ndarray,
    origin: np.ndarray,
    p_xy_plane: np.ndarray,
    eps: float = 1e-8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Gram-Schmidt frame (AF2 alg. 21); returns (quat wxyz, trans)."""
    e0 = origin - p_neg_x_axis
    e1 = p_xy_plane - origin
    e0 = e0 / np.sqrt(np.sum(e0 * e0, axis=-1, keepdims=True) + eps)
    e1 = e1 - e0 * np.sum(e0 * e1, axis=-1, keepdims=True)
    e1 = e1 / np.sqrt(np.sum(e1 * e1, axis=-1, keepdims=True) + eps)
    e2 = np.cross(e0, e1)
    rot = np.stack([e0, e1, e2], axis=-1)  # columns are the basis
    return rotmat_to_quat_np(rot), origin


def backbone_frames_from_atom37_np(
    atom37: np.ndarray, atom37_mask: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(rigids_0 tensor_7 [..., N, 7], frame_mask [..., N])."""
    n = atom37[..., N_IDX, :]
    ca = atom37[..., CA_IDX, :]
    c = atom37[..., C_IDX, :]
    quat, trans = frames_from_3_points_np(2.0 * ca - c, ca, n)
    frame_mask = (
        atom37_mask[..., N_IDX]
        * atom37_mask[..., CA_IDX]
        * atom37_mask[..., C_IDX]
    )
    return np.concatenate([quat, trans], axis=-1), frame_mask


def _invert_apply_np(quat: np.ndarray, trans: np.ndarray, pts: np.ndarray):
    """R^T (p - t) for wxyz quats, numpy."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    # Rotation matrix from quaternion (same formula as quat_to_rotmat).
    rot = np.stack(
        [
            np.stack(
                [
                    1 - 2 * (y * y + z * z),
                    2 * (x * y - w * z),
                    2 * (x * z + w * y),
                ],
                axis=-1,
            ),
            np.stack(
                [
                    2 * (x * y + w * z),
                    1 - 2 * (x * x + z * z),
                    2 * (y * z - w * x),
                ],
                axis=-1,
            ),
            np.stack(
                [
                    2 * (x * z - w * y),
                    2 * (y * z + w * x),
                    1 - 2 * (x * x + y * y),
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    d = pts - trans
    return np.einsum("...ji,...j->...i", rot, d)


def psi_from_atom37_np(
    atom37: np.ndarray, atom37_mask: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(psi sin/cos [..., N, 2], psi_mask [..., N])."""
    n = atom37[..., N_IDX, :]
    ca = atom37[..., CA_IDX, :]
    c = atom37[..., C_IDX, :]
    o = atom37[..., O_IDX, :]
    quat, trans = frames_from_3_points_np(ca, c, n)
    o_local = _invert_apply_np(quat, trans, o)
    sin_cos = np.stack([o_local[..., 2], o_local[..., 1]], axis=-1)
    denom = np.sqrt(np.sum(sin_cos**2, axis=-1, keepdims=True) + 1e-8)
    psi = -(sin_cos / denom)  # AF2 pi-shift on psi
    psi_mask = (
        atom37_mask[..., N_IDX]
        * atom37_mask[..., CA_IDX]
        * atom37_mask[..., C_IDX]
        * atom37_mask[..., O_IDX]
    )
    return psi, psi_mask


def chain_features_from_atom37_np(
    atom37: np.ndarray, atom37_mask: np.ndarray, center: bool = True
) -> dict:
    """Numpy twin of `transforms.chain_features_from_atom37`."""
    atom37 = np.asarray(atom37, np.float32)
    atom37_mask = np.asarray(atom37_mask, np.float32)
    bb_mask = atom37_mask[..., CA_IDX]
    if center:
        ca = atom37[..., CA_IDX, :]
        com = np.sum(ca * bb_mask[..., None], axis=-2, keepdims=True) / (
            np.sum(bb_mask, axis=-1)[..., None, None] + 1e-5
        )
        atom37 = (atom37 - com[..., None, :, :]) * atom37_mask[..., None]
    rigids_0, frame_mask = backbone_frames_from_atom37_np(atom37, atom37_mask)
    psi, psi_mask = psi_from_atom37_np(atom37, atom37_mask)
    shape = psi.shape[:-1] + (7, 2)
    torsions = np.zeros(shape, atom37.dtype)
    torsions[..., 2, :] = psi
    torsion_mask = np.zeros(shape[:-1], atom37.dtype)
    torsion_mask[..., 2] = psi_mask
    return {
        "atom37": atom37,
        "rigids_0": rigids_0.astype(np.float32),
        "res_mask": bb_mask * frame_mask,
        "torsion_angles_sin_cos": torsions.astype(np.float32),
        "torsion_angles_mask": torsion_mask,
    }
