"""atom37 <-> frames/torsions transforms (AF2 conventions), jittable.

Replaces the live subset of the reference's vendored
`openfold/data/data_transforms.py` (SURVEY.md section 2.3): backbone-frame
extraction (`atom37_to_frames` group 0, :755-891) and the psi torsion
(`atom37_to_torsion_angles`, :922-1087). Only what FrameDiff consumes is
computed — the backbone frame and psi — instead of all 8 rigid groups and
7 torsions; conventions are bit-matched:

* Backbone frame: Gram-Schmidt with ex = C - CA, ey = N - CA, origin CA.
  (AF2 builds from_3_points(C, CA, N) then composes the diag(-1,1,-1)
  flip; the two constructions are identical — with ideal alanine geometry
  this frame is the identity.)
* psi: dihedral frame from_3_points(CA, C, N); sin = z, cos = y of O in
  that frame, L2-normalized, then the (sin, cos) pair negated (AF2's
  pi-shift on psi, the [1,1,-1,...] multiplier).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from se3_diffusion_tpu.geometry.rigid import Rigid

Array = jax.Array

# atom37 slot indices (proteins.residue_constants.ATOM_ORDER).
N_IDX, CA_IDX, C_IDX, CB_IDX, O_IDX = 0, 1, 2, 3, 4


def backbone_frames_from_atom37(
    atom37: Array, atom37_mask: Array
) -> Tuple[Rigid, Array]:
    """Extracts per-residue backbone frames.

    Args:
        atom37: [..., N, 37, 3].
        atom37_mask: [..., N, 37].

    Returns:
        (frames [..., N], frame_mask [..., N]). frame_mask requires
        N, CA and C to be present.
    """
    n = atom37[..., N_IDX, :]
    ca = atom37[..., CA_IDX, :]
    c = atom37[..., C_IDX, :]
    # ex = C - CA, ey = N - CA: pass (2*CA - C) as the "negative x" point so
    # Rigid.from_3_points' e0 = origin - p_neg_x_axis = C - CA.
    frames = Rigid.from_3_points(2.0 * ca - c, ca, n)
    frame_mask = (
        atom37_mask[..., N_IDX] * atom37_mask[..., CA_IDX] * atom37_mask[..., C_IDX]
    )
    return frames, frame_mask


def psi_from_atom37(atom37: Array, atom37_mask: Array) -> Tuple[Array, Array]:
    """Computes the psi torsion as (sin, cos).

    Returns:
        (psi [..., N, 2], psi_mask [..., N]).
    """
    n = atom37[..., N_IDX, :]
    ca = atom37[..., CA_IDX, :]
    c = atom37[..., C_IDX, :]
    o = atom37[..., O_IDX, :]
    # Torsion frame: p_neg_x_axis = CA, origin = C, p_xy_plane = N.
    frame = Rigid.from_3_points(ca, c, n)
    o_local = frame.invert_apply(o)
    sin_cos = jnp.stack([o_local[..., 2], o_local[..., 1]], axis=-1)
    denom = jnp.sqrt(jnp.sum(sin_cos**2, axis=-1, keepdims=True) + 1e-8)
    psi = -(sin_cos / denom)  # AF2 pi-shift on psi
    psi_mask = (
        atom37_mask[..., N_IDX]
        * atom37_mask[..., CA_IDX]
        * atom37_mask[..., C_IDX]
        * atom37_mask[..., O_IDX]
    )
    return psi, psi_mask


def torsion_angles_from_atom37(
    atom37: Array, atom37_mask: Array
) -> Tuple[Array, Array]:
    """[..., N, 7, 2] torsion tensor in the reference layout.

    Only psi (index 2) is populated — the only torsion the FrameDiff loss
    and motif blending read (`train_se3_diffusion.py:621`,
    `score_network.py:201`).
    """
    psi, psi_mask = psi_from_atom37(atom37, atom37_mask)
    shape = psi.shape[:-1] + (7, 2)
    torsions = jnp.zeros(shape, dtype=atom37.dtype)
    torsions = torsions.at[..., 2, :].set(psi)
    mask = jnp.zeros(shape[:-1], dtype=atom37.dtype)
    mask = mask.at[..., 2].set(psi_mask)
    return torsions, mask


def chain_features_from_atom37(
    atom37: Array, atom37_mask: Array, center: bool = True
) -> dict:
    """Builds the clean-frame training features from raw atom37 coords.

    The pipeline equivalent of reference `du.parse_chain_feats`
    (CA-centering, `data/utils.py:436-445`) + `_process_csv_row`
    transforms (`pdb_data_loader.py:132-188`).
    """
    bb_mask = atom37_mask[..., CA_IDX]
    if center:
        ca = atom37[..., CA_IDX, :]
        com = jnp.sum(ca * bb_mask[..., None], axis=-2, keepdims=True) / (
            jnp.sum(bb_mask, axis=-1)[..., None, None] + 1e-5
        )
        atom37 = (atom37 - com[..., None, :, :]) * atom37_mask[..., None]
    frames, frame_mask = backbone_frames_from_atom37(atom37, atom37_mask)
    torsions, torsion_mask = torsion_angles_from_atom37(atom37, atom37_mask)
    return {
        "atom37": atom37,
        "rigids_0": frames.to_tensor_7(),
        "res_mask": bb_mask * frame_mask,
        "torsion_angles_sin_cos": torsions,
        "torsion_angles_mask": torsion_mask,
    }
