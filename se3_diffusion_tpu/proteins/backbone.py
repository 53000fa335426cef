"""Backbone frames -> atom coordinates (idealized geometry).

Equivalent of the reference's `data/all_atom.py:152-174` `compute_backbone`
restricted to what FrameDiff actually uses: every residue is treated as
alanine (aatype=0), so the only live rigid groups are the backbone group
(N, CA, C, CB) and the psi group (O). Instead of running the full
8-frame AF2 torsion machinery for two groups, the psi frame is composed
directly — same math, ~4x less work.

Geometry constants are the published AlphaFold2 idealized alanine
coordinates (Jumper et al. 2021 supplement); the psi-group default frame
below is derived from them with the AF2 Gram-Schmidt convention
(ex = C - CA, ey = CA - N, origin = C):
    R_psi = [[1,0,0],[0,-1,0],[0,0,-1]],  t_psi = (1.526, 0, 0).

atom14 ordering (backbone slice): [N, CA, C, O, CB];
atom37 ordering: [N, CA, C, CB, O] (slots 0-4).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from se3_diffusion_tpu.geometry.rigid import Rigid

Array = jax.Array

# Idealized alanine geometry, backbone-frame coordinates (Angstroms).
N_LOCAL = (-0.525, 1.363, 0.000)
CA_LOCAL = (0.000, 0.000, 0.000)
C_LOCAL = (1.526, 0.000, 0.000)
CB_LOCAL = (-0.529, -0.774, -1.205)
# O in the psi-group frame.
O_PSI_LOCAL = (0.627, 1.062, 0.000)
# psi-group default frame relative to the backbone frame (see module doc).
PSI_ROT = ((1.0, 0.0, 0.0), (0.0, -1.0, 0.0), (0.0, 0.0, -1.0))
PSI_TRANS = (1.526, 0.0, 0.0)

# Canonical CA-CA distance used by metrics (reference
# `data/residue_constants.py` `ca_ca`).
CA_CA = 3.80209737096


def compute_backbone(
    bb_rigids: Rigid, psi: Array
) -> Tuple[Array, Array, Array]:
    """Places idealized backbone atoms from frames + psi torsions.

    Args:
        bb_rigids: [..., N] backbone frames (translations in Angstroms).
        psi: [..., N, 2] (sin, cos) of the psi torsion (normalized).

    Returns:
        atom37: [..., N, 37, 3] with slots 0-4 = N, CA, C, CB, O.
        atom37_mask: [..., N, 37] (nonzero-position convention, matching
            reference `all_atom.py:173`).
        atom14: [..., N, 14, 3] with slots 0-4 = N, CA, C, O, CB.
    """
    dtype = bb_rigids.trans.dtype
    batch = bb_rigids.shape

    bb_local = jnp.asarray([N_LOCAL, CA_LOCAL, C_LOCAL, CB_LOCAL], dtype=dtype)
    # [..., N, 4, 3] global backbone-group atoms.
    bb_atoms = bb_rigids[..., None].apply(
        jnp.broadcast_to(bb_local, batch + (4, 3))
    )

    # psi frame = bb_frame o psi_default o rot_x(psi).
    sin_psi, cos_psi = psi[..., 0], psi[..., 1]
    zeros = jnp.zeros_like(sin_psi)
    ones = jnp.ones_like(sin_psi)
    # AF2 torsion rotation convention (`all_atom.py:53-67` in the
    # reference): rows [[1,0,0],[0,cos,-sin],[0,sin,cos]].
    rot_x = jnp.stack(
        [
            ones, zeros, zeros,
            zeros, cos_psi, -sin_psi,
            zeros, sin_psi, cos_psi,
        ],
        axis=-1,
    ).reshape(batch + (3, 3))
    psi_rot = jnp.asarray(PSI_ROT, dtype=dtype)
    frame_rot = jnp.einsum("ij,...jk->...ik", psi_rot, rot_x)
    o_local = jnp.einsum(
        "...ij,j->...i", frame_rot, jnp.asarray(O_PSI_LOCAL, dtype=dtype)
    ) + jnp.asarray(PSI_TRANS, dtype=dtype)
    o_global = bb_rigids.apply(o_local)  # [..., N, 3]

    atom37 = jnp.zeros(batch + (37, 3), dtype=dtype)
    atom37 = atom37.at[..., 0, :].set(bb_atoms[..., 0, :])  # N
    atom37 = atom37.at[..., 1, :].set(bb_atoms[..., 1, :])  # CA
    atom37 = atom37.at[..., 2, :].set(bb_atoms[..., 2, :])  # C
    atom37 = atom37.at[..., 3, :].set(bb_atoms[..., 3, :])  # CB
    atom37 = atom37.at[..., 4, :].set(o_global)  # O
    atom37_mask = jnp.any(atom37 != 0.0, axis=-1).astype(dtype)

    atom14 = jnp.zeros(batch + (14, 3), dtype=dtype)
    atom14 = atom14.at[..., 0, :].set(bb_atoms[..., 0, :])
    atom14 = atom14.at[..., 1, :].set(bb_atoms[..., 1, :])
    atom14 = atom14.at[..., 2, :].set(bb_atoms[..., 2, :])
    atom14 = atom14.at[..., 3, :].set(o_global)
    atom14 = atom14.at[..., 4, :].set(bb_atoms[..., 3, :])
    return atom37, atom37_mask, atom14
