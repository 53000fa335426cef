"""Structural violation metrics (numpy, backbone-level).

Replaces the live slice of the reference's amber/violation path
(`openfold/np/relax/amber_minimize.py:354-403` ->
`openfold/utils/loss.py` `find_structural_violations_np` /
`between_residue_bond_loss` / `between_residue_clash_loss`), reduced to
the backbone chemistry FrameDiff actually generates: peptide C-N bond
length/angles between consecutive residues and non-bonded inter-residue
clashes, reported with the same tolerance conventions (12 sigma of the
literature stddevs, AF2's defaults).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

# Engh & Huber backbone geometry (mean, stddev).
C_N_LENGTH = (1.329, 0.014)
C_N_PROLINE_LENGTH = (1.341, 0.016)
CA_C_N_ANGLE = (2.028, 0.030)  # radians (116.2 deg)
C_N_CA_ANGLE = (2.124, 0.028)  # radians (121.7 deg)
TOLERANCE_SIGMA = 12.0
# Van-der-Waals radii for backbone elements.
VDW = {"N": 1.55, "C": 1.7, "O": 1.52}
CLASH_OVERLAP_TOL = 1.5


def _angle(a, b, c):
    """Angle at b for points a-b-c, [.., 3] arrays."""
    v1 = a - b
    v2 = c - b
    cos = (v1 * v2).sum(-1) / (
        np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1) + 1e-8
    )
    return np.arccos(np.clip(cos, -1.0, 1.0))


def between_residue_bond_violations(
    atom37: np.ndarray, res_mask: np.ndarray | None = None
) -> Dict[str, float]:
    """Peptide-bond length/angle violations between consecutive residues."""
    n_pos, ca_pos, c_pos = atom37[:, 0], atom37[:, 1], atom37[:, 2]
    if res_mask is None:
        res_mask = np.ones(atom37.shape[0])
    pair_mask = res_mask[:-1] * res_mask[1:]

    c_n = np.linalg.norm(c_pos[:-1] - n_pos[1:], axis=-1)
    mean, std = C_N_LENGTH
    bond_viol = (np.abs(c_n - mean) > TOLERANCE_SIGMA * std) * pair_mask

    ca_c_n = _angle(ca_pos[:-1], c_pos[:-1], n_pos[1:])
    c_n_ca = _angle(c_pos[:-1], n_pos[1:], ca_pos[1:])
    ang1_viol = (
        np.abs(ca_c_n - CA_C_N_ANGLE[0]) > TOLERANCE_SIGMA * CA_C_N_ANGLE[1]
    ) * pair_mask
    ang2_viol = (
        np.abs(c_n_ca - C_N_CA_ANGLE[0]) > TOLERANCE_SIGMA * C_N_CA_ANGLE[1]
    ) * pair_mask

    denom = pair_mask.sum() + 1e-8
    return {
        "c_n_mean_deviation": float((np.abs(c_n - mean) * pair_mask).sum() / denom),
        "bond_length_violations": float(bond_viol.sum() / denom),
        "bond_angle_violations": float(
            ((ang1_viol + ang2_viol) > 0).sum() / denom
        ),
    }


def between_residue_clash_violations(
    atom37: np.ndarray,
    atom37_mask: np.ndarray,
    res_mask: np.ndarray | None = None,
) -> Dict[str, float]:
    """Non-bonded inter-residue clashes over backbone atoms N/CA/C/O/CB."""
    slots = [0, 1, 2, 3, 4]
    elements = ["N", "C", "C", "C", "O"]
    n_res = atom37.shape[0]
    if res_mask is None:
        res_mask = np.ones(n_res)

    pos = atom37[:, slots].reshape(-1, 3)  # [N*5, 3]
    mask = (atom37_mask[:, slots] * res_mask[:, None]).reshape(-1)
    radii = np.tile(np.asarray([VDW[e] for e in elements]), n_res)
    res_ids = np.repeat(np.arange(n_res), len(slots))
    atom_ids = np.tile(np.arange(len(slots)), n_res)

    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    lower = radii[:, None] + radii[None, :] - CLASH_OVERLAP_TOL
    different_res = res_ids[:, None] != res_ids[None, :]
    # Exclude the bonded C(i) - N(i+1) peptide pair.
    peptide = (
        (res_ids[:, None] + 1 == res_ids[None, :])
        & (atom_ids[:, None] == 2)
        & (atom_ids[None, :] == 0)
    )
    peptide = peptide | peptide.T
    valid = (
        (mask[:, None] * mask[None, :] > 0)
        & different_res
        & ~peptide
        & (np.triu(np.ones_like(d), 1) > 0)
    )
    clashes = (d < lower) & valid
    return {
        "num_atom_clashes": int(clashes.sum()),
        "clash_fraction": float(clashes.sum() / (valid.sum() + 1e-8)),
    }


def violation_metrics(
    atom37: np.ndarray,
    atom37_mask: np.ndarray | None = None,
    res_mask: np.ndarray | None = None,
) -> Dict[str, float]:
    """Combined report (the reference's `compute_violation_metrics_np`
    equivalent for backbone output)."""
    if atom37_mask is None:
        atom37_mask = np.any(atom37 != 0.0, axis=-1).astype(np.float32)
    out = between_residue_bond_violations(atom37, res_mask)
    out.update(between_residue_clash_violations(atom37, atom37_mask, res_mask))
    return out
