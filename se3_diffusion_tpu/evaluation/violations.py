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

from se3_diffusion_tpu.proteins import residue_constants as rc

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


# ==========================================================================
# Full AF2 atom14 violation suite (numpy), matching the reference's
# `openfold/utils/loss.py:712-1217` (`between_residue_bond_loss`,
# `between_residue_clash_loss`, `within_residue_violations`,
# `find_structural_violations`, `compute_violation_metrics`) numerics —
# including AF2's quirk of using the C-N bond-length stddev for the
# CA-C-N cosine-angle tolerance.
# ==========================================================================


def _masked_mean(mask: np.ndarray, value: np.ndarray, eps: float = 1e-4):
    # eps=1e-4 matches reference `openfold/utils/tensor_utils.py:32`.
    return (mask * value).sum(-1) / (eps + mask.sum(-1))


def af2_between_residue_bond_loss(
    atom14_pos: np.ndarray,  # [N, 14, 3]
    atom14_mask: np.ndarray,  # [N, 14]
    residue_index: np.ndarray,  # [N]
    aatype: np.ndarray,  # [N]
    tolerance_factor_soft: float = 12.0,
    tolerance_factor_hard: float = 12.0,
    eps: float = 1e-6,
) -> Dict[str, np.ndarray]:
    """Peptide-bond geometry flat-bottom losses (AF2 suppl. eq 44-45)."""
    this_ca, this_c = atom14_pos[:-1, 1], atom14_pos[:-1, 2]
    next_n, next_ca = atom14_pos[1:, 0], atom14_pos[1:, 1]
    this_ca_m, this_c_m = atom14_mask[:-1, 1], atom14_mask[:-1, 2]
    next_n_m, next_ca_m = atom14_mask[1:, 0], atom14_mask[1:, 1]
    no_gap = (residue_index[1:] - residue_index[:-1] == 1.0).astype(
        atom14_pos.dtype
    )

    c_n = np.sqrt(eps + ((this_c - next_n) ** 2).sum(-1))
    next_is_pro = aatype[1:] == rc.RESTYPES.index("P")
    gt_len = np.where(
        next_is_pro,
        rc.BETWEEN_RES_BOND_LENGTH_C_N[1],
        rc.BETWEEN_RES_BOND_LENGTH_C_N[0],
    )
    gt_std = np.where(
        next_is_pro,
        rc.BETWEEN_RES_BOND_LENGTH_STDDEV_C_N[1],
        rc.BETWEEN_RES_BOND_LENGTH_STDDEV_C_N[0],
    )
    c_n_err = np.sqrt(eps + (c_n - gt_len) ** 2)
    c_n_loss_per = np.maximum(c_n_err - tolerance_factor_soft * gt_std, 0.0)
    mask = this_c_m * next_n_m * no_gap
    c_n_loss = (mask * c_n_loss_per).sum(-1) / (mask.sum(-1) + eps)
    c_n_viol = mask * (c_n_err > tolerance_factor_hard * gt_std)

    ca_c = np.sqrt(eps + ((this_ca - this_c) ** 2).sum(-1))
    n_ca = np.sqrt(eps + ((next_n - next_ca) ** 2).sum(-1))
    c_ca_unit = (this_ca - this_c) / ca_c[..., None]
    c_n_unit = (next_n - this_c) / c_n[..., None]
    n_ca_unit = (next_ca - next_n) / n_ca[..., None]

    ca_c_n_cos = (c_ca_unit * c_n_unit).sum(-1)
    gt_angle = rc.BETWEEN_RES_COS_ANGLES_CA_C_N[0]
    # AF2 quirk preserved: the C-N bond-length stddev gates this angle.
    gt_std = rc.BETWEEN_RES_BOND_LENGTH_STDDEV_C_N[0]
    ca_c_n_err = np.sqrt(eps + (ca_c_n_cos - gt_angle) ** 2)
    ca_c_n_loss_per = np.maximum(
        ca_c_n_err - tolerance_factor_soft * gt_std, 0.0
    )
    mask = this_ca_m * this_c_m * next_n_m * no_gap
    ca_c_n_loss = (mask * ca_c_n_loss_per).sum(-1) / (mask.sum(-1) + eps)
    ca_c_n_viol = mask * (ca_c_n_err > tolerance_factor_hard * gt_std)

    c_n_ca_cos = (-c_n_unit * n_ca_unit).sum(-1)
    gt_angle, gt_std = rc.BETWEEN_RES_COS_ANGLES_C_N_CA
    c_n_ca_err = np.sqrt(eps + (c_n_ca_cos - gt_angle) ** 2)
    c_n_ca_loss_per = np.maximum(
        c_n_ca_err - tolerance_factor_soft * gt_std, 0.0
    )
    mask = this_c_m * next_n_m * next_ca_m * no_gap
    c_n_ca_loss = (mask * c_n_ca_loss_per).sum(-1) / (mask.sum(-1) + eps)
    c_n_ca_viol = mask * (c_n_ca_err > tolerance_factor_hard * gt_std)

    per_res = c_n_loss_per + ca_c_n_loss_per + c_n_ca_loss_per
    per_res = 0.5 * (
        np.pad(per_res, (0, 1)) + np.pad(per_res, (1, 0))
    )
    viol = np.max(np.stack([c_n_viol, ca_c_n_viol, c_n_ca_viol], -2), -2)
    viol = np.maximum(np.pad(viol, (0, 1)), np.pad(viol, (1, 0)))
    return {
        "c_n_loss_mean": c_n_loss,
        "ca_c_n_loss_mean": ca_c_n_loss,
        "c_n_ca_loss_mean": c_n_ca_loss,
        "per_residue_loss_sum": per_res,
        "per_residue_violation_mask": viol,
    }


def af2_between_residue_clash_loss(
    atom14_pos: np.ndarray,  # [N, 14, 3]
    atom14_exists: np.ndarray,  # [N, 14]
    atom14_radius: np.ndarray,  # [N, 14]
    residue_index: np.ndarray,  # [N]
    overlap_tolerance_soft: float = 1.5,
    overlap_tolerance_hard: float = 1.5,
    eps: float = 1e-10,
) -> Dict[str, np.ndarray]:
    """Non-bonded inter-residue clash losses (AF2 suppl. eq 46, between)."""
    dists = np.sqrt(
        eps
        + (
            (
                atom14_pos[:, None, :, None, :]
                - atom14_pos[None, :, None, :, :]
            )
            ** 2
        ).sum(-1)
    )
    dists_mask = (
        atom14_exists[:, None, :, None] * atom14_exists[None, :, None, :]
    )
    dists_mask = dists_mask * (
        residue_index[:, None, None, None] < residue_index[None, :, None, None]
    )
    # Peptide C(i)-N(i+1) is bonded, not a clash.
    neighbour = (
        residue_index[:, None, None, None] + 1
        == residue_index[None, :, None, None]
    )
    width = atom14_pos.shape[1]  # 14, or fewer when slots are trimmed
    c_slot = np.zeros(width)
    c_slot[2] = 1.0
    n_slot = np.zeros(width)
    n_slot[0] = 1.0
    dists_mask = dists_mask * (
        1.0 - neighbour * c_slot[None, None, :, None] * n_slot[None, None, None, :]
    )
    # Disulfide SG(CYS)-SG(CYS) is bonded, not a clash. AF2 applies the
    # SG-slot exemption unconditionally on the slot index (slot 5).
    sg_idx = rc.RESTYPE_NAME_TO_ATOM14_NAMES["CYS"].index("SG")
    if sg_idx < width:
        sg = np.zeros(width)
        sg[sg_idx] = 1.0
        dists_mask = dists_mask * (
            1.0 - sg[None, None, :, None] * sg[None, None, None, :]
        )

    lower = dists_mask * (
        atom14_radius[:, None, :, None] + atom14_radius[None, :, None, :]
    )
    low_err = dists_mask * np.maximum(
        lower - overlap_tolerance_soft - dists, 0.0
    )
    mean_loss = low_err.sum() / (1e-6 + dists_mask.sum())
    per_atom_loss_sum = low_err.sum((0, 2)) + low_err.sum((1, 3))
    clash_mask = dists_mask * (dists < lower - overlap_tolerance_hard)
    per_atom_clash = np.maximum(
        clash_mask.max((0, 2)), clash_mask.max((1, 3))
    )
    return {
        "mean_loss": mean_loss,
        "per_atom_loss_sum": per_atom_loss_sum,
        "per_atom_clash_mask": per_atom_clash,
    }


def af2_within_residue_violations(
    atom14_pos: np.ndarray,  # [N, 14, 3]
    atom14_exists: np.ndarray,  # [N, 14]
    lower_bound: np.ndarray,  # [N, 14, 14]
    upper_bound: np.ndarray,  # [N, 14, 14]
    tighten_bounds_for_loss: float = 0.0,
    eps: float = 1e-10,
) -> Dict[str, np.ndarray]:
    """Within-residue bond/angle/clash bounds (AF2 suppl. eq 46, within)."""
    masks = (1.0 - np.eye(atom14_pos.shape[1]))[None]
    masks = atom14_exists[:, :, None] * atom14_exists[:, None, :] * masks
    dists = np.sqrt(
        eps
        + ((atom14_pos[:, :, None, :] - atom14_pos[:, None, :, :]) ** 2).sum(
            -1
        )
    )
    low_err = np.maximum(lower_bound + tighten_bounds_for_loss - dists, 0.0)
    high_err = np.maximum(
        dists - (upper_bound - tighten_bounds_for_loss), 0.0
    )
    loss = masks * (low_err + high_err)
    per_atom_loss_sum = loss.sum(-2) + loss.sum(-1)
    violations = masks * (
        (dists < lower_bound) | (dists > upper_bound)
    )
    per_atom_violations = np.maximum(violations.max(-2), violations.max(-1))
    return {
        "per_atom_loss_sum": per_atom_loss_sum,
        "per_atom_violations": per_atom_violations,
    }


def find_structural_violations(
    atom14_pos: np.ndarray,  # [N, 14, 3]
    aatype: np.ndarray,  # [N] int
    residue_index: np.ndarray | None = None,  # [N]
    atom14_exists: np.ndarray | None = None,  # [N, 14]
    violation_tolerance_factor: float = 12.0,
    clash_overlap_tolerance: float = 1.5,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Full AF2 violation report (reference `loss.py:1105-1216` output
    contract: between_residues / within_residues / total mask)."""
    n, width = atom14_pos.shape[0], atom14_pos.shape[1]
    aatype = np.asarray(aatype, np.int64)
    if residue_index is None:
        residue_index = np.arange(n, dtype=np.float64)
    exists_table, radius_table = rc.atom14_exists_and_radius()
    if atom14_exists is None:
        atom14_exists = exists_table[aatype][:, :width]
    atom14_radius = atom14_exists * radius_table[aatype][:, :width]

    connection = af2_between_residue_bond_loss(
        atom14_pos,
        atom14_exists,
        residue_index,
        aatype,
        tolerance_factor_soft=violation_tolerance_factor,
        tolerance_factor_hard=violation_tolerance_factor,
    )
    clashes = af2_between_residue_clash_loss(
        atom14_pos,
        atom14_exists,
        atom14_radius,
        residue_index,
        overlap_tolerance_soft=clash_overlap_tolerance,
        overlap_tolerance_hard=clash_overlap_tolerance,
    )
    bounds = rc.make_atom14_dists_bounds(
        overlap_tolerance=clash_overlap_tolerance,
        bond_length_tolerance_factor=violation_tolerance_factor,
    )
    within = af2_within_residue_violations(
        atom14_pos,
        atom14_exists,
        bounds["lower_bound"][aatype][:, :width, :width],
        bounds["upper_bound"][aatype][:, :width, :width],
        tighten_bounds_for_loss=0.0,
    )
    total_mask = np.max(
        np.stack(
            [
                connection["per_residue_violation_mask"],
                clashes["per_atom_clash_mask"].max(-1),
                within["per_atom_violations"].max(-1),
            ],
            -1,
        ),
        -1,
    )
    return {
        "between_residues": {
            "bonds_c_n_loss_mean": connection["c_n_loss_mean"],
            "angles_ca_c_n_loss_mean": connection["ca_c_n_loss_mean"],
            "angles_c_n_ca_loss_mean": connection["c_n_ca_loss_mean"],
            "connections_per_residue_loss_sum": connection[
                "per_residue_loss_sum"
            ],
            "connections_per_residue_violation_mask": connection[
                "per_residue_violation_mask"
            ],
            "clashes_mean_loss": clashes["mean_loss"],
            "clashes_per_atom_loss_sum": clashes["per_atom_loss_sum"],
            "clashes_per_atom_clash_mask": clashes["per_atom_clash_mask"],
        },
        "within_residues": {
            "per_atom_loss_sum": within["per_atom_loss_sum"],
            "per_atom_violations": within["per_atom_violations"],
        },
        "total_per_residue_violations_mask": total_mask,
    }


def extreme_ca_ca_distance_violations(
    atom14_pos: np.ndarray,
    atom14_mask: np.ndarray,
    residue_index: np.ndarray,
    max_angstrom_tolerance: float = 1.5,
    eps: float = 1e-6,
) -> float:
    """Fraction of consecutive CA-CA pairs >tolerance from the ideal
    (reference `loss.py:1235-1284`)."""
    this_ca, next_ca = atom14_pos[:-1, 1], atom14_pos[1:, 1]
    mask = (
        atom14_mask[:-1, 1]
        * atom14_mask[1:, 1]
        * (residue_index[1:] - residue_index[:-1] == 1.0)
    )
    d = np.sqrt(eps + ((this_ca - next_ca) ** 2).sum(-1))
    violations = (d - rc.CA_CA) > max_angstrom_tolerance
    return float(_masked_mean(mask, violations))


def compute_violation_metrics(
    atom14_pos: np.ndarray,  # [N, 14, 3]
    aatype: np.ndarray,  # [N]
    residue_index: np.ndarray | None = None,
    seq_mask: np.ndarray | None = None,
    atom14_exists: np.ndarray | None = None,
    violations: Dict | None = None,
) -> Dict[str, float]:
    """The five AF2 summary metrics (reference `loss.py:1272-1316`),
    prefixed `violations_` for metrics.csv columns."""
    n = atom14_pos.shape[0]
    aatype = np.asarray(aatype, np.int64)
    if residue_index is None:
        residue_index = np.arange(n, dtype=np.float64)
    if seq_mask is None:
        seq_mask = np.ones(n)
    if atom14_exists is None:
        atom14_exists = rc.atom14_exists_and_radius()[0][aatype]
        atom14_exists = atom14_exists[:, : atom14_pos.shape[1]]
    if violations is None:
        violations = find_structural_violations(
            atom14_pos, aatype, residue_index, atom14_exists
        )
    between = violations["between_residues"]
    within = violations["within_residues"]
    return {
        "violations_extreme_ca_ca_distance": extreme_ca_ca_distance_violations(
            atom14_pos, atom14_exists, residue_index
        ),
        "violations_between_residue_bond": float(
            _masked_mean(
                seq_mask, between["connections_per_residue_violation_mask"]
            )
        ),
        "violations_between_residue_clash": float(
            _masked_mean(
                seq_mask, between["clashes_per_atom_clash_mask"].max(-1)
            )
        ),
        "violations_within_residue": float(
            _masked_mean(seq_mask, within["per_atom_violations"].max(-1))
        ),
        "violations_per_residue": float(
            _masked_mean(
                seq_mask, violations["total_per_residue_violations_mask"]
            )
        ),
    }
