"""DSSP-lite: Kabsch-Sander secondary structure assignment in numpy.

The reference shells out to mdtraj's C DSSP for helix/strand/coil
percentages (`process_pdb_dataset.py:200-229`, `analysis/metrics.py:55-69`);
mdtraj is not available here, so this implements the Kabsch-Sander
hydrogen-bond energy model directly:

    E = 0.084 * 332 * (1/d_ON + 1/d_CH - 1/d_OH - 1/d_CN)  [kcal/mol]

with the standard H placement (1 A from N along the previous residue's
C->O direction... more precisely opposite the C=O bond), a -0.5 kcal/mol
bond threshold, alpha-helix from consecutive 4-turns and beta-strand from
parallel/antiparallel bridges. This is the simplified ("lite") reduction
to the 3-state H/E/C alphabet; it tracks DSSP closely on regular
secondary structure, which is what the dataset filters and eval metrics
consume.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

_Q1Q2_F = 0.084 * 332.0
_HBOND_CUTOFF = -0.5
_MIN_DIST = 0.5


def kabsch_sander_hbonds(
    n: np.ndarray,
    ca: np.ndarray,
    c: np.ndarray,
    o: np.ndarray,
    mask: np.ndarray,
) -> np.ndarray:
    """Returns [N, N] bool: hb[i, j] = True if CO(i) accepts an H-bond
    from NH(j) (Kabsch-Sander energy < -0.5)."""
    num = n.shape[0]
    # Amide H on residue j from the previous residue's C=O direction.
    h = n.copy()
    co = c[:-1] - o[:-1]
    co /= np.linalg.norm(co, axis=-1, keepdims=True) + 1e-8
    h[1:] = n[1:] + co
    has_h = mask.copy()
    has_h[0] = 0  # no amide H on the N-terminus (no previous residue)

    def dist(a, b):
        d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
        return np.maximum(d, _MIN_DIST)

    d_on = dist(o, n)
    d_ch = dist(c, h)
    d_oh = dist(o, h)
    d_cn = dist(c, n)
    energy = _Q1Q2_F * (1.0 / d_on + 1.0 / d_ch - 1.0 / d_oh - 1.0 / d_cn)

    valid = (mask[:, None] * has_h[None, :]) > 0
    # No bonds to self or sequence neighbors.
    idx = np.arange(num)
    near = np.abs(idx[:, None] - idx[None, :]) < 2
    return (energy < _HBOND_CUTOFF) & valid & ~near


def assign_secondary_structure(
    atom37: np.ndarray, atom37_mask: np.ndarray
) -> np.ndarray:
    """3-state assignment from atom37 coordinates.

    Args:
        atom37: [N, 37, 3]; uses N(0), CA(1), C(2), O(4).

    Returns:
        [N] array of 'H' / 'E' / 'C' characters.
    """
    n_res = atom37.shape[0]
    bb_mask = (
        atom37_mask[:, 0] * atom37_mask[:, 1] * atom37_mask[:, 2] * atom37_mask[:, 4]
    )
    ss = np.full(n_res, "C", dtype="<U1")
    if n_res < 5 or bb_mask.sum() < 5:
        return ss
    hb = kabsch_sander_hbonds(
        atom37[:, 0], atom37[:, 1], atom37[:, 2], atom37[:, 4], bb_mask
    )

    # n-turn at i: CO(i) -- HN(i+n).
    def turn(nn):
        t = np.zeros(n_res, dtype=bool)
        t[: n_res - nn] = hb[np.arange(n_res - nn), np.arange(nn, n_res)]
        return t

    t4 = turn(4)
    helix = np.zeros(n_res, dtype=bool)
    # Two consecutive 4-turns make residues i+1..i+4 helical.
    for i in range(1, n_res - 4):
        if t4[i - 1] and t4[i]:
            helix[i : i + 4] = True

    # Bridges (beta).
    strand = np.zeros(n_res, dtype=bool)
    i_idx, j_idx = np.nonzero(hb)
    hb_set = set(zip(i_idx.tolist(), j_idx.tolist()))

    def has(i, j):
        return 0 <= i < n_res and 0 <= j < n_res and (i, j) in hb_set

    for i in range(1, n_res - 1):
        for j in range(i + 3, n_res - 1):
            parallel = (has(i - 1, j) and has(j, i + 1)) or (
                has(j - 1, i) and has(i, j + 1)
            )
            antiparallel = (has(i, j) and has(j, i)) or (
                has(i - 1, j + 1) and has(j - 1, i + 1)
            )
            if parallel or antiparallel:
                strand[i] = strand[j] = True

    ss[strand] = "E"
    ss[helix] = "H"  # helix wins ties, as in DSSP's priority ordering
    return ss


def ss_percentages(atom37: np.ndarray, atom37_mask: np.ndarray) -> dict:
    """helix/strand/coil fractions (the metadata.csv columns)."""
    ss = assign_secondary_structure(atom37, atom37_mask)
    n = max(len(ss), 1)
    return {
        "helix_percent": float((ss == "H").sum()) / n,
        "strand_percent": float((ss == "E").sum()) / n,
        "coil_percent": float((ss == "C").sum()) / n,
    }


def radius_of_gyration(
    coords: np.ndarray, mask: np.ndarray | None = None
) -> float:
    """Mass-uniform radius of gyration over the given coordinates."""
    if mask is not None:
        coords = coords[mask > 0.5]
    center = coords.mean(axis=0)
    return float(np.sqrt(((coords - center) ** 2).sum(-1).mean()))
