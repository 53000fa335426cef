"""Residue constants: canonical orderings and backbone geometry.

The standard AlphaFold2 atom37/restype conventions (public data from
Jumper et al. 2021; same orderings as reference
`data/residue_constants.py`), kept to the subset the framework needs:
orderings, name maps, and backbone geometry. Side-chain rigid-group tables
live with the idealized geometry in `proteins/backbone.py`.
"""
from __future__ import annotations

import functools

# 37 heavy-atom slots, fixed order.
ATOM_TYPES = (
    "N", "CA", "C", "CB", "O", "CG", "CG1", "CG2", "OG", "OG1", "SG", "CD",
    "CD1", "CD2", "ND1", "ND2", "OD1", "OD2", "SD", "CE", "CE1", "CE2",
    "CE3", "NE", "NE1", "NE2", "OE1", "OE2", "CH2", "NH1", "NH2", "OH",
    "CZ", "CZ2", "CZ3", "NZ", "OXT",
)
ATOM_ORDER = {name: i for i, name in enumerate(ATOM_TYPES)}
ATOM_TYPE_NUM = len(ATOM_TYPES)  # 37

# One-letter restypes in the canonical AF2 order; index = aatype integer.
RESTYPES = (
    "A", "R", "N", "D", "C", "Q", "E", "G", "H", "I", "L", "K", "M", "F",
    "P", "S", "T", "W", "Y", "V",
)
RESTYPE_NUM = len(RESTYPES)  # 20; 'X' (unknown) maps to index 20.
RESTYPE_ORDER = {r: i for i, r in enumerate(RESTYPES)}

RESTYPE_1TO3 = {
    "A": "ALA", "R": "ARG", "N": "ASN", "D": "ASP", "C": "CYS", "Q": "GLN",
    "E": "GLU", "G": "GLY", "H": "HIS", "I": "ILE", "L": "LEU", "K": "LYS",
    "M": "MET", "F": "PHE", "P": "PRO", "S": "SER", "T": "THR", "W": "TRP",
    "Y": "TYR", "V": "VAL",
}
RESTYPE_3TO1 = {v: k for k, v in RESTYPE_1TO3.items()}

RESNAMES = tuple(RESTYPE_1TO3[r] for r in RESTYPES) + ("UNK",)

# Canonical CA-CA virtual bond length used by geometry metrics.
CA_CA = 3.80209737096

# Chain identifiers for multi-chain PDB output.
CHAIN_IDS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"

# --------------------------------------------------------------------------
# atom14 representation + stereochemistry bounds (the AF2 structural-
# violation metrics operate on atom14; reference
# `openfold/np/residue_constants.py:548-600,1203-1264`).
# --------------------------------------------------------------------------

# Per-residue atom14 slot names ("" = unused slot). Canonical AF2 ordering.
RESTYPE_NAME_TO_ATOM14_NAMES = {
    "ALA": ("N", "CA", "C", "O", "CB", "", "", "", "", "", "", "", "", ""),
    "ARG": ("N", "CA", "C", "O", "CB", "CG", "CD", "NE", "CZ", "NH1", "NH2",
            "", "", ""),
    "ASN": ("N", "CA", "C", "O", "CB", "CG", "OD1", "ND2", "", "", "", "",
            "", ""),
    "ASP": ("N", "CA", "C", "O", "CB", "CG", "OD1", "OD2", "", "", "", "",
            "", ""),
    "CYS": ("N", "CA", "C", "O", "CB", "SG", "", "", "", "", "", "", "", ""),
    "GLN": ("N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "NE2", "", "", "",
            "", ""),
    "GLU": ("N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "OE2", "", "", "",
            "", ""),
    "GLY": ("N", "CA", "C", "O", "", "", "", "", "", "", "", "", "", ""),
    "HIS": ("N", "CA", "C", "O", "CB", "CG", "ND1", "CD2", "CE1", "NE2", "",
            "", "", ""),
    "ILE": ("N", "CA", "C", "O", "CB", "CG1", "CG2", "CD1", "", "", "", "",
            "", ""),
    "LEU": ("N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "", "", "", "",
            "", ""),
    "LYS": ("N", "CA", "C", "O", "CB", "CG", "CD", "CE", "NZ", "", "", "",
            "", ""),
    "MET": ("N", "CA", "C", "O", "CB", "CG", "SD", "CE", "", "", "", "", "",
            ""),
    "PHE": ("N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2",
            "CZ", "", "", ""),
    "PRO": ("N", "CA", "C", "O", "CB", "CG", "CD", "", "", "", "", "", "",
            ""),
    "SER": ("N", "CA", "C", "O", "CB", "OG", "", "", "", "", "", "", "", ""),
    "THR": ("N", "CA", "C", "O", "CB", "OG1", "CG2", "", "", "", "", "", "",
            ""),
    "TRP": ("N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "NE1", "CE2",
            "CE3", "CZ2", "CZ3", "CH2"),
    "TYR": ("N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2",
            "CZ", "OH", "", ""),
    "VAL": ("N", "CA", "C", "O", "CB", "CG1", "CG2", "", "", "", "", "", "",
            ""),
    "UNK": ("", "", "", "", "", "", "", "", "", "", "", "", "", ""),
}

# Van der Waals radii by element (first letter of the atom name).
VAN_DER_WAALS_RADIUS = {"C": 1.7, "N": 1.55, "O": 1.52, "S": 1.8}

# Peptide-bond geometry between consecutive residues: [general, to-proline]
# C-N lengths; cosine-space CA-C-N / C-N-CA angle means and stddevs.
BETWEEN_RES_BOND_LENGTH_C_N = (1.329, 1.341)
BETWEEN_RES_BOND_LENGTH_STDDEV_C_N = (0.014, 0.016)
BETWEEN_RES_COS_ANGLES_C_N_CA = (-0.5203, 0.0353)  # 121.352 +- 2.315 deg
BETWEEN_RES_COS_ANGLES_CA_C_N = (-0.4473, 0.0311)  # 116.568 +- 1.995 deg


def _virtual_bonds(resname):
    """Bond angles as atom1-atom3 'virtual bonds' via the law of cosines,
    with uncorrelated-error propagation (reference
    `residue_constants.py:500-541`)."""
    import numpy as np

    from se3_diffusion_tpu.proteins import stereo_chemistry as sc

    bond_by_key = {}
    for a1, a2, length, std in sc.RESIDUE_BONDS.get(resname, ()):
        bond_by_key["-".join(sorted((a1, a2)))] = (length, std)
    out = []
    for a1, a2, a3, ang_deg, std_deg in sc.RESIDUE_BOND_ANGLES.get(
        resname, ()
    ):
        gamma = np.deg2rad(ang_deg)
        std_gamma = np.deg2rad(std_deg)
        l1, s1 = bond_by_key["-".join(sorted((a1, a2)))]
        l2, s2 = bond_by_key["-".join(sorted((a2, a3)))]
        length = np.sqrt(l1**2 + l2**2 - 2 * l1 * l2 * np.cos(gamma))
        dl_outer = 0.5 / length
        dl_dgamma = 2 * l1 * l2 * np.sin(gamma) * dl_outer
        dl_db1 = (2 * l1 - 2 * l2 * np.cos(gamma)) * dl_outer
        dl_db2 = (2 * l2 - 2 * l1 * np.cos(gamma)) * dl_outer
        std = np.sqrt(
            (dl_dgamma * std_gamma) ** 2
            + (dl_db1 * s1) ** 2
            + (dl_db2 * s2) ** 2
        )
        out.append((a1, a3, float(length), float(std)))
    return out


@functools.lru_cache(maxsize=4)
def make_atom14_dists_bounds(
    overlap_tolerance: float = 1.5, bond_length_tolerance_factor: float = 15.0
):
    """[21, 14, 14] lower/upper distance bounds within each residue type.

    Non-bonded pairs: lower = r_vdw1 + r_vdw2 - overlap_tolerance, upper
    open; covalently bonded pairs and angle-constrained 1-3 pairs: literature
    length +- tolerance_factor * stddev. Matches reference
    `openfold/np/residue_constants.py:1203-1264` numerics.
    """
    import numpy as np

    from se3_diffusion_tpu.proteins import stereo_chemistry as sc

    lower = np.zeros((21, 14, 14), np.float32)
    upper = np.zeros((21, 14, 14), np.float32)
    stddev = np.zeros((21, 14, 14), np.float32)
    for restype, letter in enumerate(RESTYPES):
        resname = RESTYPE_1TO3[letter]
        atom_list = RESTYPE_NAME_TO_ATOM14_NAMES[resname]
        for i, name_i in enumerate(atom_list):
            if not name_i:
                continue
            r_i = VAN_DER_WAALS_RADIUS[name_i[0]]
            for j, name_j in enumerate(atom_list):
                if not name_j or i == j:
                    continue
                r_j = VAN_DER_WAALS_RADIUS[name_j[0]]
                lower[restype, i, j] = r_i + r_j - overlap_tolerance
                upper[restype, i, j] = 1e10
        bonds = list(sc.RESIDUE_BONDS.get(resname, ())) + _virtual_bonds(
            resname
        )
        for a1, a2, length, std in bonds:
            i, j = atom_list.index(a1), atom_list.index(a2)
            lo = length - bond_length_tolerance_factor * std
            hi = length + bond_length_tolerance_factor * std
            lower[restype, i, j] = lower[restype, j, i] = lo
            upper[restype, i, j] = upper[restype, j, i] = hi
            stddev[restype, i, j] = stddev[restype, j, i] = std
    out = {"lower_bound": lower, "upper_bound": upper, "stddev": stddev}
    for arr in out.values():  # lru_cached: freeze so callers can't poison
        arr.flags.writeable = False
    return out


@functools.lru_cache(maxsize=1)
def atom14_exists_and_radius():
    """([21, 14] existence mask, [21, 14] vdW radius) per restype."""
    import numpy as np

    exists = np.zeros((21, 14), np.float32)
    radius = np.zeros((21, 14), np.float32)
    for restype, letter in enumerate(RESTYPES):
        names = RESTYPE_NAME_TO_ATOM14_NAMES[RESTYPE_1TO3[letter]]
        for i, name in enumerate(names):
            if name:
                exists[restype, i] = 1.0
                radius[restype, i] = VAN_DER_WAALS_RADIUS[name[0]]
    return exists, radius
