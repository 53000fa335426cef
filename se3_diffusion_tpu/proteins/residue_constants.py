"""Residue constants: canonical orderings and backbone geometry.

The standard AlphaFold2 atom37/restype conventions (public data from
Jumper et al. 2021; same orderings as reference
`data/residue_constants.py`), kept to the subset the framework needs:
orderings, name maps, and backbone geometry. Side-chain rigid-group tables
live with the idealized geometry in `proteins/backbone.py`.
"""
from __future__ import annotations

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
