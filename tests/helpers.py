"""Test helpers: ideal-geometry backbone builder (NERF) for synthetic data."""
import numpy as np

# Ideal backbone geometry (Engh & Huber).
B_N_CA, B_CA_C, B_C_N, B_C_O = 1.458, 1.526, 1.329, 1.231
A_N_CA_C, A_CA_C_N, A_C_N_CA, A_CA_C_O = 111.2, 116.2, 121.7, 120.1


def _place(a, b, c, bond, angle_deg, torsion_deg):
    """NERF: position of atom d bonded to c, given chain a-b-c."""
    angle = np.deg2rad(angle_deg)
    torsion = np.deg2rad(torsion_deg)
    bc = c - b
    bc /= np.linalg.norm(bc)
    ab = b - a
    n = np.cross(ab, bc)
    n /= np.linalg.norm(n)
    m = np.cross(n, bc)
    d_local = bond * np.array(
        [
            -np.cos(angle),
            np.sin(angle) * np.cos(torsion),
            np.sin(angle) * np.sin(torsion),
        ]
    )
    return c + d_local[0] * bc + d_local[1] * m + d_local[2] * n


def build_backbone(num_res: int, phi: float = -57.0, psi: float = -47.0,
                   omega: float = 180.0):
    """Builds an ideal (phi, psi) backbone; returns atom37 [N,37,3] + mask.

    Defaults produce an alpha helix; (-120, 120) an extended strand.
    """
    n = np.array([0.0, 0.0, 0.0])
    ca = np.array([B_N_CA, 0.0, 0.0])
    c = _place(n + [0, 1, 0], n, ca, B_CA_C, A_N_CA_C, 0.0)

    atoms = []  # (N, CA, C, O) per residue
    for i in range(num_res):
        o_tors = psi + 180.0
        n_next = _place(n, ca, c, B_C_N, A_CA_C_N, psi)
        o = _place(n, ca, c, B_C_O, A_CA_C_O, o_tors)
        atoms.append((n, ca, c, o))
        if i < num_res - 1:
            ca_next = _place(ca, c, n_next, B_N_CA, A_C_N_CA, omega)
            c_next = _place(c, n_next, ca_next, B_CA_C, A_N_CA_C, phi)
            n, ca, c = n_next, ca_next, c_next

    atom37 = np.zeros((num_res, 37, 3), np.float32)
    mask = np.zeros((num_res, 37), np.float32)
    for i, (nn, cca, cc, oo) in enumerate(atoms):
        atom37[i, 0], atom37[i, 1], atom37[i, 2], atom37[i, 4] = nn, cca, cc, oo
        mask[i, [0, 1, 2, 4]] = 1.0
    return atom37, mask


MMCIF_HEADER = """data_TEST
_entry.id TEST
_refine.ls_d_res_high 2.0
_pdbx_struct_assembly.oligomeric_details monomeric
_pdbx_struct_assembly.oligomeric_count 1
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.B_iso_or_equiv
_atom_site.label_alt_id
_atom_site.pdbx_PDB_model_num
"""


def to_mmcif(atom37: np.ndarray, mask: np.ndarray, chain: str = "A") -> str:
    """Serializes a backbone into a minimal-but-valid mmCIF string."""
    names = {0: "N", 1: "CA", 2: "C", 4: "O"}
    lines = [MMCIF_HEADER]
    serial = 1
    for i in range(atom37.shape[0]):
        for a, nm in names.items():
            if mask[i, a] < 0.5:
                continue
            x, y, z = atom37[i, a]
            lines.append(
                f"ATOM {serial} {nm} ALA {chain} {i + 1} "
                f"{x:.3f} {y:.3f} {z:.3f} 10.0 . 1\n"
            )
            serial += 1
    lines.append("#\n")
    return "".join(lines)
