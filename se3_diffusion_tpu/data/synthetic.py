"""Synthetic protein-backbone curriculum generator.

No PDB mmCIF archive is mounted in this environment, so production-scale
training runs use synthetic-but-protein-like backbones: ideal-geometry
(Engh & Huber) chains built by NERF from per-residue dihedrals drawn
from Ramachandran basins, organized into random secondary-structure
segments (helix / strand / loop), rejection-sampled toward compact,
clash-free folds (best-of-k on radius of gyration against the ~2.2 N^0.38
globular scaling law).

Output follows the processed-dataset contract of
`data/process_dataset.py` (reference `data/process_pdb_dataset.py:97-235`):
per-chain `.pkl` feature dicts + `metadata.csv` with the same columns, so
`PdbDataset` and the whole training stack consume it unchanged. The day
real mmCIFs appear, only the preprocessing input switches — see
`DATA_READINESS.md`.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np

# Ideal backbone geometry (Engh & Huber).
B_N_CA, B_CA_C, B_C_N, B_C_O = 1.458, 1.526, 1.329, 1.231
A_N_CA_C, A_CA_C_N, A_C_N_CA, A_CA_C_O = 111.2, 116.2, 121.7, 120.1

# (phi mean, psi mean, phi sd, psi sd) per basin.
BASINS = {
    "H": (-57.0, -47.0, 7.0, 7.0),  # alpha helix
    "E": (-120.0, 125.0, 15.0, 15.0),  # beta strand
    "L": None,  # loops: mixture, see _loop_dihedrals
}
LOOP_BASINS = (
    (-70.0, 140.0, 25.0, 25.0),  # PPII / bridge
    (-90.0, 0.0, 25.0, 25.0),  # alpha-ish turn
    (60.0, 40.0, 20.0, 20.0),  # left-handed
)


def _place(a, b, c, bond, angle_deg, torsion_deg):
    """NERF: position of the next atom bonded to c given chain a-b-c."""
    angle = np.deg2rad(angle_deg)
    torsion = np.deg2rad(torsion_deg)
    bc = c - b
    bc /= np.linalg.norm(bc)
    ab = b - a
    n = np.cross(ab, bc)
    n /= np.linalg.norm(n)
    m = np.cross(n, bc)
    d = bond * np.array(
        [
            -np.cos(angle),
            np.sin(angle) * np.cos(torsion),
            np.sin(angle) * np.sin(torsion),
        ]
    )
    return c + d[0] * bc + d[1] * m + d[2] * n


def build_backbone_from_dihedrals(
    phis: np.ndarray, psis: np.ndarray, omegas: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-residue (phi, psi[, omega]) -> atom37 [N,37,3] + mask [N,37]."""
    num_res = len(phis)
    if omegas is None:
        omegas = np.full(num_res, 180.0)
    n = np.array([0.0, 0.0, 0.0])
    ca = np.array([B_N_CA, 0.0, 0.0])
    c = _place(n + [0.0, 1.0, 0.0], n, ca, B_CA_C, A_N_CA_C, 0.0)

    atom37 = np.zeros((num_res, 37, 3), np.float32)
    mask = np.zeros((num_res, 37), np.float32)
    for i in range(num_res):
        o = _place(n, ca, c, B_C_O, A_CA_C_O, psis[i] + 180.0)
        atom37[i, 0], atom37[i, 1], atom37[i, 2], atom37[i, 4] = n, ca, c, o
        mask[i, [0, 1, 2, 4]] = 1.0
        if i < num_res - 1:
            n_next = _place(n, ca, c, B_C_N, A_CA_C_N, psis[i])
            ca_next = _place(ca, c, n_next, B_N_CA, A_C_N_CA, omegas[i])
            c_next = _place(c, n_next, ca_next, B_CA_C, A_N_CA_C, phis[i + 1])
            n, ca, c = n_next, ca_next, c_next
    return atom37, mask


# Default segment-type probabilities over (H, S, E, L); v3 curricula
# override these toward strand-rich mixes.
DEFAULT_SS_PROBS = (0.40, 0.18, 0.07, 0.35)


def _segment_plan(
    rng: np.random.RandomState,
    length: int,
    ss_probs: Tuple[float, ...] = DEFAULT_SS_PROBS,
    max_strands: int = 3,
) -> List[Tuple[str, int, Optional[int]]]:
    """Random secondary-structure segmentation covering `length` residues.

    "S" entries are paired beta sheets (hairpins up to `max_strands`-wide
    meanders) built as one rigid block by `sample_sheet_dihedrals`;
    isolated "E" strands never register as DSSP strand (no bridge
    partner), so real beta content comes from these blocks. Returns
    (ss, seg_len, n_strands-or-None) triples.
    """
    segs: List[Tuple[str, int, Optional[int]]] = []
    total = 0
    attempts = 0
    while total < length and attempts < 10 * length:
        attempts += 1
        ss = rng.choice(["H", "S", "E", "L"], p=list(ss_probs))
        extra: Optional[int] = None
        if ss == "H":
            sl = rng.randint(5, 16)
        elif ss == "S":
            # Geometric-ish taper over meander width: wider sheets are
            # rarer, like in the PDB.
            counts = list(range(2, max(2, max_strands) + 1))
            w = np.asarray([0.45 ** (k - 2) for k in counts])
            n_strands = int(rng.choice(counts, p=w / w.sum()))
            ns = rng.randint(4, 9)
            sl = n_strands * ns + 2 * (n_strands - 1)
            if sl > length - total:  # not enough room for a paired block
                continue
            extra = n_strands
        elif ss == "E":
            sl = rng.randint(3, 10)
        else:
            sl = rng.randint(2, 7)
        sl = min(sl, length - total)
        segs.append((ss, sl, extra))
        total += sl
    if total < length:  # pathological plan; pad with loop
        segs.append(("L", length - total, None))
    return segs


# Narrowed dihedral distributions found by clash/DSSP rejection search:
# strand (phi,psi) ~ N(-120,6)/N(121,6); turn residue 1 ~ (N(40,8),
# N(-110,12)), residue 2 ~ (N(-95,10), N(15,8)). ~19% of raw draws give a
# clash-free DSSP-detected hairpin, so block-level rejection is cheap.
def sample_sheet_dihedrals(
    rng: np.random.RandomState,
    block_len: int,
    n_strands: Optional[int] = None,
    max_tries: int = 30,
) -> Tuple[np.ndarray, np.ndarray, str]:
    """Dihedrals for an antiparallel sheet block of `block_len` residues.

    Rejection-samples until the standalone block is clash-free and
    DSSP-lite actually assigns strand state (H-bond registry formed).
    Returns (phis, psis, ss_chars) with 'E' on strands and 'T' on turns —
    'T' marks turn residues that must stay FIXED during compaction (a
    pivot inside the turn would break the strand pairing).

    `n_strands` selects hairpin (2) up to wider meanders; when None it is
    solved back from block_len (legacy v2 behavior).
    """
    from se3_diffusion_tpu.evaluation import secondary_structure as ss_lib

    if n_strands is None:
        n_strands = 3 if (block_len - 4) % 3 == 0 and block_len >= 16 else 2
    ns = (block_len - 2 * (n_strands - 1)) // n_strands
    rem = block_len - (n_strands * ns + 2 * (n_strands - 1))
    min_strand = 0.45 if n_strands != 3 else 0.5
    best = None
    best_frac = -1.0
    fallback = None  # least-clashed candidate: wide meanders can fail
    fallback_mind = -np.inf  # every clash check; never return None
    for _ in range(max_tries):
        phis: List[float] = []
        psis: List[float] = []
        chars: List[str] = []
        for k in range(n_strands):
            nk = ns + (rem if k == n_strands - 1 else 0)
            phis += list(rng.normal(-120.0, 6.0, nk))
            psis += list(rng.normal(121.0, 6.0, nk))
            chars += ["E"] * nk
            if k < n_strands - 1:
                phis += [rng.normal(40.0, 8.0), rng.normal(-95.0, 10.0)]
                psis += [rng.normal(-110.0, 12.0), rng.normal(15.0, 8.0)]
                chars += ["T", "T"]
        cand = (np.array(phis), np.array(psis), "".join(chars))
        a37, mask = build_backbone_from_dihedrals(cand[0], cand[1])
        mind = min_nonlocal_ca_dist(a37[:, 1])
        if mind > fallback_mind:
            fallback, fallback_mind = cand, mind
        if mind < 3.6:
            continue
        frac = ss_lib.ss_percentages(a37, mask)["strand_percent"]
        if frac > best_frac:
            best, best_frac = cand, frac
        if frac >= min_strand:
            break
    return best if best is not None else fallback


def _loop_dihedrals(rng, count):
    idx = rng.randint(len(LOOP_BASINS), size=count)
    out = np.zeros((count, 2))
    for i, j in enumerate(idx):
        pm, sm, psd, ssd = LOOP_BASINS[j]
        out[i] = (rng.normal(pm, psd), rng.normal(sm, ssd))
    return out


def sample_dihedrals(
    rng: np.random.RandomState,
    length: int,
    ss_probs: Tuple[float, ...] = DEFAULT_SS_PROBS,
    max_strands: int = 3,
    sheet_sampler=None,
):
    """Returns (phis, psis, ss_string) for one random fold topology.

    `sheet_sampler` overrides the paired-sheet block generator (same
    signature as `sample_sheet_dihedrals`); the batched generator passes
    a vectorized rejection sampler here.
    """
    if sheet_sampler is None:
        sheet_sampler = sample_sheet_dihedrals
    phis = np.zeros(length)
    psis = np.zeros(length)
    ss_chars = []
    pos = 0
    for ss, sl, extra in _segment_plan(rng, length, ss_probs, max_strands):
        if ss == "L":
            d = _loop_dihedrals(rng, sl)
            phis[pos : pos + sl] = d[:, 0]
            psis[pos : pos + sl] = d[:, 1]
            ss_chars.extend(ss * sl)
        elif ss == "S":
            sp, sps, chars = sheet_sampler(rng, sl, n_strands=extra)
            phis[pos : pos + sl] = sp
            psis[pos : pos + sl] = sps
            ss_chars.extend(chars)
        else:
            pm, sm, psd, ssd = BASINS[ss]
            phis[pos : pos + sl] = rng.normal(pm, psd, sl)
            psis[pos : pos + sl] = rng.normal(sm, ssd, sl)
            ss_chars.extend(ss * sl)
        pos += sl
    return phis, psis, "".join(ss_chars)


def radius_of_gyration(ca: np.ndarray) -> float:
    return float(np.sqrt(((ca - ca.mean(0)) ** 2).sum(-1).mean()))


def min_nonlocal_ca_dist(ca: np.ndarray, sep: int = 3) -> float:
    d = np.linalg.norm(ca[:, None] - ca[None, :], axis=-1)
    n = len(ca)
    iu = np.triu_indices(n, k=sep)
    return float(d[iu].min()) if len(iu[0]) else np.inf


def _rotate_about_axis(pts, origin, axis, angle):
    axis = axis / np.linalg.norm(axis)
    c, s = np.cos(angle), np.sin(angle)
    rel = pts - origin
    return (
        origin
        + rel * c
        + np.cross(axis, rel) * s
        + axis * (axis @ rel.T).T[:, None] * (1 - c)
    )


def compact_backbone(
    atom37: np.ndarray,
    mask: np.ndarray,
    rng: np.random.RandomState,
    target_rg: float,
    steps: int = 400,
    clash_dist: float = 3.2,
    fixed_ss: Optional[np.ndarray] = None,
    num_snapshots: int = 1,
) -> List[np.ndarray]:
    """Pivot-move Monte Carlo collapse toward a globular fold.

    One move perturbs a single residue's phi or psi, which rigidly rotates
    the downstream chain about the corresponding bond axis; moves that
    lower Rg are accepted (Metropolis on an annealed temperature), clashes
    always reject. `fixed_ss` (bool [N]) protects helix/strand interiors
    so compaction bends loops, like real folds do.
    """
    a = atom37.copy()
    n = a.shape[0]
    movable = (
        np.nonzero(~fixed_ss)[0] if fixed_ss is not None else np.arange(n)
    )
    if len(movable) == 0:
        return [a] * num_snapshots
    snap_at = {
        int(steps * (k + 1) / num_snapshots) - 1 for k in range(num_snapshots - 1)
    }
    snaps: List[np.ndarray] = []

    cols4 = np.array([0, 1, 2, 4])
    band = np.where(
        np.abs(np.subtract.outer(np.arange(n), np.arange(n))) < 3, np.inf, 0.0
    )

    def mind(ca):
        d2 = ((ca[:, None] - ca[None, :]) ** 2).sum(-1) + band
        return float(np.sqrt(d2.min()))

    rg = radius_of_gyration(a[:, 1])
    cur_min = mind(a[:, 1])
    for step in range(steps):
        if step in snap_at:
            snaps.append(a.copy())
        if rg <= target_rg:
            break
        temp = 0.5 * (1.0 - step / steps) + 0.02
        i = int(movable[rng.randint(len(movable))])
        use_phi = rng.rand() < 0.5 and i > 0
        delta = np.deg2rad(rng.normal(0.0, 30.0))
        if use_phi:
            origin, axis_end = a[i, 0], a[i, 1]  # N_i -> CA_i
            bond_pts = a[i, [2, 4]]  # C_i, O_i move downstream
            up_pts = a[i, [0]]
        else:
            origin, axis_end = a[i, 1], a[i, 2]  # CA_i -> C_i
            bond_pts = a[i, [4]]
            up_pts = a[i, [0, 1]]
        # Pivot the SHORTER side of the bond (rotating upstream by -delta
        # is geometrically equivalent up to a global rotation) — moving
        # less mass keeps the acceptance rate up in dense states.
        cand = a.copy()
        if i >= n - i:
            block = a[:i][:, cols4].reshape(-1, 3)
            pts = np.concatenate([up_pts, block], axis=0)
            moved = _rotate_about_axis(pts, origin, axis_end - origin, -delta)
            k = len(up_pts)
            if use_phi:
                cand[i, 0] = moved[0]
            else:
                cand[i, 0], cand[i, 1] = moved[0], moved[1]
            cand[:i][:, cols4] = moved[k:].reshape(i, 4, 3)
        else:
            block = a[i + 1 :][:, cols4].reshape(-1, 3)
            pts = np.concatenate([bond_pts, block], axis=0)
            moved = _rotate_about_axis(pts, origin, axis_end - origin, delta)
            k = len(bond_pts)
            if use_phi:
                cand[i, 2], cand[i, 4] = moved[0], moved[1]
            else:
                cand[i, 4] = moved[0]
            cand[i + 1 :][:, cols4] = moved[k:].reshape(n - i - 1, 4, 3)
        ca = cand[:, 1]
        # Never worsen the worst contact (allows starting from, and
        # escaping, clashing initial states).
        new_min = mind(ca)
        if new_min < min(clash_dist, cur_min):
            continue
        new_rg = radius_of_gyration(ca)
        if new_rg < rg or rng.rand() < np.exp(-(new_rg - rg) / temp):
            a, rg, cur_min = cand, new_rg, new_min
    while len(snaps) < num_snapshots:
        snaps.append(a.copy())
    snaps[-1] = a
    return snaps


def sample_structure(
    rng: np.random.RandomState,
    length: int,
    tries: int = 4,
    clash_dist: float = 3.2,
    compact_steps: Optional[int] = None,
    num_snapshots: int = 1,
    ss_probs: Tuple[float, ...] = DEFAULT_SS_PROBS,
    max_strands: int = 3,
):
    """Compact clash-free backbone(s) of `length` residues.

    Draws a random SS topology, then pivot-MC-collapses its loops toward
    the globular Rg scaling 2.2 * N^0.38. With num_snapshots > 1, returns
    several states along the collapse trajectory (same topology at
    different compactness — cheap data augmentation for the single-core
    preprocessing host).

    Returns (atom37, mask) if num_snapshots == 1, else (list[atom37], mask).
    """
    if compact_steps is None:
        compact_steps = 4 * length
    target_rg = 2.2 * length**0.38
    best = None
    best_rg = np.inf
    fallback = None  # least-clashed attempt, used if every try is rejected
    fallback_mind = -np.inf
    for _ in range(tries):
        phis, psis, ss = sample_dihedrals(rng, length, ss_probs, max_strands)
        atom37, mask = build_backbone_from_dihedrals(phis, psis)
        ss_arr = np.frombuffer(ss.encode(), dtype="S1")
        fixed = ss_arr != b"L"
        snaps = compact_backbone(
            atom37, mask, rng, target_rg,
            steps=compact_steps, clash_dist=clash_dist, fixed_ss=fixed,
            num_snapshots=max(num_snapshots, 1),
        )
        final = snaps[-1]
        mind = min_nonlocal_ca_dist(final[:, 1])
        if mind > fallback_mind:
            fallback, fallback_mind = (snaps, mask), mind
        if mind < 0.8 * clash_dist:
            continue  # still badly clashed after refinement
        rg = radius_of_gyration(final[:, 1])
        if rg < best_rg:
            best, best_rg = (snaps, mask), rg
        if best_rg <= target_rg * 1.15:
            break
    if best is None:
        # Every attempt kept a sub-threshold contact; ship the least-bad
        # fold rather than a degenerate all-helix rod.
        best = fallback
    snaps, mask = best
    if num_snapshots == 1:
        return snaps[-1], mask
    return snaps, mask


@dataclasses.dataclass
class CurriculumConfig:
    num_topologies: int = 400
    snapshots_per_topology: int = 3  # states along each collapse trajectory
    min_len: int = 60
    max_len: int = 256
    seed: int = 0
    # Segment-type probabilities over (H, S, E, L) and the widest sheet
    # meander; v3 strand-rich curricula raise S and max_strands.
    ss_probs: Tuple[float, ...] = DEFAULT_SS_PROBS
    max_strands: int = 3


def _sample_length(rng: np.random.RandomState, lo: int, hi: int) -> int:
    # Biased toward shorter chains (PDB-like) — and kinder to the
    # single-core preprocessing host (compaction is ~O(N^2) per step).
    return int(lo + (hi - lo) * rng.beta(1.2, 1.8))


def _make_one(args):
    i, cfg_tuple = args
    lo, hi, seed, num_snapshots, ss_probs, max_strands = cfg_tuple
    rng = np.random.RandomState(seed * 1_000_003 + i)
    length = _sample_length(rng, lo, hi)
    snaps, mask = sample_structure(
        rng,
        length,
        num_snapshots=num_snapshots,
        ss_probs=ss_probs,
        max_strands=max_strands,
    )
    if num_snapshots == 1:  # sample_structure unwraps singleton lists
        snaps = [snaps]
    return i, length, snaps, mask


def generate_dataset(
    out_dir: str,
    cfg: CurriculumConfig = CurriculumConfig(),
    num_processes: int = 1,
    log_every: int = 50,
) -> str:
    """Writes pkls + metadata.csv; returns the metadata path."""
    import multiprocessing as mp

    import pandas as pd

    from se3_diffusion_tpu.data import utils as du
    from se3_diffusion_tpu.evaluation import secondary_structure as ss_lib

    os.makedirs(out_dir, exist_ok=True)
    jobs = [
        (
            i,
            (
                cfg.min_len,
                cfg.max_len,
                cfg.seed,
                cfg.snapshots_per_topology,
                tuple(cfg.ss_probs),
                cfg.max_strands,
            ),
        )
        for i in range(cfg.num_topologies)
    ]
    rows = []

    def consume(result):
        i, length, snaps, mask = result
        for si, atom37 in enumerate(snaps):
            name = f"syn{i:05d}_{si}"
            pkl_path = os.path.join(out_dir, f"{name}.pkl")
            du.write_pkl(
                pkl_path,
                {
                    "atom_positions": atom37,
                    "atom_mask": mask,
                    "aatype": np.zeros(length, np.int32),  # poly-ALA
                    "residue_index": np.arange(length, dtype=np.int32),
                    "chain_index": np.zeros(length, np.int32),
                    "b_factors": np.zeros((length, 37), np.float32),
                },
            )
            ss = ss_lib.ss_percentages(atom37, mask)
            rows.append(
                {
                    "pdb_name": name,
                    # csv-relative: the dataset dir is relocatable as a
                    # unit (PdbDataset resolves against the csv location).
                    "processed_path": f"{name}.pkl",
                    "raw_path": "synthetic",
                    "resolution": 0.0,
                    "oligomeric_detail": "monomeric",
                    "seq_len": length,
                    "modeled_seq_len": length,
                    "helix_percent": ss["helix_percent"],
                    "strand_percent": ss["strand_percent"],
                    "coil_percent": ss["coil_percent"],
                    "radius_gyration": radius_of_gyration(atom37[:, 1]),
                }
            )
        if log_every and (i + 1) % log_every == 0:
            print(f"synthetic curriculum: {i + 1}/{cfg.num_topologies}",
                  flush=True)

    if num_processes > 1:
        with mp.Pool(num_processes) as pool:
            for result in pool.imap_unordered(_make_one, jobs):
                consume(result)
    else:
        for j in jobs:
            consume(_make_one(j))

    csv_path = os.path.join(out_dir, "metadata.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path
