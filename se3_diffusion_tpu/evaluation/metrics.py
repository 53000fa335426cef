"""Structure quality metrics (host-side numpy).

Equivalent of the reference `analysis/metrics.py`: CA-CA bond geometry,
CA clash counts, secondary-structure composition, radius of gyration,
Kabsch-aligned RMSD and TM-score. DSSP comes from the in-repo DSSP-lite
(mdtraj replacement); TM-score uses the native C++ extension when built
(`native/tmalign`), with a numpy fallback implementing the same
TM-score/superposition iteration.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from se3_diffusion_tpu.evaluation import secondary_structure as ss_lib
from se3_diffusion_tpu.evaluation import violations as violations_lib
from se3_diffusion_tpu.proteins import residue_constants as rc

CA_IDX = 1
# Reference thresholds (`analysis/metrics.py:120-132`).
CA_CA_TOL = 0.1
CLASH_DIST = 1.5


def kabsch_align(a: np.ndarray, b: np.ndarray):
    """Optimal rotation/translation of a onto b ([N,3] each).

    Returns (a_aligned, rmsd)."""
    ca, cb = a.mean(0), b.mean(0)
    a0, b0 = a - ca, b - cb
    h = a0.T @ b0
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    rot = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    a_aligned = a0 @ rot.T + cb
    rmsd = float(np.sqrt(((a_aligned - b) ** 2).sum(-1).mean()))
    return a_aligned, rmsd


def calc_aligned_rmsd(pos_1: np.ndarray, pos_2: np.ndarray) -> float:
    """Kabsch-aligned CA RMSD (reference `metrics.py:71-73`)."""
    return kabsch_align(pos_1, pos_2)[1]


def _tm_d0(n: int) -> float:
    # Zhang & Skolnick 2004 normalization length term.
    if n <= 21:
        return 0.5
    return 1.24 * (n - 15) ** (1.0 / 3.0) - 1.8


def tm_score_fixed_alignment(
    pos_1: np.ndarray, pos_2: np.ndarray, max_iters: int = 20
) -> float:
    """TM-score under the identity alignment with iterative superposition.

    The TM-score program's core loop (Zhang & Skolnick 2004): start from
    superpositions seeded on multiple fragments, iteratively re-superimpose
    on the subset of residues with distance < d0-based cutoff, keep the
    best score. This is the score used for self-consistency (sampled vs
    refolded structures share residue correspondence). The native C++
    implementation (`se3_diffusion_tpu.evaluation.tmalign`) is preferred
    when built; results agree to ~1e-3.
    """
    n = min(len(pos_1), len(pos_2))
    a, b = pos_1[:n].astype(np.float64), pos_2[:n].astype(np.float64)
    d0 = max(_tm_d0(n), 0.5)

    def score_from_subset(idx):
        if len(idx) < 3:
            return None
        ca, cb = a[idx].mean(0), b[idx].mean(0)
        h = (a[idx] - ca).T @ (b[idx] - cb)
        u, _, vt = np.linalg.svd(h)
        d = np.sign(np.linalg.det(vt.T @ u.T))
        rot = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
        a_all = (a - ca) @ rot.T + cb
        dist = np.sqrt(((a_all - b) ** 2).sum(-1))
        return float((1.0 / (1.0 + (dist / d0) ** 2)).mean()), dist

    best = 0.0
    seeds = []
    for frag in (n, n // 2, n // 4, 8):
        if frag >= 3:
            for start in range(0, n - frag + 1, max(frag // 2, 1)):
                seeds.append(np.arange(start, start + frag))
    for seed in seeds:
        idx = seed
        prev = -1.0
        for _ in range(max_iters):
            out = score_from_subset(idx)
            if out is None:
                break
            score, dist = out
            best = max(best, score)
            if abs(score - prev) < 1e-7:
                break
            prev = score
            cutoff = max(d0, 4.5)
            new_idx = np.nonzero(dist < cutoff)[0]
            if len(new_idx) < 3:
                break
            idx = new_idx
    return best


def calc_tm_score(
    pos_1: np.ndarray,
    pos_2: np.ndarray,
    seq_1: Optional[str] = None,
    seq_2: Optional[str] = None,
):
    """TM-score pair (normalized by each chain's length), mirroring the
    reference's tmtools contract (`metrics.py:44-46`)."""
    try:
        from se3_diffusion_tpu.evaluation import tmalign

        return tmalign.tm_score_pair(pos_1, pos_2)
    except (ImportError, OSError):
        s = tm_score_fixed_alignment(pos_1, pos_2)
        return s, s


def _tm_align_threading_fallback(pos_1: np.ndarray, pos_2: np.ndarray):
    """Pure-python stand-in for TM-align when the C++ extension can't build:
    gapless threading over all diagonal shifts, each scored with the
    TM-score superposition search on the overlap (normalized per chain).
    Handles shifts/truncations (the common decoy-clustering cases) but not
    internal insertions; the native `tmalign.tm_align_pair` does both.
    """
    n1, n2 = len(pos_1), len(pos_2)
    if n1 < 3 or n2 < 3:
        return 0.0, 0.0
    a = pos_1.astype(np.float64)
    b = pos_2.astype(np.float64)
    min_overlap = max(5, min(n1, n2) // 4)
    best1 = best2 = 0.0
    for shift in range(-(n2 - min_overlap), n1 - min_overlap + 1):
        i0, i1 = max(0, shift), min(n1, n2 + shift)
        length = i1 - i0
        if length < min_overlap:
            continue
        sub_a, sub_b = a[i0:i1], b[i0 - shift:i1 - shift]
        raw = tm_score_fixed_alignment(sub_a, sub_b, max_iters=5)
        # tm_score_fixed_alignment normalizes by the overlap length with the
        # overlap's d0; re-normalize the denominator to each chain's length
        # (approximate — the per-pair d0 stays the overlap's).
        best1 = max(best1, raw * length / n1)
        best2 = max(best2, raw * length / n2)
    return best1, best2


def calc_tm_align(pos_1: np.ndarray, pos_2: np.ndarray):
    """Sequence-independent TM-align scores (normalized by each chain's
    length) — the alignment-searching operation the reference's tmtools
    performs (`analysis/metrics.py:44-46`). Use this (not `calc_tm_score`)
    whenever the two chains do not share a residue correspondence, e.g.
    diversity clustering across lengths."""
    try:
        from se3_diffusion_tpu.evaluation import tmalign

        return tmalign.tm_align_pair(pos_1, pos_2)
    except (ImportError, OSError):
        return _tm_align_threading_fallback(pos_1, pos_2)


def ca_ca_metrics(ca_pos: np.ndarray, bond_tol: float = CA_CA_TOL) -> Dict:
    """Chain-bond deviation/validity + clash count
    (reference `metrics.py:120-132`)."""
    bond_dists = np.linalg.norm(ca_pos[:-1] - ca_pos[1:], axis=-1)
    valid = float((np.abs(bond_dists - rc.CA_CA) < bond_tol).mean())
    deviation = float(np.abs(bond_dists - rc.CA_CA).mean())
    pair = np.linalg.norm(ca_pos[:, None] - ca_pos[None, :], axis=-1)
    iu = np.triu_indices(len(ca_pos), k=2)
    clashes = int((pair[iu] < CLASH_DIST).sum())
    return {
        "ca_ca_deviation": deviation,
        "ca_ca_valid_percent": valid,
        "num_ca_clashes": clashes,
    }


def backbone_metrics(
    atom37: np.ndarray, atom37_mask: Optional[np.ndarray] = None
) -> Dict:
    """Full per-sample geometry report (the reference's
    `protein_metrics` without the external-tool paths,
    `metrics.py:75-118`)."""
    if atom37_mask is None:
        atom37_mask = np.any(atom37 != 0.0, axis=-1).astype(np.float32)
    ca = atom37[:, CA_IDX]
    out = ca_ca_metrics(ca)
    out.update(ss_lib.ss_percentages(atom37, atom37_mask))
    out["radius_gyration"] = ss_lib.radius_of_gyration(ca)
    out.update(af2_violation_metrics(atom37, atom37_mask))
    return out


# ALA atom14 slots (N, CA, C, O, CB) -> atom37 indices.
_ALA_ATOM14_TO_ATOM37 = (0, 1, 2, 4, 3)


def af2_violation_metrics(
    atom37: np.ndarray, atom37_mask: np.ndarray
) -> Dict:
    """The five AF2 structural-violation summary metrics for a generated
    (all-ALA) backbone — the reference computes the same columns in
    `protein_metrics` via `amber_minimize.get_violation_metrics`
    (`openfold/np/relax/amber_minimize.py:354-403`)."""
    n = atom37.shape[0]
    # Trimmed 5-slot atom14 (ALA's real atoms) in float32: the clash and
    # within-residue matrices are [N, N, W, W]; W=5 instead of 14 keeps
    # the temporaries ~8x smaller (N=500 drops from ~50s to ~1s).
    width = len(_ALA_ATOM14_TO_ATOM37)
    atom14 = np.zeros((n, width, 3), np.float32)
    exists = np.zeros((n, width), np.float32)
    for a14, a37 in enumerate(_ALA_ATOM14_TO_ATOM37):
        atom14[:, a14] = atom37[:, a37]
        exists[:, a14] = atom37_mask[:, a37]
    aatype = np.zeros(n, np.int64)  # ALA everywhere
    return violations_lib.compute_violation_metrics(
        atom14, aatype, atom14_exists=exists
    )


def diversity(
    ca_positions: list, tm_cutoff: float = 0.5
) -> Dict:
    """Diversity = distinct structural clusters / samples.

    The reference's second headline metric (README results table:
    "Diversity (TM cutoff 0.5)"): samples are single-linkage clustered at
    pairwise TM-score >= cutoff; diversity is num_clusters / num_samples.

    Pairwise similarity uses sequence-independent TM-align
    (`calc_tm_align`) — the reference computes these TMs with tmtools
    TM-align, which searches residue correspondences; the identity-
    alignment scTM score would systematically underestimate cross-length
    similarity and inflate cluster counts.

    TM-align returns one score per normalization length; for unequal
    chains the conventions disagree sharply (a short chain that matches a
    subsegment of a long one scores high normalized by the short length,
    low by the long). The published protocol's choice (MaxCluster) is not
    reproducible offline, so both extremes are reported:
      * diversity — links at max(tm_1, tm_2) >= cutoff (normalize by the
        SHORTER chain): the aggressive convention; substructure matches
        across lengths merge. The conservative headline.
      * diversity_strict — links at min(tm_1, tm_2) >= cutoff (normalize
        by the LONGER chain): cross-length merges require near-global
        similarity.
    The true MaxCluster number lies between. For same-length pairs the
    two coincide.

    Args:
        ca_positions: list of [N_i, 3] CA traces (lengths may differ).
    """
    n = len(ca_positions)
    if n == 0:
        return {"diversity": 0.0, "num_clusters": 0, "num_samples": 0}

    # TM-align is ~0.2 s/pair at production lengths and the C call releases
    # the GIL, so the O(n^2) pair sweep runs on a thread pool.
    from concurrent.futures import ThreadPoolExecutor

    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    with ThreadPoolExecutor(max_workers=min(16, os.cpu_count() or 1)) as ex:
        scores = list(
            ex.map(
                lambda ij: calc_tm_align(
                    ca_positions[ij[0]], ca_positions[ij[1]]
                ),
                pairs,
            )
        )

    def cluster(link):
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for (i, j), (tm_i, tm_j) in zip(pairs, scores):
            if link(tm_i, tm_j) >= tm_cutoff:
                parent[find(i)] = find(j)
        return len({find(i) for i in range(n)})

    clusters = cluster(max)
    clusters_strict = cluster(min)
    return {
        "diversity": clusters / n,
        "num_clusters": clusters,
        "diversity_strict": clusters_strict / n,
        "num_clusters_strict": clusters_strict,
        "num_samples": n,
    }


def protein_metrics(
    atom37: np.ndarray,
    atom37_mask: Optional[np.ndarray] = None,
    gt_ca_pos: Optional[np.ndarray] = None,
) -> Dict:
    """Full per-sample report: geometry + secondary structure + structural
    violations (+ TM to ground truth when given) — the combined surface of
    reference `protein_metrics` (`analysis/metrics.py:75-118`)."""
    from se3_diffusion_tpu.evaluation import violations as viol_lib

    out = backbone_metrics(atom37, atom37_mask)
    out.update(viol_lib.violation_metrics(atom37, atom37_mask))
    if gt_ca_pos is not None:
        tm, _ = calc_tm_score(atom37[:, CA_IDX], gt_ca_pos)
        out["tm_score"] = float(tm)
    return out


def self_consistency_metrics(
    sample_ca: np.ndarray, refold_ca: np.ndarray
) -> Dict:
    """scRMSD / scTM between a sampled backbone and its refolded
    prediction (reference `inference_se3_diffusion.py:387-403`)."""
    tm1, _ = calc_tm_score(refold_ca, sample_ca)
    return {
        "tm_score": float(tm1),
        "rmsd": calc_aligned_rmsd(refold_ca, sample_ca),
    }
