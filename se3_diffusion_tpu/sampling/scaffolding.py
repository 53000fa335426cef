"""Motif scaffolding: contig-spec parsing + conditional sampling setup.

The reference carries an RFdiffusion-style contig parser
(`experiments/utils.py:54-111` `get_sampled_mask`) and motif machinery in
its diffuser/sampler (fixed_mask / diffuse_mask / imputation,
`se3_diffuser.py:216-268`). This module provides the same capability,
restructured: a small grammar parser producing a typed `Scaffold`
(segments of sampled-scaffold runs and motif runs referencing a source
structure), plus the feature assembly that feeds `sample_fn` — which
already supports fixed masks natively.

Contig grammar (one chain):  "5-15,A10-25,30-40"
    n or n-m        scaffold segment of fixed/sampled length
    <chain><i>-<j>  motif segment copied from the source structure's
                    chain <chain>, residues i..j (inclusive, PDB numbering)
"""
from __future__ import annotations

import dataclasses
import re
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from se3_diffusion_tpu.geometry.rigid import Rigid
from se3_diffusion_tpu.proteins import protein as protein_lib
from se3_diffusion_tpu.proteins import transforms

_MOTIF_RE = re.compile(r"^([A-Za-z])(\d+)-(\d+)$")
_RANGE_RE = re.compile(r"^(\d+)(?:-(\d+))?$")


@dataclasses.dataclass(frozen=True)
class Segment:
    length: int
    is_motif: bool
    chain: Optional[str] = None
    start: Optional[int] = None  # source residue numbering (inclusive)


@dataclasses.dataclass(frozen=True)
class Scaffold:
    segments: Tuple[Segment, ...]

    @property
    def total_length(self) -> int:
        return sum(s.length for s in self.segments)

    @property
    def fixed_mask(self) -> np.ndarray:
        mask = np.zeros(self.total_length, np.float32)
        pos = 0
        for seg in self.segments:
            if seg.is_motif:
                mask[pos : pos + seg.length] = 1.0
            pos += seg.length
        return mask


def sample_contig(
    contig: str,
    rng: np.random.RandomState,
    length_range: Optional[Tuple[int, int]] = None,
    num_tries: int = 10000,
) -> Scaffold:
    """Samples concrete segment lengths from a contig spec.

    Matches the reference parser's semantics (`experiments/utils.py:54-111`)
    for single-chain contigs: scaffold ranges are sampled uniformly, motif
    segments are fixed, and sampling retries until the total length falls
    inside `length_range` (exclusive upper bound).
    """
    for _ in range(num_tries):
        segments: List[Segment] = []
        for token in contig.strip().split(","):
            m = _MOTIF_RE.match(token)
            if m:
                chain, i, j = m.group(1), int(m.group(2)), int(m.group(3))
                segments.append(
                    Segment(length=j - i + 1, is_motif=True, chain=chain, start=i)
                )
                continue
            r = _RANGE_RE.match(token)
            if not r:
                raise ValueError(f"Bad contig token {token!r}")
            lo = int(r.group(1))
            hi = int(r.group(2)) if r.group(2) else lo
            segments.append(
                Segment(length=int(rng.randint(lo, hi + 1)), is_motif=False)
            )
        scaffold = Scaffold(tuple(segments))
        total = scaffold.total_length
        if length_range is None or (length_range[0] <= total < length_range[1]):
            return scaffold
    raise ValueError(f"Contig {contig!r} incompatible with length {length_range}")


def scaffold_features(
    scaffold: Scaffold, motif_protein: Optional[protein_lib.Protein] = None
):
    """Builds sampler inputs for a scaffolded design.

    Returns dict with fixed_mask [N], motif rigids_0 tensor_7 [N, 7]
    (identity where scaffolded), torsion_angles_sin_cos [N, 7, 2], and
    res_mask — ready to batch into `sample_fn` / `SE3Diffuser.sample_ref`
    imputation.
    """
    n = scaffold.total_length
    fixed_mask = scaffold.fixed_mask
    rigids_0 = np.zeros((n, 7), np.float32)
    rigids_0[:, 0] = 1.0
    torsions = np.zeros((n, 7, 2), np.float32)

    if motif_protein is not None:
        by_chain = {}
        for idx in range(motif_protein.aatype.shape[0]):
            cid = protein_lib.rc.CHAIN_IDS[int(motif_protein.chain_index[idx])]
            by_chain.setdefault(cid, {})[
                int(motif_protein.residue_index[idx])
            ] = idx
        atom37 = jnp.asarray(motif_protein.atom_positions)
        mask37 = jnp.asarray(motif_protein.atom_mask)
        frames, _ = transforms.backbone_frames_from_atom37(atom37, mask37)
        psi7, _ = transforms.torsion_angles_from_atom37(atom37, mask37)
        frames_t7 = np.asarray(frames.to_tensor_7())
        psi7 = np.asarray(psi7)

        pos = 0
        for seg in scaffold.segments:
            if seg.is_motif:
                rows = [
                    by_chain.get(seg.chain, {}).get(seg.start + k)
                    for k in range(seg.length)
                ]
                if any(r is None for r in rows):
                    raise ValueError(
                        f"Motif segment {seg} not found in source structure"
                    )
                rigids_0[pos : pos + seg.length] = frames_t7[rows]
                torsions[pos : pos + seg.length] = psi7[rows]
            pos += seg.length
        # Center motif translations so imputed coordinates sit near origin.
        if fixed_mask.sum() > 0:
            com = (rigids_0[:, 4:] * fixed_mask[:, None]).sum(0) / fixed_mask.sum()
            rigids_0[:, 4:] -= com * fixed_mask[:, None]

    return {
        "fixed_mask": fixed_mask,
        "rigids_0": rigids_0,
        "torsion_angles_sin_cos": torsions,
        "res_mask": np.ones(n, np.float32),
    }


def sample_scaffolded(
    key: jax.Array,
    model,
    params,
    diffuser,
    scaffold: Scaffold,
    motif_protein: Optional[protein_lib.Protein] = None,
    num_t: int = 500,
    min_t: float = 0.01,
    noise_scale: float = 0.1,
):
    """Runs conditional sampling: motif frames fixed, scaffold diffused."""
    from se3_diffusion_tpu.sampling.sampler import sample_fn

    feats = scaffold_features(scaffold, motif_protein)
    n = scaffold.total_length
    fixed_mask = jnp.asarray(feats["fixed_mask"])[None]
    res_mask = jnp.asarray(feats["res_mask"])[None]
    impute = Rigid.from_tensor_7(jnp.asarray(feats["rigids_0"]))
    key_init, key_scan = jax.random.split(key)
    ref = diffuser.sample_ref(
        key_init, n, impute=impute, diffuse_mask=1.0 - feats["fixed_mask"]
    )["rigids_t"]
    return sample_fn(
        params,
        diffuser,
        key_scan,
        ref.to_tensor_7()[None],
        res_mask,
        fixed_mask,
        jnp.asarray(feats["torsion_angles_sin_cos"])[None],
        model=model,
        num_t=num_t,
        min_t=min_t,
        noise_scale=noise_scale,
    )
