"""Inference orchestration: length sweep, trajectory output, self-consistency.

Equivalent of the reference `experiments/inference_se3_diffusion.py`
`Sampler` (:63-459): iterate lengths x samples with directory-based
resumability, write sample/bb_traj/x0_traj PDBs, then (optionally) run the
self-consistency pipeline — sequence design -> folding -> scTM/scRMSD ->
sc_results.csv.

Sequence design and folding are pluggable callables so the pipeline runs
with the in-repo JAX ProteinMPNN (`models/protein_mpnn.py`) and any
folding backend (a served ESMFold, a local JAX port, or a mock in tests);
the reference hard-wires subprocess ProteinMPNN + fair-esm ESMFold.
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np
import pandas as pd

from se3_diffusion_tpu.config import Config
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.evaluation import metrics as metrics_lib
from se3_diffusion_tpu.models.score_network import ScoreNetwork
from se3_diffusion_tpu.proteins import protein, residue_constants as rc
from se3_diffusion_tpu.sampling.sampler import sample_backbones

logger = logging.getLogger(__name__)

# (atom37 [N,37,3], num_seqs, rng_seed) -> list of sequences.
SequenceDesigner = Callable[[np.ndarray, int, int], List[str]]
# (sequence) -> atom37 [N,37,3] predicted structure.
Folder = Callable[[str], np.ndarray]


@dataclasses.dataclass
class InferenceRunner:
    cfg: Config
    model: ScoreNetwork
    params: object
    diffuser: SE3Diffuser
    sequence_designer: Optional[SequenceDesigner] = None
    folder: Optional[Folder] = None

    def run_sampling(
        self, lengths: Optional[Sequence[int]] = None, output_dir: Optional[str] = None
    ) -> pd.DataFrame:
        """Length sweep with per-directory resumability (reference
        `run_sampling`, :193-234).

        Alongside the per-sample rows, the run's two headline metrics
        (reference README results table) are computed over ALL samples in
        `output_dir` — including ones restored from a previous resumed run —
        and written to `summary.json`: diversity (TM-cutoff clustering) and,
        when the self-consistency legs are wired, the designable fraction.
        The summary is also attached as `df.attrs["summary"]`.
        """
        inf = self.cfg.inference
        samples_cfg = inf.samples
        output_dir = output_dir or inf.output_dir
        if lengths is None:
            lengths = range(
                samples_cfg.min_length,
                samples_cfg.max_length + 1,
                samples_cfg.length_step,
            )
        rows = []
        ca_traces = []
        designable: List[bool] = []
        for length in lengths:
            length_dir = os.path.join(output_dir, f"length_{length}")
            os.makedirs(length_dir, exist_ok=True)
            for i in range(samples_cfg.samples_per_length):
                sample_dir = os.path.join(length_dir, f"sample_{i}")
                if os.path.isdir(sample_dir):
                    logger.info("Skipping existing %s", sample_dir)
                    restored = self._restore_sample(sample_dir, length, i)
                    if restored is not None:
                        row, ca, dsgn = restored
                        rows.append(row)
                        ca_traces.append(ca)
                        if dsgn is not None:
                            designable.append(dsgn)
                    continue
                os.makedirs(sample_dir, exist_ok=True)
                row, atom37 = self.sample_one(length, i, sample_dir)
                rows.append(row)
                ca_traces.append(atom37[:, 1])
                if "designable" in row:
                    designable.append(bool(row["designable"]))
        df = pd.DataFrame(rows)
        if len(df):
            # Persist the per-sample table next to summary.json so a sweep
            # is self-describing on disk (reference collects the same rows
            # only in memory).
            df.to_csv(os.path.join(output_dir, "metrics.csv"), index=False)
        summary = dict(metrics_lib.diversity(ca_traces))
        # Same-length-bucket diversity alongside the global number: the
        # global clustering pairs chains of different lengths (needs the
        # TM-align correspondence search, `metrics.calc_tm_align`); the
        # per-bucket values are the conservative view and what to compare
        # across runs whose length grids differ.
        if len(df) and "length" in df.columns:
            per_len = {}
            for length in sorted(df["length"].unique()):
                idx = [k for k, r in enumerate(rows) if r["length"] == length]
                if len(idx) >= 2:
                    per_len[str(int(length))] = metrics_lib.diversity(
                        [ca_traces[k] for k in idx]
                    )["diversity"]
            if per_len:
                summary["diversity_by_length"] = per_len
        if designable:
            summary["designable_fraction"] = float(np.mean(designable))
        import json

        with open(os.path.join(output_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        logger.info("Sweep summary: %s", summary)
        df.attrs["summary"] = summary
        return df

    @staticmethod
    def _restore_sample(sample_dir: str, length: int, index: int):
        """Recovers (row, ca_trace, designable-or-None) from a completed
        sample dir. Backbone metrics are recomputed from the persisted PDB
        so a resumed sweep writes a metrics.csv covering EVERY sample in
        output_dir, not just the freshly-generated ones."""
        path = os.path.join(sample_dir, "sample_1.pdb")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            prot = protein.from_pdb_string(f.read())
        atom37 = prot.atom_positions
        ca = atom37[:, 1]
        row = {"length": length, "sample": index, "sample_path": path}
        for name in ("bb_traj", "x0_traj"):
            p = os.path.join(sample_dir, f"{name}_1.pdb")
            if os.path.exists(p):
                row[f"{name}_path"] = p
        row.update(metrics_lib.backbone_metrics(atom37))
        sc_path = os.path.join(sample_dir, "self_consistency", "sc_results.csv")
        dsgn = None
        if os.path.exists(sc_path):
            sc = pd.read_csv(sc_path)
            if len(sc):
                row["sc_rmsd_min"] = float(sc.rmsd.min())
                row["sc_tm_max"] = float(sc.tm_score.max())
                dsgn = bool(sc.rmsd.min() < 2.0)
                row["designable"] = dsgn
                if "motif_rmsd" in sc:
                    row["sc_motif_rmsd_min"] = float(sc.motif_rmsd.min())
        return row, ca, dsgn

    def sample_one(self, length: int, index: int, sample_dir: str):
        inf = self.cfg.inference
        key = jax.random.fold_in(
            jax.random.PRNGKey(inf.seed), length * 1000 + index
        )
        out = sample_backbones(
            key,
            self.model,
            self.params,
            self.diffuser,
            num_res=length,
            num_samples=1,
            num_t=inf.diffusion.num_t,
            min_t=inf.diffusion.min_t,
            noise_scale=inf.diffusion.noise_scale,
            aux_traj=True,
            probability_flow=inf.diffusion.probability_flow,
            clash_guidance_weight=inf.diffusion.clash_guidance_weight,
            clash_guidance_margin=inf.diffusion.clash_guidance_margin,
            clash_guidance_t_max=inf.diffusion.clash_guidance_t_max,
        )
        atom37 = np.asarray(out.atom37)[0]
        paths = self.save_traj(
            atom37,
            np.asarray(out.atom37_traj)[:, 0],
            np.asarray(out.x0_traj)[:, 0],
            np.ones(length),
            sample_dir,
        )
        row = {"length": length, "sample": index, **paths}
        row.update(metrics_lib.backbone_metrics(atom37))
        if self.sequence_designer is not None and self.folder is not None:
            sc = self.run_self_consistency(atom37, sample_dir)
            row.update(sc)
        return row, atom37

    def save_traj(
        self,
        sample: np.ndarray,
        bb_traj: np.ndarray,
        x0_traj: np.ndarray,
        diffuse_mask: np.ndarray,
        output_dir: str,
    ) -> dict:
        """Writes sample.pdb, bb_traj.pdb, x0_traj.pdb with the diffusion
        mask in the b-factor column (reference `save_traj`, :236-293)."""
        b = np.tile(diffuse_mask[:, None] * 100.0, (1, rc.ATOM_TYPE_NUM))
        paths = {}
        with open(os.path.join(output_dir, "sample_1.pdb"), "w") as f:
            f.write(protein.to_pdb(protein.create_protein(sample, b_factors=b)))
        paths["sample_path"] = os.path.join(output_dir, "sample_1.pdb")
        for name, traj in (("bb_traj", bb_traj), ("x0_traj", x0_traj)):
            prots = [
                protein.create_protein(frame, b_factors=b) for frame in traj
            ]
            path = os.path.join(output_dir, f"{name}_1.pdb")
            with open(path, "w") as f:
                f.write(protein.to_pdb_multi(prots))
            paths[f"{name}_path"] = path
        return paths

    def run_self_consistency(
        self,
        atom37: np.ndarray,
        sample_dir: str,
        motif_mask: Optional[np.ndarray] = None,
    ) -> dict:
        """sequence design -> fold -> scTM/scRMSD; writes sc_results.csv
        (reference `run_self_consistency`, :295-407).

        When `motif_mask` (bool/0-1 [N]) is given, each refold additionally
        reports `motif_rmsd`: the Kabsch-aligned CA RMSD between the sampled
        and refolded structures restricted to the motif residues (reference
        `inference_se3_diffusion.py:372-386` — motif-scaffolding evaluation).
        """
        inf = self.cfg.inference
        seqs = self.sequence_designer(
            atom37, inf.samples.seq_per_sample, inf.seed
        )
        sc_dir = os.path.join(sample_dir, "self_consistency")
        os.makedirs(sc_dir, exist_ok=True)
        rows = []
        sample_ca = atom37[:, 1]
        motif_idx = None
        if motif_mask is not None:
            motif_idx = np.nonzero(np.asarray(motif_mask) > 0.5)[0]
        for si, seq in enumerate(seqs):
            folded = self.folder(seq)
            fold_path = os.path.join(sc_dir, f"folded_{si}.pdb")
            with open(fold_path, "w") as f:
                aatype = np.asarray(
                    [rc.RESTYPE_ORDER.get(c, rc.RESTYPE_NUM) for c in seq]
                )
                f.write(
                    protein.to_pdb(protein.create_protein(folded, aatype=aatype))
                )
            m = metrics_lib.self_consistency_metrics(sample_ca, folded[:, 1])
            if motif_idx is not None and len(motif_idx) >= 3:
                m["motif_rmsd"] = metrics_lib.calc_aligned_rmsd(
                    sample_ca[motif_idx], folded[:, 1][motif_idx]
                )
            rows.append({"sequence": seq, "folded_path": fold_path, **m})
        df = pd.DataFrame(rows)
        df.to_csv(os.path.join(sc_dir, "sc_results.csv"), index=False)
        out = {
            "sc_rmsd_min": float(df.rmsd.min()),
            "sc_tm_max": float(df.tm_score.max()),
            "designable": bool(df.rmsd.min() < 2.0),
        }
        if "motif_rmsd" in df:
            out["sc_motif_rmsd_min"] = float(df.motif_rmsd.min())
        return out
