"""Motif scaffolding, forward trajectory, violations, plotting, multihost."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_diffusion_tpu.config import DiffuserConfig, IpaConfig, ModelConfig, SO3Config
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.evaluation import violations
from se3_diffusion_tpu.models.score_network import init_score_network
from se3_diffusion_tpu.proteins import protein as protein_lib
from se3_diffusion_tpu.sampling import scaffolding
from tests.helpers import build_backbone

SMALL_MODEL = ModelConfig(
    node_embed_size=32,
    edge_embed_size=16,
    ipa=IpaConfig(
        c_s=32, c_z=16, c_hidden=16, c_skip=8, no_heads=2, no_qk_points=4,
        no_v_points=6, seq_tfmr_num_heads=2, seq_tfmr_num_layers=1,
        num_blocks=2,
    ),
)


@pytest.fixture(scope="module")
def diffuser():
    return SE3Diffuser.create(
        DiffuserConfig(
            so3=SO3Config(num_omega=100, num_sigma=50, cache_dir="", series_l=200)
        )
    )


class TestContigParser:
    def test_fixed_lengths(self):
        rng = np.random.RandomState(0)
        s = scaffolding.sample_contig("5,A10-14,3", rng)
        assert [seg.length for seg in s.segments] == [5, 5, 3]
        assert [seg.is_motif for seg in s.segments] == [False, True, False]
        np.testing.assert_array_equal(
            s.fixed_mask, [0] * 5 + [1] * 5 + [0] * 3
        )

    def test_sampled_ranges_and_length_constraint(self):
        rng = np.random.RandomState(1)
        s = scaffolding.sample_contig(
            "5-15,A10-14,5-15", rng, length_range=(20, 25)
        )
        assert 20 <= s.total_length < 25

    def test_incompatible_raises(self):
        rng = np.random.RandomState(2)
        with pytest.raises(ValueError, match="incompatible"):
            scaffolding.sample_contig("2-3,A10-14", rng, length_range=(100, 110), num_tries=50)

    def test_bad_token_raises(self):
        with pytest.raises(ValueError, match="Bad contig"):
            scaffolding.sample_contig("x!y", np.random.RandomState(0))


class TestScaffoldedSampling:
    def test_motif_held_fixed(self, diffuser):
        model, params = init_score_network(jax.random.PRNGKey(0), SMALL_MODEL, 8)
        atom37, mask37 = build_backbone(12)
        motif = protein_lib.create_protein(atom37, mask37)
        rng = np.random.RandomState(3)
        scaffold = scaffolding.sample_contig("4,A3-8,4", rng)
        feats = scaffolding.scaffold_features(scaffold, motif)

        out = scaffolding.sample_scaffolded(
            jax.random.PRNGKey(1), model, params, diffuser, scaffold,
            motif_protein=motif, num_t=4,
        )
        assert out.rigids.shape == (1, scaffold.total_length, 7)
        # Motif frames unchanged through the whole reverse process:
        # translation differences between fixed positions must be preserved
        # (the diffuser never perturbs fixed residues).
        fixed_idx = np.nonzero(feats["fixed_mask"])[0]
        got = np.asarray(out.rigids[0, fixed_idx, 4:])
        want = feats["rigids_0"][fixed_idx, 4:]
        d_got = got[1:] - got[:-1]
        d_want = want[1:] - want[:-1]
        np.testing.assert_allclose(d_got, d_want, atol=1e-3)

    def test_motif_rmsd_evaluated_end_to_end(self, diffuser, tmp_path):
        """contig -> sample -> self-consistency reports motif_rmsd, and the
        sampled motif region matches the source motif (RMSD ~ 0): the
        scaffolding-evaluation contract of reference
        `inference_se3_diffusion.py:372-386`."""
        from se3_diffusion_tpu.config import (
            Config,
            InferenceConfig,
            InferenceSamplesConfig,
        )
        from se3_diffusion_tpu.evaluation import metrics as metrics_lib
        from se3_diffusion_tpu.sampling.inference import InferenceRunner

        model, params = init_score_network(jax.random.PRNGKey(0), SMALL_MODEL, 8)
        atom37, mask37 = build_backbone(12)
        motif = protein_lib.create_protein(atom37, mask37)
        scaffold = scaffolding.sample_contig("4,A3-8,4", np.random.RandomState(5))
        out = scaffolding.sample_scaffolded(
            jax.random.PRNGKey(1), model, params, diffuser, scaffold,
            motif_protein=motif, num_t=4,
        )
        sampled = np.asarray(out.atom37[0])
        fixed_mask = scaffold.fixed_mask
        midx = np.nonzero(fixed_mask)[0]

        # (a) the sampled motif reproduces the source motif geometry.
        src_ca = atom37[2:8, 1]  # chain A residues 3..8 (1-based, inclusive)
        rmsd_to_source = metrics_lib.calc_aligned_rmsd(sampled[midx, 1], src_ca)
        assert rmsd_to_source < 0.1

        # (b) run_self_consistency threads the mask and emits motif_rmsd.
        runner = InferenceRunner(
            cfg=Config(
                inference=InferenceConfig(
                    samples=InferenceSamplesConfig(seq_per_sample=2)
                )
            ),
            model=model, params=params, diffuser=diffuser,
            sequence_designer=lambda a37, n, s: ["A" * a37.shape[0]] * n,
            folder=lambda seq: sampled,  # perfect refold
        )
        row = runner.run_self_consistency(
            sampled, str(tmp_path), motif_mask=fixed_mask
        )
        assert row["sc_motif_rmsd_min"] < 1e-3
        import pandas as pd

        sc = pd.read_csv(tmp_path / "self_consistency" / "sc_results.csv")
        assert "motif_rmsd" in sc.columns

    def test_scaffold_positions_move(self, diffuser):
        model, params = init_score_network(jax.random.PRNGKey(0), SMALL_MODEL, 8)
        atom37, mask37 = build_backbone(12)
        motif = protein_lib.create_protein(atom37, mask37)
        scaffold = scaffolding.sample_contig("6,A3-8,6", np.random.RandomState(4))
        out1 = scaffolding.sample_scaffolded(
            jax.random.PRNGKey(1), model, params, diffuser, scaffold,
            motif_protein=motif, num_t=3,
        )
        out2 = scaffolding.sample_scaffolded(
            jax.random.PRNGKey(2), model, params, diffuser, scaffold,
            motif_protein=motif, num_t=3,
        )
        free_idx = np.nonzero(1 - scaffold.fixed_mask)[0]
        a = np.asarray(out1.rigids[0, free_idx, 4:])
        b = np.asarray(out2.rigids[0, free_idx, 4:])
        assert np.abs(a - b).max() > 1e-3  # different keys -> different scaffolds


class TestForwardTrajectory:
    def test_variance_grows(self, diffuser):
        x0 = jnp.zeros((16, 3))
        traj = diffuser.forward_trajectory(jax.random.PRNGKey(0), x0, 0.01, 50)
        assert traj.shape == (50, 16, 3)
        var = np.asarray(traj).var(axis=(1, 2))
        assert var[-1] > var[5]


class TestViolations:
    def test_ideal_backbone_clean(self):
        atom37, mask = build_backbone(30)
        m = violations.violation_metrics(atom37, mask)
        assert m["bond_length_violations"] == 0.0
        assert m["bond_angle_violations"] == 0.0
        assert m["num_atom_clashes"] == 0

    def test_broken_chain_detected(self):
        atom37, mask = build_backbone(30)
        atom37[15:] += 20.0  # chain break
        m = violations.violation_metrics(atom37, mask)
        assert m["bond_length_violations"] > 0

    def test_clash_detected(self):
        atom37, mask = build_backbone(30)
        atom37[20, :5] = atom37[5, :5] + 0.3  # superimpose residues
        m = violations.violation_metrics(atom37, mask)
        assert m["num_atom_clashes"] > 0


class TestPlotting:
    def test_plots_render(self, tmp_path):
        from se3_diffusion_tpu.evaluation import plotting

        atom37, _ = build_backbone(20)
        plotting.plot_ca_trace(atom37, str(tmp_path / "trace.png"))
        rigids = np.zeros((8, 7), np.float32)
        rigids[:, 0] = 1.0
        rigids[:, 4] = np.arange(8)
        plotting.plot_frames(rigids, str(tmp_path / "frames.png"))
        traj = np.stack([atom37] * 4)
        plotting.plot_trajectory_snapshots(traj, str(tmp_path / "traj.png"), 3)
        for f in ("trace.png", "frames.png", "traj.png"):
            assert (tmp_path / f).stat().st_size > 1000

    def test_traces_overlay_and_animation(self, tmp_path):
        from se3_diffusion_tpu.evaluation import plotting

        a, _ = build_backbone(16)
        b, _ = build_backbone(16, phi=-120.0, psi=120.0)
        plotting.plot_traces(
            [a[:, 1], b[:, 1]],
            str(tmp_path / "overlay.png"),
            labels=["helix", "strand"],
        )
        traj = np.stack([a + i * 0.5 for i in range(5)])
        out = plotting.animate_trajectory(
            traj, str(tmp_path / "traj.gif"), fps=4, stride=2
        )
        assert (tmp_path / "overlay.png").stat().st_size > 1000
        assert (tmp_path / "traj.gif").stat().st_size > 1000
        assert out.endswith(".gif")


class TestMultihost:
    def test_single_host_init(self):
        from se3_diffusion_tpu.parallel import multihost

        info = multihost.initialize_distributed()
        assert info["process_index"] == 0
        assert info["process_count"] == 1
        assert multihost.is_main_process()

    def test_profiler_trace_noop(self):
        from se3_diffusion_tpu.parallel import multihost

        with multihost.profiler_trace(None):
            pass


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestScaffoldCLI:
    def test_cli_end_to_end(self, tmp_path):
        """scripts/scaffold.py: contig + motif PDB -> design PDBs with the
        fixed mask in b-factors, metrics.csv, summary.json, motif held."""
        import json
        import os
        import subprocess
        import sys

        atom37, mask37 = build_backbone(12)
        motif_pdb = tmp_path / "motif.pdb"
        motif_pdb.write_text(protein_lib.to_pdb(protein_lib.create_protein(atom37, mask37)))
        cfg_yaml = tmp_path / "tiny.yaml"
        cfg_yaml.write_text(
            "model:\n"
            "  node_embed_size: 32\n"
            "  edge_embed_size: 16\n"
            "  ipa:\n"
            "    c_hidden: 16\n"
            "    c_skip: 8\n"
            "    no_heads: 2\n"
            "    no_qk_points: 4\n"
            "    no_v_points: 6\n"
            "    seq_tfmr_num_heads: 2\n"
            "    seq_tfmr_num_layers: 1\n"
            "    num_blocks: 2\n"
            "diffuser:\n"
            "  so3:\n"
            "    num_omega: 100\n"
            "    num_sigma: 50\n"
            "    series_l: 200\n"
            "    cache_dir: ''\n"
        )
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
        out_dir = tmp_path / "designs"
        res = subprocess.run(
            [
                sys.executable, os.path.join(repo, "scripts", "scaffold.py"),
                "--contig", "3-5,A3-8,3-5", "--motif_pdb", str(motif_pdb),
                "--config", str(cfg_yaml), "--num_designs", "2",
                "--num_t", "3", "--output_dir", str(out_dir),
            ],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        summary = json.loads((out_dir / "summary.json").read_text())
        assert summary["num_designs"] == 2
        assert summary["mean_num_motif_res"] == 6.0
        assert summary["mean_motif_rmsd"] < 0.1
        import pandas as pd

        df = pd.read_csv(out_dir / "metrics.csv")
        assert len(df) == 2 and "motif_rmsd" in df.columns
        pdb_text = (out_dir / "design_0.pdb").read_text()
        prot = protein_lib.from_pdb_string(pdb_text)
        # Fixed mask rides the b-factor column: exactly 6 motif residues.
        assert int((prot.b_factors[:, 1] > 0.5).sum()) == 6
