"""Experiment runtime + checkpoint + metrics + inference-runner tests."""
import dataclasses
import os

import jax
import numpy as np
import pandas as pd
import pytest

from se3_diffusion_tpu.config import (
    Config,
    DataConfig,
    DiffuserConfig,
    ExperimentConfig,
    InferenceConfig,
    InferenceDiffusionConfig,
    InferenceSamplesConfig,
    IpaConfig,
    ModelConfig,
    SO3Config,
)
from se3_diffusion_tpu.evaluation import metrics as metrics_lib
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
SMALL_DIFF = DiffuserConfig(
    so3=SO3Config(num_omega=100, num_sigma=50, cache_dir="", series_l=200)
)


class TestMetrics:
    def test_ideal_helix_geometry(self):
        atom37, mask = build_backbone(40)
        m = metrics_lib.backbone_metrics(atom37, mask)
        # Ideal geometry: every CA-CA bond near 3.8, no clashes.
        assert m["ca_ca_valid_percent"] > 0.95
        assert m["ca_ca_deviation"] < 0.1
        assert m["num_ca_clashes"] == 0
        assert m["helix_percent"] > 0.5

    def test_tm_score_identity(self):
        atom37, _ = build_backbone(60)
        ca = atom37[:, 1]
        tm, _ = metrics_lib.calc_tm_score(ca, ca)
        assert tm > 0.99

    def test_tm_score_rotation_invariant(self):
        from scipy.spatial.transform import Rotation

        atom37, _ = build_backbone(60)
        ca = atom37[:, 1].astype(np.float64)
        rot = Rotation.from_rotvec([0.3, -1.0, 2.0]).as_matrix()
        ca_rot = ca @ rot.T + np.asarray([5.0, -3.0, 10.0])
        tm, _ = metrics_lib.calc_tm_score(ca_rot, ca)
        assert tm > 0.99
        assert metrics_lib.calc_aligned_rmsd(ca_rot, ca) < 1e-3

    def test_tm_score_discriminates(self):
        helix, _ = build_backbone(60, phi=-57, psi=-47)
        strand, _ = build_backbone(60, phi=-120, psi=120)
        tm, _ = metrics_lib.calc_tm_score(helix[:, 1], strand[:, 1])
        assert tm < 0.5

    def test_clash_detection(self):
        atom37, mask = build_backbone(20)
        atom37[10, 1] = atom37[3, 1] + 0.5  # manufactured clash
        m = metrics_lib.backbone_metrics(atom37, mask)
        assert m["num_ca_clashes"] >= 1


class TestCheckpoints:
    def test_save_restore_roundtrip(self, tmp_path):
        from se3_diffusion_tpu.models.score_network import ScoreNetwork
        from se3_diffusion_tpu.training import create_train_state
        from se3_diffusion_tpu.training.checkpoints import CheckpointManager

        cfg = Config(model=SMALL_MODEL, diffuser=SMALL_DIFF)
        model = ScoreNetwork(cfg.model)
        state = create_train_state(jax.random.PRNGKey(0), cfg, model, 8)
        state = state._replace(step=state.step + 7)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(state, epoch=3, cfg=cfg)
        template = create_train_state(jax.random.PRNGKey(1), cfg, model, 8)
        restored, epoch = mgr.restore(template)
        assert epoch == 3
        assert int(restored.step) == 7
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        assert all(np.allclose(x, y) for x, y in zip(a, b))
        mgr.close()

    def test_restore_empty(self, tmp_path):
        from se3_diffusion_tpu.models.score_network import ScoreNetwork
        from se3_diffusion_tpu.training import create_train_state
        from se3_diffusion_tpu.training.checkpoints import CheckpointManager

        cfg = Config(model=SMALL_MODEL, diffuser=SMALL_DIFF)
        model = ScoreNetwork(cfg.model)
        template = create_train_state(jax.random.PRNGKey(0), cfg, model, 8)
        mgr = CheckpointManager(str(tmp_path / "empty"))
        state, epoch = mgr.restore(template)
        assert state is None and epoch == 0
        mgr.close()


class TestInferenceRunner:
    @pytest.fixture(scope="class")
    def runner(self, tmp_path_factory):
        from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
        from se3_diffusion_tpu.models.score_network import init_score_network
        from se3_diffusion_tpu.sampling.inference import InferenceRunner

        out_dir = str(tmp_path_factory.mktemp("inference"))
        cfg = Config(
            model=SMALL_MODEL,
            diffuser=SMALL_DIFF,
            inference=InferenceConfig(
                output_dir=out_dir,
                diffusion=InferenceDiffusionConfig(num_t=4, noise_scale=0.1),
                samples=InferenceSamplesConfig(
                    samples_per_length=2, seq_per_sample=2,
                    min_length=16, max_length=24, length_step=8,
                ),
            ),
        )
        diffuser = SE3Diffuser.create(cfg.diffuser)
        model, params = init_score_network(jax.random.PRNGKey(0), cfg.model, 8)

        # Real JAX ProteinMPNN (random weights) on the designer leg — the
        # production code path, no mocks (folding stays mocked: no folding
        # weights exist in this environment).
        import jax.numpy as jnp

        from se3_diffusion_tpu.models.protein_mpnn import (
            MPNNConfig,
            ProteinMPNN,
            make_sequence_designer,
        )

        mpnn_cfg = MPNNConfig(
            hidden_dim=32, node_features=32, edge_features=32, k_neighbors=8,
            num_encoder_layers=1, num_decoder_layers=1,
        )
        mpnn = ProteinMPNN(mpnn_cfg)
        n0 = 16
        bb, _ = build_backbone(n0)
        x = jnp.asarray(bb[None, :, [0, 1, 2, 4], :])
        mpnn_params = mpnn.init(
            jax.random.PRNGKey(1), x, jnp.zeros((1, n0), jnp.int32),
            jnp.ones((1, n0)), jnp.arange(n0, dtype=jnp.int32)[None],
            jnp.zeros((1, n0), jnp.int32), jnp.arange(n0)[None],
        )["params"]
        designer = make_sequence_designer(mpnn, mpnn_params)

        def mock_folder(seq):
            atom37, _ = build_backbone(len(seq))
            return atom37

        return InferenceRunner(
            cfg=cfg, model=model, params=params, diffuser=diffuser,
            sequence_designer=designer, folder=mock_folder,
        ), out_dir

    def test_length_sweep_with_self_consistency(self, runner):
        r, out_dir = runner
        df = r.run_sampling()
        # lengths {16, 24} x 2 samples.
        assert len(df) == 4
        assert set(df.length) == {16, 24}
        assert {"sc_rmsd_min", "sc_tm_max", "designable"} <= set(df.columns)
        # MPNN-designed sequences are real per-sample strings.
        sc = pd.read_csv(
            os.path.join(out_dir, "length_16", "sample_0",
                         "self_consistency", "sc_results.csv")
        )
        assert all(len(s) == 16 for s in sc.sequence)
        sample_dir = os.path.join(out_dir, "length_16", "sample_0")
        assert os.path.exists(os.path.join(sample_dir, "sample_1.pdb"))
        assert os.path.exists(os.path.join(sample_dir, "bb_traj_1.pdb"))
        assert os.path.exists(
            os.path.join(sample_dir, "self_consistency", "sc_results.csv")
        )
        # Headline summary: diversity + designable fraction.
        summary = df.attrs["summary"]
        assert summary["num_samples"] == 4
        assert 0.0 < summary["diversity"] <= 1.0
        assert "designable_fraction" in summary
        assert os.path.exists(os.path.join(out_dir, "summary.json"))

    def test_resumability(self, runner):
        r, out_dir = runner
        df = r.run_sampling()  # everything exists now
        # Restored samples are re-reported: metrics.csv always covers every
        # sample in output_dir, not just freshly-generated ones (advisor r2).
        assert len(df) == 4
        assert "ca_ca_valid_percent" in df.columns
        csv = pd.read_csv(os.path.join(out_dir, "metrics.csv"))
        assert len(csv) == 4
        # Summary is still computed over the restored samples.
        summary = df.attrs["summary"]
        assert summary["num_samples"] == 4
        assert "designable_fraction" in summary


class TestExperimentLoop:
    def test_train_with_ckpt_and_resume(self, tmp_path):
        """Short end-to-end: train 3 steps with ckpt_freq 2, restart, resume."""
        from se3_diffusion_tpu.data.dataset import PdbDataset
        from se3_diffusion_tpu.training.experiment import Experiment
        from tests.helpers import to_mmcif
        from se3_diffusion_tpu.data.process_dataset import main as process_main

        raw = tmp_path / "raw" / "aa"
        raw.mkdir(parents=True)
        for i, n in enumerate([32, 40]):
            atom37, mask = build_backbone(n)
            (raw / f"aa{i:02d}.cif").write_text(to_mmcif(atom37, mask))
        write_dir = str(tmp_path / "processed")
        process_main(
            ["--mmcif_dir", str(tmp_path / "raw"), "--write_dir", write_dir,
             "--num_processes", "1", "--min_file_size", "10", "--min_len", "20"]
        )
        cfg = Config(
            model=SMALL_MODEL,
            diffuser=SMALL_DIFF,
            data=DataConfig(
                csv_path=os.path.join(write_dir, "metadata.csv"),
                cluster_path="", min_len=10, max_loop_percent=1.1,
                rog_quantile=0.0,
            ),
            experiment=ExperimentConfig(
                name="t", ckpt_dir=str(tmp_path / "ckpt"),
                eval_dir=str(tmp_path / "eval"), batch_size=2,
                ckpt_freq=2, log_freq=1, early_ckpt=False,
                sample_mode="length_batch",
            ),
        )
        exp = Experiment(cfg, use_mesh=False)
        exp.train(PdbDataset(cfg.data), valid_dataset=None, max_steps=3)
        assert int(exp.state.step) == 3
        assert os.path.exists(exp._metrics_path)

        # In-training eval against the held-out natives reports TM-to-native
        # (reference `eval_fn`, `train_se3_diffusion.py:459-517`).
        valid_cfg = dataclasses.replace(
            cfg.data, num_eval_lengths=1, samples_per_eval_length=1, num_t=3
        )
        valid_ds = PdbDataset(valid_cfg, is_training=False)
        means = exp.run_eval(valid_ds, step=3)
        assert "eval_tm_score" in means
        assert 0.0 <= means["eval_tm_score"] <= 1.0
        eval_csv = os.path.join(
            cfg.experiment.eval_dir, cfg.experiment.name, "step_3", "metrics.csv"
        )
        df = pd.read_csv(eval_csv)
        assert "tm_score" in df.columns
        exp.ckpt_mgr.close()

        # Fresh Experiment resumes from the step-3 checkpoint.
        exp2 = Experiment(cfg, use_mesh=False)
        assert int(exp2.state.step) == 3
        exp2.ckpt_mgr.close()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestPresets:
    def test_presets_match_reference_variants(self):
        from se3_diffusion_tpu import presets

        icml = presets.get("icml_published")
        assert icml.experiment.separate_rot_loss is False
        assert icml.experiment.rot_loss_t_threshold == 0.0
        assert icml.experiment.sample_mode == "time_batch"
        assert icml.experiment.batch_size == 128
        assert icml.experiment.max_squared_res == 300_000
        dsm = presets.get("pure_dsm")
        assert dsm.experiment.separate_rot_loss is False
        assert dsm.experiment.sample_mode == "cluster_time_batch"
        base = presets.get("base")
        assert base.experiment.separate_rot_loss is True
        with pytest.raises(KeyError):
            presets.get("nope")


class TestDiversity:
    def test_identical_samples_one_cluster(self):
        atom37, _ = build_backbone(40)
        ca = atom37[:, 1]
        d = metrics_lib.diversity([ca, ca.copy(), ca.copy()])
        assert d["num_clusters"] == 1
        assert abs(d["diversity"] - 1 / 3) < 1e-9

    def test_distinct_folds_separate_clusters(self):
        helix, _ = build_backbone(40, phi=-57, psi=-47)
        strand, _ = build_backbone(40, phi=-120, psi=120)
        d = metrics_lib.diversity([helix[:, 1], strand[:, 1]])
        assert d["num_clusters"] == 2
        assert d["diversity"] == 1.0

    def test_empty(self):
        assert metrics_lib.diversity([])["num_samples"] == 0


class TestWandbEvalTable:
    """The eval-sample viewer table (reference train_se3_diffusion.py:438-444)
    exercised with a stub wandb module — the real package is optional."""

    class _StubTable:
        def __init__(self, columns):
            self.columns = columns
            self.rows = []

        def add_data(self, *vals):
            self.rows.append(vals)

    class _StubMolecule:
        def __init__(self, path):
            self.path = path

    def test_table_contract(self, tmp_path):
        from se3_diffusion_tpu.training.experiment import log_wandb_eval_table

        logged = {}

        class Stub:
            Table = self._StubTable
            Molecule = self._StubMolecule

            @staticmethod
            def log(payload, step=None):
                logged.update(payload)
                logged["_step"] = step

        rows = []
        for length in (16, 24):
            for i in range(2):
                (tmp_path / f"len_{length}_sample_{i}.pdb").write_text("END\n")
                rows.append(
                    {"length": length, "sample": i, "ca_ca_validity": 0.5 + i}
                )
        table = log_wandb_eval_table(
            Stub, rows, ["length", "sample", "ca_ca_validity"], str(tmp_path), 7
        )
        assert logged["_step"] == 7
        assert logged["eval/samples"] is table
        assert table.columns == ["length", "sample", "structure", "ca_ca_validity"]
        assert len(table.rows) == 4
        first = table.rows[0]
        assert first[0] == 16 and first[1] == 0
        assert isinstance(first[2], self._StubMolecule)
        assert first[2].path.endswith("len_16_sample_0.pdb")
        assert first[3] == 0.5
