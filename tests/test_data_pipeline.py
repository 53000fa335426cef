"""Data pipeline tests: mmCIF parsing, DSSP-lite, preprocessing CLI,
dataset filtering/samplers, and the end-to-end smoke test of SURVEY.md
section 4.5 (tiny dataset -> train steps -> sample -> PDB parses back)."""
import os

import jax
import numpy as np
import pandas as pd
import pytest

from se3_diffusion_tpu.data import mmcif, utils as du
from se3_diffusion_tpu.data.dataset import PdbDataset, load_clusters
from se3_diffusion_tpu.data.process_dataset import Args, main as process_main
from se3_diffusion_tpu.config import (
    Config,
    DataConfig,
    DiffuserConfig,
    ExperimentConfig,
    IpaConfig,
    ModelConfig,
    SO3Config,
)
from se3_diffusion_tpu.evaluation import secondary_structure as ss_lib

from tests.helpers import build_backbone, to_mmcif


class TestMmcifParser:
    def test_parse_roundtrip(self):
        atom37, mask = build_backbone(30)
        parsed = mmcif.parse_mmcif_string(to_mmcif(atom37, mask))
        assert parsed.resolution == 2.0
        assert parsed.oligomeric_details == ["monomeric"]
        assert list(parsed.chains) == ["A"]
        chain = parsed.chains["A"]
        assert chain.atom_positions.shape == (30, 37, 3)
        np.testing.assert_allclose(
            chain.atom_positions[:, 1], atom37[:, 1], atol=1e-3
        )
        assert chain.aatype.tolist() == [0] * 30  # ALA

    def test_quoted_tokens_and_comments(self):
        text = (
            "data_X\n# comment\n_entry.id 'has space'\n"
            "_refine.ls_d_res_high 1.5\n"
        )
        parsed = mmcif.parse_mmcif_string(text)
        assert parsed.entry_id == "has space"
        assert parsed.resolution == 1.5

    def test_hetatm_and_altloc_filtered(self):
        atom37, mask = build_backbone(5)
        text = to_mmcif(atom37, mask)
        text += "HETATM 999 CA HOH A 99 0 0 0 1.0 . 1\n"
        parsed = mmcif.parse_mmcif_string(text)
        assert parsed.chains["A"].atom_positions.shape[0] == 5


class TestDsspLite:
    def test_alpha_helix_detected(self):
        atom37, mask = build_backbone(30, phi=-57, psi=-47)
        ss = ss_lib.assign_secondary_structure(atom37, mask)
        frac_h = (ss == "H").mean()
        assert frac_h > 0.6, ss

    def test_extended_strand_not_helix(self):
        atom37, mask = build_backbone(30, phi=-120, psi=120)
        ss = ss_lib.assign_secondary_structure(atom37, mask)
        assert (ss == "H").mean() < 0.1

    def test_radius_of_gyration(self):
        atom37, mask = build_backbone(30)
        rg = ss_lib.radius_of_gyration(atom37[:, 1], mask[:, 1])
        assert 2.0 < rg < 30.0


@pytest.fixture(scope="module")
def processed_dir(tmp_path_factory):
    """Builds a tiny synthetic mmCIF shard and preprocesses it."""
    root = tmp_path_factory.mktemp("pdb")
    raw = root / "raw" / "ab"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i, n_res in enumerate([40, 48, 64, 72]):
        # Mix of helical and strand-ish synthetic chains with jitter.
        phi, psi = (-57, -47) if i % 2 == 0 else (-100, 120)
        atom37, mask = build_backbone(n_res, phi=phi, psi=psi)
        atom37 += rng.randn(*atom37.shape).astype(np.float32) * 0.02
        (raw / f"ab{i:02d}.cif").write_text(to_mmcif(atom37, mask))
    write_dir = str(root / "processed")
    process_main(
        [
            "--mmcif_dir", str(root / "raw"),
            "--write_dir", write_dir,
            "--num_processes", "1",
            "--min_file_size", "10",
            "--min_len", "20",
        ]
    )
    return write_dir


class TestPreprocessing:
    def test_metadata_written(self, processed_dir):
        df = pd.read_csv(os.path.join(processed_dir, "metadata.csv"))
        assert len(df) == 4
        assert set(
            [
                "pdb_name", "processed_path", "resolution", "oligomeric_detail",
                "seq_len", "modeled_seq_len", "helix_percent", "strand_percent",
                "coil_percent", "radius_gyration",
            ]
        ) <= set(df.columns)
        # Helical chains must show high helix_percent.
        helical = df.sort_values("pdb_name").iloc[0]
        assert helical.helix_percent > 0.5

    def test_pkl_contents(self, processed_dir):
        df = pd.read_csv(os.path.join(processed_dir, "metadata.csv"))
        data = du.read_pkl(df.iloc[0].processed_path)
        assert data["atom_positions"].shape[1:] == (37, 3)
        # CA-centered.
        ca = data["atom_positions"][:, 1]
        np.testing.assert_allclose(ca.mean(0), 0.0, atol=1e-3)


class TestDataset:
    def _cfg(self, processed_dir, **kw):
        return DataConfig(
            csv_path=os.path.join(processed_dir, "metadata.csv"),
            cluster_path="",
            min_len=10,
            max_len=512,
            max_loop_percent=1.1,  # synthetic chains can be coil-heavy
            rog_quantile=0.0,
            num_eval_lengths=2,
            samples_per_eval_length=1,
            **kw,
        )

    def test_training_split_and_example(self, processed_dir):
        ds = PdbDataset(self._cfg(processed_dir), is_training=True)
        assert len(ds) == 4
        ex = ds.load_example(0)
        assert ex["rigids_0"].shape[-1] == 7
        assert ex["res_mask"].sum() > 20
        assert np.abs(ex["torsion_angles_sin_cos"][:, 2]).max() > 0.1

    def test_eval_split(self, processed_dir):
        ds = PdbDataset(self._cfg(processed_dir), is_training=False)
        assert 1 <= len(ds) <= 2

    def test_sampler_modes(self, processed_dir):
        ds = PdbDataset(self._cfg(processed_dir), is_training=True)
        lb = ds.epoch_indices(0, "length_batch", batch_size=2)
        assert sum(len(b) for b in lb) == 4
        tb = ds.epoch_indices(0, "time_batch", batch_size=3)
        assert all(len(set(b)) == 1 and len(b) == 3 for b in tb)
        # Deterministic per epoch, different across epochs.
        assert ds.epoch_indices(1, "time_batch", 3) == ds.epoch_indices(
            1, "time_batch", 3
        )
        assert ds.epoch_indices(1, "time_batch", 3) != tb
        # Process striding partitions the batches.
        p0 = ds.epoch_indices(0, "length_batch", 2, process_index=0, process_count=2)
        p1 = ds.epoch_indices(0, "length_batch", 2, process_index=1, process_count=2)
        assert len(p0) + len(p1) == len(lb)

    def test_cluster_modes(self, processed_dir, tmp_path):
        cluster_file = tmp_path / "clusters.txt"
        cluster_file.write_text("AB00_1 AB01_1\nAB02_1\nAB03_1\n")
        cfg = self._cfg(processed_dir)
        import dataclasses

        cfg = dataclasses.replace(cfg, cluster_path=str(cluster_file))
        ds = PdbDataset(cfg, is_training=True)
        batches = ds.epoch_indices(0, "cluster_time_batch", batch_size=2)
        # 3 clusters -> 3 batches.
        assert len(batches) == 3

    def test_make_batch_bucketing(self, processed_dir):
        ds = PdbDataset(self._cfg(processed_dir), is_training=True)
        batch = ds.make_batch([0, 1, 2, 3], max_squared_res=500_000)
        n = batch["res_mask"].shape[1]
        assert n in (64, 128)  # bucket-padded
        assert batch["rigids_0"].shape == (batch["res_mask"].shape[0], n, 7)
        # Padded rows are identity quats.
        np.testing.assert_allclose(
            np.linalg.norm(batch["rigids_0"][..., :4], axis=-1), 1.0, atol=1e-5
        )

    def test_buckets_follow_max_len(self, processed_dir):
        """Raising data.max_len extends the default bucket ladder past the
        reference's 512 wall (64-multiples up to max_len rounded up)."""
        import dataclasses

        cfg = dataclasses.replace(self._cfg(processed_dir), max_len=640)
        ds = PdbDataset(cfg, is_training=True)
        batch = ds.make_batch([0, 1], max_squared_res=500_000)
        assert batch["res_mask"].shape[1] % 64 == 0
        # The derived ladder itself: top bucket tracks max_len, and a
        # non-multiple max_len rounds up rather than erroring.
        from se3_diffusion_tpu.data import utils as du

        for max_len, top in ((512, 512), (640, 640), (600, 640)):
            cfg2 = dataclasses.replace(cfg, max_len=max_len)
            ds2 = PdbDataset(cfg2, is_training=True)
            b = ds2.make_batch([0], max_squared_res=500_000)
            assert b["res_mask"].shape[1] <= top
            assert du.round_up_to_bucket(
                top, tuple(range(64, top + 1, 64))
            ) == top


class TestEndToEndSmoke:
    def test_train_two_steps_then_sample(self, processed_dir):
        """SURVEY section 4.5: tiny dataset, 2 train steps, 1 sampler run,
        output PDB parses back."""
        from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
        from se3_diffusion_tpu.models.score_network import ScoreNetwork
        from se3_diffusion_tpu.proteins import protein
        from se3_diffusion_tpu.sampling import sample_backbones
        from se3_diffusion_tpu.training import create_train_state, make_train_step

        cfg = Config(
            model=ModelConfig(
                node_embed_size=32,
                edge_embed_size=16,
                ipa=IpaConfig(
                    c_s=32, c_z=16, c_hidden=16, c_skip=8, no_heads=2,
                    no_qk_points=4, no_v_points=6, seq_tfmr_num_heads=2,
                    seq_tfmr_num_layers=1, num_blocks=2,
                ),
            ),
            diffuser=DiffuserConfig(
                so3=SO3Config(num_omega=100, num_sigma=50, cache_dir="", series_l=200)
            ),
        )
        ds = PdbDataset(
            DataConfig(
                csv_path=os.path.join(processed_dir, "metadata.csv"),
                cluster_path="",
                min_len=10,
                max_loop_percent=1.1,
                rog_quantile=0.0,
            ),
            is_training=True,
        )
        diffuser = SE3Diffuser.create(cfg.diffuser)
        model = ScoreNetwork(cfg.model)
        state = create_train_state(jax.random.PRNGKey(0), cfg, model, 12)
        step = make_train_step(model, cfg, mesh=None)
        for i, idx_batch in enumerate(ds.epoch_indices(0, "length_batch", 2)[:2]):
            batch = ds.make_batch(idx_batch, max_squared_res=500_000)
            batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
            state, aux = step(state, diffuser, batch, jax.random.PRNGKey(i))
            assert np.isfinite(float(aux["loss"]))

        out = sample_backbones(
            jax.random.PRNGKey(3), model, state.params, diffuser,
            num_res=60, num_samples=1, num_t=5,
        )
        pdb_str = protein.to_pdb(protein.create_protein(np.asarray(out.atom37[0])))
        parsed = protein.from_pdb_string(pdb_str)
        assert parsed.atom_positions.shape[0] == 60


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
