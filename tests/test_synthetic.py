"""Synthetic curriculum generator tests."""
import numpy as np
import pytest

from se3_diffusion_tpu.data import synthetic as syn
from se3_diffusion_tpu.data import synthetic_batch as sb


class TestBackboneBuilder:
    def test_ideal_geometry(self):
        phis = np.full(20, -57.0)
        psis = np.full(20, -47.0)
        atom37, mask = syn.build_backbone_from_dihedrals(phis, psis)
        ca = atom37[:, 1]
        bonds = np.linalg.norm(ca[1:] - ca[:-1], axis=-1)
        assert np.abs(bonds - 3.8).max() < 0.1  # trans CA-CA virtual bond
        np.testing.assert_array_equal(mask[:, [0, 1, 2, 4]], 1.0)

    def test_matches_uniform_builder(self):
        from tests.helpers import build_backbone

        want, _ = build_backbone(12, phi=-120.0, psi=120.0)
        got, _ = syn.build_backbone_from_dihedrals(
            np.full(12, -120.0), np.full(12, 120.0)
        )
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestCompaction:
    def test_compaction_reduces_rg(self):
        rng = np.random.RandomState(0)
        # Fully extended strand: maximal Rg, all residues movable.
        atom37, mask = syn.build_backbone_from_dihedrals(
            np.full(48, -120.0), np.full(48, 120.0)
        )
        rg0 = syn.radius_of_gyration(atom37[:, 1])
        out = syn.compact_backbone(
            atom37, mask, rng, target_rg=1.0, steps=150
        )[-1]
        rg1 = syn.radius_of_gyration(out[:, 1])
        assert rg1 < 0.7 * rg0
        # Bond geometry preserved by pivot moves.
        ca = out[:, 1]
        bonds = np.linalg.norm(ca[1:] - ca[:-1], axis=-1)
        assert np.abs(bonds - 3.8).max() < 0.15

    def test_sample_structure_clash_free(self):
        rng = np.random.RandomState(1)
        atom37, mask = syn.sample_structure(rng, 40, compact_steps=100)
        assert syn.min_nonlocal_ca_dist(atom37[:, 1]) > 2.5
        assert atom37.shape == (40, 37, 3)

    def test_snapshots_monotone_compactness(self):
        rng = np.random.RandomState(2)
        snaps, mask = syn.sample_structure(
            rng, 40, compact_steps=120, num_snapshots=3
        )
        assert len(snaps) == 3
        rgs = [syn.radius_of_gyration(s[:, 1]) for s in snaps]
        assert rgs[-1] <= rgs[0] + 1e-6


class TestSheetBlocks:
    def test_hairpin_block_registers_as_strand(self):
        from se3_diffusion_tpu.evaluation import secondary_structure as ss_lib

        rng = np.random.RandomState(3)
        phis, psis, chars = syn.sample_sheet_dihedrals(rng, 14)  # 2x6 + turn
        assert len(phis) == len(psis) == len(chars) == 14
        assert chars.count("T") == 2 and chars.count("E") == 12
        a37, mask = syn.build_backbone_from_dihedrals(phis, psis)
        # Paired antiparallel strands: clash-free and DSSP-detected.
        assert syn.min_nonlocal_ca_dist(a37[:, 1]) > 3.0
        assert ss_lib.ss_percentages(a37, mask)["strand_percent"] > 0.3

    def test_turns_are_fixed_during_compaction(self):
        # 'T' chars (sheet turns) must not be movable, or compaction would
        # pivot inside the hairpin and break the strand pairing.
        ss_arr = np.frombuffer(b"EEETTEEELL", dtype="S1")
        fixed = ss_arr != b"L"
        assert fixed[:8].all() and not fixed[8:].any()

    def test_curriculum_contains_strand_content(self):
        from se3_diffusion_tpu.evaluation import secondary_structure as ss_lib

        fracs = []
        for seed in range(4):
            rng = np.random.RandomState(200 + seed)
            a37, mask = syn.sample_structure(rng, 90, compact_steps=150)
            fracs.append(ss_lib.ss_percentages(a37, mask)["strand_percent"])
        assert max(fracs) > 0.05  # sheets survive compaction


class TestGenerateDataset:
    def test_feeds_pdb_dataset(self, tmp_path):
        import pandas as pd

        from se3_diffusion_tpu.config import DataConfig
        from se3_diffusion_tpu.data.dataset import PdbDataset

        csv = syn.generate_dataset(
            str(tmp_path),
            syn.CurriculumConfig(
                num_topologies=2, snapshots_per_topology=2,
                min_len=24, max_len=40,
            ),
            log_every=0,
        )
        df = pd.read_csv(csv)
        assert len(df) == 4
        assert set(
            ["pdb_name", "processed_path", "modeled_seq_len",
             "helix_percent", "radius_gyration"]
        ) <= set(df.columns)
        ds = PdbDataset(
            DataConfig(csv_path=csv, cluster_path="", min_len=10,
                       max_loop_percent=1.1, rog_quantile=0.0),
            is_training=True,
        )
        batch = ds.make_batch([0, 1], 500_000)
        assert batch["rigids_0"].shape[0] == 2
        assert np.isfinite(batch["rigids_0"]).all()

    def test_ss_probs_raise_strand_content(self):
        """Strand-heavy segment probabilities + wider meanders (the v3
        curriculum settings) produce materially more strand than the
        defaults at the plan level."""
        import numpy as np

        from se3_diffusion_tpu.data import synthetic as syn

        def planned_strand_frac(probs, max_strands, seeds=8, length=120):
            fracs = []
            for i in range(seeds):
                rng = np.random.RandomState(500 + i)
                segs = syn._segment_plan(rng, length, probs, max_strands)
                sheet = sum(sl for ss, sl, _ in segs if ss == "S")
                fracs.append(sheet / length)
            return float(np.mean(fracs))

        base = planned_strand_frac(syn.DEFAULT_SS_PROBS, 3)
        rich = planned_strand_frac((0.28, 0.34, 0.05, 0.33), 4)
        assert rich > base + 0.08, (base, rich)
        # Wide meanders never return None even under heavy rejection.
        rng = np.random.RandomState(1)
        out = syn.sample_sheet_dihedrals(rng, 4 * 5 + 6, n_strands=4)
        assert out is not None and len(out[0]) == 26


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestBatchedGenerator:
    """data/synthetic_batch.py — the XLA-batched pivot-MC generator."""

    def test_batched_nerf_matches_single(self):
        rng = np.random.RandomState(0)
        phis = rng.uniform(-180, 180, (3, 20))
        psis = rng.uniform(-180, 180, (3, 20))
        batched = sb.build_backbones_batch(phis, psis)
        for b in range(3):
            a37, _ = syn.build_backbone_from_dihedrals(phis[b], psis[b])
            np.testing.assert_allclose(
                batched[b], a37[:, [0, 1, 2, 4]], atol=1e-3
            )

    def test_compact_batch_geometry_and_rg(self):
        """Compaction must preserve bond geometry exactly (pivots are
        rigid rotations) and pull Rg toward the target."""
        rng = np.random.RandomState(1)
        lens = np.array([64, 80, 96, 128])  # curriculum domain (min_len 60)
        res = sb.compact_structures_batch(rng, lens, num_snapshots=2)
        assert len(res) == len(lens)
        for (snaps, mask), L in zip(res, lens):
            assert len(snaps) == 2
            a37 = snaps[-1]
            assert a37.shape == (L, 37, 3)
            np.testing.assert_array_equal(
                mask[:, [0, 1, 2, 4]], np.ones((L, 4))
            )
            ca = a37[:, 1]
            d = np.linalg.norm(ca[1:] - ca[:-1], axis=-1)
            assert (np.abs(d - 3.8) < 0.3).all(), d
            target = 2.2 * float(L) ** 0.38
            assert syn.radius_of_gyration(ca) < 2.0 * target
            # clash rule: no non-local CA pair below the floor
            assert syn.min_nonlocal_ca_dist(ca, 3) > 0.8 * 3.2 * 0.9

    def test_mixed_length_bucket_padding(self):
        """Chains of different lengths in one batch stay independent:
        padded tail slots must not perturb the real residues."""
        rng = np.random.RandomState(2)
        res = sb.compact_structures_batch(
            rng, np.array([40, 72]), num_snapshots=1
        )
        for (snaps, _), L in zip(res, (40, 72)):
            assert snaps[0].shape[0] == L
            assert np.isfinite(snaps[0]).all()

    def test_generate_dataset_batch_contract(self, tmp_path):
        """Same .pkl + metadata.csv contract as the single-chain path
        (reference `data/process_pdb_dataset.py:97-235`)."""
        import pandas as pd

        cfg = syn.CurriculumConfig(
            num_topologies=6, snapshots_per_topology=2, min_len=40,
            max_len=64, seed=3,
        )
        csv = sb.generate_dataset_batch(
            str(tmp_path), cfg, batch_size=4, long_frac=0.5, long_min=56
        )
        df = pd.read_csv(csv)
        assert len(df) == 12  # 6 topologies x 2 snapshots
        for col in ("pdb_name", "processed_path", "seq_len",
                    "helix_percent", "strand_percent", "radius_gyration"):
            assert col in df.columns
        from se3_diffusion_tpu.data import utils as du

        row = df.iloc[0]
        feats = du.read_pkl(str(tmp_path / row.processed_path))
        assert feats["atom_positions"].shape == (row.seq_len, 37, 3)
        # long_frac mixture reaches the [long_min, max_len] band
        assert (df.seq_len >= 56).any()

    def test_fast_sheet_sampler_produces_strands(self):
        rng = np.random.RandomState(4)
        phis, psis, chars = sb.sample_sheet_dihedrals_fast(rng, 20)
        assert len(phis) == len(psis) == len(chars) == 20
        assert chars.count("E") >= 12
        a37, _ = syn.build_backbone_from_dihedrals(phis, psis)
        assert np.isfinite(a37).all()


class TestMultiDomain:
    """Long chains as joined compact domains (synthetic_batch)."""

    def test_join_preserves_domain_geometry(self):
        rng = np.random.RandomState(0)
        a = sb.build_backbones_batch(
            rng.uniform(-120, -40, (1, 24)), rng.uniform(-60, 0, (1, 24))
        )[0]
        b = sb.build_backbones_batch(
            rng.uniform(-140, -100, (1, 20)), rng.uniform(100, 140, (1, 20))
        )[0]
        joined = sb.join_domains(a, b, rng)
        assert joined.shape == (44, 4, 3)
        np.testing.assert_allclose(joined[:24], a, atol=1e-5)
        # rigid: internal distances of b preserved
        d_before = np.linalg.norm(b[:, 1][:, None] - b[:, 1][None], axis=-1)
        bt = joined[24:]
        d_after = np.linalg.norm(bt[:, 1][:, None] - bt[:, 1][None], axis=-1)
        np.testing.assert_allclose(d_after, d_before, atol=1e-3)
        # junction peptide geometry is ideal
        ca = joined[:, 1]
        d = np.linalg.norm(ca[24] - ca[23])
        assert abs(d - 3.8) < 0.3, d
        np.testing.assert_allclose(
            np.linalg.norm(joined[24, 0] - joined[23, 2]), syn.B_C_N,
            atol=1e-3,
        )

    def test_multidomain_batch_contract(self):
        rng = np.random.RandomState(1)
        lens = np.array([80, 96])
        res = sb.compact_multidomain_batch(
            rng, lens, max_domain=48, num_snapshots=2
        )
        for (snaps, mask), L in zip(res, lens):
            assert len(snaps) == 2
            assert snaps[-1].shape == (L, 37, 3)
            ca = snaps[-1][:, 1]
            d = np.linalg.norm(ca[1:] - ca[:-1], axis=-1)
            assert (np.abs(d - 3.8) < 0.4).all()
            assert np.isfinite(snaps[0]).all()
