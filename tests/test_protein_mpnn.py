"""ProteinMPNN tests: invariance, causality, sampling consistency,
checkpoint conversion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from se3_diffusion_tpu.interop.mpnn_convert import convert_mpnn_state_dict
from se3_diffusion_tpu.models.protein_mpnn import (
    MPNN_ALPHABET,
    MPNNConfig,
    ProteinMPNN,
    make_sequence_designer,
    random_decoding_order,
    sample_sequences,
    seq_to_string,
)
from tests.helpers import build_backbone

CFG = MPNNConfig(
    hidden_dim=32, node_features=32, edge_features=32, k_neighbors=8,
    num_encoder_layers=2, num_decoder_layers=2,
)


def backbone_x(n, batch=1):
    atom37, _ = build_backbone(n)
    x = atom37[:, [0, 1, 2, 4], :]
    return jnp.tile(jnp.asarray(x)[None], (batch, 1, 1, 1))


@pytest.fixture(scope="module")
def model_and_params():
    model = ProteinMPNN(CFG)
    n = 20
    x = backbone_x(n)
    mask = jnp.ones((1, n))
    ridx = jnp.arange(n, dtype=jnp.int32)[None]
    chains = jnp.zeros((1, n), jnp.int32)
    seq = jnp.zeros((1, n), jnp.int32)
    order = jnp.tile(jnp.arange(n)[None], (1, 1))
    params = model.init(jax.random.PRNGKey(0), x, seq, mask, ridx, chains, order)[
        "params"
    ]
    return model, params


class TestForward:
    def test_log_probs_shape_and_normalization(self, model_and_params):
        model, params = model_and_params
        n = 20
        x = backbone_x(n)
        mask = jnp.ones((1, n))
        ridx = jnp.arange(n, dtype=jnp.int32)[None]
        chains = jnp.zeros((1, n), jnp.int32)
        seq = jnp.ones((1, n), jnp.int32)
        order = jnp.tile(jnp.arange(n)[None], (1, 1))
        lp = model.apply({"params": params}, x, seq, mask, ridx, chains, order)
        assert lp.shape == (1, n, 21)
        np.testing.assert_allclose(
            np.exp(np.asarray(lp)).sum(-1), 1.0, atol=1e-4
        )

    def test_rigid_motion_invariance(self, model_and_params):
        from scipy.spatial.transform import Rotation

        model, params = model_and_params
        n = 20
        # Jitter breaks exact k-NN distance ties of the ideal helix (ties
        # make the neighbor set itself rotation-dependent at fp precision).
        x = backbone_x(n) + jax.random.normal(
            jax.random.PRNGKey(7), (1, n, 4, 3)
        ) * 0.1
        mask = jnp.ones((1, n))
        ridx = jnp.arange(n, dtype=jnp.int32)[None]
        chains = jnp.zeros((1, n), jnp.int32)
        seq = jnp.ones((1, n), jnp.int32)
        order = jnp.tile(jnp.arange(n)[None], (1, 1))
        lp1 = model.apply({"params": params}, x, seq, mask, ridx, chains, order)
        rot = jnp.asarray(
            Rotation.from_rotvec([0.4, -0.7, 1.2]).as_matrix(), jnp.float32
        )
        x2 = jnp.einsum("ij,bnaj->bnai", rot, x) + jnp.asarray([3.0, -5.0, 2.0])
        lp2 = model.apply({"params": params}, x2, seq, mask, ridx, chains, order)
        np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), atol=2e-4)

    def test_causality(self, model_and_params):
        """Log-prob at the first decoded position must not depend on any
        sequence token; at a middle position it must depend only on tokens
        decoded earlier."""
        model, params = model_and_params
        n = 20
        x = backbone_x(n)
        mask = jnp.ones((1, n))
        ridx = jnp.arange(n, dtype=jnp.int32)[None]
        chains = jnp.zeros((1, n), jnp.int32)
        order = jnp.tile(jnp.arange(n)[None], (1, 1))  # identity order

        seq_a = jnp.zeros((1, n), jnp.int32)
        seq_b = seq_a.at[0, 10:].set(7)  # change only "future" tokens
        lp_a = model.apply({"params": params}, x, seq_a, mask, ridx, chains, order)
        lp_b = model.apply({"params": params}, x, seq_b, mask, ridx, chains, order)
        # Positions < 10 decode before any changed token.
        np.testing.assert_allclose(
            np.asarray(lp_a)[0, :10], np.asarray(lp_b)[0, :10], atol=1e-5
        )
        # Changing an EARLIER token must change later log-probs.
        seq_c = seq_a.at[0, 0].set(7)
        lp_c = model.apply({"params": params}, x, seq_c, mask, ridx, chains, order)
        assert np.abs(np.asarray(lp_c)[0, 5:] - np.asarray(lp_a)[0, 5:]).max() > 1e-6


class TestSampling:
    def test_sample_shapes_and_determinism(self, model_and_params):
        model, params = model_and_params
        n = 20
        x = backbone_x(n, batch=3)
        mask = jnp.ones((3, n))
        ridx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (3, 1))
        chains = jnp.zeros((3, n), jnp.int32)
        out = sample_sequences(
            model, params, jax.random.PRNGKey(1), x, mask, ridx, chains,
            temperature=0.5,
        )
        assert out["seq"].shape == (3, n)
        assert out["seq"].min() >= 0 and out["seq"].max() < 21
        # X omitted by default.
        assert not np.any(np.asarray(out["seq"]) == MPNN_ALPHABET.index("X"))
        out2 = sample_sequences(
            model, params, jax.random.PRNGKey(1), x, mask, ridx, chains,
            temperature=0.5,
        )
        np.testing.assert_array_equal(np.asarray(out["seq"]), np.asarray(out2["seq"]))

    def test_backbone_noise(self, model_and_params):
        """backbone_noise (reference --backbone_noise /
        ProteinFeatures.augment_eps, protein_mpnn_utils.py:943-944):
        eps=0 is a no-op; eps>0 perturbs the conditionals but stays
        deterministic for a fixed key."""
        model, params = model_and_params
        n = 20
        x = backbone_x(n)
        mask = jnp.ones((1, n))
        ridx = jnp.arange(n, dtype=jnp.int32)[None]
        chains = jnp.zeros((1, n), jnp.int32)
        kw = dict(temperature=0.5)
        base = sample_sequences(
            model, params, jax.random.PRNGKey(4), x, mask, ridx, chains,
            backbone_noise=0.0, **kw)
        noisy = sample_sequences(
            model, params, jax.random.PRNGKey(4), x, mask, ridx, chains,
            backbone_noise=0.3, **kw)
        noisy2 = sample_sequences(
            model, params, jax.random.PRNGKey(4), x, mask, ridx, chains,
            backbone_noise=0.3, **kw)
        assert np.abs(
            np.asarray(base["log_probs"]) - np.asarray(noisy["log_probs"])
        ).max() > 1e-4
        np.testing.assert_array_equal(
            np.asarray(noisy["seq"]), np.asarray(noisy2["seq"]))

        from se3_diffusion_tpu.models.protein_mpnn import score_sequences
        order = jnp.tile(jnp.arange(n)[None], (1, 1))
        s0 = score_sequences(model, params, x, base["seq"], mask, ridx,
                             chains, order)
        s1 = score_sequences(model, params, x, base["seq"], mask, ridx,
                             chains, order, backbone_noise=0.3,
                             noise_key=jax.random.PRNGKey(5))
        assert np.abs(
            np.asarray(s0["score"]) - np.asarray(s1["score"])).max() > 1e-6

    def test_sample_probs_output(self, model_and_params):
        """The per-step probs output (reference --save_probs): rows at
        designed positions are distributions; fixed/padded rows are 0."""
        model, params = model_and_params
        n = 20
        x = backbone_x(n)
        mask = jnp.ones((1, n)).at[0, -4:].set(0.0)
        ridx = jnp.arange(n, dtype=jnp.int32)[None]
        chains = jnp.zeros((1, n), jnp.int32)
        fixed = jnp.zeros((1, n)).at[0, :3].set(1.0)
        out = sample_sequences(
            model, params, jax.random.PRNGKey(7), x, mask, ridx, chains,
            temperature=0.7, fixed_mask=fixed,
            input_seq=jnp.full((1, n), 5, jnp.int32),
        )
        probs = np.asarray(out["probs"])
        assert probs.shape == (1, n, 21)
        np.testing.assert_allclose(probs[0, :3], 0.0)   # fixed rows
        np.testing.assert_allclose(probs[0, -4:], 0.0)  # padded rows
        np.testing.assert_allclose(
            probs[0, 3:-4].sum(-1), 1.0, atol=1e-5)

    def test_designer_adapter(self, model_and_params):
        model, params = model_and_params
        atom37, _ = build_backbone(16)
        designer = make_sequence_designer(model, params, temperature=0.2)
        seqs = designer(atom37, 4, seed=0)
        assert len(seqs) == 4
        assert all(len(s) == 16 for s in seqs)
        assert all(set(s) <= set(MPNN_ALPHABET[:-1]) for s in seqs)

    def test_random_decoding_order_is_permutation(self):
        mask = jnp.ones((2, 15))
        order = random_decoding_order(jax.random.PRNGKey(0), mask)
        for b in range(2):
            assert sorted(np.asarray(order[b]).tolist()) == list(range(15))


class TestConversion:
    def build_torch_reference(self):
        """Torch module tree matching the released checkpoint key layout."""
        cfg = CFG
        h = cfg.hidden_dim

        class PWFF(tnn.Module):
            def __init__(s):
                super().__init__()
                s.W_in = tnn.Linear(h, h * 4)
                s.W_out = tnn.Linear(h * 4, h)

        class Enc(tnn.Module):
            def __init__(s):
                super().__init__()
                for w in ("W1", "W11"):
                    setattr(s, w, tnn.Linear(h * 3, h))
                for w in ("W2", "W3", "W12", "W13"):
                    setattr(s, w, tnn.Linear(h, h))
                s.norm1, s.norm2, s.norm3 = (tnn.LayerNorm(h) for _ in range(3))
                s.dense = PWFF()

        class Dec(tnn.Module):
            def __init__(s):
                super().__init__()
                s.W1 = tnn.Linear(h * 4, h)
                s.W2, s.W3 = tnn.Linear(h, h), tnn.Linear(h, h)
                s.norm1, s.norm2 = tnn.LayerNorm(h), tnn.LayerNorm(h)
                s.dense = PWFF()

        class Feats(tnn.Module):
            def __init__(s):
                super().__init__()
                s.embeddings = tnn.Module()
                s.embeddings.linear = tnn.Linear(
                    2 * cfg.max_relative_feature + 2,
                    cfg.num_positional_embeddings,
                )
                s.edge_embedding = tnn.Linear(
                    cfg.num_positional_embeddings + cfg.num_rbf * 25,
                    cfg.edge_features,
                    bias=False,
                )
                s.norm_edges = tnn.LayerNorm(cfg.edge_features)

        class Net(tnn.Module):
            def __init__(s):
                super().__init__()
                s.features = Feats()
                s.W_e = tnn.Linear(cfg.edge_features, h)
                s.W_s = tnn.Embedding(21, h)
                s.encoder_layers = tnn.ModuleList(
                    [Enc() for _ in range(cfg.num_encoder_layers)]
                )
                s.decoder_layers = tnn.ModuleList(
                    [Dec() for _ in range(cfg.num_decoder_layers)]
                )
                s.W_out = tnn.Linear(h, 21)

        torch.manual_seed(0)
        return Net()

    def test_structural_conversion(self, model_and_params):
        model, init_params = model_and_params
        net = self.build_torch_reference()
        params = convert_mpnn_state_dict(net.state_dict(), CFG)
        flat_a = {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        flat_b = {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(init_params)[0]
        }
        assert flat_a == flat_b

    def test_converted_forward_runs(self, model_and_params):
        model, _ = model_and_params
        net = self.build_torch_reference()
        params = convert_mpnn_state_dict(net.state_dict(), CFG)
        n = 12
        x = backbone_x(n)
        lp = model.apply(
            {"params": params},
            x,
            jnp.zeros((1, n), jnp.int32),
            jnp.ones((1, n)),
            jnp.arange(n, dtype=jnp.int32)[None],
            jnp.zeros((1, n), jnp.int32),
            jnp.arange(n)[None],
        )
        assert np.all(np.isfinite(np.asarray(lp)))


class TestDesignerFactory:
    def test_backend_none_and_missing_weights(self, tmp_path):
        from se3_diffusion_tpu.config import DesignConfig
        from se3_diffusion_tpu.sampling.design import make_designer_from_config

        assert make_designer_from_config(DesignConfig(backend="none")) is None
        missing = str(tmp_path / "nope.pt")
        assert (
            make_designer_from_config(
                DesignConfig(backend="auto", mpnn_weights_path=missing)
            )
            is None
        )
        with pytest.raises(FileNotFoundError):
            make_designer_from_config(
                DesignConfig(backend="jax", mpnn_weights_path=missing)
            )
        with pytest.raises(ValueError):
            make_designer_from_config(DesignConfig(backend="torch"))

    def test_builds_designer_from_checkpoint(self, tmp_path):
        """Released-.pt contract -> working designer end to end."""
        from se3_diffusion_tpu.config import DesignConfig
        from se3_diffusion_tpu.sampling.design import make_designer_from_config

        net = TestConversion().build_torch_reference()
        path = str(tmp_path / "mpnn.pt")
        torch.save({"model_state_dict": net.state_dict(), "step": 1}, path)
        designer = make_designer_from_config(
            DesignConfig(backend="auto", mpnn_weights_path=path),
            mpnn_cfg=CFG,
        )
        assert designer is not None
        atom37, _ = build_backbone(14)
        seqs = designer(np.asarray(atom37), 2, 0)
        assert len(seqs) == 2 and all(len(s) == 14 for s in seqs)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestFixedPositions:
    def test_fixed_positions_kept(self, model_and_params):
        model, params = model_and_params
        n = 20
        x = backbone_x(n, batch=2)
        mask = jnp.ones((2, n))
        ridx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (2, 1))
        chains = jnp.zeros((2, n), jnp.int32)
        fixed = jnp.zeros((2, n)).at[:, 5:10].set(1.0)
        input_seq = jnp.full((2, n), MPNN_ALPHABET.index("W"), jnp.int32)
        out = sample_sequences(
            model, params, jax.random.PRNGKey(0), x, mask, ridx, chains,
            temperature=1.0, fixed_mask=fixed, input_seq=input_seq,
        )
        seq = np.asarray(out["seq"])
        # Fixed positions keep the input tokens exactly.
        assert (seq[:, 5:10] == MPNN_ALPHABET.index("W")).all()
        # Redesigned positions are not all W (temperature 1 sampling).
        assert (seq[:, :5] != MPNN_ALPHABET.index("W")).any()
        # Fixed positions decode first (condition the rest).
        order = np.asarray(out["decoding_order"])
        ranks = np.argsort(order, axis=-1)
        assert ranks[:, 5:10].max() < ranks[:, :5].min()
