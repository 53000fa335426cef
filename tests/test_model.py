"""Model tests: IPA SE(3) invariance/equivariance, masking, full forward.

Invariance under global rigid motions is the load-bearing correctness
property of IPA (it is what the architecture exists to provide) and a far
stronger check than golden values: any error in frame lifts, point
attention, or local-coordinate outputs breaks it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_diffusion_tpu.config import IpaConfig, ModelConfig, SO3Config, DiffuserConfig
from se3_diffusion_tpu.diffusion import igso3
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.geometry import quat as ql
from se3_diffusion_tpu.geometry.rigid import Rigid
from se3_diffusion_tpu.models.ipa import InvariantPointAttention, IpaTrunk
from se3_diffusion_tpu.models.score_network import (
    ScoreNetwork,
    dummy_features,
    score_network_forward,
)
from se3_diffusion_tpu.proteins import backbone

# Small dims for test speed; same structure as the real config.
SMALL_IPA = IpaConfig(
    c_s=32, c_z=16, c_hidden=24, c_skip=8, no_heads=2, no_qk_points=4,
    no_v_points=6, seq_tfmr_num_heads=2, seq_tfmr_num_layers=1, num_blocks=2,
)
SMALL_MODEL = ModelConfig(node_embed_size=32, edge_embed_size=16, ipa=SMALL_IPA)


def random_rigid(key, shape):
    k1, k2 = jax.random.split(key)
    q = ql.quat_normalize(jax.random.normal(k1, shape + (4,)))
    t = jax.random.normal(k2, shape + (3,)) * 5.0
    return Rigid(quat=q, trans=t)


def global_transform(key):
    k1, k2 = jax.random.split(key)
    q = ql.quat_normalize(jax.random.normal(k1, (4,)))
    t = jax.random.normal(k2, (3,)) * 3.0
    return Rigid(quat=q, trans=t)


class TestIPAInvariance:
    def test_ipa_output_invariant_under_global_motion(self):
        key = jax.random.PRNGKey(0)
        b, n = 2, 12
        s = jax.random.normal(key, (b, n, SMALL_IPA.c_s))
        z = jax.random.normal(key, (b, n, n, SMALL_IPA.c_z))
        mask = jnp.ones((b, n))
        frames = random_rigid(jax.random.PRNGKey(1), (b, n))

        ipa = InvariantPointAttention(SMALL_IPA)
        params = ipa.init(jax.random.PRNGKey(2), s, z, frames, mask)

        out1 = ipa.apply(params, s, z, frames, mask)
        g = global_transform(jax.random.PRNGKey(3))
        moved = Rigid(
            quat=ql.quat_multiply(g.quat[None, None], frames.quat),
            trans=g.apply(frames.trans),
        )
        out2 = ipa.apply(params, s, z, moved, mask)
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out2), atol=2e-4
        )

    def test_trunk_equivariance(self):
        key = jax.random.PRNGKey(0)
        b, n = 1, 10
        node = jax.random.normal(key, (b, n, SMALL_MODEL.node_embed_size))
        edge = jax.random.normal(key, (b, n, n, SMALL_MODEL.edge_embed_size))
        mask = jnp.ones((b, n))
        frames = random_rigid(jax.random.PRNGKey(1), (b, n))

        trunk = IpaTrunk(SMALL_MODEL)
        params = trunk.init(jax.random.PRNGKey(2), node, edge, frames, mask, mask)

        out1, psi1, _ = trunk.apply(params, node, edge, frames, mask, mask)
        g = global_transform(jax.random.PRNGKey(3))
        moved = Rigid(
            quat=ql.quat_multiply(g.quat[None, None], frames.quat),
            trans=g.apply(frames.trans),
        )
        out2, psi2, _ = trunk.apply(params, node, edge, moved, mask, mask)

        # psi is invariant; predicted frames are equivariant: out2 = g o out1.
        np.testing.assert_allclose(np.asarray(psi1), np.asarray(psi2), atol=2e-4)
        expected_trans = g.apply(out1.trans)
        np.testing.assert_allclose(
            np.asarray(out2.trans), np.asarray(expected_trans), atol=2e-3
        )
        expected_quat = ql.quat_multiply(g.quat[None, None], out1.quat)
        # Quats defined up to sign.
        q_got, q_exp = np.asarray(out2.quat), np.asarray(expected_quat)
        sign = np.sign((q_got * q_exp).sum(-1, keepdims=True))
        np.testing.assert_allclose(q_got, q_exp * sign, atol=2e-3)

    def test_padding_invariance(self):
        # Outputs on real residues must not depend on padded rows.
        key = jax.random.PRNGKey(0)
        n_real, n_pad = 8, 12
        s = jax.random.normal(key, (1, n_real, SMALL_IPA.c_s))
        z = jax.random.normal(key, (1, n_real, n_real, SMALL_IPA.c_z))
        frames = random_rigid(jax.random.PRNGKey(1), (1, n_real))
        mask_real = jnp.ones((1, n_real))

        ipa = InvariantPointAttention(SMALL_IPA)
        params = ipa.init(jax.random.PRNGKey(2), s, z, frames, mask_real)
        out_small = ipa.apply(params, s, z, frames, mask_real)

        # Same inputs padded with garbage rows behind a 0 mask.
        pad = n_pad - n_real
        s_p = jnp.concatenate([s, jnp.ones((1, pad, SMALL_IPA.c_s)) * 7.0], axis=1)
        z_p = jnp.zeros((1, n_pad, n_pad, SMALL_IPA.c_z))
        z_p = z_p.at[:, :n_real, :n_real].set(z).at[:, n_real:, n_real:].set(3.0)
        frames_p = Rigid(
            quat=jnp.concatenate(
                [frames.quat, Rigid.identity((1, pad)).quat], axis=1
            ),
            trans=jnp.concatenate(
                [frames.trans, jnp.ones((1, pad, 3)) * 50.0], axis=1
            ),
        )
        mask_p = jnp.concatenate([mask_real, jnp.zeros((1, pad))], axis=1)
        out_padded = ipa.apply(params, s_p, z_p, frames_p, mask_p)
        np.testing.assert_allclose(
            np.asarray(out_small), np.asarray(out_padded[:, :n_real]), atol=1e-5
        )


class TestScoreNetwork:
    @pytest.fixture(scope="class")
    def diffuser(self):
        cfg = DiffuserConfig(
            so3=SO3Config(num_omega=200, num_sigma=50, cache_dir="", series_l=300)
        )
        return SE3Diffuser.create(cfg)

    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = ScoreNetwork(SMALL_MODEL)
        feats = dummy_features(2, 12)
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        return model, params

    def test_forward_contract(self, model_and_params, diffuser):
        model, params = model_and_params
        feats = dummy_features(2, 12)
        feats["rigids_t"] = (
            diffuser.sample_ref(jax.random.PRNGKey(1), 24)["rigids_t"]
            .to_tensor_7()
            .reshape(2, 12, 7)
        )
        out = score_network_forward(model, params, feats, diffuser)
        assert out["psi"].shape == (2, 12, 2)
        assert out["rot_score"].shape == (2, 12, 3)
        assert out["trans_score"].shape == (2, 12, 3)
        assert out["rigids"].shape == (2, 12, 7)
        assert out["atom37"].shape == (2, 12, 37, 3)
        assert out["atom14"].shape == (2, 12, 14, 3)
        for k in ("psi", "rot_score", "trans_score", "rigids", "atom37"):
            assert np.all(np.isfinite(np.asarray(out[k]))), k

    def test_forward_jits(self, model_and_params, diffuser):
        model, params = model_and_params
        feats = dummy_features(1, 8)

        fwd = jax.jit(
            lambda p, f: score_network_forward(model, p, f, diffuser)
        )
        out = fwd(params, feats)
        assert out["rigids"].shape == (1, 8, 7)

    def test_full_size_param_count(self):
        # The production config should land in the reference's ~17M range.
        model = ScoreNetwork(ModelConfig())
        feats = dummy_features(1, 8)
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        assert 5e6 < n_params < 5e7, n_params


class TestBackbone:
    def test_ideal_geometry(self):
        rigids = Rigid.identity((1, 4))
        psi = jnp.tile(jnp.asarray([[0.0, 1.0]]), (1, 4, 1))  # psi = 0
        atom37, mask, atom14 = backbone.compute_backbone(rigids, psi)
        pos = np.asarray(atom37)[0, 0]
        n_ca = np.linalg.norm(pos[0] - pos[1])
        ca_c = np.linalg.norm(pos[1] - pos[2])
        c_o = np.linalg.norm(pos[2] - pos[4])
        assert abs(n_ca - 1.459) < 5e-3
        assert abs(ca_c - 1.526) < 1e-5
        assert abs(c_o - 1.233) < 5e-3
        # atom37 mask: slots 0-4 present except CA at the origin... CA of an
        # identity frame sits at 0 so the nonzero convention drops it, same
        # as the reference.
        assert np.asarray(mask)[0, 0, 5:].sum() == 0

    def test_psi_moves_only_oxygen(self):
        rigids = Rigid.identity((1, 1))
        psi_a = jnp.asarray([[[0.0, 1.0]]])
        psi_b = jnp.asarray([[[1.0, 0.0]]])
        a37_a, _, _ = backbone.compute_backbone(rigids, psi_a)
        a37_b, _, _ = backbone.compute_backbone(rigids, psi_b)
        diff = np.abs(np.asarray(a37_a) - np.asarray(a37_b))[0, 0]
        np.testing.assert_allclose(diff[:4], 0.0, atol=1e-6)  # N CA C CB fixed
        assert diff[4].max() > 0.1  # O moves
        # C-O bond length invariant under psi.
        c = np.asarray(a37_a)[0, 0, 2]
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(a37_a)[0, 0, 4] - c),
            np.linalg.norm(np.asarray(a37_b)[0, 0, 4] - c),
            atol=1e-5,
        )

    def test_equivariance(self):
        key = jax.random.PRNGKey(0)
        frames = random_rigid(key, (1, 5))
        psi = jnp.tile(jnp.asarray([[0.6, 0.8]]), (1, 5, 1))
        a37, _, _ = backbone.compute_backbone(frames, psi)
        g = global_transform(jax.random.PRNGKey(1))
        moved = Rigid(
            quat=ql.quat_multiply(g.quat[None, None], frames.quat),
            trans=g.apply(frames.trans),
        )
        a37_m, _, _ = backbone.compute_backbone(moved, psi)
        expected = g.apply(a37.reshape(-1, 3)).reshape(a37.shape)
        # Only compare placed atoms (slots 0-4).
        np.testing.assert_allclose(
            np.asarray(a37_m)[..., :5, :], np.asarray(expected)[..., :5, :],
            atol=1e-4,
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
