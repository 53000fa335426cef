"""Sequence-parallel (sp) pair-sharding tests on the virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_diffusion_tpu.config import (
    DiffuserConfig,
    IpaConfig,
    ModelConfig,
    SO3Config,
)
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.models.score_network import (
    dummy_features,
    init_score_network,
    score_network_forward,
)
from se3_diffusion_tpu.parallel.mesh import SP_AXIS, create_mesh
from se3_diffusion_tpu.parallel.sp import annotate_pair, pair_sharding

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
def setup():
    diffuser = SE3Diffuser.create(
        DiffuserConfig(
            so3=SO3Config(num_omega=100, num_sigma=50, cache_dir="",
                          series_l=200)
        )
    )
    model, params = init_score_network(jax.random.PRNGKey(0), SMALL_MODEL, 8)
    return diffuser, model, params


def _feats(batch=2, num_res=16):
    feats = dummy_features(batch, num_res)
    key = jax.random.PRNGKey(1)
    feats["rigids_t"] = feats["rigids_t"].at[..., 4:].set(
        jax.random.normal(key, (batch, num_res, 3)) * 5.0
    )
    feats["t"] = jnp.full((batch,), 0.5)
    return feats


class TestAnnotatePair:
    def test_identity_without_mesh(self):
        x = jnp.ones((2, 8, 8, 4))
        assert annotate_pair(x) is x

    def test_output_sharded_under_mesh(self, setup):
        mesh = create_mesh(jax.devices()[:8], sp_size=4)

        @jax.jit
        def f(x):
            return annotate_pair(x)

        with pair_sharding(mesh):
            out = f(jnp.ones((2, 8, 8, 4)))
        # Row axis is sharded over sp.
        spec = out.sharding.spec
        assert spec[1] == SP_AXIS

    def test_sp1_mesh_is_identity(self):
        mesh = create_mesh(jax.devices()[:8], sp_size=1)
        x = jnp.ones((2, 8, 8, 4))
        with pair_sharding(mesh):
            assert annotate_pair(x) is x


class TestSpForwardEquivalence:
    def test_forward_matches_unsharded(self, setup):
        """The sp-annotated forward is numerically the unsharded forward:
        GSPMD inserts collectives, not approximations."""
        diffuser, model, params = setup
        feats = _feats()

        def fwd(params, feats):
            out = score_network_forward(model, params, feats, diffuser)
            return out["rigids"], out["psi"], out["rot_score"]

        want = jax.jit(fwd)(params, feats)

        mesh = create_mesh(jax.devices()[:8], sp_size=4)
        with pair_sharding(mesh):
            got = jax.jit(fwd)(params, feats)
        for w, g in zip(want, got):
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(g), atol=2e-5, rtol=1e-5
            )

    def test_sampler_under_sp(self, setup):
        """Full lax.scan sampler compiles + runs with sp sharding armed."""
        from se3_diffusion_tpu.sampling import sample_backbones

        diffuser, model, params = setup
        mesh = create_mesh(jax.devices()[:8], sp_size=8)
        with pair_sharding(mesh):
            out = sample_backbones(
                jax.random.PRNGKey(2), model, params, diffuser,
                num_res=16, num_samples=2, num_t=3,
            )
        assert np.isfinite(np.asarray(out.atom37)).all()

    def test_sampler_sp2_at_1024_residues(self, setup):
        """The >512 mechanism demonstrated AT LENGTH: N=1024 is 2x the
        reference's hard 512-residue wall (`config/base.yaml:11`); the
        O(N^2) pair activations shard row-wise over sp=2 and the full
        reverse scan runs end-to-end on the virtual mesh."""
        from se3_diffusion_tpu.sampling import sample_backbones

        diffuser, model, params = setup
        mesh = create_mesh(jax.devices()[:8], sp_size=2)
        with pair_sharding(mesh):
            out = sample_backbones(
                jax.random.PRNGKey(5), model, params, diffuser,
                num_res=1024, num_samples=1, num_t=2,
            )
        atom37 = np.asarray(out.atom37)
        assert atom37.shape[:2] == (1, 1024)
        assert np.isfinite(atom37).all()


class TestSpTrainStep:
    def test_dp_sp_train_step(self, setup):
        """dp x sp mesh: dp-sharded batch + sp-sharded pair activations in
        one jitted train step (the dryrun_multichip contract)."""
        from se3_diffusion_tpu.config import Config
        from se3_diffusion_tpu.geometry import quat as ql
        from se3_diffusion_tpu.geometry.rigid import Rigid
        from se3_diffusion_tpu.models.score_network import ScoreNetwork
        from se3_diffusion_tpu.parallel.mesh import replicate, shard_batch
        from se3_diffusion_tpu.training import (
            create_train_state,
            make_train_step,
        )

        diffuser, _, _ = setup
        cfg = Config(
            model=SMALL_MODEL,
            diffuser=DiffuserConfig(
                so3=SO3Config(num_omega=100, num_sigma=50, cache_dir="",
                              series_l=200)
            ),
        )
        mesh = create_mesh(jax.devices()[:8], sp_size=2)  # dp=4 x sp=2
        model = ScoreNetwork(cfg.model)
        state = create_train_state(jax.random.PRNGKey(0), cfg, model, 12)
        step = make_train_step(model, cfg, mesh=mesh)

        bsz, num_res = 4, 12
        key = jax.random.PRNGKey(1)
        quats = ql.quat_normalize(jax.random.normal(key, (bsz, num_res, 4)))
        trans = jax.random.normal(key, (bsz, num_res, 3)) * 5.0
        batch = {
            "rigids_0": Rigid(quat=quats, trans=trans).to_tensor_7(),
            "res_mask": jnp.ones((bsz, num_res), jnp.float32),
            "fixed_mask": jnp.zeros((bsz, num_res), jnp.float32),
            "seq_idx": jnp.tile(jnp.arange(num_res)[None], (bsz, 1)),
            "torsion_angles_sin_cos": jnp.zeros((bsz, num_res, 7, 2)),
        }
        batch = shard_batch(mesh, batch)
        state = replicate(mesh, state)
        diffuser_r = replicate(mesh, diffuser)
        state, aux = step(state, diffuser_r, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(aux["loss"]))
        assert int(state.step) == 1


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
