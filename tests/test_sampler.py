"""End-to-end sampler smoke tests + PDB round trips (SURVEY.md section 4.5)."""
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
from se3_diffusion_tpu.models.score_network import init_score_network
from se3_diffusion_tpu.proteins import protein
from se3_diffusion_tpu.sampling import sample_backbones

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
            so3=SO3Config(num_omega=200, num_sigma=50, cache_dir="", series_l=300)
        )
    )
    model, params = init_score_network(jax.random.PRNGKey(0), SMALL_MODEL, 8)
    return diffuser, model, params


class TestSampler:
    def test_sample_shapes_and_finiteness(self, setup):
        diffuser, model, params = setup
        out = sample_backbones(
            jax.random.PRNGKey(1), model, params, diffuser,
            num_res=16, num_samples=2, num_t=5,
        )
        assert out.rigids.shape == (2, 16, 7)
        assert out.atom37.shape == (2, 16, 37, 3)
        assert np.all(np.isfinite(np.asarray(out.atom37)))
        # Quats stay unit through the scan.
        norms = np.linalg.norm(np.asarray(out.rigids[..., :4]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_aux_traj(self, setup):
        diffuser, model, params = setup
        out = sample_backbones(
            jax.random.PRNGKey(2), model, params, diffuser,
            num_res=12, num_samples=1, num_t=4, aux_traj=True,
        )
        assert out.rigid_traj.shape == (5, 1, 12, 7)
        assert out.atom37_traj.shape == (4, 1, 12, 37, 3)
        # Index 0 of the trajectory equals the final sample (flipped order).
        np.testing.assert_allclose(
            np.asarray(out.atom37_traj[0]), np.asarray(out.atom37), atol=1e-5
        )

    def test_deterministic_given_key(self, setup):
        diffuser, model, params = setup
        a = sample_backbones(
            jax.random.PRNGKey(3), model, params, diffuser, 10, 1, num_t=3
        )
        b = sample_backbones(
            jax.random.PRNGKey(3), model, params, diffuser, 10, 1, num_t=3
        )
        np.testing.assert_array_equal(np.asarray(a.atom37), np.asarray(b.atom37))
        c = sample_backbones(
            jax.random.PRNGKey(4), model, params, diffuser, 10, 1, num_t=3
        )
        assert np.abs(np.asarray(a.atom37) - np.asarray(c.atom37)).max() > 1e-3

    def test_com_centered(self, setup):
        diffuser, model, params = setup
        out = sample_backbones(
            jax.random.PRNGKey(5), model, params, diffuser, 24, 1, num_t=6,
        )
        # The final step is an x0 prediction (not centered), but sampled
        # structures should stay near the origin thanks to per-step
        # centering of the chain.
        ca = np.asarray(out.atom37)[0, :, 1]
        assert np.abs(ca.mean(0)).max() < 20.0


class TestPDB:
    def test_pdb_roundtrip(self, setup, tmp_path):
        diffuser, model, params = setup
        out = sample_backbones(
            jax.random.PRNGKey(6), model, params, diffuser, 16, 1, num_t=3
        )
        pdb_str = protein.to_pdb(
            protein.create_protein(np.asarray(out.atom37[0]))
        )
        parsed = protein.from_pdb_string(pdb_str)
        assert parsed.atom_positions.shape[0] == 16
        got = parsed.atom_positions[:, :5]
        want = np.asarray(out.atom37)[0, :, :5]
        mask = parsed.atom_mask[:, :5]
        np.testing.assert_allclose(
            got[mask > 0.5], want[mask > 0.5], atol=2e-3
        )

    def test_write_traj_multi_model(self, setup, tmp_path):
        diffuser, model, params = setup
        out = sample_backbones(
            jax.random.PRNGKey(7), model, params, diffuser, 8, 1, num_t=3,
            aux_traj=True,
        )
        path = protein.write_prot_to_pdb(
            np.asarray(out.atom37_traj)[:, 0], str(tmp_path / "traj.pdb"),
            no_indexing=True,
        )
        text = open(path).read()
        assert text.count("MODEL") == text.count("ENDMDL") == 3


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestProbabilityFlow:
    def test_ode_mode_is_deterministic_across_keys(self, setup):
        """Same init, different scan keys -> identical ODE trajectories."""
        import jax.numpy as jnp
        from se3_diffusion_tpu.sampling.sampler import sample_fn

        diffuser, model, params = setup
        init = (
            diffuser.sample_ref(jax.random.PRNGKey(0), 12)["rigids_t"]
            .to_tensor_7()
            .reshape(1, 12, 7)
        )
        mask = jnp.ones((1, 12))
        fixed = jnp.zeros((1, 12))
        outs = [
            sample_fn(
                params, diffuser, jax.random.PRNGKey(k), init, mask, fixed,
                model=model, num_t=4, probability_flow=True,
            )
            for k in (1, 2)
        ]
        np.testing.assert_array_equal(
            np.asarray(outs[0].atom37), np.asarray(outs[1].atom37)
        )

    def test_sde_mode_differs_across_keys(self, setup):
        import jax.numpy as jnp
        from se3_diffusion_tpu.sampling.sampler import sample_fn

        diffuser, model, params = setup
        init = (
            diffuser.sample_ref(jax.random.PRNGKey(0), 12)["rigids_t"]
            .to_tensor_7()
            .reshape(1, 12, 7)
        )
        mask = jnp.ones((1, 12))
        fixed = jnp.zeros((1, 12))
        outs = [
            sample_fn(
                params, diffuser, jax.random.PRNGKey(k), init, mask, fixed,
                model=model, num_t=4, noise_scale=1.0,
            )
            for k in (1, 2)
        ]
        assert np.abs(
            np.asarray(outs[0].atom37) - np.asarray(outs[1].atom37)
        ).max() > 1e-4


class TestSelfConditioningPriming:
    def test_unprimed_matches_reference_contract(self, setup):
        """prime_self_conditioning=False starts sc_ca_t from zeros (the
        reference's inference_fn behavior); priming is the documented
        framework deviation and must actually change the trajectory."""
        from se3_diffusion_tpu.sampling.sampler import sample_fn

        diffuser, model, params = setup
        # Zero-init "final" layers make the untrained net the identity
        # denoiser (insensitive to sc features); jitter params to get a
        # non-degenerate model.
        keys = iter(
            jax.random.split(
                jax.random.PRNGKey(9),
                len(jax.tree_util.tree_leaves(params)),
            )
        )
        params = jax.tree_util.tree_map(
            lambda p: p + 0.05 * jax.random.normal(next(keys), p.shape, p.dtype),
            params,
        )
        key = jax.random.PRNGKey(3)
        ref = diffuser.sample_ref(key, 2 * 12)["rigids_t"]
        init = ref.to_tensor_7().reshape(2, 12, 7)
        masks = jnp.ones((2, 12), jnp.float32)
        kw = dict(model=model, num_t=4, aux_traj=False)
        primed = sample_fn(
            params, diffuser, key, init, masks, jnp.zeros_like(masks),
            prime_self_conditioning=True, **kw,
        )
        unprimed = sample_fn(
            params, diffuser, key, init, masks, jnp.zeros_like(masks),
            prime_self_conditioning=False, **kw,
        )
        a, b = np.asarray(primed.rigids), np.asarray(unprimed.rigids)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        assert np.abs(a - b).max() > 1e-6


class TestClashGuidance:
    """Reverse-time CA-CA clash guidance (framework addition; weight 0
    keeps reference parity)."""

    def test_runs_finite_and_differs(self, setup):
        diffuser, model, params = setup
        base = sample_backbones(
            jax.random.PRNGKey(5), model, params, diffuser, 12, 1, num_t=6
        )
        guided = sample_backbones(
            jax.random.PRNGKey(5), model, params, diffuser, 12, 1, num_t=6,
            clash_guidance_weight=0.1, clash_guidance_t_max=1.0,
        )
        assert np.all(np.isfinite(np.asarray(guided.atom37)))
        # Random-init predictions are compact enough that the hinge fires;
        # the trajectory must actually change.
        assert (
            np.abs(np.asarray(guided.atom37) - np.asarray(base.atom37)).max()
            > 1e-4
        )
        norms = np.linalg.norm(np.asarray(guided.rigids[..., :4]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_zero_weight_is_exact_parity(self, setup):
        diffuser, model, params = setup
        a = sample_backbones(
            jax.random.PRNGKey(6), model, params, diffuser, 10, 1, num_t=4
        )
        b = sample_backbones(
            jax.random.PRNGKey(6), model, params, diffuser, 10, 1, num_t=4,
            clash_guidance_weight=0.0,
        )
        np.testing.assert_array_equal(np.asarray(a.atom37), np.asarray(b.atom37))

    def test_guidance_pushes_clashing_pair_apart(self, setup):
        """The guidance term alone (huge weight, one step) must increase a
        clashing pair's distance."""
        diffuser, model, params = setup
        from se3_diffusion_tpu.sampling.sampler import sample_fn

        n = 8
        trans = np.stack(
            [np.arange(n) * 3.8, np.zeros(n), np.zeros(n)], axis=-1
        ).astype(np.float32)
        trans[6] = trans[0] + [1.0, 0.0, 0.0]  # deep clash with residue 0
        quats = np.tile([1.0, 0.0, 0.0, 0.0], (n, 1)).astype(np.float32)
        init = jnp.asarray(
            np.concatenate([quats, trans], axis=-1)[None]
        )
        mask = jnp.ones((1, n), jnp.float32)
        # t_max=2.0: the single scanned step runs at t=1.0, and the gate is
        # strict (t < t_max), so 1.0 needs a t_max above it to fire here.
        kw = dict(
            model=model, num_t=2, min_t=0.01, noise_scale=0.0,
            self_condition=False, prime_self_conditioning=False,
            center=False, probability_flow=True, aux_traj=True,
        )
        base = sample_fn(
            params, diffuser, jax.random.PRNGKey(7), init, mask,
            jnp.zeros_like(mask), **kw,
        )
        guided = sample_fn(
            params, diffuser, jax.random.PRNGKey(7), init, mask,
            jnp.zeros_like(mask), clash_guidance_weight=50.0,
            clash_guidance_t_max=2.0, **kw,
        )
        # rigid_traj index -2 = state after the first reverse step
        # (index -1 = init; the trajectory is flipped).
        def d06(traj):
            tr = np.asarray(traj)[-2, 0, :, 4:]
            return np.linalg.norm(tr[0] - tr[6])

        assert d06(guided.rigid_traj) > d06(base.rigid_traj)


class TestPartialDiffusion:
    """diversify_backbones: partial reverse from a forward-noised input
    (framework addition — RFdiffusion-style partial_T; no reference
    counterpart in FrameDiff)."""

    def _input(self, n=14):
        from tests.helpers import build_backbone

        atom37, mask37 = build_backbone(n)
        return np.asarray(atom37), np.asarray(mask37)

    def test_shapes_determinism_and_finiteness(self, setup):
        from se3_diffusion_tpu.sampling import diversify_backbones

        diffuser, model, params = setup
        atom37, mask37 = self._input()
        out1 = diversify_backbones(
            jax.random.PRNGKey(3), model, params, diffuser, atom37, mask37,
            t_start=0.5, num_samples=2, num_t=8,
        )
        out2 = diversify_backbones(
            jax.random.PRNGKey(3), model, params, diffuser, atom37, mask37,
            t_start=0.5, num_samples=2, num_t=8,
        )
        assert out1.atom37.shape == (2, 14, 37, 3)
        assert np.all(np.isfinite(np.asarray(out1.atom37)))
        np.testing.assert_allclose(
            np.asarray(out1.rigids), np.asarray(out2.rigids), atol=0
        )
        # num_t * t_start reverse steps: 8 * 0.5 = 4, +init/final in traj.
        traj = diversify_backbones(
            jax.random.PRNGKey(4), model, params, diffuser, atom37, mask37,
            t_start=0.5, num_samples=1, num_t=8, aux_traj=True,
        )
        assert traj.rigid_traj.shape[0] == 5

    def test_small_t_start_stays_near_input(self, setup):
        """Freshly-initialized score/update heads are zero-init (reference
        ipa_pytorch 'final' init), so the reverse process is near-identity:
        the diversified structure's distance to the input must grow with
        t_start (small t_start = local resampling, 1.0 = from scratch)."""
        from se3_diffusion_tpu.evaluation import metrics as metrics_lib
        from se3_diffusion_tpu.sampling import diversify_backbones

        diffuser, model, params = setup
        atom37, mask37 = self._input(16)
        ca_in = atom37[:, 1] - atom37[:, 1].mean(0)
        rmsds = {}
        for t_start in (0.05, 1.0):
            out = diversify_backbones(
                jax.random.PRNGKey(7), model, params, diffuser, atom37,
                mask37, t_start=t_start, num_samples=1, num_t=20,
            )
            ca_out = np.asarray(out.atom37[0, :, 1], np.float64)
            rmsds[t_start] = metrics_lib.calc_aligned_rmsd(ca_out, ca_in)
        # Measured on this fixed seed: ~3.0 A at t_start=0.05 vs ~6.8 A
        # from scratch. (No monotone claim at intermediate t_start: with
        # untrained weights the reverse drift's contraction strength also
        # varies with leg length.)
        assert rmsds[0.05] < 0.8 * rmsds[1.0]
        assert rmsds[0.05] < 4.5  # local perturbation, not a new fold

    def test_t_start_one_matches_unconditional_grid(self, setup):
        """sample_fn with t_start=1.0 must be bit-identical to the default
        (the partial-diffusion generalization cannot perturb the
        reference-parity unconditional path)."""
        from se3_diffusion_tpu.sampling import sample_fn

        diffuser, model, params = setup
        key = jax.random.PRNGKey(11)
        ref = diffuser.sample_ref(jax.random.PRNGKey(12), 2 * 12)["rigids_t"]
        init = ref.to_tensor_7().reshape(2, 12, 7)
        res_mask = jnp.ones((2, 12), jnp.float32)
        fixed = jnp.zeros_like(res_mask)
        a = sample_fn(
            params, diffuser, key, init, res_mask, fixed, model=model,
            num_t=4,
        )
        b = sample_fn(
            params, diffuser, key, init, res_mask, fixed, model=model,
            num_t=4, t_start=1.0,
        )
        np.testing.assert_array_equal(np.asarray(a.rigids), np.asarray(b.rigids))
