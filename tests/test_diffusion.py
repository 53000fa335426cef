"""Diffusion core tests: IGSO3 numerics, R3 closed forms, SE3 composition.

Strategy (SURVEY.md section 4): unit tests against closed forms + limits
(small-sigma Gaussian limit, analytic Gaussian scores), distributional
tests of forward samples against the cached pdf, and reverse-step
invariants (CoM centering).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_diffusion_tpu.config import DiffuserConfig, R3Config, SO3Config
from se3_diffusion_tpu.diffusion import igso3, r3, so3
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.geometry.rigid import Rigid

# Small grid for test speed; numerics scale with grid size only mildly.
SO3_CFG = SO3Config(num_omega=400, num_sigma=100, cache_dir="", series_l=600)
R3_CFG = R3Config()
DIFF_CFG = DiffuserConfig(so3=SO3_CFG, r3=R3_CFG)


@pytest.fixture(scope="module")
def tables():
    return igso3.build_tables(SO3_CFG, cache_dir="")


class TestIGSO3:
    def test_pdf_normalizes(self, tables):
        # Riemann integral of the marginal pdf over (0, pi] should be ~1.
        d_omega = np.pi / SO3_CFG.num_omega
        integrals = np.asarray(tables.pdf).sum(-1) * d_omega
        np.testing.assert_allclose(integrals, 1.0, atol=2e-2)

    def test_small_sigma_gaussian_limit(self, tables):
        # Small-sigma heat-kernel asymptotic on SO(3):
        # f(omega) ~ exp(-omega^2/(2 sigma^2)) * (omega/2)/sin(omega/2), so
        # d/domega log f -> -omega/sigma^2 + 1/omega - cot(omega/2)/2.
        sigma = 0.12
        omegas = np.linspace(0.05, 0.5, 20)
        norms = np.asarray(
            igso3.score_norm_series(
                jnp.asarray(omegas, jnp.float32), jnp.asarray(sigma), 600
            )
        )
        expected = -omegas / sigma**2 + 1.0 / omegas - 0.5 / np.tan(omegas / 2)
        np.testing.assert_allclose(norms, expected, rtol=1e-3)

    def test_interp_matches_series(self, tables):
        # Bilinear table lookup vs live series at off-grid points.
        t = jnp.asarray([0.3, 0.8])
        sig = so3.sigma(SO3_CFG, t)
        omega = jnp.asarray(
            np.random.RandomState(1).uniform(0.1, 3.0, size=(2, 16)), jnp.float32
        )
        interp_vals = igso3.bilinear_lookup(
            tables.score_norms, tables.sigma_grid, tables.omega_grid, sig, omega
        )
        series_vals = igso3.score_norm_series(omega, sig[:, None], 600)
        np.testing.assert_allclose(
            np.asarray(interp_vals), np.asarray(series_vals), rtol=0.05, atol=0.3
        )

    def test_score_is_differentiable_through_table(self, tables):
        def f(vec):
            return jnp.sum(
                so3.score(tables, SO3_CFG, vec, jnp.asarray(0.5)) ** 2
            )

        g = jax.grad(f)(jnp.asarray([[0.3, 0.2, -0.1]]))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.abs(np.asarray(g)) > 0)

    def test_inverse_cdf_sampling_moments(self, tables):
        # Sampled angles should reproduce the table pdf's mean.
        t = jnp.asarray(0.5)
        key = jax.random.PRNGKey(0)
        samples = so3.sample(key, tables, SO3_CFG, t, 20000)
        omegas = np.linalg.norm(np.asarray(samples), axis=-1)
        sig = float(so3.sigma(SO3_CFG, t))
        pdf_row = np.asarray(
            igso3.interp_rows(tables.pdf, tables.sigma_grid, jnp.asarray(sig))
        )
        grid = np.asarray(tables.omega_grid)
        pdf_mean = (grid * pdf_row).sum() / pdf_row.sum()
        assert abs(omegas.mean() - pdf_mean) < 0.02

    def test_sigma_schedule_endpoints(self):
        np.testing.assert_allclose(
            float(so3.sigma(SO3_CFG, jnp.asarray(0.0))), SO3_CFG.min_sigma, atol=1e-5
        )
        np.testing.assert_allclose(
            float(so3.sigma(SO3_CFG, jnp.asarray(1.0))), SO3_CFG.max_sigma, atol=1e-5
        )


class TestR3:
    def test_forward_marginal_moments(self):
        key = jax.random.PRNGKey(1)
        x0 = jnp.ones((1, 2000, 3)) * 5.0  # Angstroms
        t = jnp.asarray([0.5])
        x_t, score_t = r3.forward_marginal(key, R3_CFG, x0, t)
        mb = float(r3.marginal_b_t(R3_CFG, 0.5))
        # Scaled-space moments.
        xs = np.asarray(x_t) * R3_CFG.coordinate_scaling
        expected_mean = np.exp(-0.5 * mb) * 5.0 * R3_CFG.coordinate_scaling
        expected_var = 1 - np.exp(-mb)
        # 6000 iid draws: mean has std ~ sqrt(var/6000) ~ 0.013; use 4 sigma.
        assert abs(xs.mean() - expected_mean) < 0.055
        assert abs(xs.var() - expected_var) < 0.06

    def test_score_closed_form(self):
        x0 = jnp.asarray([[1.0, -2.0, 0.5]])
        xt = jnp.asarray([[0.3, 0.1, -0.2]])
        t = jnp.asarray(0.7)
        got = np.asarray(r3.score(R3_CFG, xt, x0, t))
        mb = float(r3.marginal_b_t(R3_CFG, 0.7))
        expected = -(np.asarray(xt) - np.exp(-0.5 * mb) * np.asarray(x0)) / (
            1 - np.exp(-mb)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_calc_trans_0_inverts_score(self):
        key = jax.random.PRNGKey(2)
        x0 = jax.random.normal(key, (4, 10, 3)) * 10.0
        t = jnp.asarray([0.3, 0.5, 0.7, 0.9])
        x_t, score_t = r3.forward_marginal(key, R3_CFG, x0, t)
        x0_rec = r3.calc_trans_0(
            R3_CFG, score_t, r3.scale(R3_CFG, x_t), t
        )
        np.testing.assert_allclose(
            np.asarray(r3.unscale(R3_CFG, x0_rec)), np.asarray(x0), atol=1e-3
        )

    def test_reverse_step_centers(self):
        key = jax.random.PRNGKey(3)
        x_t = jax.random.normal(key, (2, 50, 3)) * 10.0
        score_t = jnp.zeros_like(x_t)
        out = r3.reverse_step(
            key, R3_CFG, x_t, score_t, jnp.asarray(0.5), 1.0 / 100, center=True
        )
        com = np.asarray(out).mean(axis=-2)
        np.testing.assert_allclose(com, 0.0, atol=1e-4)

    def test_reverse_step_mask_correct_centering(self):
        key = jax.random.PRNGKey(4)
        x_t = jax.random.normal(key, (1, 8, 3))
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], dtype=jnp.float32)
        out = r3.reverse_step(
            key, R3_CFG, x_t, jnp.zeros_like(x_t), jnp.asarray(0.5), 0.01,
            mask=mask, center=True,
        )
        out = np.asarray(out)
        # Masked-out rows unchanged.
        np.testing.assert_allclose(out[0, 4:], np.asarray(x_t)[0, 4:], atol=1e-6)
        # Masked-in rows have zero CoM.
        np.testing.assert_allclose(out[0, :4].mean(0), 0.0, atol=1e-5)


class TestSE3:
    @pytest.fixture(scope="class")
    def diffuser(self, tables):
        return SE3Diffuser(tables=tables, cfg=DIFF_CFG)

    def test_forward_marginal_shapes_and_finiteness(self, diffuser):
        key = jax.random.PRNGKey(0)
        rigids_0 = Rigid.identity((3, 16))
        t = jnp.asarray([0.2, 0.5, 0.9])
        out = diffuser.forward_marginal(key, rigids_0, t)
        assert out["rigids_t"].shape == (3, 16)
        assert out["rot_score"].shape == (3, 16, 3)
        assert out["trans_score"].shape == (3, 16, 3)
        assert out["rot_score_scaling"].shape == (3,)
        for v in jax.tree_util.tree_leaves(out):
            assert np.all(np.isfinite(np.asarray(v)))

    def test_forward_marginal_jits(self, diffuser):
        @jax.jit
        def f(key, rigids, t):
            return diffuser.forward_marginal(key, rigids, t)

        out = f(jax.random.PRNGKey(1), Rigid.identity((2, 8)), jnp.asarray([0.3, 0.6]))
        assert out["rigids_t"].shape == (2, 8)

    def test_calc_rot_score_consistency(self, diffuser):
        # Score computed from (rot_0, rot_t = rot_0 + noise) should equal
        # the forward_marginal's score of the sampled perturbation.
        key = jax.random.PRNGKey(5)
        t = jnp.asarray([0.5])
        rot_sample = so3.sample(key, diffuser.tables, SO3_CFG, t, 32)  # [1,32,3]
        from se3_diffusion_tpu.geometry import quat as ql

        q0 = Rigid.identity((1, 32)).quat
        q_t = ql.rotvec_to_quat(rot_sample)
        got = diffuser.calc_rot_score(q_t, q0, t)
        expected = so3.score(diffuser.tables, SO3_CFG, rot_sample, t)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=1e-2, atol=5e-2
        )

    def test_reverse_step_runs_and_masks(self, diffuser):
        key = jax.random.PRNGKey(6)
        rigids = Rigid.identity((2, 12))
        rot_score = jnp.ones((2, 12, 3)) * 0.1
        trans_score = jnp.ones((2, 12, 3)) * 0.1
        mask = jnp.ones((2, 12)).at[:, 6:].set(0.0)
        out = diffuser.reverse(
            key, rigids, rot_score, trans_score, jnp.asarray(0.8), 0.002,
            diffuse_mask=mask, center=False,
        )
        # Fixed residues (mask 0) keep identity.
        np.testing.assert_allclose(
            np.asarray(out.quat[:, 6:, 0]), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(out.trans[:, 6:]), 0.0, atol=1e-6)

    def test_sample_ref(self, diffuser):
        out = diffuser.sample_ref(jax.random.PRNGKey(7), 64)
        rigids = out["rigids_t"]
        assert rigids.shape == (64,)
        # Translations should be ~N(0, 1/scale) per coordinate.
        std = np.asarray(rigids.trans).std()
        assert abs(std - 1.0 / R3_CFG.coordinate_scaling) < 1.5

    def test_score_scaling_monotone_rot(self, diffuser):
        # Rotation score scaling should decrease with t (wider density).
        s_small, _ = diffuser.score_scaling(jnp.asarray(0.05))
        s_large, _ = diffuser.score_scaling(jnp.asarray(0.95))
        assert float(s_small) > float(s_large)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
