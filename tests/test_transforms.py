"""Round-trip tests: frames+psi -> atoms -> frames+psi.

The decisive consistency property: features extracted from coordinates
produced by `compute_backbone` must reproduce the generating frames and
psi. This pins the AF2 sign/axis conventions without golden files.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_diffusion_tpu.geometry import quat as ql
from se3_diffusion_tpu.geometry.rigid import Rigid
from se3_diffusion_tpu.proteins import backbone, transforms


def random_frames(key, shape):
    k1, k2 = jax.random.split(key)
    return Rigid(
        quat=ql.quat_normalize(jax.random.normal(k1, shape + (4,))),
        trans=jax.random.normal(k2, shape + (3,)) * 8.0,
    )


class TestRoundTrip:
    def test_frames_roundtrip(self):
        frames = random_frames(jax.random.PRNGKey(0), (2, 16))
        psi = jnp.tile(jnp.asarray([0.6, 0.8]), (2, 16, 1))
        atom37, mask, _ = backbone.compute_backbone(frames, psi)
        rec, rec_mask = transforms.backbone_frames_from_atom37(atom37, mask)
        np.testing.assert_allclose(np.asarray(rec_mask), 1.0)
        np.testing.assert_allclose(
            np.asarray(rec.trans), np.asarray(frames.trans), atol=1e-4
        )
        q_got, q_exp = np.asarray(rec.quat), np.asarray(frames.quat)
        sign = np.sign((q_got * q_exp).sum(-1, keepdims=True))
        np.testing.assert_allclose(q_got, q_exp * sign, atol=2e-3)

    def test_psi_roundtrip(self):
        angles = np.linspace(-3.0, 3.0, 16, dtype=np.float32)
        psi_in = jnp.stack(
            [jnp.sin(jnp.asarray(angles)), jnp.cos(jnp.asarray(angles))], axis=-1
        )[None]
        frames = random_frames(jax.random.PRNGKey(1), (1, 16))
        atom37, mask, _ = backbone.compute_backbone(frames, psi_in)
        psi_out, psi_mask = transforms.psi_from_atom37(atom37, mask)
        np.testing.assert_allclose(np.asarray(psi_mask), 1.0)
        np.testing.assert_allclose(
            np.asarray(psi_out), np.asarray(psi_in), atol=2e-3
        )

    def test_ideal_geometry_gives_identity_frame(self):
        # Atoms at the idealized local coordinates -> identity frame.
        atom37 = jnp.zeros((1, 37, 3))
        atom37 = atom37.at[0, 0].set(jnp.asarray(backbone.N_LOCAL))
        atom37 = atom37.at[0, 1].set(jnp.asarray(backbone.CA_LOCAL))
        atom37 = atom37.at[0, 2].set(jnp.asarray(backbone.C_LOCAL))
        mask = jnp.zeros((1, 37)).at[0, :3].set(1.0)
        frames, fmask = transforms.backbone_frames_from_atom37(atom37, mask)
        np.testing.assert_allclose(np.asarray(fmask), 1.0)
        np.testing.assert_allclose(
            np.asarray(frames.quat), [[1.0, 0, 0, 0]], atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(frames.trans), 0.0, atol=1e-6)

    def test_chain_features_centering_and_masks(self):
        frames = random_frames(jax.random.PRNGKey(2), (1, 12))
        psi = jnp.tile(jnp.asarray([0.0, 1.0]), (1, 12, 1))
        atom37, mask, _ = backbone.compute_backbone(frames, psi)
        atom37 = atom37 + 100.0 * mask[..., None]  # big offset
        feats = transforms.chain_features_from_atom37(atom37, mask)
        ca = np.asarray(feats["atom37"])[0, :, 1]
        np.testing.assert_allclose(ca.mean(0), 0.0, atol=1e-3)
        assert feats["rigids_0"].shape == (1, 12, 7)
        np.testing.assert_allclose(np.asarray(feats["res_mask"]), 1.0)
        # psi slot populated, others zero.
        t = np.asarray(feats["torsion_angles_sin_cos"])
        assert np.abs(t[..., 2, :]).max() > 0.1
        assert np.abs(t[..., [0, 1, 3, 4, 5, 6], :]).max() == 0.0


class TestNumpyTwin:
    """proteins/transforms_np must bit-match the jax transforms — it is
    what the dataset host path actually runs."""

    def test_chain_features_parity(self):
        from se3_diffusion_tpu.proteins import transforms_np

        frames = random_frames(jax.random.PRNGKey(7), (2, 24))
        psi = jnp.tile(jnp.asarray([0.6, 0.8]), (2, 24, 1))
        atom37, mask, _ = backbone.compute_backbone(frames, psi)
        atom37 = np.asarray(atom37) + 3.0
        mask = np.asarray(mask)
        a = transforms.chain_features_from_atom37(
            jnp.asarray(atom37), jnp.asarray(mask)
        )
        b = transforms_np.chain_features_from_atom37_np(atom37, mask)
        for k in ("atom37", "rigids_0", "res_mask",
                  "torsion_angles_sin_cos", "torsion_angles_mask"):
            np.testing.assert_allclose(
                np.asarray(a[k]), b[k], atol=1e-5, err_msg=k
            )

    def test_degenerate_points_no_nan(self):
        from se3_diffusion_tpu.proteins import transforms_np

        atom37 = np.zeros((4, 37, 3), np.float32)  # all atoms coincide
        mask = np.ones((4, 37), np.float32)
        out = transforms_np.chain_features_from_atom37_np(atom37, mask)
        for k, v in out.items():
            assert np.all(np.isfinite(v)), k


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
