"""Fused Pallas IPA attention vs the XLA reference path.

Runs in interpret mode on CPU (the driver benches the compiled kernel on
real TPU); the XLA path is the correctness oracle (SURVEY.md build plan
step 6: kernels must be checked against the XLA path).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_diffusion_tpu.config import IpaConfig
from se3_diffusion_tpu.geometry import quat as ql
from se3_diffusion_tpu.geometry.rigid import Rigid
from se3_diffusion_tpu.models.ipa import InvariantPointAttention

IPA_XLA = IpaConfig(
    c_s=32, c_z=16, c_hidden=16, c_skip=8, no_heads=2, no_qk_points=4,
    no_v_points=6, seq_tfmr_num_heads=2, seq_tfmr_num_layers=1, num_blocks=2,
    attention_impl="xla",
)
IPA_PALLAS = dataclasses.replace(IPA_XLA, attention_impl="pallas")


def _inputs(key, b, n, conf):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = jax.random.normal(k1, (b, n, conf.c_s))
    z = jax.random.normal(k2, (b, n, n, conf.c_z))
    frames = Rigid(
        quat=ql.quat_normalize(jax.random.normal(k3, (b, n, 4))),
        trans=jax.random.normal(k4, (b, n, 3)) * 5.0,
    )
    return s, z, frames


class TestPallasEquivalence:
    @pytest.mark.parametrize("n", [16, 24])
    def test_matches_xla_path(self, n):
        s, z, frames = _inputs(jax.random.PRNGKey(0), 2, n, IPA_XLA)
        mask = jnp.ones((2, n))
        xla_mod = InvariantPointAttention(IPA_XLA)
        params = xla_mod.init(jax.random.PRNGKey(1), s, z, frames, mask)
        # Make head weights + out weights nontrivial (zero-init otherwise).
        params = jax.tree_util.tree_map(
            lambda x: x
            + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
            params,
        )
        out_xla = xla_mod.apply(params, s, z, frames, mask)
        out_pl = InvariantPointAttention(IPA_PALLAS).apply(
            params, s, z, frames, mask
        )
        np.testing.assert_allclose(
            np.asarray(out_xla), np.asarray(out_pl), atol=2e-4
        )

    def test_matches_with_padding_mask(self):
        # n=20 with 6 masked rows; pallas pads to tile internally.
        n = 20
        s, z, frames = _inputs(jax.random.PRNGKey(3), 1, n, IPA_XLA)
        mask = jnp.ones((1, n)).at[:, 14:].set(0.0)
        xla_mod = InvariantPointAttention(IPA_XLA)
        params = xla_mod.init(jax.random.PRNGKey(4), s, z, frames, mask)
        params = jax.tree_util.tree_map(
            lambda x: x
            + 0.05 * jax.random.normal(jax.random.PRNGKey(5), x.shape),
            params,
        )
        out_xla = xla_mod.apply(params, s, z, frames, mask)
        out_pl = InvariantPointAttention(IPA_PALLAS).apply(
            params, s, z, frames, mask
        )
        np.testing.assert_allclose(
            np.asarray(out_xla[:, :14]), np.asarray(out_pl[:, :14]), atol=2e-4
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
