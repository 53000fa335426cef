"""bf16 activation-policy tests: agreement with fp32 + invariance holds."""
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
    ScoreNetwork,
    dummy_features,
    score_network_forward,
)

SMALL_IPA = IpaConfig(
    c_s=32, c_z=16, c_hidden=24, c_skip=8, no_heads=2, no_qk_points=4,
    no_v_points=6, seq_tfmr_num_heads=2, seq_tfmr_num_layers=1, num_blocks=2,
)


@pytest.fixture(scope="module")
def diffuser():
    return SE3Diffuser.create(
        DiffuserConfig(
            so3=SO3Config(num_omega=100, num_sigma=50, cache_dir="", series_l=200)
        )
    )


def test_bf16_matches_fp32(diffuser):
    cfg32 = ModelConfig(node_embed_size=32, edge_embed_size=16, ipa=SMALL_IPA)
    cfg16 = ModelConfig(
        node_embed_size=32, edge_embed_size=16, ipa=SMALL_IPA,
        activation_dtype="bfloat16",
    )
    m32, m16 = ScoreNetwork(cfg32), ScoreNetwork(cfg16)
    feats = dummy_features(2, 16)
    feats["rigids_t"] = (
        diffuser.sample_ref(jax.random.PRNGKey(0), 32)["rigids_t"]
        .to_tensor_7()
        .reshape(2, 16, 7)
    )
    params = m32.init(jax.random.PRNGKey(1), feats)["params"]

    out32 = score_network_forward(m32, params, feats, diffuser)
    out16 = score_network_forward(m16, params, feats, diffuser)

    # Outputs must be float32 regardless of policy.
    assert out16["rigids"].dtype == jnp.float32
    assert out16["atom37"].dtype == jnp.float32
    # Agreement: loose tolerance, bf16 has ~3 significant digits.
    np.testing.assert_allclose(
        np.asarray(out16["rigids"][..., 4:]),
        np.asarray(out32["rigids"][..., 4:]),
        atol=0.15,
    )
    np.testing.assert_allclose(
        np.asarray(out16["psi"]), np.asarray(out32["psi"]), atol=0.1
    )


def test_bf16_invariance_preserved(diffuser):
    """SE(3) invariance must survive the mixed-precision path."""
    from se3_diffusion_tpu.geometry import quat as ql
    from se3_diffusion_tpu.geometry.rigid import Rigid
    from se3_diffusion_tpu.models.ipa import InvariantPointAttention
    import dataclasses

    ipa_conf = dataclasses.replace(SMALL_IPA)
    key = jax.random.PRNGKey(0)
    b, n = 1, 10
    s = jax.random.normal(key, (b, n, ipa_conf.c_s))
    z = jax.random.normal(key, (b, n, n, ipa_conf.c_z))
    mask = jnp.ones((b, n))
    frames = Rigid(
        quat=ql.quat_normalize(jax.random.normal(key, (b, n, 4))),
        trans=jax.random.normal(jax.random.PRNGKey(1), (b, n, 3)) * 5.0,
    )
    ipa = InvariantPointAttention(ipa_conf, dtype=jnp.bfloat16)
    params = ipa.init(jax.random.PRNGKey(2), s, z, frames, mask)
    out1 = ipa.apply(params, s, z, frames, mask)
    g_q = ql.quat_normalize(jax.random.normal(jax.random.PRNGKey(3), (4,)))
    g_t = jnp.asarray([3.0, -2.0, 1.0])
    moved = Rigid(
        quat=ql.quat_multiply(g_q[None, None], frames.quat),
        trans=ql.rot_apply(ql.quat_to_rotmat(g_q), frames.trans) + g_t,
    )
    out2 = ipa.apply(params, s, z, moved, mask)
    np.testing.assert_allclose(
        np.asarray(out1, np.float32), np.asarray(out2, np.float32), atol=0.05
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
