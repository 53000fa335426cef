"""AOT export/serving tests: serialize sampler, reload, run, compare."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_diffusion_tpu.config import DiffuserConfig, IpaConfig, ModelConfig, SO3Config
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.models.score_network import init_score_network
from se3_diffusion_tpu.sampling import sample_backbones
from se3_diffusion_tpu.serving import SamplerSpec, load_sampler, export_sampler

SMALL_MODEL = ModelConfig(
    node_embed_size=32,
    edge_embed_size=16,
    ipa=IpaConfig(
        c_s=32, c_z=16, c_hidden=16, c_skip=8, no_heads=2, no_qk_points=4,
        no_v_points=6, seq_tfmr_num_heads=2, seq_tfmr_num_layers=1,
        num_blocks=2,
    ),
)


def test_export_roundtrip(tmp_path):
    diffuser = SE3Diffuser.create(
        DiffuserConfig(
            so3=SO3Config(num_omega=100, num_sigma=50, cache_dir="", series_l=200)
        )
    )
    model, params = init_score_network(jax.random.PRNGKey(0), SMALL_MODEL, 8)
    spec = SamplerSpec(num_res=16, num_samples=2, num_t=3)
    blob = export_sampler(model, params, diffuser, spec)
    assert len(blob) > 10000

    call, spec2 = load_sampler(blob)
    assert spec2 == spec
    key = jax.random.PRNGKey(7)
    out = call(jax.random.key_data(key) if hasattr(jax.random, "key_data") else key)
    assert out["atom37"].shape == (2, 16, 37, 3)

    # Exported program reproduces the library path exactly (same key).
    ref = sample_backbones(
        key, model, params, diffuser, num_res=16, num_samples=2, num_t=3
    )
    # AOT re-lowering targets slightly different machine features than
    # the interactive program; agreement is fp-level, not bitwise.
    np.testing.assert_allclose(
        np.asarray(out["atom37"]), np.asarray(ref.atom37), atol=1e-3
    )


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="artifact"):
        load_sampler(b"garbage")
