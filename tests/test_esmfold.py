"""ESMFold port tests: ESM-2 semantics, trunk/SM shapes, masking,
recycling, converter plumbing, folder adapters."""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_diffusion_tpu.models import esm2 as esm2_lib
from se3_diffusion_tpu.models.esmfold import (
    ESMFold,
    categorical_lddt,
    compute_tm,
    esmfold_tiny_config,
    init_esmfold,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = esmfold_tiny_config()
    model, params = init_esmfold(jax.random.PRNGKey(0), cfg, num_res=10)
    return cfg, model, params


def _inputs(b, n, seed=0, lengths=None):
    rng = np.random.RandomState(seed)
    aatype = jnp.asarray(rng.randint(0, 20, (b, n)), jnp.int32)
    mask = np.ones((b, n), np.float32)
    if lengths is not None:
        for i, l in enumerate(lengths):
            mask[i, l:] = 0.0
    return aatype, jnp.asarray(mask)


class TestESMFoldForward:
    def test_shapes_and_finite(self, tiny):
        _, model, params = tiny
        aatype, mask = _inputs(2, 12, lengths=[12, 9])
        out = model.apply({"params": params}, aatype, mask, num_recycles=1)
        assert out["atom37"].shape == (2, 12, 37, 3)
        assert out["plddt"].shape == (2, 12, 37)
        assert out["ptm"].shape == (2,)
        assert out["frames"].shape == (2, 12, 7)
        assert out["distogram_logits"].shape[-1] == 64
        for k in ("atom37", "plddt", "ptm", "frames"):
            assert np.isfinite(np.asarray(out[k])).all(), k
        assert (np.asarray(out["plddt"]) >= 0).all()
        assert (np.asarray(out["plddt"]) <= 1).all()

    def test_deterministic(self, tiny):
        _, model, params = tiny
        aatype, mask = _inputs(1, 10)
        a = model.apply({"params": params}, aatype, mask, num_recycles=0)
        b = model.apply({"params": params}, aatype, mask, num_recycles=0)
        np.testing.assert_array_equal(
            np.asarray(a["atom37"]), np.asarray(b["atom37"])
        )

    def test_padding_invariance(self, tiny):
        """Extra padding must not change real-residue outputs: masking is
        correct through ESM attention, trunk and structure module."""
        _, model, params = tiny
        aatype, _ = _inputs(1, 9)
        mask9 = jnp.ones((1, 9), jnp.float32)
        out9 = model.apply({"params": params}, aatype, mask9, num_recycles=0)
        pad = jnp.concatenate(
            [aatype, jnp.zeros((1, 4), jnp.int32)], axis=1
        )
        mask13 = jnp.concatenate(
            [mask9, jnp.zeros((1, 4), jnp.float32)], axis=1
        )
        out13 = model.apply({"params": params}, pad, mask13, num_recycles=0)
        np.testing.assert_allclose(
            np.asarray(out9["atom37"]),
            np.asarray(out13["atom37"])[:, :9],
            atol=2e-4,
        )

    def test_recycling_changes_output(self, tiny):
        _, model, params = tiny
        aatype, mask = _inputs(1, 10)
        o0 = model.apply({"params": params}, aatype, mask, num_recycles=0)
        o2 = model.apply({"params": params}, aatype, mask, num_recycles=2)
        assert (
            np.abs(np.asarray(o0["atom37"]) - np.asarray(o2["atom37"])).max()
            > 1e-5
        )


class TestTokenization:
    def test_cls_eos_placement(self):
        aatype = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
        mask = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
        toks = np.asarray(esm2_lib.af2_idx_to_esm_tokens(aatype, mask))[0]
        assert toks[0] == esm2_lib.CLS_IDX
        assert toks[4] == esm2_lib.EOS_IDX  # after last real residue
        assert toks[5] == esm2_lib.PAD_IDX
        # A, R, N one-letter codes in ESM vocab
        assert toks[1] == esm2_lib.ESM_TOK_TO_IDX["A"]
        assert toks[2] == esm2_lib.ESM_TOK_TO_IDX["R"]
        assert toks[3] == esm2_lib.ESM_TOK_TO_IDX["N"]

    def test_sequence_tokens(self):
        t = np.asarray(esm2_lib.sequence_to_esm_tokens("ACDZ"))[0]
        assert t[0] == esm2_lib.CLS_IDX and t[-1] == esm2_lib.EOS_IDX
        assert t[1] == esm2_lib.ESM_TOK_TO_IDX["A"]
        assert t[4] == esm2_lib.ESM_TOK_TO_IDX["Z"]


class TestESM2TorchParity:
    """Validates the flax ESM-2 layer against an independent torch
    re-implementation of fair-esm's TransformerLayer (pre-LN + RoPE)."""

    def test_layer_matches_torch(self):
        import torch

        cfg = esm2_lib.esm2_tiny_config(num_layers=1, embed_dim=16,
                                        attention_heads=2)
        layer = esm2_lib.ESM2Layer(cfg)
        b, t, e = 1, 6, 16
        x = np.random.RandomState(0).randn(b, t, e).astype(np.float32)
        pad = np.ones((b, t), np.float32)
        params = layer.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pad)
        )["params"]
        got = np.asarray(
            layer.apply({"params": params}, jnp.asarray(x), jnp.asarray(pad))
        )

        def t_lin(p):
            lin = torch.nn.Linear(p["kernel"].shape[0], p["kernel"].shape[1])
            lin.weight.data = torch.tensor(np.asarray(p["kernel"]).T)
            lin.bias.data = torch.tensor(np.asarray(p["bias"]))
            return lin

        def t_ln(p):
            ln = torch.nn.LayerNorm(e, eps=1e-5)
            ln.weight.data = torch.tensor(np.asarray(p["scale"]))
            ln.bias.data = torch.tensor(np.asarray(p["bias"]))
            return ln

        def rope(q):  # [B, H, T, D] fair-esm RotaryEmbedding
            d = q.shape[-1]
            inv = 1.0 / (
                10000 ** (torch.arange(0, d, 2, dtype=torch.float32) / d)
            )
            pos = torch.arange(q.shape[-2], dtype=torch.float32)
            freqs = torch.einsum("i,j->ij", pos, inv)
            emb = torch.cat((freqs, freqs), dim=-1)
            cos, sin = emb.cos(), emb.sin()
            q1, q2 = q.chunk(2, dim=-1)
            rot = torch.cat((-q2, q1), dim=-1)
            return q * cos + rot * sin

        with torch.no_grad():
            xt = torch.tensor(x)
            sa = params["self_attn"]
            h, d = 2, e // 2
            y = t_ln(params["self_attn_layer_norm"])(xt)
            q = t_lin(sa["q_proj"])(y).view(b, t, h, d).transpose(1, 2)
            k = t_lin(sa["k_proj"])(y).view(b, t, h, d).transpose(1, 2)
            v = t_lin(sa["v_proj"])(y).view(b, t, h, d).transpose(1, 2)
            q = rope(q * d ** -0.5)
            k = rope(k)
            att = torch.softmax(q @ k.transpose(-1, -2), dim=-1)
            o = (att @ v).transpose(1, 2).reshape(b, t, e)
            xt = xt + t_lin(sa["out_proj"])(o)
            y = t_ln(params["final_layer_norm"])(xt)
            y = t_lin(params["fc1"])(y)
            y = torch.nn.functional.gelu(y, approximate="none")
            xt = xt + t_lin(params["fc2"])(y)
        want = xt.numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_rope_scaling_order(self):
        """fair-esm scales q BEFORE rotary; rotation is orthogonal so
        q*scale then rope == rope then scale — sanity-pin it."""
        x = jnp.asarray(
            np.random.RandomState(1).randn(1, 2, 5, 8), jnp.float32
        )
        pos = jnp.arange(5)
        a = esm2_lib._rope(x * 0.5, pos)
        b = esm2_lib._rope(x, pos) * 0.5
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestConverter:
    def test_round_trip_complete(self, tiny):
        from se3_diffusion_tpu.interop import esmfold_convert as cv

        cfg, model, _ = tiny
        sd = cv.synthetic_state_dict(cfg)
        params, report = cv.convert_state_dict(sd, cfg)
        assert report["missing"] == []
        assert report["unused"] == []
        aatype, mask = _inputs(1, 10)
        out = model.apply({"params": params}, aatype, mask, num_recycles=0)
        assert np.isfinite(np.asarray(out["atom37"])).all()

    def test_transpose_applied(self, tiny):
        """torch [out,in] weights land as flax [in,out] kernels."""
        from se3_diffusion_tpu.interop import esmfold_convert as cv

        cfg, _, _ = tiny
        sd = cv.synthetic_state_dict(cfg)
        params, _ = cv.convert_state_dict(sd, cfg)
        w_torch = sd["distogram_head.weight"]
        w_flax = np.asarray(params["distogram_head"]["dense"]["kernel"])
        np.testing.assert_array_equal(w_flax, w_torch.T)

    def test_shape_mismatch_raises(self, tiny):
        from se3_diffusion_tpu.interop import esmfold_convert as cv

        cfg, _, _ = tiny
        sd = cv.synthetic_state_dict(cfg)
        sd["distogram_head.weight"] = sd["distogram_head.weight"][:, :-1]
        with pytest.raises(ValueError, match="shape mismatch"):
            cv.convert_state_dict(sd, cfg)


class TestHeads:
    def test_categorical_lddt_range(self):
        logits = jnp.asarray(
            np.random.RandomState(0).randn(2, 5, 37, 50), jnp.float32
        )
        v = np.asarray(categorical_lddt(logits))
        assert (v > 0).all() and (v < 1).all()

    def test_compute_tm_range(self):
        logits = jnp.asarray(
            np.random.RandomState(0).randn(2, 30, 30, 64), jnp.float32
        )
        mask = jnp.ones((2, 30), jnp.float32)
        tm = np.asarray(compute_tm(logits, mask))
        assert tm.shape == (2,)
        assert (tm > 0).all() and (tm <= 1).all()


class TestFolderAdapters:
    def test_jax_folder(self, tiny):
        from se3_diffusion_tpu.sampling.folding import make_jax_esmfold_folder

        _, model, params = tiny
        folder = make_jax_esmfold_folder(
            model, params, num_recycles=0, buckets=(16,)
        )
        out = folder("ACDEFGHIKL")
        assert out.shape == (10, 37, 3)
        assert np.isfinite(out).all()

    def test_torch_adapter_with_mock(self, monkeypatch, tiny):
        """The fair-esm adapter drives infer_pdb and parses atom37 back;
        fair-esm itself is absent, so inject a stub module."""
        from tests.helpers import build_backbone

        from se3_diffusion_tpu.proteins import protein

        atom37, mask37 = build_backbone(8)
        pdb_str = protein.to_pdb(protein.create_protein(atom37, mask37))

        class FakeModel:
            def eval(self):
                return self

            def to(self, device):
                return self

            def infer_pdb(self, seq, num_recycles=None):
                return pdb_str

        fake = types.ModuleType("esm")
        fake.pretrained = types.SimpleNamespace(
            esmfold_v1=lambda: FakeModel()
        )
        monkeypatch.setitem(sys.modules, "esm", fake)

        from se3_diffusion_tpu.sampling.folding import (
            make_torch_esmfold_folder,
        )

        folder = make_torch_esmfold_folder()
        out = folder("ACDEFGHI")
        assert out.shape == (8, 37, 3)
        np.testing.assert_allclose(out[:, 1], atom37[:, 1], atol=1e-2)


class TestEndToEndSelfConsistency:
    def test_runner_with_jax_esmfold(self, tiny, tmp_path):
        """Full sample->design->fold->scRMSD with the real JAX ESMFold
        (random weights) on the folding leg."""
        from se3_diffusion_tpu.config import (
            Config,
            InferenceConfig,
            InferenceSamplesConfig,
        )
        from se3_diffusion_tpu.sampling.folding import make_jax_esmfold_folder
        from se3_diffusion_tpu.sampling.inference import InferenceRunner

        _, model, params = tiny
        folder = make_jax_esmfold_folder(
            model, params, num_recycles=0, buckets=(16,)
        )
        runner = InferenceRunner(
            cfg=Config(
                inference=InferenceConfig(
                    samples=InferenceSamplesConfig(seq_per_sample=2)
                )
            ),
            model=None,
            params=None,
            diffuser=None,
            sequence_designer=lambda a37, n, s: ["A" * a37.shape[0]] * n,
            folder=folder,
        )
        from tests.helpers import build_backbone

        atom37, _ = build_backbone(12)
        row = runner.run_self_consistency(atom37, str(tmp_path))
        assert {"sc_rmsd_min", "sc_tm_max", "designable"} <= set(row)
        assert np.isfinite(row["sc_rmsd_min"])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestFolderFactory:
    def test_none_backend(self):
        from se3_diffusion_tpu.config import FoldingConfig
        from se3_diffusion_tpu.sampling.folding import make_folder_from_config

        assert make_folder_from_config(FoldingConfig(backend="none")) is None

    def test_auto_without_esm_or_weights(self, tmp_path):
        from se3_diffusion_tpu.config import FoldingConfig
        from se3_diffusion_tpu.sampling.folding import make_folder_from_config

        cfg = FoldingConfig(
            backend="auto",
            esmfold_weights_path=str(tmp_path / "nope.pt"),
        )
        assert make_folder_from_config(cfg) is None

    def test_unknown_backend_raises(self):
        from se3_diffusion_tpu.config import FoldingConfig
        from se3_diffusion_tpu.sampling.folding import make_folder_from_config

        with pytest.raises(ValueError, match="Unknown folding backend"):
            make_folder_from_config(FoldingConfig(backend="gpu"))

    def test_torch_checkpoint_loader(self, tiny, tmp_path):
        """load_esmfold_checkpoint reads a fair-esm-layout .pt file."""
        import torch

        from se3_diffusion_tpu.interop import esmfold_convert as cv

        cfg, model, _ = tiny
        sd = cv.synthetic_state_dict(cfg)
        path = tmp_path / "esmfold_tiny.pt"
        torch.save({"model": {k: torch.tensor(v) for k, v in sd.items()}}, path)
        params, report = cv.load_esmfold_checkpoint(str(path), cfg)
        assert report["missing"] == [] and report["unused"] == []
        aatype = jnp.zeros((1, 8), jnp.int32)
        out = model.apply(
            {"params": params}, aatype, jnp.ones((1, 8)), num_recycles=0
        )
        assert np.isfinite(np.asarray(out["atom37"])).all()
