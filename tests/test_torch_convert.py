"""Checkpoint conversion tests.

Two layers of protection (SURVEY.md hard part 2):
1. Structural: a torch module tree with the reference's exact state-dict
   key naming converts into exactly our init-param treedef, consuming
   every key (vestigial ones dropped).
2. Behavioral: for every component whose torch side is pure stdlib
   (TransformerEncoder with packed MHA, Sequential MLP+LayerNorm), run
   real torch forward vs our flax forward on the converted weights and
   demand <=1e-5 agreement — this covers the in_proj packing, post-LN
   ordering, transpose, and eps pitfalls.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from se3_diffusion_tpu.config import IpaConfig, ModelConfig
from se3_diffusion_tpu.interop.torch_convert import convert_state_dict
from se3_diffusion_tpu.models.layers import MLP, TorchTransformerEncoder
from se3_diffusion_tpu.models.score_network import ScoreNetwork, dummy_features

SMALL_MODEL = ModelConfig(
    node_embed_size=24,
    edge_embed_size=16,
    ipa=IpaConfig(
        c_s=24, c_z=16, c_hidden=16, c_skip=8, no_heads=2, no_qk_points=4,
        no_v_points=6, seq_tfmr_num_heads=2, seq_tfmr_num_layers=2,
        num_blocks=2,
    ),
)


def _mlp3_torch(d_in, d_out):
    return tnn.Sequential(
        tnn.Linear(d_in, d_out), tnn.ReLU(),
        tnn.Linear(d_out, d_out), tnn.ReLU(),
        tnn.Linear(d_out, d_out), tnn.LayerNorm(d_out),
    )


def build_reference_like_torch_model(mc: ModelConfig) -> tnn.Module:
    """A torch module tree whose state_dict keys match the reference
    FrameDiff checkpoint layout exactly (names from
    `model/score_network.py` + `model/ipa_pytorch.py`)."""
    c = mc.ipa
    ie = 32  # index_embed_size
    node_in = (ie + 1) + ie
    edge_in = 2 * (ie + 1) + ie + 22  # cross-concat + rel-offset + distogram

    class IPA(tnn.Module):
        def __init__(self):
            super().__init__()
            hc = c.c_hidden * c.no_heads
            self.linear_q = tnn.Linear(c.c_s, hc)
            self.linear_kv = tnn.Linear(c.c_s, 2 * hc)
            self.linear_q_points = tnn.Linear(c.c_s, c.no_heads * c.no_qk_points * 3)
            self.linear_kv_points = tnn.Linear(
                c.c_s, c.no_heads * (c.no_qk_points + c.no_v_points) * 3
            )
            self.linear_b = tnn.Linear(c.c_z, c.no_heads)
            self.down_z = tnn.Linear(c.c_z, c.c_z // 4)
            self.head_weights = tnn.Parameter(torch.randn(c.no_heads) * 0.1)
            concat_out = c.c_z // 4 + c.c_hidden + c.no_v_points * 4
            self.linear_out = tnn.Linear(c.no_heads * concat_out, c.c_s)
            self.linear_rbf = tnn.Linear(20, 1)  # vestigial

    class Transition(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear_1 = tnn.Linear(c.c_s, c.c_s)
            self.linear_2 = tnn.Linear(c.c_s, c.c_s)
            self.linear_3 = tnn.Linear(c.c_s, c.c_s)
            self.ln = tnn.LayerNorm(c.c_s)

    class EdgeTransition(tnn.Module):
        def __init__(self):
            super().__init__()
            bias = c.c_s // 2
            hidden = bias * 2 + mc.edge_embed_size
            self.initial_embed = tnn.Linear(c.c_s, bias)
            self.trunk = tnn.Sequential(
                tnn.Linear(hidden, hidden), tnn.ReLU(),
                tnn.Linear(hidden, hidden), tnn.ReLU(),
            )
            self.final_layer = tnn.Linear(hidden, mc.edge_embed_size)
            self.layer_norm = tnn.LayerNorm(mc.edge_embed_size)

    class Torsion(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear_1 = tnn.Linear(c.c_s, c.c_s)
            self.linear_2 = tnn.Linear(c.c_s, c.c_s)
            self.linear_3 = tnn.Linear(c.c_s, c.c_s)  # vestigial
            self.linear_final = tnn.Linear(c.c_s, 2)

    class BBUpdate(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear = tnn.Linear(c.c_s, 6)

    class Embedder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.node_embedder = _mlp3_torch(node_in, mc.node_embed_size)
            self.edge_embedder = _mlp3_torch(edge_in, mc.edge_embed_size)

    class IpaScore(tnn.Module):
        def __init__(self):
            super().__init__()
            self.trunk = tnn.ModuleDict()
            tfmr_in = c.c_s + c.c_skip
            for b in range(c.num_blocks):
                self.trunk[f"ipa_{b}"] = IPA()
                self.trunk[f"ipa_ln_{b}"] = tnn.LayerNorm(c.c_s)
                self.trunk[f"skip_embed_{b}"] = tnn.Linear(
                    mc.node_embed_size, c.c_skip
                )
                layer = tnn.TransformerEncoderLayer(
                    d_model=tfmr_in, nhead=c.seq_tfmr_num_heads,
                    dim_feedforward=tfmr_in, batch_first=True, dropout=0.0,
                    norm_first=False,
                )
                self.trunk[f"seq_tfmr_{b}"] = tnn.TransformerEncoder(
                    layer, c.seq_tfmr_num_layers
                )
                self.trunk[f"post_tfmr_{b}"] = tnn.Linear(tfmr_in, c.c_s)
                self.trunk[f"node_transition_{b}"] = Transition()
                self.trunk[f"bb_update_{b}"] = BBUpdate()
                if b < c.num_blocks - 1:
                    self.trunk[f"edge_transition_{b}"] = EdgeTransition()
            self.torsion_pred = Torsion()

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.embedding_layer = Embedder()
            self.score_model = IpaScore()

    torch.manual_seed(0)
    return Net()


@pytest.fixture(scope="module")
def converted():
    net = build_reference_like_torch_model(SMALL_MODEL)
    sd = net.state_dict()
    params = convert_state_dict(sd, SMALL_MODEL)
    return net, params


class TestStructural:
    def test_treedef_matches_init(self, converted):
        _, params = converted
        model = ScoreNetwork(SMALL_MODEL)
        init_params = model.init(jax.random.PRNGKey(0), dummy_features(1, 8))[
            "params"
        ]
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(init_params)[0]
        keys_a = {jax.tree_util.keystr(k): v.shape for k, v in flat_a}
        keys_b = {jax.tree_util.keystr(k): v.shape for k, v in flat_b}
        assert keys_a == keys_b

    def test_ddp_prefix_stripped(self, converted):
        net, params = converted
        sd = {f"module.{k}": v for k, v in net.state_dict().items()}
        params2 = convert_state_dict(sd, SMALL_MODEL)
        a = jax.tree_util.tree_leaves(params)
        b = jax.tree_util.tree_leaves(params2)
        assert all(np.array_equal(x, y) for x, y in zip(a, b))

    def test_unconsumed_keys_raise(self, converted):
        net, _ = converted
        sd = dict(net.state_dict())
        sd["score_model.trunk.bogus.weight"] = torch.zeros(3, 3)
        with pytest.raises(ValueError, match="Unconsumed"):
            convert_state_dict(sd, SMALL_MODEL)

    def test_converted_forward_runs(self, converted):
        _, params = converted
        model = ScoreNetwork(SMALL_MODEL)
        out = model.apply({"params": params}, dummy_features(1, 8))
        assert np.all(np.isfinite(np.asarray(out["psi"])))


class TestBehavioralParity:
    def test_seq_transformer_matches_torch(self, converted):
        net, params = converted
        c = SMALL_MODEL.ipa
        tfmr_in = c.c_s + c.c_skip
        x = np.random.RandomState(0).randn(2, 10, tfmr_in).astype(np.float32)

        torch_tfmr = net.score_model.trunk["seq_tfmr_0"]
        with torch.no_grad():
            want = torch_tfmr(torch.tensor(x)).numpy()

        flax_tfmr = TorchTransformerEncoder(
            num_layers=c.seq_tfmr_num_layers,
            num_heads=c.seq_tfmr_num_heads,
            dim_feedforward=tfmr_in,
        )
        got = flax_tfmr.apply(
            {"params": params["trunk"]["seq_tfmr_0"]},
            jnp.asarray(x),
            key_padding_mask=jnp.ones((2, 10)),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_node_embedder_mlp_matches_torch(self, converted):
        net, params = converted
        d_in = net.embedding_layer.node_embedder[0].in_features
        x = np.random.RandomState(1).randn(4, d_in).astype(np.float32)
        with torch.no_grad():
            want = net.embedding_layer.node_embedder(torch.tensor(x)).numpy()
        mlp = MLP(
            (SMALL_MODEL.node_embed_size,) * 3, final_layer_norm=True
        )
        got = mlp.apply(
            {"params": params["embedder"]["node_embedder"]}, jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestWarmStartFlow:
    def test_torch_to_orbax_to_forward(self, converted, tmp_path):
        """Full interop flow: torch state dict -> flax -> orbax save ->
        warm_start_params load -> forward pass."""
        from se3_diffusion_tpu.config import Config
        from se3_diffusion_tpu.training import create_train_state
        from se3_diffusion_tpu.training.checkpoints import (
            CheckpointManager,
            warm_start_params,
        )

        _, params = converted
        cfg = Config(model=SMALL_MODEL)
        model = ScoreNetwork(SMALL_MODEL)
        state = create_train_state(jax.random.PRNGKey(0), cfg, model, 8)
        state = state._replace(params=params)
        out_dir = str(tmp_path / "conv")
        mgr = CheckpointManager(out_dir)
        mgr.save(state, epoch=0)
        mgr.close()

        loaded = warm_start_params(out_dir, SMALL_MODEL)
        out = model.apply({"params": loaded}, dummy_features(1, 8))
        assert np.all(np.isfinite(np.asarray(out["psi"])))
        a = jax.tree_util.tree_leaves(params)
        b = jax.tree_util.tree_leaves(loaded)
        assert all(np.allclose(x, y) for x, y in zip(a, b))
