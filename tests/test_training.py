"""Training step tests: loss mechanics, overfit sanity, shard_map DP
(SURVEY.md section 4.4: multi-host semantics tested on a virtual device
mesh — the reference's DDP path had no test of any kind)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_diffusion_tpu.config import (
    Config,
    DataConfig,
    DiffuserConfig,
    ExperimentConfig,
    IpaConfig,
    ModelConfig,
    SO3Config,
)
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.geometry.rigid import Rigid
from se3_diffusion_tpu.models.score_network import ScoreNetwork, dummy_features
from se3_diffusion_tpu.parallel.mesh import create_mesh, shard_batch, replicate
from se3_diffusion_tpu.training import (
    create_train_state,
    loss_fn,
    make_train_step,
)

SMALL_CFG = Config(
    model=ModelConfig(
        node_embed_size=32,
        edge_embed_size=16,
        ipa=IpaConfig(
            c_s=32, c_z=16, c_hidden=16, c_skip=8, no_heads=2, no_qk_points=4,
            no_v_points=6, seq_tfmr_num_heads=2, seq_tfmr_num_layers=1,
            num_blocks=2,
        ),
    ),
    diffuser=DiffuserConfig(
        so3=SO3Config(num_omega=200, num_sigma=50, cache_dir="", series_l=300)
    ),
    experiment=ExperimentConfig(learning_rate=1e-3),
)


def synthetic_batch(key, batch_size, num_res):
    """Clean 'protein' batch: smooth random-walk CA trace + random frames."""
    k1, k2 = jax.random.split(key)
    steps = jax.random.normal(k1, (batch_size, num_res, 3))
    ca = jnp.cumsum(steps * 2.0, axis=-2)
    ca = ca - ca.mean(axis=-2, keepdims=True)
    from se3_diffusion_tpu.geometry import quat as ql

    quats = ql.quat_normalize(jax.random.normal(k2, (batch_size, num_res, 4)))
    rigids_0 = Rigid(quat=quats, trans=ca)
    return {
        "rigids_0": rigids_0.to_tensor_7(),
        "res_mask": jnp.ones((batch_size, num_res), jnp.float32),
        "fixed_mask": jnp.zeros((batch_size, num_res), jnp.float32),
        "seq_idx": jnp.tile(jnp.arange(num_res)[None], (batch_size, 1)),
        "torsion_angles_sin_cos": jnp.zeros((batch_size, num_res, 7, 2)),
    }


@pytest.fixture(scope="module")
def setup():
    diffuser = SE3Diffuser.create(SMALL_CFG.diffuser)
    model = ScoreNetwork(SMALL_CFG.model)
    state = create_train_state(jax.random.PRNGKey(0), SMALL_CFG, model, 12)
    return diffuser, model, state


class TestLoss:
    def test_loss_finite_and_positive(self, setup):
        diffuser, model, state = setup
        batch = synthetic_batch(jax.random.PRNGKey(1), 2, 12)
        loss, aux = loss_fn(
            state.params, jax.random.PRNGKey(2), batch, model, diffuser, SMALL_CFG
        )
        assert np.isfinite(float(loss)) and float(loss) > 0
        for k in ("rot_loss", "trans_loss", "bb_atom_loss", "dist_mat_loss"):
            assert np.isfinite(float(aux[k])), k

    def test_gradients_nonzero_everywhere(self, setup):
        # Zero-init "final" layers open one per optimizer step (update = 0@x
        # blocks upstream flow), and the psi head only sees gradient when a
        # sampled t < 0.25 activates the aux losses — so warm up several
        # steps with a larger batch before asserting broad coverage.
        diffuser, model, state = setup
        batch = synthetic_batch(jax.random.PRNGKey(1), 6, 12)
        step = make_train_step(model, SMALL_CFG, mesh=None)
        key = jax.random.PRNGKey(9)
        for _ in range(6):
            key, sub = jax.random.split(key)
            state, _ = step(state, diffuser, batch, sub)
        grads = jax.grad(
            lambda p: loss_fn(
                p, jax.random.PRNGKey(3), batch, model, diffuser, SMALL_CFG
            )[0]
        )(state.params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        nonzero = sum(int(np.any(np.asarray(g) != 0)) for g in flat)
        assert nonzero / len(flat) > 0.85, f"{nonzero}/{len(flat)}"

    def test_padded_examples_do_not_contribute(self, setup):
        diffuser, model, state = setup
        batch = synthetic_batch(jax.random.PRNGKey(1), 2, 12)
        # Second example fully padded.
        batch["res_mask"] = batch["res_mask"].at[1].set(0.0)
        loss, aux = loss_fn(
            state.params, jax.random.PRNGKey(4), batch, model, diffuser, SMALL_CFG
        )
        assert np.isfinite(float(loss))


class TestTrainStep:
    def test_single_device_loss_decreases(self, setup):
        diffuser, model, state = setup
        step = make_train_step(model, SMALL_CFG, mesh=None)
        batch = synthetic_batch(jax.random.PRNGKey(1), 4, 12)
        losses = []
        key = jax.random.PRNGKey(0)
        for i in range(8):
            key, sub = jax.random.split(key)
            state, aux = step(state, diffuser, batch, sub)
            losses.append(float(aux["loss"]))
        # Same data every step; loss should trend down.
        assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    def test_multichip_dp_step(self, setup):
        diffuser, model, _ = setup
        assert len(jax.devices()) >= 8, "conftest should give 8 cpu devices"
        mesh = create_mesh(jax.devices()[:8])
        state = create_train_state(jax.random.PRNGKey(0), SMALL_CFG, model, 12)
        step = make_train_step(model, SMALL_CFG, mesh=mesh)
        batch = synthetic_batch(jax.random.PRNGKey(1), 8, 12)
        batch = shard_batch(mesh, batch)
        state = replicate(mesh, state)
        state, aux = step(state, replicate(mesh, diffuser), batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(aux["loss"]))
        # Params stay consistent across the mesh (replicated update).
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        gathered = np.asarray(p0.addressable_data(0)), np.asarray(
            p0.addressable_data(len(p0.sharding.device_set) - 1)
        )
        np.testing.assert_array_equal(gathered[0], gathered[1])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestEma:
    def test_ema_tracks_params(self, setup):
        diffuser, model, _ = setup
        state = create_train_state(
            jax.random.PRNGKey(0), SMALL_CFG, model, 12, use_ema=True
        )
        step = make_train_step(model, SMALL_CFG, mesh=None, ema_decay=0.9)
        batch = synthetic_batch(jax.random.PRNGKey(1), 2, 12)
        p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
        for i in range(3):
            state, _ = step(state, diffuser, batch, jax.random.PRNGKey(i))
        p = jax.tree_util.tree_leaves(state.params)[0]
        e = jax.tree_util.tree_leaves(state.ema_params)[0]
        # EMA lags behind the live params but has moved off the init.
        assert np.abs(np.asarray(e) - np.asarray(p)).max() > 0
        assert np.abs(np.asarray(e) - np.asarray(p0)).max() > 0
        lag = np.abs(np.asarray(e) - np.asarray(p0)).max()
        move = np.abs(np.asarray(p) - np.asarray(p0)).max()
        assert lag < move

    def test_ema_checkpoint_roundtrip(self, setup, tmp_path):
        from se3_diffusion_tpu.training.checkpoints import CheckpointManager

        diffuser, model, _ = setup
        state = create_train_state(
            jax.random.PRNGKey(0), SMALL_CFG, model, 12, use_ema=True
        )
        step = make_train_step(model, SMALL_CFG, mesh=None, ema_decay=0.5)
        batch = synthetic_batch(jax.random.PRNGKey(1), 2, 12)
        state, _ = step(state, diffuser, batch, jax.random.PRNGKey(2))
        mgr = CheckpointManager(str(tmp_path / "ema_ckpt"))
        mgr.save(state, epoch=0)
        template = create_train_state(
            jax.random.PRNGKey(9), SMALL_CFG, model, 12, use_ema=True
        )
        restored, _ = mgr.restore(template)
        a = jax.tree_util.tree_leaves(state.ema_params)
        b = jax.tree_util.tree_leaves(restored.ema_params)
        assert all(np.allclose(x, y) for x, y in zip(a, b))
        mgr.close()
        # warm_start_params(prefer_ema=True) returns the EMA average,
        # the default the raw params (inference vs warm-start contract).
        from se3_diffusion_tpu.training.checkpoints import warm_start_params

        ema_loaded = warm_start_params(
            str(tmp_path / "ema_ckpt"), None, prefer_ema=True
        )
        raw_loaded = warm_start_params(str(tmp_path / "ema_ckpt"), None)
        got_ema = jax.tree_util.tree_leaves(ema_loaded)
        got_raw = jax.tree_util.tree_leaves(raw_loaded)
        want_raw = jax.tree_util.tree_leaves(state.params)
        assert all(np.allclose(x, y) for x, y in zip(got_ema, a))
        assert all(np.allclose(x, y) for x, y in zip(got_raw, want_raw))
        # Every save also mirrors the weights into a single .npz (orbax
        # step dirs are bulky/gitignored and do not survive workspace
        # resets) with the raw + EMA trees and the step recorded.
        npz_path = str(tmp_path / "ema_ckpt" / "params_latest.npz")
        assert os.path.exists(npz_path)
        step_file = tmp_path / "ema_ckpt" / "params_latest.step"
        assert int(step_file.read_text()) == int(state.step)
        mirrored_ema = warm_start_params(npz_path, None, prefer_ema=True)
        mirrored_raw = warm_start_params(npz_path, None)
        got_ema = jax.tree_util.tree_leaves(mirrored_ema)
        got_raw = jax.tree_util.tree_leaves(mirrored_raw)
        assert all(np.allclose(x, y) for x, y in zip(got_ema, a))
        assert all(np.allclose(x, y) for x, y in zip(got_raw, want_raw))

    def test_params_npz_roundtrip(self, setup, tmp_path):
        # Single-file export (git-committable, survives workspace resets)
        # loads back bit-identically through every entry point.
        from se3_diffusion_tpu.training.checkpoints import (
            load_params_npz,
            save_params_npz,
            warm_start_params,
        )

        _, model, _ = setup
        state = create_train_state(
            jax.random.PRNGKey(0), SMALL_CFG, model, 12, use_ema=True
        )
        path = str(tmp_path / "params.npz")
        save_params_npz(path, state.params, ema_params=state.ema_params)
        raw = load_params_npz(path)
        ema = load_params_npz(path, prefer_ema=True)
        flat = lambda t: jax.tree_util.tree_flatten_with_path(t)
        (raw_kv, raw_td), (want_kv, want_td) = flat(raw), flat(state.params)
        assert raw_td == want_td  # identical tree structure, not just leaves
        assert all(
            np.array_equal(a[1], np.asarray(b[1]))
            for a, b in zip(raw_kv, want_kv)
        )
        want_ema = jax.tree_util.tree_leaves(state.ema_params)
        got_ema = jax.tree_util.tree_leaves(ema)
        assert all(
            np.array_equal(x, np.asarray(y)) for x, y in zip(got_ema, want_ema)
        )
        # warm_start_params dispatches on the .npz suffix.
        ws = warm_start_params(path, None, prefer_ema=True)
        assert jax.tree_util.tree_structure(ws) == jax.tree_util.tree_structure(
            state.params
        )
        # EMA-free archives fall back to raw params under prefer_ema.
        path2 = str(tmp_path / "raw_only.npz")
        save_params_npz(path2, state.params)
        raw2 = load_params_npz(path2, prefer_ema=True)
        assert jax.tree_util.tree_structure(raw2) == jax.tree_util.tree_structure(
            state.params
        )


class TestGradClipAndDonate:
    def test_grad_clip_bounds_update(self, setup):
        """grad_clip chains a global-norm clip ahead of Adam; the logged
        grad_norm stays the raw (pre-clip) norm."""
        import dataclasses

        diffuser, model, _ = setup
        cfg = dataclasses.replace(
            SMALL_CFG,
            experiment=dataclasses.replace(SMALL_CFG.experiment, grad_clip=1e-3),
        )
        state = create_train_state(jax.random.PRNGKey(0), cfg, model, 12)
        p0 = jax.tree_util.tree_map(np.asarray, state.params)
        step = make_train_step(model, cfg, mesh=None)
        batch = synthetic_batch(jax.random.PRNGKey(1), 2, 12)
        state, aux = step(state, diffuser, batch, jax.random.PRNGKey(2))
        # Raw grad norm is far above the clip threshold...
        assert float(aux["grad_norm"]) > 1.0
        # ...and one Adam step on clipped grads moves params by <= ~lr each.
        deltas = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(b) - a).max()), p0, state.params
        )
        assert max(jax.tree_util.tree_leaves(deltas)) < 5e-3

    def test_donated_step_matches_undonated(self, setup):
        diffuser, model, _ = setup
        batch = synthetic_batch(jax.random.PRNGKey(1), 2, 12)
        key = jax.random.PRNGKey(2)
        s1 = create_train_state(jax.random.PRNGKey(0), SMALL_CFG, model, 12)
        s2 = create_train_state(jax.random.PRNGKey(0), SMALL_CFG, model, 12)
        plain = make_train_step(model, SMALL_CFG, mesh=None)
        donating = make_train_step(model, SMALL_CFG, mesh=None, donate=True)
        s1, a1 = plain(s1, diffuser, batch, key)
        s2, a2 = donating(s2, diffuser, batch, key)
        np.testing.assert_allclose(
            float(a1["loss"]), float(a2["loss"]), rtol=1e-6
        )
        for x, y in zip(
            jax.tree_util.tree_leaves(s1.params),
            jax.tree_util.tree_leaves(s2.params),
        ):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


class TestClashLoss:
    """CA-CA clash hinge penalty (framework addition; the reference only
    measures clashes, `analysis/metrics.py:127-132`)."""

    def _manual_inputs(self, gt_trans, pred_ca, t):
        """Build framediff_loss inputs with hand-placed GT frames and
        predicted CA coordinates."""
        import dataclasses

        b, n, _ = gt_trans.shape
        quats = jnp.tile(
            jnp.array([1.0, 0.0, 0.0, 0.0])[None, None], (b, n, 1)
        )
        rigids_0 = jnp.concatenate([quats, gt_trans], axis=-1)
        atom37 = jnp.zeros((b, n, 37, 3)).at[:, :, 1].set(pred_ca)
        model_out = {
            "rot_score": jnp.zeros((b, n, 3)),
            "trans_score": jnp.zeros((b, n, 3)),
            "rigids": rigids_0,
            "atom37": atom37,
        }
        batch = {
            "rigids_0": rigids_0,
            "rot_score": jnp.zeros((b, n, 3)),
            "trans_score": jnp.zeros((b, n, 3)),
            "rot_score_scaling": jnp.ones((b,)),
            "trans_score_scaling": jnp.ones((b,)),
            "res_mask": jnp.ones((b, n)),
            "fixed_mask": jnp.zeros((b, n)),
            "torsion_angles_sin_cos": jnp.zeros((b, n, 7, 2)),
            "t": jnp.full((b,), t),
        }
        cfg = dataclasses.replace(
            SMALL_CFG.experiment, clash_loss_weight=1.0
        )
        return model_out, batch, cfg

    def _straight_chain(self, b, n, spacing=3.8):
        x = jnp.arange(n, dtype=jnp.float32) * spacing
        trans = jnp.stack([x, jnp.zeros(n), jnp.zeros(n)], axis=-1)
        return jnp.tile(trans[None], (b, 1, 1))

    def test_predicted_clash_is_penalized(self):
        from se3_diffusion_tpu.training.losses import framediff_loss

        gt = self._straight_chain(1, 8)
        pred = gt.at[0, 6].set(gt[0, 0] + 1.0)  # residue 6 on top of 0
        model_out, batch, cfg = self._manual_inputs(gt, pred, t=0.1)
        _, aux = framediff_loss(model_out, batch, cfg)
        assert float(aux["clash_loss"]) > 0.0

    def test_clean_prediction_has_zero_clash_loss(self):
        from se3_diffusion_tpu.training.losses import framediff_loss

        gt = self._straight_chain(1, 8, spacing=3.9)
        model_out, batch, cfg = self._manual_inputs(gt, gt, t=0.1)
        _, aux = framediff_loss(model_out, batch, cfg)
        assert float(aux["clash_loss"]) == 0.0

    def test_gt_close_pairs_are_excluded(self):
        from se3_diffusion_tpu.training.losses import framediff_loss

        # GT itself has residues 0 and 6 within the margin; predicting the
        # GT exactly must not be penalized (GT-aware exclusion).
        gt = self._straight_chain(1, 8)
        gt = gt.at[0, 6].set(gt[0, 0] + jnp.array([1.0, 0.0, 0.0]))
        model_out, batch, cfg = self._manual_inputs(gt, gt, t=0.1)
        _, aux = framediff_loss(model_out, batch, cfg)
        assert float(aux["clash_loss"]) == 0.0

    def test_t_gate_and_default_off(self):
        import dataclasses

        from se3_diffusion_tpu.training.losses import framediff_loss

        gt = self._straight_chain(1, 8)
        pred = gt.at[0, 6].set(gt[0, 0] + 1.0)
        model_out, batch, cfg = self._manual_inputs(gt, pred, t=0.9)
        _, aux = framediff_loss(model_out, batch, cfg)
        assert float(aux["clash_loss"]) == 0.0  # gated at high t
        model_out, batch, cfg = self._manual_inputs(gt, pred, t=0.1)
        cfg_off = dataclasses.replace(cfg, clash_loss_weight=0.0)
        loss_on, aux_on = framediff_loss(model_out, batch, cfg)
        loss_off, aux_off = framediff_loss(model_out, batch, cfg_off)
        assert float(aux_off["clash_loss"]) == 0.0
        assert float(loss_on) > float(loss_off)  # term adds to the total

    def test_clash_gradients_finite(self):
        from se3_diffusion_tpu.training.losses import framediff_loss

        gt = self._straight_chain(1, 8)
        # Degenerate prediction: every CA coincident — safe_norm must keep
        # gradients finite at d=0.
        pred = jnp.zeros_like(gt)
        model_out, batch, cfg = self._manual_inputs(gt, pred, t=0.1)

        def f(ca):
            mo = dict(model_out)
            mo["atom37"] = mo["atom37"].at[:, :, 1].set(ca)
            return framediff_loss(mo, batch, cfg)[0]

        g = jax.grad(f)(pred)
        assert np.all(np.isfinite(np.asarray(g)))

class TestBondLoss:
    """Peptide-bond hinge penalty (framework addition; the reference's loss
    has no junction-geometry term — bond violations are only measured, via
    the AF2 `between_residue_bond_loss` port in evaluation/violations.py)."""

    IDEAL_C_N = 1.329

    def _ideal_chain_inputs(self, n, t, break_junction=None):
        """GT frames: identity rotations, translations chosen so every
        C(i)-N(i+1) distance is exactly the ideal 1.329 A under
        compute_backbone's idealized local geometry. Returns
        (gt_atom37, make_inputs(pred_atom37) -> (model_out, batch, cfg))."""
        import dataclasses

        from se3_diffusion_tpu.proteins import backbone

        origin = Rigid(
            quat=jnp.array([[[1.0, 0.0, 0.0, 0.0]]]),
            trans=jnp.zeros((1, 1, 3)),
        )
        atoms0, _, _ = backbone.compute_backbone(
            origin, jnp.zeros((1, 1, 2))
        )
        n_local = atoms0[0, 0, 0]
        c_local = atoms0[0, 0, 2]
        delta = c_local - n_local + jnp.array([self.IDEAL_C_N, 0.0, 0.0])
        steps = jnp.tile(delta[None], (n, 1)).at[0].set(jnp.zeros(3))
        if break_junction is not None:
            # Tear junction j apart in the ground truth itself.
            steps = steps.at[break_junction + 1].add(jnp.array([5.0, 0.0, 0.0]))
        trans = jnp.cumsum(steps, axis=0)[None]
        quats = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0])[None, None], (1, n, 1))
        rigids_0 = jnp.concatenate([quats, trans], axis=-1)
        gt_atom37, _, _ = backbone.compute_backbone(
            Rigid.from_tensor_7(rigids_0), jnp.zeros((1, n, 2))
        )

        def make_inputs(pred_atom37):
            model_out = {
                "rot_score": jnp.zeros((1, n, 3)),
                "trans_score": jnp.zeros((1, n, 3)),
                "rigids": rigids_0,
                "atom37": pred_atom37,
            }
            batch = {
                "rigids_0": rigids_0,
                "rot_score": jnp.zeros((1, n, 3)),
                "trans_score": jnp.zeros((1, n, 3)),
                "rot_score_scaling": jnp.ones((1,)),
                "trans_score_scaling": jnp.ones((1,)),
                "res_mask": jnp.ones((1, n)),
                "fixed_mask": jnp.zeros((1, n)),
                "torsion_angles_sin_cos": jnp.zeros((1, n, 7, 2)),
                "t": jnp.full((1,), t),
            }
            cfg = dataclasses.replace(
                SMALL_CFG.experiment, bond_loss_weight=1.0
            )
            return model_out, batch, cfg

        return gt_atom37, make_inputs

    def test_gt_junctions_are_ideal(self):
        """The fixture itself: every GT C(i)-N(i+1) distance is 1.329 A."""
        gt, _ = self._ideal_chain_inputs(6, t=0.1)
        d = np.linalg.norm(
            np.asarray(gt[0, :-1, 2]) - np.asarray(gt[0, 1:, 0]), axis=-1
        )
        np.testing.assert_allclose(d, self.IDEAL_C_N, atol=1e-5)

    def test_exact_reconstruction_has_zero_bond_loss(self):
        from se3_diffusion_tpu.training.losses import framediff_loss

        gt, make_inputs = self._ideal_chain_inputs(6, t=0.1)
        model_out, batch, cfg = make_inputs(gt)
        _, aux = framediff_loss(model_out, batch, cfg)
        assert float(aux["bond_loss"]) == 0.0

    def test_stretched_junction_is_penalized(self):
        from se3_diffusion_tpu.training.losses import framediff_loss

        gt, make_inputs = self._ideal_chain_inputs(6, t=0.1)
        pred = gt.at[0, 3:].add(jnp.array([1.0, 0.0, 0.0]))  # stretch 2->3
        model_out, batch, cfg = make_inputs(pred)
        loss_on, aux = framediff_loss(model_out, batch, cfg)
        assert float(aux["bond_loss"]) > 0.0
        # Expected value: one junction stretched to 2.329 A, hinge^2 over
        # the 5 junctions -> (1.0 - tol)^2 / 5.
        expected = (1.0 - cfg.bond_loss_tolerance) ** 2 / 5.0
        np.testing.assert_allclose(
            float(aux["bond_loss"]), expected, rtol=1e-4
        )

    def test_gt_broken_junction_is_excluded(self):
        from se3_diffusion_tpu.training.losses import framediff_loss

        # Junction 2 torn apart in the GT itself (chain break): predicting
        # the GT exactly must not be penalized.
        gt, make_inputs = self._ideal_chain_inputs(6, t=0.1, break_junction=2)
        model_out, batch, cfg = make_inputs(gt)
        _, aux = framediff_loss(model_out, batch, cfg)
        assert float(aux["bond_loss"]) == 0.0

    def test_t_gate_and_default_off(self):
        import dataclasses

        from se3_diffusion_tpu.training.losses import framediff_loss

        gt, make_inputs = self._ideal_chain_inputs(6, t=0.9)
        pred = gt.at[0, 3:].add(jnp.array([1.0, 0.0, 0.0]))
        model_out, batch, cfg = make_inputs(pred)
        _, aux = framediff_loss(model_out, batch, cfg)
        assert float(aux["bond_loss"]) == 0.0  # gated at high t

        gt, make_inputs = self._ideal_chain_inputs(6, t=0.1)
        model_out, batch, cfg = make_inputs(pred)
        cfg_off = dataclasses.replace(cfg, bond_loss_weight=0.0)
        loss_on, aux_on = framediff_loss(model_out, batch, cfg)
        loss_off, aux_off = framediff_loss(model_out, batch, cfg_off)
        assert float(aux_off["bond_loss"]) == 0.0
        assert float(loss_on) > float(loss_off)

    def test_bond_gradients_finite(self):
        from se3_diffusion_tpu.training.losses import framediff_loss

        gt, make_inputs = self._ideal_chain_inputs(6, t=0.1)
        # Degenerate prediction: all atoms coincident — safe_norm must keep
        # gradients finite at d=0.
        pred = jnp.zeros_like(gt)
        model_out, batch, cfg = make_inputs(pred)

        def f(atoms):
            mo = dict(model_out)
            mo["atom37"] = atoms
            return framediff_loss(mo, batch, cfg)[0]

        g = jax.grad(f)(pred)
        assert np.all(np.isfinite(np.asarray(g)))
