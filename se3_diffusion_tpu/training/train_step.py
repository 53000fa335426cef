"""Fully fused, data-parallel training step.

One jitted function per step: sample t -> forward-diffuse on device ->
self-conditioning coin flip -> model forward -> loss -> grads -> psum over
the dp mesh axis -> optax update. The reference splits this across CPU
dataloader workers (noising, `pdb_data_loader.py:253-257`), the GPU
(forward/backward) and NCCL (allreduce); here it is a single XLA program
whose gradient psum rides the ICI mesh (SURVEY.md section 5.8).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from se3_diffusion_tpu.config import Config
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.geometry.rigid import Rigid
from se3_diffusion_tpu.models.score_network import (
    ScoreNetwork,
    score_network_forward,
)
from se3_diffusion_tpu.parallel.mesh import DP_AXIS
from se3_diffusion_tpu.training import losses

Array = jax.Array


class TrainState(NamedTuple):
    step: Array
    params: Any
    opt_state: Any
    # Exponential moving average of params (None when disabled). The
    # reference vendors EMA machinery without using it
    # (`openfold/utils/exponential_moving_average.py`, SURVEY.md 2.7);
    # here it is a first-class training option (cfg.experiment has no
    # reference knob, so it is enabled via make_train_step/create_train_state).
    ema_params: Any = None


def create_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with the reference hyperparameters (`base.yaml:82`), with
    optional global-norm clipping in front (cfg.experiment.grad_clip)."""
    adam = optax.adam(learning_rate=cfg.experiment.learning_rate)
    clip = getattr(cfg.experiment, "grad_clip", None)
    if clip:
        return optax.chain(optax.clip_by_global_norm(clip), adam)
    return adam


def create_train_state(
    key: jax.Array,
    cfg: Config,
    model: ScoreNetwork,
    num_res: int = 16,
    use_ema: bool = False,
) -> TrainState:
    from se3_diffusion_tpu.models.score_network import dummy_features

    params = model.init(key, dummy_features(1, num_res))["params"]
    opt = create_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
    )


def prepare_train_features(
    key: jax.Array,
    diffuser: SE3Diffuser,
    batch: Dict[str, Array],
    min_t: float,
) -> Dict[str, Array]:
    """On-device forward diffusion: clean batch -> noised training features.

    Replaces the reference's CPU dataloader noising
    (`pdb_data_loader.py:220-276`): samples per-example t ~ U(min_t, 1),
    runs `forward_marginal`, and assembles the model input dict.
    """
    t_key, noise_key = jax.random.split(key)
    bsz = batch["res_mask"].shape[0]
    t = jax.random.uniform(t_key, (bsz,), minval=min_t, maxval=1.0)
    rigids_0 = Rigid.from_tensor_7(batch["rigids_0"].astype(jnp.float32))
    fwd = diffuser.forward_marginal(noise_key, rigids_0, t)
    feats = dict(batch)
    feats.update(
        {
            "t": t,
            "rigids_t": fwd["rigids_t"].to_tensor_7(),
            "rot_score": fwd["rot_score"],
            "trans_score": fwd["trans_score"],
            "rot_score_scaling": fwd["rot_score_scaling"],
            "trans_score_scaling": fwd["trans_score_scaling"],
            "sc_ca_t": jnp.zeros_like(rigids_0.trans),
        }
    )
    return feats


def loss_fn(
    params,
    key: jax.Array,
    batch: Dict[str, Array],
    model: ScoreNetwork,
    diffuser: SE3Diffuser,
    cfg: Config,
) -> Tuple[Array, Dict[str, Array]]:
    """Noise + (maybe) self-condition + forward + loss."""
    feat_key, coin_key = jax.random.split(key)
    feats = prepare_train_features(feat_key, diffuser, batch, cfg.data.min_t)

    if cfg.model.embed.embed_self_conditioning:
        # One coin per step, like the reference (`train_se3_diffusion.py:535`).
        coin = jax.random.bernoulli(coin_key)

        def with_sc(f):
            out = score_network_forward(
                model, jax.lax.stop_gradient(params), f, diffuser
            )
            f = dict(f)
            f["sc_ca_t"] = jax.lax.stop_gradient(out["rigids"][..., 4:])
            return f

        feats = jax.lax.cond(coin, with_sc, lambda f: dict(f), feats)

    model_out = score_network_forward(model, params, feats, diffuser)
    loss, aux = losses.framediff_loss(
        model_out,
        feats,
        cfg.experiment,
        diffuse_rot=cfg.diffuser.diffuse_rot,
        diffuse_trans=cfg.diffuser.diffuse_trans,
    )
    aux["t_mean"] = feats["t"].mean()
    return loss, aux


def make_train_step(
    model: ScoreNetwork,
    cfg: Config,
    mesh: Mesh | None = None,
    ema_decay: float | None = None,
    donate: bool = False,
):
    """Builds the jitted (optionally dp-sharded) train step.

    Returns step_fn(state, diffuser, batch, key) -> (state, metrics).
    With a mesh, the batch's leading dim is sharded over 'dp', params and
    optimizer state are replicated, and gradients/metrics are pmean'd over
    ICI inside shard_map — the NCCL-allreduce equivalent. With ema_decay,
    state.ema_params tracks an exponential moving average of params.
    With donate=True the input state's buffers are donated so XLA updates
    params/opt/EMA in place (one fewer HBM copy per step); the caller must
    then never reuse a state it has already stepped.
    """
    opt = create_optimizer(cfg)

    def _step_local(state: TrainState, diffuser, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, key, batch, model, diffuser, cfg
        )
        if mesh is not None:
            grads = jax.lax.pmean(grads, DP_AXIS)
            loss = jax.lax.pmean(loss, DP_AXIS)
            aux = jax.lax.pmean(aux, DP_AXIS)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema_decay is not None and ema is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay), ema, params
            )
        new_state = TrainState(state.step + 1, params, opt_state, ema)
        aux["loss"] = loss
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        return jax.jit(_step_local, **donate_kw)

    sharded = jax.shard_map(
        lambda state, diffuser, batch, key: _step_local(
            state,
            diffuser,
            batch,
            # Decorrelate noise across dp shards.
            jax.random.fold_in(key, jax.lax.axis_index(DP_AXIS)),
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(DP_AXIS), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded, **donate_kw)
