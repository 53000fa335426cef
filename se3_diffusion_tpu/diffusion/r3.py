"""VP-SDE translational diffusion: closed forms, pure and jittable.

Functional rewrite of the reference ``R3Diffuser`` (`data/r3_diffuser.py`):
linear beta(t) schedule, coordinates scaled by `coordinate_scaling` in the
diffused space. `t` may be scalar or per-example [B] (broadcast against the
[..., N, 3] coordinate arrays).

All formulas operate in the *scaled* coordinate space internally and return
unscaled outputs where the reference does (forward_marginal returns
unscaled x_t but a scaled-space score, matching `r3_diffuser.py:81-101`).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from se3_diffusion_tpu.config import R3Config

Array = jax.Array


def _bcast(t: Array, like: Array, trailing: int = 2) -> Array:
    """Reshapes [B] (or scalar) t to broadcast against [..., N, 3] arrays."""
    t = jnp.asarray(t)
    return t.reshape(t.shape + (1,) * (like.ndim - t.ndim))


def scale(cfg: R3Config, x: Array) -> Array:
    return x * cfg.coordinate_scaling


def unscale(cfg: R3Config, x: Array) -> Array:
    return x / cfg.coordinate_scaling


def b_t(cfg: R3Config, t: Array) -> Array:
    """Linear variance schedule beta(t) (reference `r3_diffuser.py:26-29`)."""
    return cfg.min_b + t * (cfg.max_b - cfg.min_b)


def marginal_b_t(cfg: R3Config, t: Array) -> Array:
    """int_0^t beta(s) ds (reference `r3_diffuser.py:42-43`)."""
    return t * cfg.min_b + 0.5 * t**2 * (cfg.max_b - cfg.min_b)


def diffusion_coef(cfg: R3Config, t: Array) -> Array:
    return jnp.sqrt(b_t(cfg, t))


def drift_coef(cfg: R3Config, x: Array, t: Array) -> Array:
    return -0.5 * _bcast(b_t(cfg, t), x) * x


def conditional_var(cfg: R3Config, t: Array) -> Array:
    """Var[x_t | x_0] = 1 - exp(-int beta)."""
    return 1.0 - jnp.exp(-marginal_b_t(cfg, t))


def score_scaling(cfg: R3Config, t: Array) -> Array:
    return 1.0 / jnp.sqrt(conditional_var(cfg, t))


def score(
    cfg: R3Config, x_t: Array, x_0: Array, t: Array, scale_inputs: bool = False
) -> Array:
    """Gaussian score of p(x_t | x_0) in scaled space (`r3_diffuser.py:158-166`)."""
    if scale_inputs:
        x_t = scale(cfg, x_t)
        x_0 = scale(cfg, x_0)
    mb = _bcast(marginal_b_t(cfg, t), x_t)
    return -(x_t - jnp.exp(-0.5 * mb) * x_0) / (1.0 - jnp.exp(-mb))


def calc_trans_0(cfg: R3Config, score_t: Array, x_t: Array, t: Array) -> Array:
    """Inverts the Gaussian score to recover x_0 (scaled space),
    reference `r3_diffuser.py:45-50`."""
    mb = _bcast(marginal_b_t(cfg, t), x_t)
    cond_var = 1.0 - jnp.exp(-mb)
    return (score_t * cond_var + x_t) / jnp.exp(-0.5 * mb)


def forward_marginal(
    key: jax.Array, cfg: R3Config, x_0: Array, t: Array
) -> Tuple[Array, Array]:
    """Samples x_t ~ p(x_t|x_0) and its score.

    Args:
        x_0: [..., N, 3] positions in Angstroms (unscaled).
        t: per-example times broadcastable to x_0's leading dims.

    Returns:
        x_t unscaled [..., N, 3]; score in scaled space (matches reference
        contract, `r3_diffuser.py:81-101`).
    """
    x_0s = scale(cfg, x_0)
    mb = _bcast(marginal_b_t(cfg, t), x_0s)
    z = jax.random.normal(key, x_0s.shape, dtype=x_0s.dtype)
    x_ts = jnp.exp(-0.5 * mb) * x_0s + jnp.sqrt(1.0 - jnp.exp(-mb)) * z
    score_t = score(cfg, x_ts, x_0s, t)
    return unscale(cfg, x_ts), score_t


def forward_step(
    key: jax.Array, cfg: R3Config, x_t_1: Array, t: Array, num_t: int
) -> Array:
    """One discrete forward step x_{t-1} -> x_t (reference `r3_diffuser.py:52-69`).

    Returns the *scaled-space* sample, as the reference does.
    """
    x = scale(cfg, x_t_1)
    bt = _bcast(marginal_b_t(cfg, t) / num_t, x)
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    return jnp.sqrt(1.0 - bt) * x + jnp.sqrt(bt) * z


def distribution(
    cfg: R3Config, x_t: Array, score_t: Array, t: Array, mask: Array | None, dt: Array
):
    """Mean/std of the one-step reverse kernel (reference `r3_diffuser.py:71-79`)."""
    x = scale(cfg, x_t)
    g = _bcast(diffusion_coef(cfg, t), x)
    f = drift_coef(cfg, x, t)
    std = g * jnp.sqrt(dt)
    mu = x - (f - g**2 * score_t) * dt
    if mask is not None:
        mu = mu * mask[..., None]
    return mu, std


def sample_ref(key: jax.Array, cfg: R3Config, shape) -> Array:
    """Reference (t=1) samples: standard normal in scaled space, returned
    unscaled (matches `se3_diffuser.py:252-264`)."""
    return unscale(cfg, jax.random.normal(key, tuple(shape) + (3,)))


def reverse_step(
    key: jax.Array,
    cfg: R3Config,
    x_t: Array,
    score_t: Array,
    t: Array,
    dt: Array,
    mask: Array | None = None,
    center: bool = True,
    noise_scale: float = 1.0,
    probability_flow: bool = False,
) -> Array:
    """One reverse Euler-Maruyama step (reference `r3_diffuser.py:106-146`).

    With probability_flow, integrates the deterministic probability-flow
    ODE: dx = [f - (1/2) g^2 s] dt, no Brownian term.

    Mask-correct center-of-mass removal: the CoM is computed over *masked*
    residues only and subtracted from masked residues only. With an all-ones
    mask this equals the reference's centering (`r3_diffuser.py:142-144`);
    with padding present it keeps padded rows from polluting the CoM, which
    the reference never encounters (it samples one length at a time).
    """
    x = scale(cfg, x_t)
    g = _bcast(diffusion_coef(cfg, t), x)
    f = drift_coef(cfg, x, t)
    if probability_flow:
        perturb = (f - 0.5 * g**2 * score_t) * dt
    else:
        z = noise_scale * jax.random.normal(key, score_t.shape, dtype=x.dtype)
        perturb = (f - g**2 * score_t) * dt + g * jnp.sqrt(dt) * z

    if mask is None:
        mask = jnp.ones(x.shape[:-1], dtype=x.dtype)
    perturb = perturb * mask[..., None]
    x_next = x - perturb
    if center:
        com = jnp.sum(x_next * mask[..., None], axis=-2, keepdims=True) / (
            jnp.sum(mask, axis=-1)[..., None, None] + 1e-10
        )
        x_next = x_next - com * mask[..., None]
    return unscale(cfg, x_next)
