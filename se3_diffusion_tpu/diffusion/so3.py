"""IGSO(3) rotational diffusion as pure jittable functions.

Functional rewrite of the reference ``SO3Diffuser`` (`data/so3_diffuser.py`):
every op is a pure function of (tables, config, rng key, data) — vmappable
over per-example diffusion times and fully on-device, so forward noising
lives inside the jitted train step instead of CPU dataloader workers
(reference noises in workers, `data/pdb_data_loader.py:253-257`).

Conventions: rotations as [..., 3] axis-angle vectors; `t` may be a scalar
or a batch of per-example times (broadcast against leading dims).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from se3_diffusion_tpu.config import SO3Config
from se3_diffusion_tpu.diffusion import igso3
from se3_diffusion_tpu.geometry import quat as quat_lib

Array = jax.Array


def sigma(cfg: SO3Config, t: Array) -> Array:
    """sigma(t) = log(t e^{sigma_max} + (1-t) e^{sigma_min}).

    Logarithmic schedule (reference `so3_diffuser.py:192-199`).
    """
    return jnp.log(
        t * jnp.exp(cfg.max_sigma) + (1.0 - t) * jnp.exp(cfg.min_sigma)
    )


def diffusion_coef(cfg: SO3Config, t: Array) -> Array:
    """g(t) for the logarithmic schedule (reference `so3_diffuser.py:201-209`)."""
    sig = sigma(cfg, t)
    return jnp.sqrt(
        2.0 * (jnp.exp(cfg.max_sigma) - jnp.exp(cfg.min_sigma)) * sig / jnp.exp(sig)
    )


def sample(
    key: jax.Array, tables: igso3.IGSO3Tables, cfg: SO3Config, t: Array, n: int
) -> Array:
    """Draws IGSO3(sigma(t)) rotation vectors.

    Args:
        key: rng key.
        t: [...] diffusion times (one per batch element).
        n: samples per batch element.

    Returns:
        t.shape + [n, 3] axis-angle samples: uniform axis scaled by an
        inverse-CDF angle draw (reference `so3_diffuser.py:215-248`).
    """
    key_axis, key_angle = jax.random.split(key)
    t = jnp.asarray(t)
    axis = jax.random.normal(key_axis, t.shape + (n, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    u = jax.random.uniform(key_angle, t.shape + (n,))
    omega = igso3.inverse_cdf_sample(tables, sigma(cfg, t), u)
    return axis * omega[..., None]


def sample_ref(key: jax.Array, tables: igso3.IGSO3Tables, cfg: SO3Config, n: int) -> Array:
    """Samples the reference (t=1) distribution: [n, 3] rotation vectors."""
    return sample(key, tables, cfg, jnp.asarray(1.0), n)


def score(
    tables: igso3.IGSO3Tables,
    cfg: SO3Config,
    rotvec: Array,
    t: Array,
    eps: float = 1e-6,
) -> Array:
    """Score of the IGSO3 density as a tangent rotation vector.

    score(v) = (d/domega log f)(|v|; sigma(t)) * v / |v|.

    `cfg.score_impl` selects the lookup: 'interp' = differentiable bilinear
    table interpolation (no bucketize stop-grad, unlike reference
    `so3_diffuser.py:296-299`); 'series' = live truncated expansion
    (reference default path, `so3_diffuser.py:300-305`).

    Args:
        rotvec: [..., 3].
        t: broadcastable against rotvec's batch dims (e.g. [B] for
           [B, N, 3] inputs).
    """
    omega = quat_lib.safe_norm(rotvec, axis=-1) + eps
    sig = sigma(cfg, jnp.asarray(t))
    # Right-pad sigma's dims so a per-example [B] t broadcasts over [B, N].
    sig_b = jnp.broadcast_to(
        sig.reshape(sig.shape + (1,) * (omega.ndim - sig.ndim)), omega.shape
    )
    if cfg.score_impl == "series":
        norms = igso3.score_norm_series(omega, sig_b, cfg.series_l)
    else:
        norms = igso3.bilinear_lookup(
            tables.score_norms,
            tables.sigma_grid,
            tables.omega_grid,
            sig_b,
            omega,
        )
    return norms[..., None] * rotvec / omega[..., None]


def score_scaling(tables: igso3.IGSO3Tables, cfg: SO3Config, t: Array) -> Array:
    """sqrt(E[|score|^2])/sqrt(3) at sigma(t), by 1D interpolation."""
    return jnp.interp(sigma(cfg, jnp.asarray(t)), tables.sigma_grid, tables.score_scaling)


def forward_marginal(
    key: jax.Array,
    tables: igso3.IGSO3Tables,
    cfg: SO3Config,
    rot_0: Array,
    t: Array,
) -> Tuple[Array, Array]:
    """Samples rot_t ~ p_t(.|rot_0) and its score.

    Args:
        rot_0: [..., N, 3] initial rotation vectors.
        t: [...] per-example times (leading dims of rot_0).

    Returns:
        (rot_t, rot_score), both [..., N, 3]. The score is computed at the
        *sampled perturbation* (tangent at rot_0, right-composition), same
        semantics as reference `so3_diffuser.py:311-328`.
    """
    n = rot_0.shape[-2]
    sampled = sample(key, tables, cfg, t, n)
    sampled = sampled.reshape(rot_0.shape)
    rot_score = score(tables, cfg, sampled, t)
    rot_t = quat_lib.compose_rotvec(rot_0, sampled)
    return rot_t, rot_score


def reverse_step(
    key: jax.Array,
    cfg: SO3Config,
    rot_t: Array,
    score_t: Array,
    t: Array,
    dt: Array,
    mask: Array | None = None,
    noise_scale: float = 1.0,
    probability_flow: bool = False,
) -> Array:
    """One geodesic-random-walk reverse step (reference `so3_diffuser.py:330-366`).

    rot_{t-dt} = rot_t o Exp(g^2 score dt + g sqrt(dt) z).

    With probability_flow, integrates the deterministic probability-flow
    ODE instead: the drift halves (g^2/2 score dt) and the Brownian term
    drops — same marginals, deterministic trajectories, fewer steps
    needed.
    """
    g = diffusion_coef(cfg, t)
    g = jnp.asarray(g)
    g_b = g.reshape(g.shape + (1,) * (score_t.ndim - g.ndim))
    if probability_flow:
        perturb = 0.5 * (g_b**2) * score_t * dt
    else:
        z = noise_scale * jax.random.normal(
            key, score_t.shape, dtype=score_t.dtype
        )
        perturb = (g_b**2) * score_t * dt + g_b * jnp.sqrt(dt) * z
    if mask is not None:
        perturb = perturb * mask[..., None]
    return quat_lib.compose_rotvec(rot_t, perturb)
