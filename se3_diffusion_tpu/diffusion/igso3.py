"""IGSO(3) density: truncated character expansion, tables, interpolation.

The isotropic Gaussian on SO(3) with concentration eps has marginal angle
density  f(omega) proportional to
    sum_l (2l+1) exp(-l(l+1) eps^2/2) sin((l+1/2) omega) / sin(omega/2)
times the Haar factor (1-cos omega)/pi  (Leach et al. 2022, eq. 5, with the
sqrt(2) reparameterization that makes IGSO3(eps) match Brownian motion at
t = eps^2 — same convention as the reference, `data/so3_diffuser.py:9-49`).

Design vs. the reference:

* Tables (pdf/cdf/score-norm over a [num_sigma x num_omega] grid) are built
  once in **float64 numpy** and cached to disk, like the reference
  (`so3_diffuser.py:135-174`) — but lookups on device are **differentiable
  piecewise-linear interpolation** (bilinear in (sigma, omega)) instead of
  `torch.bucketize` gathers. This removes the documented stop-grad
  "bucketize bug" class by construction and also interpolates across sigma,
  which the reference never does (it snaps t to the nearest grid row,
  `so3_diffuser.py:211-213`).
* A live on-device series evaluation (`score_series`) is kept as the
  high-accuracy oracle, mirroring the reference default
  (`use_cached_score: False`), and is itself jittable.
"""
from __future__ import annotations

import hashlib
import os
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from se3_diffusion_tpu.config import SO3Config

Array = jax.Array


# ---------------------------------------------------------------------------
# float64 numpy table construction (host, init-time only)
# ---------------------------------------------------------------------------


def igso3_expansion_np(
    omega: np.ndarray, eps: np.ndarray, num_terms: int = 1000
) -> np.ndarray:
    """Truncated IGSO3 power series, broadcast over omega x eps.

    Args:
        omega: [No] rotation angles in (0, pi].
        eps: [Ns] IGSO3 std parameters.
        num_terms: truncation level L.

    Returns:
        [Ns, No] float64 expansion values.
    """
    ls = np.arange(num_terms, dtype=np.float64)[:, None, None]  # [L, 1, 1]
    om = np.asarray(omega, dtype=np.float64)[None, None, :]  # [1, 1, No]
    ep = np.asarray(eps, dtype=np.float64)[None, :, None]  # [1, Ns, 1]
    terms = (
        (2.0 * ls + 1.0)
        * np.exp(-ls * (ls + 1.0) * ep**2 / 2.0)
        * np.sin(om * (ls + 0.5))
        / np.sin(om / 2.0)
    )
    return terms.sum(axis=0)


def igso3_score_norms_np(
    omega: np.ndarray,
    eps: np.ndarray,
    expansion: np.ndarray,
    num_terms: int = 1000,
    reg: float = 1e-4,
) -> np.ndarray:
    """d/d omega log f(omega; eps) via the quotient rule, [Ns, No].

    Same regularized form as the reference (`so3_diffuser.py:71-117`):
    sum of term-derivatives divided by (expansion + reg).
    """
    ls = np.arange(num_terms, dtype=np.float64)[:, None, None]
    om = np.asarray(omega, dtype=np.float64)[None, None, :]
    ep = np.asarray(eps, dtype=np.float64)[None, :, None]
    hi = np.sin(om * (ls + 0.5))
    dhi = (ls + 0.5) * np.cos(om * (ls + 0.5))
    lo = np.sin(om / 2.0)
    dlo = 0.5 * np.cos(om / 2.0)
    d_terms = (
        (2.0 * ls + 1.0)
        * np.exp(-ls * (ls + 1.0) * ep**2 / 2.0)
        * (lo * dhi - hi * dlo)
        / lo**2
    )
    return d_terms.sum(axis=0) / (expansion + reg)


# ---------------------------------------------------------------------------
# Device-resident tables
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class IGSO3Tables:
    """Precomputed IGSO3 grids, device-resident, a jit-traceable pytree."""

    omega_grid: Array  # [No] angles in (0, pi]
    sigma_grid: Array  # [Ns] sigma schedule values, increasing
    pdf: Array  # [Ns, No] marginal angle pdf
    cdf: Array  # [Ns, No] marginal angle cdf (0 -> ~1)
    score_norms: Array  # [Ns, No] d/domega log f
    score_scaling: Array  # [Ns] sqrt(E[|score|^2]/3)


def sigma_schedule_np(t: np.ndarray, cfg: SO3Config) -> np.ndarray:
    """sigma(t) for the configured schedule (host-side)."""
    if cfg.schedule != "logarithmic":
        raise ValueError(f"Unknown SO3 schedule: {cfg.schedule}")
    return np.log(
        t * np.exp(cfg.max_sigma) + (1.0 - t) * np.exp(cfg.min_sigma)
    )


def _cache_key(cfg: SO3Config) -> str:
    payload = (
        f"v1|{cfg.num_omega}|{cfg.num_sigma}|{cfg.min_sigma}|{cfg.max_sigma}"
        f"|{cfg.schedule}|{cfg.series_l}"
    )
    return hashlib.sha1(payload.encode()).hexdigest()[:16]


def build_tables(
    cfg: SO3Config, cache_dir: Optional[str] = None, dtype=jnp.float32
) -> IGSO3Tables:
    """Builds (or loads from the on-disk cache) the IGSO3 tables.

    float64 on host; chunked over sigma to bound the [L x Ns x No] temporary.
    """
    cache_dir = cfg.cache_dir if cache_dir is None else cache_dir
    cache_path = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = os.path.join(cache_dir, f"igso3_{_cache_key(cfg)}.npz")

    if cache_path and os.path.exists(cache_path):
        data = np.load(cache_path)
        omega, sigma = data["omega"], data["sigma"]
        pdf, cdf, score_norms = data["pdf"], data["cdf"], data["score_norms"]
    else:
        # Skip omega = 0 (the density has a removable singularity there).
        omega = np.linspace(0.0, np.pi, cfg.num_omega + 1, dtype=np.float64)[1:]
        sigma = sigma_schedule_np(
            np.linspace(0.0, 1.0, cfg.num_sigma, dtype=np.float64), cfg
        )
        pdf = np.empty((cfg.num_sigma, cfg.num_omega), dtype=np.float64)
        score_norms = np.empty_like(pdf)
        chunk = max(1, int(2e8 // (cfg.series_l * cfg.num_omega + 1)))
        for lo_idx in range(0, cfg.num_sigma, chunk):
            sl = slice(lo_idx, min(lo_idx + chunk, cfg.num_sigma))
            exp_vals = igso3_expansion_np(omega, sigma[sl], cfg.series_l)
            # Marginal density over [0, pi] includes the Haar angle factor.
            pdf[sl] = exp_vals * (1.0 - np.cos(omega))[None, :] / np.pi
            score_norms[sl] = igso3_score_norms_np(
                omega, sigma[sl], exp_vals, cfg.series_l
            )
        # Riemann cdf, matching the reference normalization
        # (`so3_diffuser.py:163-164`).
        cdf = pdf.cumsum(axis=-1) / cfg.num_omega * np.pi
        if cache_path:
            np.savez(
                cache_path,
                omega=omega,
                sigma=sigma,
                pdf=pdf,
                cdf=cdf,
                score_norms=score_norms,
            )

    score_scaling = np.sqrt(
        np.abs((score_norms**2 * pdf).sum(-1) / pdf.sum(-1))
    ) / np.sqrt(3.0)

    return IGSO3Tables(
        omega_grid=jnp.asarray(omega, dtype=dtype),
        sigma_grid=jnp.asarray(sigma, dtype=dtype),
        pdf=jnp.asarray(pdf, dtype=dtype),
        cdf=jnp.asarray(cdf, dtype=dtype),
        score_norms=jnp.asarray(score_norms, dtype=dtype),
        score_scaling=jnp.asarray(score_scaling, dtype=dtype),
    )


# ---------------------------------------------------------------------------
# Differentiable lookups (device)
# ---------------------------------------------------------------------------


def _fractional_index(grid: Array, query: Array) -> tuple[Array, Array]:
    """Returns (floor index, weight) for linear interp into a sorted grid."""
    idx = jnp.clip(
        jnp.searchsorted(grid, query, side="right") - 1, 0, grid.shape[0] - 2
    )
    g0 = grid[idx]
    g1 = grid[idx + 1]
    w = jnp.clip((query - g0) / (g1 - g0), 0.0, 1.0)
    return idx, w


def interp_rows(table: Array, grid: Array, query: Array) -> Array:
    """Linearly blends rows of [Ns, No] `table` at grid positions `query`.

    Args:
        table: [Ns, No].
        grid: [Ns] sorted values (e.g. sigma grid).
        query: [...] values to sample rows at.

    Returns:
        [..., No] blended rows; gradients flow through query and table.
    """
    idx, w = _fractional_index(grid, query)
    r0 = table[idx]
    r1 = table[idx + 1]
    return r0 + w[..., None] * (r1 - r0)


def bilinear_lookup(
    table: Array, row_grid: Array, col_grid: Array, row_q: Array, col_q: Array
) -> Array:
    """Differentiable bilinear interpolation into a [Ns, No] table.

    Args:
        table: [Ns, No].
        row_grid: [Ns] sorted (sigma axis).
        col_grid: [No] sorted (omega axis).
        row_q: row queries; right-pad-broadcastable to col_q's shape (e.g.
            [B] against [B, N], or scalar against anything).
        col_q: [...] column queries.

    Returns:
        col_q-shaped interpolated values.
    """
    row_q = jnp.asarray(row_q)
    row_q = jnp.broadcast_to(
        row_q.reshape(row_q.shape + (1,) * (col_q.ndim - row_q.ndim)), col_q.shape
    )
    ri, rw = _fractional_index(row_grid, row_q)
    ci, cw = _fractional_index(col_grid, col_q)
    v00 = table[ri, ci]
    v01 = table[ri, ci + 1]
    v10 = table[ri + 1, ci]
    v11 = table[ri + 1, ci + 1]
    v0 = v00 + cw * (v01 - v00)
    v1 = v10 + cw * (v11 - v10)
    return v0 + rw * (v1 - v0)


def inverse_cdf_sample(
    tables: IGSO3Tables, sigma: Array, u: Array
) -> Array:
    """Samples rotation angles omega by inverse-CDF interpolation.

    Args:
        tables: IGSO3 tables.
        sigma: [...] per-sample sigma values.
        u: [..., M] uniform(0,1) draws; batch dims broadcast against sigma.

    Returns:
        [..., M] angles in (0, pi].
    """
    cdf_rows = interp_rows(tables.cdf, tables.sigma_grid, sigma)  # [..., No]
    # Normalize the cdf to end at 1 (the Riemann sum is approximate).
    cdf_rows = cdf_rows / cdf_rows[..., -1:]
    flat_cdf = cdf_rows.reshape((-1, cdf_rows.shape[-1]))
    flat_u = jnp.broadcast_to(
        u, sigma.shape + u.shape[-1:]
    ).reshape((flat_cdf.shape[0], -1))
    omega = jax.vmap(lambda c, x: jnp.interp(x, c, tables.omega_grid))(
        flat_cdf, flat_u
    )
    return omega.reshape(sigma.shape + u.shape[-1:])


# ---------------------------------------------------------------------------
# Live series evaluation (device, differentiable, high accuracy)
# ---------------------------------------------------------------------------


def score_norm_series(
    omega: Array, sigma: Array, num_terms: int = 1000, reg: float = 1e-4
) -> Array:
    """On-device d/domega log f(omega; sigma) via the truncated series.

    Args:
        omega: [...] angles.
        sigma: [...] broadcastable sigma values.

    Mirrors the reference's live path (`so3_diffuser.py:300-305`), but in
    jnp so it fuses into the surrounding jit. Cost O(num_terms) per element.
    """
    ls = jnp.arange(num_terms, dtype=omega.dtype)
    om = omega[..., None]
    ep = jnp.broadcast_to(sigma, omega.shape)[..., None]
    pref = (2.0 * ls + 1.0) * jnp.exp(-ls * (ls + 1.0) * ep**2 / 2.0)
    hi = jnp.sin(om * (ls + 0.5))
    dhi = (ls + 0.5) * jnp.cos(om * (ls + 0.5))
    lo = jnp.sin(om / 2.0)
    dlo = 0.5 * jnp.cos(om / 2.0)
    expansion = (pref * hi / lo).sum(-1)
    d_expansion = (pref * (lo * dhi - hi * dlo) / lo**2).sum(-1)
    return d_expansion / (expansion + reg)
