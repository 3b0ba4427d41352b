"""Prediction statistics over factor-sample sets, shared by the Gibbs and
NUTS BPMF paths.

Reference analogues: predict/pred_variance/prob_ge_cutoff over sample lists
(bayes_pmf.py:433-542, stan-bpmf/bpmf.py:346-478). Computed by scanning over
samples so the (num_samps, n, m) prediction tensor never materializes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from amf_tpu.models.bpmf_gibbs import PredStats


def prediction_stats(
    U_samps: jax.Array,  # (S, n, d)
    V_samps: jax.Array,  # (S, m, d)
    mean_rating,
    subtract_mean: bool,
    cutoffs: Tuple[float, ...] = (),
    value_bounds: Optional[Tuple[float, ...]] = None,
) -> PredStats:
    S, n, d = U_samps.shape
    m = V_samps.shape[1]
    dtype = U_samps.dtype
    n_cut = len(cutoffs)
    cut_arr = jnp.asarray(cutoffs, dtype=dtype).reshape(n_cut, 1, 1)
    if value_bounds is not None:
        edges = jnp.asarray(value_bounds, dtype=dtype)
        n_bins = edges.shape[0] - 1
    else:
        n_bins = 0

    def step(carry, uv):
        s1, s2, ge, bins = carry
        U, V = uv
        pred = U @ V.T
        if subtract_mean:
            pred = pred + mean_rating
        s1 = s1 + pred
        s2 = s2 + pred * pred
        if n_cut:
            ge = ge + (pred[None] >= cut_arr).astype(dtype)
        if n_bins:
            in_bin = (pred[None] >= edges[:-1, None, None]) & (
                pred[None] < edges[1:, None, None]
            )
            bins = bins + in_bin.astype(dtype)
        return (s1, s2, ge, bins), None

    init = (
        jnp.zeros((n, m), dtype),
        jnp.zeros((n, m), dtype),
        jnp.zeros((n_cut, n, m), dtype),
        jnp.zeros((n_bins, n, m), dtype),
    )
    (s1, s2, ge, bins), _ = jax.lax.scan(step, init, (U_samps, V_samps))
    mean = s1 / S
    var = jnp.maximum(s2 / S - mean**2, 0.0)
    return PredStats(
        mean=mean, var=var, prob_ge=ge / S, bin_counts=bins if n_bins else None
    )


def matrix_normal_mle_from_factors(
    U_samps: jax.Array,  # (S, n, d)
    V_samps: jax.Array,  # (S, m, d)
    mean_rating,
    subtract_mean: bool,
    eps: float = 1e-3,
    max_steps: int = 1000,
    jitter: float = 1e-6,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """MLE (mean, row-cov U, col-cov V) of a matrix-normal over prediction
    samples via Dutilleul's alternating algorithm
    (reference: stan-bpmf/bpmf.matrix_normal_mle :86-172).

    Streams over the factor samples (predictions recomputed per sweep) so the
    (S, n, m) tensor never materializes. Cholesky failures are handled by a
    jitter bump instead of the reference's eigendecomposition repair
    (stan-bpmf/bpmf.py:149-161) — same effect, branch-free.
    """
    S, n, d = U_samps.shape
    m = V_samps.shape[1]
    dtype = U_samps.dtype
    shift = mean_rating if subtract_mean else jnp.zeros((), dtype)

    def scan_preds(f, init):
        def step(carry, uv):
            Uf, Vf = uv
            pred = Uf @ Vf.T + shift
            return f(carry, pred), None

        out, _ = jax.lax.scan(step, init, (U_samps, V_samps))
        return out

    mean = scan_preds(lambda c, p: c + p, jnp.zeros((n, m), dtype)) / S

    def safe_cho(a):
        a = a + jitter * jnp.trace(a) / a.shape[0] * jnp.eye(a.shape[0], dtype=dtype)
        return jnp.linalg.cholesky(a)

    def solve_with(chol, x):
        y = jax.scipy.linalg.solve_triangular(chol, x, lower=True)
        return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)

    # init: v = I_m; u = (1/(S m)) sum_s x x^T.
    # NOTE the 1/(S p) and 1/(S n) normalizations are Dutilleul's actual
    # iteration; the reference's loop omits them (stan-bpmf/bpmf.py:150-161,
    # visible in its own commented-out einsum at :125) which makes the factor
    # scales drift geometrically by (m/n) per sweep on non-square matrices —
    # overflow/NaN for every dataset here. We keep the correct normalization
    # (covariances are anyway only identified up to their Kronecker product).
    u0 = scan_preds(
        lambda c, p: c + (p - mean) @ (p - mean).T, jnp.zeros((n, n), dtype)
    ) / (S * m)
    v0 = jnp.eye(m, dtype=dtype)

    def cond(carry):
        u, v, du, dv, it = carry
        return ((du > eps) | (dv > eps)) & (it < max_steps)

    def body(carry):
        u, v, _, _, it = carry
        u_ch = safe_cho(u)
        v_new = scan_preds(
            lambda c, p: c + (p - mean).T @ solve_with(u_ch, p - mean),
            jnp.zeros((m, m), dtype),
        ) / (S * n)
        v_ch = safe_cho(v_new)
        u_new = scan_preds(
            lambda c, p: c + (p - mean) @ solve_with(v_ch, (p - mean).T),
            jnp.zeros((n, n), dtype),
        ) / (S * m)
        du = jnp.linalg.norm(u_new - u)
        dv = jnp.linalg.norm(v_new - v)
        return u_new, v_new, du, dv, it + 1

    inf = jnp.asarray(jnp.inf, dtype)
    u, v, _, _, _ = jax.lax.while_loop(cond, body, (u0, v0, inf, inf, jnp.int32(0)))
    return mean, u, v


def entropy_est_from_factors(
    U_samps, V_samps, mean_rating, subtract_mean, eps: float = 1e-3
) -> jax.Array:
    """Matrix-normal entropy estimate of the prediction distribution
    (reference: stan-bpmf/bpmf.entropy_est :369-390, up to constants)."""
    n = U_samps.shape[1]
    m = V_samps.shape[1]
    _, u, v = matrix_normal_mle_from_factors(
        U_samps, V_samps, mean_rating, subtract_mean, eps=eps
    )
    _, logdet_u = jnp.linalg.slogdet(u)
    _, logdet_v = jnp.linalg.slogdet(v)
    return (m * logdet_u + n * logdet_v) / 2
