"""The batched one-step lookahead engine.

This is the hot core the framework exists to accelerate. The reference
evaluates E[f(model + hypothesized R_ij)] by, for every unobserved cell and
every rating value, deep-copying the model, adding the hypothesized rating,
optionally refitting the MAP estimate, refitting the normal approximation,
and evaluating a statistic — fanned out over a multiprocessing pool, one
pickled model per task (active_pmf.py:635-704, 739-770).

Here the whole (candidate x rating-value) grid is a single ``vmap``-batched
device computation over immutable pytree states; budgeted ``while_loop``
refits make the fan-out compile to one XLA program.  Sharding the candidate
axis over a device mesh is a ``shard_map`` wrapper in ``parallel.sharding``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm

from amf_tpu.active.criteria import Criterion
from amf_tpu.models import mnormal, pmf, vnormal
from amf_tpu.ops import quadrature
from amf_tpu.types import Problem, rating_bounds
from amf_tpu.utils.rng import lane_keys


class LookaheadConfig(NamedTuple):
    rating_values: Tuple[float, ...]  # static; () = continuous integration
    refit_lookahead: bool = False  # reference --refit-lookahead flag
    discretize: str = "sum"  # 'sum' | 'simps' | 'continuous'
    n_integration_nodes: int = 16  # continuous mode nodes
    pmf_refit_steps: int = 300  # budget for in-lookahead MAP refits
    approx_refit_steps: int = 300  # budget for in-lookahead KL refits
    # candidates per vmapped pass; each lane carries its own problem copy and
    # approximation state, so this bounds peak memory (0 = all at once).
    candidate_tile: int = 0
    # polynomial-in-alpha line search for the in-lookahead MAP refits
    # (ops.linesearch.adaptive_descent_poly): rejected learning rates cost a
    # scalar quartic eval instead of a value pass. Same trajectory up to f32
    # near-ties — scoring-grade, so on by default for the fan-out.
    poly_ls: bool = True


class ModelAdapter(NamedTuple):
    """Polymorphism point between the full-covariance (vnormal) and
    Kronecker (mnormal) approximation layers."""

    init_approx: Callable  # (key, pmf_state) -> approx
    fit_approx: Callable  # (approx, pmf_state, problem, max_steps) -> approx
    pred_mean_var: Callable  # (approx, problem) -> (mean, var) (n, m)
    entropy: Callable  # (approx, problem) -> scalar
    pred_covs: Optional[Callable]  # (approx, problem) -> (nm, nm) or None


def vn_adapter(vcfg: vnormal.VNConfig) -> ModelAdapter:
    return ModelAdapter(
        init_approx=lambda key, pst: vnormal.initialize_approx(key, pst, vcfg),
        fit_approx=lambda a, pst, prob, max_steps: vnormal.fit_normal(
            a, pst, prob, vcfg, max_steps=max_steps
        )[0],
        pred_mean_var=lambda a, prob: vnormal.approx_pred_means_vars(a, prob, vcfg),
        entropy=lambda a, prob: vnormal.approx_entropy(a),
        pred_covs=lambda a, prob: vnormal.approx_pred_covs(a, prob, vcfg),
    )


def mn_adapter(mcfg: mnormal.MNConfig) -> ModelAdapter:
    return ModelAdapter(
        init_approx=lambda key, pst: mnormal.initialize_approx(
            pst, mcfg, key=key, random_cov=False
        ),
        fit_approx=lambda a, pst, prob, max_steps: mnormal.fit_normal(
            a, pst, prob, mcfg, max_steps=max_steps
        )[0],
        pred_mean_var=lambda a, prob: mnormal.approx_pred_means_vars(a, prob),
        entropy=lambda a, prob: mnormal.approx_entropy(a, *prob.shape),
        pred_covs=None,  # not supported (reference: mn_active_pmf.py:332+)
    )


def _stat_fn(crit: Criterion, adapter: ModelAdapter):
    """Statistic evaluated on the refit state for a hypothesized rating.

    Reference analogues: _total_variance (active_pmf.py:605-606),
    _approx_entropy (:526-530), _pred_entropy_bound (:559-574),
    _last_step_lookahead_helper (:492-500).
    """
    stat = crit.stat

    def fn(pst, ast, prob, v):
        if stat == "total-variance":
            # NOTE: the reference sums Var[R_ij] over *all* cells, rated
            # included (approx_pred_means_vars()[1].sum()).
            return adapter.pred_mean_var(ast, prob)[1].sum()
        if stat == "uv-entropy":
            return adapter.entropy(ast, prob)
        if stat == "pred-entropy-bound":
            pc = adapter.pred_covs(ast, prob)
            sign, logdet = jnp.linalg.slogdet(pc)
            # reference numerical-error fallback (active_pmf.py:566-571)
            return jnp.where(
                sign == 1,
                logdet,
                jnp.where((sign == -1) & (logdet < -50), -1000.0, jnp.nan),
            )
        if stat == "1step-ge":
            utility = (v >= crit.cutoff).astype(jnp.result_type(v))
            mean, var = adapter.pred_mean_var(ast, prob)
            # sf with scale=variance — reference quirk (active_pmf.py:499)
            probs = norm.sf(crit.cutoff, loc=mean, scale=jnp.maximum(var, 1e-30))
            best = jnp.max(jnp.where(prob.queryable, probs, -jnp.inf))
            return utility + best
        raise ValueError(f"unknown lookahead stat {stat}")

    return fn


def lookahead_scores(
    crit: Criterion,
    pmf_state: pmf.PMFState,
    approx_state,
    problem: Problem,
    key: jax.Array,
    pcfg: pmf.PMFConfig,
    adapter: ModelAdapter,
    lcfg: LookaheadConfig,
    cand: Optional[jax.Array] = None,
) -> jax.Array:
    """Scores for flat candidate cell indices ``cand`` (default: all cells).

    Returns a (len(cand),) vector of integrated lookahead values; cells not
    in ``problem.queryable`` get NaN.
    """
    n, m = problem.shape
    if cand is None:
        cand = jnp.arange(n * m, dtype=jnp.int32)

    # --- predictive distribution for R_ij used to weight the values
    if crit.use_map:
        # reference: np.dot(users[i], items[j]) — no mean shift because
        # ActivePMF pins subtract_mean=False (active_pmf.py:110-112, 658);
        # honor the config for generality
        mean_mat = pmf.predicted_matrix(pmf_state, pcfg)
        var_mat = jnp.broadcast_to(pmf_state.sigma_sq, mean_mat.shape)
    else:
        mean_mat, var_mat = adapter.pred_mean_var(approx_state, problem)
    std_mat = jnp.sqrt(jnp.maximum(var_mat, 1e-30))

    ii = cand // m
    jj = cand % m
    mean_c = mean_mat[ii, jj]
    std_c = std_mat[ii, jj]

    dtype = mean_c.dtype
    # the reference forces discretization for the 1-step active-search
    # criteria regardless of discrete_expectations (active_pmf.py:469-474)
    discretize = lcfg.discretize
    if crit.stat == "1step-ge" and lcfg.rating_values:
        discretize = "sum"
    if discretize == "continuous" or not lcfg.rating_values:
        pts, wts = quadrature.gauss_legendre_nodes(
            mean_c, std_c, lcfg.n_integration_nodes
        )
        vals_c, w_c = pts, wts  # (C, V)
    else:
        values = np.asarray(sorted(lcfg.rating_values), dtype=np.float64)
        if discretize == "simps":
            w_c = quadrature.simpson_weights(mean_c, std_c, values)
        else:
            bounds = rating_bounds(tuple(values))
            w_c = quadrature.discrete_weights(mean_c, std_c, bounds)
        vals_c = jnp.broadcast_to(
            jnp.asarray(values, dtype=dtype), (cand.shape[0], values.size)
        )

    stat = _stat_fn(crit, adapter)

    def eval_one(i, j, v, subkey):
        prob2 = problem.add_rating(i, j, v)
        pst = pmf_state
        ast = approx_state
        if lcfg.refit_lookahead:
            # reference: do_fit() then initialize_approx() with a fresh
            # random covariance (active_pmf.py:671-673)
            pst, _ = pmf.fit(pst, prob2, pcfg, max_steps=lcfg.pmf_refit_steps,
                             poly_ls=lcfg.poly_ls)
            ast = adapter.init_approx(subkey, pst)
        ast = adapter.fit_approx(ast, pst, prob2, lcfg.approx_refit_steps)
        return stat(pst, ast, prob2, v)

    n_vals = vals_c.shape[1]
    keys = lane_keys(key, cand, n_vals)  # shard/tile-invariant streams

    eval_tile = jax.vmap(
        lambda i, j, vs, ks: jax.vmap(lambda v, k: eval_one(i, j, v, k))(vs, ks)
    )

    tile = lcfg.candidate_tile
    if tile and cand.shape[0] > tile:
        # bound peak memory: lax.map over candidate chunks of vmapped lanes
        # (the blocked sweep of SURVEY.md §5.7; pad to a tile multiple)
        c_total = cand.shape[0]
        pad = (-c_total) % tile

        def padded(x, fill=0):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        chunks = lambda x: x.reshape((-1, tile) + x.shape[1:])
        evals = jax.lax.map(
            lambda args: eval_tile(*args),
            (
                chunks(padded(ii)), chunks(padded(jj)),
                chunks(padded(vals_c)), chunks(padded(keys)),
            ),
        ).reshape(c_total + pad, n_vals)[:c_total]
    else:
        evals = eval_tile(ii, jj, vals_c, keys)  # (C, V)

    scores = jnp.sum(evals * w_c, axis=-1)
    return jnp.where(problem.queryable[ii, jj], scores, jnp.nan)
