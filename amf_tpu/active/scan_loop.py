"""The active-learning sweep as a single compiled device program.

``run_active_pmf`` (loop.py) mirrors the reference's host-driven loop and
records full eval matrices per step. For production sweeps this module
compiles the WHOLE sweep — {score, pick, query, refit} x steps — into one
``lax.scan``: zero host synchronization per step, states never leave HBM.
This is the end state of SURVEY.md §7's design stance ("the active loop a
lax.scan"); the reference's equivalent is a Python while-loop spanning
process pools (active_pmf.py:880-898).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from amf_tpu.active import criteria as criteria_mod
from amf_tpu.active import lookahead as lookahead_mod
from amf_tpu.analysis import metrics
from amf_tpu.models import pmf, vnormal
from amf_tpu.types import Problem


class SweepResult(NamedTuple):
    n_rated: jax.Array  # (steps,)
    rmse: jax.Array  # (steps,)
    picks_i: jax.Array  # (steps,)
    picks_j: jax.Array  # (steps,)
    valid: jax.Array  # (steps,) False once the pool is exhausted
    rmse0: jax.Array  # scalar: pre-query RMSE after the initial fit


def run_active_scan(
    problem: Problem,
    real: jax.Array,
    crit: criteria_mod.Criterion,
    steps: int,
    key: jax.Array,
    pcfg: pmf.PMFConfig,
    vcfg: Optional[vnormal.VNConfig] = None,
    lcfg: Optional[lookahead_mod.LookaheadConfig] = None,
    refit_budget: int = 2000,
    approx_budget: int = 2000,
) -> Tuple[SweepResult, pmf.PMFState]:
    """Run ``steps`` active-learning queries as one jitted scan.

    Supports every criterion in the registry; lookahead criteria need lcfg.
    Returns per-step traces and the final PMF state.
    """
    n, m = problem.shape
    real = jnp.asarray(real, dtype=problem.R_obs.dtype)
    vcfg = vcfg or vnormal.VNConfig(latent_d=pcfg.latent_d)
    adapter = lookahead_mod.vn_adapter(vcfg)

    key, kinit, kapprox = jax.random.split(key, 3)
    pst0 = pmf.init_state(kinit, n, m, pcfg, problem, dtype=real.dtype)
    pst0, _ = pmf.fit(pst0, problem, pcfg, max_steps=refit_budget)
    ast0 = adapter.init_approx(kapprox, pst0)
    if crit.needs_approx:
        ast0 = adapter.fit_approx(ast0, pst0, problem, approx_budget)

    def score(pst, ast, prob, k):
        if crit.kind == "direct":
            amv = adapter.pred_mean_var(ast, prob) if crit.needs_approx else None
            return criteria_mod.direct_scores(
                crit, pmf.predicted_matrix(pst, pcfg), amv, k
            )
        assert lcfg is not None, "lookahead criteria need a LookaheadConfig"
        return lookahead_mod.lookahead_scores(
            crit, pst, ast, prob, k, pcfg, adapter, lcfg
        ).reshape(n, m)

    def step(carry, k):
        prob, pst, ast = carry
        k_score, k_refit = jax.random.split(k)
        ev = score(pst, ast, prob, k_score)
        any_left = jnp.any(prob.queryable)
        if crit.maximize:
            flat = jnp.argmax(jnp.where(prob.queryable, ev, -jnp.inf))
        else:
            flat = jnp.argmin(jnp.where(prob.queryable, ev, jnp.inf))
        i, j = flat // m, flat % m

        new_prob = prob.add_rating(i, j, real[i, j])
        prob = jax.tree.map(
            lambda a, b: jnp.where(any_left, a, b), new_prob, prob
        )
        pst = pmf.refresh_mean_rating(pst, prob)
        pst, _ = pmf.fit(pst, prob, pcfg, max_steps=refit_budget)
        if crit.needs_approx:
            ast = adapter.fit_approx(ast, pst, prob, approx_budget)
        err = metrics.rmse_on(pmf.predicted_matrix(pst, pcfg), real, prob.test)
        out = (prob.n_rated, err, i, j, any_left)
        return (prob, pst, ast), out

    rmse0 = metrics.rmse_on(
        pmf.predicted_matrix(pst0, pcfg), real, problem.test
    )
    keys = jax.random.split(key, steps)
    (prob, pst, ast), (nr, errs, pi, pj, valid) = jax.lax.scan(
        step, (problem, pst0, ast0), keys
    )
    return SweepResult(nr, errs, pi, pj, valid, rmse0), pst
