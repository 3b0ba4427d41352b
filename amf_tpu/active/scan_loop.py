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
from amf_tpu.models import bpmf_gibbs, bpmf_hmc, mnormal, pmf, vnormal
from amf_tpu.types import Problem, rating_bounds


class SweepResult(NamedTuple):
    n_rated: jax.Array  # (steps,)
    rmse: jax.Array  # (steps,)
    picks_i: jax.Array  # (steps,)
    picks_j: jax.Array  # (steps,)
    valid: jax.Array  # (steps,) False once the pool is exhausted
    rmse0: jax.Array  # scalar: pre-query RMSE after the initial fit
    evals: Optional[jax.Array] = None  # (steps, n, m) criterion maps
    # (NaN off-pool), present when run_scan(record_evals=True)


def run_scan(
    problem: Problem,
    real: jax.Array,
    state0,
    score,  # (state, prob, key) -> (n, m) evals
    refit,  # (state, prob, key) -> state
    err,  # (state, prob) -> scalar
    steps: int,
    key: jax.Array,
    maximize: bool,
    record_evals: bool = False,
) -> Tuple[SweepResult, object]:
    """The whole {score, pick, query, refit} sweep as one ``lax.scan`` —
    zero host synchronization per step, states never leave HBM. Shared by
    every model family (the scan analogue of active/driver.drive_active).

    record_evals=True additionally stacks each step's full criterion map
    into the result (the non-scan loops' per-step evals records, used by
    plot_criteria_over_time — reference plot_results.py:222). Costs
    steps*n*m device memory; leave off for large problems."""
    n, m = problem.shape

    def step(carry, k):
        prob, state = carry
        k_score, k_refit = jax.random.split(k)
        ev = score(state, prob, k_score)
        if record_evals:
            # NaN off the then-queryable pool, matching the non-scan loops'
            # records (gibbs_loop/stan_loop/loop evals_for masking)
            ev_rec = jnp.where(prob.queryable, ev, jnp.nan)
        any_left = jnp.any(prob.queryable)
        if maximize:
            flat = jnp.argmax(jnp.where(prob.queryable, ev, -jnp.inf))
        else:
            flat = jnp.argmin(jnp.where(prob.queryable, ev, jnp.inf))
        # no finite score on the pool (e.g. all-masked *-pos margins):
        # still pick a queryable cell, as the reference's selectors do
        # (their candidate vector only contains queryable cells)
        flat = jnp.where(
            jnp.isfinite(ev.ravel()[flat]) & prob.queryable.ravel()[flat],
            flat, jnp.argmax(prob.queryable.ravel()),
        )
        i, j = flat // m, flat % m

        new_prob = prob.add_rating(i, j, real[i, j])
        prob = jax.tree.map(
            lambda a, b: jnp.where(any_left, a, b), new_prob, prob
        )
        state = refit(state, prob, k_refit)
        out = (prob.n_rated, err(state, prob), i, j, any_left)
        if record_evals:
            out += (ev_rec,)
        return (prob, state), out

    err0 = err(state0, problem)
    keys = jax.random.split(key, steps)
    (prob, state), outs = jax.lax.scan(step, (problem, state0), keys)
    nr, errs, pi, pj, valid = outs[:5]
    evals = outs[5] if record_evals else None
    return SweepResult(nr, errs, pi, pj, valid, err0, evals), state


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
    model: str = "vn",  # 'vn' (ActivePMF) | 'mn' (MNActivePMF)
    record_evals: bool = False,
) -> Tuple[SweepResult, pmf.PMFState]:
    """Variational-family scan sweep (every vn/mn criterion; lookahead
    criteria need lcfg). Returns per-step traces and the final carry."""
    n, m = problem.shape
    real = jnp.asarray(real, dtype=problem.R_obs.dtype)
    if model == "mn":
        mcfg = mnormal.MNConfig(latent_d=pcfg.latent_d)
        adapter = lookahead_mod.mn_adapter(mcfg)
    else:
        vcfg = vcfg or vnormal.VNConfig(latent_d=pcfg.latent_d)
        adapter = lookahead_mod.vn_adapter(vcfg)

    key, kinit, kapprox = jax.random.split(key, 3)
    pst0 = pmf.init_state(kinit, n, m, pcfg, problem, dtype=real.dtype)
    pst0, _ = pmf.fit(pst0, problem, pcfg, max_steps=refit_budget)
    ast0 = adapter.init_approx(kapprox, pst0)
    if crit.needs_approx:
        ast0 = adapter.fit_approx(ast0, pst0, problem, approx_budget)

    def score(state, prob, k):
        pst, ast = state
        if crit.kind == "direct":
            amv = adapter.pred_mean_var(ast, prob) if crit.needs_approx else None
            return criteria_mod.direct_scores(
                crit, pmf.predicted_matrix(pst, pcfg), amv, k
            )
        assert lcfg is not None, "lookahead criteria need a LookaheadConfig"
        return lookahead_mod.lookahead_scores(
            crit, pst, ast, prob, k, pcfg, adapter, lcfg
        ).reshape(n, m)

    def refit(state, prob, k):
        pst, ast = state
        pst = pmf.refresh_mean_rating(pst, prob)
        pst, _ = pmf.fit(pst, prob, pcfg, max_steps=refit_budget)
        if crit.needs_approx:
            ast = adapter.fit_approx(ast, pst, prob, approx_budget)
        return pst, ast

    def err(state, prob):
        return metrics.rmse_on(
            pmf.predicted_matrix(state[0], pcfg), real, prob.test
        )

    res, (pst, ast) = run_scan(
        problem, real, (pst0, ast0), score, refit, err, steps, key,
        crit.maximize, record_evals=record_evals,
    )
    return res, pst


def run_gibbs_scan(
    problem: Problem,
    real: jax.Array,
    kname: str,
    steps: int,
    key: jax.Array,
    pcfg: pmf.PMFConfig,
    gcfg: bpmf_gibbs.GibbsConfig,
    num_samps: int = 128,
    rating_values: Tuple[float, ...] = (),
    lookahead_samps: int = 30,
    lookahead_tile: int = 0,
    record_evals: bool = False,
) -> Tuple[SweepResult, object]:
    """Gibbs-BPMF scan sweep: every KEYS criterion, incl. the exp-variance
    MCMC lookahead, as one device program."""
    from amf_tpu.active.gibbs_loop import KEYS, _CUTOFFS

    spec = KEYS[kname]
    n, m = problem.shape
    real = jnp.asarray(real, dtype=problem.R_obs.dtype)
    vals = tuple(sorted(rating_values)) if rating_values else ()
    bounds = tuple(rating_bounds(vals)) if vals else None

    def sample(pst, prob, k):
        chain = bpmf_gibbs.init_chain(pst)
        _, stats, _ = bpmf_gibbs.run_chain(
            k, chain, prob, gcfg, num_samps,
            cutoffs=_CUTOFFS, value_bounds=bounds,
        )
        return stats

    def score(state, prob, k):
        pst, stats = state
        if spec.kind == "random":
            return jax.random.uniform(k, (n, m), dtype=real.dtype)
        if spec.kind == "pred-variance":
            return stats.var
        if spec.kind == "pred":
            return stats.mean
        if spec.kind == "prob-ge":
            return stats.prob_ge[_CUTOFFS.index(spec.cutoff)]
        # vals = () -> continuous normal-fit integration path
        return bpmf_gibbs.exp_variance_scores(
            k, pst, prob, pcfg, gcfg, stats, vals,
            num_samps=lookahead_samps, n_base_samples=num_samps,
            candidate_tile=lookahead_tile,
        ).reshape(n, m)

    def refit(state, prob, k):
        pst, _ = state
        pst = pmf.refresh_mean_rating(pst, prob)
        pst, _ = pmf.fit(pst, prob, pcfg)
        return pst, sample(pst, prob, k)

    def err(state, prob):
        return metrics.rmse_on(state[1].mean, real, prob.test)

    key, kinit, ks = jax.random.split(key, 3)
    pst0 = pmf.init_state(kinit, n, m, pcfg, problem, dtype=real.dtype)
    pst0, _ = pmf.fit(pst0, problem, pcfg)
    state0 = (pst0, sample(pst0, problem, ks))
    return run_scan(
        problem, real, state0, score, refit, err, steps, key, spec.choose_max,
        record_evals=record_evals,
    )


def run_stan_scan(
    problem: Problem,
    real: jax.Array,
    kname: str,
    steps: int,
    key: jax.Array,
    cfg: bpmf_hmc.HMCConfig,
    num_samps: int = 100,
    warmup: Optional[int] = None,
    rating_values: Tuple[float, ...] = (),
    lookahead_samps: int = 30,
    lookahead_warmup: int = 15,
    lookahead_tile: int = 0,
    binary_acc: bool = False,
    record_evals: bool = False,
) -> Tuple[SweepResult, object]:
    """NUTS-BPMF scan sweep: every KEYS criterion, incl. the NUTS-per-lane
    lookaheads, as one device program."""
    from amf_tpu.active.stan_loop import KEYS, _CUTOFFS
    from amf_tpu.models import sample_stats

    spec = KEYS[kname]
    n, m = problem.shape
    real = jnp.asarray(real, dtype=problem.R_obs.dtype)
    vals = tuple(sorted(rating_values)) if rating_values else ()
    bounds = tuple(rating_bounds(vals)) if vals else None
    warmup = num_samps // 2 if warmup is None else warmup

    def sample(st, prob, k):
        st, samps = bpmf_hmc.samples(k, st, prob, cfg, num_samps, warmup)
        stats = sample_stats.prediction_stats(
            samps["U"], samps["V"], st.mean_rating, cfg.subtract_mean,
            cutoffs=_CUTOFFS, value_bounds=bounds,
        )
        return st, stats

    def score(state, prob, k):
        st, stats = state
        if spec.kind == "random":
            return jax.random.uniform(k, (n, m), dtype=real.dtype)
        if spec.kind == "pred-variance":
            return stats.var
        if spec.kind == "pred":
            return stats.mean
        if spec.kind == "prob-ge":
            return stats.prob_ge[_CUTOFFS.index(spec.cutoff)]
        # vals = () -> continuous normal-fit integration path
        stat = ("total-variance" if spec.kind == "exp-variance"
                else "entropy-est")
        return bpmf_hmc.lookahead_scores(
            k, st, prob, cfg, stats, vals, stat=stat,
            num_samps=lookahead_samps, warmup=lookahead_warmup,
            n_base_samples=num_samps, candidate_tile=lookahead_tile,
        ).reshape(n, m)

    def refit(state, prob, k):
        st, _ = state
        st = bpmf_hmc.invalidate_mode(st, prob)
        return sample(st, prob, k)

    def err(state, prob):
        if binary_acc:
            return metrics.binary_misclassification(
                state[1].mean, real, prob.test
            )
        return metrics.rmse_on(state[1].mean, real, prob.test)

    key, ks = jax.random.split(key)
    st0 = bpmf_hmc.init_state(problem, cfg, dtype=real.dtype)
    state0 = sample(st0, problem, ks)
    return run_scan(
        problem, real, state0, score, refit, err, steps, key, spec.choose_max,
        record_evals=record_evals,
    )


def result_to_records(problem: Problem, res: SweepResult):
    """Convert a SweepResult into the reference-schema record list used by
    every results pickle: an initial pre-query record then one
    (num_rated, err, (i, j), evals) tuple per valid step
    (plot_results.py:160-166 consumer shape). Shared by the CLIs' --scan
    paths so the tuple shape changes in exactly one place."""
    import numpy as np

    recs = [(int(problem.n_rated), float(res.rmse0), None, None)]
    evs = (np.asarray(res.evals) if res.evals is not None
           else [None] * len(np.asarray(res.valid)))
    recs += [
        (int(nr), float(err), (int(i), int(j)),
         None if ev is None else np.asarray(ev))
        for nr, err, i, j, ok, ev in zip(
            np.asarray(res.n_rated), np.asarray(res.rmse),
            np.asarray(res.picks_i), np.asarray(res.picks_j),
            np.asarray(res.valid), evs,
        )
        if ok
    ]
    return recs
