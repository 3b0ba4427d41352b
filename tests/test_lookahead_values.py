"""Value tests for the sampler-family lookahead scorers.

The round-1 suite shape-tested the Gibbs/NUTS lookaheads; here each score is
re-derived from independently-executed parts and asserted equal:

  score(c) = sum_v w[v, c] * stat(fresh chain on problem+(c, v))

with w the Dirichlet-smoothed histogram of the BASE chain's predictions at c
(reference semantics: bayes_pmf.py:489-519 `_distribute`, 560-598
`_integrate_lookahead`; stan-bpmf/bpmf.py:436-443, 483-521). The per-lane
chains are reproduced exactly via utils.rng.lane_keys (global-candidate-index
streams), the MAP refit via the same budgeted pmf.fit, and the weights in
plain numpy — so the assertion covers the weight construction, the key
fan-out, the per-lane refit wiring, the value integration, and the NaN
masking of off-pool cells.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amf_tpu import types
from amf_tpu.data import make_fake_data
from amf_tpu.models import bpmf_gibbs, bpmf_hmc, pmf, sample_stats
from amf_tpu.utils.rng import lane_keys


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    real, known, vals = make_fake_data(
        num_users=5, num_items=5, rank=2, data_type=3, mask_type=0.5, rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    return real, prob, vals


def test_gibbs_exp_variance_matches_decomposed_oracle(problem, key):
    real, prob, vals = problem
    n, m = prob.shape
    pcfg = pmf.PMFConfig(latent_d=2, subtract_mean=True)
    gcfg = bpmf_gibbs.GibbsConfig(latent_d=2)
    pst = pmf.init_state(key, n, m, pcfg, prob, dtype=jnp.float64)
    pst, _ = pmf.fit(pst, prob, pcfg)
    bounds = tuple(types.rating_bounds(vals))
    n_base = 24
    _, base, _ = bpmf_gibbs.run_chain(
        key, bpmf_gibbs.init_chain(pst), prob, gcfg, n_base,
        value_bounds=bounds,
    )

    qq = np.nonzero(np.asarray(prob.queryable).ravel())[0]
    cand = jnp.asarray(qq[:4], jnp.int32)
    kscore = jax.random.fold_in(key, 9)
    num_samps, fit_budget, alpha = 6, 40, 0.1

    got = np.asarray(bpmf_gibbs.exp_variance_scores(
        kscore, pst, prob, pcfg, gcfg, base, vals,
        num_samps=num_samps, fit_budget=fit_budget, cand=cand,
        dirichlet_alpha=alpha, n_base_samples=n_base,
    ))

    # --- decomposed oracle
    values = sorted(vals)
    V = len(values)
    counts = np.asarray(base.bin_counts)  # (V, n, m)
    weights = (counts + alpha) / (n_base + alpha * V)
    keys = lane_keys(kscore, cand, V)  # exactly the scorer's streams

    @jax.jit
    def oracle_lane(i, j, v, k):  # ONE compile for all (cand, value) lanes
        prob2 = prob.add_rating(i, j, v)
        pst2 = pmf.refresh_mean_rating(pst, prob2)
        pst2, _ = pmf.fit(pst2, prob2, pcfg, max_steps=fit_budget)
        _, st, _ = bpmf_gibbs.run_chain(
            k, bpmf_gibbs.init_chain(pst2), prob2, gcfg, num_samps
        )
        return jnp.sum(st.var)

    want = []
    for ci, c in enumerate(np.asarray(cand)):
        i, j = divmod(int(c), m)
        acc = 0.0
        for vi, v in enumerate(values):
            acc += weights[vi, i, j] * float(
                oracle_lane(i, j, float(v), keys[ci, vi])
            )
        want.append(acc)

    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-8)


def test_gibbs_exp_variance_nan_off_pool(problem, key):
    real, prob, vals = problem
    n, m = prob.shape
    pcfg = pmf.PMFConfig(latent_d=2, subtract_mean=True)
    gcfg = bpmf_gibbs.GibbsConfig(latent_d=2)
    pst = pmf.init_state(key, n, m, pcfg, prob, dtype=jnp.float64)
    pst, _ = pmf.fit(pst, prob, pcfg)
    _, base, _ = bpmf_gibbs.run_chain(
        key, bpmf_gibbs.init_chain(pst), prob, gcfg, 16,
        value_bounds=tuple(types.rating_bounds(vals)),
    )
    scores = np.asarray(bpmf_gibbs.exp_variance_scores(
        key, pst, prob, pcfg, gcfg, base, vals, num_samps=4, fit_budget=10,
        n_base_samples=16,
    ))
    q = np.asarray(prob.queryable).ravel()
    assert np.isfinite(scores[q]).all()
    assert np.isnan(scores[~q]).all()


def test_hmc_lookahead_matches_decomposed_oracle(problem, key):
    real, prob, vals = problem
    n, m = prob.shape
    cfg = bpmf_hmc.HMCConfig(latent_d=2, subtract_mean=True)
    st = bpmf_hmc.init_state(prob, cfg, dtype=jnp.float64)
    n_base = 12
    st, samps = bpmf_hmc.samples(key, st, prob, cfg, n_base, 6)
    base = sample_stats.prediction_stats(
        samps["U"], samps["V"], st.mean_rating, cfg.subtract_mean,
        value_bounds=tuple(types.rating_bounds(vals)),
    )

    qq = np.nonzero(np.asarray(prob.queryable).ravel())[0]
    cand = jnp.asarray(qq[:2], jnp.int32)
    kscore = jax.random.fold_in(key, 5)
    num_samps, warmup, alpha = 4, 2, 0.1

    got = np.asarray(bpmf_hmc.lookahead_scores(
        kscore, st, prob, cfg, base, vals, stat="total-variance",
        num_samps=num_samps, warmup=warmup, cand=cand,
        dirichlet_alpha=alpha, n_base_samples=n_base,
    ))

    values = sorted(vals)
    V = len(values)
    counts = np.asarray(base.bin_counts)
    weights = (counts + alpha) / (n_base + alpha * V)
    keys = lane_keys(kscore, cand, V)

    @jax.jit
    def oracle_lane(i, j, v, k):  # ONE compile for all (cand, value) lanes
        prob2 = prob.add_rating(i, j, v)
        st2 = bpmf_hmc.invalidate_mode(st, prob2)
        st2, s2 = bpmf_hmc.samples(k, st2, prob2, cfg, num_samps, warmup)
        stats2 = sample_stats.prediction_stats(
            s2["U"], s2["V"], st2.mean_rating, cfg.subtract_mean
        )
        return jnp.sum(stats2.var)

    want = []
    for ci, c in enumerate(np.asarray(cand)):
        i, j = divmod(int(c), m)
        acc = 0.0
        for vi, v in enumerate(values):
            acc += weights[vi, i, j] * float(
                oracle_lane(i, j, float(v), keys[ci, vi])
            )
        want.append(acc)

    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-8)


def test_continuous_lookahead_matches_decomposed_oracle(problem, key):
    """Continuous-data path (no rating_values): per-cell normal fit,
    trapezoid over standard-normal ppf points (reference
    stan-bpmf/bpmf.py:446-453, 505-510 / bayes_pmf.py analogues) —
    re-derived independently per lane, for BOTH sampler families."""
    from scipy import stats as sp_stats

    real, prob, vals = problem
    n, m = prob.shape
    K = 7  # few integration points keeps the oracle loop cheap
    z = sp_stats.norm.ppf(np.linspace(0.001, 0.999, K))
    coef = np.empty_like(z)
    coef[1:-1] = (z[2:] - z[:-2]) / 2
    coef[0] = (z[1] - z[0]) / 2
    coef[-1] = (z[-1] - z[-2]) / 2
    w = coef * sp_stats.norm.pdf(z)

    pcfg = pmf.PMFConfig(latent_d=2, subtract_mean=True)
    pst = pmf.init_state(key, n, m, pcfg, prob, dtype=jnp.float64)
    pst, _ = pmf.fit(pst, prob, pcfg)
    qq = np.nonzero(np.asarray(prob.queryable).ravel())[0]
    cand = jnp.asarray(qq[:3], jnp.int32)
    kscore = jax.random.fold_in(key, 21)

    # --- Gibbs family
    gcfg = bpmf_gibbs.GibbsConfig(latent_d=2)
    _, base, _ = bpmf_gibbs.run_chain(
        key, bpmf_gibbs.init_chain(pst), prob, gcfg, 16)
    assert base.bin_counts is None  # no bounds -> continuous regime
    got = np.asarray(bpmf_gibbs.exp_variance_scores(
        kscore, pst, prob, pcfg, gcfg, base, (),
        num_samps=5, fit_budget=30, cand=cand, num_integration_pts=K,
    ))
    keys = lane_keys(kscore, cand, K)

    @jax.jit
    def g_lane(i, j, v, k):
        prob2 = prob.add_rating(i, j, v)
        pst2 = pmf.refresh_mean_rating(pst, prob2)
        pst2, _ = pmf.fit(pst2, prob2, pcfg, max_steps=30)
        _, st, _ = bpmf_gibbs.run_chain(
            k, bpmf_gibbs.init_chain(pst2), prob2, gcfg, 5)
        return jnp.sum(st.var)

    mean = np.asarray(base.mean)
    std = np.sqrt(np.maximum(np.asarray(base.var), 1e-12))
    want = []
    for ci, c in enumerate(np.asarray(cand)):
        i, j = divmod(int(c), m)
        pts = mean[i, j] + std[i, j] * z
        acc = sum(
            w[kk] * float(g_lane(i, j, float(pts[kk]), keys[ci, kk]))
            for kk in range(K)
        )
        want.append(acc)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-8)

    # --- NUTS family (same integration semantics)
    hcfg = bpmf_hmc.HMCConfig(latent_d=2, subtract_mean=False)
    st0 = bpmf_hmc.init_state(prob, hcfg, dtype=jnp.float64)
    st0, samps = bpmf_hmc.samples(key, st0, prob, hcfg, 12, 8)
    stats0 = sample_stats.prediction_stats(
        samps["U"], samps["V"], st0.mean_rating, False)
    assert stats0.bin_counts is None
    scores = np.asarray(bpmf_hmc.lookahead_scores(
        kscore, st0, prob, hcfg, stats0, (), stat="total-variance",
        num_samps=4, warmup=3, cand=cand, n_base_samples=12,
        num_integration_pts=K,
    ))
    assert np.isfinite(scores).all()
