"""End-to-end active-learning slice (SURVEY.md §7 'minimum end-to-end slice'):
data -> PMF MAP fit -> normal-approx fit -> batched criterion scoring ->
argmax -> mask update -> repeat -> RMSE curve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amf_tpu import types
from amf_tpu.active import criteria, lookahead, loop
from amf_tpu.data import make_fake_data
from amf_tpu.models import pmf, vnormal


@pytest.fixture(scope="module")
def small_problem():
    rng = np.random.default_rng(3)
    real, known, vals = make_fake_data(
        num_users=6, num_items=6, rank=2, data_type=5, mask_type="diag", rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    return real, prob, vals


def test_direct_criteria_loop(small_problem):
    real, prob, vals = small_problem
    res = loop.run_active_pmf(
        prob, real, ["random", "pred", "pred-variance", "prob-ge-3.5"],
        latent_d=2, rating_values=vals, steps=4, seed=0,
    )
    for k in ["random", "pred", "pred-variance", "prob-ge-3.5"]:
        recs = res[k]
        assert len(recs) == 4
        n0, rmse0, ij0, ev0 = recs[0]
        assert ij0 is None
        for n_rated, err, ij, evals in recs[1:]:
            assert np.isfinite(err)
            assert ij is not None
            assert evals.shape == real.shape
            # evals NaN exactly off the pool at scoring time
            assert np.isnan(evals[np.asarray(prob.rated)]).all()
        # counts increase by one each step
        counts = [r[0] for r in recs]
        assert counts == list(range(counts[0], counts[0] + 4))


def test_lookahead_criterion_loop(small_problem):
    real, prob, vals = small_problem
    res = loop.run_active_pmf(
        prob, real, ["total-variance"],
        latent_d=2, rating_values=vals, discrete_exp=True,
        steps=3, seed=0, lookahead_budget=120,
    )
    recs = res["total-variance"]
    assert len(recs) == 3
    for n_rated, err, ij, evals in recs[1:]:
        assert np.isfinite(err)
        vals_on_pool = evals[~np.isnan(evals)]
        assert vals_on_pool.size > 0
        assert np.isfinite(vals_on_pool).all()


def test_lookahead_mn_model(small_problem):
    real, prob, vals = small_problem
    res = loop.run_active_pmf(
        prob, real, ["uv-entropy"],
        latent_d=2, rating_values=vals, discrete_exp=True,
        steps=2, seed=0, model="mn", lookahead_budget=100,
    )
    assert len(res["uv-entropy"]) == 2


def test_refit_lookahead_path(small_problem):
    real, prob, vals = small_problem
    res = loop.run_active_pmf(
        prob, real, ["total-variance"],
        latent_d=2, rating_values=vals, discrete_exp=True,
        refit_lookahead=True, steps=2, seed=0, lookahead_budget=60,
    )
    assert len(res["total-variance"]) == 2


def test_results_schema(small_problem):
    real, prob, vals = small_problem
    res = loop.run_active_pmf(
        prob, real, ["random"], latent_d=2, rating_values=vals, steps=2, seed=0
    )
    assert res["_real"].shape == real.shape
    assert res["_ratings"].shape[1] == 3
    assert res["_rating_vals"] == tuple(vals)


def test_lookahead_scores_match_manual_expectation(small_problem):
    """Integration weights: score must equal sum_v w_v * stat(state + (i,j,v))
    with w_v the CDF-bin masses (reference: active_pmf.py:679-689)."""
    real, prob, vals = small_problem
    pcfg = pmf.PMFConfig(latent_d=2)
    key = jax.random.PRNGKey(0)
    pst = pmf.init_state(key, *prob.shape, pcfg, prob, dtype=jnp.float64)
    pst, _ = pmf.fit(pst, prob, pcfg)
    vcfg = vnormal.VNConfig(latent_d=2)
    adapter = lookahead.vn_adapter(vcfg)
    ast = adapter.init_approx(jax.random.PRNGKey(1), pst)
    ast = adapter.fit_approx(ast, pst, prob, 400)

    lcfg = lookahead.LookaheadConfig(
        rating_values=tuple(vals), discretize="sum",
        pmf_refit_steps=100, approx_refit_steps=100,
    )
    crit = criteria.KEY_FUNCS["total-variance"]

    qq = np.nonzero(np.asarray(prob.queryable).ravel())[0]
    cand = jnp.asarray(qq[:1], dtype=jnp.int32)
    score = lookahead.lookahead_scores(
        crit, pst, ast, prob, jax.random.PRNGKey(2), pcfg, adapter, lcfg, cand=cand
    )

    # manual: weights from MAP predictive, stat = total pred variance
    i, j = divmod(int(qq[0]), prob.shape[1])
    mean = float(pst.U[i] @ pst.V[j])
    std = float(jnp.sqrt(pst.sigma_sq))
    from scipy import stats

    bounds = types.rating_bounds(tuple(vals))
    w = np.diff(stats.norm.cdf(bounds, loc=mean, scale=std))
    evals = []
    for v in sorted(vals):
        prob2 = prob.add_rating(i, j, float(v))
        ast2 = adapter.fit_approx(ast, pst, prob2, 100)
        evals.append(float(vnormal.approx_pred_means_vars(ast2, prob2, vcfg)[1].sum()))
    want = float((np.array(evals) * w).sum())
    assert float(score[0]) == pytest.approx(want, rel=1e-6)


def test_host_tiled_lookahead_matches_fused(small_problem):
    """Host-dispatched per-tile programs must match the fused sweep
    lane-for-lane (lane PRNG streams are candidate-index derived)."""
    real, prob, vals = small_problem
    common = dict(
        latent_d=2, rating_values=vals, discrete_exp=True,
        refit_lookahead=True, steps=3, seed=0, lookahead_budget=60,
    )
    fused = loop.run_active_pmf(prob, real, ["total-variance"], **common)
    tiled = loop.run_active_pmf(
        prob, real, ["total-variance"], lookahead_tile=5,
        lookahead_host_tiles=True, **common,
    )
    for rf, rt in zip(fused["total-variance"], tiled["total-variance"]):
        assert rf[0] == rt[0]
        assert rf[2] == rt[2]
        np.testing.assert_allclose(rf[1], rt[1], rtol=0, atol=1e-9)
        if rf[3] is not None:
            mf = np.isfinite(np.asarray(rf[3], float))
            assert np.array_equal(mf, np.isfinite(np.asarray(rt[3], float)))
            np.testing.assert_allclose(
                np.asarray(rf[3], float)[mf], np.asarray(rt[3], float)[mf],
                rtol=0, atol=1e-9)
