import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amf_tpu import types
from amf_tpu.active import gibbs_loop
from amf_tpu.data import make_fake_data
from amf_tpu.models import bpmf_gibbs, pmf


def test_sample_wishart_moments(key):
    """E[Wishart(dof, sigma)] = dof * sigma."""
    d = 3
    rng = np.random.default_rng(0)
    a = rng.normal(size=(d, d))
    sigma = a @ a.T + d * np.eye(d)
    dof = 10.0
    keys = jax.random.split(key, 3000)
    draws = jax.vmap(
        lambda k: bpmf_gibbs.sample_wishart(k, jnp.asarray(sigma), dof)
    )(keys)
    got = np.asarray(draws.mean(0))
    np.testing.assert_allclose(got, dof * sigma, rtol=0.1)


def test_sample_hyperparam_concentrates(key):
    """With many iid rows, the posterior mean mu should concentrate near the
    empirical mean and alpha near the empirical precision."""
    rng = np.random.default_rng(1)
    d = 2
    true_mu = np.array([1.0, -2.0])
    true_cov = np.array([[1.0, 0.3], [0.3, 0.5]])
    feats = jnp.asarray(rng.multivariate_normal(true_mu, true_cov, size=5000))
    cfg = bpmf_gibbs.GibbsConfig(latent_d=d)
    keys = jax.random.split(key, 300)
    mus, alphas = jax.vmap(
        lambda k: bpmf_gibbs.sample_hyperparam(k, feats, cfg)
    )(keys)
    np.testing.assert_allclose(np.asarray(mus.mean(0)), true_mu, atol=0.1)
    np.testing.assert_allclose(
        np.asarray(alphas.mean(0)), np.linalg.inv(true_cov), rtol=0.15
    )


def test_sample_rows_conditional_posterior(key):
    """Batched row draws must match the exact conditional Gaussian:
    with alpha = a*I, beta, fully observed row, the posterior over u_i is
    N((alpha + beta V^T V)^{-1} beta V^T r, (alpha + beta V^T V)^{-1})."""
    rng = np.random.default_rng(2)
    n, m, d = 4, 30, 2
    V = rng.normal(size=(m, d))
    true_u = rng.normal(size=(n, d))
    R = true_u @ V.T + rng.normal(0, 0.2, size=(n, m))
    alpha = 2.0 * np.eye(d)
    mu = np.zeros(d)
    beta = 2.0

    keys = jax.random.split(key, 4000)
    draws = jax.vmap(
        lambda k: bpmf_gibbs._sample_rows(
            k, jnp.ones((n, m), bool), jnp.asarray(R), jnp.asarray(V),
            jnp.asarray(mu), jnp.asarray(alpha), beta,
        )
    )(keys)  # (S, n, d)

    S_mat = alpha + beta * V.T @ V
    want_mean = np.linalg.solve(S_mat, beta * V.T @ R.T).T  # (n, d)
    want_cov = np.linalg.inv(S_mat)
    got_mean = np.asarray(draws.mean(0))
    np.testing.assert_allclose(got_mean, want_mean, atol=0.05)
    got_cov = np.cov(np.asarray(draws[:, 0, :]).T)
    np.testing.assert_allclose(got_cov, want_cov, atol=0.05, rtol=0.2)


@pytest.fixture(scope="module")
def gibbs_problem():
    rng = np.random.default_rng(4)
    real, known, vals = make_fake_data(
        num_users=8, num_items=8, rank=2, data_type=5, mask_type=0.4, rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    return real, prob, vals


def test_run_chain_stats(gibbs_problem, key):
    real, prob, vals = gibbs_problem
    pcfg = pmf.PMFConfig(latent_d=2, subtract_mean=True)
    pst = pmf.init_state(key, *prob.shape, pcfg, prob, dtype=jnp.float64)
    pst, _ = pmf.fit(pst, prob, pcfg)
    chain = bpmf_gibbs.init_chain(pst)
    bounds = tuple(types.rating_bounds(vals))
    gcfg = bpmf_gibbs.GibbsConfig(latent_d=2)
    _, stats, samples = bpmf_gibbs.run_chain(
        key, chain, prob, gcfg, 64, cutoffs=(3.5,), value_bounds=bounds,
        keep_samples=True,
    )
    assert np.all(np.asarray(stats.var) >= 0)
    assert np.all((np.asarray(stats.prob_ge) >= 0) & (np.asarray(stats.prob_ge) <= 1))
    # bin counts sum to num_samps everywhere
    np.testing.assert_allclose(np.asarray(stats.bin_counts.sum(0)), 64.0)
    # streaming stats match the materialized samples
    U, V = samples
    preds = np.einsum("sik,sjk->sij", np.asarray(U), np.asarray(V)) + float(
        chain.mean_rating
    )
    np.testing.assert_allclose(np.asarray(stats.mean), preds.mean(0), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(stats.var), preds.var(0), rtol=1e-6, atol=1e-10
    )
    # Gibbs posterior mean should reconstruct observed entries reasonably
    rated = np.asarray(prob.rated)
    err = np.sqrt(np.mean((preds.mean(0) - real)[rated] ** 2))
    assert err < 1.2


def test_exp_variance_scores_shape(gibbs_problem, key):
    real, prob, vals = gibbs_problem
    pcfg = pmf.PMFConfig(latent_d=2, subtract_mean=True)
    pst = pmf.init_state(key, *prob.shape, pcfg, prob, dtype=jnp.float64)
    pst, _ = pmf.fit(pst, prob, pcfg)
    chain = bpmf_gibbs.init_chain(pst)
    gcfg = bpmf_gibbs.GibbsConfig(latent_d=2)
    bounds = tuple(types.rating_bounds(vals))
    _, stats, _ = bpmf_gibbs.run_chain(
        key, chain, prob, gcfg, 32, value_bounds=bounds
    )
    qq = np.nonzero(np.asarray(prob.queryable).ravel())[0]
    cand = jnp.asarray(qq[:3], dtype=jnp.int32)
    scores = bpmf_gibbs.exp_variance_scores(
        key, pst, prob, pcfg, gcfg, stats, vals,
        num_samps=8, fit_budget=50, cand=cand, n_base_samples=32,
    )
    assert scores.shape == (3,)
    assert np.all(np.isfinite(np.asarray(scores)))
    assert np.all(np.asarray(scores) > 0)


def test_gibbs_active_loop(gibbs_problem):
    real, prob, vals = gibbs_problem
    res = gibbs_loop.run_active_gibbs(
        prob, real, ["random", "pred-variance", "prob-ge-3.5"],
        latent_d=2, rating_values=vals, num_samps=24, steps=3, seed=0,
    )
    for k in ["random", "pred-variance", "prob-ge-3.5"]:
        recs = res[k]
        assert len(recs) == 3
        assert all(np.isfinite(r[1]) for r in recs)


def test_gibbs_active_loop_binary_acc():
    """binary_acc records misclassification (reference's DrugBank metric,
    stan-bpmf/bpmf.py:53-54) instead of RMSE."""
    rng = np.random.default_rng(7)
    real = np.where(rng.normal(size=(8, 8)) > 0, 1.0, -1.0)
    known = rng.random((8, 8)) < 0.4
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    vals = (-1.0, 1.0)
    kw = dict(latent_d=2, rating_values=vals, num_samps=16, steps=2, seed=0)
    res = gibbs_loop.run_active_gibbs(
        prob, real, ["random"], binary_acc=True, **kw)
    errs = [r[1] for r in res["random"]]
    assert all(0.0 <= e <= 1.0 for e in errs)
    res_rmse = gibbs_loop.run_active_gibbs(
        prob, real, ["random"], binary_acc=False, **kw)
    assert errs != [r[1] for r in res_rmse["random"]]


def test_gibbs_replay_reproduces_run(gibbs_problem):
    """driver replay: re-driving a run's recorded picks with the same seed
    reproduces the exact err trace (scoring skipped, refit keys identical)
    — the mechanism used to re-score recorded runs under another metric."""
    real, prob, vals = gibbs_problem
    kw = dict(latent_d=2, rating_values=vals, num_samps=16, steps=3, seed=0)
    orig = gibbs_loop.run_active_gibbs(prob, real, ["pred-variance"], **kw)
    picks = [r[2] for r in orig["pred-variance"]]  # None-first, as recorded
    rep = gibbs_loop.run_active_gibbs(
        prob, real, ["pred-variance"],
        replay={"pred-variance": picks}, **kw)
    for ro, rr in zip(orig["pred-variance"], rep["pred-variance"]):
        assert ro[0] == rr[0] and ro[2] == rr[2]
        np.testing.assert_allclose(ro[1], rr[1], rtol=1e-12)


def test_gibbs_exp_variance_loop(gibbs_problem):
    real, prob, vals = gibbs_problem
    res = gibbs_loop.run_active_gibbs(
        prob, real, ["exp-variance"],
        latent_d=2, rating_values=vals, num_samps=16, lookahead_samps=6,
        steps=2, seed=0,
    )
    assert len(res["exp-variance"]) == 2


def test_gibbs_exp_variance_host_tiles_matches_fused(gibbs_problem):
    """Per-tile host dispatch == the fused whole-sweep program, record for
    record (the lane PRNG streams are global-candidate-index derived)."""
    real, prob, vals = gibbs_problem
    kw = dict(
        latent_d=2, rating_values=vals, num_samps=16, lookahead_samps=6,
        steps=2, seed=0,
    )
    fused = gibbs_loop.run_active_gibbs(
        prob, real, ["exp-variance"], lookahead_tile=0, **kw)
    tiled = gibbs_loop.run_active_gibbs(
        prob, real, ["exp-variance"], lookahead_tile=5,
        lookahead_host_tiles=True, **kw)
    for rf, rt in zip(fused["exp-variance"], tiled["exp-variance"]):
        assert rf[0] == rt[0] and rf[2] == rt[2]
        np.testing.assert_allclose(rf[1], rt[1], rtol=1e-6)


def test_split_query_test():
    rng = np.random.default_rng(0)
    real = rng.integers(1, 6, size=(10, 10)).astype(float)
    ratings = np.array([[0, 0, real[0, 0]], [1, 1, real[1, 1]]])
    q, t = gibbs_loop.split_query_test(real, ratings, "all")
    assert not q[0, 0] and not q[1, 1]
    assert t.sum() == (real != 0).sum()
    q2, t2 = gibbs_loop.split_query_test(real, ratings, "20", rng=rng)
    assert t2.sum() == 20
    assert not (q2 & t2).any()
