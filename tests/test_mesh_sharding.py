"""Mesh-sharded lookahead scoring == unsharded scoring.

The candidate axis is the framework's scaling axis (SURVEY.md §2.4.1); these
tests assert on the 8-virtual-device CPU mesh (conftest.py) that sharding it
with ``parallel.sharding.sharded_candidate_scores`` is a pure execution-layout
choice: scores are bitwise/tolerance-identical to the single-device vmapped
sweep for the vn lookahead AND the Gibbs exp-variance lookahead (the
reference's two multiprocessing hot loops, active_pmf.py:739-770 and
bayes_pmf.py:514-519). Tile-invariance (candidate_tile) is covered for the
stochastic scorer too: both rely on utils.rng.lane_keys deriving per-lane
streams from GLOBAL candidate indices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amf_tpu import types
from amf_tpu.active import criteria as criteria_mod
from amf_tpu.active import lookahead as lookahead_mod
from amf_tpu.data import make_fake_data
from amf_tpu.models import bpmf_gibbs, bpmf_hmc, pmf, vnormal
from amf_tpu.parallel.mesh import make_mesh
from amf_tpu.parallel.sharding import sharded_candidate_scores


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return make_mesh(8)


@pytest.fixture(scope="module")
def small_problem():
    rng = np.random.default_rng(7)
    real, known, vals = make_fake_data(
        num_users=6, num_items=6, rank=2, data_type=5, mask_type=0.4, rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    return real, prob, vals


def test_vn_lookahead_sharded_matches_unsharded(small_problem, mesh, key):
    real, prob, vals = small_problem
    n, m = prob.shape
    pcfg = pmf.PMFConfig(latent_d=2, max_fit_steps=60)
    vcfg = vnormal.VNConfig(latent_d=2, max_fit_steps=40)
    adapter = lookahead_mod.vn_adapter(vcfg)
    lcfg = lookahead_mod.LookaheadConfig(
        rating_values=tuple(vals), discretize="sum",
        pmf_refit_steps=20, approx_refit_steps=20,
    )
    crit = criteria_mod.KEY_FUNCS["total-variance"]

    pst = pmf.init_state(key, n, m, pcfg, prob, dtype=jnp.float64)
    pst, _ = pmf.fit(pst, prob, pcfg)
    ast = adapter.init_approx(jax.random.fold_in(key, 1), pst)
    ast = adapter.fit_approx(ast, pst, prob, 50)

    def score_flat(cand, k):
        return lookahead_mod.lookahead_scores(
            crit, pst, ast, prob, k, pcfg, adapter, lcfg, cand=cand
        )

    kscore = jax.random.fold_in(key, 2)
    plain = np.asarray(score_flat(jnp.arange(n * m, dtype=jnp.int32), kscore))
    sharded = np.asarray(
        jax.jit(sharded_candidate_scores(score_flat, n * m, mesh))(kscore)
    )
    q = np.asarray(prob.queryable).ravel()
    # the adaptive line-search fits amplify XLA fusion differences between
    # batch shapes (C=36 vs C=5 per shard); equality is to tolerance
    np.testing.assert_allclose(sharded[q], plain[q], rtol=1e-3)
    assert np.isnan(sharded[~q]).all()


def test_gibbs_exp_variance_sharded_matches_unsharded(small_problem, mesh, key):
    real, prob, vals = small_problem
    n, m = prob.shape
    pcfg = pmf.PMFConfig(latent_d=2, subtract_mean=True)
    gcfg = bpmf_gibbs.GibbsConfig(latent_d=2)
    pst = pmf.init_state(key, n, m, pcfg, prob, dtype=jnp.float64)
    pst, _ = pmf.fit(pst, prob, pcfg)
    bounds = tuple(types.rating_bounds(vals))
    _, stats, _ = bpmf_gibbs.run_chain(
        key, bpmf_gibbs.init_chain(pst), prob, gcfg, 32, value_bounds=bounds
    )

    def score_flat(cand, k):
        return bpmf_gibbs.exp_variance_scores(
            k, pst, prob, pcfg, gcfg, stats, vals,
            num_samps=6, fit_budget=30, cand=cand, n_base_samples=32,
        )

    kscore = jax.random.fold_in(key, 3)
    plain = np.asarray(score_flat(jnp.arange(n * m, dtype=jnp.int32), kscore))
    sharded = np.asarray(
        jax.jit(sharded_candidate_scores(score_flat, n * m, mesh))(kscore)
    )
    q = np.asarray(prob.queryable).ravel()
    # same per-lane PRNG streams -> same chains (to XLA fusion tolerance)
    np.testing.assert_allclose(sharded[q], plain[q], rtol=1e-3)
    assert np.isnan(sharded[~q]).all()


def test_gibbs_exp_variance_tile_invariant(small_problem, key):
    """candidate_tile is a pure memory/scheduling knob: tiled == untiled."""
    real, prob, vals = small_problem
    n, m = prob.shape
    pcfg = pmf.PMFConfig(latent_d=2, subtract_mean=True)
    gcfg = bpmf_gibbs.GibbsConfig(latent_d=2)
    pst = pmf.init_state(key, n, m, pcfg, prob, dtype=jnp.float64)
    pst, _ = pmf.fit(pst, prob, pcfg)
    bounds = tuple(types.rating_bounds(vals))
    _, stats, _ = bpmf_gibbs.run_chain(
        key, bpmf_gibbs.init_chain(pst), prob, gcfg, 32, value_bounds=bounds
    )

    def run(tile):
        return np.asarray(
            bpmf_gibbs.exp_variance_scores(
                key, pst, prob, pcfg, gcfg, stats, vals,
                num_samps=6, fit_budget=30, n_base_samples=32,
                candidate_tile=tile,
            )
        )

    a, b = run(0), run(7)
    q = np.asarray(prob.queryable).ravel()
    np.testing.assert_allclose(b[q], a[q], rtol=1e-3)


def test_hmc_lookahead_sharded_matches_unsharded(small_problem, mesh, key):
    real, prob, vals = small_problem
    n, m = prob.shape
    cfg = bpmf_hmc.HMCConfig(latent_d=2, subtract_mean=True)
    st = bpmf_hmc.init_state(prob, cfg, dtype=jnp.float64)
    st, samps = bpmf_hmc.samples(key, st, prob, cfg, 16, 8)
    from amf_tpu.models import sample_stats

    base = sample_stats.prediction_stats(
        samps["U"], samps["V"], st.mean_rating, cfg.subtract_mean,
        value_bounds=tuple(types.rating_bounds(vals)),
    )

    def score_flat(cand, k):
        return bpmf_hmc.lookahead_scores(
            k, st, prob, cfg, base, vals, num_samps=4, warmup=2,
            n_base_samples=16, cand=cand,
        )

    kscore = jax.random.fold_in(key, 5)
    plain = np.asarray(score_flat(jnp.arange(n * m, dtype=jnp.int32), kscore))
    sharded = np.asarray(
        jax.jit(sharded_candidate_scores(score_flat, n * m, mesh))(kscore)
    )
    q = np.asarray(prob.queryable).ravel()
    np.testing.assert_allclose(sharded[q], plain[q], rtol=1e-3, atol=1e-12)
    assert np.isnan(sharded[~q]).all()


def test_rc_entropy_lookahead_sharded_matches_unsharded(small_problem, mesh):
    """The RC 1-step entropy lookahead (the reference's MATLAB
    refit-per-candidate loop, select_1step_lowest_entropy.m:25-28) is
    deterministic, so candidate sharding must be bit-for-layout identical."""
    from amf_tpu.models import ratingconc as rc

    real, prob, vals = small_problem
    n, m = prob.shape
    cfg = rc.RCConfig(
        rating_values=tuple(float(v) for v in sorted(vals)), max_iters=40)
    x, data, _ = rc.fit(prob, cfg, dtype=jnp.float64)

    unsharded = rc.entropy_lookahead_scores(
        x, data, prob, cfg, lookahead_iters=10, dtype=jnp.float64)

    def score_flat(cand, _k):
        return rc.entropy_lookahead_scores(
            x, data, prob, cfg, lookahead_iters=10, dtype=jnp.float64,
            cand=cand)

    sharded = sharded_candidate_scores(score_flat, n * m, mesh)(
        jax.random.PRNGKey(0))
    a, b = np.asarray(unsharded), np.asarray(sharded)
    assert np.isnan(a).sum() == np.isnan(b).sum()
    mask = ~np.isnan(a)
    np.testing.assert_allclose(a[mask], b[mask], rtol=1e-8, atol=1e-10)


def test_nuts_chains_sharded_match_vmapped(small_problem, mesh, key):
    """Chain-parallel NUTS over the mesh (the reference's process-parallel
    Stan chains, stan-bpmf/bpmf.py:314) draws identically to the vmapped
    chain fan-out: streams come from explicit per-chain keys."""
    real, prob, vals = small_problem
    cfg = bpmf_hmc.HMCConfig(latent_d=2, subtract_mean=False)
    st = bpmf_hmc.init_state(prob, cfg, dtype=jnp.float64)
    _, vmapped = bpmf_hmc.samples(key, st, prob, cfg, 6, 4, chains=8)
    _, sharded = bpmf_hmc.samples(
        key, st, prob, cfg, 6, 4, chains=8, chain_mesh=mesh)
    for name in ("U", "V", "lp__"):
        np.testing.assert_allclose(
            np.asarray(vmapped[name]), np.asarray(sharded[name]),
            rtol=1e-10, atol=1e-12)
