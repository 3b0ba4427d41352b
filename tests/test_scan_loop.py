import jax
import jax.numpy as jnp
import numpy as np

from amf_tpu import types
from amf_tpu.active import criteria, lookahead, scan_loop
from amf_tpu.data import make_fake_data
from amf_tpu.models import pmf


def test_scan_sweep_direct(rng, key):
    real, known, vals = make_fake_data(
        num_users=7, num_items=7, rank=2, data_type=5, mask_type="diag", rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    pcfg = pmf.PMFConfig(latent_d=2)
    crit = criteria.KEY_FUNCS["pred-variance"]
    res, pst = jax.jit(
        lambda p, k: scan_loop.run_active_scan(p, real, crit, 8, k, pcfg)
    )(prob, key)
    assert res.rmse.shape == (8,)
    assert bool(res.valid.all())
    assert np.isfinite(np.asarray(res.rmse)).all()
    # picks are unique queryable cells
    picks = list(zip(np.asarray(res.picks_i), np.asarray(res.picks_j)))
    assert len(set(picks)) == 8
    q = np.asarray(prob.queryable)
    assert all(q[i, j] for i, j in picks)
    # rmse improves over the sweep
    errs = np.asarray(res.rmse)
    assert errs[-1] < errs[0]


def test_scan_sweep_exhausts_pool(rng, key):
    real, known, vals = make_fake_data(
        num_users=4, num_items=4, rank=1, data_type=5, mask_type="diag", rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    n_q = int(np.asarray(prob.queryable).sum())
    pcfg = pmf.PMFConfig(latent_d=1)
    crit = criteria.KEY_FUNCS["random"]
    res, _ = scan_loop.run_active_scan(
        prob, real, crit, n_q + 3, key, pcfg
    )
    valid = np.asarray(res.valid)
    assert valid[:n_q].all() and not valid[n_q:].any()


def test_scan_sweep_lookahead(rng, key):
    real, known, vals = make_fake_data(
        num_users=5, num_items=5, rank=1, data_type=5, mask_type="diag", rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    pcfg = pmf.PMFConfig(latent_d=1)
    lcfg = lookahead.LookaheadConfig(
        rating_values=tuple(vals), pmf_refit_steps=40, approx_refit_steps=40
    )
    crit = criteria.KEY_FUNCS["total-variance"]
    res, _ = scan_loop.run_active_scan(
        prob, real, crit, 3, key, pcfg, lcfg=lcfg,
        refit_budget=100, approx_budget=100,
    )
    assert np.isfinite(np.asarray(res.rmse)).all()


def test_scan_sweep_mn_model(rng, key):
    real, known, vals = make_fake_data(
        num_users=5, num_items=5, rank=1, data_type=5, mask_type="diag", rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    pcfg = pmf.PMFConfig(latent_d=1)
    crit = criteria.MN_KEY_FUNCS["pred-variance"]
    res, _ = scan_loop.run_active_scan(
        prob, real, crit, 3, key, pcfg, model="mn",
        refit_budget=100, approx_budget=100,
    )
    assert np.isfinite(np.asarray(res.rmse)).all()


def test_gibbs_scan_sweep(rng, key):
    from amf_tpu.models import bpmf_gibbs

    real, known, vals = make_fake_data(
        num_users=6, num_items=6, rank=2, data_type=5, mask_type=0.4, rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    pcfg = pmf.PMFConfig(latent_d=2, subtract_mean=True)
    gcfg = bpmf_gibbs.GibbsConfig(latent_d=2)
    for kname in ("pred-variance", "exp-variance"):
        res, _ = scan_loop.run_gibbs_scan(
            prob, real, kname, 2, key, pcfg, gcfg,
            num_samps=12, rating_values=tuple(vals), lookahead_samps=4,
        )
        assert np.isfinite(np.asarray(res.rmse)).all(), kname
        assert np.asarray(res.valid).all(), kname


def test_stan_scan_sweep(rng, key):
    from amf_tpu.models import bpmf_hmc

    real, known, vals = make_fake_data(
        num_users=5, num_items=5, rank=2, data_type=5, mask_type=0.4, rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    cfg = bpmf_hmc.HMCConfig(latent_d=2, subtract_mean=True)
    res, _ = scan_loop.run_stan_scan(
        prob, real, "pred-variance", 2, key, cfg, num_samps=10, warmup=5,
        rating_values=tuple(vals),
    )
    assert np.isfinite(np.asarray(res.rmse)).all()
    assert np.asarray(res.valid).all()


def test_scan_record_evals(rng, key):
    """record_evals returns the per-step criterion maps (the non-scan loops'
    evals records, reference plot_results.py:222 input): step-0 map equals a
    direct recompute, and each step's argmax over the then-queryable pool is
    the recorded pick."""
    real, known, vals = make_fake_data(
        num_users=7, num_items=7, rank=2, data_type=5, mask_type="diag",
        rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    pcfg = pmf.PMFConfig(latent_d=2)
    crit = criteria.KEY_FUNCS["pred-variance"]
    res, _ = scan_loop.run_active_scan(
        prob, real, crit, 4, key, pcfg, record_evals=True)
    assert res.evals.shape == (4, 7, 7)
    q = np.asarray(prob.queryable).copy()
    for s in range(4):
        ev = np.asarray(res.evals[s])
        # NaN exactly off the then-queryable pool (loop-record parity)
        assert np.isfinite(ev[q]).all()
        assert np.isnan(ev[~q]).all()
        masked = np.where(q & np.isfinite(ev), ev, -np.inf)
        i, j = np.unravel_index(np.argmax(masked), masked.shape)
        assert (i, j) == (int(res.picks_i[s]), int(res.picks_j[s]))
        q[i, j] = False
    # without the flag the field is None
    res2, _ = scan_loop.run_active_scan(prob, real, crit, 2, key, pcfg)
    assert res2.evals is None
