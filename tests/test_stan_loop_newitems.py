import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amf_tpu import types
from amf_tpu.active import stan_loop
from amf_tpu.data import make_fake_data, make_new_items_split
from amf_tpu.models import bpmf_hmc, newitems, sample_stats


@pytest.fixture(scope="module")
def stan_problem():
    rng = np.random.default_rng(9)
    real, known, vals = make_fake_data(
        num_users=7, num_items=6, rank=2, data_type=5, mask_type=0.5, rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    return real, prob, vals


def test_stan_loop_direct_keys(stan_problem):
    real, prob, vals = stan_problem
    res = stan_loop.run_active_stan(
        prob, real, ["random", "pred-variance", "prob-ge-3.5"],
        latent_d=2, rating_values=vals, num_samps=24, warmup=16,
        steps=3, seed=0,
    )
    for k in ["random", "pred-variance", "prob-ge-3.5"]:
        recs = res[k]
        assert len(recs) == 3
        assert all(np.isfinite(r[1]) for r in recs)


def test_stan_loop_warm_adapt(stan_problem, key):
    """warm_adapt carries NUTS adaptation between active steps: the state
    picks up a populated metric after the first refit, lookahead lanes
    inherit it, and the sweep's error trace stays sane."""
    real, prob, vals = stan_problem
    res = stan_loop.run_active_stan(
        prob, real, ["pred-variance", "exp-variance"],
        latent_d=2, rating_values=vals, num_samps=24, warmup=16,
        lookahead_samps=5, lookahead_warmup=3,
        steps=3, seed=0, warm_adapt=True, warm_warmup=6,
    )
    for k in ["pred-variance", "exp-variance"]:
        assert len(res[k]) == 3
        assert all(np.isfinite(r[1]) for r in res[k])

    # state-level: carry_adapt populates the metric, and a warm re-run
    # accepts it (shape-static dispatch)
    cfg = bpmf_hmc.HMCConfig(latent_d=2)
    st = bpmf_hmc.init_state(prob, cfg, dtype=jnp.float64)
    assert st.adapt_inv_mass.size == 0
    st, _ = bpmf_hmc.samples(key, st, prob, cfg, 10, 8, carry_adapt=True)
    assert st.adapt_inv_mass.shape == (st.mode_q.shape[0],)
    assert float(st.adapt_eps) > 0
    st2, samps = bpmf_hmc.samples(key, st, prob, cfg, 10, 8,
                                  carry_adapt=True, warm_warmup=4)
    assert np.isfinite(np.asarray(samps["lp__"])).all()


def test_stan_loop_exp_entropy(stan_problem):
    real, prob, vals = stan_problem
    res = stan_loop.run_active_stan(
        prob, real, ["exp-entropy-est"],
        latent_d=2, rating_values=vals, num_samps=12, warmup=8,
        lookahead_samps=5, lookahead_warmup=3, steps=2, seed=0,
    )
    assert len(res["exp-entropy-est"]) == 2


def test_newitems_two_phase(key):
    rng = np.random.default_rng(11)
    real, _, vals = make_fake_data(
        num_users=8, num_items=10, rank=2, data_type=5, mask_type=0.6, rng=rng
    )
    split = make_new_items_split(real, n_new=3, know_all_old=True, rng=rng)
    is_new = split["_is_new_item"]
    prob = types.problem_from_dense(real, split["_known"], dtype=jnp.float64)

    cfg = bpmf_hmc.HMCConfig(latent_d=2, max_depth=6)
    U_mean, V_fixed_mean, mr = newitems.initial_full_fit(
        key, prob, is_new, cfg, num_samps=30, warmup=20
    )
    assert U_mean.shape == (8, 2)
    assert V_fixed_mean.shape == (7, 2)

    new_cols = np.nonzero(is_new)[0]
    prob_new = types.Problem(
        R_obs=prob.R_obs[:, new_cols],
        rated=prob.rated[:, new_cols],
        queryable=prob.queryable[:, new_cols],
        test=prob.test[:, new_cols],
    )
    st = newitems.init_state(prob_new, U_mean, V_fixed_mean, cfg, mr)
    st, samps = newitems.samples(key, st, prob_new, cfg, num_samps=40, warmup=30)
    assert samps["V"].shape == (40, 3, 2)
    stats = sample_stats.prediction_stats(samps["U"], samps["V"], mr, True)
    rated = np.asarray(prob_new.rated)
    err = np.sqrt(np.mean((np.asarray(stats.mean) - real[:, new_cols])[rated] ** 2))
    # cold-start fit should beat predicting the global mean
    base = np.sqrt(np.mean((float(mr) - real[:, new_cols])[rated] ** 2))
    assert err < base


def test_newitems_general_w0_identity_equivalence():
    """bpmf_newitems.stan's general construction with w_0 = I is the same
    density as newitems_w0identity (the configuration the reference runs)."""
    rng = np.random.default_rng(11)
    s = newitems.NewItemsShapes(n=6, m_new=3, d=2)
    q = jnp.asarray(rng.normal(size=s.dim) * 0.4)
    U_fixed = jnp.asarray(rng.normal(size=(6, 2)))
    V_fixed = jnp.asarray(rng.normal(size=(4, 2)))
    real = rng.integers(1, 6, size=(6, 3)).astype(float)
    known = rng.random((6, 3)) < 0.5
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    lps = [
        float(newitems.log_posterior(
            q, prob, U_fixed, V_fixed, 0.0,
            bpmf_hmc.HMCConfig(latent_d=2, model=model), s))
        for model in ("w0identity", "bpmf")
    ]
    assert lps[0] == pytest.approx(lps[1], rel=1e-10)
