import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amf_tpu import types
from amf_tpu.active import rc_loop
from amf_tpu.data import make_fake_data
from amf_tpu.models import ratingconc as rc
from amf_tpu.ops.lbfgsb import lbfgsb


# ---------------------------------------------------------------------------
# projected L-BFGS


def test_lbfgsb_unconstrained_quadratic():
    rng = np.random.default_rng(0)
    d = 20
    a = rng.normal(size=(d, d))
    Q = jnp.asarray(a @ a.T + d * np.eye(d))
    b = jnp.asarray(rng.normal(size=d))

    def f(x):
        return 0.5 * x @ Q @ x - b @ x

    res = lbfgsb(jax.value_and_grad(f), jnp.zeros(d), -1e10, 1e10, pgtol=1e-9)
    want = np.linalg.solve(np.asarray(Q), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-5)


def test_lbfgsb_active_box_constraints():
    """Minimize ||x - t||^2 over [0, 1]^d: solution is clip(t, 0, 1)."""
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.normal(size=30) * 2)

    def f(x):
        return jnp.sum((x - t) ** 2)

    res = lbfgsb(jax.value_and_grad(f), jnp.full(30, 0.5), 0.0, 1.0, pgtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(res.x), np.clip(np.asarray(t), 0, 1), atol=1e-6
    )


def test_lbfgsb_rosenbrock_box():
    def f(x):
        return jnp.sum(100 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    res = lbfgsb(
        jax.value_and_grad(f), jnp.zeros(6), -2.0, 2.0,
        max_iters=2000, pgtol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(res.x), np.ones(6), atol=1e-3)


def test_lbfgsb_matches_scipy():
    """Cross-check against scipy's real L-BFGS-B on a box-active problem."""
    from scipy import optimize

    rng = np.random.default_rng(2)
    d = 15
    a = rng.normal(size=(d, d))
    Q = a @ a.T + d * np.eye(d)
    b = rng.normal(size=d) * 3

    def f_np(x):
        return 0.5 * x @ Q @ x - b @ x, Q @ x - b

    sp = optimize.minimize(
        f_np, np.zeros(d), jac=True, method="L-BFGS-B",
        bounds=[(0, 1)] * d, options={"ftol": 1e-15, "gtol": 1e-12},
    )
    Qj, bj = jnp.asarray(Q), jnp.asarray(b)
    res = lbfgsb(
        jax.value_and_grad(lambda x: 0.5 * x @ Qj @ x - bj @ x),
        jnp.zeros(d), 0.0, 1.0, max_iters=1000, pgtol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(res.x), sp.x, atol=1e-5)


# ---------------------------------------------------------------------------
# maxent model


def test_feature_map_matches_sets_square5():
    """Oracle reimplementation of sets_square5.m:1-14 for values 1..5."""
    from itertools import combinations

    F = rc.feature_map((1, 2, 3, 4, 5))
    assert F.shape == (5, 17)
    lists = list(combinations(range(1, 6), 2))
    for r in range(1, 6):
        want = np.zeros(17)
        want[r - 1] = 1
        for p, (a, b) in enumerate(lists):
            if r in (a, b):
                want[5 + p] = 1
        want[15] = (r - 1) / 4
        want[16] = (r - 1) ** 2 / 16
        np.testing.assert_allclose(F[r - 1], want)


def test_dual_gradient_matches_reference_formula():
    """Autodiff of the dual must equal dual3.m's explicit gradient
    (dual3.m:60-83) implemented as a numpy oracle."""
    rng = np.random.default_rng(3)
    real = rng.integers(1, 6, size=(6, 5)).astype(float)
    known = rng.random((6, 5)) < 0.4
    known[0] = True  # ensure rows/cols covered
    known[:, 0] = True
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    cfg = rc.RCConfig()
    data = rc.prepare(prob, cfg)
    n, k = data.mu.shape
    m = data.nu.shape[0]
    x = jnp.asarray(rng.random(2 * (n + m) * k) * 0.5)

    g = jax.grad(lambda z: rc.dual_objective(z, data))(x)

    # oracle gradient: dgamma+ = -mu + alpha + rowsum(p F)/c etc.
    P = np.asarray(rc.cell_probs(x, data, data.qmask))  # normalized (n,m,V)
    F = np.asarray(data.F)
    E = P @ F  # (n, m, k) per-cell expected features
    qm = np.asarray(data.qmask)
    E = np.where(qm[..., None], E, 0.0)
    rowsum = E.sum(1)  # (n, k)
    colsum = E.sum(0)  # (m, k)
    c = np.maximum(np.asarray(data.c), np.finfo(float).eps)[:, None]
    d = np.maximum(np.asarray(data.d), np.finfo(float).eps)[:, None]
    mu, nu = np.asarray(data.mu), np.asarray(data.nu)
    al, be = np.asarray(data.alpha), np.asarray(data.beta)
    want = np.concatenate([
        (-mu + al + rowsum / c).ravel(),
        (mu + al - rowsum / c).ravel(),
        (-nu + be + colsum / d).ravel(),
        (nu + be - colsum / d).ravel(),
    ])
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-8, atol=1e-10)


def test_fit_zero_multipliers_give_prior():
    """With all-zero multipliers the per-cell multinomials equal the prior."""
    rng = np.random.default_rng(4)
    real = rng.integers(1, 6, size=(5, 4)).astype(float)
    known = rng.random((5, 4)) < 0.5
    known[:, 0] = True
    known[0, :] = True
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    cfg = rc.RCConfig()
    data = rc.prepare(prob, cfg)
    n, k = data.mu.shape
    m = data.nu.shape[0]
    P = rc.cell_probs(jnp.zeros(2 * (n + m) * k), data, data.qmask)
    qm = np.asarray(data.qmask)
    got = np.asarray(P)[qm]
    np.testing.assert_allclose(got, np.broadcast_to(np.asarray(data.prior), got.shape),
                               atol=1e-10)


def test_fit_improves_dual_and_predicts(rng):
    real, known, vals = make_fake_data(
        num_users=8, num_items=7, rank=2, data_type=5, mask_type=0.5,
        rng=rng,
    )
    # maxent needs values >= 1 (0 is 'unknown'): shift
    real = np.clip(real, 1, 5)
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    cfg = rc.RCConfig(max_iters=300)
    x, data, iters = rc.fit(prob, cfg)
    assert int(iters) > 0
    f_fit = float(rc.dual_objective(x, data))
    f_zero = float(rc.dual_objective(jnp.zeros_like(x), data))
    assert f_fit <= f_zero
    E, P = rc.predictions(x, data, prob, cfg)
    qm = np.asarray(data.qmask)
    sums = np.asarray(P.sum(-1))[qm]
    np.testing.assert_allclose(sums, 1.0, atol=1e-8)
    e_vals = np.asarray(E)[qm]
    assert (e_vals >= 1 - 1e-6).all() and (e_vals <= 5 + 1e-6).all()


def test_rc_active_loop(rng):
    real, known, _ = make_fake_data(
        num_users=6, num_items=5, rank=2, data_type=5, mask_type="diag",
        rng=rng,
    )
    real = np.clip(real, 1, 5)
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    res = rc_loop.run_active_rc(
        prob, real, ["random", "ge-4"], steps=3, seed=0, max_iters=150,
    )
    for k in ["random", "ge-4"]:
        recs = res[k]
        assert len(recs) == 3
        assert all(np.isfinite(r[1]) for r in recs)


def test_rc_entropy_lookahead(rng):
    real, known, _ = make_fake_data(
        num_users=5, num_items=4, rank=1, data_type=5, mask_type="diag",
        rng=rng,
    )
    real = np.clip(real, 1, 5)
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    res = rc_loop.run_active_rc(
        prob, real, ["entropy"], steps=2, seed=0,
        max_iters=100, lookahead_iters=25,
    )
    assert len(res["entropy"]) == 2
    ev = res["entropy"][1][3]
    pool_vals = ev[~np.isnan(ev)]
    assert pool_vals.size > 0 and np.isfinite(pool_vals).all()
