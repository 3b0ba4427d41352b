import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amf_tpu import types
from amf_tpu.active import mmmf_loop
from amf_tpu.models import mmmf


def _toy_labels(rng, n=12, m=10, rank=2, frac=0.6):
    u = rng.normal(size=(n, rank))
    v = rng.normal(size=(m, rank))
    y = np.sign(u @ v.T)
    y[y == 0] = 1
    obs = rng.random((n, m)) < frac
    y_obs = np.where(obs, y, 0.0)
    return y, y_obs


def test_admm_reaches_convex_optimum_certificate(rng):
    """Optimality certificate: at the optimum of
    min ||X||_* + C sum hinge(1 - y x), the ADMM dual rho*W must be a
    nuclear-norm subgradient at X (spectral norm <= 1, <rho W, X> = ||X||_*)
    and -rho*W an element of C * d(hinge) on observed cells / zero elsewhere.
    This certifies we match the reference's interior-point SDP optimum
    (solveD.m) without running an SDP solver."""
    y, y_obs = _toy_labels(rng)
    cfg = mmmf.MMMFConfig(C=1.0, max_iters=6000, tol=1e-9)
    st, iters = mmmf.solve(jnp.asarray(y_obs), cfg)
    X = np.asarray(st.X)
    G = np.asarray(st.W) * cfg.rho
    # KKT for the splitting: -G in d||X||_*  and  G in C * d(hinge)(X)

    sv = np.linalg.svd(G, compute_uv=False)
    assert sv.max() <= 1.0 + 1e-4
    nuc = np.linalg.svd(X, compute_uv=False).sum()
    assert np.vdot(-G, X) == pytest.approx(nuc, rel=1e-3, abs=1e-4)

    # -G in C * d(hinge): zero off-support; in [-C*y, 0]*y-direction on support
    obs = y_obs != 0
    off = np.abs(G[~obs])
    assert off.max() < 1e-4
    margin = y_obs * X
    # G in C*d(hinge), d(hinge) = -y*t with t in [0,1]: s := -(G y) = C t,
    # t = 0 when margin > 1, t = 1 when margin < 1
    s = -(G * y_obs)
    assert (s[obs] >= -1e-4).all() and (s[obs] <= cfg.C + 1e-4).all()
    active = obs & (margin < 1 - 1e-3)
    assert np.allclose(s[active], cfg.C, atol=1e-3)
    inactive = obs & (margin > 1 + 1e-3)
    assert np.abs(s[inactive]).max() < 1e-3


def test_admm_matches_independent_proximal_descent(rng):
    """Second, independent algorithm (proximal subgradient on the primal)
    must reach the same objective value."""
    y, y_obs = _toy_labels(rng, n=8, m=6)
    C = 0.7
    cfg = mmmf.MMMFConfig(C=C, max_iters=6000, tol=1e-9)
    st, _ = mmmf.solve(jnp.asarray(y_obs), cfg)
    f_admm = float(mmmf.objective(st.X, jnp.asarray(y_obs), C))

    # independent: proximal subgradient with diminishing steps (numpy)
    X = np.zeros_like(y_obs)
    obs = y_obs != 0
    for t in range(8000):
        margin = y_obs * X
        g = np.where(obs & (margin < 1), -C * y_obs, 0.0)
        eta = 0.5 / np.sqrt(t + 1)
        A = X - eta * g
        u, s, vt = np.linalg.svd(A, full_matrices=False)
        X = (u * np.maximum(s - eta, 0)) @ vt
    f_prox = float(mmmf.objective(jnp.asarray(X), jnp.asarray(y_obs), C))
    assert f_admm <= f_prox + 1e-2
    assert f_admm == pytest.approx(f_prox, rel=0.02)


def test_svt_eigh_matches_svd(rng):
    """The eigh-of-Gram SVT (robust to the gesdd non-convergence that
    poisoned the newmovies-20d mmmf run) must equal the textbook SVD form."""
    for shape in ((17, 11), (11, 17), (13, 13)):
        a = jnp.asarray(rng.normal(size=shape) * 3)
        for tau in (0.3, 1.0, 4.0):
            u, s, vt = jnp.linalg.svd(a, full_matrices=False)
            ref = (u * jnp.maximum(s - tau, 0.0)[None, :]) @ vt
            got = mmmf._svt(a, tau)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-10)


def test_solve_recovers_from_poisoned_warm_start(rng):
    """A NaN anywhere in the warm-start state makes the residual NaN and
    exits the loop after one iteration; the guard must re-solve cold instead
    of returning the poison (the newmovies-20d failure mode)."""
    y, y_obs = _toy_labels(rng)
    cfg = mmmf.MMMFConfig(C=1.0, max_iters=4000, tol=1e-8)
    clean, _ = mmmf.solve(jnp.asarray(y_obs), cfg)
    bad = clean.replace(X=clean.X.at[0, 0].set(jnp.nan))
    healed, iters = mmmf.solve(jnp.asarray(y_obs), cfg, bad)
    assert np.isfinite(np.asarray(healed.X)).all()
    f_clean = float(mmmf.objective(clean.X, jnp.asarray(y_obs), cfg.C))
    f_heal = float(mmmf.objective(healed.X, jnp.asarray(y_obs), cfg.C))
    assert f_heal == pytest.approx(f_clean, rel=1e-4)


def test_adaptive_rho_same_optimum_consistent_dual(rng):
    """Residual balancing must land on the same optimum as fixed rho, and
    the exit-rescaled dual (rho0 * W) must still satisfy the nuclear-norm
    subgradient bound used by the KKT certificate."""
    y, y_obs = _toy_labels(rng, n=10, m=8)
    fixed = mmmf.MMMFConfig(C=1.0, adapt_rho=False, max_iters=8000, tol=1e-9)
    adapt = mmmf.MMMFConfig(C=1.0, adapt_rho=True, max_iters=8000, tol=1e-9)
    st_f, it_f = mmmf.solve(jnp.asarray(y_obs), fixed)
    st_a, it_a = mmmf.solve(jnp.asarray(y_obs), adapt)
    f_f = float(mmmf.objective(st_f.X, jnp.asarray(y_obs), 1.0))
    f_a = float(mmmf.objective(st_a.X, jnp.asarray(y_obs), 1.0))
    assert f_a == pytest.approx(f_f, rel=1e-4)
    G = np.asarray(st_a.W) * adapt.rho  # nominal-rho dual
    assert np.linalg.svd(G, compute_uv=False).max() <= 1.0 + 1e-3


def test_separable_data_perfect_classification(rng):
    y, y_obs = _toy_labels(rng, n=10, m=10, rank=1, frac=0.7)
    cfg = mmmf.MMMFConfig(C=10.0, max_iters=4000, tol=1e-8)
    st, _ = mmmf.solve(jnp.asarray(y_obs), cfg)
    X = np.asarray(st.X)
    obs = y_obs != 0
    # observed labels classified correctly with near-unit margins
    assert (np.sign(X[obs]) == y_obs[obs]).mean() > 0.99
    assert (y_obs * X)[obs].min() > 0.5
    # rank-1 structure generalizes to held-out cells
    assert (np.sign(X) == y).mean() > 0.8


def test_factors_reconstruct(rng):
    y, y_obs = _toy_labels(rng)
    st, _ = mmmf.solve(jnp.asarray(y_obs), mmmf.MMMFConfig(max_iters=2000))
    xu, xv = mmmf.factors(st.X)
    np.testing.assert_allclose(
        np.asarray(xu @ xv.T), np.asarray(st.X), atol=1e-6
    )


def test_selectors(rng, key):
    X = jnp.asarray(rng.normal(size=(5, 5)))
    can = jnp.asarray(rng.random((5, 5)) < 0.5)
    for name in mmmf.MMMF_KEYS:
        ev, choose_max = mmmf.selector_evals(name, X, can, key)
        assert ev.shape == (5, 5)
        off_pool = np.asarray(~can)
        assert np.isnan(np.asarray(ev)[off_pool]).all()


def test_mmmf_active_loop(rng):
    y, y_obs = _toy_labels(rng, n=8, m=8, rank=1, frac=1.0)
    known = np.zeros_like(y, dtype=bool)
    np.fill_diagonal(known, True)
    prob = types.problem_from_dense(y, known, dtype=jnp.float64)
    res = mmmf_loop.run_active_mmmf(
        prob, y, ["min-margin", "random"], C=1.0, steps=3, seed=0,
        cfg=mmmf.MMMFConfig(C=1.0, max_iters=800, tol=1e-7),
    )
    for k in ["min-margin", "random"]:
        recs = res[k]
        assert len(recs) == 3
        assert all(0 <= r[1] <= 1 for r in recs)


def test_binarize():
    real = np.array([[1.0, 3.0, 5.0], [2.0, 0.0, 4.0]])
    y = mmmf_loop.binarize(real, cutoff=3.0)
    np.testing.assert_array_equal(y, [[-1, 1, 1], [-1, 0, 1]])
    already = np.array([[1.0, -1.0], [0.0, 1.0]])
    np.testing.assert_array_equal(mmmf_loop.binarize(already, None), already)


# ---------------------------------------------------------------------------
# ordinal variant (reference: solveDord.m)


def _ordinal_data(rng, n=10, m=8, rank=2, R=4, frac=0.7):
    u = rng.normal(size=(n, rank))
    v = rng.normal(size=(m, rank))
    score = u @ v.T
    edges = np.quantile(score, np.linspace(0, 1, R + 1)[1:-1])
    y = 1 + np.searchsorted(edges, score.ravel()).reshape(n, m)
    obs = rng.random((n, m)) < frac
    return np.where(obs, y, 0), y


def test_ordinal_immediate_threshold(rng):
    import jax.numpy as jnp

    y_obs, y_full = _ordinal_data(rng)
    cfg = mmmf.OrdinalConfig(C=2.0, max_iters=3000)
    xy, X, theta = mmmf.solve_ordinal(jnp.asarray(y_obs, jnp.float64), R=4,
                                      cfg=cfg)
    th = np.asarray(theta)
    assert (np.diff(th) >= -1e-9).all()  # ordered thresholds
    obs = y_obs > 0
    train_acc = (np.asarray(xy)[obs] == y_obs[obs]).mean()
    assert train_acc > 0.8
    # generalization beats the majority class
    maj = max((y_full == r).mean() for r in range(1, 5))
    assert (np.asarray(xy) == y_full).mean() > maj


def test_ordinal_all_thresholds_and_per_row(rng):
    import jax.numpy as jnp

    y_obs, y_full = _ordinal_data(rng, n=8, m=6, R=3)
    cfg = mmmf.OrdinalConfig(C=2.0, all_thresholds=True, per_row_thresh=True,
                             max_iters=2500)
    xy, X, theta = mmmf.solve_ordinal(jnp.asarray(y_obs, jnp.float64), R=3,
                                      cfg=cfg)
    assert theta.shape == (8, 2)
    assert (np.diff(np.asarray(theta), axis=-1) >= -1e-9).all()
    obs = y_obs > 0
    assert (np.asarray(xy)[obs] == y_obs[obs]).mean() > 0.75


def test_ordinal_objective_decreases(rng):
    import jax.numpy as jnp

    y_obs, _ = _ordinal_data(rng, n=6, m=6, R=3)
    Y = jnp.asarray(y_obs, jnp.float64)
    cfg = mmmf.OrdinalConfig(C=1.0, max_iters=1500)
    xy, X, theta = mmmf.solve_ordinal(Y, R=3, cfg=cfg)
    f_end = float(mmmf.ordinal_objective(X, theta, Y, 3, cfg))
    th0 = jnp.arange(1, 3, dtype=jnp.float64) + 0.5
    f_start = float(mmmf.ordinal_objective(jnp.zeros_like(Y), th0, Y, 3, cfg))
    assert f_end < f_start


def test_maxnorm_solver_separates_and_bounds_norms():
    """solveD 'm' mode equivalent: on a separable low-rank sign matrix the
    max-norm solver achieves unit margins on observed cells while keeping
    max row norms small; its objective must also (near-)match the exhaustive
    best of many random restarts, evidencing convergence."""
    import jax
    import jax.numpy as jnp

    from amf_tpu.models import mmmf

    rng = np.random.default_rng(3)
    n, m, r = 8, 6, 2
    u = rng.normal(size=(n, r))
    v = rng.normal(size=(m, r))
    Y = np.sign(u @ v.T)
    mask = rng.random((n, m)) < 0.7
    Y_obs = np.where(mask, Y, 0.0)

    cfg = mmmf.MaxNormConfig(C=10.0, max_iters=3000, lr0=0.2)
    st, obj = mmmf.solve_maxnorm(jnp.asarray(Y_obs), cfg)
    X = np.asarray(st.X)
    # (a) margins: nearly all observed cells classified with margin ~1
    margins = (Y_obs * X)[mask]
    assert (margins > 0.5).mean() > 0.95, margins.min()
    # (b) objective is finite and the hinge part is nearly zero
    hinge = np.maximum(0.0, 1.0 - margins).sum()
    assert hinge < 1.0, hinge
    # (c) restarting from the solution does not improve the objective much
    st2, obj2 = mmmf.solve_maxnorm(jnp.asarray(Y_obs), cfg, state=st)
    assert float(obj2) <= float(obj) * 1.05


def test_maxnorm_active_loop_mode():
    import jax.numpy as jnp

    from amf_tpu import types
    from amf_tpu.active import mmmf_loop

    rng = np.random.default_rng(5)
    u = rng.normal(size=(6, 2))
    v = rng.normal(size=(5, 2))
    Y = np.sign(u @ v.T)
    known = rng.random((6, 5)) < 0.4
    prob = types.problem_from_dense(Y, known, dtype=jnp.float64)
    res = mmmf_loop.run_active_mmmf(
        prob, Y, ["min-margin", "random"], C=5.0, steps=3, mode="max",
    )
    for k in ("min-margin", "random"):
        assert len(res[k]) == 3
        assert all(np.isfinite(r[1]) for r in res[k])


def test_sdpa_roundtrip(tmp_path):
    """write_sdpa emits the reference's sparse-SDPA encoding (printSDPA.m),
    and read_sdpa_solution recovers x/xu/xv from a CSDP-style solution file
    built from our own ADMM optimum."""
    import jax.numpy as jnp

    from amf_tpu.models import mmmf, sdpa_io

    rng = np.random.default_rng(7)
    u = rng.normal(size=(5, 2))
    v = rng.normal(size=(4, 2))
    Y = np.sign(u @ v.T)
    Y[rng.random((5, 4)) > 0.7] = 0.0
    n, m = Y.shape
    p = int((Y != 0).sum())

    # --- export: structural checks against the format contract
    fn = sdpa_io.write_sdpa(str(tmp_path / "prob"), Y, "a", C=1.5)
    lines = open(fn).read().splitlines()
    body = [l for l in lines if not l.startswith("*")]
    assert body[0] == str(p)            # constraint count
    assert body[1] == "3"               # blocks (slack allowed)
    assert body[2].split() == [str(n + m), str(-p), str(-p)]
    # max-norm variant adds the diagonal-tying constraints
    fn_m = sdpa_io.write_sdpa(str(tmp_path / "prob"), Y, "m", C=1.5)
    body_m = [l for l in open(fn_m).read().splitlines()
              if not l.startswith("*")]
    assert body_m[0] == str(p + n + m - 1)

    # --- import: synthesize a CSDP-style solution from the ADMM optimum
    st, _ = mmmf.solve(jnp.asarray(Y), mmmf.MMMFConfig(C=1.5, max_iters=500))
    X = np.asarray(st.X)
    xu, xv = (np.asarray(a) for a in mmmf.factors(st.X))
    A, B = xu @ xu.T, xv @ xv.T
    G = np.block([[A, X], [X.T, B]])
    sol = tmp_path / "prob.sol"
    with open(sol, "w") as f:
        f.write(" ".join(["0.0"] * p) + "\n")
        for i in range(n + m):
            for j in range(i, n + m):
                if G[i, j] != 0:
                    f.write(f"2 1 {i + 1} {j + 1} {G[i, j]:.12f}\n")
    x2, xu2, xv2, q = sdpa_io.read_sdpa_solution(str(sol), n)
    np.testing.assert_allclose(x2, X, atol=1e-9)
    np.testing.assert_allclose(xu2 @ xv2.T, X, atol=1e-6)
    assert q.shape == (p,)
