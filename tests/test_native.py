"""Native C++ kernel tests: cross-check the host library against numpy and
against the XLA (dense einsum) maxent path — the framework's twin-
implementation consistency strategy (mirrors the reference's pure-python vs
Cython agreement tests, test_normal_exps.py:31)."""

import numpy as np
import pytest

from amf_tpu import _native


pytestmark = pytest.mark.skipif(
    not _native.available(), reason="no C++ toolchain available"
)


@pytest.fixture
def coo(rng):
    n, m, nnz = 12, 9, 40
    ii = rng.integers(0, n, nnz).astype(np.int64)
    jj = rng.integers(0, m, nnz).astype(np.int64)
    return n, m, ii, jj


def test_spouterprod(coo, rng):
    n, m, ii, jj = coo
    u = rng.normal(size=n)
    v = rng.normal(size=m)
    got = _native.spouterprod(ii, jj, u, v)
    np.testing.assert_allclose(got, u[ii] * v[jj])
    # clamp behavior (reference: spouterprod.c:114-115)
    got_c = _native.spouterprod(ii, jj, np.abs(u) * 1e200, np.abs(v) * 1e200,
                                clamp=1e128)
    assert (got_c <= 1e128).all()


def test_sprowsumprod_matches_numpy(coo, rng):
    n, m, ii, jj = coo
    S, K = 5, 17
    p = rng.random((ii.size, S))
    F = rng.normal(size=(S, K))
    rs, cs = _native.sprowsumprod(ii, jj, p, F, n, m)
    E = p @ F
    want_rs = np.zeros((n, K))
    want_cs = np.zeros((m, K))
    np.add.at(want_rs, ii, E)
    np.add.at(want_cs, jj, E)
    np.testing.assert_allclose(rs, want_rs, rtol=1e-12)
    np.testing.assert_allclose(cs, want_cs, rtol=1e-12)


def test_sprowcolsum(coo, rng):
    n, m, ii, jj = coo
    E = rng.normal(size=(ii.size, 7))
    rs, cs = _native.sprowcolsum(ii, jj, E, n, m)
    want_rs = np.zeros((n, 7))
    want_cs = np.zeros((m, 7))
    np.add.at(want_rs, ii, E)
    np.add.at(want_cs, jj, E)
    np.testing.assert_allclose(rs, want_rs)
    np.testing.assert_allclose(cs, want_cs)


def test_coo_to_dense_roundtrip(rng):
    n, m = 8, 6
    ii = np.array([0, 1, 1, 7])
    jj = np.array([0, 2, 2, 5])
    vv = np.array([1.0, 2.0, 3.0, 4.0])
    ratings = np.stack([ii, jj, vv], 1).astype(float)
    values, mask, dups = _native.coo_to_dense(ratings, n, m)
    assert dups == 1  # (1,2) written twice, last wins
    assert values[1, 2] == 3.0
    assert mask.sum() == 3
    assert values[7, 5] == 4.0


def test_masked_rmse_matches_metrics(rng):
    from amf_tpu.analysis import metrics

    pred = rng.normal(size=(10, 8))
    target = rng.normal(size=(10, 8))
    mask = rng.random((10, 8)) < 0.5
    got = _native.masked_rmse(pred, target, mask)
    want = float(metrics.rmse_on(pred, target, mask))
    assert got == pytest.approx(want, rel=1e-12)


def test_native_matches_xla_maxent_gradient_pieces(rng):
    """The native sprowsumprod must agree with the XLA dense path's
    per-row/per-column expected-feature sums (models/ratingconc.py)."""
    import jax.numpy as jnp

    from amf_tpu import types
    from amf_tpu.models import ratingconc as rc

    real = rng.integers(1, 6, size=(7, 6)).astype(float)
    known = rng.random((7, 6)) < 0.5
    known[0], known[:, 0] = True, True
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    cfg = rc.RCConfig()
    data = rc.prepare(prob, cfg)
    n, k = data.mu.shape
    m = data.nu.shape[0]
    x = jnp.asarray(rng.random(2 * (n + m) * k) * 0.3)

    P_dense = np.asarray(rc.cell_probs(x, data, data.qmask))  # (n, m, V)
    qm = np.asarray(data.qmask)
    ii, jj = np.nonzero(qm)
    p_coo = P_dense[ii, jj]  # (nnz, V)
    rs, cs = _native.sprowsumprod(ii, jj, p_coo, np.asarray(data.F), n, m)

    E_dense = P_dense @ np.asarray(data.F)
    E_dense = np.where(qm[..., None], E_dense, 0.0)
    np.testing.assert_allclose(rs, E_dense.sum(1), rtol=1e-10)
    np.testing.assert_allclose(cs, E_dense.sum(0), rtol=1e-10)
