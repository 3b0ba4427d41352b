"""Kernel tests modeled on the reference's test strategy
(python-pmf/test_normal_exps.py:1-63): random mean + PSD-projected covariance,
closed forms vs Monte Carlo within a small tolerance, batched implementations
vs scalar oracles exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from amf_tpu.ops import moments
from amf_tpu.ops.psd import project_psd

N_SAMPLES = 400_000


@pytest.fixture(scope="module")
def gaussian():
    rng = np.random.default_rng(42)
    dim = 8
    mean = rng.normal(size=dim)
    cov = np.asarray(project_psd(jnp.asarray(rng.normal(size=(dim, dim))), 1e-4))
    samples = rng.multivariate_normal(mean, cov, size=N_SAMPLES)
    return jnp.asarray(mean), jnp.asarray(cov), samples


def test_tripexpect_mc(gaussian):
    mean, cov, s = gaussian
    a, b, c = 0, 3, 5
    got = float(moments.tripexpect(mean, cov, a, b, c))
    mc = np.mean(s[:, a] * s[:, b] * s[:, c])
    assert got == pytest.approx(mc, abs=0.05 * max(1, abs(mc)))


def test_quadexpect_mc(gaussian):
    mean, cov, s = gaussian
    a, b, c, d = 0, 2, 4, 6
    got = float(moments.quadexpect(mean, cov, a, b, c, d))
    mc = np.mean(s[:, a] * s[:, b] * s[:, c] * s[:, d])
    assert got == pytest.approx(mc, abs=0.05 * max(1, abs(mc)))


def test_exp_squared_mc(gaussian):
    mean, cov, s = gaussian
    a, b = 1, 5
    got = float(moments.exp_squared(mean, cov, a, b))
    mc = np.mean(s[:, a] ** 2 * s[:, b] ** 2)
    assert got == pytest.approx(mc, rel=0.05)


def test_exp_squared_equals_quadexpect_repeated(gaussian):
    """The general Isserlis quartic must agree with the specialized E[a^2b^2]
    on repeated indices — the identity our batched kernels rely on."""
    mean, cov, _ = gaussian
    a, b = 1, 5
    assert float(moments.quadexpect(mean, cov, a, b, a, b)) == pytest.approx(
        float(moments.exp_squared(mean, cov, a, b)), rel=1e-12
    )
    assert float(moments.quadexpect(mean, cov, a, a, b, 3)) == pytest.approx(
        float(moments.exp_a2bc(mean, cov, a, b, 3)), rel=1e-12
    )


def _vn_setup(n=3, m=4, d=2, seed=7):
    rng = np.random.default_rng(seed)
    k = (n + m) * d
    mean = rng.normal(size=k)
    cov = np.asarray(project_psd(jnp.asarray(rng.normal(size=(k, k))), 1e-4))
    return n, m, d, jnp.asarray(mean), jnp.asarray(cov), rng


def _scalar_exp_dotprod_sq(mean, cov, n, m, d, i, j):
    """Oracle: the reference's exp_dotprod_sq loop (normal_exps.py:47-59)."""
    u = np.arange(0, n * d).reshape(n, d).T
    v = np.arange(n * d, (n + m) * d).reshape(m, d).T
    total = 0.0
    for k in range(d):
        uki, vkj = u[k, i], v[k, j]
        total += float(moments.exp_squared(mean, cov, uki, vkj))
        for l in range(k + 1, d):
            total += 2 * float(
                moments.quadexpect(mean, cov, uki, vkj, u[l, i], v[l, j])
            )
    return total


def test_vn_pred_mean_var_vs_scalar_oracle():
    n, m, d, mean, cov, _ = _vn_setup()
    pm, pv = moments.vn_pred_mean_var(mean, cov, n, m, d)
    u = np.arange(0, n * d).reshape(n, d).T
    v = np.arange(n * d, (n + m) * d).reshape(m, d).T
    mean_np, cov_np = np.asarray(mean), np.asarray(cov)
    for i in range(n):
        for j in range(m):
            us, vs = u[:, i], v[:, j]
            want_mean = (mean_np[us] * mean_np[vs] + cov_np[us, vs]).sum()
            e2 = _scalar_exp_dotprod_sq(mean, cov, n, m, d, i, j)
            assert float(pm[i, j]) == pytest.approx(want_mean, rel=1e-9)
            assert float(pv[i, j]) == pytest.approx(e2 - want_mean**2, rel=1e-7)


def test_vn_pred_mean_var_mc():
    n, m, d, mean, cov, rng = _vn_setup(n=2, m=2, d=2, seed=3)
    pm, pv = moments.vn_pred_mean_var(mean, cov, n, m, d)
    s = rng.multivariate_normal(np.asarray(mean), np.asarray(cov), size=N_SAMPLES)
    U = s[:, : n * d].reshape(-1, n, d)
    V = s[:, n * d :].reshape(-1, m, d)
    preds = np.einsum("sik,sjk->sij", U, V)
    np.testing.assert_allclose(np.asarray(pm), preds.mean(0), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(pv), preds.var(0), rtol=0.05, atol=0.05)


def test_vn_pred_covs_vs_mc_and_diag():
    n, m, d, mean, cov, rng = _vn_setup(n=2, m=3, d=2, seed=11)
    pc = np.asarray(moments.vn_pred_covs(mean, cov, n, m, d))
    assert pc.shape == (n * m, n * m)
    np.testing.assert_allclose(pc, pc.T, atol=1e-10)
    # diagonal equals the batched variance
    _, pv = moments.vn_pred_mean_var(mean, cov, n, m, d)
    np.testing.assert_allclose(np.diag(pc), np.asarray(pv).ravel(), rtol=1e-8)
    # Monte Carlo cross-check
    s = rng.multivariate_normal(np.asarray(mean), np.asarray(cov), size=N_SAMPLES)
    U = s[:, : n * d].reshape(-1, n, d)
    V = s[:, n * d :].reshape(-1, m, d)
    preds = np.einsum("sik,sjk->sij", U, V).reshape(-1, n * m)
    mc_cov = np.cov(preds, rowvar=False)
    np.testing.assert_allclose(pc, mc_cov, atol=0.3, rtol=0.1)


def test_mn_pred_mean_var_vs_full_cov_kron():
    """Kronecker moments must equal the full-covariance moments evaluated at
    cov = kron(cov_rows, cov_cols) (with the matching index layout)."""
    rng = np.random.default_rng(5)
    n, m, d = 3, 2, 2
    mean_mat = rng.normal(size=(n + m, d))
    Sr = np.asarray(project_psd(jnp.asarray(rng.normal(size=(n + m, n + m))), 1e-3))
    Sc = np.asarray(project_psd(jnp.asarray(rng.normal(size=(d, d))), 1e-3))
    # full covariance in flat layout: index (row, col) -> row*d + col
    full_cov = np.kron(Sr, Sc)
    mean_flat = mean_mat.reshape(-1)

    pm_mn, pv_mn = moments.mn_pred_mean_var(
        jnp.asarray(mean_mat), jnp.asarray(Sr), jnp.asarray(Sc), n, m
    )
    pm_vn, pv_vn = moments.vn_pred_mean_var(
        jnp.asarray(mean_flat), jnp.asarray(full_cov), n, m, d
    )
    np.testing.assert_allclose(np.asarray(pm_mn), np.asarray(pm_vn), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(pv_mn), np.asarray(pv_vn), rtol=1e-8)
