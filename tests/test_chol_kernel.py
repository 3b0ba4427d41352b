"""Fused batched cholesky solve+sample kernel (ops/chol_kernel.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amf_tpu.ops import chol_kernel


def _spd_batch(rng, B, d, dtype=np.float32):
    A = rng.normal(size=(B, d, d)).astype(dtype)
    return A @ np.swapaxes(A, 1, 2) + d * np.eye(d, dtype=dtype)


@pytest.mark.parametrize("d", [1, 4, 20])
def test_kernel_matches_reference_interpret(d):
    rng = np.random.default_rng(0)
    B = 37  # odd size exercises the lane padding
    S = _spd_batch(rng, B, d)
    rhs = rng.normal(size=(B, d)).astype(np.float32)
    z = rng.normal(size=(B, d)).astype(np.float32)
    ref = np.asarray(chol_kernel.chol_solve_sample_reference(
        jnp.asarray(S), jnp.asarray(rhs), jnp.asarray(z)))
    got = np.asarray(chol_kernel.chol_solve_sample_tpu(
        jnp.asarray(S), jnp.asarray(rhs), jnp.asarray(z), interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_reference_is_a_gaussian_draw():
    """x = S^{-1} b + L^{-T} z has mean S^{-1} b and covariance S^{-1}."""
    rng = np.random.default_rng(1)
    d = 3
    S = _spd_batch(rng, 1, d, np.float64)[0]
    b = rng.normal(size=d)
    N = 40000
    Z = rng.normal(size=(N, d))
    xs = np.asarray(chol_kernel.chol_solve_sample_reference(
        jnp.asarray(np.broadcast_to(S, (N, d, d))),
        jnp.asarray(np.broadcast_to(b, (N, d))),
        jnp.asarray(Z)))
    np.testing.assert_allclose(xs.mean(0), np.linalg.solve(S, b), atol=0.05)
    emp_cov = np.cov(xs.T)
    np.testing.assert_allclose(emp_cov, np.linalg.inv(S), atol=0.05)


def test_dispatch_multibatch_shape():
    rng = np.random.default_rng(2)
    S = _spd_batch(rng, 6, 4).reshape(2, 3, 4, 4)
    rhs = rng.normal(size=(2, 3, 4)).astype(np.float32)
    z = rng.normal(size=(2, 3, 4)).astype(np.float32)
    out = chol_kernel.chol_solve_sample(
        jnp.asarray(S), jnp.asarray(rhs), jnp.asarray(z))
    assert out.shape == (2, 3, 4)
    assert np.all(np.isfinite(np.asarray(out)))
