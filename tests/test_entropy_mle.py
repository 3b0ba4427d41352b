"""Oracle tests for the Dutilleul matrix-normal MLE and the entropy-est
criterion path (models/sample_stats.py), prompted by the d2
exp-entropy-est worse-than-random parity fail (VERDICT r4 weak #1).

Reference analogue: stan-bpmf/bpmf.py matrix_normal_mle (:86-172) and
entropy_est (:369-390). The reference's own iteration omits Dutilleul's
1/(S p), 1/(S n) normalizations; we keep them (sample_stats.py:111-117),
which changes u and v only by a (c, 1/c) scale split plus an overall
(alpha, beta) budget-dependent constant — the entropy ranking across
candidate sets at a fixed sample budget is unaffected, and the normalized
fixed point is the actual matrix-normal MLE these tests pin down.

The oracle: draw S samples X = M + A Z B^T with Z iid standard normal, so
X ~ MN(M, U=AA^T, V=BB^T).  Feed them through the factor-sample API via the
d=m identity trick (U_samps=X, V_samps=I broadcast), which makes
pred = X exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amf_tpu.models import sample_stats


def _mn_samples(rng, S, M, A, B):
    n, m = M.shape
    Z = rng.standard_normal((S, n, m))
    return M[None] + np.einsum("ij,sjk,lk->sil", A, Z, B)


def _via_identity(X):
    """Wrap raw (S, n, m) samples as factor samples: pred = U @ V^T = X."""
    S, n, m = X.shape
    U_samps = jnp.asarray(X)
    V_samps = jnp.broadcast_to(jnp.eye(m), (S, m, m))
    return U_samps, V_samps


def _true_entropy(U, V):
    n = U.shape[0]
    m = V.shape[0]
    return (m * np.linalg.slogdet(U)[1] + n * np.linalg.slogdet(V)[1]) / 2


def test_mle_recovers_kronecker_covariance():
    rng = np.random.default_rng(0)
    n, m, S = 6, 5, 4000
    M = rng.standard_normal((n, m))
    A = rng.standard_normal((n, n)) * 0.4 + np.eye(n)
    B = rng.standard_normal((m, m)) * 0.4 + np.eye(m)
    U_true, V_true = A @ A.T, B @ B.T
    X = _mn_samples(rng, S, M, A, B)

    U_samps, V_samps = _via_identity(X)
    mean, u, v = sample_stats.matrix_normal_mle_from_factors(
        U_samps, V_samps, mean_rating=0.0, subtract_mean=False
    )
    u, v = np.asarray(u), np.asarray(v)

    np.testing.assert_allclose(np.asarray(mean), X.mean(0), rtol=0, atol=1e-10)
    # covariance factors are identified only up to (c, 1/c): compare the
    # Kronecker product itself
    kron_est = np.kron(v, u)
    kron_true = np.kron(V_true, U_true)
    rel = np.linalg.norm(kron_est - kron_true) / np.linalg.norm(kron_true)
    assert rel < 0.15, rel


def test_entropy_est_matches_true_entropy():
    rng = np.random.default_rng(1)
    n, m, S = 6, 5, 4000
    M = np.zeros((n, m))
    A = rng.standard_normal((n, n)) * 0.3 + np.eye(n)
    B = rng.standard_normal((m, m)) * 0.3 + np.eye(m)
    X = _mn_samples(rng, S, M, A, B)

    U_samps, V_samps = _via_identity(X)
    h = float(
        sample_stats.entropy_est_from_factors(
            U_samps, V_samps, mean_rating=0.0, subtract_mean=False
        )
    )
    h_true = _true_entropy(A @ A.T, B @ B.T)
    # entropy (sans additive constant) in nats; n*m=30-dim distribution
    assert abs(h - h_true) < 0.5, (h, h_true)


def test_entropy_est_ranking_at_lookahead_budget():
    """At the recorded d2 lookahead budget (S=100 samples of a 10x10
    matrix), the estimate must still RANK distributions of different true
    entropy correctly — this is the property the exp-entropy-est criterion
    actually relies on."""
    rng = np.random.default_rng(2)
    n = m = 10
    S = 100
    scales = [0.6, 0.8, 1.0, 1.25, 1.6]
    ests, trues = [], []
    for s in scales:
        A = np.eye(n) * s
        B = np.eye(m) + 0.2 * rng.standard_normal((m, m))
        X = _mn_samples(rng, S, np.zeros((n, m)), A, B)
        U_samps, V_samps = _via_identity(X)
        ests.append(
            float(
                sample_stats.entropy_est_from_factors(
                    U_samps, V_samps, mean_rating=0.0, subtract_mean=False
                )
            )
        )
        trues.append(_true_entropy(A @ A.T, B @ B.T))
    order_est = np.argsort(ests)
    order_true = np.argsort(trues)
    np.testing.assert_array_equal(order_est, order_true)


def test_entropy_est_scale_split_invariance():
    """(c u, v / c) leaves m*logdet(u)+n*logdet(v) unchanged — the property
    that makes the normalization deviation from the reference harmless."""
    rng = np.random.default_rng(3)
    n, m = 4, 7
    u = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    u = u @ u.T
    v = np.eye(m) + 0.1 * rng.standard_normal((m, m))
    v = v @ v.T
    for c in (0.1, 3.0, 42.0):
        h1 = m * np.linalg.slogdet(u)[1] + n * np.linalg.slogdet(v)[1]
        h2 = m * np.linalg.slogdet(c * u)[1] + n * np.linalg.slogdet(v / c)[1]
        np.testing.assert_allclose(h1, h2, rtol=1e-10)


def test_mle_matches_reference_iteration_ranking_on_square():
    """On square matrices the reference's unnormalized iteration
    (stan-bpmf/bpmf.py:149-161) converges too; its entropy differs from
    ours by a budget-dependent constant only, so candidate RANKINGS agree.
    Run both on several sample sets and compare orderings."""
    rng = np.random.default_rng(4)
    n = m = 8
    S = 60

    def ref_style_entropy(X):
        # unnormalized Dutilleul exactly as the reference writes it
        Xc = X - X.mean(0)
        v = np.eye(m)
        u = sum(x @ x.T for x in Xc)
        for _ in range(200):
            old_u, old_v = u, v
            u_j = u + 1e-9 * np.trace(u) / n * np.eye(n)
            v = sum(x.T @ np.linalg.solve(u_j, x) for x in Xc)
            v_j = v + 1e-9 * np.trace(v) / m * np.eye(m)
            u = sum(x @ np.linalg.solve(v_j, x.T) for x in Xc)
            if (
                np.linalg.norm(u - old_u) < 1e-6 * np.linalg.norm(u)
                and np.linalg.norm(v - old_v) < 1e-6 * np.linalg.norm(v)
            ):
                break
        return (
            m * np.linalg.slogdet(u)[1] + n * np.linalg.slogdet(v)[1]
        ) / 2

    ours, refs = [], []
    for trial in range(5):
        s = 0.7 + 0.25 * trial
        A = np.eye(n) * s
        B = np.eye(m) + 0.15 * rng.standard_normal((m, m))
        X = _mn_samples(rng, S, np.zeros((n, m)), A, B)
        U_samps, V_samps = _via_identity(X)
        ours.append(
            float(
                sample_stats.entropy_est_from_factors(
                    U_samps, V_samps, mean_rating=0.0, subtract_mean=False
                )
            )
        )
        refs.append(ref_style_entropy(X))
    np.testing.assert_array_equal(np.argsort(ours), np.argsort(refs))
    # and the pairwise differences (constant cancels) should agree closely
    d_ours = np.diff(sorted(ours))
    d_refs = np.diff(sorted(refs))
    np.testing.assert_allclose(d_ours, d_refs, rtol=0.05, atol=0.05)
