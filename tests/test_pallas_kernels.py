"""Pallas kernel tests (interpret mode on CPU; the real-TPU path is exercised
by bench.py on hardware)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amf_tpu.ops import pallas_kernels as pk


def _setup(rng, L=3, n=12, m=9, d=4):
    U = jnp.asarray(rng.normal(size=(L, n, d)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(L, m, d)), jnp.float32)
    R = jnp.asarray(rng.integers(1, 6, size=(n, m)), jnp.float32)
    rated = jnp.asarray(rng.random((n, m)) < 0.4)
    di = jnp.asarray(rng.integers(0, n, L), jnp.int32)
    dj = jnp.asarray(rng.integers(0, m, L), jnp.int32)
    dv = jnp.asarray(rng.integers(1, 6, L), jnp.float32)
    sigmas = jnp.asarray([1.0, 10.0, 10.0], jnp.float32)
    return U, V, R, rated, di, dj, dv, sigmas


def test_reference_matches_pmf_gradient(rng):
    """The batched oracle must agree with models.pmf.gradient on the
    per-lane problem."""
    from amf_tpu import types
    from amf_tpu.models import pmf

    U, V, R, rated, di, dj, dv, sigmas = _setup(rng)
    neg_ll, gu, gv = pk.pmf_batched_value_grad_reference(
        U, V, R, rated, di, dj, dv, sigmas
    )
    cfg = pmf.PMFConfig(latent_d=4)
    for lane in range(U.shape[0]):
        prob = types.Problem(
            R_obs=R.at[di[lane], dj[lane]].set(dv[lane]),
            rated=rated.at[di[lane], dj[lane]].set(True),
            queryable=jnp.zeros_like(rated),
            test=rated,
        )
        st = pmf.PMFState(
            U=U[lane], V=V[lane],
            sigma_sq=sigmas[0], sigma_u_sq=sigmas[1], sigma_v_sq=sigmas[2],
            mean_rating=jnp.float32(0),
        )
        want_gu, want_gv = pmf.gradient(st, prob, cfg)
        want_ll = -pmf.log_likelihood(st, prob, cfg)
        np.testing.assert_allclose(np.asarray(gu[lane]), np.asarray(want_gu),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gv[lane]), np.asarray(want_gv),
                                   rtol=1e-5, atol=1e-5)
        assert float(neg_ll[lane]) == pytest.approx(float(want_ll), rel=1e-5)


def test_pallas_kernel_matches_reference_interpret(rng, monkeypatch):
    """Run the pallas kernel in interpreter mode and compare to the oracle."""
    from jax.experimental import pallas as pl

    U, V, R, rated, di, dj, dv, sigmas = _setup(rng, L=4, n=16, m=8, d=4)

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pk.pl, "pallas_call", interp_call)
    # bypass the jit wrapper so the monkeypatch is seen
    fn = pk.pmf_batched_value_grad.__wrapped__

    neg_ll, gu, gv = fn(U, V, R, rated, di, dj, dv, sigmas, block_rows=8)
    wll, wgu, wgv = pk.pmf_batched_value_grad_reference(
        U, V, R, rated, di, dj, dv, sigmas
    )
    np.testing.assert_allclose(np.asarray(neg_ll), np.asarray(wll), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wgu), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wgv), rtol=1e-4,
                               atol=1e-5)


def test_pallas_kernel_row_padding(rng, monkeypatch):
    """n not divisible by the block size exercises the padding path."""
    from jax.experimental import pallas as pl

    U, V, R, rated, di, dj, dv, sigmas = _setup(rng, L=2, n=13, m=8, d=4)
    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pk.pl, "pallas_call", interp_call)
    fn = pk.pmf_batched_value_grad.__wrapped__
    neg_ll, gu, gv = fn(U, V, R, rated, di, dj, dv, sigmas, block_rows=8)
    wll, wgu, wgv = pk.pmf_batched_value_grad_reference(
        U, V, R, rated, di, dj, dv, sigmas
    )
    np.testing.assert_allclose(np.asarray(neg_ll), np.asarray(wll), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wgu), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wgv), rtol=1e-4,
                               atol=1e-5)


def _interp(monkeypatch):
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pk.pl, "pallas_call", interp_call)


def test_lane_blocked_kernel_matches_reference(rng, monkeypatch):
    """v2 (lane-blocked, transposed factors) == the batched oracle,
    including lane padding (L=5 with LB=2) and row padding (n=13, bn=8)."""
    U, V, R, rated, di, dj, dv, sigmas = _setup(rng, L=5, n=13, m=8, d=4)
    _interp(monkeypatch)
    fn = pk.pmf_batched_value_grad_t.__wrapped__
    neg_ll, gut, gvt = fn(
        U.transpose(0, 2, 1), V.transpose(0, 2, 1), R, rated, di, dj, dv,
        sigmas, block_rows=8, lanes_per_block=2, bf16=False,
    )
    wll, wgu, wgv = pk.pmf_batched_value_grad_reference(
        U, V, R, rated, di, dj, dv, sigmas
    )
    np.testing.assert_allclose(np.asarray(neg_ll), np.asarray(wll), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gut.transpose(0, 2, 1)), np.asarray(wgu), rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gvt.transpose(0, 2, 1)), np.asarray(wgv), rtol=1e-4,
        atol=1e-5,
    )


def test_fused_linesearch_kernel_matches_unfused(rng, monkeypatch):
    """The whole-line-search kernel (v3) reproduces the kernel-per-step
    while_loop trajectory exactly in f32: same accepts, same rejects, same
    final factors/values — including lane padding and early-converged lanes
    (large max_steps forces every lane through its done branch)."""
    from amf_tpu import types
    from amf_tpu.models import pmf

    _interp(monkeypatch)
    n, m, d = 13, 9, 3
    R = jnp.asarray(rng.integers(1, 6, size=(n, m)), jnp.float32)
    rated = jnp.asarray(rng.random((n, m)) < 0.5)
    prob = types.Problem(
        R_obs=jnp.where(rated, R, 0.0), rated=rated,
        queryable=~rated, test=rated,
    )
    cfg = pmf.PMFConfig(latent_d=d)
    st = pmf.init_state(jax.random.PRNGKey(0), n, m, cfg, prob,
                        dtype=jnp.float32)
    st, _ = pmf.fit(st, prob, cfg)
    di = jnp.asarray([0, 5, 12], jnp.int32)
    dj = jnp.asarray([1, 8, 0], jnp.int32)
    dv = jnp.asarray([3.0, 1.0, 5.0], jnp.float32)

    U_a, V_a, f_a = pmf.fit_lookahead_batch(
        st, prob, di, dj, dv, cfg, max_steps=40, use_pallas=False)

    sigmas = jnp.stack([st.sigma_sq, st.sigma_u_sq, st.sigma_v_sq])
    ls = jnp.array(
        [cfg.learning_rate, cfg.stop_thresh, cfg.min_learning_rate],
        jnp.float32,
    )
    f_b, Ut_b, Vt_b = pk.pmf_lookahead_fused_t.__wrapped__(
        st.U.T, st.V.T, prob.R_obs, prob.rated, di, dj, dv, sigmas, ls,
        max_steps=40, block_rows=8, lanes_per_block=2, bf16=False,
    )
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_a), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(Ut_b.transpose(0, 2, 1)), np.asarray(U_a), rtol=1e-3,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(Vt_b.transpose(0, 2, 1)), np.asarray(V_a), rtol=1e-3,
        atol=1e-5,
    )


def test_fit_lookahead_batch_lane_block_matches_plain(rng, monkeypatch):
    """The lane-blocked fit path returns the same refit trajectory as the
    oracle-backed path (same accept/reject arithmetic in f32)."""
    from amf_tpu import types
    from amf_tpu.models import pmf

    _interp(monkeypatch)
    n, m, d = 13, 9, 3
    R = jnp.asarray(rng.integers(1, 6, size=(n, m)), jnp.float32)
    rated = jnp.asarray(rng.random((n, m)) < 0.5)
    prob = types.Problem(
        R_obs=jnp.where(rated, R, 0.0), rated=rated,
        queryable=~rated, test=rated,
    )
    cfg = pmf.PMFConfig(latent_d=d)
    st = pmf.init_state(jax.random.PRNGKey(0), n, m, cfg, prob,
                        dtype=jnp.float32)
    st, _ = pmf.fit(st, prob, cfg)
    di = jnp.asarray([0, 5, 12], jnp.int32)
    dj = jnp.asarray([1, 8, 0], jnp.int32)
    dv = jnp.asarray([3.0, 1.0, 5.0], jnp.float32)

    U_a, V_a, f_a = pmf.fit_lookahead_batch(
        st, prob, di, dj, dv, cfg, max_steps=5, use_pallas=False)
    U_b, V_b, f_b = pmf.fit_lookahead_batch(
        st, prob, di, dj, dv, cfg, max_steps=5, lane_block=2, bf16=False,
        block_rows=8)
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_a), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(U_b), np.asarray(U_a), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(V_b), np.asarray(V_a), rtol=1e-3,
                               atol=1e-5)


def test_line_coeffs_kernel_matches_scalar(rng, monkeypatch):
    """pmf_line_coeffs_t == the scalar quartic pmf._delta_poly per lane
    (including lane padding L=3 with LB=2 and row padding n=13, bn=8)."""
    from amf_tpu import types
    from amf_tpu.models import pmf

    _interp(monkeypatch)
    n, m, d = 13, 9, 3
    R = jnp.asarray(rng.integers(1, 6, size=(n, m)), jnp.float32)
    rated = jnp.asarray(rng.random((n, m)) < 0.5)
    prob = types.Problem(
        R_obs=jnp.where(rated, R, 0.0), rated=rated,
        queryable=~rated, test=rated,
    )
    cfg = pmf.PMFConfig(latent_d=d)
    st = pmf.init_state(jax.random.PRNGKey(0), n, m, cfg, prob,
                        dtype=jnp.float32)
    st, _ = pmf.fit(st, prob, cfg)
    di = jnp.asarray([0, 5, 12], jnp.int32)
    dj = jnp.asarray([1, 8, 0], jnp.int32)
    dv = jnp.asarray([3.0, 1.0, 5.0], jnp.float32)
    sigmas = jnp.stack([st.sigma_sq, st.sigma_u_sq, st.sigma_v_sq])

    L = 3
    U = jnp.broadcast_to(st.U[None], (L, n, d)).astype(jnp.float32)
    V = jnp.broadcast_to(st.V[None], (L, m, d)).astype(jnp.float32)
    _, gu, gv = pk.pmf_batched_value_grad_reference(
        U, V, prob.R_obs, prob.rated, di, dj, dv, sigmas)

    fn = pk.pmf_line_coeffs_t.__wrapped__
    c1, c2, c3, c4 = fn(
        U.transpose(0, 2, 1), V.transpose(0, 2, 1),
        gu.transpose(0, 2, 1), gv.transpose(0, 2, 1),
        prob.R_obs, prob.rated, di, dj, dv, sigmas,
        block_rows=8, lanes_per_block=2, bf16=False,
    )

    for l in range(L):
        prob2 = prob.add_rating(int(di[l]), int(dj[l]), float(dv[l]))
        w1, w2, w3, w4 = pmf._delta_poly(
            st, prob2, cfg, (U[l], V[l]), (gu[l], gv[l]))
        np.testing.assert_allclose(float(c1[l]), float(w1), rtol=1e-4)
        np.testing.assert_allclose(float(c2[l]), float(w2), rtol=1e-4)
        np.testing.assert_allclose(float(c3[l]), float(w3), rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(float(c4[l]), float(w4), rtol=1e-4,
                                   atol=1e-6)


def test_fit_lookahead_batch_poly_matches_plain(rng, monkeypatch):
    """The poly-LS epoch loop reproduces the proposal-loop refit
    (f32 scoring-grade: same accepted points up to quartic-vs-subtraction
    rounding on this small, well-separated problem)."""
    from amf_tpu import types
    from amf_tpu.models import pmf

    _interp(monkeypatch)
    n, m, d = 13, 9, 3
    R = jnp.asarray(rng.integers(1, 6, size=(n, m)), jnp.float32)
    rated = jnp.asarray(rng.random((n, m)) < 0.5)
    prob = types.Problem(
        R_obs=jnp.where(rated, R, 0.0), rated=rated,
        queryable=~rated, test=rated,
    )
    cfg = pmf.PMFConfig(latent_d=d)
    st = pmf.init_state(jax.random.PRNGKey(0), n, m, cfg, prob,
                        dtype=jnp.float32)
    st, _ = pmf.fit(st, prob, cfg)
    di = jnp.asarray([0, 5, 12], jnp.int32)
    dj = jnp.asarray([1, 8, 0], jnp.int32)
    dv = jnp.asarray([3.0, 1.0, 5.0], jnp.float32)

    U_a, V_a, f_a = pmf.fit_lookahead_batch(
        st, prob, di, dj, dv, cfg, max_steps=25, use_pallas=False)
    U_b, V_b, f_b = pmf.fit_lookahead_batch(
        st, prob, di, dj, dv, cfg, max_steps=25, lane_block=2, bf16=False,
        block_rows=8, poly_ls=True)
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_a), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(U_b), np.asarray(U_a), rtol=1e-2,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(V_b), np.asarray(V_a), rtol=1e-2,
                               atol=1e-3)
