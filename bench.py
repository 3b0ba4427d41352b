#!/usr/bin/env python3
"""Benchmark: candidate lookahead scores/sec (BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: MovieLens-100k-shaped active-PMF pred-variance scoring — the
driver-set target is >=100x the reference's Cython/multiprocessing wall time.
``vs_baseline`` is measured speedup against a faithful single-process numpy
implementation of the same per-candidate scoring loop (the reference's
evaluation strategy: one refit-free criterion eval per cell, multiprocessing
adds at most ~n_cores; see SURVEY.md §6 — the reference publishes no numbers,
so the baseline is measured on the spot on a subsample and extrapolated).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from amf_tpu import types
    from amf_tpu.data import make_fake_data
    from amf_tpu.models import pmf

    # ML-100k shape: 943 x 1682, ~5% seed of 100k ratings, d=10
    n, m, d = 943, 1682, 10
    rng = np.random.default_rng(0)
    real, known, _ = make_fake_data(
        num_users=n, num_items=m, rank=d, noise=0.5, mask_type=0.05 * 100000 / (n * m),
        rng=rng,
    )
    prob = types.problem_from_dense(real, known)
    cfg = pmf.PMFConfig(latent_d=d, max_fit_steps=200)
    state = pmf.init_state(jax.random.PRNGKey(0), n, m, cfg, prob)
    state, _ = pmf.fit(state, prob, cfg)

    # --- TPU path: one batched pass scores every queryable candidate with a
    # 1-step lookahead refit (budgeted), reference semantics exp_total_variance
    # -lite: refit MAP after hypothesized rating, score train variance drop.
    n_cand = 4096  # candidates per device pass (tiled over all cells in prod)
    cand = jnp.argsort(~prob.queryable.ravel())[:n_cand]

    def score_one(c):
        i, j = c // m, c % m
        hyp = prob.add_rating(i, j, state.U[i] @ state.V[j])
        st, _ = pmf.fit(state, hyp, cfg, max_steps=8)
        pred = pmf.predicted_matrix(st, cfg)
        err = jnp.where(hyp.rated, hyp.R_obs - pred, 0.0)
        return jnp.sum(err * err)

    batched = jax.jit(jax.vmap(score_one))
    scores = batched(cand)
    scores.block_until_ready()  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        scores = batched(cand)
    scores.block_until_ready()
    tpu_time = (time.perf_counter() - t0) / reps
    tpu_scores_per_sec = n_cand / tpu_time

    # --- Reference-style numpy baseline: per-candidate python loop, deepcopy
    # + budgeted refit per candidate (the reference's hot loop,
    # active_pmf.py:668-676), measured on a subsample then extrapolated.
    U0 = np.asarray(state.U, dtype=np.float64)
    V0 = np.asarray(state.V, dtype=np.float64)
    rated = np.asarray(prob.rated)
    r_obs = np.asarray(prob.R_obs, dtype=np.float64)
    sub = 8

    def np_refit(rated_m, r_m):
        U, V = U0.copy(), V0.copy()
        lr = 1e-4
        resid = np.where(rated_m, r_m - U @ V.T, 0.0)
        old = -np.sum(resid**2) / 2 - np.sum(U * U) / 20 - np.sum(V * V) / 20
        for _ in range(8):
            gu = resid @ V - U / 10
            gv = resid.T @ U - V / 10
            U = U + lr * gu
            V = V + lr * gv
            resid = np.where(rated_m, r_m - U @ V.T, 0.0)
            lr *= 1.25
        err = resid
        return np.sum(err * err)

    cand_np = np.asarray(cand[:sub])
    t0 = time.perf_counter()
    for c in cand_np:
        i, j = divmod(int(c), m)
        rated_m = rated.copy()
        r_m = r_obs.copy()
        rated_m[i, j] = True
        r_m[i, j] = U0[i] @ V0[j]
        np_refit(rated_m, r_m)
    np_time_per = (time.perf_counter() - t0) / sub
    np_scores_per_sec = 1.0 / np_time_per

    print(
        json.dumps(
            {
                "metric": "lookahead_scores_per_sec",
                "value": round(tpu_scores_per_sec, 2),
                "unit": "candidates/s",
                "vs_baseline": round(tpu_scores_per_sec / np_scores_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
