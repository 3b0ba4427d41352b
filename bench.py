#!/usr/bin/env python3
"""Benchmark: candidate lookahead scores/sec (BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: MovieLens-100k-shaped (943 x 1682, ~5% seed, d=10) one-step
lookahead scoring — per candidate: hypothesize the MAP rating, run a budgeted
PMF MAP refit, score the training-residual change. Candidates are scored in
vmapped tiles (the full fan-out would materialize per-lane problem copies).

``vs_baseline`` is measured speedup against a faithful single-process numpy
implementation of the same per-candidate refit loop — the reference's
evaluation strategy is exactly this per-cell deepcopy+refit in Python
workers (active_pmf.py:668-676, 739-770); its multiprocessing pool adds at
most ~n_cores over the numpy number (the reference publishes no figures,
SURVEY.md §6, so the baseline is measured on the spot and extrapolated).
"""

import json
import time

import numpy as np

N_CAND = 1024
TILE = 128
REFIT_STEPS = 8


def main():
    import jax
    import jax.numpy as jnp

    from amf_tpu import types
    from amf_tpu.data import make_fake_data
    from amf_tpu.models import pmf

    n, m, d = 943, 1682, 10
    rng = np.random.default_rng(0)
    real, known, _ = make_fake_data(
        num_users=n, num_items=m, rank=d, noise=0.5,
        mask_type=0.05 * 100000 / (n * m), rng=rng,
    )
    prob = types.problem_from_dense(real, known)
    cfg = pmf.PMFConfig(latent_d=d, max_fit_steps=200)
    state = pmf.init_state(jax.random.PRNGKey(0), n, m, cfg, prob)
    state, _ = pmf.fit(state, prob, cfg)

    cand_all = np.argsort(~np.asarray(prob.queryable).ravel(), kind="stable")
    cand_all = jnp.asarray(cand_all[:N_CAND], dtype=jnp.int32)
    di_all = cand_all // m
    dj_all = cand_all % m
    dv_all = jnp.sum(state.U[di_all] * state.V[dj_all], axis=1)

    # Fused Pallas path: base R/mask shared across lanes, per-lane deltas
    # applied in-kernel, no per-lane (n, m) intermediates in HBM; bf16 HBM
    # streaming (f32 MXU accumulation; scores within 5e-4 of f32).
    @jax.jit
    def tile_fn(di, dj, dv):
        _, _, neg_ll = pmf.fit_lookahead_batch(
            state, prob, di, dj, dv, cfg, max_steps=REFIT_STEPS,
            use_pallas=True, bf16=True,
        )
        return neg_ll

    def score_all():
        outs = []
        for t in range(N_CAND // TILE):
            s = slice(t * TILE, (t + 1) * TILE)
            outs.append(tile_fn(di_all[s], dj_all[s], dv_all[s]))
        return jnp.concatenate(outs)

    score_all()[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    scores = score_all()
    scores.block_until_ready()
    tpu_time = time.perf_counter() - t0
    tpu_scores_per_sec = N_CAND / tpu_time

    # --- Reference-style numpy baseline: per-candidate python loop with the
    # same budgeted refit, measured on a subsample then extrapolated.
    U0 = np.asarray(state.U, dtype=np.float64)
    V0 = np.asarray(state.V, dtype=np.float64)
    rated = np.asarray(prob.rated)
    r_obs = np.asarray(prob.R_obs, dtype=np.float64)
    sub = 8

    def np_refit(rated_m, r_m):
        U, V = U0.copy(), V0.copy()
        lr = 1e-4
        for _ in range(REFIT_STEPS):
            resid = np.where(rated_m, r_m - U @ V.T, 0.0)
            gu = resid @ V - U / 10
            gv = resid.T @ U - V / 10
            U = U + lr * gu
            V = V + lr * gv
            lr *= 1.25
        resid = np.where(rated_m, r_m - U @ V.T, 0.0)
        return np.sum(resid * resid)

    cand_np = np.asarray(cand_all[:sub])
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
