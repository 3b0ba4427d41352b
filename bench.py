#!/usr/bin/env python3
"""Benchmark: candidate lookahead scores/sec (BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: MovieLens-100k-shaped (943 x 1682, ~5% seed, d=10) one-step
lookahead scoring — per candidate: hypothesize the MAP rating, run a budgeted
PMF MAP refit, score the training-residual change. Candidates are scored in
vmapped tiles (the full fan-out would materialize per-lane problem copies).

``vs_baseline`` is measured speedup against a reference-style
``multiprocessing.Pool`` running the same per-candidate numpy refit loop —
the reference's evaluation strategy is exactly this per-cell deepcopy+refit
fanned over a pool (active_pmf.py:668-676, 739-770). The pool is measured
for real on this host (workers get the base model via the pool initializer,
which is GENEROUS to the baseline — the reference pickles the model per
task); the JSON line also reports the host core count so the ratio can be
rescaled to any hypothetical worker count (pool throughput is measured to
scale ~linearly in cores on this embarrassingly parallel loop; see
BENCHMARKS.md).
"""

import json
import multiprocessing
import time

import numpy as np

N_CAND = 1024
TILE = 128
REFIT_STEPS = 8
LANE_BLOCK = 8   # lanes per base-matrix DMA in the lane-blocked kernel
BLOCK_ROWS = 256  # row-block height (v5e 16M VMEM bound with the bf16 resid buffer)
# bf16-contract resid buffer; 256 is the sweep's best fitting config)

_POOL_GLOBALS = {}


def _pool_init(U0, V0, rated, r_obs):
    _POOL_GLOBALS.update(U0=U0, V0=V0, rated=rated, r_obs=r_obs)


def _pool_refit(args):
    """Per-candidate worker: hypothesize the cell, run the budgeted refit
    (reference worker semantics: ActivePMFEvaluator -> _exp_with_rij,
    active_pmf.py:54-67, 635-704)."""
    i, j = args
    U0 = _POOL_GLOBALS["U0"]
    V0 = _POOL_GLOBALS["V0"]
    rated_m = _POOL_GLOBALS["rated"].copy()
    r_m = _POOL_GLOBALS["r_obs"].copy()
    rated_m[i, j] = True
    r_m[i, j] = U0[i] @ V0[j]
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
    return float(np.sum(resid * resid))


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

    # Fused lane-blocked Pallas path: base R/mask shared across lanes AND
    # DMA'd once per LANE_BLOCK lanes; per-lane deltas applied in-kernel, no
    # per-lane (n, m) intermediates in HBM; transposed (d, rows) factor
    # layout; bf16 HBM streaming (f32 MXU accumulation). The WHOLE candidate
    # sweep is ONE device program (lax.map over memory-bounded tiles): a
    # host->device dispatch costs ~30 ms on this tunnel, so per-tile
    # dispatching would be latency-bound, not device-bound.
    @jax.jit
    def score_all_fn(di, dj, dv):
        def one_tile(args):
            ti, tj, tv = args
            _, _, neg_ll = pmf.fit_lookahead_batch(
                state, prob, ti, tj, tv, cfg, max_steps=REFIT_STEPS,
                lane_block=LANE_BLOCK, block_rows=BLOCK_ROWS, bf16=True,
            )
            return neg_ll

        shape = (-1, TILE)
        return jax.lax.map(
            one_tile,
            (di.reshape(shape), dj.reshape(shape), dv.reshape(shape)),
        ).ravel()

    # triple-sweep program: same dispatch cost, 3x device work — the
    # difference against the single sweep isolates pure device time (the
    # ~30 ms tunnel dispatch is what directly-attached hardware skips)
    @jax.jit
    def score_3x(di, dj, dv):
        def body(c, _):
            # chain a negligible carry-dependence through dv so XLA cannot
            # CSE the three iterations into one
            s = jnp.sum(score_all_fn(di, dj, dv + c * 1e-30))
            return s, s
        _, sums = jax.lax.scan(body, jnp.float32(0), None, length=3)
        return sums

    score_all_fn(di_all, dj_all, dv_all).block_until_ready()  # compile
    score_3x(di_all, dj_all, dv_all).block_until_ready()
    t0 = time.perf_counter()
    scores = score_all_fn(di_all, dj_all, dv_all)
    scores.block_until_ready()
    tpu_time = time.perf_counter() - t0
    tpu_scores_per_sec = N_CAND / tpu_time
    t0 = time.perf_counter()
    score_3x(di_all, dj_all, dv_all).block_until_ready()
    t3 = time.perf_counter() - t0
    device_time = max((t3 - tpu_time) / 2, 1e-9)
    device_scores_per_sec = N_CAND / device_time

    # --- Reference-style multiprocessing.Pool baseline, measured for real:
    # the same budgeted per-candidate refit fanned over a worker pool
    # (active_pmf.py:739-770 semantics). Enough tasks per worker to amortize
    # startup; wall time divides out to pool throughput.
    U0 = np.asarray(state.U, dtype=np.float64)
    V0 = np.asarray(state.V, dtype=np.float64)
    rated = np.asarray(prob.rated)
    r_obs = np.asarray(prob.R_obs, dtype=np.float64)

    procs = min(multiprocessing.cpu_count(), 16)
    tasks = [divmod(int(c), m) for c in np.asarray(cand_all[: 4 * procs])]
    ctx = multiprocessing.get_context("spawn")  # fork is unsafe after JAX init
    with ctx.Pool(
        procs, initializer=_pool_init, initargs=(U0, V0, rated, r_obs)
    ) as pool:
        pool.map(_pool_refit, tasks[:procs])  # warm the workers
        rates = []
        for _ in range(3):  # best-of-3 favors the baseline on a noisy host
            t0 = time.perf_counter()
            pool.map(_pool_refit, tasks)
            rates.append(len(tasks) / (time.perf_counter() - t0))
    pool_scores_per_sec = max(rates)

    print(
        json.dumps(
            {
                "metric": "lookahead_scores_per_sec",
                "value": round(tpu_scores_per_sec, 2),
                "unit": "candidates/s",
                "vs_baseline": round(
                    tpu_scores_per_sec / pool_scores_per_sec, 2
                ),
                "baseline": "multiprocessing.Pool, measured",
                "pool_procs": procs,
                "pool_scores_per_sec": round(pool_scores_per_sec, 2),
                "device_only_scores_per_sec": round(device_scores_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
