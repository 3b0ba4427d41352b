"""Settle the variance-criterion cross-density/cross-engine tau question
(VERDICT r4 weak #4 / next #5) with a sampler-budget ladder.

Round 4 measured, on the fresh esjd-era d2 digests: pred-variance
cross-density tau (straightforward ~ w0identity, s200) = 0.10 while
within-density s200~s400 tau = 0.72, and the reference's 0.4
cross-implementation bar fails for the whole variance family — either the
variance map at 90 queryable cells is below the MC noise floor at s200, or
the engines genuinely rank mid-variance cells differently.

The reference's own answer to this question is its s10000 repeatability
arm (results/10x10_discrete2_d2/Makefile results_stan_s10000_*). The
chip-queue versions are ~4 h/arm because they drag the full active loop;
but the QUESTION only needs FIRST-STEP maps, and direct criteria maps
(pred-variance / pred / prob-ge-3.5) are pure base-chain statistics — no
lookahead — so a CPU f32 ladder is minutes per point even at s10000.

For budget S in {200, 1000, 10000} x density in {w0identity,
straightforward} x seed in {100, 200}: run one warm-started NUTS chain at
the recorded d2 config (warmup 200, like the catalog arms), compute the
pred-variance map, and report
  - tau_seed_pair(density, S): within-density reproducibility
  - tau_cross_density(S): seed-matched across densities
  - tau_vs_gibbs(S): vs the committed Gibbs digest's first-step
    pred-variance map (cross-ENGINE, the reference's 0.4 bar)
If cross-density/cross-engine tau rises with S toward the within-density
ceiling, the s200 disagreement was MC noise (downgrade evidence). If it
plateaus low while within-density tau -> 1, it is an engine finding.

Writes experiments/10x10_discrete2_d2/adjudication_variance_tau.json.
CPU-only (jax_platforms forced) — safe to run alongside the chip queue.
"""

import gzip
import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from amf_tpu import types  # noqa: E402
from amf_tpu.active.gibbs_loop import split_query_test  # noqa: E402
from amf_tpu.analysis import metrics  # noqa: E402
from amf_tpu.data.loaders import load_npz_schema  # noqa: E402
from amf_tpu.models import bpmf_hmc, pmf, sample_stats  # noqa: E402

EXP_DIR = "experiments/10x10_discrete2_d2"
LATENT_D = 2
SUBTRACT_MEAN = False
WARMUP = 200
BUDGETS = (200, 1000, 10000)
DENSITIES = ("w0identity", "straightforward")
SEEDS = (100, 200)


def load_problem():
    data = load_npz_schema(f"{EXP_DIR}/data.pkl")
    real, ratings = data["_real"], data["_ratings"]
    rng = np.random.default_rng(0)
    query_on, test_on = split_query_test(real, ratings, "all", rng)
    if "_test_on" in data:
        test_on = np.asarray(data["_test_on"], bool)
        query_on = query_on & ~test_on
    prob = types.problem_from_ratings(
        ratings, real=real, test=test_on, dtype=jnp.float32
    )
    return prob.replace(queryable=jnp.asarray(query_on)), np.asarray(query_on)


def var_map(problem, seed, model, num_samps):
    n, m = problem.shape
    dtype = jnp.float32
    cfg = bpmf_hmc.HMCConfig(
        latent_d=LATENT_D, subtract_mean=SUBTRACT_MEAN, model=model
    )
    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    pcfg = pmf.PMFConfig(latent_d=LATENT_D, subtract_mean=SUBTRACT_MEAN)
    pst = pmf.init_state(kinit, n, m, pcfg, problem, dtype=dtype)
    pst, _ = pmf.fit(pst, problem, pcfg)
    st0 = bpmf_hmc.init_state(problem, cfg, U=pst.U, V=pst.V, dtype=dtype)
    key, ks = jax.random.split(key)
    _, samps = bpmf_hmc.samples(ks, st0, problem, cfg, num_samps, WARMUP)
    stats = sample_stats.prediction_stats(
        samps["U"], samps["V"], st0.mean_rating, cfg.subtract_mean
    )
    return np.asarray(stats.var)


def gibbs_recorded_map():
    try:
        with gzip.open(f"{EXP_DIR}/digest_bayes.json.gz", "rt") as f:
            dg = json.load(f)
        return np.asarray(
            dg["criteria"]["pred-variance"]["first_step_evals"], float
        )
    except Exception as e:
        print(f"(no gibbs map: {e})")
        return None


def main():
    problem, q = load_problem()

    def tau(x, y):
        sel = q & np.isfinite(x) & np.isfinite(y)
        return float(metrics.kendall_tau(x[sel], y[sel]))

    gibbs = gibbs_recorded_map()
    ladder = {}
    maps = {}
    for S in BUDGETS:
        for d in DENSITIES:
            for s in SEEDS:
                print(f"== pred-variance map: S={S} density={d} seed={s}",
                      flush=True)
                maps[(S, d, s)] = var_map(problem, s, d, S)
        row = {
            "tau_seed_pair_w0identity": tau(
                maps[(S, "w0identity", 100)], maps[(S, "w0identity", 200)]),
            "tau_seed_pair_straightforward": tau(
                maps[(S, "straightforward", 100)],
                maps[(S, "straightforward", 200)]),
            "tau_cross_density_seed100": tau(
                maps[(S, "w0identity", 100)],
                maps[(S, "straightforward", 100)]),
            "tau_cross_density_seed200": tau(
                maps[(S, "w0identity", 200)],
                maps[(S, "straightforward", 200)]),
        }
        if gibbs is not None:
            row["tau_vs_gibbs_w0identity"] = tau(
                maps[(S, "w0identity", 100)], gibbs)
            row["tau_vs_gibbs_straightforward"] = tau(
                maps[(S, "straightforward", 100)], gibbs)
        ladder[str(S)] = row
        print(json.dumps({str(S): row}), flush=True)

    top = str(BUDGETS[-1])
    cross_top = min(ladder[top]["tau_cross_density_seed100"],
                    ladder[top]["tau_cross_density_seed200"])
    within_200 = min(ladder["200"]["tau_seed_pair_w0identity"],
                     ladder["200"]["tau_seed_pair_straightforward"])
    out = {
        "check": "pred-variance map tau vs sampler budget "
                 "(NUTS, d2 recorded config)",
        "workload": EXP_DIR,
        "warmup": WARMUP,
        "cells": int(q.sum()),
        "ladder": ladder,
        # noise-floor downgrade applies to the s200 RECORDED maps only if
        # they cannot reproduce their own ranking at that budget
        "kind": "stan",
        "criteria": (["pred-variance"] if within_200 < 0.3 else []),
        "reliable": within_200 >= 0.3,
        "verdict": (
            f"cross-density tau at s{top} = {cross_top:.2f}: "
            + ("the s200 disagreement was MC noise — densities agree once "
               "the budget resolves the map" if cross_top >= 0.4 else
               "densities still disagree at a budget where each map is "
               "self-reproducible — an engine-level ranking difference, "
               "not noise")
        ),
    }
    print(json.dumps(out, indent=1), flush=True)
    with open(f"{EXP_DIR}/adjudication_variance_tau.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
