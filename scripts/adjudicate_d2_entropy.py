"""Adjudicate the d2 exp-entropy-est worse-than-random fail (VERDICT r4
weak #1 / next #2).

Both fresh esjd-era d2 Stan densities record exp-entropy-est AUC below
random beyond slack (parity_report.json, 2 fail rows). The entropy math is
oracle-verified (tests/test_entropy_mle.py: the Dutilleul MLE recovers the
true Kronecker covariance, the entropy estimate matches true MN entropy,
and it ranks correctly at the recorded S=100 lookahead budget) — so the
remaining hypotheses are:

  (a) NOISE FLOOR: the per-candidate expected-entropy differences at the
      recorded budget (base s200/w200, lookahead s100/w50) are smaller than
      the MC noise of the short per-lane chains, so the first-step map
      cannot reproduce its own candidate ranking across seeds, the pick
      sequence is effectively random, and an occasional below-random AUC is
      the expected draw — downgrade evidence (the existing
      adjudicate_noise_floor.py convention: reliable = min tau >= 0.3).
  (b) REAL ANTI-SIGNAL: the map reproduces across seeds AND both densities
      agree on it, yet it picks worse-than-random cells — a genuine engine
      (or criterion-design) property that must NOT be downgraded.

Method (compare_firsts.py:133-151 methodology, applied within one engine):
recompute the FIRST-STEP exp-entropy-est map at the recorded config for
two seeds x two densities, plus one high-budget (s400/w200) oracle map,
and report:
  - tau_seed_pair per density        (run-to-run ranking reproducibility)
  - tau_cross_density per seed       (do the two densities rank alike?)
  - tau_vs_recorded per density      (consistency with the committed digest)
  - tau_budget (s100 map vs s400 map, same seed/density): is the recorded
      budget resolving whatever structure the higher budget sees?
exp-variance maps are computed from the same base chains for the same
grid — weak #4 (variance-family cross-engine tau) gets its within-engine
reliability floor from the same probe.

Writes experiments/10x10_discrete2_d2/adjudication_entropy_est.json with
the parity-consumable fields (kind/criteria/reliable) ONLY carrying
reliable=false if the evidence actually shows the map below the floor.

Runs on CPU f32 (the recorded arms are --float32; JAX_PLATFORMS is ignored
here, force via jax.config) so it can grind while the chip queue runs.
"""

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
from amf_tpu.types import rating_bounds  # noqa: E402

EXP_DIR = "experiments/10x10_discrete2_d2"
LATENT_D = 2
SUBTRACT_MEAN = False  # the d2 Makefile runs --no-subtract-mean
NUM_SAMPS, WARMUP = 200, 200
LA_SAMPS, LA_WARMUP = 100, 50
HI_SAMPS, HI_WARMUP = 400, 200
_CUTOFFS = (3.5, 0.5, 0.0)  # stan_loop._CUTOFFS


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
    prob = prob.replace(queryable=jnp.asarray(query_on))
    vals = data.get("_rating_vals")
    if vals is None:
        vals = np.unique(real[np.isfinite(real)])
    return prob, tuple(float(v) for v in np.asarray(vals)), np.asarray(query_on)


def first_step_maps(seed, problem, vals, model, la_samps, la_warmup,
                    stats_list=("entropy-est", "total-variance")):
    """Mirror run_active_stan's first step exactly (stan_loop.py:84-160):
    PMF-MAP init, one s200/w200 chain, then the lookahead sweep."""
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
    st0, samps = bpmf_hmc.samples(ks, st0, problem, cfg, NUM_SAMPS, WARMUP)
    bounds = tuple(rating_bounds(vals))
    base = sample_stats.prediction_stats(
        samps["U"], samps["V"], st0.mean_rating, cfg.subtract_mean,
        cutoffs=_CUTOFFS, value_bounds=bounds,
    )
    out = {}
    for i, stat in enumerate(stats_list):
        k = jax.random.fold_in(key, i)
        sc = bpmf_hmc.lookahead_scores(
            k, st0, problem, cfg, base, vals, stat=stat,
            num_samps=la_samps, warmup=la_warmup,
            n_base_samples=NUM_SAMPS,
        )
        out[stat] = np.asarray(sc).reshape(n, m)
    return out


def tau(q, x, y):
    sel = q & np.isfinite(x) & np.isfinite(y)
    return float(metrics.kendall_tau(x[sel], y[sel]))


def recorded_map(digest_name, crit):
    import gzip

    try:
        with gzip.open(f"{EXP_DIR}/digest_{digest_name}.json.gz", "rt") as f:
            dg = json.load(f)
        return np.asarray(dg["criteria"][crit]["first_step_evals"], float)
    except Exception as e:
        print(f"  (no recorded map for {digest_name}/{crit}: {e})")
        return None


def main():
    problem, vals, q = load_problem()
    seeds = (100, 200)
    densities = ("w0identity", "straightforward")
    digest_of = {"w0identity": "stan", "straightforward": "stan_straightforward"}

    maps = {}
    for d in densities:
        for s in seeds:
            print(f"== maps: density={d} seed={s} (s{LA_SAMPS}/w{LA_WARMUP})",
                  flush=True)
            maps[(d, s)] = first_step_maps(
                s, problem, vals, d, LA_SAMPS, LA_WARMUP
            )
    print(f"== high-budget oracle map: w0identity seed={seeds[0]} "
          f"(s{HI_SAMPS}/w{HI_WARMUP})", flush=True)
    hi = first_step_maps(
        seeds[0], problem, vals, "w0identity", HI_SAMPS, HI_WARMUP,
        stats_list=("entropy-est",),
    )

    out = {
        "check": "exp-entropy-est first-step map reliability (NUTS, "
                 "recorded d2 config)",
        "workload": EXP_DIR,
        "config": {"num_samps": NUM_SAMPS, "warmup": WARMUP,
                   "lookahead_samps": LA_SAMPS, "lookahead_warmup": LA_WARMUP,
                   "hi_budget": [HI_SAMPS, HI_WARMUP]},
        "cells": int(q.sum()),
    }
    crit_taus = {}
    for stat, crit in (("entropy-est", "exp-entropy-est"),
                       ("total-variance", "exp-variance")):
        rows = {}
        for d in densities:
            a = maps[(d, seeds[0])][stat]
            b = maps[(d, seeds[1])][stat]
            rows[f"tau_seed_pair_{d}"] = tau(q, a, b)
            rec = recorded_map(digest_of[d], crit)
            if rec is not None:
                rows[f"tau_vs_recorded_{d}"] = tau(q, a, rec)
        for s in seeds:
            rows[f"tau_cross_density_seed{s}"] = tau(
                q, maps[(densities[0], s)][stat], maps[(densities[1], s)][stat]
            )
        rows["spread_over_cells"] = float(
            np.std(maps[("w0identity", seeds[0])][stat][q])
        )
        crit_taus[crit] = rows
    crit_taus["exp-entropy-est"]["tau_budget_s100_vs_s400"] = tau(
        q, maps[("w0identity", seeds[0])]["entropy-est"], hi["entropy-est"]
    )
    out["taus"] = crit_taus

    # verdict: a criterion is noise-floored iff its own seed-pair ranking
    # reproducibility is below the 0.3 reliability convention in BOTH
    # densities (same floor as adjudicate_noise_floor.py)
    floored = [
        crit for crit, rows in crit_taus.items()
        if max(rows["tau_seed_pair_w0identity"],
               rows["tau_seed_pair_straightforward"]) < 0.3
    ]
    out["kind"] = "stan"
    out["criteria"] = floored
    out["reliable"] = not floored
    out["verdict"] = (
        "below noise floor at recorded budget (expected-flat downgrade) "
        f"for: {floored}" if floored else
        "maps reproduce across seeds — NOT noise; the below-random AUC "
        "stands as a real criterion property at this budget"
    )
    print(json.dumps(out, indent=1), flush=True)
    with open(f"{EXP_DIR}/adjudication_entropy_est.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
