"""Noise-floor adjudication of the 75k stan `pred` arm (VERDICT r3 weak #8:
err 1.325 -> 1.342 with AUC 265.0 vs random 263.9 — soft-band regime).

`pred` is the pure-exploitation criterion (|predicted rating| magnitude,
active_pmf.py:416 / stan-bpmf KEYS): its map is the posterior-mean
prediction. Question: at the recorded budget (s200/w100, d=20, 472x781) is
that ranking reproducible, or is the mild degradation the expected walk of
a map below its own reliability floor?

Method (same as scripts/adjudicate_noise_floor.py, the reference's
compare_firsts methodology within one engine): two independent NUTS runs at
the recorded config; report split-half tau (first vs second half of one
chain's prediction means) and seed-pair tau of the full-map ranking over
queryable cells. reliable=false (min tau < 0.3) downgrades strict fails for
`pred` via analysis/parity.load_adjudications.

Chip job (two s200 NUTS runs at 472x781 d20): run from the queue.
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

from amf_tpu import types
from amf_tpu.active.gibbs_loop import split_query_test
from amf_tpu.analysis import metrics
from amf_tpu.data.loaders import load_npz_schema
from amf_tpu.models import bpmf_hmc, pmf

EXP = "experiments/movielens-75k-from5pct-test5pct"
D, SAMPS, WARMUP = 20, 200, 100


def pred_maps(seed, problem):
    cfg = bpmf_hmc.HMCConfig(latent_d=D, subtract_mean=True)
    n, m = problem.shape
    key = jax.random.PRNGKey(seed)
    pcfg = pmf.PMFConfig(latent_d=D, subtract_mean=True)
    pst = pmf.init_state(jax.random.fold_in(key, 1), n, m, pcfg, problem,
                         dtype=jnp.float32)
    pst, _ = pmf.fit(pst, problem, pcfg)
    st = bpmf_hmc.init_state(problem, cfg, U=pst.U, V=pst.V,
                             dtype=jnp.float32)
    st, samps = jax.jit(
        lambda k, s, p: bpmf_hmc.samples(k, s, p, cfg, SAMPS, WARMUP)
    )(jax.random.fold_in(key, 2), st, problem)
    U, V = samps["U"], samps["V"]
    preds = jnp.einsum("sid,sjd->sij", U, V) + st.mean_rating
    h = SAMPS // 2
    # `pred` scores = |mean prediction| (exploitation magnitude)
    m1 = jnp.abs(preds[:h].mean(0))
    m2 = jnp.abs(preds[h:].mean(0))
    mf = jnp.abs(preds.mean(0))
    return np.asarray(m1), np.asarray(m2), np.asarray(mf)


def main():
    data = load_npz_schema(f"{EXP}/data.npz")
    real, ratings = data["_real"], data["_ratings"]
    rng = np.random.default_rng(0)
    query_on, _ = split_query_test(real, ratings, "all", rng)
    test_on = np.asarray(data["_test_on"], bool)
    query_on = query_on & ~test_on
    prob = types.problem_from_ratings(
        ratings, real=real, test=test_on, dtype=jnp.float32)
    prob = prob.replace(queryable=jnp.asarray(query_on))

    a1, a2, af = pred_maps(100, prob)
    b1, b2, bf = pred_maps(200, prob)
    q = np.asarray(query_on)

    def tau(x, y):
        sel = q & np.isfinite(x) & np.isfinite(y)
        return float(metrics.kendall_tau(x[sel], y[sel]))

    out = {
        "check": "pred map reliability (NUTS, recorded 75k config)",
        "workload": EXP,
        "num_samps": SAMPS,
        "cells": int(q.sum()),
        "tau_split_half_seedA": tau(a1, a2),
        "tau_split_half_seedB": tau(b1, b2),
        "tau_seed_pair": tau(af, bf),
        "kind": "stan",
        "criteria": ["pred"],
    }
    out["reliable"] = min(
        out["tau_split_half_seedA"], out["tau_split_half_seedB"],
        out["tau_seed_pair"],
    ) >= 0.3
    print(json.dumps(out), flush=True)
    with open(f"{EXP}/adjudication_noise_floor_pred.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
