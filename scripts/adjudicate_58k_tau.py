"""Adjudication evidence for the 58k-15d stan pred-variance regression
(VERDICT r2 'What's weak' #1): is the criterion computed consistently
across engines on this data?

Runs ONE fresh NUTS sampling round on the recorded 58k data, computes the
stan pred-variance map, and reports Kendall tau against the Gibbs engine's
recorded first-step pred-variance map (the reference's own strongest
correctness methodology, compare_firsts.py:133-151). Writes
experiments/movielens-58k-from5pct-test5pct-15d/adjudication_tau.json.
"""
import gzip
import json

import numpy as np
import jax
import jax.numpy as jnp

from amf_tpu import types
from amf_tpu.active.gibbs_loop import split_query_test
from amf_tpu.analysis import metrics
from amf_tpu.data.loaders import load_npz_schema
from amf_tpu.models import bpmf_hmc, sample_stats

EXP = "experiments/movielens-58k-from5pct-test5pct-15d"

data = load_npz_schema(f"{EXP}/data.npz")
real, ratings = data["_real"], data["_ratings"]
vals = tuple(float(v) for v in data.get("_rating_vals", ()))
rng = np.random.default_rng(0)
query_on, test_on = split_query_test(real, ratings, "all", rng)
test_on = data["_test_on"]
query_on = query_on & ~np.asarray(test_on, bool)
prob = types.problem_from_ratings(
    ratings, real=real, test=test_on, dtype=jnp.float32)
prob = prob.replace(queryable=jnp.asarray(query_on))

cfg = bpmf_hmc.HMCConfig(latent_d=15, subtract_mean=True)
st = bpmf_hmc.init_state(prob, cfg, dtype=jnp.float32)
st, samps = bpmf_hmc.samples(jax.random.PRNGKey(0), st, prob, cfg, 200, 100)
stats = sample_stats.prediction_stats(
    samps["U"], samps["V"], st.mean_rating, cfg.subtract_mean)
stan_pv = np.asarray(stats.var)

with gzip.open(f"{EXP}/digest_bayes.json.gz", "rt") as f:
    dg = json.load(f)
bayes_pv = np.asarray(
    dg["criteria"]["pred-variance"]["first_step_evals"], float)

q = np.asarray(query_on)
sel = q & np.isfinite(bayes_pv) & np.isfinite(stan_pv)
tau = metrics.kendall_tau(stan_pv[sel], bayes_pv[sel])
out = {
    "check": "stan~bayes pred-variance first-step tau (58k-15d)",
    "tau": float(tau),
    "cells": int(sel.sum()),
    "stan_sampler": "fresh NUTS s200/w100 on the recorded data.npz",
    "bayes_map": "recorded digest first_step_evals",
}
print(json.dumps(out))
with open(f"{EXP}/adjudication_tau.json", "w") as f:
    json.dump(out, f, indent=1)
