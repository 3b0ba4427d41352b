"""Noise-floor adjudication for the two pred-variance regressions
(VERDICT r2 'What's weak' #1: 58k-15d stan pred-variance err rises;
drugbank-70x306 pred-variance AUC slightly worse than random).

Question: is the pred-variance criterion *map* at these scales a real
signal (an engine could be mis-ranking cells) or Monte-Carlo noise from
the finite sample chain (in which case selection is effectively random
and flat/slightly-worse curves are the expected pathology, matching the
reference's own shallow ML-100k curves)?

Method (reference's own strongest methodology, compare_firsts.py:133-151,
applied within one engine): for each workload run TWO independent Gibbs
chains (different seeds) at the recorded config, keep per-sample
predictions, and report Kendall tau over queryable cells for
  - split-half: var(first half of chain) vs var(second half), same seed —
    the reliability ceiling of the recorded criterion map itself;
  - seed-pair: var(full chain, seed A) vs var(full chain, seed B) —
    run-to-run reproducibility of the ranking;
  - vs-recorded: var(full chain, seed A) vs the digest's recorded
    first-step map (engine self-consistency).
If split-half tau is near 0, the map cannot rank cells better than chance
at this sample budget and the learning-curve regressions are noise-floor
pathologies, not bugs. Writes adjudication_noise_floor.json per workload.

Run on CPU (f32): JAX_PLATFORMS ignored here; we force via jax.config.
The `expvar` probe (exp-variance lookahead map, 20k candidates x 30-sample
chains) runs on the default backend (the TPU chip) instead — it is a full
lookahead sweep step and takes hours on CPU.
"""
import gzip
import json
import sys

import numpy as np

import jax

if "expvar" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from amf_tpu import types  # noqa: E402
from amf_tpu.active.gibbs_loop import split_query_test  # noqa: E402
from amf_tpu.analysis import metrics  # noqa: E402
from amf_tpu.data.loaders import load_npz_schema  # noqa: E402
from amf_tpu.models import bpmf_gibbs, pmf  # noqa: E402


def variance_maps(key, problem, latent_d, num_samps, dtype=jnp.float32):
    """MAP fit + one Gibbs chain; return (var_half1, var_half2, var_full)."""
    n, m = problem.shape
    pcfg = pmf.PMFConfig(latent_d=latent_d, subtract_mean=True)
    gcfg = bpmf_gibbs.GibbsConfig(latent_d=latent_d, subtract_mean=True)
    pst = pmf.init_state(jax.random.fold_in(key, 1), n, m, pcfg, problem,
                         dtype=dtype)
    pst = pmf.do_fit(pst, problem, pcfg, fit_type=("batch",), key=key)
    chain = bpmf_gibbs.init_chain(pst)
    _, _, samples = bpmf_gibbs.run_chain(
        jax.random.fold_in(key, 2), chain, problem, gcfg, num_samps,
        keep_samples=True)
    U, V = samples  # (S, n, d), (S, m, d)
    preds = jnp.einsum("sid,sjd->sij", U, V) + pst.mean_rating
    h = num_samps // 2
    v1 = jnp.var(preds[:h], axis=0)
    v2 = jnp.var(preds[h:], axis=0)
    vf = jnp.var(preds, axis=0)
    return (np.asarray(v1), np.asarray(v2), np.asarray(vf))


def adjudicate(exp_dir, latent_d, num_samps):
    prob, _, query_on = _load_problem(exp_dir)

    a1, a2, af = variance_maps(jax.random.PRNGKey(100), prob, latent_d,
                               num_samps)
    b1, b2, bf = variance_maps(jax.random.PRNGKey(200), prob, latent_d,
                               num_samps)

    q = np.asarray(query_on)

    def tau(x, y):
        sel = q & np.isfinite(x) & np.isfinite(y)
        return float(metrics.kendall_tau(x[sel], y[sel]))

    out = {
        "check": "pred-variance map reliability (Gibbs, recorded config)",
        "workload": exp_dir,
        "num_samps": num_samps,
        "cells": int(q.sum()),
        "tau_split_half_seedA": tau(a1, a2),
        "tau_split_half_seedB": tau(b1, b2),
        "tau_seed_pair": tau(af, bf),
        "spread_over_cells": float(np.std(af[q])),
        "mean_abs_half_diff": float(np.mean(np.abs(a1 - a2)[q])),
    }
    # normalized fields consumed by analysis/parity.py (noise-floor
    # downgrade of strict acceptance bands): a criterion map whose own
    # split-half / seed-pair rank agreement is < 0.3 cannot rank candidates
    # at the recorded budget, so flat learning curves are the expected
    # pathology there, not a defect
    out["kind"] = "bayes"
    out["criteria"] = ["pred-variance"]
    out["reliable"] = min(
        out["tau_split_half_seedA"], out["tau_split_half_seedB"],
        out["tau_seed_pair"],
    ) >= 0.3
    try:
        with gzip.open(f"{exp_dir}/digest_bayes.json.gz", "rt") as f:
            dg = json.load(f)
        rec = np.asarray(
            dg["criteria"]["pred-variance"]["first_step_evals"], float)
        out["tau_vs_recorded"] = tau(af, rec)
    except Exception as e:  # digest may lack maps
        out["tau_vs_recorded"] = None
        out["recorded_note"] = str(e)
    print(json.dumps(out), flush=True)
    with open(f"{exp_dir}/adjudication_noise_floor.json", "w") as f:
        json.dump(out, f, indent=1)
    return out


def _load_problem(exp_dir):
    data = load_npz_schema(f"{exp_dir}/data.npz")
    real, ratings = data["_real"], data["_ratings"]
    rng = np.random.default_rng(0)
    query_on, _ = split_query_test(real, ratings, "all", rng)
    test_on = np.asarray(data["_test_on"], bool)
    query_on = query_on & ~test_on
    prob = types.problem_from_ratings(
        ratings, real=real, test=test_on, dtype=jnp.float32)
    prob = prob.replace(queryable=jnp.asarray(query_on))
    vals = data.get("_rating_vals")
    if vals is None:
        vals = np.unique(real[np.isfinite(real) & (real != 0)])
    return prob, tuple(float(v) for v in np.asarray(vals)), query_on


def exp_variance_map(key, problem, latent_d, vals, num_samps, la_samps,
                     tile=256):
    """One seed's full exp-variance lookahead map at the recorded config
    (host-tiled like the recorded run, gibbs_loop.py lookahead_host_tiles)."""
    n, m = problem.shape
    pcfg = pmf.PMFConfig(latent_d=latent_d, subtract_mean=True)
    gcfg = bpmf_gibbs.GibbsConfig(latent_d=latent_d, subtract_mean=True)
    pst = pmf.init_state(jax.random.fold_in(key, 1), n, m, pcfg, problem,
                         dtype=jnp.float32)
    pst = pmf.do_fit(pst, problem, pcfg, fit_type=("batch",), key=key)
    chain = bpmf_gibbs.init_chain(pst)
    bounds = tuple(types.rating_bounds(vals))
    _, stats, _ = bpmf_gibbs.run_chain(
        jax.random.fold_in(key, 2), chain, problem, gcfg, num_samps,
        value_bounds=bounds)
    q = np.nonzero(np.asarray(problem.queryable).ravel())[0]
    scores = np.full(n * m, np.nan, np.float32)
    for s in range(0, len(q), tile):
        cand = jnp.asarray(q[s:s + tile], jnp.int32)
        sc = bpmf_gibbs.exp_variance_scores(
            jax.random.fold_in(key, 3), pst, problem, pcfg, gcfg, stats,
            vals, num_samps=la_samps, cand=cand, n_base_samples=num_samps)
        scores[q[s:s + tile]] = np.asarray(sc)
    return scores


def adjudicate_expvar(exp_dir, latent_d, num_samps, la_samps):
    """Seed-pair rank reproducibility of the full exp-variance map at the
    recorded lookahead budget (two independent MAP+chain+sweep runs)."""
    prob, vals, query_on = _load_problem(exp_dir)
    a = exp_variance_map(jax.random.PRNGKey(100), prob, latent_d, vals,
                         num_samps, la_samps)
    b = exp_variance_map(jax.random.PRNGKey(200), prob, latent_d, vals,
                         num_samps, la_samps)
    q = np.asarray(query_on).ravel()
    sel = q & np.isfinite(a) & np.isfinite(b)
    tau = float(metrics.kendall_tau(a[sel], b[sel]))
    out = {
        "check": "exp-variance lookahead map reliability (Gibbs, recorded "
                 "config)",
        "workload": exp_dir,
        "num_samps": num_samps,
        "lookahead_samps": la_samps,
        "cells": int(sel.sum()),
        "tau_seed_pair": tau,
        "spread_over_cells": float(np.std(a[sel])),
        "kind": "bayes",
        "criteria": ["exp-variance"],
        "reliable": tau >= 0.3,
    }
    print(json.dumps(out), flush=True)
    with open(f"{exp_dir}/adjudication_noise_floor_expvar.json", "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    which = sys.argv[1:] or ["db70", "58k"]
    if "db70" in which:
        adjudicate("experiments/drugbank-70x306-gibbs", 20, 128)
    if "58k" in which:
        adjudicate("experiments/movielens-58k-from5pct-test5pct-15d", 15, 128)
    if "expvar" in which:
        adjudicate_expvar("experiments/drugbank-70x306-gibbs", 20, 128, 30)
