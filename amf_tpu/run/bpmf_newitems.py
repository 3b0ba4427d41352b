"""CLI for the cold-start (new items) BPMF active loop.

Mirrors ``stan-bpmf/bpmf_newitems.py`` (:12-138): two-phase fit — a full
BPMF fit on old items (cacheable via --initial-fit-file) then an active loop
sampling only the new-item columns' factors.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np


KEY_CHOICES = ("random", "pred-variance", "pred", "prob-ge-3.5", "prob-ge-.5")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--latent-d", "-D", type=int, default=5)
    parser.add_argument("--steps", "-s", type=int, default=None)
    parser.add_argument("--samps", "-S", type=int, default=100)
    parser.add_argument("--warmup", "-W", type=int, default=None)
    parser.add_argument("--initial-fit-samps", type=int, default=200)
    parser.add_argument("--initial-fit-file", default=None,
                        help="cache the phase-1 posterior means here (.npz)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--float32", action="store_true")
    parser.add_argument("--verbose", action="store_true", default=True)
    parser.add_argument("--no-verbose", action="store_false", dest="verbose")
    parser.add_argument("--load-data", required=True, metavar="FILE")
    parser.add_argument("--save-results", nargs="?", default=True, const=True,
                        metavar="FILE")
    parser.add_argument("--no-save-results", action="store_false",
                        dest="save_results")
    parser.add_argument("--note", action="append")
    parser.add_argument("keys", nargs="*",
                        help="Choices: {}.".format(", ".join(KEY_CHOICES)))
    args = parser.parse_args(argv)

    key_names = args.keys or list(KEY_CHOICES)
    for k in key_names:
        if k not in KEY_CHOICES:
            sys.stderr.write(
                f"Invalid key name {k}; options are {', '.join(KEY_CHOICES)}.\n"
            )
            sys.exit(1)

    from amf_tpu.utils.platform import setup as platform_setup

    platform_setup(use_x64=not args.float32)

    import jax
    import jax.numpy as jnp

    from amf_tpu import types
    from amf_tpu.analysis import metrics
    from amf_tpu.data.loaders import load_npz_schema
    from amf_tpu.models import bpmf_hmc, newitems, sample_stats
    from amf_tpu.types import rating_bounds, ratings_array
    from amf_tpu.utils.rng import fold_in_name

    if args.save_results is True:
        args.save_results = "results.pkl"
    if args.save_results:
        dirname = os.path.dirname(args.save_results)
        if dirname:
            os.makedirs(dirname, exist_ok=True)

    data = load_npz_schema(args.load_data)
    real = data["_real"]
    if "_is_new_item" not in data:
        sys.stderr.write("data file has no _is_new_item array\n")
        sys.exit(1)
    is_new = data["_is_new_item"]
    vals = tuple(data.get("_rating_vals", ())) or ()

    dtype = jnp.float32 if args.float32 else jnp.float64
    problem = types.problem_from_ratings(
        data["_ratings"], real=real, test=data.get("_test_on"), dtype=dtype
    )

    cfg = bpmf_hmc.HMCConfig(latent_d=args.latent_d)
    key = jax.random.PRNGKey(args.seed)

    # ---- phase 1 (cacheable; reference: bpmf_newitems.py:79-101)
    if args.initial_fit_file and os.path.exists(args.initial_fit_file):
        cached = np.load(args.initial_fit_file)
        U_mean = jnp.asarray(cached["U"], dtype)
        V_fixed = jnp.asarray(cached["V_fixed"], dtype)
        mr = jnp.asarray(cached["mean_rating"], dtype)
        print(f"loaded initial fit from {args.initial_fit_file}")
    else:
        print("running initial full fit on old items...")
        key, kfit = jax.random.split(key)
        U_mean, V_fixed, mr = newitems.initial_full_fit(
            kfit, problem, is_new, cfg,
            num_samps=args.initial_fit_samps, dtype=dtype,
        )
        if args.initial_fit_file:
            np.savez(
                args.initial_fit_file,
                U=np.asarray(U_mean), V_fixed=np.asarray(V_fixed),
                mean_rating=np.asarray(mr),
            )

    new_cols = np.nonzero(np.asarray(is_new, bool))[0]
    prob_new0 = types.Problem(
        R_obs=problem.R_obs[:, new_cols],
        rated=problem.rated[:, new_cols],
        queryable=problem.queryable[:, new_cols],
        test=problem.test[:, new_cols],
    )
    real_new = real[:, new_cols]
    real_j = jnp.asarray(real_new, dtype)
    n, m_new = prob_new0.shape
    bounds = tuple(rating_bounds(vals)) if vals else None
    cutoffs = (3.5, 0.5)

    sample_fn = jax.jit(
        lambda k, st, prob: newitems.samples(
            k, st, prob, cfg, args.samps, args.warmup
        )
    )
    stats_fn = jax.jit(
        lambda samps: sample_stats.prediction_stats(
            samps["U"], samps["V"], mr, cfg.subtract_mean,
            cutoffs=cutoffs, value_bounds=bounds,
        )
    )

    st0 = newitems.init_state(prob_new0, U_mean, V_fixed, cfg, mr, dtype=dtype)
    key, ks = jax.random.split(key)
    st0, samps0 = sample_fn(ks, st0, prob_new0)
    stats0 = stats_fn(samps0)

    results = {
        "_real": real,
        "_ratings": data["_ratings"],
        "_rating_vals": vals or None,
        "_is_new_item": np.asarray(is_new),
    }

    for kname in key_names:
        prob_k, st_k, stats_k = prob_new0, st0, stats0
        kloop = fold_in_name(key, kname)
        err0 = float(metrics.rmse_on(stats_k.mean, real_j, prob_k.test))
        records = [(int(prob_k.n_rated), err0, None, None)]
        max_steps = args.steps if args.steps is not None else n * m_new

        while bool(prob_k.queryable.any()) and len(records) < max_steps:
            kloop, kev, ksamp = jax.random.split(kloop, 3)
            if kname == "random":
                ev = jax.random.uniform(kev, (n, m_new), dtype=dtype)
            elif kname == "pred-variance":
                ev = stats_k.var
            elif kname == "pred":
                ev = stats_k.mean
            elif kname == "prob-ge-3.5":
                ev = stats_k.prob_ge[0]
            else:
                ev = stats_k.prob_ge[1]
            masked = jnp.where(prob_k.queryable, ev, -jnp.inf)
            flat = int(jnp.argmax(masked))
            i, j = flat // m_new, flat % m_new
            prob_k = prob_k.add_rating(i, j, float(real_new[i, j]))
            st_k = newitems.invalidate_mode(st_k)
            st_k, samps = sample_fn(ksamp, st_k, prob_k)
            stats_k = stats_fn(samps)
            err = float(metrics.rmse_on(stats_k.mean, real_j, prob_k.test))
            records.append(
                (int(prob_k.n_rated), err, (i, int(new_cols[j])), np.asarray(ev))
            )
            if args.verbose:
                print(f"{kname:<16} step {len(records)-1}: "
                      f"({i},{int(new_cols[j])}) rmse {err:.5f}")
        results[kname] = records

    if args.save_results:
        print(f"\nsaving results in '{args.save_results}'")
        results["_kind"] = "stan"
        results["_args"] = vars(args)
        with open(args.save_results, "wb") as f:
            pickle.dump(results, f)


if __name__ == "__main__":
    main()
