"""CLI for the cold-start (new items) BPMF active loop.

Mirrors ``stan-bpmf/bpmf_newitems.py`` (:12-138): two-phase fit — a full
BPMF fit on old items (cacheable via --initial-fit-file) then an active loop
sampling only the new-item columns' factors. The cold-start MainProgram
inherits the FULL criterion registry of the stan path, including the
sampling lookaheads (bpmf_newitems.py:48 reusing bpmf.py:544-556).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np


KEY_CHOICES = (
    "random", "pred-variance", "exp-variance", "exp-entropy-est", "pred",
    "prob-ge-3.5", "prob-ge-.5", "prob-ge-0",
)
_MINIMIZE = ("exp-variance", "exp-entropy-est")
_CUTOFFS = (3.5, 0.5, 0.0)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--latent-d", "-D", type=int, default=5)
    parser.add_argument("--steps", "-s", type=int, default=None)
    parser.add_argument("--samps", "-S", type=int, default=100)
    parser.add_argument("--warmup", "-W", type=int, default=None)
    parser.add_argument("--lookahead-samps", type=int, default=100)
    parser.add_argument("--lookahead-warmup", type=int, default=50)
    parser.add_argument("--lookahead-tile", type=int, default=256,
                        help="candidates per vmapped lookahead pass")
    parser.add_argument("--shard-candidates", type=int, default=0,
                        metavar="N_DEVICES",
                        help="shard lookahead candidates over an N-device mesh")
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
    parser.add_argument("--checkpoint", default=None, metavar="FILE",
                        help="partial-results checkpoint for exact resume "
                             "(picks stored in new-item submatrix indices)")
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
    from amf_tpu.active.driver import Family, drive_active
    from amf_tpu.analysis import metrics
    from amf_tpu.data.loaders import load_npz_schema
    from amf_tpu.models import bpmf_hmc, newitems, sample_stats
    from amf_tpu.types import rating_bounds
    from amf_tpu.utils.checkpoint import LoopCheckpointer

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
    lookahead_keys = [k for k in key_names if k in _MINIMIZE]
    if lookahead_keys and not vals:
        sys.stderr.write(
            f"{lookahead_keys} need _rating_vals in the data file\n"
        )
        sys.exit(1)

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

    sample_fn = jax.jit(
        lambda k, st, prob: newitems.samples(
            k, st, prob, cfg, args.samps, args.warmup
        )
    )
    stats_fn = jax.jit(
        lambda samps: sample_stats.prediction_stats(
            samps["U"], samps["V"], mr, cfg.subtract_mean,
            cutoffs=_CUTOFFS, value_bounds=bounds,
        )
    )

    def lookahead_fn_factory(stat):
        def raw(k, st, prob, base, cand=None):
            return newitems.lookahead_scores(
                k, st, prob, cfg, base, vals, stat=stat,
                num_samps=args.lookahead_samps, warmup=args.lookahead_warmup,
                n_base_samples=args.samps, cand=cand,
                candidate_tile=args.lookahead_tile,
            )

        if args.shard_candidates:
            from amf_tpu.parallel.mesh import make_mesh
            from amf_tpu.parallel.sharding import sharded_candidate_scores

            mesh = make_mesh(args.shard_candidates)

            @jax.jit
            def fn(k, st, prob, base):
                run = sharded_candidate_scores(
                    lambda cand, kk: raw(kk, st, prob, base, cand=cand),
                    n * m_new, mesh,
                )
                return run(k).reshape(n, m_new)

            return fn
        return jax.jit(
            lambda k, st, prob, base: raw(k, st, prob, base).reshape(n, m_new)
        )

    lookahead_fns = {}

    def score(kname, st_pair, prob, k):
        st, stats = st_pair
        if kname == "random":
            ev = jax.random.uniform(k, (n, m_new), dtype=dtype)
        elif kname == "pred-variance":
            ev = stats.var
        elif kname == "pred":
            ev = stats.mean
        elif kname.startswith("prob-ge"):
            cutoff = {"prob-ge-3.5": 3.5, "prob-ge-.5": 0.5, "prob-ge-0": 0.0}[
                kname
            ]
            ev = stats.prob_ge[_CUTOFFS.index(cutoff)]
        else:  # exp-variance / exp-entropy-est
            stat = ("total-variance" if kname == "exp-variance"
                    else "entropy-est")
            if stat not in lookahead_fns:
                lookahead_fns[stat] = lookahead_fn_factory(stat)
            ev = lookahead_fns[stat](k, st, prob, stats)
        return (jnp.where(prob.queryable, ev, jnp.nan),
                kname not in _MINIMIZE)

    def refit(st_pair, prob, k):
        st, _ = st_pair
        st = newitems.invalidate_mode(st)
        st, samps = sample_fn(k, st, prob)
        return st, stats_fn(samps)

    st0 = newitems.init_state(prob_new0, U_mean, V_fixed, cfg, mr, dtype=dtype)
    key, ks = jax.random.split(key)
    st0, samps0 = sample_fn(ks, st0, prob_new0)
    stats0 = stats_fn(samps0)

    from amf_tpu.mcmc.nuts import SAMPLER_ERA

    ckpt = LoopCheckpointer.for_problem(
        args.checkpoint, prob_new0, real_new, every=20, era=SAMPLER_ERA
    )
    family = Family(
        nice_name=lambda kname: kname,
        score=score,
        refit=refit,
        err=lambda st_pair, prob: metrics.rmse_on(
            st_pair[1].mean, real_j, prob.test
        ),
    )
    per_key = drive_active(
        prob_new0, real_new, key_names, family, (st0, stats0), key,
        steps=args.steps, ckpt=ckpt, verbose=args.verbose,
    )

    results = {
        "_real": real,
        "_ratings": data["_ratings"],
        "_rating_vals": vals or None,
        "_is_new_item": np.asarray(is_new),
    }
    # picks are made in the new-item submatrix; report original column ids
    # like the reference (jigger_ratings inverse, bpmf_newitems.py:41-45)
    for kname, recs in per_key.items():
        results[kname] = [
            rec if rec[2] is None
            else rec[:2] + ((rec[2][0], int(new_cols[rec[2][1]])),) + rec[3:]
            for rec in recs
        ]

    if args.save_results:
        print(f"\nsaving results in '{args.save_results}'")
        results["_kind"] = "stan"
        results["_args"] = vars(args)
        results["_sampler_era"] = SAMPLER_ERA
        with open(args.save_results, "wb") as f:
            pickle.dump(results, f)


if __name__ == "__main__":
    main()
