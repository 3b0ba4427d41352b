"""CLI for the Gibbs Bayesian PMF active loop.

Mirrors the reference ``python-pmf/bayes_pmf.py main()`` (:828-938): same
flags (--latent-d, --samps, --test-set, --subtract-mean, ...), criterion
keys, data schema and results layout.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np


def main(argv=None):
    from amf_tpu.active.gibbs_loop import KEYS

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--latent-d", "-D", type=int, default=5)
    parser.add_argument("--steps", "-s", type=int, default=None)
    parser.add_argument("--discrete", action="store_true", default=None)
    parser.add_argument("--no-discrete", action="store_false", dest="discrete")
    parser.add_argument("--subtract-mean", action="store_true", default=True)
    parser.add_argument(
        "--no-subtract-mean", action="store_false", dest="subtract_mean"
    )
    parser.add_argument("--fit", default="batch")
    parser.add_argument("--samps", "-S", type=int, default=128)
    parser.add_argument("--lookahead-samps", type=int, default=30)
    parser.add_argument("--lookahead-tile", type=int, default=256,
                        help="candidates per vmapped lookahead pass (memory bound)")
    parser.add_argument("--lookahead-host-tiles", action="store_true",
                        default=False,
                        help="dispatch each lookahead tile as its own "
                             "device program from the host (bounded "
                             "program length; survives at reference "
                             "scale where the fused whole-sweep program "
                             "does not)")
    parser.add_argument("--shard-candidates", type=int, default=0,
                        metavar="N_DEVICES",
                        help="shard lookahead candidates over an N-device mesh")
    parser.add_argument("--scan-evals", action="store_true", default=False,
                        help="with --scan: also record per-step criterion "
                             "maps in the results (steps*n*m memory)")
    parser.add_argument("--scan", action="store_true", default=False,
                        help="compile the whole sweep into one device "
                             "program (fast path; use --scan-evals to also "
                             "record per-step criterion maps)")
    parser.add_argument("--test-set", default="all")
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
                        help="partial-results checkpoint for exact resume")
    parser.add_argument("keys", nargs="*",
                        help="Choices: {}.".format(", ".join(sorted(KEYS))))
    args = parser.parse_args(argv)

    key_names = args.keys or sorted(KEYS)
    for k in key_names:
        if k not in KEYS:
            sys.stderr.write(
                f"Invalid key name {k}; options are {', '.join(sorted(KEYS))}.\n"
            )
            sys.exit(1)

    from amf_tpu.utils.platform import setup as platform_setup

    platform_setup(use_x64=not args.float32)

    import jax
    import jax.numpy as jnp

    from amf_tpu import types
    from amf_tpu.active.gibbs_loop import run_active_gibbs, split_query_test
    from amf_tpu.data.loaders import load_npz_schema
    from amf_tpu.models.pmf import parse_fit_type

    if args.save_results is True:
        args.save_results = "results.pkl"
    if args.save_results:
        dirname = os.path.dirname(args.save_results)
        if dirname:
            os.makedirs(dirname, exist_ok=True)

    data = load_npz_schema(args.load_data)
    real = data["_real"]
    ratings = data["_ratings"]
    vals = tuple(data.get("_rating_vals", ())) or ()
    if args.discrete is None:
        args.discrete = bool(vals)
    if not args.discrete:
        vals = ()

    rng = np.random.default_rng(args.seed)
    query_on, test_on = split_query_test(real, ratings, args.test_set, rng)
    if "_test_on" in data:
        test_on = data["_test_on"]
        # held-out test cells must not be queryable (reference:
        # stan-bpmf/bpmf.py:915, mn_active_pmf.py:1091-1093)
        query_on = query_on & ~np.asarray(test_on, dtype=bool)

    dtype = jnp.float32 if args.float32 else jnp.float64
    problem = types.problem_from_ratings(ratings, real=real, test=test_on, dtype=dtype)
    problem = problem.replace(queryable=jnp.asarray(query_on))

    if args.scan:
        from amf_tpu.active import scan_loop
        from amf_tpu.models import bpmf_gibbs, pmf as pmf_mod

        pcfg = pmf_mod.PMFConfig(
            latent_d=args.latent_d, subtract_mean=args.subtract_mean
        )
        gcfg = bpmf_gibbs.GibbsConfig(
            latent_d=args.latent_d, subtract_mean=args.subtract_mean
        )
        n_q = int(np.asarray(problem.queryable).sum())
        n_queries = min((args.steps - 1) if args.steps else n_q, n_q)
        results = {"_real": np.asarray(real), "_rating_vals": vals or None}
        for kname in key_names:
            res, _ = scan_loop.run_gibbs_scan(
                problem, real, kname, n_queries,
                jax.random.PRNGKey(args.seed), pcfg, gcfg,
                num_samps=args.samps, rating_values=vals,
                lookahead_samps=args.lookahead_samps,
                lookahead_tile=args.lookahead_tile,
                record_evals=args.scan_evals,
            )
            recs = scan_loop.result_to_records(problem, res)
            results[kname] = recs
            if args.verbose:
                print(f"{kname}: {len(recs)} records, rmse "
                      f"{recs[0][1]:.4f} -> {recs[-1][1]:.4f}")
    else:
        mesh = None
        if args.shard_candidates:
            from amf_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(args.shard_candidates)

        # reference's DrugBank behavior: binary data switches the recorded
        # metric to misclassification (stan-bpmf/bpmf.py:53-54,932-942)
        binary_acc = set(vals) in ({-1.0, 1.0}, {0.0, 1.0})
        results = run_active_gibbs(
            problem, real, key_names,
            latent_d=args.latent_d,
            rating_values=vals,
            binary_acc=binary_acc,
            subtract_mean=args.subtract_mean,
            num_samps=args.samps,
            lookahead_samps=args.lookahead_samps,
            lookahead_tile=args.lookahead_tile,
            lookahead_host_tiles=args.lookahead_host_tiles,
            mesh=mesh,
            steps=args.steps,
            seed=args.seed,
            fit_type=parse_fit_type(args.fit),
            checkpoint_path=args.checkpoint,
            dtype=dtype,
            verbose=args.verbose,
        )

    if args.save_results:
        print(f"\nsaving results in '{args.save_results}'")
        results = dict(results)
        results["_kind"] = "bayes"
        results["_args"] = vars(args)
        with open(args.save_results, "wb") as f:
            pickle.dump(results, f)


if __name__ == "__main__":
    main()
