"""CLI for the NUTS BPMF active loop (the reference's Stan path).

Mirrors ``stan-bpmf/bpmf.py MainProgram`` (:644-1056): same flags (--samps,
--warmup, --lookahead-samps, --test-set, --model-init, ...), criterion keys,
and results layout. Binary data (values {-1, 1} or {0, 1}) switches the
metric to binary misclassification like the reference (:53-54, :932-942).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np


def main(argv=None):
    from amf_tpu.active.stan_loop import KEYS

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--latent-d", "-D", type=int, default=5)
    parser.add_argument("--steps", "-s", type=int, default=None)
    parser.add_argument("--samps", "-S", type=int, default=100)
    parser.add_argument("--warmup", "-W", type=int, default=None)
    parser.add_argument("--chains", type=int, default=1)
    parser.add_argument("--lookahead-samps", type=int, default=100)
    parser.add_argument("--lookahead-warmup", type=int, default=50)
    parser.add_argument("--lookahead-tile", type=int, default=256,
                        help="candidates per vmapped lookahead pass (memory bound)")
    parser.add_argument("--shard-candidates", type=int, default=0,
                        metavar="N_DEVICES",
                        help="shard lookahead candidates over an N-device mesh")
    parser.add_argument("--scan", action="store_true", default=False,
                        help="compile the whole sweep into one device "
                             "program (fast path; no PMF-MAP chain init)")
    parser.add_argument("--scan-evals", action="store_true", default=False,
                        help="with --scan: also record per-step criterion "
                             "maps in the results (steps*n*m memory)")
    parser.add_argument("--warm-adapt", action="store_true", default=False,
                        help="carry NUTS adaptation (eps + inverse mass) "
                             "between active steps: refits after the first "
                             "use --warm-warmup transitions and lookahead "
                             "lanes inherit the base chain's metric (no "
                             "reference analogue; see PARITY.md)")
    parser.add_argument("--warm-warmup", type=int, default=None,
                        help="warmup for warm-started refits "
                             "(default warmup//4, min 20)")
    parser.add_argument("--subtract-mean", action="store_true", default=True)
    parser.add_argument(
        "--no-subtract-mean", action="store_false", dest="subtract_mean"
    )
    parser.add_argument("--model-init", action="store_true", default=True,
                        help="initialize chains at a PMF MAP fit")
    parser.add_argument("--no-model-init", action="store_false",
                        dest="model_init")
    parser.add_argument(
        "--model-filename", default="bpmf_w0identity.stan",
        help="density variant, by reference .stan filename "
             "(stan-bpmf/bpmf.py:739-742): bpmf_w0identity.stan (default), "
             "bpmf.stan (general-w_0 construction, w_0 = I data), "
             "bpmf_straightforward.stan (naive centered parameterization)")
    parser.add_argument("--test-set", default="all")
    parser.add_argument("--query-new-only", action="store_true",
                        default=False,
                        help="only query cells in columns flagged by the "
                             "data file's _is_new_item vector (reference: "
                             "stan-bpmf/bpmf.py:736-737,917-919)")
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

    import jax.numpy as jnp

    from amf_tpu import types
    from amf_tpu.active.gibbs_loop import split_query_test
    from amf_tpu.active.stan_loop import run_active_stan
    from amf_tpu.data.loaders import load_npz_schema

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

    rng = np.random.default_rng(args.seed)
    query_on, test_on = split_query_test(real, ratings, args.test_set, rng)
    if "_test_on" in data:
        test_on = data["_test_on"]
        # held-out test cells must not be queryable (reference:
        # stan-bpmf/bpmf.py:915, mn_active_pmf.py:1091-1093)
        query_on = query_on & ~np.asarray(test_on, dtype=bool)
    if args.query_new_only:
        if "_is_new_item" not in data:
            sys.stderr.write("--query-new-only needs _is_new_item in the "
                             "data file\n")
            sys.exit(1)
        # zero out queries to old-item columns (stan-bpmf/bpmf.py:917-919)
        new_item = np.asarray(data["_is_new_item"], dtype=bool)
        query_on = query_on & new_item[None, :]

    dtype = jnp.float32 if args.float32 else jnp.float64
    problem = types.problem_from_ratings(ratings, real=real, test=test_on, dtype=dtype)
    problem = problem.replace(queryable=jnp.asarray(query_on))

    binary_acc = set(vals) in ({-1.0, 1.0}, {0.0, 1.0})

    model_by_file = {
        "bpmf_w0identity.stan": "w0identity",
        "bpmf.stan": "bpmf",
        "bpmf_straightforward.stan": "straightforward",
    }
    if args.model_filename not in model_by_file:
        sys.stderr.write(
            f"Unknown --model-filename {args.model_filename}; options are "
            f"{', '.join(sorted(model_by_file))}.\n"
        )
        sys.exit(1)
    model_variant = model_by_file[args.model_filename]

    if args.scan and args.warm_adapt:
        parser.error("--warm-adapt needs the host loop (the scan carry is "
                     "shape-fixed); drop --scan")
    if args.scan:
        import jax

        from amf_tpu.active import scan_loop
        from amf_tpu.models import bpmf_hmc

        cfg = bpmf_hmc.HMCConfig(
            latent_d=args.latent_d, subtract_mean=args.subtract_mean,
            model=model_variant,
        )
        n_q = int(np.asarray(problem.queryable).sum())
        n_queries = min((args.steps - 1) if args.steps else n_q, n_q)
        results = {"_real": np.asarray(real), "_rating_vals": vals or None}
        for kname in key_names:
            res, _ = scan_loop.run_stan_scan(
                problem, real, kname, n_queries,
                jax.random.PRNGKey(args.seed), cfg,
                num_samps=args.samps, warmup=args.warmup,
                rating_values=vals,
                lookahead_samps=args.lookahead_samps,
                lookahead_warmup=args.lookahead_warmup,
                lookahead_tile=args.lookahead_tile,
                binary_acc=binary_acc,
                record_evals=args.scan_evals,
            )
            recs = scan_loop.result_to_records(problem, res)
            results[kname] = recs
            if args.verbose:
                print(f"{kname}: {len(recs)} records, err "
                      f"{recs[0][1]:.4f} -> {recs[-1][1]:.4f}")
    else:
        mesh = None
        if args.shard_candidates:
            from amf_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(args.shard_candidates)

        from amf_tpu.models import bpmf_hmc

        results = run_active_stan(
            problem, real, key_names,
            latent_d=args.latent_d,
            rating_values=vals,
            subtract_mean=args.subtract_mean,
            cfg=bpmf_hmc.HMCConfig(
                latent_d=args.latent_d, subtract_mean=args.subtract_mean,
                model=model_variant,
            ),
            num_samps=args.samps,
            warmup=args.warmup,
            chains=args.chains,
            lookahead_samps=args.lookahead_samps,
            lookahead_warmup=args.lookahead_warmup,
            lookahead_tile=args.lookahead_tile,
            mesh=mesh,
            steps=args.steps,
            seed=args.seed,
            model_init_map=args.model_init,
            checkpoint_path=args.checkpoint,
            binary_acc=binary_acc,
            warm_adapt=args.warm_adapt,
            warm_warmup=args.warm_warmup,
            dtype=dtype,
            verbose=args.verbose,
        )

    if args.save_results:
        print(f"\nsaving results in '{args.save_results}'")
        results = dict(results)
        results["_kind"] = "stan"
        results["_args"] = vars(args)
        # run-time engine-era stamp (see analysis/parity.digest: the digest
        # copies this rather than the currently imported constant, so a
        # re-digest of an old-era pickle cannot be mislabeled as current)
        from amf_tpu.mcmc.nuts import SAMPLER_ERA

        results["_sampler_era"] = SAMPLER_ERA
        with open(args.save_results, "wb") as f:
            pickle.dump(results, f)


if __name__ == "__main__":
    main()
