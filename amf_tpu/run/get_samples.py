"""CLI: dump Gibbs factor samples after a MAP fit.

Mirrors the reference ``get_samples.py`` (:45-63): fit the MAP estimate
(optionally by minibatch SGD) then run the Gibbs chain, saving the sampled
U, V factors for offline analysis.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--load-data", required=True)
    parser.add_argument("--latent-d", "-D", type=int, default=5)
    parser.add_argument("--samps", "-S", type=int, default=2000)
    parser.add_argument("--fit", default="batch",
                        help="fit type, e.g. 'batch' or 'mini-valid,100,50'")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--float32", action="store_true")
    parser.add_argument("--out", default="samples.npz")
    args = parser.parse_args(argv)

    from amf_tpu.utils.platform import setup as platform_setup

    platform_setup(use_x64=not args.float32)

    import jax
    import jax.numpy as jnp

    from amf_tpu import types
    from amf_tpu.data.loaders import load_npz_schema
    from amf_tpu.models import bpmf_gibbs, pmf

    data = load_npz_schema(args.load_data)
    real = data["_real"]
    dtype = jnp.float32 if args.float32 else jnp.float64
    prob = types.problem_from_ratings(data["_ratings"], real=real, dtype=dtype)
    n, m = prob.shape

    cfg = pmf.PMFConfig(latent_d=args.latent_d, subtract_mean=True)
    key = jax.random.PRNGKey(args.seed)
    st = pmf.init_state(key, n, m, cfg, prob, dtype=dtype)
    st = pmf.do_fit(st, prob, cfg, fit_type=pmf.parse_fit_type(args.fit), key=key)
    print(f"MAP fit done; ll = {float(pmf.log_likelihood(st, prob, cfg)):.2f}")

    gcfg = bpmf_gibbs.GibbsConfig(latent_d=args.latent_d, subtract_mean=True)
    chain = bpmf_gibbs.init_chain(st)
    _, stats, samples = bpmf_gibbs.run_chain(
        jax.random.fold_in(key, 1), chain, prob, gcfg, args.samps,
        keep_samples=True,
    )
    U, V = samples
    np.savez_compressed(
        args.out, U=np.asarray(U), V=np.asarray(V),
        mean_rating=float(chain.mean_rating),
    )
    print(f"wrote {args.out}: U {U.shape}, V {V.shape}")


if __name__ == "__main__":
    main()
