"""Active-learning loop for the NUTS BPMF model (the Stan-path equivalent).

Capability parity with the reference's ``stan-bpmf/bpmf.py`` KEYS registry
(:545-556) and ``MainProgram``/``full_test`` drivers (:559-1056): sample-based
criteria including the matrix-normal ``exp-entropy-est``, sampled-mode warm
starts between active steps, binary-misclassification metric for binary data.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from amf_tpu.analysis import metrics
from amf_tpu.models import bpmf_hmc, pmf, sample_stats
from amf_tpu.types import Problem, rating_bounds, ratings_array


class StanKey(NamedTuple):
    nice_name: str
    kind: str
    choose_max: bool
    cutoff: Optional[float] = None


# reference: stan-bpmf/bpmf.KEYS :545-556
KEYS = {
    "random": StanKey("Random", "random", True),
    "pred-variance": StanKey("Var[R_ij]", "pred-variance", True),
    "exp-variance": StanKey("E[Var[R]]", "exp-variance", False),
    "exp-entropy-est": StanKey("E[H[R]]", "exp-entropy-est", False),
    "pred": StanKey("Pred", "pred", True),
    "prob-ge-3.5": StanKey("Prob >= 3.5", "prob-ge", True, 3.5),
    "prob-ge-.5": StanKey("Prob >= .5", "prob-ge", True, 0.5),
    "prob-ge-0": StanKey("Prob >= 0", "prob-ge", True, 0.0),
}

_CUTOFFS = (3.5, 0.5, 0.0)


def run_active_stan(
    problem: Problem,
    real: np.ndarray,
    key_names: Sequence[str],
    latent_d: int = 5,
    rating_values: Tuple[float, ...] = (),
    subtract_mean: bool = True,
    num_samps: int = 100,
    warmup: Optional[int] = None,
    chains: int = 1,
    lookahead_samps: int = 30,
    lookahead_warmup: int = 15,
    lookahead_tile: int = 0,
    steps: Optional[int] = None,
    seed: int = 0,
    model_init_map: bool = True,
    binary_acc: bool = False,
    warm_adapt: bool = False,
    warm_warmup: Optional[int] = None,
    cfg: Optional[bpmf_hmc.HMCConfig] = None,
    mesh=None,  # jax.sharding.Mesh: shard lookahead candidates over devices
    dtype=jnp.float64,
    verbose: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 20,
) -> Dict[str, object]:
    """Multi-criterion NUTS-BPMF active loop (reference: do_work :946-1025).

    binary_acc: report binary misclassification instead of RMSE (the
    reference's DrugBank metric, stan-bpmf/bpmf.py:53-54, picked via data
    values in MainProgram).

    warm_adapt: carry NUTS adaptation (eps anchor + diagonal inverse mass)
    between active steps; refits after the first drop to ``warm_warmup``
    warmup transitions (default warmup // 4, min 20), and lookahead lanes
    inherit the base chain's metric, skipping their per-lane
    reasonable-eps search. Deliberate extension over the reference's
    full-warmup-per-step (stan-bpmf/bpmf.py:310-314); see PARITY.md.
    """
    for k in key_names:
        if k not in KEYS:
            raise ValueError(f"unknown stan criterion {k!r}")
    n, m = problem.shape
    problem = jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        problem,
    )
    cfg = cfg or bpmf_hmc.HMCConfig(latent_d=latent_d, subtract_mean=subtract_mean)
    warmup = num_samps // 2 if warmup is None else warmup

    vals = tuple(sorted(rating_values)) if rating_values else ()
    bounds = tuple(rating_bounds(vals)) if vals else None

    key = jax.random.PRNGKey(seed)
    real_j = jnp.asarray(real, dtype=dtype)

    # optional PMF MAP warm start (reference: initialize_bpmf :827-865)
    key, kinit = jax.random.split(key)
    U0 = V0 = None
    if model_init_map:
        pcfg = pmf.PMFConfig(latent_d=latent_d, subtract_mean=subtract_mean)
        pst = pmf.init_state(kinit, n, m, pcfg, problem, dtype=dtype)
        pst, _ = pmf.fit(pst, problem, pcfg)
        U0, V0 = pst.U, pst.V

    if warm_adapt and warm_warmup is None:
        warm_warmup = max(warmup // 4, 20)
    sample_fn = jax.jit(
        lambda k, st, prob: bpmf_hmc.samples(
            k, st, prob, cfg, num_samps, warmup, chains=chains,
            carry_adapt=warm_adapt, warm_warmup=warm_warmup,
            # the candidate mesh doubles as the chain mesh when chains
            # divide over it (the reference's process-parallel Stan chains)
            chain_mesh=(mesh if chains > 1 and mesh is not None
                        and chains % mesh.devices.size == 0 else None),
        )
    )
    stats_fn = jax.jit(
        lambda samps, mr: sample_stats.prediction_stats(
            samps["U"], samps["V"], mr, cfg.subtract_mean,
            cutoffs=_CUTOFFS, value_bounds=bounds,
        )
    )

    def lookahead_fn_factory(stat):
        if mesh is not None:
            # candidates sharded over the mesh (the reference's pool.map hot
            # loop, stan-bpmf/bpmf.py:456-459); global-index lane keys keep
            # this equal to the unsharded path to tolerance
            from amf_tpu.parallel.sharding import sharded_candidate_scores

            @jax.jit
            def fn(k, st, prob, base):
                def score_flat(cand, kk):
                    return bpmf_hmc.lookahead_scores(
                        kk, st, prob, cfg, base, vals, stat=stat,
                        num_samps=lookahead_samps, warmup=lookahead_warmup,
                        n_base_samples=num_samps, cand=cand,
                        candidate_tile=lookahead_tile,
                    )

                run = sharded_candidate_scores(score_flat, n * m, mesh)
                return run(k).reshape(n, m)

            return fn
        return jax.jit(
            lambda k, st, prob, base: bpmf_hmc.lookahead_scores(
                k, st, prob, cfg, base, vals, stat=stat,
                num_samps=lookahead_samps, warmup=lookahead_warmup,
                n_base_samples=num_samps, candidate_tile=lookahead_tile,
            ).reshape(n, m)
        )

    lookahead_fns = {}

    def err_of(stats, prob):
        if binary_acc:
            return float(
                metrics.binary_misclassification(stats.mean, real_j, prob.test)
            )
        return float(metrics.rmse_on(stats.mean, real_j, prob.test))

    st0 = bpmf_hmc.init_state(problem, cfg, U=U0, V=V0, dtype=dtype)
    key, ks = jax.random.split(key)
    st0, samps0 = sample_fn(ks, st0, problem)
    stats0 = stats_fn(samps0, st0.mean_rating)

    results: Dict[str, object] = {
        "_real": np.asarray(real),
        "_ratings": ratings_array(problem),
        "_rating_vals": vals or None,
    }

    def evals_for(kname, st, stats, prob, k):
        spec = KEYS[kname]
        if spec.kind == "random":
            ev = jax.random.uniform(k, (n, m), dtype=dtype)
        elif spec.kind == "pred-variance":
            ev = stats.var
        elif spec.kind == "pred":
            ev = stats.mean
        elif spec.kind == "prob-ge":
            ev = stats.prob_ge[_CUTOFFS.index(spec.cutoff)]
        elif spec.kind in ("exp-variance", "exp-entropy-est"):
            stat = "total-variance" if spec.kind == "exp-variance" else "entropy-est"
            if stat not in lookahead_fns:
                lookahead_fns[stat] = lookahead_fn_factory(stat)
            ev = lookahead_fns[stat](k, st, prob, stats)
        else:
            raise ValueError(spec.kind)
        return jnp.where(prob.queryable, ev, jnp.nan)

    from amf_tpu.active.driver import Family, drive_active
    from amf_tpu.utils.checkpoint import LoopCheckpointer

    from amf_tpu.mcmc.nuts import SAMPLER_ERA

    ckpt = LoopCheckpointer.for_problem(
        checkpoint_path, problem, real, every=checkpoint_every,
        era=SAMPLER_ERA,
    )

    def refit(st_pair, prob, k):
        st, _ = st_pair
        st = bpmf_hmc.invalidate_mode(st, prob)
        st, samps = sample_fn(k, st, prob)
        if verbose:
            # sampler-quality diagnostics on the joint log-density trace
            # (the quantity Stan's own console reported; SURVEY.md §5.1)
            lp = np.asarray(samps["lp__"]).reshape(chains, -1)
            print(f"    [nuts] lp__ split-Rhat {metrics.split_rhat(lp):.3f}, "
                  f"ESS {metrics.ess(lp):.0f}/{lp.size}")
        return st, stats_fn(samps, st.mean_rating)

    family = Family(
        nice_name=lambda kname: KEYS[kname].nice_name,
        score=lambda kname, st, prob, k: (
            evals_for(kname, st[0], st[1], prob, k), KEYS[kname].choose_max
        ),
        refit=refit,
        err=lambda st, prob: err_of(st[1], prob),
    )
    results.update(
        drive_active(problem, real, key_names, family, (st0, stats0), key,
                     steps=steps, ckpt=ckpt, verbose=verbose)
    )
    return results
