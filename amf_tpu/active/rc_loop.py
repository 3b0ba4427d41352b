"""RatingConcentration active-learning loop.

Capability parity with the reference's MATLAB driver
(ratingconcentration/evaluate_active.m:1-83) and Python bridge (active_rc.py):
fit, per-selector query loop with warm-started multiplier refits, RMSE of
expected ratings (or argmax-P in pred_mode) against the full matrix.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from amf_tpu.models import ratingconc as rc
from amf_tpu.types import Problem


def run_active_rc(
    problem: Problem,
    real: np.ndarray,
    key_names: Sequence[str],
    delta: float = 1.5,
    rating_values=None,
    steps: Optional[int] = None,
    seed: int = 0,
    pred_mode: bool = False,
    lookahead_iters: int = 60,
    lookahead_tile: int = 0,
    max_iters: int = 500,
    mesh=None,  # jax.sharding.Mesh: shard lookahead candidates over devices
    dtype=jnp.float64,
    verbose: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 20,
) -> Dict[str, object]:
    for k in key_names:
        if k not in rc.RC_KEYS:
            raise ValueError(f"unknown RC selector {k!r}")
    n, m = problem.shape
    if rating_values is None:
        vals = sorted(set(np.asarray(real)[np.asarray(real) != 0].ravel()))
    else:
        vals = sorted(rating_values)
    cfg = rc.RCConfig(
        rating_values=tuple(float(v) for v in vals),
        delta=delta, max_iters=max_iters,
    )
    vals_arr = jnp.asarray(vals, dtype=dtype)
    key = jax.random.PRNGKey(seed)
    real_j = jnp.asarray(real, dtype=dtype)
    knowable = jnp.asarray(np.isfinite(real) & (np.asarray(real) != 0))

    fit_fn = jax.jit(lambda prob, warm: rc.fit(prob, cfg, warmstart=warm, dtype=dtype))
    if mesh is not None:
        # candidates sharded over the mesh (the reference refits the full
        # maxent model per candidate per value in a MATLAB loop,
        # select_1step_lowest_entropy.m:25-28); the scorer is deterministic,
        # so sharded == unsharded up to XLA fusion tolerance
        from amf_tpu.parallel.sharding import sharded_candidate_scores

        @jax.jit
        def lookahead_fn(x, data, prob):
            def score_flat(cand, _k):
                return rc.entropy_lookahead_scores(
                    x, data, prob, cfg, lookahead_iters=lookahead_iters,
                    dtype=dtype, cand=cand, candidate_tile=lookahead_tile,
                )

            run = sharded_candidate_scores(score_flat, n * m, mesh)
            return run(jax.random.PRNGKey(0)).reshape(n, m)
    else:
        lookahead_fn = jax.jit(
            lambda x, data, prob: rc.entropy_lookahead_scores(
                x, data, prob, cfg, lookahead_iters=lookahead_iters, dtype=dtype,
                candidate_tile=lookahead_tile,
            ).reshape(n, m)
        )

    @jax.jit
    def rmse_of(x, data, prob):
        E, P = rc.predictions(x, data, prob, cfg)
        if pred_mode:
            pred = vals_arr[jnp.argmax(P, axis=-1)]
        else:
            pred = E
        # reference: rmse over every cell of X (evaluate_active.m:12-18);
        # restrict to knowable cells (X is assumed 0-free there)
        d2 = jnp.where(knowable, (real_j - pred) ** 2, 0.0)
        return jnp.sqrt(jnp.sum(d2) / jnp.maximum(jnp.sum(knowable), 1))

    x0, data0, iters0 = fit_fn(problem, None)

    results: Dict[str, object] = {
        "_real": np.asarray(real),
        "_rating_vals": tuple(float(v) for v in vals),
    }

    def score(kname, st, prob, k):
        x, data = st
        _, cutoff = rc.RC_KEYS[kname]
        if kname == "random":
            ev = jax.random.uniform(k, (n, m), dtype=dtype)
            choose_max = True
        elif kname == "entropy":
            ev = lookahead_fn(x, data, prob)
            choose_max = False
        else:  # ge-cutoff (select_ge_cutoff.m)
            P = rc.cell_probs(x, data, data.qmask)
            ev = jnp.sum(P * (vals_arr >= cutoff)[None, None, :], axis=-1)
            choose_max = True
        return jnp.where(prob.queryable, ev, jnp.nan), choose_max

    from amf_tpu.active.driver import Family, drive_active
    from amf_tpu.utils.checkpoint import LoopCheckpointer

    # reference analogue: the MATLAB loops keep partial results / warm-started
    # multipliers across steps (evaluate_active.m:71-72); checkpointing makes
    # a crashed sweep resumable by pick replay, like the other families
    ckpt = LoopCheckpointer.for_problem(
        checkpoint_path, problem, real, every=checkpoint_every
    )

    family = Family(
        nice_name=lambda kname: rc.RC_KEYS[kname][0],
        score=score,
        refit=lambda st, prob, k: fit_fn(prob, st[0])[:2],  # warm-started
        err=lambda st, prob: rmse_of(st[0], st[1], prob),
    )
    results.update(
        drive_active(problem, real, key_names, family, (x0, data0), key,
                     steps=steps, ckpt=ckpt, verbose=verbose)
    )
    return results
