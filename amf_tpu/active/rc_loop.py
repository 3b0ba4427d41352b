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
from amf_tpu.utils.rng import fold_in_name


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
    dtype=jnp.float64,
    verbose: bool = False,
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

    for kname in key_names:
        nice, cutoff = rc.RC_KEYS[kname]
        prob_k, x_k, data_k = problem, x0, data0
        kloop = fold_in_name(key, kname)
        records: List[tuple] = [
            (int(prob_k.n_rated), float(rmse_of(x_k, data_k, prob_k)), None, None)
        ]
        max_steps = steps if steps is not None else n * m

        while bool(prob_k.queryable.any()) and len(records) < max_steps:
            kloop, kev = jax.random.split(kloop)
            if int(prob_k.queryable.sum()) == 1:
                ii, jj = np.nonzero(np.asarray(prob_k.queryable))
                i, j = int(ii[0]), int(jj[0])
                evals = None
                choose_max = True
            elif kname == "random":
                ev = jax.random.uniform(kev, (n, m), dtype=dtype)
                ev = jnp.where(prob_k.queryable, ev, jnp.nan)
                choose_max = True
                flat = int(jnp.argmax(jnp.where(prob_k.queryable, ev, -jnp.inf)))
                i, j = flat // m, flat % m
                evals = np.asarray(ev)
            elif kname == "entropy":
                ev = lookahead_fn(x_k, data_k, prob_k)
                flat = int(jnp.argmin(jnp.where(prob_k.queryable, ev, jnp.inf)))
                i, j = flat // m, flat % m
                evals = np.asarray(ev)
            else:  # ge-cutoff (select_ge_cutoff.m)
                P = rc.cell_probs(x_k, data_k, data_k.qmask)
                probs = jnp.sum(
                    P * (vals_arr >= cutoff)[None, None, :], axis=-1
                )
                ev = jnp.where(prob_k.queryable, probs, jnp.nan)
                flat = int(jnp.argmax(jnp.where(prob_k.queryable, ev, -jnp.inf)))
                i, j = flat // m, flat % m
                evals = np.asarray(ev)

            prob_k = prob_k.add_rating(i, j, float(real[i, j]))
            x_k, data_k, _ = fit_fn(prob_k, x_k)  # warm-started refit
            err = float(rmse_of(x_k, data_k, prob_k))
            records.append((int(prob_k.n_rated), err, (i, j), evals))
            if verbose:
                print(f"{nice:<20} step {len(records)-1}: ({i},{j}) "
                      f"rmse {err:.5f}")

        results[kname] = records

    return results
