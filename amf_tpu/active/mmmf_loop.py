"""MMMF active-learning loop.

Capability parity with the reference's MATLAB driver
(mmmf/evaluate_active.m:1-91) and its Python bridge (mmmf/active_mmmf.py):
initial solve, per-selector query loop with full re-solve (here: warm-started
ADMM), misclassification on the test set, results rows of
(num_known, misclass, [i,j], evals, predictions).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from amf_tpu.models import mmmf
from amf_tpu.types import Problem
from amf_tpu.utils.rng import fold_in_name


def binarize(real: np.ndarray, cutoff: Optional[float]) -> np.ndarray:
    """Map ratings to +-1 labels via cutoff (reference: active_mmmf.py:55-61);
    data already in {-1, +1} passes through."""
    real = np.asarray(real, dtype=np.float64)
    vals = set(np.unique(real[np.isfinite(real) & (real != 0)]))
    if vals <= {-1.0, 1.0}:
        return real
    if cutoff is None:
        raise ValueError("non-binary data needs --cutoff")
    out = np.where(real >= cutoff, 1.0, -1.0)
    out[~np.isfinite(real) | (real == 0)] = 0.0
    return out


def run_active_mmmf(
    problem: Problem,
    y_real: np.ndarray,  # +-1/0 full label matrix (0 = unknowable)
    key_names: Sequence[str],
    C: float = 1.0,
    steps: Optional[int] = None,
    seed: int = 0,
    cfg: Optional[mmmf.MMMFConfig] = None,
    dtype=jnp.float64,
    keep_predictions: bool = False,
    verbose: bool = False,
) -> Dict[str, object]:
    for k in key_names:
        if k not in mmmf.MMMF_KEYS:
            raise ValueError(f"unknown MMMF selector {k!r}")
    cfg = cfg or mmmf.MMMFConfig(C=C)
    n, m = problem.shape
    y_real_j = jnp.asarray(y_real, dtype=dtype)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def solve_for(rated, state):
        y_tr = jnp.where(rated, y_real_j, 0.0)
        st, iters = mmmf.solve(y_tr, cfg, state)
        return st, iters

    @jax.jit
    def misclass(X, test):
        wrong = jnp.sign(X) != y_real_j
        cnt = jnp.maximum(jnp.sum(test), 1)
        return jnp.sum(jnp.where(test, wrong, False)) / cnt

    st0, _ = solve_for(problem.rated, None)

    results: Dict[str, object] = {
        "_real": np.asarray(y_real),
        "_rating_vals": (-1.0, 1.0),
    }

    for kname in key_names:
        prob_k = problem
        st_k = st0
        kloop = fold_in_name(key, kname)
        records: List[tuple] = [
            (
                int(prob_k.n_rated),
                float(misclass(st_k.X, prob_k.test)),
                None,
                None,
            )
            + ((np.asarray(st_k.X),) if keep_predictions else ())
        ]
        max_steps = steps if steps is not None else n * m

        while bool(prob_k.queryable.any()) and len(records) < max_steps:
            kloop, kev = jax.random.split(kloop)
            if int(prob_k.queryable.sum()) == 1:
                ii, jj = np.nonzero(np.asarray(prob_k.queryable))
                i, j = int(ii[0]), int(jj[0])
                evals = None
            else:
                ev, choose_max = mmmf.selector_evals(
                    kname, st_k.X, prob_k.queryable, kev
                )
                masked = jnp.where(
                    prob_k.queryable & jnp.isfinite(ev),
                    ev,
                    -jnp.inf if choose_max else jnp.inf,
                )
                flat = int(jnp.argmax(masked) if choose_max else jnp.argmin(masked))
                i, j = flat // m, flat % m
                evals = np.asarray(ev)

            prob_k = prob_k.add_rating(i, j, float(y_real[i, j]))
            st_k, iters = solve_for(prob_k.rated, st_k)  # warm start
            err = float(misclass(st_k.X, prob_k.test))
            rec = (int(prob_k.n_rated), err, (i, j), evals)
            if keep_predictions:
                rec = rec + (np.asarray(st_k.X),)
            records.append(rec)
            if verbose:
                print(f"{kname:<16} step {len(records)-1}: ({i},{j}) "
                      f"misclass {err:.4f} (admm iters {int(iters)})")

        results[kname] = records

    return results
