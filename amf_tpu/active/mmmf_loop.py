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
    mode: str = "avg",  # 'avg' = nuclear norm (solveD 'a'), 'max' = max-norm
    dtype=jnp.float64,
    keep_predictions: bool = False,
    verbose: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 20,
) -> Dict[str, object]:
    for k in key_names:
        if k not in mmmf.MMMF_KEYS:
            raise ValueError(f"unknown MMMF selector {k!r}")
    cfg = cfg or mmmf.MMMFConfig(C=C)
    n, m = problem.shape
    y_real_j = jnp.asarray(y_real, dtype=dtype)
    key = jax.random.PRNGKey(seed)

    if mode == "max":
        mcfg = mmmf.MaxNormConfig(C=cfg.C, max_iters=cfg.max_iters)

        @jax.jit
        def solve_for(rated, state):
            y_tr = jnp.where(rated, y_real_j, 0.0)
            st, obj = mmmf.solve_maxnorm(
                y_tr, mcfg, state, key=jax.random.fold_in(key, 7)
            )
            return st, obj
    else:

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

    from amf_tpu.active.driver import Family, drive_active
    from amf_tpu.utils.checkpoint import LoopCheckpointer

    # reference analogue: partial_results.mat saved every 20 steps mid-run
    # (mmmf/evaluate_active.m:84-86)
    ckpt = LoopCheckpointer.for_problem(
        checkpoint_path, problem, y_real, every=checkpoint_every,
        era=mmmf.SOLVER_ERA,
    )

    family = Family(
        nice_name=lambda kname: kname,
        score=lambda kname, st, prob, k: mmmf.selector_evals(
            kname, st.X, prob.queryable, k
        ),
        refit=lambda st, prob, k: solve_for(prob.rated, st)[0],  # warm start
        err=lambda st, prob: misclass(st.X, prob.test),
        extra=(lambda st: (np.asarray(st.X),)) if keep_predictions else None,
    )
    results.update(
        drive_active(problem, y_real, key_names, family, st0, key,
                     steps=steps, ckpt=ckpt, verbose=verbose)
    )
    return results
