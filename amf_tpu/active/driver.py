"""The shared active-learning host loop.

All five model families (vn/mn variational PMF, Gibbs BPMF, NUTS BPMF, MMMF,
RatingConcentration) run the same reference sweep: per criterion, loop
{score every queryable cell, query the best, refit, record}. The reference
implements this five times over (active_pmf.full_test :796-898,
bayes_pmf.compare_active :733-825, stan-bpmf/bpmf.full_test :559-641,
mmmf/evaluate_active.m:1-91, ratingconcentration/evaluate_active.m:1-83);
here one driver is parameterized by a :class:`Family` of callables so
checkpoint/resume, RNG-stream discipline, verbose reporting, and the results
record schema (plot_results.py:160-166) are uniform across families.

RNG discipline: each criterion owns a name-derived stream; each step folds the
step index in, so a resume at step k reproduces the exact key sequence the
uninterrupted run would have used.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from amf_tpu.utils.checkpoint import LoopCheckpointer
from amf_tpu.utils.rng import fold_in_name


class Family(NamedTuple):
    """Per-model-family plumbing for :func:`drive_active`.

    All callables take/return family-specific immutable pytree states; the
    driver never inspects a state beyond passing it around.
    """

    # criterion key -> human name for verbose output
    nice_name: Callable[[str], str]
    # (kname, state, problem, key) -> ((n, m) evals with NaN off-pool,
    # choose_max). Called once per step for criteria with >1 candidate left.
    score: Callable
    # (state, problem, key) -> state, after the queried cell was added
    refit: Callable
    # (state, problem) -> float error metric for the records (RMSE or
    # misclassification, per family)
    err: Callable
    # optional (state,) -> tuple appended to every record (MMMF's
    # keep_predictions, mmmf/evaluate_active.m:82)
    extra: Optional[Callable] = None


def drive_active(
    problem,
    real: np.ndarray,
    key_names: Sequence[str],
    family: Family,
    state0,
    base_key: jax.Array,
    steps: Optional[int] = None,
    ckpt: Optional[LoopCheckpointer] = None,
    verbose: bool = False,
    replay: Optional[Dict[str, List[Optional[Tuple[int, int]]]]] = None,
) -> Dict[str, List[tuple]]:
    """Run the per-criterion sweeps; returns {criterion: records}.

    Every criterion starts from the same initial ``state0`` (the reference
    deep-copies the initial model per criterion thread,
    active_pmf.py:1071-1073 — free here, states are immutable).

    ``replay`` maps criterion -> the pick list of a previous run (record
    field 2, None first): scoring is skipped and the recorded cells are
    queried in order, while the refit key stream is the step-indexed one
    the original run used — so the model trajectory is reproduced exactly
    (up to platform numerics) and the err trace can be re-scored under a
    different metric (e.g. re-recording a binary workload's RMSE trace as
    misclassification after the fact).
    """
    n, m = problem.shape
    ckpt = ckpt or LoopCheckpointer(None)
    out: Dict[str, List[tuple]] = {}

    for kname in key_names:
        nice = family.nice_name(kname)
        prob_k, state = problem, state0
        kloop = fold_in_name(base_key, kname)
        max_steps = steps if steps is not None else n * m

        # resume from a partial checkpoint by replaying recorded picks
        # (reference analogue: partial_results saving, SURVEY.md §5.4)
        prob_k, records, will_run = ckpt.resume(kname, prob_k, real, max_steps)
        if records:
            if will_run:  # skip the refit when the criterion already finished
                kr = jax.random.fold_in(kloop, 2**20 + len(records))
                state = family.refit(state, prob_k, kr)
            if verbose:
                print(f"{nice}: resumed at step {len(records) - 1}")
        else:
            rec = (int(prob_k.n_rated), float(family.err(state, prob_k)),
                   None, None)
            if family.extra is not None:
                rec = rec + tuple(family.extra(state))
            records = [rec]
        t0 = time.time()

        replay_picks = (replay or {}).get(kname)
        if replay_picks is not None:
            max_steps = min(max_steps, len(replay_picks))

        while bool(prob_k.queryable.any()) and len(records) < max_steps:
            # step-indexed keys: resume at step k reproduces the key stream
            # the uninterrupted run would have used
            kstep = jax.random.fold_in(kloop, len(records))
            kscore, krefit = jax.random.split(kstep)
            if replay_picks is not None:
                i, j = (int(x) for x in replay_picks[len(records)])
                evals = None
            elif int(prob_k.queryable.sum()) == 1:
                ii, jj = np.nonzero(np.asarray(prob_k.queryable))
                i, j = int(ii[0]), int(jj[0])
                evals = None
            else:
                ev, choose_max = family.score(kname, state, prob_k, kscore)
                masked = jnp.where(
                    prob_k.queryable & jnp.isfinite(ev),
                    ev,
                    -jnp.inf if choose_max else jnp.inf,
                )
                flat = int(jnp.argmax(masked) if choose_max
                           else jnp.argmin(masked))
                if not bool(jnp.isfinite(masked.ravel()[flat])):
                    # no queryable cell has a finite score (e.g. the *-pos
                    # margin selectors when every margin is non-positive):
                    # the reference still picks a QUERYABLE cell — its
                    # selector vector only ever contains queryable cells
                    # (select_min_margin_pos.m:5-13 argmin over x(can_query))
                    flat = int(jnp.argmax(prob_k.queryable.ravel()))
                i, j = flat // m, flat % m
                evals = np.asarray(ev)

            prob_k = prob_k.add_rating(i, j, float(real[i, j]))
            state = family.refit(state, prob_k, krefit)
            err = float(family.err(state, prob_k))
            rec = (int(prob_k.n_rated), err, (i, j), evals)
            if family.extra is not None:
                rec = rec + tuple(family.extra(state))
            records.append(rec)
            ckpt.update(kname, records)
            if verbose:
                print(f"{nice:<36} step {len(records) - 1}: "
                      f"picked ({i},{j}), err {err:.5f}")

        ckpt.update(kname, records, force=True)
        out[kname] = records
        if verbose:
            print(f"{nice}: {len(records) - 1} steps in "
                  f"{time.time() - t0:.1f}s")

    return out
