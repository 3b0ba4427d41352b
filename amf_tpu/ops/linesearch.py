"""Adaptive-learning-rate descent with accept/reject line search.

This is the single optimization pattern behind four reference fit loops:
``fit_lls`` (python-pmf/pmf.py:179-211, pmf_cy.pyx:257-291),
``ActivePMF.fit_normal_kls`` (active_pmf.py:251-288), and
``MNActivePMF.fit_normal_kls`` (mn_active_pmf.py:242-288):

    compute gradient;
    loop: propose x' = step(x, g, lr)
          if f(x') improves: accept; lr *= 1.25;
              converged if improvement < stop_thresh; recompute gradient
          else: lr *= 0.5; converged if lr < min_lr

Re-expressed as one ``lax.while_loop`` (jit- and vmap-safe; a hard
``max_steps`` bound makes the loop safe to batch over lookahead candidates).
Minimization convention: pass f = -log_likelihood to reproduce the reference's
ascent loops exactly (same accept/reject trajectory, same thresholds).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class DescentInfo(NamedTuple):
    final_value: jax.Array
    final_lr: jax.Array
    n_iters: jax.Array
    n_accepts: jax.Array


def adaptive_descent(
    x0,
    value_fn: Callable,
    grad_fn: Callable,
    step_fn: Callable,
    lr0: float,
    stop_thresh: float,
    min_lr: float,
    max_steps: int,
    grow: float = 1.25,
    shrink: float = 0.5,
    value_and_grad_fn: Optional[Callable] = None,
) -> Tuple[object, DescentInfo]:
    """Minimize ``value_fn`` from ``x0`` with the reference's adaptive-LR rule.

    Args:
      x0: pytree of parameters.
      value_fn: x -> scalar loss.
      grad_fn: x -> pytree like x (the descent direction source; recomputed
        only after accepted steps, as in the reference).
      step_fn: (x, g, lr) -> proposed x. Projection (e.g. PSD) goes here.
      lr0/stop_thresh/min_lr: the reference's learning_rate / stop_thresh /
        min_learning_rate knobs (pmf.py:28-30).
      max_steps: hard iteration bound (counts proposals, accepted or not).
      value_and_grad_fn: optional fused x -> (f, g). When given, the loop
        carries (f, g) of the current point and evaluates one fused
        value+gradient per proposal — one shared forward instead of separate
        value and gradient passes (25%+ less HBM traffic for matmul-bound
        losses). The accept/reject trajectory is mathematically identical.

    Returns (x_final, DescentInfo).
    """
    if value_and_grad_fn is not None:
        return _adaptive_descent_fused(
            x0, value_and_grad_fn, step_fn, lr0, stop_thresh, min_lr,
            max_steps, grow, shrink,
        )
    f0 = value_fn(x0)
    # Under shard_map, value_fn typically closes over sharded ("varying")
    # operands while x0 may be a replicated closure constant. The while_loop
    # carry must have uniform variance, so infect every init leaf with f0's
    # variance via a zero-valued contribution (a no-op outside shard_map).
    zero = jnp.zeros((), f0.dtype) * f0
    x0 = jax.tree.map(lambda a: a + zero.astype(a.dtype), x0)
    lr0_arr = jnp.asarray(lr0, dtype=f0.dtype) + zero
    done0 = jnp.asarray(False) | (zero != 0)
    iter0 = jnp.int32(0) + zero.astype(jnp.int32)

    def _select(pred, a, b):
        return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)

    def cond(carry):
        _, _, _, done, n_iters, _ = carry
        return jnp.logical_and(~done, n_iters < max_steps)

    def body(carry):
        x, lr, old_f, done, n_iters, n_accepts = carry
        # The gradient is a deterministic function of the current accepted
        # point, so recomputing it each proposal (instead of carrying it, as
        # the reference does) yields the identical trajectory while keeping
        # the loop branch-free — required for shard_map's varying-axes checks.
        g = grad_fn(x)
        x_prop = step_fn(x, g, lr)
        new_f = value_fn(x_prop)
        # NaN/inf proposals are rejections (reference relies on float compare
        # returning False; make that explicit for safety).
        accept = jnp.isfinite(new_f) & (new_f < old_f)

        conv = jnp.where(
            accept, (old_f - new_f) < stop_thresh, lr * shrink < min_lr
        )
        x = _select(accept, x_prop, x)
        lr = jnp.where(accept, lr * grow, lr * shrink)
        old_f = jnp.where(accept, new_f, old_f)
        return (
            x,
            lr,
            old_f,
            done | conv,
            n_iters + 1,
            n_accepts + accept.astype(jnp.int32),
        )

    init = (x0, lr0_arr, f0, done0, iter0, iter0)
    x, lr, f, _, n_iters, n_accepts = jax.lax.while_loop(cond, body, init)
    return x, DescentInfo(f, lr, n_iters, n_accepts)


def adaptive_descent_poly(
    x0,
    value_and_grad_fn: Callable,
    step_fn: Callable,
    delta_poly_fn: Callable,
    lr0: float,
    stop_thresh: float,
    min_lr: float,
    max_steps: int,
    grow: float = 1.25,
    shrink: float = 0.5,
    max_rungs: int = 64,
) -> Tuple[object, DescentInfo]:
    """Polynomial-in-alpha variant of ``adaptive_descent`` (ROADMAP perf #1).

    Exploits that for bilinear models (PMF and its lookahead refits) the
    objective along a fixed ray ``x + alpha*g`` is an exact quartic, so every
    *rejected* proposal can be adjudicated by evaluating a scalar polynomial
    instead of a full value pass.  One "epoch" = one fused value+grad pass at
    the current accepted point + one ``delta_poly_fn`` pass; the whole
    halving ladder ``lr, lr/2, lr/4, ...`` is then walked in closed form.
    Measured on the ML-100k refit (scripts/probe_ls_rejects.py): 4.6 rejects
    per accept, i.e. ~5.6 kernel passes per accepted step collapse to ~2.

    Args:
      delta_poly_fn: ``(x, g) -> (c1, c2, c3, c4)`` such that EXACTLY
        ``f(step_fn(x, g, a)) = f(x) - (c1 a + c2 a^2 + c3 a^3 + c4 a^4)``.
        Requires ``step_fn`` linear in ``lr`` and ``f`` quartic along the ray
        (true for the PMF/lookahead losses; see models.pmf._delta_poly).

    Trajectory semantics match ``adaptive_descent`` (reference fit_lls,
    pmf.py:179-211): accept iff the improvement is finite and > 0; on accept
    lr *= grow and convergence when improvement < stop_thresh; on reject
    lr *= shrink and convergence when lr*shrink < min_lr; ``n_iters`` counts
    proposals (accepted or not) against ``max_steps``.  Decisions are made on
    the difference polynomial directly (no large-value cancellation), so
    near-tie accept/reject flips vs the subtract-two-big-floats path are
    possible at f32 rounding scale — scoring-grade, not bitwise.
    """
    f0, g0 = value_and_grad_fn(x0)
    zero = jnp.zeros((), f0.dtype) * f0
    x0 = jax.tree.map(lambda a: a + zero.astype(a.dtype), x0)
    lr0_arr = jnp.asarray(lr0, dtype=f0.dtype) + zero
    done0 = jnp.asarray(False) | (zero != 0)
    iter0 = jnp.int32(0) + zero.astype(jnp.int32)

    def _select(pred, a, b):
        return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)

    def cond(carry):
        _, _, _, done, n_iters, _ = carry
        return jnp.logical_and(~done, n_iters < max_steps)

    def body(carry):
        x, lr, old_f, done, n_iters, n_accepts = carry
        f, g = value_and_grad_fn(x)  # f == old_f up to determinism; refresh
        c1, c2, c3, c4 = delta_poly_fn(x, g)

        t = jnp.arange(max_rungs, dtype=jnp.int32)
        alpha = lr * (shrink ** t.astype(f.dtype))
        d = alpha * (c1 + alpha * (c2 + alpha * (c3 + alpha * c4)))
        accept = jnp.isfinite(d) & (d > 0)
        # reject-convergence: after rejecting rung t the next lr would sink
        # below min_lr -> lane stops without accepting
        stop_rej = ~accept & (alpha * shrink < min_lr)
        # rung t is examined iff every earlier rung was a plain reject
        # (no accept, no reject-convergence) and the proposal budget allows
        prev_ok = jnp.concatenate([
            jnp.ones((1,), bool),
            jnp.cumprod((~accept & ~stop_rej).astype(jnp.int32))[:-1].astype(bool),
        ])
        examined = prev_ok & ((n_iters + t) < max_steps)
        hit = examined & accept
        any_hit = jnp.any(hit)
        t_star = jnp.argmax(hit).astype(jnp.int32)  # first True
        alpha_star = alpha[t_star]
        d_star = d[t_star]
        consumed = jnp.where(
            any_hit, t_star + 1, jnp.sum(examined.astype(jnp.int32))
        ).astype(jnp.int32)

        x = _select(any_hit, step_fn(x, g, alpha_star), x)
        new_f = jnp.where(any_hit, f - d_star, f)
        new_lr = jnp.where(
            any_hit,
            alpha_star * grow,
            lr * (shrink ** consumed.astype(f.dtype)),
        )
        conv = jnp.where(any_hit, d_star < stop_thresh, True)
        return (
            x,
            new_lr,
            new_f,
            done | conv,
            n_iters + consumed,
            n_accepts + any_hit.astype(jnp.int32),
        )

    init = (x0, lr0_arr, f0, done0, iter0, iter0)
    x, lr, f, _, n_iters, n_accepts = jax.lax.while_loop(cond, body, init)
    return x, DescentInfo(f, lr, n_iters, n_accepts)


def _adaptive_descent_fused(
    x0, value_and_grad_fn, step_fn, lr0, stop_thresh, min_lr, max_steps,
    grow, shrink,
):
    """Fused-value-and-grad variant: identical trajectory, fewer passes.

    Carries (f, g) at the current accepted point; each proposal costs one
    fused evaluation. The gradient computed at a rejected proposal is simply
    discarded (the reference reuses the accepted point's gradient across
    rejected learning rates; so do we, by carrying it)."""
    f0, g0 = value_and_grad_fn(x0)
    zero = jnp.zeros((), f0.dtype) * f0
    x0 = jax.tree.map(lambda a: a + zero.astype(a.dtype), x0)
    g0 = jax.tree.map(lambda a: a + zero.astype(a.dtype), g0)
    lr0_arr = jnp.asarray(lr0, dtype=f0.dtype) + zero
    done0 = jnp.asarray(False) | (zero != 0)
    iter0 = jnp.int32(0) + zero.astype(jnp.int32)

    def _select(pred, a, b):
        return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)

    def cond(carry):
        _, _, _, _, done, n_iters, _ = carry
        return jnp.logical_and(~done, n_iters < max_steps)

    def body(carry):
        x, g, lr, old_f, done, n_iters, n_accepts = carry
        x_prop = step_fn(x, g, lr)
        new_f, new_g = value_and_grad_fn(x_prop)
        accept = jnp.isfinite(new_f) & (new_f < old_f)

        conv = jnp.where(
            accept, (old_f - new_f) < stop_thresh, lr * shrink < min_lr
        )
        x = _select(accept, x_prop, x)
        g = _select(accept, new_g, g)
        lr = jnp.where(accept, lr * grow, lr * shrink)
        old_f = jnp.where(accept, new_f, old_f)
        return (
            x, g, lr, old_f,
            done | conv,
            n_iters + 1,
            n_accepts + accept.astype(jnp.int32),
        )

    init = (x0, g0, lr0_arr, f0, done0, iter0, iter0)
    x, _, lr, f, _, n_iters, n_accepts = jax.lax.while_loop(cond, body, init)
    return x, DescentInfo(f, lr, n_iters, n_accepts)
