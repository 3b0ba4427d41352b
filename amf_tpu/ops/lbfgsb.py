"""Box-constrained projected L-BFGS, implemented as a compiled JAX loop.

Replaces the reference's bundled lbfgsb-for-matlab (a C++ MEX gateway around
Nocedal's Fortran L-BFGS-B 2.1, ratingconcentration/lbfgsb-for-matlab/), which
drives the maxent dual (maxentmulti.m). This is the projected two-loop-
recursion variant (limited-memory BFGS direction + projection onto the box +
Armijo backtracking along the projected arc) rather than the Fortran code's
generalized-Cauchy-point subspace minimization — same fixed points (KKT of
the box-constrained problem), simpler control flow, fully jit/vmap-safe so
lookahead candidates can each run their own warm-started solve in a vmapped
lane.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LBFGSBResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    pg_norm: jax.Array  # projected-gradient sup-norm at exit
    n_iters: jax.Array


def lbfgsb(
    fun: Callable,  # x -> (f, grad) or f if value_and_grad=False
    x0: jax.Array,
    lower,
    upper,
    max_iters: int = 500,
    history: int = 10,
    pgtol: float = 1e-6,
    armijo_c1: float = 1e-4,
    max_linesearch: int = 30,
    value_and_grad: bool = True,
) -> LBFGSBResult:
    """Minimize fun over the box [lower, upper]."""
    if not value_and_grad:
        fun = jax.value_and_grad(fun)

    dim = x0.shape[0]
    dtype = x0.dtype
    lo = jnp.broadcast_to(jnp.asarray(lower, dtype), (dim,))
    hi = jnp.broadcast_to(jnp.asarray(upper, dtype), (dim,))

    def proj(x):
        return jnp.clip(x, lo, hi)

    x0 = proj(x0)
    f0, g0 = fun(x0)

    def pg_norm(x, g):
        return jnp.max(jnp.abs(proj(x - g) - x))

    def two_loop(g, S, Y, rho, count, gamma):
        """L-BFGS two-loop recursion over the (circular) history buffers."""
        m = S.shape[0]

        def bwd(i, carry):
            q, alphas = carry
            idx = (count - 1 - i) % m
            valid = i < jnp.minimum(count, m)
            a = jnp.where(valid, rho[idx] * jnp.dot(S[idx], q), 0.0)
            q = q - a * Y[idx] * valid
            return q, alphas.at[idx].set(a)

        q, alphas = jax.lax.fori_loop(
            0, m, bwd, (g, jnp.zeros(m, dtype))
        )
        r = gamma * q

        def fwd(i, r):
            idx = (count - jnp.minimum(count, m) + i) % m
            valid = i < jnp.minimum(count, m)
            b = jnp.where(valid, rho[idx] * jnp.dot(Y[idx], r), 0.0)
            return r + (alphas[idx] - b) * S[idx] * valid

        return jax.lax.fori_loop(0, m, fwd, r)

    def cond(carry):
        x, f, g, S, Y, rho, count, gamma, it, done = carry
        return ~done & (it < max_iters)

    def body(carry):
        x, f, g, S, Y, rho, count, gamma, it, _ = carry
        d = -two_loop(g, S, Y, rho, count, gamma)
        # safeguard: ensure descent, else fall back to steepest descent
        descent = jnp.dot(d, g) < 0
        d = jnp.where(descent, d, -g)

        def search(direction, init_step):
            def ls_cond(ls):
                step, ok, tries = ls
                return ~ok & (tries < max_linesearch)

            def ls_body(ls):
                step, ok, tries = ls
                x_new = proj(x + step * direction)
                f_new, _ = fun(x_new)
                suff = f_new <= f + armijo_c1 * jnp.dot(g, x_new - x)
                ok = suff & jnp.isfinite(f_new) & (f_new < f)
                return jnp.where(ok, step, step * 0.5), ok, tries + 1

            step, ok, _ = jax.lax.while_loop(
                ls_cond, ls_body, (jnp.asarray(init_step, dtype),
                                   jnp.asarray(False), 0)
            )
            return proj(x + step * direction), ok

        x_try, ok = search(d, 1.0)
        # quasi-Newton direction failed: retry along the projected gradient
        # with a curvature-scaled initial step before giving up
        x_sd, ok_sd = search(-g, gamma)
        x_new = jnp.where(ok, x_try, jnp.where(ok_sd, x_sd, x))
        use = ok | ok_sd
        f_new, g_new = fun(x_new)
        f_new = jnp.where(use, f_new, f)
        g_new = jax.tree.map(lambda a, b: jnp.where(use, a, b), g_new, g)

        s = x_new - x
        yv = g_new - g
        sy = jnp.dot(s, yv)
        accept = use & (sy > 1e-10)
        idx = count % history
        S = jnp.where(accept, S.at[idx].set(s), S)
        Y = jnp.where(accept, Y.at[idx].set(yv), Y)
        rho = jnp.where(accept, rho.at[idx].set(1.0 / sy), rho)
        count = count + accept.astype(jnp.int32)
        gamma = jnp.where(accept, sy / jnp.dot(yv, yv), gamma)

        done = (pg_norm(x_new, g_new) < pgtol) | ~use
        return x_new, f_new, g_new, S, Y, rho, count, gamma, it + 1, done

    init = (
        x0, f0, g0,
        jnp.zeros((history, dim), dtype),
        jnp.zeros((history, dim), dtype),
        jnp.zeros(history, dtype),
        jnp.int32(0),
        jnp.asarray(1.0, dtype),
        jnp.int32(0),
        jnp.asarray(False),
    )
    x, f, g, *_, it, _ = jax.lax.while_loop(cond, body, init)
    return LBFGSBResult(x, f, pg_norm(x, g), it)
