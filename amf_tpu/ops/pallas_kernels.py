"""Pallas TPU kernels for the lookahead hot path.

The dominant cost of batched one-step lookahead is the per-lane PMF refit:
every gradient step reads the (n, m) ratings/mask, forms the masked residual
R - U V^T, and contracts it against both factors. Under plain vmap each lane
carries its own full-matrix problem copy and the residual round-trips HBM
(an (n, m) f32 intermediate per lane per step) — that is what makes the
reference-shaped workload bandwidth-bound.

``pmf_batched_value_grad`` fuses the whole step for a whole lane batch:
  * the base R / mask are SHARED across lanes (each lane's problem differs
    from the base by exactly one hypothesized cell, applied in-kernel from
    scalar-prefetched (i, j, v) triples);
  * pred/resid live only in VMEM tiles — no (n, m) HBM intermediates;
  * outputs are the per-lane ascent gradients and data log-likelihood terms.

Grid: (lanes, row-blocks); row-blocks iterate fastest so the per-lane gv /
scalar accumulators revisit their output blocks consecutively (the TPU
pallas reduction pattern). A pure-JAX reference implementation
(``pmf_batched_value_grad_reference``) backs CPU tests and non-TPU paths.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    # scalar prefetch
    di_ref,  # (L,) int32 delta row per lane
    dj_ref,  # (L,) int32 delta col per lane
    dv_ref,  # (L,) f32 delta value per lane
    sig_ref,  # (3,) f32 [sigma_sq, sigma_u_sq, sigma_v_sq]
    # inputs
    r_ref,  # (bn, m) base ratings block (shared across lanes)
    mask_ref,  # (bn, m) base rated mask block, f32 0/1
    u_ref,  # (1, bn, d)
    v_ref,  # (1, m, d)
    # outputs
    gu_ref,  # (1, bn, d)
    gv_ref,  # (1, m, d) accumulated over row blocks
    val_ref,  # (1, 8, 128) data-term accumulator (scalar at [0, 0, 0])
):
    # Grid order: (lane OUTER, row-block INNER) so the per-lane gv/val
    # accumulators revisit their output blocks consecutively (the TPU pallas
    # reduction pattern). The alternative order (row-block outer, sharing the
    # R/mask DMA across lanes, accumulations into per-row-block partials) was
    # measured ~25% slower on v5e: the (n_rblk, L, m, d) partial writes cost
    # more than the saved base-matrix re-fetches.
    lane = pl.program_id(0)
    rblk = pl.program_id(1)
    bn = r_ref.shape[0]
    m = r_ref.shape[1]

    sigma_sq = sig_ref[0]
    sigma_u_sq = sig_ref[1]
    sigma_v_sq = sig_ref[2]

    u = u_ref[0]  # (bn, d)
    v = v_ref[0]  # (m, d)

    pred = jnp.dot(u, v.T, preferred_element_type=jnp.float32)  # (bn, m)

    # apply this lane's hypothesized cell if it falls in this row block
    di = di_ref[lane] - rblk * bn
    dj = dj_ref[lane]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, m), 1)
    hit = (rows == di) & (cols == dj)
    maskv = jnp.where(hit, 1.0, mask_ref[...])
    rv = jnp.where(hit, dv_ref[lane], r_ref[...])

    resid = maskv * (rv - pred) / sigma_sq  # (bn, m)

    gu_ref[0] = (
        jnp.dot(resid, v, preferred_element_type=jnp.float32)
        - u / sigma_u_sq
    )

    gv_part = jnp.dot(resid.T, u, preferred_element_type=jnp.float32)
    val_part = jnp.sum(maskv * (rv - pred) * (rv - pred))
    corner = (
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    ) & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
    val_block = jnp.where(corner, val_part, 0.0)

    @pl.when(rblk == 0)
    def _():
        gv_ref[0] = gv_part - v / sigma_v_sq
        val_ref[0] = val_block

    @pl.when(rblk != 0)
    def _():
        gv_ref[0] = gv_ref[0] + gv_part
        val_ref[0] = val_ref[0] + val_block


@functools.partial(jax.jit, static_argnames=("block_rows", "bf16"))
def pmf_batched_value_grad(
    U: jax.Array,  # (L, n, d)
    V: jax.Array,  # (L, m, d)
    R: jax.Array,  # (n, m) base observed values (shared)
    rated: jax.Array,  # (n, m) base rated mask (bool or f32, shared)
    delta_i: jax.Array,  # (L,) int32
    delta_j: jax.Array,  # (L,) int32
    delta_v: jax.Array,  # (L,) f32
    sigmas: jax.Array,  # (3,) [sigma_sq, sigma_u_sq, sigma_v_sq]
    block_rows: int = 256,
    bf16: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused per-lane (-log_likelihood, ascent grads) for PMF lookahead.

    Returns (neg_ll (L,), grad_U (L, n, d), grad_V (L, m, d)) where neg_ll
    includes the prior terms and grads match models.pmf.gradient on the
    per-lane problem (base problem + hypothesized cell).

    bf16: stream R/mask/U/V through HBM in bfloat16 (halves the bandwidth
    bill; MXU accumulates in f32). Scoring-grade precision — the accept/
    reject trajectory can differ from f32 in marginal steps, so f32 is the
    default for parity runs.
    """
    L, n, d = U.shape
    m = V.shape[1]
    bn = min(block_rows, _round_up(n, 8))
    n_pad = _round_up(n, bn)

    io_dtype = jnp.bfloat16 if bf16 else jnp.float32
    R32 = R.astype(io_dtype)
    mask32 = rated.astype(io_dtype)
    if n_pad != n:
        R32 = jnp.pad(R32, ((0, n_pad - n), (0, 0)))
        mask32 = jnp.pad(mask32, ((0, n_pad - n), (0, 0)))
        U = jnp.pad(U, ((0, 0), (0, n_pad - n), (0, 0)))

    grid = (L, n_pad // bn)  # lanes outer, row-blocks inner

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, m), lambda l, r, *_: (r, 0)),
            pl.BlockSpec((bn, m), lambda l, r, *_: (r, 0)),
            pl.BlockSpec((1, bn, d), lambda l, r, *_: (l, r, 0)),
            pl.BlockSpec((1, m, d), lambda l, r, *_: (l, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bn, d), lambda l, r, *_: (l, r, 0)),
            pl.BlockSpec((1, m, d), lambda l, r, *_: (l, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda l, r, *_: (l, 0, 0)),
        ],
    )

    gu, gv, vals = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((L, m, d), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, 128), jnp.float32),
        ],
    )(
        delta_i.astype(jnp.int32),
        delta_j.astype(jnp.int32),
        delta_v.astype(jnp.float32),
        sigmas.astype(jnp.float32),
        R32,
        mask32,
        U.astype(io_dtype),
        V.astype(io_dtype),
    )

    gu = gu[:, :n, :]
    sigma_sq, sigma_u_sq, sigma_v_sq = sigmas[0], sigmas[1], sigmas[2]
    sqerr = vals[:, 0, 0]
    neg_ll = (
        sqerr / (2 * sigma_sq)
        + jnp.sum(U[:, :n] * U[:, :n], axis=(1, 2)) / (2 * sigma_u_sq)
        + jnp.sum(V * V, axis=(1, 2)) / (2 * sigma_v_sq)
    )
    return neg_ll, gu, gv


def _kernel_v2(
    # scalar prefetch
    di_ref,  # (L,) int32 delta row per lane
    dj_ref,  # (L,) int32 delta col per lane
    dv_ref,  # (L,) f32 delta value per lane
    sig_ref,  # (3,) f32 [sigma_sq, sigma_u_sq, sigma_v_sq]
    # inputs
    r_ref,  # (bn, m) base ratings block (shared across the lane block)
    mask_ref,  # (bn, m) base rated mask block
    ut_ref,  # (LB, d, bn) transposed factor block
    vt_ref,  # (LB, d, m)
    # outputs
    gut_ref,  # (LB, d, bn)
    gvt_ref,  # (LB, d, m) written at the last row block
    val_ref,  # (LB, 8, 128) data-term accumulator (scalar at [l, 0, 0])
    gv_acc,  # VMEM scratch (LB, d, m) f32: row-block accumulator (keeps the
    # accumulation in f32 even when the output stream is bf16)
    *,
    lanes_per_block: int,
    bf16_contract: bool,
):
    """Lane-blocked variant of ``_kernel``: one R/mask DMA feeds LB lanes.

    v1 re-fetches the base matrices once per LANE (the dominant HBM bill at
    reference scale); here the grid is (lane-blocks, row-blocks) and each
    iteration computes LB lanes against one base block, cutting base traffic
    LB-fold. Factors are carried TRANSPOSED as (d, rows) so the d axis sits in
    sublanes (padding d=10 to 16 instead of to a 128-lane row), which keeps
    the per-lane V tile ~8x smaller in VMEM.
    """
    lb = pl.program_id(0)
    rblk = pl.program_id(1)
    bn = r_ref.shape[0]
    m = r_ref.shape[1]

    inv_sig = 1.0 / sig_ref[0]
    sigma_u_sq = sig_ref[1]
    sigma_v_sq = sig_ref[2]

    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, m), 1)
    corner = (
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    ) & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)

    base_r = r_ref[...].astype(jnp.float32)
    base_mask = mask_ref[...].astype(jnp.float32)

    for l in range(lanes_per_block):  # unrolled over the lane block
        lane = lb * lanes_per_block + l
        ut = ut_ref[l]  # (d, bn)
        vt = vt_ref[l]  # (d, m)
        pred = jax.lax.dot_general(
            ut, vt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bn, m)

        di = di_ref[lane] - rblk * bn
        dj = dj_ref[lane]
        hit = (rows == di) & (cols == dj)
        maskv = jnp.where(hit, 1.0, base_mask)
        err = maskv * (jnp.where(hit, dv_ref[lane], base_r) - pred)
        resid = err * inv_sig  # (bn, m)
        if bf16_contract:
            # keep the gradient contractions on the fast bf16 MXU path: a
            # bf16 x f32 dot would silently promote the whole matmul to f32
            # mode (~4x slower). f32 accumulation; scoring-grade precision.
            resid = resid.astype(jnp.bfloat16)

        gut_ref[l] = (
            jax.lax.dot_general(
                vt, resid, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d, bn)
            - ut.astype(jnp.float32) / sigma_u_sq
        ).astype(gut_ref.dtype)
        gvt_part = jax.lax.dot_general(
            ut, resid, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, m)
        val_block = jnp.where(corner, jnp.sum(err * err), 0.0)

        @pl.when(rblk == 0)
        def _():
            gv_acc[l] = gvt_part - vt.astype(jnp.float32) / sigma_v_sq
            val_ref[l] = val_block

        @pl.when(rblk != 0)
        def _():
            gv_acc[l] = gv_acc[l] + gvt_part
            val_ref[l] = val_ref[l] + val_block

        @pl.when(rblk == pl.num_programs(1) - 1)
        def _():
            gvt_ref[l] = gv_acc[l].astype(gvt_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "lanes_per_block", "bf16")
)
def pmf_batched_value_grad_t(
    Ut: jax.Array,  # (L, d, n) TRANSPOSED factors
    Vt: jax.Array,  # (L, d, m)
    R: jax.Array,  # (n, m) base observed values (shared)
    rated: jax.Array,  # (n, m) base rated mask (bool or f32, shared)
    delta_i: jax.Array,  # (L,) int32
    delta_j: jax.Array,  # (L,) int32
    delta_v: jax.Array,  # (L,) f32
    sigmas: jax.Array,  # (3,) [sigma_sq, sigma_u_sq, sigma_v_sq]
    block_rows: int = 256,
    lanes_per_block: int = 8,
    bf16: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Lane-blocked fused lookahead step (see ``_kernel_v2``).

    Same semantics as ``pmf_batched_value_grad`` but takes/returns factors in
    (lane, d, rows) layout: (neg_ll (L,), grad_Ut (L, d, n), grad_Vt (L, d, m)).
    L must... is padded to a lanes_per_block multiple internally.
    """
    L, d, n = Ut.shape
    m = Vt.shape[2]
    bn = min(block_rows, _round_up(n, 8))
    n_pad = _round_up(n, bn)
    LB = lanes_per_block
    L_pad = _round_up(L, LB)

    io_dtype = jnp.bfloat16 if bf16 else jnp.float32
    R32 = R.astype(io_dtype)
    mask32 = rated.astype(io_dtype)
    if n_pad != n:
        R32 = jnp.pad(R32, ((0, n_pad - n), (0, 0)))
        mask32 = jnp.pad(mask32, ((0, n_pad - n), (0, 0)))
        Ut = jnp.pad(Ut, ((0, 0), (0, 0), (0, n_pad - n)))
    if L_pad != L:
        padL = lambda x: jnp.pad(x, ((0, L_pad - L),) + ((0, 0),) * (x.ndim - 1))
        Ut, Vt = padL(Ut), padL(Vt)
        delta_i, delta_j, delta_v = padL(delta_i), padL(delta_j), padL(delta_v)

    grid = (L_pad // LB, n_pad // bn)  # lane blocks outer, row blocks inner

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, m), lambda lb, r, *_: (r, 0)),
            pl.BlockSpec((bn, m), lambda lb, r, *_: (r, 0)),
            pl.BlockSpec((LB, d, bn), lambda lb, r, *_: (lb, 0, r)),
            pl.BlockSpec((LB, d, m), lambda lb, r, *_: (lb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((LB, d, bn), lambda lb, r, *_: (lb, 0, r)),
            pl.BlockSpec((LB, d, m), lambda lb, r, *_: (lb, 0, 0)),
            pl.BlockSpec((LB, 8, 128), lambda lb, r, *_: (lb, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((LB, d, m), jnp.float32)],
    )

    # grads carried at the streaming dtype: the while_loop's propose/select
    # bookkeeping between kernel calls is HBM-bound, so bf16 grads halve it
    grad_dtype = io_dtype
    gut, gvt, vals = pl.pallas_call(
        functools.partial(_kernel_v2, lanes_per_block=LB, bf16_contract=bf16),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L_pad, d, n_pad), grad_dtype),
            jax.ShapeDtypeStruct((L_pad, d, m), grad_dtype),
            jax.ShapeDtypeStruct((L_pad, 8, 128), jnp.float32),
        ],
    )(
        delta_i.astype(jnp.int32),
        delta_j.astype(jnp.int32),
        delta_v.astype(jnp.float32),
        sigmas.astype(jnp.float32),
        R32,
        mask32,
        Ut.astype(io_dtype),
        Vt.astype(io_dtype),
    )

    gut = gut[:L, :, :n]
    gvt = gvt[:L]
    Ut32 = Ut[:L, :, :n].astype(jnp.float32)
    Vt32 = Vt[:L].astype(jnp.float32)
    sigma_sq, sigma_u_sq, sigma_v_sq = sigmas[0], sigmas[1], sigmas[2]
    neg_ll = (
        vals[:L, 0, 0] / (2 * sigma_sq)
        + jnp.sum(Ut32 * Ut32, axis=(1, 2)) / (2 * sigma_u_sq)
        + jnp.sum(Vt32 * Vt32, axis=(1, 2)) / (2 * sigma_v_sq)
    )
    return neg_ll, gut, gvt


def _kernel_coeffs(
    # scalar prefetch
    di_ref,  # (L,) int32 delta row per lane
    dj_ref,  # (L,) int32 delta col per lane
    dv_ref,  # (L,) f32 delta value per lane
    # inputs
    r_ref,  # (bn, m) base ratings block (shared across the lane block)
    mask_ref,  # (bn, m) base rated mask block
    ut_ref,  # (LB, d, bn) transposed factor block
    vt_ref,  # (LB, d, m)
    gut_ref,  # (LB, d, bn) ascent direction (transposed)
    gvt_ref,  # (LB, d, m)
    # outputs
    acc_ref,  # (LB, 8, 128) f32: per-lane reductions packed at row 0,
    # cols 0..4 = [a1, a2, a11, a12, a22]
    *,
    lanes_per_block: int,
):
    """Data-term reductions of the line-search quartic (poly-LS kernel).

    Along the ray (U + a*gu, V + a*gv) the masked squared error is an exact
    quartic in ``a`` with coefficients built from five masked reductions of
    E = mask*(r - pred), P1 = gu V^T + U gv^T, P2 = gu gv^T:
    a1 = <E, P1>, a2 = <E, P2>, a11 = <mask*P1, P1>, a12 = <mask*P1, P2>,
    a22 = <mask*P2, P2>.  One streaming pass over the same blocks as
    ``_kernel_v2`` (4 MXU contractions per lane vs its 3); the rest of the
    coefficient assembly (regularizer terms, sigma scaling) is cheap host-jit
    math in ``pmf_line_coeffs_t``.
    """
    rblk = pl.program_id(1)
    bn = r_ref.shape[0]
    m = r_ref.shape[1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, m), 1)
    ocol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    orow0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0

    base_r = r_ref[...].astype(jnp.float32)
    base_mask = mask_ref[...].astype(jnp.float32)

    for l in range(lanes_per_block):  # unrolled over the lane block
        lane = pl.program_id(0) * lanes_per_block + l
        ut = ut_ref[l]  # (d, bn)
        vt = vt_ref[l]  # (d, m)
        gut = gut_ref[l]
        gvt = gvt_ref[l]

        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bn, m) from (d, bn) x (d, m)
        pred = dot(ut, vt)
        p1 = dot(gut, vt) + dot(ut, gvt)
        p2 = dot(gut, gvt)

        di = di_ref[lane] - rblk * bn
        dj = dj_ref[lane]
        hit = (rows == di) & (cols == dj)
        maskv = jnp.where(hit, 1.0, base_mask)
        e = maskv * (jnp.where(hit, dv_ref[lane], base_r) - pred)
        mp1 = maskv * p1
        mp2 = maskv * p2

        a1 = jnp.sum(e * p1)
        a2 = jnp.sum(e * p2)
        a11 = jnp.sum(mp1 * p1)
        a12 = jnp.sum(mp1 * p2)
        a22 = jnp.sum(mp2 * p2)
        packed = jnp.where(
            orow0 & (ocol == 0), a1,
            jnp.where(orow0 & (ocol == 1), a2,
                      jnp.where(orow0 & (ocol == 2), a11,
                                jnp.where(orow0 & (ocol == 3), a12,
                                          jnp.where(orow0 & (ocol == 4),
                                                    a22, 0.0)))))

        @pl.when(rblk == 0)
        def _():
            acc_ref[l] = packed

        @pl.when(rblk != 0)
        def _():
            acc_ref[l] = acc_ref[l] + packed


@functools.partial(
    jax.jit, static_argnames=("block_rows", "lanes_per_block", "bf16")
)
def pmf_line_coeffs_t(
    Ut: jax.Array,  # (L, d, n) TRANSPOSED factors (current accepted point)
    Vt: jax.Array,  # (L, d, m)
    Gut: jax.Array,  # (L, d, n) ascent direction
    Gvt: jax.Array,  # (L, d, m)
    R: jax.Array,  # (n, m) base observed values (shared)
    rated: jax.Array,  # (n, m) base rated mask (shared)
    delta_i: jax.Array,  # (L,) int32
    delta_j: jax.Array,  # (L,) int32
    delta_v: jax.Array,  # (L,) f32
    sigmas: jax.Array,  # (3,) [sigma_sq, sigma_u_sq, sigma_v_sq]
    block_rows: int = 256,
    lanes_per_block: int = 8,
    bf16: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Improvement-quartic coefficients (c1..c4) per lane for poly-LS.

    delta(a) = f(U, V) - f(U + a*gu, V + a*gv)
             = c1*a + c2*a^2 + c3*a^3 + c4*a^4   (exact; see models.pmf
    ._delta_poly for the scalar twin).  Data reductions stream through
    ``_kernel_coeffs``; the regularizer inner products are computed here
    directly (small (L, d, rows) arrays)."""
    L, d, n = Ut.shape
    m = Vt.shape[2]
    bn = min(block_rows, _round_up(n, 8))
    n_pad = _round_up(n, bn)
    LB = lanes_per_block
    L_pad = _round_up(L, LB)

    io_dtype = jnp.bfloat16 if bf16 else jnp.float32
    R32 = R.astype(io_dtype)
    mask32 = rated.astype(io_dtype)
    if n_pad != n:
        R32 = jnp.pad(R32, ((0, n_pad - n), (0, 0)))
        mask32 = jnp.pad(mask32, ((0, n_pad - n), (0, 0)))
        padn = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n)))
        Ut_k, Gut_k = padn(Ut), padn(Gut)
    else:
        Ut_k, Gut_k = Ut, Gut
    Vt_k, Gvt_k = Vt, Gvt
    if L_pad != L:
        padL = lambda x: jnp.pad(x, ((0, L_pad - L),) + ((0, 0),) * (x.ndim - 1))
        Ut_k, Vt_k = padL(Ut_k), padL(Vt_k)
        Gut_k, Gvt_k = padL(Gut_k), padL(Gvt_k)
        delta_i, delta_j, delta_v = padL(delta_i), padL(delta_j), padL(delta_v)

    grid = (L_pad // LB, n_pad // bn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, m), lambda lb, r, *_: (r, 0)),
            pl.BlockSpec((bn, m), lambda lb, r, *_: (r, 0)),
            pl.BlockSpec((LB, d, bn), lambda lb, r, *_: (lb, 0, r)),
            pl.BlockSpec((LB, d, m), lambda lb, r, *_: (lb, 0, 0)),
            pl.BlockSpec((LB, d, bn), lambda lb, r, *_: (lb, 0, r)),
            pl.BlockSpec((LB, d, m), lambda lb, r, *_: (lb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((LB, 8, 128), lambda lb, r, *_: (lb, 0, 0)),
        ],
    )
    acc = pl.pallas_call(
        functools.partial(_kernel_coeffs, lanes_per_block=LB),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((L_pad, 8, 128), jnp.float32)],
    )(
        delta_i.astype(jnp.int32),
        delta_j.astype(jnp.int32),
        delta_v.astype(jnp.float32),
        R32,
        mask32,
        Ut_k.astype(io_dtype),
        Vt_k.astype(io_dtype),
        Gut_k.astype(io_dtype),
        Gvt_k.astype(io_dtype),
    )[0]

    a2 = acc[:L, 0, 1]
    a11 = acc[:L, 0, 2]
    a12 = acc[:L, 0, 3]
    a22 = acc[:L, 0, 4]

    Gut32 = Gut[:, :, :n].astype(jnp.float32)
    Gvt32 = Gvt.astype(jnp.float32)
    s, su, sv = sigmas[0], sigmas[1], sigmas[2]
    b2 = 0.5 * (jnp.sum(Gut32 * Gut32, axis=(1, 2)) / su
                + jnp.sum(Gvt32 * Gvt32, axis=(1, 2)) / sv)
    # c1 = a1/s - (<U,gu>/su + <V,gv>/sv) algebraically — but that is a
    # catastrophic cancellation of two large reductions (the difference is
    # the squared gradient norm, ~0 near convergence; in bf16 the noise
    # drove spurious accept/converge flips and 5x extra epochs).  The
    # directional derivative of f along its own ascent gradient is exactly
    # -|g|^2, so compute c1 from the f32 gradients directly.
    c1 = (jnp.sum(Gut32 * Gut32, axis=(1, 2))
          + jnp.sum(Gvt32 * Gvt32, axis=(1, 2)))
    c2 = -(a11 - 2.0 * a2) / (2.0 * s) - b2
    c3 = -a12 / s
    c4 = -a22 / (2.0 * s)
    return c1, c2, c3, c4


def _kernel_fused(
    # scalar prefetch
    di_ref,  # (L,) int32 delta row per lane
    dj_ref,  # (L,) int32 delta col per lane
    dv_ref,  # (L,) f32 delta value per lane
    sig_ref,  # (3,) f32 [sigma_sq, sigma_u_sq, sigma_v_sq]
    ls_ref,  # (3,) f32 [lr0, stop_thresh, min_lr]
    # inputs (all resident: block index constant over the whole grid)
    r_ref,  # (n_pad, m) base ratings — DMA'd ONCE for the entire sweep
    mask_ref,  # (n_pad, m) base rated mask
    ut0_ref,  # (d, n_pad) base U factors (shared start point of every lane)
    vt0_ref,  # (d, m)
    # outputs (written at the last step)
    uo_ref,  # (LB, d, n_pad)
    vo_ref,  # (LB, d, m)
    fo_ref,  # (LB, 8, 128) final neg_ll at [l, 0, 0]
    # scratch
    u_s,  # VMEM (LB, d, n_pad) per-lane factor state, persists across steps
    v_s,  # VMEM (LB, d, m)
    gu_s,  # VMEM (LB, d, n_pad) gradients at the current accepted point
    gv_s,  # VMEM (LB, d, m)
    up_t,  # VMEM (d, n_pad) f32 proposal temp (reused lane by lane)
    vp_t,  # VMEM (d, m) f32
    gup_t,  # VMEM (d, n_pad) f32 proposal-gradient temp
    gvp_t,  # VMEM (d, m) f32
    f_s,  # SMEM (LB,) f32 current neg_ll per lane
    lr_s,  # SMEM (LB,) f32 learning rate per lane
    done_s,  # SMEM (LB,) int32 converged flag per lane
    *,
    lanes_per_block: int,
    block_rows: int,
    bf16_contract: bool,
):
    """The WHOLE adaptive line search in one kernel (see caller docstring).

    Grid: (lane-blocks, 1 + max_steps); step 0 initializes per-lane state from
    the shared base point, steps 1..max_steps propose/evaluate/select. All
    line-search state lives in VMEM/SMEM scratch so HBM sees only: the base
    matrices once, the factors in once, and the final factors/values out once.
    Converged lanes skip their matmuls entirely (dynamic ``pl.when``) —
    something the unfused host loop cannot do (it runs every lane until the
    whole batch converges).
    """
    lane0 = pl.program_id(0) * lanes_per_block
    step = pl.program_id(1)
    last_step = pl.num_programs(1) - 1
    n_pad = r_ref.shape[0]
    m = r_ref.shape[1]
    bn = block_rows
    n_chunks = n_pad // bn

    inv_sig = 1.0 / sig_ref[0]
    sigma_sq = sig_ref[0]
    sigma_u_sq = sig_ref[1]
    sigma_v_sq = sig_ref[2]

    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, m), 1)
    corner = (
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    ) & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)

    cdt = jnp.bfloat16 if bf16_contract else jnp.float32

    def eval_point(lane):
        """neg_ll + ascent grads at (up_t, vp_t); writes gup_t/gvp_t."""
        pv = vp_t[...]
        pv_c = pv.astype(cdt)
        sqerr = jnp.float32(0.0)
        for c in range(n_chunks):
            pu_c = up_t[:, c * bn:(c + 1) * bn].astype(cdt)  # (d, bn)
            pred = jax.lax.dot_general(
                pu_c, pv_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bn, m)
            di = di_ref[lane] - c * bn
            hit = (rows == di) & (cols == dj_ref[lane])
            base_mask = mask_ref[c * bn:(c + 1) * bn, :].astype(jnp.float32)
            base_r = r_ref[c * bn:(c + 1) * bn, :].astype(jnp.float32)
            maskv = jnp.where(hit, 1.0, base_mask)
            err = maskv * (jnp.where(hit, dv_ref[lane], base_r) - pred)
            resid = (err * inv_sig).astype(cdt)
            gup_t[:, c * bn:(c + 1) * bn] = jax.lax.dot_general(
                pv_c, resid, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) - up_t[:, c * bn:(c + 1) * bn] / sigma_u_sq
            gvp_part = jax.lax.dot_general(
                pu_c, resid, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d, m)
            if c == 0:
                gvp_t[...] = gvp_part - pv / sigma_v_sq
            else:
                gvp_t[...] = gvp_t[...] + gvp_part
            sqerr = sqerr + jnp.sum(err * err)
        return (
            sqerr / (2 * sigma_sq)
            + jnp.sum(up_t[...] * up_t[...]) / (2 * sigma_u_sq)
            + jnp.sum(pv * pv) / (2 * sigma_v_sq)
        )

    @pl.when(step == 0)
    def _init():
        for l in range(lanes_per_block):
            lane = lane0 + l
            up_t[...] = ut0_ref[...].astype(jnp.float32)
            vp_t[...] = vt0_ref[...].astype(jnp.float32)
            f0 = eval_point(lane)
            u_s[l] = up_t[...].astype(u_s.dtype)
            v_s[l] = vp_t[...].astype(v_s.dtype)
            gu_s[l] = gup_t[...].astype(gu_s.dtype)
            gv_s[l] = gvp_t[...].astype(gv_s.dtype)
            f_s[l] = f0
            lr_s[l] = ls_ref[0]
            done_s[l] = 0

    @pl.when(step != 0)
    def _step():
        for l in range(lanes_per_block):
            lane = lane0 + l

            @pl.when(done_s[l] == 0)
            def _():
                lr = lr_s[l]
                up_t[...] = u_s[l].astype(jnp.float32) + lr * gu_s[l].astype(
                    jnp.float32
                )
                vp_t[...] = v_s[l].astype(jnp.float32) + lr * gv_s[l].astype(
                    jnp.float32
                )
                fp = eval_point(lane)
                f_old = f_s[l]
                accept = jnp.isfinite(fp) & (fp < f_old)
                conv = jnp.where(
                    accept, (f_old - fp) < ls_ref[1], lr * 0.5 < ls_ref[2]
                )

                @pl.when(accept)
                def _():
                    u_s[l] = up_t[...].astype(u_s.dtype)
                    v_s[l] = vp_t[...].astype(v_s.dtype)
                    gu_s[l] = gup_t[...].astype(gu_s.dtype)
                    gv_s[l] = gvp_t[...].astype(gv_s.dtype)
                    f_s[l] = fp
                    lr_s[l] = lr * 1.25

                @pl.when(jnp.logical_not(accept))
                def _():
                    lr_s[l] = lr * 0.5

                done_s[l] = conv.astype(jnp.int32)

    @pl.when(step == last_step)
    def _writeout():
        for l in range(lanes_per_block):
            uo_ref[l] = u_s[l].astype(uo_ref.dtype)
            vo_ref[l] = v_s[l].astype(vo_ref.dtype)
            fo_ref[l] = jnp.where(corner, f_s[l], 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("max_steps", "block_rows", "lanes_per_block", "bf16"),
)
def pmf_lookahead_fused_t(
    Ut0: jax.Array,  # (d, n) base factors — every lane starts here
    Vt0: jax.Array,  # (d, m)
    R: jax.Array,  # (n, m) base observed values (shared)
    rated: jax.Array,  # (n, m) base rated mask (shared)
    delta_i: jax.Array,  # (L,) int32
    delta_j: jax.Array,  # (L,) int32
    delta_v: jax.Array,  # (L,) f32
    sigmas: jax.Array,  # (3,) [sigma_sq, sigma_u_sq, sigma_v_sq]
    ls_params: jax.Array,  # (3,) [lr0, stop_thresh, min_lr]
    max_steps: int,
    block_rows: int = 256,
    lanes_per_block: int = 8,
    bf16: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Whole-line-search fused lookahead refit: ONE pallas_call per sweep.

    Equivalent to ``models.pmf.fit_lookahead_batch``'s kernel-per-step
    while_loop (same adaptive accept/reject trajectory, reference semantics
    python-pmf/pmf.py:194-224) but with the entire loop inside the kernel:
    the base R/mask are DMA'd to VMEM once for ALL lanes and steps, and the
    per-step factor/gradient round-trips through HBM (~1 MB/lane-step)
    vanish — HBM sees only the base matrices once plus the final per-lane
    factors out.

    MEASURED NEGATIVE RESULT on v5e (BENCHMARKS.md "kernel headroom"): the
    bench workload is compute-bound at the d=10 MXU roofline (~10% MXU
    utilization from the 10-wide contraction), not HBM-bound, so removing
    the HBM traffic buys nothing while the resident base matrices force
    block_rows=128 (VMEM) and the per-lane dynamic branches break Mosaic's
    matmul pipelining: 12.4k scores/s vs 23.3k for the per-step
    ``pmf_batched_value_grad_t`` path on identical inputs (bit-identical
    scores, rel diff ~1e-7). Kept as the exact, tested fallback for shapes
    where the balance differs (larger d raises the compute roofline; the
    per-step path's HBM bill grows with n*m). The production path remains
    the unfused kernel.

    Returns (neg_ll (L,), Ut (L, d, n), Vt (L, d, m)).
    """
    L = delta_i.shape[0]
    d, n = Ut0.shape
    m = Vt0.shape[1]
    bn = min(block_rows, _round_up(n, 8))
    n_pad = _round_up(n, bn)
    LB = lanes_per_block
    L_pad = _round_up(L, LB)

    io_dtype = jnp.bfloat16 if bf16 else jnp.float32
    R32 = R.astype(io_dtype)
    mask32 = rated.astype(io_dtype)
    if n_pad != n:
        R32 = jnp.pad(R32, ((0, n_pad - n), (0, 0)))
        mask32 = jnp.pad(mask32, ((0, n_pad - n), (0, 0)))
        Ut0 = jnp.pad(Ut0, ((0, 0), (0, n_pad - n)))
    if L_pad != L:
        padL = lambda x: jnp.pad(x, ((0, L_pad - L),))
        delta_i, delta_j, delta_v = padL(delta_i), padL(delta_j), padL(delta_v)

    grid = (L_pad // LB, 1 + max_steps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, m), lambda lb, s, *_: (0, 0)),
            pl.BlockSpec((n_pad, m), lambda lb, s, *_: (0, 0)),
            pl.BlockSpec((d, n_pad), lambda lb, s, *_: (0, 0)),
            pl.BlockSpec((d, m), lambda lb, s, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((LB, d, n_pad), lambda lb, s, *_: (lb, 0, 0)),
            pl.BlockSpec((LB, d, m), lambda lb, s, *_: (lb, 0, 0)),
            pl.BlockSpec((LB, 8, 128), lambda lb, s, *_: (lb, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((LB, d, n_pad), io_dtype),
            pltpu.VMEM((LB, d, m), io_dtype),
            pltpu.VMEM((LB, d, n_pad), io_dtype),
            pltpu.VMEM((LB, d, m), io_dtype),
            pltpu.VMEM((d, n_pad), jnp.float32),
            pltpu.VMEM((d, m), jnp.float32),
            pltpu.VMEM((d, n_pad), jnp.float32),
            pltpu.VMEM((d, m), jnp.float32),
            pltpu.SMEM((LB,), jnp.float32),
            pltpu.SMEM((LB,), jnp.float32),
            pltpu.SMEM((LB,), jnp.int32),
        ],
    )

    uo, vo, fo = pl.pallas_call(
        functools.partial(
            _kernel_fused,
            lanes_per_block=LB,
            block_rows=bn,
            bf16_contract=bf16,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L_pad, d, n_pad), io_dtype),
            jax.ShapeDtypeStruct((L_pad, d, m), io_dtype),
            jax.ShapeDtypeStruct((L_pad, 8, 128), jnp.float32),
        ],
    )(
        delta_i.astype(jnp.int32),
        delta_j.astype(jnp.int32),
        delta_v.astype(jnp.float32),
        sigmas.astype(jnp.float32),
        ls_params.astype(jnp.float32),
        R32,
        mask32,
        Ut0.astype(io_dtype),
        Vt0.astype(io_dtype),
    )

    return (
        fo[:L, 0, 0],
        uo[:L, :, :n].astype(jnp.float32),
        vo[:L].astype(jnp.float32),
    )


def pmf_batched_value_grad_reference(
    U, V, R, rated, delta_i, delta_j, delta_v, sigmas
):
    """Pure-JAX oracle with identical semantics (used for tests / non-TPU)."""
    sigma_sq, sigma_u_sq, sigma_v_sq = sigmas[0], sigmas[1], sigmas[2]

    def one(u, v, di, dj, dv):
        mask = rated.astype(u.dtype).at[di, dj].set(1.0)
        rv = R.astype(u.dtype).at[di, dj].set(dv)
        pred = u @ v.T
        resid = mask * (rv - pred)
        neg_ll = (
            jnp.sum(resid * resid) / (2 * sigma_sq)
            + jnp.sum(u * u) / (2 * sigma_u_sq)
            + jnp.sum(v * v) / (2 * sigma_v_sq)
        )
        gu = resid @ v / sigma_sq - u / sigma_u_sq
        gv = resid.T @ u / sigma_sq - v / sigma_v_sq
        return neg_ll, gu, gv

    return jax.vmap(one)(U, V, delta_i, delta_j, delta_v)
