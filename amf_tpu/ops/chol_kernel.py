"""Fused batched small-matrix Cholesky solve+sample Pallas kernel.

The Gibbs conditional row draws (models/bpmf_gibbs._sample_rows; reference:
python-pmf/bayes_pmf.py sample_feature :189-216) need, for every row i of a
factor, a draw  x_i = S_i^{-1} b_i + L_i^{-T} z_i  with S_i = L_i L_i^T a
(d x d) posterior precision, d the latent rank (<= ~20). At lookahead width
this is ~10^5 independent 20x20 factorizations per sweep. XLA:TPU lowers
batched ``jnp.linalg.cholesky`` of small matrices to a d-step loop that
re-reads/rewrites the whole batched array every step — measured ~80 ms per
call at (512*306, 20, 20), which made the 70x306 exp-variance lookahead
chain >25 s per 512-lane tile (the whole-chain cost is 98% these solves).

This kernel does the complete factor-and-solve per matrix inside VMEM with
the batch in the lane dimension: one HBM read of S, one write of x, all
O(d^3) work on (d, B) vector registers. Layouts:

  S_cols: (d*d, B)  — rows [j*d:(j+1)*d) hold column j of S (symmetric)
  rhs_z:  (2*d, B)  — rhs rows then z rows
  out:    (d_pad, B)

The sample is computed as  x = L^{-T}(L^{-1} b + z)  (one forward + one back
substitution) — algebraically identical to mean + L^{-T} z, differing only
in rounding from the two-back-substitution jnp reference path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(s_ref, bz_ref, out_ref, *, d: int, d_pad: int):
    S = s_ref[...]  # (d*d, B) column-major columns of S
    bz = bz_ref[...]  # (2d, B)
    dt = S.dtype

    # --- Cholesky (left-looking, fully unrolled; cols[j] is column j of L,
    # zeros above the diagonal) ---
    cols = []
    inv_diag = []
    for j in range(d):
        colj = S[j * d:(j + 1) * d, :]  # (d, B)
        for k in range(j):
            colj = colj - cols[k] * cols[k][j:j + 1, :]
        inv = jax.lax.rsqrt(colj[j:j + 1, :])
        colj = colj * inv
        if j:  # zero the (garbage) entries above the diagonal
            row_ix = jax.lax.broadcasted_iota(jnp.int32, colj.shape, 0)
            colj = jnp.where(row_ix >= j, colj, jnp.zeros((), dt))
        cols.append(colj)
        inv_diag.append(inv)

    # --- forward substitution L y = b ---
    ys = []
    for j in range(d):
        v = bz[j:j + 1, :]
        for k in range(j):
            v = v - cols[k][j:j + 1, :] * ys[k]
        ys.append(v * inv_diag[j])

    # --- w = y + z; back substitution L^T x = w ---
    ws = [ys[j] + bz[d + j:d + j + 1, :] for j in range(d)]
    xs = [None] * d
    for j in reversed(range(d)):
        v = ws[j]
        for k in range(j + 1, d):
            v = v - cols[j][k:k + 1, :] * xs[k]
        xs[j] = v * inv_diag[j]

    pad = d_pad - d
    if pad:
        xs = xs + [jnp.zeros_like(xs[0])] * pad
    out_ref[...] = jnp.concatenate(xs, axis=0)


def chol_solve_sample_tpu(
    S: jax.Array,  # (B, d, d) SPD precision matrices
    rhs: jax.Array,  # (B, d)
    z: jax.Array,  # (B, d) standard-normal draws
    block_b: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x = S^{-1} rhs + chol(S)^{-T} z for a batch of small SPD matrices."""
    B, d, _ = S.shape
    dtype = S.dtype
    d_pad = _round_up(d, 8)
    bb = min(block_b, _round_up(B, 128))
    B_pad = _round_up(B, bb)

    # columns of S contiguously: Sf[j*d + i, b] = S[b, i, j]
    Sf = jnp.transpose(S, (2, 1, 0)).reshape(d * d, B)
    bz = jnp.concatenate([rhs.T, z.T], axis=0)  # (2d, B)
    if B_pad != B:
        padw = ((0, 0), (0, B_pad - B))
        # identity padding keeps the factorization finite in dead lanes
        eye_cols = jnp.broadcast_to(
            jnp.eye(d, dtype=dtype).T.reshape(d * d, 1), (d * d, B_pad - B)
        )
        Sf = jnp.concatenate([Sf, eye_cols], axis=1)
        bz = jnp.pad(bz, padw)

    out = pl.pallas_call(
        functools.partial(_kernel, d=d, d_pad=d_pad),
        grid=(B_pad // bb,),
        in_specs=[
            pl.BlockSpec((d * d, bb), lambda b: (0, b)),
            pl.BlockSpec((2 * d, bb), lambda b: (0, b)),
        ],
        out_specs=pl.BlockSpec((d_pad, bb), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((d_pad, B_pad), dtype),
        interpret=interpret,
    )(Sf, bz)
    return out[:d, :B].T


def chol_solve_sample_reference(
    S: jax.Array, rhs: jax.Array, z: jax.Array
) -> jax.Array:
    """Pure-JAX oracle (same math; two back-substitutions like the
    historical _sample_rows path)."""
    L = jnp.linalg.cholesky(S)
    y = jax.scipy.linalg.solve_triangular(L, rhs[..., None], lower=True)
    mean = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )[..., 0]
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), z[..., None], lower=False
    )[..., 0]
    return mean + x


def _current_platform() -> str:
    """Platform computation will actually land on.

    ``jax.default_backend()`` alone is wrong in this environment: a TPU
    backend may be pre-registered while the work is pinned to a virtual CPU
    mesh (the multichip dryrun / tests set ``jax_default_device`` or
    ``jax_platforms`` to cpu)."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform
    try:
        return jax.default_backend()
    except RuntimeError:
        return "cpu"


def use_kernel(dtype, d: int) -> bool:
    """Fast path only where it wins: TPU backend, f32, small d."""
    return _current_platform() == "tpu" and dtype == jnp.float32 and d <= 32


def chol_solve_sample(
    S: jax.Array, rhs: jax.Array, z: jax.Array
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU f32, jnp reference elsewhere.

    Accepts arbitrary leading batch dims on S (..., d, d) / rhs, z (..., d).
    """
    d = S.shape[-1]
    if not use_kernel(S.dtype, d):
        return chol_solve_sample_reference(S, rhs, z)
    batch_shape = S.shape[:-2]
    B = 1
    for s in batch_shape:
        B *= s
    out = chol_solve_sample_tpu(
        S.reshape(B, d, d), rhs.reshape(B, d), z.reshape(B, d)
    )
    return out.reshape(*batch_shape, d)
