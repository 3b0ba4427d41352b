"""Validate + time the fused chol kernel on the real chip (args passed
explicitly -- closure-captured arrays get constant-folded into the HLO)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from amf_tpu.ops.chol_kernel import (
    chol_solve_sample_reference, chol_solve_sample_tpu,
)

rng = np.random.default_rng(0)
d = 20

B = 1000
A = rng.normal(size=(B, d, d)).astype(np.float32)
S = A @ np.swapaxes(A, 1, 2) + d * np.eye(d, dtype=np.float32)
rhs = rng.normal(size=(B, d)).astype(np.float32)
z = rng.normal(size=(B, d)).astype(np.float32)
ref = np.asarray(chol_solve_sample_reference(*map(jnp.asarray, (S, rhs, z))))
got = np.asarray(chol_solve_sample_tpu(*map(jnp.asarray, (S, rhs, z))))
err = np.max(np.abs(got - ref) / (np.abs(ref) + 1e-3))
print(f"correctness: max rel err {err:.2e}", flush=True)


def many(k, S, rhs, z, fn):
    def body(carry, kk):
        zz = z + jax.random.normal(kk, z.shape, z.dtype) * 1e-6
        return carry + fn(S, rhs, zz).sum(), None
    out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                          jax.random.split(k, 20))
    return out


for B in (512 * 70, 512 * 306):
    A = rng.normal(size=(B, d, d)).astype(np.float32)
    S = jnp.asarray(A @ np.swapaxes(A, 1, 2) + d * np.eye(d, dtype=np.float32))
    rhs = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    for name, fn in (("kernel", chol_solve_sample_tpu),
                     ("jnp ref", chol_solve_sample_reference)):
        g = jax.jit(lambda k, S, r, zz, fn=fn: many(k, S, r, zz, fn))
        out = g(jax.random.PRNGKey(0), S, rhs, z); jax.block_until_ready(out)
        t0 = time.time(); out = g(jax.random.PRNGKey(1), S, rhs, z)
        jax.block_until_ready(out)
        print(f"B={B}: {name} {(time.time()-t0)/20*1e3:.2f} ms/iter",
              flush=True)
