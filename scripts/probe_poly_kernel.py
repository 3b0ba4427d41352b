"""A/B the poly-LS epoch loop on the lane-blocked Pallas refit path
(bench.py's pmf-refit kernel microbench shape).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_poly_kernel.py
"""
import sys
import time

import numpy as np

from amf_tpu.utils import platform

print("backend:", platform.setup(use_x64=False))

import jax
import jax.numpy as jnp

from amf_tpu import types
from amf_tpu.data import make_fake_data
from amf_tpu.models import pmf

N, M, D = 943, 1682, 10
N_CAND = 1024
TILE = 128
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
LANE_BLOCK = 8
BLOCK_ROWS = 256

rng = np.random.default_rng(0)
real, known, _ = make_fake_data(num_users=N, num_items=M, rank=D, noise=0.5,
                                mask_type=0.05 * 100000 / (N * M), rng=rng)
prob = types.problem_from_dense(real, known)
prob = jax.tree.map(
    lambda x: x.astype(jnp.float32)
    if jnp.issubdtype(x.dtype, jnp.floating) else x, prob)
pcfg = pmf.PMFConfig(latent_d=D, subtract_mean=False)
pst = pmf.init_state(jax.random.PRNGKey(0), N, M, pcfg, problem=prob,
                     dtype=jnp.float32)
pst, _ = pmf.fit(pst, prob, pcfg)

cand_all = np.argsort(~np.asarray(prob.queryable).ravel(), kind="stable")
cand_all = jnp.asarray(cand_all[:N_CAND], dtype=jnp.int32)
di, dj = cand_all // M, cand_all % M
dv = jnp.sum(pst.U[di] * pst.V[dj], axis=1)

for poly in (False, True):
    @jax.jit
    def score_all(di, dj, dv, p=poly):
        def one_tile(args):
            ti, tj, tv = args
            _, _, neg_ll = pmf.fit_lookahead_batch(
                pst, prob, ti, tj, tv, pcfg, max_steps=STEPS,
                lane_block=LANE_BLOCK, block_rows=BLOCK_ROWS, bf16=True,
                poly_ls=p)
            return neg_ll
        shape = (-1, TILE)
        return jax.lax.map(
            one_tile, (di.reshape(shape), dj.reshape(shape),
                       dv.reshape(shape))).ravel()

    out = score_all(di, dj, dv)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(score_all(di, dj, dv))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    s = np.asarray(out)
    print(f"poly_ls={poly} steps={STEPS}: {N_CAND} cands in {best*1e3:.0f} ms "
          f"-> {N_CAND/best:.0f} scores/s; head {s[:3]}")
