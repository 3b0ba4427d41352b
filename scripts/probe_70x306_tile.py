"""Probe: time per-tile exp-variance lookahead dispatches at the 70x306
reference scale on the real TPU chip (the fused whole-sweep program at this
shape crashed the TPU worker in round 2; see experiments/README.md)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from amf_tpu import types
from amf_tpu.active.gibbs_loop import split_query_test
from amf_tpu.data.loaders import load_npz_schema
from amf_tpu.models import bpmf_gibbs, pmf

TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_TILES = int(sys.argv[2]) if len(sys.argv) > 2 else 4

data = load_npz_schema("experiments/drugbank-70x306-gibbs/data.npz")
real, ratings = data["_real"], data["_ratings"]
vals = tuple(data.get("_rating_vals", ())) or ()
rng = np.random.default_rng(0)
query_on, test_on = split_query_test(real, ratings, "all", rng)
if "_test_on" in data:
    test_on = data["_test_on"]
    query_on = query_on & ~np.asarray(test_on, bool)

dtype = jnp.float32
problem = types.problem_from_ratings(ratings, real=real, test=test_on, dtype=dtype)
problem = problem.replace(queryable=jnp.asarray(query_on))
n, m = problem.shape
print(f"problem {n}x{m}, queryable={int(np.asarray(query_on).sum())}, vals={vals}")

pcfg = pmf.PMFConfig(latent_d=20, subtract_mean=True)
gcfg = bpmf_gibbs.GibbsConfig(latent_d=20, subtract_mean=True)
num_samps, la_samps = 128, 30

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)

t0 = time.time()
pst = pmf.init_state(k1, n, m, pcfg, problem=problem, dtype=dtype)
pst, _ = pmf.fit(pst, problem, pcfg)
chain = bpmf_gibbs.init_chain(pst)
bounds = tuple(types.rating_bounds(vals)) if vals else None
_, stats, _ = bpmf_gibbs.run_chain(
    k2, chain, problem, gcfg, num_samps, value_bounds=bounds)
jax.block_until_ready(stats.var)
print(f"base fit+chain: {time.time()-t0:.1f}s")


@jax.jit
def tile_scores(k, pst, prob, stats, cand):
    return bpmf_gibbs.exp_variance_scores(
        k, pst, prob, pcfg, gcfg, stats, vals,
        num_samps=la_samps, n_base_samples=num_samps, cand=cand,
    )


cand_all = np.flatnonzero(np.asarray(query_on).ravel()).astype(np.int32)
print(f"{len(cand_all)} candidates -> {-(-len(cand_all)//TILE)} tiles of {TILE}")

t0 = time.time()
s = tile_scores(k3, pst, problem, stats, jnp.asarray(cand_all[:TILE]))
jax.block_until_ready(s)
print(f"tile 0 (compile+run): {time.time()-t0:.1f}s, "
      f"finite={int(np.isfinite(np.asarray(s)).sum())}/{TILE}")

times = []
for t in range(1, N_TILES):
    t0 = time.time()
    s = tile_scores(k3, pst, problem, stats,
                    jnp.asarray(cand_all[t * TILE:(t + 1) * TILE]))
    jax.block_until_ready(s)
    times.append(time.time() - t0)
    print(f"tile {t}: {times[-1]:.2f}s")
if times:
    per = float(np.median(times))
    total = per * (-(-len(cand_all) // TILE))
    print(f"median tile: {per:.2f}s -> full sweep ~{total/60:.1f} min, "
          f"x15 steps ~{15*total/3600:.1f} h")
