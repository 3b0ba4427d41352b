"""Measure accept/reject mix of the adaptive-LR refit line search.

Sizes the polynomial-in-alpha line-search idea (ROADMAP perf #1): each
reject currently costs a full value+grad kernel pass; with quartic
coefficients along the fixed direction, rejects become free scalar evals
and each *epoch* costs 2 passes (grad + coeffs).  Win iff
passes_now / (2 * accepts) > 1, i.e. rejects-per-accept > 1.

Run on the chip: python scripts/probe_ls_rejects.py [n m d L steps]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from amf_tpu.utils import platform

print("backend:", platform.setup(use_x64=False))

from amf_tpu import types
from amf_tpu.data import make_fake_data
from amf_tpu.models import pmf

argv = [int(a) for a in sys.argv[1:]]
n, m, d, L, steps = (argv + [943, 1682, 10, 64, 60])[:5]

rng = np.random.default_rng(0)
real, known, _ = make_fake_data(num_users=n, num_items=m, rank=d,
                                mask_type=0.05, rng=rng)
prob = types.problem_from_dense(real, known)
cfg = pmf.PMFConfig(latent_d=d, max_fit_steps=300)
key = jax.random.PRNGKey(0)
st = pmf.init_state(key, n, m, cfg, prob, dtype=jnp.float32)
st, _ = pmf.fit(st, prob, cfg)

cand = np.flatnonzero(np.asarray(prob.queryable).ravel())[:L]
ii = jnp.asarray(cand // m)
jj = jnp.asarray(cand % m)
vv = jnp.full((L,), 3.0, jnp.float32)

from amf_tpu.ops import pallas_kernels as pk

sigmas = jnp.stack([st.sigma_sq, st.sigma_u_sq, st.sigma_v_sq]).astype(
    jnp.float32)
kernel = jax.jit(lambda Ut, Vt: pk.pmf_batched_value_grad_t(
    Ut, Vt, prob.R_obs, prob.rated, ii, jj, vv, sigmas,
    block_rows=256, lanes_per_block=8))

U = jnp.broadcast_to(st.U[None], (L, n, d)).astype(jnp.float32).transpose(0, 2, 1)
V = jnp.broadcast_to(st.V[None], (L, m, d)).astype(jnp.float32).transpose(0, 2, 1)
f, gu, gv = kernel(U, V)
lr = jnp.full((L,), cfg.learning_rate, jnp.float32)
done = jnp.zeros((L,), bool)

tot_accept = tot_reject = 0
epoch_rejects = []
for it in range(steps):
    Up = U + lr[:, None, None] * gu
    Vp = V + lr[:, None, None] * gv
    fp, gup, gvp = kernel(Up, Vp)
    accept = jnp.isfinite(fp) & (fp < f) & ~done
    reject = ~accept & ~done
    conv = jnp.where(accept, (f - fp) < cfg.stop_thresh,
                     lr * 0.5 < cfg.min_learning_rate)
    sel = lambda a, b: jnp.where(accept[:, None, None], a, b)
    U, V = sel(Up, U), sel(Vp, V)
    gu, gv = sel(gup, gu), sel(gvp, gv)
    lr = jnp.where(accept, lr * 1.25, jnp.where(reject, lr * 0.5, lr))
    f = jnp.where(accept, fp, f)
    done = done | ((accept | reject) & conv)
    na, nr = int(accept.sum()), int(reject.sum())
    tot_accept += na
    tot_reject += nr
    if bool(done.all()):
        break

live_passes = tot_accept + tot_reject
print(f"shape=({n},{m},d={d}) L={L} iters={it+1}")
print(f"lane-iters: accept={tot_accept} reject={tot_reject} "
      f"rejects/accept={tot_reject / max(tot_accept, 1):.2f}")
print(f"kernel passes now (per lane-epoch avg): "
      f"{live_passes / max(tot_accept, 1):.2f}; poly-LS would be 2.00")
