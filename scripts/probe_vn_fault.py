import sys, time
import numpy as np
import jax, jax.numpy as jnp
from amf_tpu import types
from amf_tpu.data import make_fake_data
from amf_tpu.models import pmf, vnormal

stage = sys.argv[1]
n, me, d = 24, 24, 2
L = 64
rng = np.random.default_rng(1)
real, known, _ = make_fake_data(num_users=n, num_items=me, rank=d, mask_type=0.2, rng=rng)
prob = types.problem_from_dense(real, known)
pcfg = pmf.PMFConfig(latent_d=d, max_fit_steps=200)
vcfg = vnormal.VNConfig(latent_d=d, max_fit_steps=100)
key = jax.random.PRNGKey(0)
pst = pmf.init_state(key, n, me, pcfg, prob, dtype=jnp.float32)
pst, _ = pmf.fit(pst, prob, pcfg)
ast = vnormal.initialize_approx(jax.random.fold_in(key, 1), pst, vcfg)
ast = vnormal.fit_normal(ast, pst, prob, vcfg)[0]
jax.block_until_ready(ast.mean)
print("base ok", flush=True)

cand = np.flatnonzero(np.asarray(prob.queryable).ravel())[:L]
ii, jj = cand // me, cand % me
vv = np.full(L, 3.0, np.float32)

if stage == "eigh":
    A = jnp.asarray(rng.normal(size=(L, 96, 96)), jnp.float32)
    S = A @ jnp.swapaxes(A, 1, 2)
    f = jax.jit(lambda S: jnp.linalg.eigh(S)[0].sum())
    out = f(S); jax.block_until_ready(out); print("eigh ok", out, flush=True)
elif stage == "refit":
    def one(i, j, v):
        p2 = prob.add_rating(i, j, v)
        p = pmf.refresh_mean_rating(pst, p2)
        p, _ = pmf.fit(p, p2, pcfg, max_steps=50)
        return p.U.sum()
    f = jax.jit(jax.vmap(one))
    out = f(jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(vv))
    jax.block_until_ready(out); print("refit ok", flush=True)
elif stage == "vnfit":
    def one(i, j, v):
        p2 = prob.add_rating(i, j, v)
        a2 = vnormal.fit_normal(ast, pst, p2, vcfg, max_steps=50)[0]
        return a2.mean.sum()
    f = jax.jit(jax.vmap(one))
    out = f(jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(vv))
    jax.block_until_ready(out); print("vnfit ok", flush=True)
elif stage == "initfit":
    # per-lane random-cov init (the lookahead's reference semantics,
    # active_pmf.py:671-673) + KL refit
    def one(i, j, v, k):
        p2 = prob.add_rating(i, j, v)
        a0 = vnormal.initialize_approx(k, pst, vcfg)
        a2 = vnormal.fit_normal(a0, pst, p2, vcfg, max_steps=50)[0]
        return a2.mean.sum()
    ks = jax.random.split(jax.random.PRNGKey(7), L)
    f = jax.jit(jax.vmap(one))
    out = f(jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(vv), ks)
    jax.block_until_ready(out); print("initfit ok", flush=True)
elif stage == "stat":
    # KL refit + total-variance stat (approx_pred_means_vars sum)
    def one(i, j, v):
        p2 = prob.add_rating(i, j, v)
        a2 = vnormal.fit_normal(ast, pst, p2, vcfg, max_steps=50)[0]
        return vnormal.approx_pred_means_vars(a2, p2, vcfg)[1].sum()
    f = jax.jit(jax.vmap(one))
    out = f(jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(vv))
    jax.block_until_ready(out); print("stat ok", flush=True)
elif stage == "initstat":
    def one(i, j, v, k):
        p2 = prob.add_rating(i, j, v)
        a0 = vnormal.initialize_approx(k, pst, vcfg)
        a2 = vnormal.fit_normal(a0, pst, p2, vcfg, max_steps=50)[0]
        return vnormal.approx_pred_means_vars(a2, p2, vcfg)[1].sum()
    ks = jax.random.split(jax.random.PRNGKey(7), L)
    f = jax.jit(jax.vmap(one))
    out = f(jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(vv), ks)
    jax.block_until_ready(out); print("initstat ok", flush=True)
