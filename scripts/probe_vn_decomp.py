"""Decompose the vn total-variance lookahead rate (VERDICT r4 weak #7 /
next #8): where do the 7.5 cand/s go, and does the Cholesky-factor
covariance parameterization (vnormal.VNConfig cov_param="chol") buy a real
speedup over the reference-parity eigh-projection descent?

Stages per (candidate, node) lane at the bench shape (24x24, d=2, 8
Gauss-Legendre nodes, dual 50-step refits — bench.bench_vn_total_variance):
  A. PMF MAP refit       (50-step adaptive descent on the factors)
  B. approx KL refit     (50 proposals; parity path pays one (96,96) eigh
                          PER PROPOSAL in project_psd, plus a slogdet in
                          the KL; reference: active_pmf.py:251-288)
  C. statistic           (vn_pred_mean_var einsums — cheap)

Measured variants (all host-tiled at the bench's 64-candidate tile):
  full_eigh      A+B+C, cov_param=psd-project  (the recorded bench row)
  full_chol      A+B+C, cov_param=chol         (the candidate fast path)
  pmf_only       A+C (approx_refit_steps=0): stage-A floor
  approx_eigh    B+C only (refit_lookahead=False), parity path
  approx_chol    B+C only, chol path
plus ranking agreement tau(full_eigh, full_chol) and top-pick match — the
criterion consumes only the ranking, so agreement is the correctness bar
for using the fast path in the bench row.

Writes probe_vn_decomp.json next to BENCHMARKS.md. Run on the TPU chip
(between queue generations — never alongside a running chip queue);
AMF_PLATFORM=cpu works for a functional smoke run.
"""

import json
import time

import numpy as np

from amf_tpu.utils.platform import setup as platform_setup

platform_setup(use_x64=False)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from amf_tpu import types  # noqa: E402
from amf_tpu.active.criteria import KEY_FUNCS  # noqa: E402
from amf_tpu.active.lookahead import (  # noqa: E402
    LookaheadConfig, lookahead_scores, vn_adapter)
from amf_tpu.data import make_fake_data  # noqa: E402
from amf_tpu.models import pmf, vnormal  # noqa: E402

N, M, D = 24, 24, 2
TILE = 64


def setup():
    rng = np.random.default_rng(1)
    real, known, _ = make_fake_data(
        num_users=N, num_items=M, rank=D, mask_type=0.2, rng=rng)
    prob = types.problem_from_dense(real, known)
    pcfg = pmf.PMFConfig(latent_d=D, max_fit_steps=200)
    key = jax.random.PRNGKey(0)
    pst = pmf.init_state(key, N, M, pcfg, prob, dtype=jnp.float32)
    pst, _ = pmf.fit(pst, prob, pcfg)
    return prob, pcfg, pst, key


def measure(tag, prob, pcfg, pst, key, cov_param, refit_lookahead=True,
            approx_steps=50):
    vcfg = vnormal.VNConfig(latent_d=D, max_fit_steps=100,
                            cov_param=cov_param)
    ast = vnormal.initialize_approx(jax.random.fold_in(key, 1), pst, vcfg)
    ast = vnormal.fit_normal(ast, pst, prob, vcfg)[0]
    lcfg = LookaheadConfig(
        rating_values=(), refit_lookahead=refit_lookahead,
        pmf_refit_steps=50, approx_refit_steps=approx_steps,
        n_integration_nodes=8)
    crit = KEY_FUNCS["total-variance"]
    adapter = vn_adapter(vcfg)
    cand_all = np.flatnonzero(np.asarray(prob.queryable).ravel())
    padded = np.concatenate([
        cand_all,
        np.full((-len(cand_all)) % TILE, cand_all[-1], cand_all.dtype),
    ])
    tiles = [jnp.asarray(padded[t:t + TILE], jnp.int32)
             for t in range(0, len(padded), TILE)]
    fn = jax.jit(lambda k, c: lookahead_scores(
        crit, pst, ast, prob, k, pcfg, adapter, lcfg, cand=c))
    jax.block_until_ready(fn(key, tiles[0]))  # compile
    t0 = time.perf_counter()
    outs = [fn(jax.random.fold_in(key, 2 + t), c)
            for t, c in enumerate(tiles)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    rate = len(cand_all) / dt
    scores = np.concatenate([np.asarray(o) for o in outs])[:len(cand_all)]
    print(f"{tag:>14}: {rate:8.2f} cand/s ({dt:.2f} s, "
          f"{len(cand_all)} cand)", flush=True)
    return rate, cand_all, scores


def main():
    prob, pcfg, pst, key = setup()
    out = {"shape": [N, M, D], "tile": TILE,
           "platform": jax.default_backend()}

    def flush_json():
        print(json.dumps(out, indent=1), flush=True)
        with open("probe_vn_decomp.json", "w") as f:
            json.dump(out, f, indent=1)

    rate_eigh, cand, s_eigh = measure(
        "full_eigh", prob, pcfg, pst, key, "psd-project")
    rate_chol, _, s_chol = measure(
        "full_chol", prob, pcfg, pst, key, "chol")
    rate_pmf, _, _ = measure(
        "pmf_only", prob, pcfg, pst, key, "psd-project", approx_steps=0)

    # ranking agreement, guarded: a variant whose scores are non-finite on
    # this platform (the chol path NaN'd wholesale on TPU f32 when first
    # recorded) must yield a diagnostic row, not a nanargmin crash
    from scipy import stats as sps
    sel = np.isfinite(s_eigh) & np.isfinite(s_chol)
    tau = float(sps.kendalltau(s_eigh[sel], s_chol[sel])[0]) \
        if sel.sum() >= 2 else None
    pick_match = bool(
        cand[np.nanargmin(s_eigh)] == cand[np.nanargmin(s_chol)]) \
        if np.isfinite(s_eigh).any() and np.isfinite(s_chol).any() else None

    out.update({
        "rate_full_eigh": rate_eigh,
        "rate_full_chol": rate_chol,
        "rate_pmf_only": rate_pmf,
        "chol_speedup_full": rate_chol / rate_eigh,
        "tau_eigh_vs_chol": tau,
        "top_pick_match": pick_match,
        "n_finite": int(sel.sum()),
        "n_finite_eigh": int(np.isfinite(s_eigh).sum()),
        "n_finite_chol": int(np.isfinite(s_chol).sum()),
    })
    flush_json()  # partial result survives a timeout of the approx stages

    rate_ae, _, _ = measure(
        "approx_eigh", prob, pcfg, pst, key, "psd-project",
        refit_lookahead=False)
    rate_ac, _, _ = measure(
        "approx_chol", prob, pcfg, pst, key, "chol", refit_lookahead=False)
    out.update({
        "rate_approx_only_eigh": rate_ae,
        "rate_approx_only_chol": rate_ac,
        "chol_speedup_approx_stage": rate_ac / rate_ae,
    })
    flush_json()


if __name__ == "__main__":
    main()
