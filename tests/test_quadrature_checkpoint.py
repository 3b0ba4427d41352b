import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from amf_tpu.ops import quadrature
from amf_tpu.types import rating_bounds
from amf_tpu.utils.checkpoint import LoopCheckpointer


def test_discrete_weights_match_scipy():
    vals = (1.0, 2.0, 3.0, 4.0, 5.0)
    bounds = rating_bounds(vals)
    mean = jnp.asarray([2.3, 4.9])
    std = jnp.asarray([0.7, 1.5])
    w = np.asarray(quadrature.discrete_weights(mean, std, bounds))
    for i in range(2):
        want = np.diff(stats.norm.cdf(bounds, loc=float(mean[i]),
                                      scale=float(std[i])))
        np.testing.assert_allclose(w[i], want, rtol=1e-10)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-12)


def test_gauss_legendre_expectation():
    """E[f(X)] over ~N(mu, sigma^2) restricted to +-2 sigma for a polynomial
    has a closed form; GL nodes must integrate it near-exactly."""
    mean = jnp.asarray([1.0])
    std = jnp.asarray([2.0])
    pts, wts = quadrature.gauss_legendre_nodes(mean, std, n_nodes=32)
    # integral of x^2 * pdf over [mu-2s, mu+2s]
    got = float(jnp.sum(pts**2 * wts, -1)[0])
    xs = np.linspace(1 - 4, 1 + 4, 400001)
    trap = getattr(np, "trapezoid", None) or np.trapz
    want = trap(xs**2 * stats.norm.pdf(xs, 1.0, 2.0), xs)
    assert got == pytest.approx(want, rel=1e-6)


def test_simpson_weights_integrate_pdf():
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    mean = jnp.asarray([3.0])
    std = jnp.asarray([1.0])
    w = np.asarray(quadrature.simpson_weights(mean, std, vals))[0]
    # integrating f(v)=1 against the pdf over [1, 5] (Simpson over the grid)
    got = w.sum()
    want = stats.norm.cdf(5, 3, 1) - stats.norm.cdf(1, 3, 1)
    # coarse grid (h=1) Simpson on a peaked pdf carries ~1% inherent error
    assert got == pytest.approx(want, rel=0.02)


def test_checkpointer_roundtrip(tmp_path):
    import jax.numpy as jnp

    from amf_tpu import types

    path = str(tmp_path / "ck.pkl")
    real = np.arange(16, dtype=float).reshape(4, 4) + 1
    known = np.eye(4, dtype=bool)
    prob = types.problem_from_dense(real, known)

    ck = LoopCheckpointer(path, every=1)
    records = [(4, 1.0, None, None), (5, 0.9, (0, 1), None),
               (6, 0.8, (2, 3), None)]
    ck.update("pred-variance", records, force=True)

    ck2 = LoopCheckpointer(path)
    prob2, recs = ck2.replay("pred-variance", prob, real)
    assert len(recs) == 3
    assert bool(prob2.rated[0, 1]) and bool(prob2.rated[2, 3])
    assert float(prob2.R_obs[0, 1]) == real[0, 1]
    assert int(prob2.n_rated) == 6
    # unknown key: fresh start
    prob3, recs3 = ck2.replay("random", prob, real)
    assert recs3 == [] and int(prob3.n_rated) == 4


def test_fold_in_name_stable():
    """Criterion key streams must not depend on Python's salted str hash
    (reproducibility across processes; checkpoint resume determinism)."""
    import subprocess
    import sys

    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from amf_tpu.utils.rng import fold_in_name; "
        "print(jax.random.key_data(fold_in_name(jax.random.PRNGKey(0), "
        "'pred-variance')).tolist())"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True,
            env={"PYTHONHASHSEED": str(s), "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": repo_root},
        ).stdout.strip()
        for s in (1, 2)
    }
    assert len(outs) == 1 and "" not in outs


def test_checkpoint_fingerprint_guard(tmp_path):
    from amf_tpu.utils.checkpoint import LoopCheckpointer, problem_fingerprint

    real_a = np.arange(16, dtype=float).reshape(4, 4) + 1
    rated = np.eye(4, dtype=bool)
    test = ~rated
    path = str(tmp_path / "fp.pkl")
    fa = problem_fingerprint(real_a, rated, test)
    ck = LoopCheckpointer(path, fingerprint=fa)
    ck.update("random", [(4, 1.0, None, None)], force=True)
    # same problem: loads fine
    LoopCheckpointer(path, fingerprint=fa)
    # different data: refuses
    with pytest.raises(ValueError, match="different problem"):
        LoopCheckpointer(
            path, fingerprint=problem_fingerprint(real_a + 1.0, rated, test)
        )
    # same data, different test split: also refuses (split contamination)
    other_test = np.roll(test, 1, axis=0)
    with pytest.raises(ValueError, match="different problem"):
        LoopCheckpointer(
            path, fingerprint=problem_fingerprint(real_a, rated, other_test)
        )


def test_checkpoint_era_guard(tmp_path):
    """A checkpoint written by one engine era must not be RESUMED under
    another (mixed-era traces are the 58k-15d random-arm failure mode) —
    it is moved aside and the run re-records from scratch, so unattended
    era-hygiene `--redo` queue jobs cannot die on a surviving stale
    checkpoint. Era-less legacy checkpoints count as 'pre-era'."""
    import os

    from amf_tpu.utils.checkpoint import LoopCheckpointer

    path = str(tmp_path / "era.pkl")
    ck = LoopCheckpointer(path, era="esjd-leapfrog-v1")
    ck.update("random", [(4, 1.0, None, None)], force=True)
    # same era: resumes
    assert LoopCheckpointer(
        path, era="esjd-leapfrog-v1").completed_records("random")
    # era-agnostic caller (no era arg): resumes
    assert LoopCheckpointer(path).completed_records("random")
    # different era: stale ckpt moved aside, fresh start
    ck2 = LoopCheckpointer(path, era="esjd-leapfrog-v2")
    assert ck2.completed_records("random") is None
    assert not os.path.exists(path)
    assert os.path.exists(path + ".stale-era")

    legacy = str(tmp_path / "legacy.pkl")
    ck = LoopCheckpointer(legacy)  # written before era stamping existed
    ck.update("random", [(4, 1.0, None, None)], force=True)
    ck3 = LoopCheckpointer(legacy, era="esjd-leapfrog-v1")
    assert ck3.completed_records("random") is None
    assert os.path.exists(legacy + ".stale-era")


def test_checkpoint_strips_eval_matrices(tmp_path):
    from amf_tpu.utils.checkpoint import LoopCheckpointer

    path = str(tmp_path / "slim.pkl")
    ck = LoopCheckpointer(path, every=1)
    big = np.ones((50, 50))
    ck.update("k", [(4, 1.0, None, None), (5, 0.9, (0, 1), big)], force=True)
    ck2 = LoopCheckpointer(path)
    recs = ck2.completed_records("k")
    assert recs[1][3] is None  # eval grid not persisted


def test_resume_continues_exact_key_stream(tmp_path, rng):
    """Picks after a resume must equal the uninterrupted run's picks
    (step-indexed PRNG streams; no split-chain prefix reuse)."""
    import jax.numpy as jnp

    from amf_tpu import types
    from amf_tpu.active import loop
    from amf_tpu.data import make_fake_data

    real, known, vals = make_fake_data(
        num_users=6, num_items=6, rank=2, data_type=5, mask_type="diag", rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)

    full = loop.run_active_pmf(
        prob, real, ["random"], latent_d=2, rating_values=vals,
        steps=5, seed=0,
    )["random"]

    ck = str(tmp_path / "resume.pkl")
    loop.run_active_pmf(
        prob, real, ["random"], latent_d=2, rating_values=vals,
        steps=3, seed=0, checkpoint_path=ck,
    )
    resumed = loop.run_active_pmf(
        prob, real, ["random"], latent_d=2, rating_values=vals,
        steps=5, seed=0, checkpoint_path=ck,
    )["random"]

    assert [r[2] for r in resumed] == [r[2] for r in full]


def test_resume_truncates_to_requested_steps(tmp_path, rng):
    import jax.numpy as jnp

    from amf_tpu import types
    from amf_tpu.active import loop
    from amf_tpu.data import make_fake_data

    real, known, vals = make_fake_data(
        num_users=6, num_items=6, rank=2, data_type=5, mask_type="diag", rng=rng
    )
    prob = types.problem_from_dense(real, known, dtype=jnp.float64)
    ck = str(tmp_path / "trunc.pkl")
    loop.run_active_pmf(
        prob, real, ["random"], latent_d=2, rating_values=vals,
        steps=5, seed=0, checkpoint_path=ck,
    )
    small = loop.run_active_pmf(
        prob, real, ["random"], latent_d=2, rating_values=vals,
        steps=2, seed=0, checkpoint_path=ck,
    )["random"]
    assert len(small) == 2
