"""Parity-check machinery tests (analysis/parity.py)."""

import numpy as np

from amf_tpu.analysis import parity


def _fake_results(err_curve, key="pred-variance", kind="apmf", n=4, m=4):
    rng = np.random.default_rng(0)
    recs = [(4, err_curve[0], None, None)]
    for t, e in enumerate(err_curve[1:]):
        ev = rng.normal(size=(n, m))
        recs.append((5 + t, e, (t % n, (t + 1) % m), ev))
    rand = [(4, err_curve[0], None, None)] + [
        (5 + t, err_curve[0] * (1 - 0.01 * t), (t % n, t % m),
         rng.normal(size=(n, m)))
        for t in range(len(err_curve) - 1)
    ]
    return {
        "_real": np.ones((n, m)),
        "_rating_vals": (1.0, 2.0),
        "_kind": kind,
        key: recs,
        "random": rand,
    }


def test_check_results_pass():
    res = _fake_results([1.0, 0.8, 0.6, 0.5])
    rows = parity.check_results(res, "apmf")
    assert all(r["status"] == "pass" for r in rows), rows
    checks = {r["check"] for r in rows}
    assert checks == {"structural", "learning", "active_vs_random",
                      "initial_consistency"}


def test_initial_consistency_flags_mixed_era_arms():
    """Arms whose initial errors disagree far beyond MC noise (the 58k-15d
    frozen-checkpoint random arm: err[0] 0.9874 vs 1.2927) hard-fail the
    initial_consistency band; matching arms pass it."""
    res = _fake_results([1.0, 0.8, 0.6, 0.5])
    # desync the random arm's initial error by ~27% (the observed era mix)
    rand = res["random"]
    res["random"] = [(rand[0][0], 0.75, None, None)] + rand[1:]
    rows = parity.check_results(res, "apmf")
    row = [r for r in rows if r["check"] == "initial_consistency"][0]
    assert row["status"] == "fail", row
    assert "MIXED-ERA" in row["detail"]

    ok_rows = parity.check_results(_fake_results([1.0, 0.8, 0.6, 0.5]),
                                   "apmf")
    ok = [r for r in ok_rows if r["check"] == "initial_consistency"][0]
    assert ok["status"] == "pass", ok


def test_initial_consistency_names_nan_arms():
    """A NaN err[0] must be reported as a numeric pathology, not fall
    through the spread bands (NaN compares false) into a spurious
    MIXED-ERA verdict with arbitrary lo/hi arms; the finite arms still
    get the normal spread check."""
    res = _fake_results([1.0, 0.8, 0.6, 0.5])
    rand = res["random"]
    res["random"] = [(rand[0][0], float("nan"), None, None)] + rand[1:]
    rows = parity.check_results(res, "apmf")
    ic = [r for r in rows if r["check"] == "initial_consistency"]
    nan_row = [r for r in ic if "non-finite" in r["detail"]]
    assert nan_row and nan_row[0]["status"] == "fail"
    assert "random" in nan_row[0]["detail"]
    assert not any("MIXED-ERA" in r["detail"] for r in ic)


def test_check_dir_skips_splice_fresh_temps(tmp_path):
    """results_*_fresh.pkl / digest_*_fresh.json.gz are splice temps
    (scripts/splice_digest_key.py), not durable runs: check_experiment_dir
    must not digest them into phantom arms or let them hijack the
    cross-engine by_kind slot."""
    import glob
    import os
    import pickle

    res = _fake_results([1.0, 0.8, 0.6, 0.5], kind="stan")
    with open(tmp_path / "results_stan.pkl", "wb") as f:
        pickle.dump(res, f)
    fresh = _fake_results([2.0, 1.8, 1.7, 1.6], kind="stan")
    with open(tmp_path / "results_stan_random_fresh.pkl", "wb") as f:
        pickle.dump(fresh, f)
    rows, _ = parity.check_experiment_dir(str(tmp_path))
    assert all(r["run"] != "stan_random_fresh" for r in rows)
    made = {os.path.basename(p)
            for p in glob.glob(str(tmp_path / "digest_*.json.gz"))}
    assert made == {"digest_stan.json.gz"}


def test_check_results_fail_on_worsening():
    res = _fake_results([1.0, 1.2, 1.4, 1.5])
    rows = parity.check_results(res, "apmf")
    assert any(
        r["check"] == "learning" and r["status"] == "fail" for r in rows
    )


def test_strict_active_fails_on_rising_error():
    # err rises mildly, still within random's slack band: warn normally,
    # but a HARD fail on strict workloads (10x10/drugbank) where the
    # reference documents active beating random
    res = _fake_results([1.0, 1.01, 1.02, 1.04])
    lax_rows = parity.check_results(res, "apmf", strict_active=False)
    strict_rows = parity.check_results(res, "apmf", strict_active=True)
    get = lambda rows: [
        r for r in rows
        if r["check"] == "learning" and r["key"] == "pred-variance"
    ][0]
    assert get(lax_rows)["status"] == "warn"
    assert get(strict_rows)["status"] == "fail"


def test_noise_floor_downgrades_fail_to_warn(tmp_path):
    """A committed adjudication artifact (reliable: false) downgrades
    strict-band fails on the measured criterion to evidence-citing warns;
    reliable or unmatched artifacts leave the fail in place."""
    res = _fake_results([1.0, 1.2, 1.4, 1.5])
    rows = parity.check_results(
        res, "apmf", strict_active=True,
        noise_floored={"pred-variance": "adjudication_noise_floor.json"})
    learn = [r for r in rows if r["check"] == "learning"][0]
    assert learn["status"] == "warn"
    assert "noise floor" in learn["detail"]
    # loader: only reliable=false artifacts with criteria lists register
    import json
    (tmp_path / "adjudication_a.json").write_text(json.dumps(
        {"kind": "bayes", "criteria": ["pred-variance"], "reliable": False}))
    (tmp_path / "adjudication_b.json").write_text(json.dumps(
        {"kind": "stan", "criteria": ["exp-variance"], "reliable": True}))
    floored = parity.load_adjudications(str(tmp_path))
    assert floored == {
        ("bayes", "pred-variance"): "adjudication_a.json"}


def test_seed_passing_bands_loader(tmp_path):
    import json
    (tmp_path / "parity_report_seeds.json").write_text(json.dumps({
        "checks": [
            {"check": "seed_active_vs_random", "key": "mmmf:min-margin",
             "status": "pass", "detail": "..."},
            {"check": "seed_active_vs_random", "key": "apmf:pred-variance",
             "status": "warn", "detail": "..."},
            {"check": "active_vs_random", "key": "notseed", "status": "pass",
             "detail": "..."},
        ]}))
    got = parity._seed_passing_bands(str(tmp_path))
    assert got == {("mmmf", "min-margin", "active_vs_random"):
                   "parity_report_seeds.json"}
    assert parity._seed_passing_bands(str(tmp_path / "missing")) == {}


def test_strict_active_for_dir_names():
    assert parity.strict_active_for("experiments/10x10_discrete2_d2")
    assert parity.strict_active_for("experiments/drugbank-70x306-gibbs/")
    assert not parity.strict_active_for(
        "experiments/movielens-58k-from5pct-test5pct-15d"
    )


def test_aggregate_seed_checks(tmp_path):
    import gzip
    import json

    # three seed dirs; pred-variance beats random in 2 of 3 but loses in
    # one — the seed-mean ratio decides, per-seed noise does not. The
    # horizon must span >=10 steps or the AUC band is uninformative
    # (2-step criteria-comparison workloads) and is skipped entirely.
    ns = list(range(4, 16))
    errc = [1.0 - 0.01 * t for t in range(len(ns))]
    for k, ratio in enumerate([0.9, 0.95, 1.02]):
        d = tmp_path / f"seed{k+1}"
        d.mkdir()
        dg = {"criteria": {
            "random": {"auc": 100.0, "err": errc, "n_rated": ns},
            "pred-variance": {"auc": 100.0 * ratio, "err": errc,
                              "n_rated": ns},
        }}
        with gzip.open(d / "digest_apmf.json.gz", "wt") as f:
            json.dump(dg, f)
    rows = parity.aggregate_seed_checks(
        [str(tmp_path / f"seed{k}") for k in (1, 2, 3)], strict_active=True)
    assert len(rows) == 2
    by_check = {r["check"]: r for r in rows}
    r = by_check["seed_active_vs_random"]
    assert r["key"] == "apmf:pred-variance"
    assert r["status"] == "pass"  # mean ratio ~0.957 < 1
    assert "3 seeds" in r["detail"]
    # the declining err curve aggregates to a passing seed_learning band
    r = by_check["seed_learning"]
    assert r["key"] == "apmf:pred-variance"
    assert r["status"] == "pass"
    assert "improved on seed mean" in r["detail"]

    # a 2-step horizon produces NO seed band rows (degenerate AUC)
    for k in (1, 2, 3):
        d = tmp_path / f"seed{k}"
        dg = {"criteria": {
            "random": {"auc": 1.0, "err": [1.0, 0.9], "n_rated": [4, 5]},
            "prob-ge-3.5": {"auc": 0.5, "err": [1.0, 0.8], "n_rated": [4, 5],
                            "pick_vals": [None, 4.0]},
        }}
        with gzip.open(d / "digest_apmf.json.gz", "wt") as f:
            json.dump(dg, f)
    assert parity.aggregate_seed_checks(
        [str(tmp_path / f"seed{k}") for k in (1, 2, 3)],
        strict_active=True) == []


def test_check_results_structural_fail_on_nan():
    res = _fake_results([1.0, float("nan"), 0.6, 0.5])
    rows = parity.check_results(res, "apmf")
    assert any(
        r["check"] == "structural" and r["status"] == "fail" for r in rows
    )


def test_structural_fail_on_pinned_misclassification():
    # a misclass trace pinned at exactly 1.0 (all test cells wrong) is the
    # sign(NaN) poisoning signature — unreachable by a real predictor — and
    # must fail structurally even though every value is finite
    res = _fake_results([0.49, 1.0, 1.0, 1.0, 1.0], key="mmmf_min-margin",
                        kind="mmmf")
    rows = parity.check_results(res, "mmmf")
    r = [x for x in rows if x["check"] == "structural"
         and x["key"] == "min-margin"][0]
    assert r["status"] == "fail"
    assert "PINNED" in r["detail"]
    # but a bounded trace that merely touches 1.0 once stays structural-pass
    res2 = _fake_results([1.0, 0.8, 0.6, 0.5], key="mmmf_min-margin",
                         kind="mmmf")
    rows2 = parity.check_results(res2, "mmmf")
    r2 = [x for x in rows2 if x["check"] == "structural"
          and x["key"] == "min-margin"][0]
    assert r2["status"] == "pass"


def test_learning_label_distinguishes_flat_from_improved():
    # errs[-1] slightly above errs[0] but within improve_slack: pass, yet the
    # label must not claim "improved"
    rows = parity.check_results(_fake_results([1.0, 0.99, 1.01]), "apmf")
    r = [x for x in rows if x["check"] == "learning"][0]
    assert r["status"] == "pass"
    assert "flat within improve slack" in r["detail"]
    rows = parity.check_results(_fake_results([1.0, 0.9, 0.8]), "apmf")
    r = [x for x in rows if x["check"] == "learning"][0]
    assert "improved" in r["detail"]


def test_digest_strips_eval_grids():
    res = _fake_results([1.0, 0.8, 0.6])
    dg = parity.digest(res, "apmf")
    crit = dg["criteria"]["pred-variance"]
    assert crit["err"] == [1.0, 0.8, 0.6]
    assert len(crit["picks"]) == 3 and crit["picks"][0] is None
    # only the FIRST step's eval map is retained
    assert crit["first_step_evals"] is not None
    assert np.asarray(crit["first_step_evals"]).shape == (4, 4)


def test_cross_engine_tau():
    a = _fake_results([1.0, 0.8, 0.6], kind="bayes")
    rng = np.random.default_rng(1)
    base = rng.normal(size=(4, 4))
    # two engines with strongly agreeing first-step maps
    a["pred-variance"][1] = (5, 0.8, (0, 1), base)
    b = _fake_results([1.0, 0.9, 0.7], kind="stan")
    b["pred-variance"][1] = (5, 0.9, (0, 1), base + 0.01 * rng.normal(size=(4, 4)))
    rows = parity.check_cross_engine({"bayes": a, "stan": b})
    tau_rows = [r for r in rows if "pred-variance" in r["key"]]
    assert tau_rows and tau_rows[0]["status"] == "pass", rows


def test_check_rows_reproducible_from_digest(tmp_path):
    """Raw pickles are gitignored; the committed digest must reproduce the
    acceptance rows EXACTLY (check_experiment_dir falls back to
    digest_*.json.gz when results_*.pkl is absent)."""
    import gzip
    import json
    import pickle

    from amf_tpu.analysis.results import results_from_digest

    res = _fake_results([1.0, 0.8, 0.6, 0.5])
    # rows computed from the pickle
    with open(tmp_path / "results_apmf.pkl", "wb") as f:
        pickle.dump(res, f)
    rows_pkl, ok_pkl = parity.check_experiment_dir(str(tmp_path))
    assert ok_pkl
    # delete the pickle; the digest written by the first check remains
    (tmp_path / "results_apmf.pkl").unlink()
    rows_dg, ok_dg = parity.check_experiment_dir(str(tmp_path))
    assert ok_dg
    assert len(rows_dg) == len(rows_pkl)
    for a, b in zip(rows_pkl, rows_dg):
        assert b.pop("source") == "digest"
        assert a == b
    # and the committed digest is never overwritten by a round-trip
    with gzip.open(tmp_path / "digest_apmf.json.gz", "rt") as f:
        dg = json.load(f)
    rt = results_from_digest(dg)
    assert rt["_from_digest"] and "pred-variance" in rt


def test_digest_copies_run_time_era():
    """Digests COPY the era the producing CLI stamped into the results
    pickle at run time — never the currently imported constants (advisor
    r3 high finding: re-digesting an old-era pickle must keep its true
    era). Unstamped legacy pickles digest as the 'pre-era' sentinel."""
    res = _fake_results([1.0, 0.9], kind="stan")
    res["_sampler_era"] = "esjd-leapfrog-v1"
    assert parity.digest(res, "stan")["sampler_era"] == "esjd-leapfrog-v1"
    # a surviving OLD-era pickle keeps its recorded era on re-digest
    res["_sampler_era"] = "pre-esjd"
    assert parity.digest(res, "stan")["sampler_era"] == "pre-esjd"
    # no run-time stamp at all -> sentinel, not the current constant
    dg = parity.digest(_fake_results([1.0, 0.9], kind="stan"), "stan")
    assert dg["sampler_era"] == "pre-era"

    res = _fake_results([1.0, 0.9], kind="mmmf")
    res["_solver_era"] = "eigh-svt-v1"
    assert parity.digest(res, "mmmf")["solver_era"] == "eigh-svt-v1"
    dg = parity.digest(_fake_results([1.0, 0.9], kind="apmf"), "apmf")
    assert "sampler_era" not in dg and "solver_era" not in dg


def test_era_round_trips_through_digest_reconstruction():
    """digest -> results_from_digest -> digest keeps era + splice notes."""
    from amf_tpu.analysis.results import results_from_digest

    res = _fake_results([1.0, 0.9], kind="stan")
    res["_sampler_era"] = "esjd-leapfrog-v1"
    dg = parity.digest(res, "stan")
    dg["criteria"]["random"]["spliced"] = "fresh re-run merged at abc1234"
    dg["criteria"]["random"]["era"] = "esjd-leapfrog-v1"
    rt = parity.digest(results_from_digest(dg), "stan")
    assert rt["sampler_era"] == "esjd-leapfrog-v1"
    assert rt["criteria"]["random"]["spliced"].startswith("fresh")
    assert rt["criteria"]["random"]["era"] == "esjd-leapfrog-v1"


def test_merge_results_unions_real_matrices():
    """merge_results must union _real: digest-reconstructed dicts size _real
    to their OWN picks, so keeping only base's matrix lets the other run's
    picks index out of bounds in count_ge_cutoff_curve (plot_results merges
    engines, reference active_mmmf.py:240-245)."""
    from amf_tpu.analysis import results as R

    base = {
        "_real": np.full((3, 3), np.nan),
        "apmf_pred": [(1, 1.0, None, None), (2, 0.9, (2, 2), None)],
    }
    base["_real"][2, 2] = 5.0
    extra = {
        "_real": np.full((5, 6), np.nan),
        "bayes_pred": [(1, 1.2, None, None), (2, 1.1, (4, 5), None)],
    }
    extra["_real"][4, 5] = 4.0
    merged = R.merge_results(base, extra)
    assert merged["_real"].shape == (5, 6)
    assert merged["_real"][2, 2] == 5.0  # base value survives
    assert merged["_real"][4, 5] == 4.0  # extra value survives
    # the out-of-bounds crash: extra's pick must be addressable
    ns, counts = R.count_ge_cutoff_curve(merged, "bayes_pred", 3.5)
    assert counts[-1] == 1
    ns, counts = R.count_ge_cutoff_curve(merged, "apmf_pred", 3.5)
    assert counts[-1] == 1


def test_seed_learning_band_and_matched_downgrade(tmp_path):
    """A strict learning fail is adjudicated ONLY by a passing seed-mean of
    the same statistic (seed_learning); a passing seed band of a different
    check must not excuse it."""
    import gzip
    import json
    import pickle

    ns = list(range(4, 16))
    # rising error: single-run strict learning band FAILS
    rising = [0.48 + 0.002 * t for t in range(len(ns))]

    # seed replicates whose endpoint ratio is flat (within improve slack)
    for k in (1, 2, 3):
        d = tmp_path / f"seed{k}"
        d.mkdir()
        errs = [0.49 + (0.001 if k == 2 else -0.001) * t
                for t in range(len(ns))]
        dg = {"criteria": {
            "random": {"auc": 100.0, "err": errs, "n_rated": ns},
            "pred-variance": {"auc": 102.0, "err": errs, "n_rated": ns},
        }}
        with gzip.open(d / "digest_stan.json.gz", "wt") as f:
            json.dump(dg, f)
    rows = parity.aggregate_seed_checks(
        [str(tmp_path / f"seed{k}") for k in (1, 2, 3)], strict_active=True)
    by_check = {r["check"]: r for r in rows}
    assert by_check["seed_learning"]["status"] == "pass"
    # AUC ratio 1.02 is worse-than-random within slack -> warn on strict
    assert by_check["seed_active_vs_random"]["status"] == "warn"

    # seed report on disk + a failing single-run digest in the main dir
    report = {"checks": rows}
    (tmp_path / "parity_report_seeds.json").write_text(json.dumps(report))
    res = {
        "_real": __import__("numpy").ones((4, 4)),
        "_kind": "stan",
        "stan_pred-variance": [
            (n, e, (0, 0) if t else None, None)
            for t, (n, e) in enumerate(zip(ns, rising))],
        "stan_random": [
            (n, e, (1, 1) if t else None, None)
            for t, (n, e) in enumerate(zip(ns, rising))],
    }
    with open(tmp_path / "results_stan.pkl", "wb") as f:
        pickle.dump(res, f)
    rows, hard_ok = parity.check_experiment_dir(
        str(tmp_path), strict_active=True)
    learn = [r for r in rows
             if r["check"] == "learning" and r["key"] == "pred-variance"][0]
    assert learn["status"] == "warn"
    assert "seed-mean band of this same statistic passes" in learn["detail"]
    # the strict AUC fail (if any) must NOT be excused by seed_learning:
    # fabricate a mismatched seed report that passes only seed_learning
    mism = {"checks": [{"check": "seed_learning",
                        "key": "stan:pred-variance", "status": "pass",
                        "detail": "..."}]}
    (tmp_path / "parity_report_seeds.json").write_text(json.dumps(mism))
    bands = parity._seed_passing_bands(str(tmp_path))
    assert ("stan", "pred-variance", "learning") in bands
    assert ("stan", "pred-variance", "active_vs_random") not in bands
