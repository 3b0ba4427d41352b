"""Cross-density / cross-budget criterion-map agreement on 10x10_d2.

The reference's strongest correctness methodology (SURVEY.md §4.3,
compare_firsts.py:133-151) applied to the riskiest replacement in this
rebuild: the native NUTS sampler vs the reference's three Stan densities at
three sample budgets (results/10x10_discrete2_d2/Makefile:56-115 —
results_stan, results_stan_straightforward, results_stan_s400_nolookahead,
results_stan_s10000_nolookahead). If the sampler is right, the first-step
criterion maps of the same key must agree across densities (different
parameterizations, same posterior) and stabilize as the budget grows.

Reads committed digests (first_step_evals), computes pairwise Kendall τ per
shared criterion, writes experiments/10x10_discrete2_d2/cross_density_tau.json.
Acceptance floor: the Gibbs-vs-Stan cross-IMPLEMENTATION τ floor of 0.4 used
by analysis/parity.check_cross_engine; same-sampler cross-density pairs are
expected to clear it with room.
"""

import gzip
import itertools
import json
import os
import sys

import numpy as np
from scipy import stats

DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "experiments", "10x10_discrete2_d2")

ARMS = {
    "w0identity_s200": "digest_stan.json.gz",
    "straightforward_s200": "digest_stan_straightforward.json.gz",
    "w0identity_s400": "digest_stan_s400.json.gz",
    "w0identity_s10000": "digest_stan_s10000.json.gz",
    # independent replicate of the largest budget (reference Makefile's
    # '_b' target) — same config, fresh chains: its tau vs w0identity_s10000
    # is the repeatability ceiling every other pair is read against
    "w0identity_s10000_b": "digest_stan_s10000_b.json.gz",
    # straightforward density at the 2x budget (crosses density x budget)
    "straightforward_s400": "digest_stan_straightforward_s400.json.gz",
    "gibbs_s200": "digest_bayes.json.gz",
}


def first_maps(path):
    with gzip.open(path, "rt") as f:
        dg = json.load(f)
    out = {}
    for crit, c in dg.get("criteria", {}).items():
        fse = c.get("first_step_evals")
        if fse is not None:
            out[crit] = np.asarray(fse, float)
    return out, dg.get("sampler_era") or dg.get("solver_era")


def main():
    maps, eras = {}, {}
    for arm, fname in ARMS.items():
        p = os.path.join(DIR, fname)
        if not os.path.exists(p):
            print(f"missing {fname}; run the d2 arms first")
            continue
        maps[arm], eras[arm] = first_maps(p)
    if len(maps) < 2:
        sys.exit("fewer than two recorded arms; nothing to compare")

    rows = []
    for a, b in itertools.combinations(sorted(maps), 2):
        for crit in sorted(set(maps[a]) & set(maps[b])):
            ma, mb = maps[a][crit], maps[b][crit]
            if ma.shape != mb.shape:
                continue
            mask = np.isfinite(ma) & np.isfinite(mb)
            if mask.sum() < 8:
                continue
            # random maps are iid draws; agreement is undefined by design
            if crit == "random":
                continue
            tau = float(stats.kendalltau(ma[mask], mb[mask])[0])
            rows.append({"pair": f"{a} vs {b}", "criterion": crit,
                         "tau": round(tau, 4), "n_cells": int(mask.sum())})
            print(f"{a:22s} vs {b:22s} {crit:15s} tau={tau:+.3f}")

    taus = [r["tau"] for r in rows]
    summary = {
        "arms": {a: {"era": eras[a], "criteria": sorted(maps[a])}
                 for a in maps},
        "pairs": rows,
        "tau_floor": 0.4,
        "min_tau": min(taus) if taus else None,
        "median_tau": float(np.median(taus)) if taus else None,
        "all_above_floor": bool(taus and min(taus) >= 0.4),
    }
    out = os.path.join(DIR, "cross_density_tau.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nwrote {out}: min tau "
          f"{summary['min_tau']}, median {summary['median_tau']}")


if __name__ == "__main__":
    main()
