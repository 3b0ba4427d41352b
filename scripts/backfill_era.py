"""One-time engine-era backfill for artifacts that predate run-time stamping.

Run-time era stamping (results pickles carry ``_sampler_era``/``_solver_era``
written by the CLI that produced them; digests copy the field) landed in
round 4. Everything recorded before that has no stamp, and the era cannot be
re-derived at digest time (the advisor's round-3 high finding: stamping from
the currently imported constants mislabels old runs as current). This script
backfills eras from PROVENANCE:

1. Surviving raw results pickles carry a ``git-rev:<sha>`` note
   (run/experiment.py). The era of the engine that produced the run is
   decided by git ancestry against the era-boundary commits:
     - nuts.py: 64c0e0f (08-18 00:40, "cost-normalized step-size objective")
       is the last behavior change before SAMPLER_ERA="esjd-leapfrog-v1" was
       defined; runs at/after it are esjd-leapfrog-v1, earlier ones pre-esjd
       (the frozen dual-averaging / intermediate-warmup lineage).
     - mmmf.py: 78ef288 (08-18 22:40, "rescale the ADMM dual on exit") is
       the last behavior change before SOLVER_ERA="eigh-svt-v1"; earlier
       runs are pre-eigh-svt (the gesdd-SVT lineage).

2. Committed digests (raw pickles gone) are stamped from the documented
   per-workload provenance table below — each entry cites the commit whose
   message/README row records WHEN that run happened, not merely when its
   digest file last changed.

Idempotent; prints every stamp it applies. Digest-level stamps never
overwrite an existing era field.
"""

import gzip
import json
import os
import pickle
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NUTS_BOUNDARY = "64c0e0f"   # >= this commit: esjd-leapfrog-v1
MMMF_BOUNDARY = "78ef288"   # >= this commit: eigh-svt-v1

# Committed-digest provenance (relative to experiments/). Values:
# (field, era, justification).
DIGEST_PROVENANCE = {
    # Chip-queue re-records with the fixed ESJD sampler, run between
    # 64c0e0f (08-18 00:40) and commit 546d4ea (08-18 21:59, "Chip-queue
    # artifacts: fixed-sampler 58k-15d stan re-record, 75k stan complete,
    # newmovies-20d recorded"):
    "movielens-58k-from5pct-test5pct-15d/digest_stan.json.gz": (
        "sampler_era", "esjd-leapfrog-v1",
        "re-recorded with the fixed sampler in 546d4ea; NOTE the random arm "
        "resumed a frozen-era checkpoint (experiments/README.md) — its "
        "per-arm era is stamped pre-esjd below until the splice replaces it",
    ),
    "movielens-75k-from5pct-test5pct/digest_stan.json.gz": (
        "sampler_era", "esjd-leapfrog-v1",
        "recorded complete in 546d4ea (08-18 21:59), after the 64c0e0f "
        "sampler boundary",
    ),
    "movielens-58k-newmovies-10pct-20d/digest_stan_newitems.json.gz": (
        "sampler_era", "esjd-leapfrog-v1",
        "recorded in the same fixed-sampler chip queue (546d4ea)",
    ),
    # Pre-boundary stan runs (digest content committed before 64c0e0f, or
    # documented as the frozen-sampler recordings):
    "movielens-100k-from5pct-test5pct/digest_stan.json.gz": (
        "sampler_era", "pre-esjd",
        "recorded f6a7358 (08-17 00:18), before the ESJD fix f10fece; "
        "VERDICT r3 notes the flat-at-1.216 frozen-chain signature",
    ),
    "drugbank-94x425-5to1/digest_stan.json.gz": (
        "sampler_era", "pre-esjd",
        "recorded by 6a139df (08-17 22:20), before the 64c0e0f boundary",
    ),
    "criteria_10x10_r1/digest_stan.json.gz": (
        "sampler_era", "pre-esjd",
        "recorded b57e4b2 (08-17 02:57), before the ESJD fix",
    ),
    "movielens-58k-newmovies-10pct-10d/digest_stan_newitems.json.gz": (
        "sampler_era", "pre-esjd",
        "recorded 4980192 (08-17 01:18), before the ESJD fix",
    ),
    "10x10_discrete2_d2/digest_stan.json.gz": (
        "sampler_era", "pre-esjd",
        "run predates the ESJD fix (digest only re-serialized later); no "
        "post-fix d2 stan run is documented anywhere in round 3",
    ),
    "10x10_discrete4_d4/digest_stan.json.gz": (
        "sampler_era", "pre-esjd",
        "recorded into 6a139df (08-17 22:20): after f10fece but before the "
        "64c0e0f warmup-objective change — an intermediate warmup lineage, "
        "conservatively labeled pre-esjd",
    ),
    # drugbank-94x425/digest_stan.json.gz: NOT listed — its raw pickle
    # survives with note git-rev 0de892a; the pickle-stamping pass + a
    # --check re-digest carry the era through the normal path.
    #
    # mmmf digests: every committed one predates the 78ef288 solver
    # boundary. These runs are NOT defective (the gesdd-NaN pathology
    # poisoned only the purged newmovies-20d recording and the discarded
    # 58k-15d checkpoint) but their era is honestly pre-eigh-svt.
    "10x10_discrete2_d2/digest_mmmf.json.gz": (
        "solver_era", "pre-eigh-svt", "recorded ad656ee (08-18 05:20)"),
    "10x10_discrete2_d2/seed1/digest_mmmf.json.gz": (
        "solver_era", "pre-eigh-svt", "recorded ad656ee"),
    "10x10_discrete2_d2/seed2/digest_mmmf.json.gz": (
        "solver_era", "pre-eigh-svt", "recorded ad656ee"),
    "10x10_discrete2_d2/seed3/digest_mmmf.json.gz": (
        "solver_era", "pre-eigh-svt", "recorded ad656ee"),
    "10x10_discrete2_d2/seed4/digest_mmmf.json.gz": (
        "solver_era", "pre-eigh-svt", "recorded ad656ee"),
    "drugbank-94x425/digest_mmmf.json.gz": (
        "solver_era", "pre-eigh-svt", "recorded fa3e392 (08-17 11:33)"),
    "drugbank-94x425-5to1/digest_mmmf.json.gz": (
        "solver_era", "pre-eigh-svt",
        "recorded 6a139df (08-17 22:20), CPU f64 complete run"),
}

# Per-arm era overrides within a digest (criterion-level "era" note):
CRITERION_ERA = {
    "movielens-58k-from5pct-test5pct-15d/digest_stan.json.gz": {
        "random": ("pre-esjd",
                   "resumed a frozen-era checkpoint at 181/200 "
                   "(experiments/README.md round-3 row)"),
    },
}


def _rev_exists(rev: str) -> bool:
    return subprocess.run(
        ["git", "rev-parse", "--verify", "--quiet", rev + "^{commit}"],
        cwd=REPO, capture_output=True).returncode == 0


def _is_ancestor(a: str, b: str) -> bool:
    return subprocess.run(["git", "merge-base", "--is-ancestor", a, b],
                          cwd=REPO).returncode == 0


def stamp_pickles() -> None:
    import glob
    for path in sorted(glob.glob(
            os.path.join(REPO, "experiments", "**", "results_*.pkl"),
            recursive=True)):
        with open(path, "rb") as f:
            res = pickle.load(f)
        kind = res.get("_kind")
        field = {"stan": "_sampler_era", "mmmf": "_solver_era"}.get(kind)
        if field is None or res.get(field) is not None:
            continue
        notes = (res.get("_args") or {}).get("note") or []
        revs = [m.group(1) for n in notes
                for m in [re.match(r"git-rev:([0-9a-f]+)", str(n))] if m]
        if not revs:
            print(f"SKIP {path}: no git-rev note")
            continue
        rev = revs[0].removesuffix("-dirty")
        # an UNRESOLVABLE rev must not silently stamp the stale era (the
        # merge-base exit code for 'unknown revision' equals 'not an
        # ancestor'): a current-era run mislabeled stale would be
        # re-recorded for nothing — leave it unstamped and loud instead
        if not _rev_exists(rev):
            print(f"SKIP {path}: git-rev {rev[:12]} does not resolve "
                  "in this repo; not stamping")
            continue
        boundary = NUTS_BOUNDARY if kind == "stan" else MMMF_BOUNDARY
        current = ("esjd-leapfrog-v1" if kind == "stan" else "eigh-svt-v1")
        stale = "pre-esjd" if kind == "stan" else "pre-eigh-svt"
        era = current if _is_ancestor(boundary, rev) else stale
        res[field] = era
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(res, f)
        os.replace(tmp, path)
        print(f"STAMPED pickle {path}: {field}={era} (note rev {rev[:9]})")


def stamp_digests() -> None:
    for rel, (field, era, why) in DIGEST_PROVENANCE.items():
        path = os.path.join(REPO, "experiments", rel)
        if not os.path.exists(path):
            print(f"SKIP {rel}: missing")
            continue
        with gzip.open(path, "rt") as f:
            dg = json.load(f)
        changed = False
        if dg.get(field) is None:
            dg[field] = era
            dg[field + "_source"] = f"backfill: {why}"
            changed = True
        for crit, (cera, cwhy) in CRITERION_ERA.get(rel, {}).items():
            entry = dg.get("criteria", {}).get(crit)
            if entry is not None and entry.get("era") is None:
                entry["era"] = cera
                entry["era_source"] = f"backfill: {cwhy}"
                changed = True
        if changed:
            with gzip.open(path, "wt") as f:
                json.dump(dg, f)
            print(f"STAMPED digest {rel}: {field}={era}")
        else:
            print(f"OK {rel}: already stamped")


if __name__ == "__main__":
    os.chdir(REPO)
    stamp_pickles()
    stamp_digests()
    sys.exit(0)
