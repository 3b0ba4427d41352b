"""Compare two digests of the same experiment arm, per criterion.

Primary use: quantify run-to-run reproducibility when an arm is re-recorded
with an IDENTICAL config (same data seed 0, same model seed, same sampler
era) — e.g. the drugbank-94x425 stan arm re-run after a fresh checkout
purged its raw pickle. Under the strict-band adjudication (PARITY.md
adjudication 3) the question is whether the committed pred-variance
endpoint rise (+1.4se) is a stable property of the config or single-run
drift; the spread between identical-config reruns is a direct lower bound
on the drift term.

Usage:
    python scripts/compare_digests.py <old_digest.json.gz> <new_digest.json.gz>

Prints, per criterion: err-curve mean absolute difference, endpoint values,
AUC values, and Kendall tau between the first-step criterion maps (map
reproducibility across the reruns).
"""

import gzip
import json
import sys

import numpy as np
from scipy import stats


def load(path):
    with gzip.open(path, "rt") as f:
        return json.load(f)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    rows = []
    for key in sorted(set(old["criteria"]) & set(new["criteria"])):
        o, n = old["criteria"][key], new["criteria"][key]
        eo, en = np.asarray(o["err"], float), np.asarray(n["err"], float)
        L = min(len(eo), len(en))
        mad = float(np.mean(np.abs(eo[:L] - en[:L])))
        row = {
            "key": key,
            "steps": [len(eo), len(en)],
            "err_mad": round(mad, 5),
            "endpoint": [round(float(eo[-1]), 5), round(float(en[-1]), 5)],
            "auc": [round(float(o["auc"]), 4), round(float(n["auc"]), 4)],
        }
        fo, fn = o.get("first_step_evals"), n.get("first_step_evals")
        if fo is not None and fn is not None and len(fo) == len(fn):
            fo, fn = np.asarray(fo, float), np.asarray(fn, float)
            ok = np.isfinite(fo) & np.isfinite(fn)
            if ok.sum() > 2:
                tau = stats.kendalltau(fo[ok], fn[ok])[0]
                row["first_step_map_tau"] = round(float(tau), 4)
        rows.append(row)
    only = sorted(set(old["criteria"]) ^ set(new["criteria"]))
    out = {"old": sys.argv[1], "new": sys.argv[2], "criteria": rows,
           "only_in_one": only}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
