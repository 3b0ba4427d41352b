"""Splice ONE criterion's records from a fresh results pickle into a
committed digest_<kind>.json.gz.

Raw results pickles are gitignored (multi-GB eval grids) and do not survive
a fresh checkout, so a cross-session "re-run one arm and merge it" repair —
e.g. the era-consistent 58k-15d random arm (the other three criteria of
that digest were recorded with the fixed ESJD sampler; the committed random
curve predates it) — must merge at the digest level, not the pickle level
(scripts/merge_result_key.py handles the same-session pickle case).

Usage:
    python scripts/splice_digest_key.py <digest.json.gz> <fresh_results.pkl> <key>

The target digest's <key> entry is replaced by the fresh run's digest entry
and stamped with a `spliced` provenance note; a .presplice.bak copy of the
digest is kept beside it.
"""

import gzip
import json
import pickle
import shutil
import subprocess
import sys


def main():
    digest_path, results_path, key = sys.argv[1], sys.argv[2], sys.argv[3]

    from amf_tpu.analysis import parity

    with open(results_path, "rb") as f:
        results = pickle.load(f)
    fresh = parity.digest(results)
    if key not in fresh["criteria"]:
        sys.exit(f"key {key!r} not in fresh results "
                 f"(has: {sorted(fresh['criteria'])})")

    with gzip.open(digest_path, "rt") as f:
        target = json.load(f)
    if fresh.get("rating_vals") != target.get("rating_vals"):
        sys.exit(f"rating_vals mismatch: fresh {fresh.get('rating_vals')} "
                 f"vs target {target.get('rating_vals')}")
    # config guard: a fresh run with a different model/sampler config (or a
    # different step grid) must not splice silently — the merged digest
    # would compare incomparable arms
    fa, ta = fresh.get("args") or {}, target.get("args") or {}
    cfg_fields = ("latent_d", "samps", "warmup", "subtract_mean", "float32",
                  "lookahead_samps", "lookahead_warmup", "test_set")
    bad = []
    for k in cfg_fields:
        if k in fa and k in ta:
            if fa[k] != ta[k]:
                bad.append(f"{k}: fresh {fa[k]!r} vs target {ta[k]!r}")
        elif k in fa or k in ta:
            # one side lacks the field entirely (e.g. a legacy digest with
            # no recorded args): the arms cannot be shown comparable, so
            # refuse rather than silently bypassing the guard (ADVICE r4)
            side = "target" if k in fa else "fresh"
            bad.append(f"{k}: absent from {side} digest args — incomparable")
    entry = fresh["criteria"][key]
    tgt_ns = (target["criteria"].get(key) or {}).get("n_rated")
    if tgt_ns is not None and len(entry["n_rated"]) != len(tgt_ns):
        bad.append(f"n_rated grid length: fresh {len(entry['n_rated'])} "
                   f"vs target {len(tgt_ns)}")
    if bad:
        sys.exit("config mismatch, refusing to splice:\n  " + "\n  ".join(bad))

    shutil.copyfile(digest_path, digest_path + ".presplice.bak")
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    entry["spliced"] = f"fresh single-key re-run merged at git-rev {rev}"
    # per-arm era note so mixed-era digests stay detectable after a splice;
    # the digest-LEVEL era field is deliberately left untouched — it
    # describes the other (unspliced) arms
    for era_field in ("sampler_era", "solver_era"):
        if fresh.get(era_field) is not None:
            entry["era"] = fresh[era_field]
    target["criteria"][key] = entry
    with gzip.open(digest_path, "wt") as f:
        json.dump(target, f)
    print(f"spliced {key!r} ({len(entry['err'])} steps) into {digest_path}")


if __name__ == "__main__":
    main()
