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

    shutil.copyfile(digest_path, digest_path + ".presplice.bak")
    entry = fresh["criteria"][key]
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    entry["spliced"] = f"fresh single-key re-run merged at git-rev {rev}"
    target["criteria"][key] = entry
    with gzip.open(digest_path, "wt") as f:
        json.dump(target, f)
    print(f"spliced {key!r} ({len(entry['err'])} steps) into {digest_path}")


if __name__ == "__main__":
    main()
