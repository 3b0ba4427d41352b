"""Merge one criterion's records from a donor results pickle into a main one.

Used to replace a single arm recorded under different conditions (e.g. the
58k-15d stan `random` arm, which resumed a frozen-sampler-era checkpoint at
181/200 while the other keys were re-recorded fresh with the fixed ESJD
warmup).  Re-running just that key and splicing it in is ~4x cheaper than
re-recording all four keys; the digest/parity report are regenerated from the
merged pickle by `experiment.py --check`.

Usage: python scripts/merge_result_key.py MAIN.pkl DONOR.pkl KEY [KEY ...]
"""

import pickle
import shutil
import sys


def main() -> None:
    main_path, donor_path, *keys = sys.argv[1:]
    if not keys:
        sys.exit("usage: merge_result_key.py MAIN.pkl DONOR.pkl KEY [KEY ...]")
    with open(donor_path, "rb") as f:
        donor = pickle.load(f)
    with open(main_path, "rb") as f:
        dest = pickle.load(f)
    for key in keys:
        if key not in donor:
            sys.exit(f"donor {donor_path} has no key {key!r}: "
                     f"{sorted(k for k in donor if not k.startswith('_'))}")
        old = dest.get(key)
        dest[key] = donor[key]
        print(f"{key}: {len(old) if old else 0} records -> "
              f"{len(donor[key])} (from {donor_path})")
    # provenance: record the splice in the notes the digest carries along
    notes = list(dest.get("_notes", ()))
    notes.append(f"spliced keys {keys} from {donor_path}")
    dest["_notes"] = notes
    shutil.copyfile(main_path, main_path + ".premerge.bak")
    with open(main_path, "wb") as f:
        pickle.dump(dest, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"wrote {main_path} (backup at {main_path}.premerge.bak)")


if __name__ == "__main__":
    main()
