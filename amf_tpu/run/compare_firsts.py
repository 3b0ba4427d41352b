"""CLI: criterion-agreement analysis across model families.

Mirrors the reference ``compare_firsts.py`` (:133-170): pairwise Kendall-tau
rank agreement (and RMS distance) between the first-step criterion maps of
independent implementations on the same data — the reference's strongest
cross-implementation correctness signal, reused here to validate this
framework against reference outputs or across our own model families.
"""

from __future__ import annotations

import argparse

import numpy as np

from amf_tpu.analysis import results as R


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("results_files", nargs="+")
    parser.add_argument("--keys", nargs="*", default=None,
                        help="criterion keys to compare (default: all shared)")
    args = parser.parse_args(argv)

    loaded = [R.load_results(p) for p in args.results_files]
    all_keys = set()
    for res in loaded:
        all_keys |= {
            k for k, v in res.items()
            if not k.startswith("_") and isinstance(v, list)
        }
    keys = args.keys or sorted(all_keys)

    taus = R.compare_first_steps(loaded, keys)
    if not taus:
        print("no comparable first-step criterion maps found")
        return

    print(f"{'pair':<60} {'kendall_tau':>12} {'rms_dist':>10}")
    maps = {}
    for res in loaded:
        for key in keys:
            if key in res:
                ev = R.first_step_evals(res[key])
                if ev is not None:
                    maps[key] = ev
    for (a, b), tau in sorted(taus.items()):
        ea, eb = maps[a], maps[b]
        ok = np.isfinite(ea) & np.isfinite(eb)
        # normalize scales before RMS distance (criteria have different units)
        za = (ea[ok] - ea[ok].mean()) / (ea[ok].std() + 1e-12)
        zb = (eb[ok] - eb[ok].mean()) / (eb[ok].std() + 1e-12)
        rms = float(np.sqrt(np.mean((za - zb) ** 2)))
        print(f"{a + ' vs ' + b:<60} {tau:>12.4f} {rms:>10.4f}")


if __name__ == "__main__":
    main()
