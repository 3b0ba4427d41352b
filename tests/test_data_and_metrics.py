import numpy as np
import pytest

from amf_tpu import types
from amf_tpu.analysis import metrics
from amf_tpu.data import (
    choose_test_set,
    get_ratings_mask,
    known_diag,
    make_fake_data,
    pick_ratings,
    pick_ratings_drugbank,
    make_split,
    make_new_items_split,
)
from amf_tpu.data.loaders import load_npz_schema, save_npz_schema


def test_make_fake_data_shapes(rng):
    real, known, vals = make_fake_data(
        num_users=12, num_items=7, rank=3, data_type="binary", mask_type=0.2, rng=rng
    )
    assert real.shape == (12, 7)
    assert known.shape == (12, 7)
    assert vals == (0.0, 1.0)
    assert set(np.unique(real)) <= {0.0, 1.0}
    # every row/col covered
    assert known.any(axis=0).all() and known.any(axis=1).all()


def test_get_ratings_mask_types(rng):
    real = rng.normal(size=(8, 8))
    for mt in [0.3, "diag", "diag-plus", "diag-block"]:
        mask = get_ratings_mask(real, mt, rng)
        assert mask.any(axis=0).all() and mask.any(axis=1).all()


def test_known_diag():
    k = known_diag(3, 5)
    assert k.shape == (3, 5)
    assert k.any(axis=0).all() and k.any(axis=1).all()


def test_pick_ratings_cover_and_count(rng):
    knowable = np.ones((10, 10), bool)
    known = pick_ratings(knowable, 25, rng)
    assert known.sum() == 25
    assert known.any(axis=0).all() and known.any(axis=1).all()


def test_pick_ratings_drugbank(rng):
    real = (rng.random((10, 15)) < 0.4).astype(float)
    real[real == 0] = -1
    # ensure a positive per row
    real[:, 0] = 1
    known = pick_ratings_drugbank(real, 40, rng)
    assert known.sum() == 40
    # every row has at least one known positive
    assert ((real > 0) & known).any(axis=1).all()


def test_choose_test_set_modes(rng):
    real = rng.integers(1, 6, size=(12, 12)).astype(float)
    known = pick_ratings(real != 0, 20, rng)
    for mode, kw in [
        ("random", {}),
        ("equal-classes", {}),
        ("class-ratios", {"class_ratios": {v: 0.2 for v in range(1, 6)}}),
    ]:
        test = choose_test_set(real, known, 30, mode, rng=rng, **kw)
        assert test.sum() == 30
        assert not (test & known).any()


def test_make_split_and_npz_roundtrip(tmp_path, rng):
    real = rng.integers(1, 6, size=(15, 10)).astype(float)
    split = make_split(real, pick_known_frac=0.2, n_test=20, rng=rng)
    path = str(tmp_path / "data.npz")
    save_npz_schema(path, split)
    loaded = load_npz_schema(path)
    assert loaded["_real"].shape == (15, 10)
    assert loaded["_ratings"].shape[1] == 3
    assert tuple(loaded["_rating_vals"]) == (1.0, 2.0, 3.0, 4.0, 5.0)
    assert loaded["_test_on"].sum() == 20
    prob = types.problem_from_ratings(
        loaded["_ratings"], real=loaded["_real"], test=loaded.get("_test_on")
    )
    assert int(prob.n_rated) == loaded["_ratings"].shape[0]
    assert not np.asarray(prob.rated & prob.queryable).any()


def test_new_items_split(rng):
    real = rng.integers(1, 6, size=(20, 16)).astype(float)
    split = make_new_items_split(real, n_new=4, know_all_old=True, n_test=10, rng=rng)
    is_new = split["_is_new_item"]
    assert is_new.sum() == 4
    # old columns fully known
    knowable = real != 0
    assert (split["_known"][:, ~is_new] == knowable[:, ~is_new]).all()
    assert split["_test_on"][:, ~is_new].sum() == 0


def test_problem_add_rating(rng):
    real, known, _ = make_fake_data(num_users=6, num_items=6, mask_type=0.3, rng=rng)
    prob = types.problem_from_dense(real, known)
    ii, jj = np.nonzero(np.asarray(prob.queryable))
    p2 = prob.add_rating(int(ii[0]), int(jj[0]), 3.5)
    assert bool(p2.rated[ii[0], jj[0]])
    assert not bool(p2.queryable[ii[0], jj[0]])
    assert float(p2.R_obs[ii[0], jj[0]]) == 3.5
    assert int(p2.n_rated) == int(prob.n_rated) + 1


def test_rmse_metrics():
    pred = np.array([[1.0, 2.0], [3.0, 4.0]])
    target = np.array([[1.0, 0.0], [3.0, 0.0]])
    mask = np.array([[True, False], [True, False]])
    assert float(metrics.rmse_on(pred, target, mask)) == pytest.approx(0.0)
    assert float(metrics.rmse(pred, pred)) == 0.0


def test_binary_misclassification():
    pred = np.array([0.5, -0.5, 2.0])
    target = np.array([1.0, 1.0, 1.0])
    assert float(metrics.binary_misclassification(pred, target)) == pytest.approx(1 / 3)


def test_auc_roc_perfect_and_random(rng):
    labels = rng.random(500) < 0.3
    scores = labels + rng.normal(0, 1e-3, 500)
    assert metrics.auc_roc(scores, labels) == pytest.approx(1.0)
    assert 0.4 < metrics.auc_roc(rng.random(500), labels) < 0.6


def test_kendall_tau_with_nans():
    a = np.array([1.0, 2.0, 3.0, np.nan])
    b = np.array([1.0, 2.0, 3.0, 4.0])
    assert metrics.kendall_tau(a, b) == pytest.approx(1.0)


def test_rating_bounds():
    b = types.rating_bounds((1, 2, 3, 4, 5))
    assert b[0] == -np.inf and b[-1] == np.inf
    np.testing.assert_allclose(b[1:-1], [1.5, 2.5, 3.5, 4.5])
