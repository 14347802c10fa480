"""Binary-classification metric tests, cross-checked against sklearn."""

import numpy as np
import pytest
from pytest import approx
from sklearn.metrics import f1_score, matthews_corrcoef, roc_auc_score as sk_auc

from gnn_tracking_tpu.metrics.binary_classification import (
    BinaryClassificationStats,
    get_maximized_bcs,
    get_roc_auc_scores,
    roc_auc_score,
)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, size=500)
    # correlated scores
    score = np.clip(0.3 * rng.random(500) + 0.55 * y + 0.1, 0, 1)
    return score, y


def test_stats_match_sklearn(data):
    score, y = data
    thld = 0.5
    bcs = BinaryClassificationStats(score, y, thld)
    pred = score >= thld
    assert bcs.acc == approx((pred == y).mean())
    assert bcs.F1 == approx(f1_score(y, pred))
    assert bcs.MCC == approx(matthews_corrcoef(y, pred))
    tp = ((pred == 1) & (y == 1)).sum()
    fn = ((pred == 0) & (y == 1)).sum()
    assert bcs.TPR == approx(tp / (tp + fn))
    assert bcs.get_all()["n_true"] == y.sum()


def test_stats_with_mask(data):
    score, y = data
    mask = np.arange(500) < 300
    bcs = BinaryClassificationStats(score, y, 0.5, mask=mask)
    bcs_ref = BinaryClassificationStats(score[:300], y[:300], 0.5)
    assert bcs.get_all() == approx(bcs_ref.get_all())


def test_roc_auc_matches_sklearn(data):
    score, y = data
    assert roc_auc_score(y_true=y, y_score=score) == approx(sk_auc(y, score), rel=1e-6)


def test_partial_roc_auc_matches_sklearn(data):
    score, y = data
    for max_fpr in (0.1, 0.01):
        assert roc_auc_score(y_true=y, y_score=score, max_fpr=max_fpr) == approx(
            sk_auc(y, score, max_fpr=max_fpr), rel=1e-5
        )


def test_roc_auc_single_class():
    assert np.isnan(roc_auc_score(y_true=np.ones(10), y_score=np.random.rand(10)))


def test_get_roc_auc_scores(data):
    score, y = data
    m = get_roc_auc_scores(y, score, [None, 0.1])
    assert set(m) == {"roc_auc", "roc_auc_0.1FPR"}


def test_get_maximized_bcs(data):
    score, y = data
    m = get_maximized_bcs(output=score, y=y)
    # brute-force reference
    thlds = np.linspace(0, 1, 200)
    f1s = [f1_score(y, score >= t) for t in thlds]
    assert m["max_f1"] == approx(max(f1s))
    assert 0 <= m["max_ba"] <= 1
    assert abs(m["tpr_eq_tnr_loc"] - thlds[np.argmin([abs(((score >= t) & (y == 1)).sum() / max(y.sum(), 1) - (((score < t) & (y == 0)).sum() / max((1 - y).sum(), 1))) for t in thlds])]) < 1e-9
