"""Metrics vs sklearn / hand-computed goldens.

Validates parity with the reference metric semantics
(deeprec_utils.py:554-821), including tie-breaking and rounding quirks.
"""

import numpy as np
import pytest

from clsr_tpu import metrics as M

sklearn_metrics = pytest.importorskip("sklearn.metrics")


def _ref_mrr(y_true, y_score):
    order = np.argsort(y_score, kind="stable")[::-1]
    y_true = np.take(y_true, order)
    rr = y_true / (np.arange(len(y_true)) + 1)
    return np.sum(rr) / np.sum(y_true)


def _ref_ndcg(y_true, y_score, k):
    def dcg(y_true, y_score, k):
        k = min(np.shape(y_true)[-1], k)
        order = np.argsort(y_score, kind="stable")[::-1]
        yt = np.take(y_true, order[:k])
        return np.sum((2 ** yt - 1) / np.log2(np.arange(len(yt)) + 2))
    return dcg(y_true, y_score, k) / dcg(y_true, y_true, k)


def _ref_hit(y_true, y_score, k):
    gt = np.where(np.asarray(y_true) == 1)[0]
    top = np.argsort(y_score, kind="stable")[::-1][:k]
    return 1 if any(i in gt for i in top) else 0


def test_binary_auc_matches_sklearn(rng):
    for _ in range(20):
        n = rng.randint(10, 200)
        labels = rng.randint(0, 2, n)
        if labels.sum() in (0, n):
            continue
        # quantize scores to force ties
        scores = np.round(rng.rand(n), 1)
        assert M.binary_auc(labels, scores) == pytest.approx(
            sklearn_metrics.roc_auc_score(labels, scores), abs=1e-12
        )


def test_grouped_fast_paths_match_reference(rng):
    G = 10
    n_groups = 50
    labels = np.zeros((n_groups, G))
    labels[:, 0] = 1  # positive first, like the eval layout
    scores = np.round(rng.rand(n_groups, G), 1)  # coarse => ties happen

    assert M._mean_mrr(labels, scores) == pytest.approx(
        np.mean([_ref_mrr(l, s) for l, s in zip(labels, scores)]), abs=1e-12
    )
    for k in (1, 2, 4, 6):
        assert M._mean_ndcg(labels, scores, k) == pytest.approx(
            np.mean([_ref_ndcg(l, s, k) for l, s in zip(labels, scores)]), abs=1e-12
        )
        assert M._mean_hit(labels, scores, k) == pytest.approx(
            np.mean([_ref_hit(l, s, k) for l, s in zip(labels, scores)]), abs=1e-12
        )
    assert M._group_auc(labels, scores) == pytest.approx(
        np.mean([sklearn_metrics.roc_auc_score(l, s) for l, s in zip(labels, scores)]),
        abs=1e-12,
    )


def test_positive_not_at_front(rng):
    # fast path must handle positives at arbitrary positions
    G, n_groups = 8, 40
    labels = np.zeros((n_groups, G))
    pos = rng.randint(0, G, n_groups)
    labels[np.arange(n_groups), pos] = 1
    scores = np.round(rng.rand(n_groups, G), 1)
    assert M._mean_mrr(labels, scores) == pytest.approx(
        np.mean([_ref_mrr(l, s) for l, s in zip(labels, scores)]), abs=1e-12
    )


def test_cal_metric_pointwise(rng):
    labels = rng.randint(0, 2, 500)
    preds = rng.rand(500)
    res = M.cal_metric(labels, preds, ["auc", "logloss"])
    assert res["auc"] == pytest.approx(
        round(sklearn_metrics.roc_auc_score(labels, preds), 4), abs=1e-9
    )
    p = np.clip(preds, 1e-11, 1 - 1e-11)
    ll = -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    assert res["logloss"] == pytest.approx(round(ll, 4), abs=1e-9)


def test_cal_weighted_metric_wauc(rng):
    # 3 users with different row counts; compare against explicit pandas-like calc
    users = np.array([1] * 10 + [2] * 20 + [3] * 30)
    labels = rng.randint(0, 2, 60)
    labels[[0, 10, 30]] = 1
    labels[[1, 11, 31]] = 0  # ensure both classes per user
    preds = rng.rand(60)
    res = M.cal_weighted_metric(users, preds, labels, ["wauc"])

    expect = 0.0
    for u, w in [(1, 10 / 60), (2, 20 / 60), (3, 30 / 60)]:
        m = users == u
        expect += w * sklearn_metrics.roc_auc_score(labels[m], preds[m])
    assert res["wauc"] == pytest.approx(round(expect, 4), abs=1e-9)


def test_mean_alpha():
    alphas = [0.2, 0.8, 0.5, 0.5]
    labels = [1, 0, 1, 0]
    res = M.cal_mean_alpha_metric(alphas, labels)
    assert res["mean_alpha"] == pytest.approx(round((0.2 + 0.5) / 2, 4))
