"""Detection/retrieval metrics vs sklearn/closed-form oracles."""

import numpy as np
import pytest

from tvc.metrics import (
    DetectionEvaluator,
    MetricsAggregator,
    RetrievalEvaluator,
    bootstrap_ci,
)


def test_auroc_matches_sklearn(rng):
    labels = rng.integers(0, 2, 200)
    scores = rng.random(200) + labels * 0.5
    from sklearn.metrics import roc_auc_score

    assert np.isclose(
        DetectionEvaluator.auroc(labels, scores), roc_auc_score(labels, scores)
    )


def test_perfect_detector_metrics():
    labels = np.array([0] * 50 + [1] * 50)
    scores = np.concatenate([np.linspace(0, 0.4, 50), np.linspace(0.6, 1.0, 50)])
    m = DetectionEvaluator.evaluate(labels, scores)
    assert m.auroc == 1.0
    assert m.accuracy == 1.0
    assert m.f1 == 1.0
    assert m.fpr_at_95_tpr == 0.0
    assert 0.4 < m.optimal_threshold <= 0.6


def test_youden_threshold_matches_manual(rng):
    labels = rng.integers(0, 2, 100)
    scores = rng.random(100) + 0.3 * labels
    from sklearn.metrics import roc_curve

    fpr, tpr, thr = roc_curve(labels, scores)
    want = thr[np.argmax(tpr - fpr)]
    got = DetectionEvaluator.optimal_threshold_youden(labels, scores)
    assert np.isclose(got, want)


def test_single_class_degenerate():
    m = DetectionEvaluator.evaluate([0, 0, 0], [0.1, 0.2, 0.3])
    assert np.isnan(m.auroc)
    assert m.accuracy == 1.0


def test_retrieval_metrics_closed_form():
    # 2 queries over 5 items; query 0 relevant {0}, ranked first -> perfect
    # query 1 relevant {3}, ranked at position 2 (0-indexed 1)
    ranked = np.array([[0, 1, 2, 3, 4], [1, 3, 0, 2, 4]])
    relevant = [{0}, {3}]
    m = RetrievalEvaluator.evaluate_from_ranks(ranked, relevant, ks=(1, 5))
    assert m.recall_at_k[1] == 0.5  # only query 0 hits at k=1
    assert m.recall_at_k[5] == 1.0
    assert np.isclose(m.mean_reciprocal_rank, (1.0 + 0.5) / 2)
    # AP: q0 = 1.0; q1 = 1/2 -> mAP = 0.75
    assert np.isclose(m.mean_average_precision, 0.75)
    # NDCG@5: q0 = 1; q1 = 1/log2(3) -> mean
    want_ndcg = (1.0 + 1.0 / np.log2(3)) / 2
    assert np.isclose(m.ndcg_at_k[5], want_ndcg)


def test_bootstrap_ci_contains_mean(rng):
    vals = rng.normal(5.0, 1.0, 400)
    mean, lo, hi = bootstrap_ci(vals, n_bootstrap=200)
    assert lo < mean < hi
    assert np.isclose(mean, vals.mean())


def test_metrics_aggregator():
    agg = MetricsAggregator()
    agg.add({"a": 1.0, "b": 2.0})
    agg.add({"a": 3.0})
    s = agg.summary()
    assert s["a"]["mean"] == 2.0
    assert s["a"]["count"] == 2
    assert s["b"]["count"] == 1
