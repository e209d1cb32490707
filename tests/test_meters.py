"""Metric-formula tests against sklearn/scipy oracles (the backends the
reference's meters delegate to — exact comparability matters, SURVEY §7e)."""

import numpy as np
import pytest

from text_similarity_tpu.evaluation import meters as M


def _scores_labels(n=200, seed=0):
    rng = np.random.RandomState(seed)
    labels = (rng.rand(n) > 0.5).astype(int)
    scores = labels * 0.3 + rng.randn(n) * 0.5
    return scores, labels


def test_average_precision_matches_sklearn():
    from sklearn.metrics import average_precision_score

    scores, labels = _scores_labels()
    got = M.average_precision(scores, labels)
    want = average_precision_score(labels, scores)
    assert got == pytest.approx(want, abs=1e-9)


def test_best_threshold_accuracy_is_optimal():
    scores, labels = _scores_labels(seed=1)
    res = M.best_threshold_accuracy(scores, labels)
    # brute-force all thresholds
    best = max(
        np.mean((scores > t) == labels)
        for t in np.concatenate([scores - 1e-9, scores + 1e-9])
    )
    assert res["accuracy"] == pytest.approx(best, abs=1e-9)
    # threshold actually achieves it
    acc_at_thr = np.mean((scores > res["threshold"]) == labels)
    assert acc_at_thr == pytest.approx(res["accuracy"], abs=1e-9)


def test_best_threshold_f1_matches_sklearn_curve():
    from sklearn.metrics import precision_recall_curve

    scores, labels = _scores_labels(seed=2)
    res = M.best_threshold_f1(scores, labels)
    p, r, t = precision_recall_curve(labels, scores)
    f1 = 2 * p * r / np.maximum(p + r, 1e-12)
    assert res["f1"] == pytest.approx(f1.max(), abs=1e-6)


def test_similarity_metrics_match_scipy():
    from scipy.stats import pearsonr, spearmanr

    rng = np.random.RandomState(3)
    u = rng.randn(50, 16)
    v = u * 0.7 + rng.randn(50, 16) * 0.4
    gold = rng.rand(50)
    out = M.similarity_metrics(u, v, gold)
    cos = np.sum(u * v, 1) / (
        np.linalg.norm(u, axis=1) * np.linalg.norm(v, axis=1)
    )
    assert out["pearson_cosine"] == pytest.approx(pearsonr(gold, cos)[0])
    assert out["spearman_cosine"] == pytest.approx(spearmanr(gold, cos)[0])
    eu = -np.linalg.norm(u - v, axis=1)
    assert out["spearman_euclidean"] == pytest.approx(spearmanr(gold, eu)[0])
    assert out["spearman_max"] == max(
        out["spearman_cosine"], out["spearman_euclidean"],
        out["spearman_manhattan"], out["spearman_dot"],
    )


def test_retrieval_accuracy_identity():
    rng = np.random.RandomState(4)
    x = rng.randn(30, 8)
    out = M.retrieval_accuracy(x, x)
    assert out["acc_src2tgt"] == 1.0 and out["acc_tgt2src"] == 1.0
    # shuffled target → near-zero
    out2 = M.retrieval_accuracy(x, np.roll(x, 1, axis=0))
    assert out2["acc_src2tgt"] == 0.0


def test_classification_metrics():
    logits = np.array([[2.0, 0.0], [0.0, 2.0], [2.0, 0.0], [0.0, 2.0]])
    labels = np.array([0, 1, 1, 1])
    out = M.classification_metrics(logits, labels)
    assert out["accuracy"] == 0.75


def test_average_meter_and_metrics():
    m = M.Metrics("loss", "acc")
    m.update("loss", 2.0, n=2)
    m.update("loss", 1.0, n=2)
    assert m.averages()["loss"] == 1.5
    assert "loss=1.5" in m.display()


def test_roc_curve_matches_known_values():
    from text_similarity_tpu.evaluation.meters import roc_curve

    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.55, 0.54, 0.53, 0.52])
    labels = np.array([1, 1, 0, 1, 1, 0, 0, 0])
    fpr, tpr, thr, auc = roc_curve(scores, labels)
    # perfect start: top-2 scores are positives
    assert tpr[0] == 0.0 and fpr[0] == 0.0
    assert tpr[-1] == 1.0 and fpr[-1] == 1.0
    # monotone non-decreasing
    assert (np.diff(fpr) >= 0).all() and (np.diff(tpr) >= 0).all()
    assert 0.8 < auc < 0.9  # hand-checked: 13/16
    # degenerate separable case
    _, _, _, auc2 = roc_curve(
        np.array([0.9, 0.8, 0.2, 0.1]), np.array([1, 1, 0, 0])
    )
    assert auc2 == 1.0


def test_average_precision_groups_ties_like_sklearn():
    from text_similarity_tpu.evaluation.meters import average_precision

    # tied scores must be grouped at one threshold (order-independent)
    ap1 = average_precision(np.array([0.8, 0.8]), np.array([0, 1]))
    ap2 = average_precision(np.array([0.8, 0.8]), np.array([1, 0]))
    assert ap1 == ap2 == 0.5
    # untied sanity: perfect ranking
    assert average_precision(np.array([0.9, 0.8, 0.1]), np.array([1, 1, 0])) == 1.0
    # sklearn cross-check when available
    try:
        from sklearn.metrics import average_precision_score
    except Exception:
        return
    rng = np.random.RandomState(0)
    scores = np.round(rng.rand(200), 2)   # coarse rounding → many ties
    labels = (rng.rand(200) < 0.3).astype(int)
    ours = average_precision(scores, labels)
    ref = float(average_precision_score(labels, scores))
    assert abs(ours - ref) < 1e-9, (ours, ref)
