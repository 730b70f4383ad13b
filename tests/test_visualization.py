"""Visualization manager: every plot writes a decodable PNG."""

import numpy as np
import pytest

from tvc.utils.visualization import VisualizationManager


@pytest.fixture
def viz(tmp_path):
    return VisualizationManager(str(tmp_path))


@pytest.fixture
def scores(rng):
    labels = np.concatenate([np.zeros(50), np.ones(50)])
    s = np.concatenate([rng.normal(0.3, 0.1, 50), rng.normal(0.7, 0.1, 50)])
    return labels, s


def _check_png(path):
    from PIL import Image

    im = Image.open(path)
    assert im.size[0] > 100 and im.size[1] > 100


def test_roc_and_pr(viz, scores):
    labels, s = scores
    _check_png(viz.plot_roc_curve(labels, s))
    _check_png(viz.plot_pr_curve(labels, s))


def test_distribution_with_threshold(viz, scores, rng):
    _check_png(
        viz.plot_score_distribution(
            rng.normal(0.3, 0.1, 50), rng.normal(0.7, 0.1, 50), threshold=0.5
        )
    )


def test_embeddings_pca_and_confusion(viz, rng):
    emb = rng.normal(size=(40, 16))
    labels = [0] * 20 + [1] * 20
    _check_png(viz.plot_embeddings(emb, labels))
    _check_png(viz.plot_confusion_matrix(np.array([[45, 5], [3, 47]])))
    _check_png(viz.plot_metric_bars({"auroc": 0.95, "f1": 0.9, "fpr": 0.04}))


def test_umap_lite_separates_clusters():
    """First-party UMAP (tvc/utils/umap_lite.py — the reference offers UMAP
    through optional umap-learn, src/utils/visualization.py:432): three
    well-separated gaussian clusters must stay separated in 2D."""
    from itertools import combinations

    from tvc.utils.umap_lite import umap_embed

    rng = np.random.default_rng(0)
    centers = np.array([[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]], float)
    x = np.concatenate([c + rng.normal(size=(40, 4)) for c in centers])
    labels = np.repeat([0, 1, 2], 40)
    y = umap_embed(x, n_epochs=150, seed=0)
    assert y.shape == (120, 2) and np.isfinite(y).all()
    cents = np.stack([y[labels == i].mean(0) for i in range(3)])
    intra = np.mean(
        [np.linalg.norm(y[labels == i] - cents[i], axis=1).mean() for i in range(3)]
    )
    inter = np.mean(
        [np.linalg.norm(cents[i] - cents[j]) for i, j in combinations(range(3), 2)]
    )
    assert inter / intra > 3.0
    # deterministic for a fixed seed
    np.testing.assert_allclose(y, umap_embed(x, n_epochs=150, seed=0))


def test_embeddings_umap_and_families(viz, rng):
    emb = rng.normal(size=(40, 16))
    emb[20:] += 6.0
    labels = [0] * 20 + [1] * 20
    _check_png(viz.plot_embeddings(emb, labels, name="emb_umap", method="umap"))
    _check_png(
        viz.plot_roc_family(
            {
                "2/255": {"fpr": [0, 0.5, 1], "tpr": [0, 0.6, 1]},
                "8/255": {"fpr": [0, 0.1, 1], "tpr": [0, 0.95, 1]},
            },
            name="roc_family",
        )
    )
    _check_png(
        viz.plot_lines(
            [0.0, 0.3, 1.0, 3.0],
            {"auroc": [1.0, 0.8, 0.7, 0.6], "evasion": [0, 0.02, 0.04, 0.01]},
            name="lambda_lines",
            logx=True,
        )
    )
