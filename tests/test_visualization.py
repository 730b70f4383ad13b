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
