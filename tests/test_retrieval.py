"""MultiModalRetriever: index build, t2i/i2t retrieval, persistence."""

import numpy as np
import pytest

from tvc.models import CLIPConfig, CLIPModel
from tvc.retrieval import MultiModalRetriever, RetrievalConfig


@pytest.fixture(scope="module")
def clip():
    return CLIPModel(CLIPConfig.tiny(), seed=0)


@pytest.fixture(scope="module")
def retriever(clip):
    rng = np.random.default_rng(0)
    r = MultiModalRetriever(clip, RetrievalConfig(top_k=4))
    emb = rng.normal(size=(50, clip.config.embed_dim)).astype(np.float32)
    r.build_image_index(embeddings=emb, items=[f"path/{i}.jpg" for i in range(50)])
    r.build_text_index(texts=[f"caption number {i} about things" for i in range(30)])
    return r


def test_t2i_retrieval(retriever):
    res = retriever.retrieve_images_by_text("a dog in the park")
    assert res.indices.shape == (1, 4)
    assert res.items[0][0].startswith("path/")
    # descending scores
    assert np.all(np.diff(res.scores[0]) <= 1e-6)


def test_t2i_batched(retriever):
    res = retriever.retrieve_images_by_text(["a dog", "a cat", "a car"])
    assert res.indices.shape == (3, 4)


def test_i2t_retrieval(clip, retriever):
    img = np.random.default_rng(1).random((1, clip.config.image_size, clip.config.image_size, 3)).astype(np.float32)
    res = retriever.retrieve_texts_by_image(img, top_k=2)
    assert res.indices.shape == (1, 2)
    assert all("caption" in t for t in res.items[0])


def test_cache_hit(clip):
    r = MultiModalRetriever(clip, RetrievalConfig(top_k=2, cache_enabled=True))
    r.build_image_index(embeddings=np.random.default_rng(0).normal(size=(10, clip.config.embed_dim)).astype(np.float32))
    r.retrieve_images_by_text("same query")
    before = r.stats["cache_hits"]
    r.retrieve_images_by_text("same query")
    assert r.stats["cache_hits"] == before + 1


def test_reference_embeddings_shape(retriever):
    refs = retriever.retrieve_reference_embeddings(["a dog", "a cat"], top_k=3)
    assert refs.shape == (2, 3, retriever.model.config.embed_dim)
    # rows are normalized bank vectors
    assert np.allclose(np.linalg.norm(refs, axis=-1), 1.0, atol=1e-4)


def test_similarity_matrix(retriever):
    m = retriever.compute_similarity_matrix(["a", "b"])
    assert m.shape == (2, 50)


def test_persistence_roundtrip(tmp_path, clip, retriever):
    retriever.save(str(tmp_path))
    r2 = MultiModalRetriever(clip)
    r2.load(str(tmp_path))
    assert r2.image_bank.size == 50
    assert r2.text_bank.size == 30
    a = retriever.retrieve_images_by_text("query check")
    b = r2.retrieve_images_by_text("query check")
    np.testing.assert_array_equal(a.indices, b.indices)


def test_errors_without_index(clip):
    r = MultiModalRetriever(clip)
    with pytest.raises(RuntimeError):
        r.retrieve_images_by_text("x")
    with pytest.raises(ValueError):
        r.build_image_index()
