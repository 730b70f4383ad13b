"""EmbeddingBank (sharded matmul top-k, FAISS replacement) and ReferenceBank
(dedup/eviction/persistence) tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc.bank import EmbeddingBank, ReferenceBank, ReferenceBankConfig, topk_exact
from tvc.parallel import create_mesh, local_mesh_for_tests


def brute_force_topk(q, bank, k):
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    bn = bank / np.linalg.norm(bank, axis=-1, keepdims=True)
    sims = qn @ bn.T
    idx = np.argsort(-sims, axis=-1)[:, :k]
    return np.take_along_axis(sims, idx, axis=-1), idx


def test_topk_exact_matches_bruteforce(rng):
    q = rng.normal(size=(4, 64)).astype(np.float32)
    bank = rng.normal(size=(200, 64)).astype(np.float32)
    scores, idx = topk_exact(jnp.asarray(q), jnp.asarray(bank), k=5)
    want_scores, want_idx = brute_force_topk(q, bank, 5)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=1e-3)


def test_embedding_bank_single_device(rng):
    bank_data = rng.normal(size=(157, 32)).astype(np.float32)
    q = rng.normal(size=(9, 32)).astype(np.float32)
    bank = EmbeddingBank(dim=32).build(bank_data)
    scores, idx = bank.search(jnp.asarray(q), k=7)
    _, want_idx = brute_force_topk(q, bank_data, 7)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    assert np.all(np.asarray(idx) < 157)  # never returns pad rows


def test_embedding_bank_sharded_matches_bruteforce(rng):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = local_mesh_for_tests(8)
    bank_data = rng.normal(size=(501, 64)).astype(np.float32)  # awkward size
    q = rng.normal(size=(16, 64)).astype(np.float32)
    bank = EmbeddingBank(dim=64, mesh=mesh).build(bank_data)
    scores, idx = bank.search(jnp.asarray(q), k=10)
    want_scores, want_idx = brute_force_topk(q, bank_data, 10)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=1e-3)


def test_embedding_bank_persistence(tmp_path, rng):
    data = rng.normal(size=(40, 16)).astype(np.float32)
    bank = EmbeddingBank(dim=16).build(data)
    bank.save(str(tmp_path / "bank"))
    loaded = EmbeddingBank.load(str(tmp_path / "bank"))
    assert loaded.size == 40
    q = rng.normal(size=(3, 16)).astype(np.float32)
    s1, i1 = bank.search(jnp.asarray(q), k=4)
    s2, i2 = loaded.search(jnp.asarray(q), k=4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_embedding_bank_k_too_large(rng):
    bank = EmbeddingBank(dim=8).build(rng.normal(size=(5, 8)).astype(np.float32))
    with pytest.raises(ValueError):
        bank.search(jnp.zeros((1, 8)), k=6)


# ---- ReferenceBank ---------------------------------------------------------


def test_reference_bank_dedup(rng):
    bank = ReferenceBank(dim=8, config=ReferenceBankConfig(similarity_threshold=0.99))
    v = rng.normal(size=8)
    assert bank.add_reference(v)
    assert not bank.add_reference(v)  # exact duplicate rejected
    assert bank.stats["rejected_duplicates"] == 1
    assert len(bank) == 1


def test_reference_bank_eviction_fifo(rng):
    cfg = ReferenceBankConfig(max_size=3, similarity_threshold=1.0, clustering_interval=0)
    bank = ReferenceBank(dim=4, config=cfg)
    # orthogonal-ish vectors so dedup never triggers
    for i in range(5):
        v = np.zeros(4); v[i % 4] = 1.0; v[(i + 1) % 4] = 0.1 * i
        bank.add_reference(v, text=f"t{i}")
    assert len(bank) == 3
    assert bank.stats["evicted"] == 2
    texts = [it.text for it in bank._items]
    assert "t0" not in texts and "t1" not in texts  # oldest evicted


def test_reference_bank_query_and_persistence(tmp_path, rng):
    bank = ReferenceBank(dim=16, config=ReferenceBankConfig(clustering_interval=0))
    vs = rng.normal(size=(20, 16))
    bank.add_batch(vs, texts=[f"t{i}" for i in range(20)], source="retrieval")
    res = bank.query_similar(vs[3], top_k=3)
    assert res[0][0] == 3 and res[0][1] > 0.99
    bank.save(str(tmp_path / "rb"))
    loaded = ReferenceBank.load(str(tmp_path / "rb"))
    assert len(loaded) == len(bank)
    res2 = loaded.query_similar(vs[3], top_k=3)
    assert res2[0][0] == 3


def test_reference_bank_clustering(rng):
    cfg = ReferenceBankConfig(clustering_interval=10, num_clusters=2, similarity_threshold=1.0)
    bank = ReferenceBank(dim=8, config=cfg)
    a = rng.normal(size=(10, 8)) + np.array([5.0] + [0] * 7)
    b = rng.normal(size=(10, 8)) - np.array([5.0] + [0] * 7)
    bank.add_batch(np.concatenate([a, b]))
    assert bank.clusters is not None
    assert bank.clusters.shape == (2, 8)
