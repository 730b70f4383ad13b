"""tvc.core.similarity vs numpy oracles."""

import jax.numpy as jnp
import numpy as np

from tvc.core import similarity as S


def test_l2_normalize_and_zero_safety(rng):
    x = rng.normal(size=(4, 16)).astype(np.float32)
    x[2] = 0.0
    out = np.asarray(S.l2_normalize(jnp.asarray(x)))
    norms = np.linalg.norm(out, axis=-1)
    assert np.allclose(norms[[0, 1, 3]], 1.0, atol=1e-5)
    assert np.all(np.isfinite(out))


def test_cosine_similarity_matches_numpy(rng):
    a = rng.normal(size=(8, 32)).astype(np.float32)
    b = rng.normal(size=(8, 32)).astype(np.float32)
    got = np.asarray(S.cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
    want = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert np.allclose(got, want, atol=1e-5)


def test_pairwise_cosine(rng):
    a = rng.normal(size=(5, 16)).astype(np.float32)
    b = rng.normal(size=(7, 16)).astype(np.float32)
    got = np.asarray(S.pairwise_cosine(jnp.asarray(a), jnp.asarray(b)))
    an = a / np.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    assert np.allclose(got, an @ bn.T, atol=1e-5)


def test_batched_set_cosine(rng):
    q = rng.normal(size=(4, 8)).astype(np.float32)
    r = rng.normal(size=(4, 6, 8)).astype(np.float32)
    got = np.asarray(S.batched_set_cosine(jnp.asarray(q), jnp.asarray(r)))
    for b in range(4):
        qn = q[b] / np.linalg.norm(q[b])
        for i in range(6):
            rn = r[b, i] / np.linalg.norm(r[b, i])
            assert np.isclose(got[b, i], qn @ rn, atol=1e-5)


def test_masked_mean_std_matches_numpy(rng):
    x = rng.normal(size=(3, 10)).astype(np.float32)
    mask = rng.random((3, 10)) > 0.4
    mask[1] = False  # empty set
    mean, std = S.masked_mean_std(jnp.asarray(x), jnp.asarray(mask))
    mean, std = np.asarray(mean), np.asarray(std)
    for b in [0, 2]:
        sel = x[b][mask[b]]
        if sel.size:
            assert np.isclose(mean[b], sel.mean(), atol=1e-5)
            assert np.isclose(std[b], sel.std(), atol=1e-5)  # ddof=0
    assert mean[1] == 0.0 and std[1] == 0.0


def test_masked_mean_std_consistent_with_separate_fns(rng):
    x = rng.normal(size=(4, 7)).astype(np.float32)
    mask = rng.random((4, 7)) > 0.3
    m1 = np.asarray(S.masked_mean(jnp.asarray(x), jnp.asarray(mask)))
    s1 = np.asarray(S.masked_std(jnp.asarray(x), jnp.asarray(mask)))
    m2, s2 = S.masked_mean_std(jnp.asarray(x), jnp.asarray(mask))
    assert np.allclose(m1, np.asarray(m2), atol=1e-5)
    assert np.allclose(s1, np.asarray(s2), atol=1e-4)
