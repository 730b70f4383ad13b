"""Fused matmul+top-k kernel vs numpy argsort oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from tvc.core.pallas.topk_kernel import bank_topk


def oracle(q, bank, k):
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    bn = bank / np.linalg.norm(bank, axis=-1, keepdims=True)
    sims = qn @ bn.T
    idx = np.argsort(-sims, axis=-1)[:, :k]
    return np.take_along_axis(sims, idx, axis=-1), idx


@pytest.mark.parametrize("N,block_n", [(512, 128), (300, 128), (1024, 256)])
def test_bank_topk_matches_oracle(rng, N, block_n):
    B, D, k = 8, 128, 10
    q = rng.normal(size=(B, D)).astype(np.float32)
    bank = rng.normal(size=(N, D)).astype(np.float32)
    vals, idx = bank_topk(
        jnp.asarray(q), jnp.asarray(bank), k=k, block_n=block_n
    )
    want_vals, want_idx = oracle(q, bank, k)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(vals), want_vals, atol=1e-4)


def test_bank_topk_n_valid(rng):
    """Rows past n_valid must never be returned."""
    B, D, k = 4, 128, 5
    q = rng.normal(size=(B, D)).astype(np.float32)
    bank = rng.normal(size=(256, D)).astype(np.float32)
    bank[100:] *= 100.0  # would dominate if not masked
    vals, idx = bank_topk(
        jnp.asarray(q), jnp.asarray(bank), k=k, n_valid=100, block_n=128
    )
    assert np.all(np.asarray(idx) < 100)
    want_vals, want_idx = oracle(q, bank[:100], k)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_bank_topk_descending(rng):
    q = rng.normal(size=(2, 128)).astype(np.float32)
    bank = rng.normal(size=(384, 128)).astype(np.float32)
    vals, _ = bank_topk(jnp.asarray(q), jnp.asarray(bank), k=7, block_n=128)
    v = np.asarray(vals)
    assert np.all(np.diff(v, axis=1) <= 1e-6)
