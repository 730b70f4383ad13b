"""Fused MHA kernel vs einsum oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc.core.pallas.attention_kernel import fused_mha


def oracle(q, k, v, causal=False):
    D = q.shape[-1]
    logits = np.einsum("bqhd,bkhd->bhqk", q, k).astype(np.float64) / np.sqrt(D)
    if causal:
        T = q.shape[1]
        mask = np.tril(np.ones((T, T), bool))
        logits = np.where(mask, logits, -np.inf)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", w, v)


@pytest.mark.parametrize("B,T,H,D", [(4, 50, 12, 64), (2, 16, 4, 64), (3, 77, 8, 64)])
def test_fused_mha_matches_einsum(rng, B, T, H, D):
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, H, D)).astype(np.float32)
    v = rng.normal(size=(B, T, H, D)).astype(np.float32)
    got = np.asarray(fused_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = oracle(q, k, v)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_mha_causal(rng):
    B, T, H, D = 2, 16, 4, 64
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, H, D)).astype(np.float32)
    v = rng.normal(size=(B, T, H, D)).astype(np.float32)
    got = np.asarray(
        fused_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    )
    want = oracle(q, k, v, causal=True)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_block_heads_non_divisible(rng):
    # B*H = 6 with block_heads=4 -> falls back to divisor
    B, T, H, D = 3, 8, 2, 64
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    got = np.asarray(
        fused_mha(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), block_heads=4)
    )
    want = oracle(q, q, q)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
