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


@pytest.mark.slow
def test_fused_attention_layer_parity():
    """The fully fused attention-layer kernel (LN+QKV+MHA+out+residual)
    must match the flax module path on the same params.

    slow: full-layer compile; the kernel stays fast-tier covered by the
    mha/causal/block-size tests above."""
    import dataclasses

    import jax.numpy as jnp

    from tvc.models.clip import CLIPConfig, CLIPModel, normalize_pixels, vision_features_fused

    cfg = dataclasses.replace(CLIPConfig.tiny(), fused_attention=False)
    model = CLIPModel(cfg, seed=0)
    rng = np.random.default_rng(0)
    pixels = normalize_pixels(
        jnp.asarray(rng.random((4, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    )
    want = np.asarray(model.image_features(model.params, pixels))
    got = np.asarray(vision_features_fused(model.params, cfg, pixels))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fused_attention_layer_block_sizes():
    """Parity holds for batch sizes that do not divide block_b."""
    import jax.numpy as jnp

    from tvc.core.pallas.attention_layer_kernel import fused_attention_layer

    rng = np.random.default_rng(1)
    B, T, W, H = 6, 10, 64, 2
    x = jnp.asarray(rng.normal(size=(B, T, W)), jnp.float32)
    ln_s = jnp.asarray(rng.normal(size=(W,)), jnp.float32)
    ln_b = jnp.asarray(rng.normal(size=(W,)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(0, 0.05, size=(W, 3 * W)), jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * W,)), jnp.float32)
    wout = jnp.asarray(rng.normal(0, 0.05, size=(W, W)), jnp.float32)
    bout = jnp.asarray(rng.normal(size=(W,)), jnp.float32)

    def oracle():
        xf = np.asarray(x, np.float64)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        h = (xf - mean) / np.sqrt(var + 1e-5) * np.asarray(ln_s) + np.asarray(ln_b)
        qkv = h @ np.asarray(wqkv) + np.asarray(bqkv)
        q, k, v = np.split(qkv, 3, axis=-1)
        D = W // H
        outs = []
        for g in range(H):
            qg = q[..., g * D : (g + 1) * D]
            kg = k[..., g * D : (g + 1) * D]
            vg = v[..., g * D : (g + 1) * D]
            lg = qg @ kg.transpose(0, 2, 1) / np.sqrt(D)
            w = np.exp(lg - lg.max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            outs.append(w @ vg)
        o = np.concatenate(outs, -1) @ np.asarray(wout) + np.asarray(bout)
        return xf + o

    got = np.asarray(
        fused_attention_layer(x, ln_s, ln_b, wqkv, bqkv, wout, bout, heads=H, block_b=4)
    )
    np.testing.assert_allclose(got, oracle(), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_text_tower_parity():
    """Fused causal attention-layer text tower matches the module path."""
    import dataclasses

    import jax.numpy as jnp

    from tvc.models.clip import CLIPConfig, CLIPModel, text_features_fused

    cfg = dataclasses.replace(CLIPConfig.tiny(), fused_attention=False)
    model = CLIPModel(cfg, seed=0)
    tokens = jnp.asarray(
        model.tokenize([f"sample text {i} with words" for i in range(6)])
    )
    want = np.asarray(model.text_features(model.params, tokens))
    got = np.asarray(text_features_fused(model.params, cfg, tokens))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


@pytest.mark.slow
def test_decode_gqa_kernel_parity():
    """Fused decode-attention kernel vs the jnp oracle, GQA shapes of both
    Qwen2-0.5B (KV=2, reps=7, Dh=64) and 7B (KV=4, reps=7, Dh=128)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tvc.core.pallas.decode_attention_kernel import (
        decode_gqa_attention,
        decode_gqa_reference,
    )

    for B, KV, R, S, D in [(16, 2, 7, 24, 64), (8, 4, 7, 16, 128)]:
        key = jax.random.PRNGKey(0)
        kq, kk, kv_, km = jax.random.split(key, 4)
        q = jax.random.normal(kq, (B, KV, R, D), jnp.float32)
        k = jax.random.normal(kk, (B, KV, S, D), jnp.float32)
        v = jax.random.normal(kv_, (B, KV, S, D), jnp.float32)
        # random validity mask with at least one valid slot per row
        valid = jax.random.bernoulli(km, 0.7, (B, S)).at[:, 0].set(True)
        mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)
        got = decode_gqa_attention(q, k, v, mask, block_b=8)
        want = decode_gqa_reference(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )
