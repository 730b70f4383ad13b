"""Int8 (W8A8 dynamic) fused layer kernels vs the bf16/f32 oracle.

Runs in Pallas interpret mode on the CPU mesh (tests/conftest.py); on TPU
the same kernels lower to native s8 MXU dots (probed on hardware:
~1.5x the bf16 rate at 8192^3).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc.core.pallas.attention_layer_kernel import (
    fused_attention_layer,
    fused_mlp_layer,
)
from tvc.core.pallas.quantized_layer_kernel import (
    fused_attention_layer_i8,
    fused_mlp_layer_i8,
    quantize_linear,
)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_quantize_linear_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.05
    w_q, s = quantize_linear(w)
    assert w_q.dtype == jnp.int8 and s.shape == (128,)
    recon = np.asarray(w_q, np.float32) * np.asarray(s)
    err = np.abs(recon - np.asarray(w)).max()
    # max quantization error is scale/2 per element
    assert err <= float(np.asarray(s).max()) * 0.51


@pytest.mark.parametrize(
    # non-causal variant is slow-tier only: same kernel, second compile
    "causal",
    [pytest.param(False, marks=pytest.mark.slow), True],
)
def test_attention_layer_i8_matches_bf16(causal):
    B, T, W, H = 4, 8, 128, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    x = jax.random.normal(ks[0], (B, T, W)) * 0.5
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[1], (W,))
    ln_b = 0.1 * jax.random.normal(ks[2], (W,))
    wqkv = jax.random.normal(ks[3], (W, 3 * W)) * 0.05
    bqkv = 0.01 * jax.random.normal(ks[4], (3 * W,))
    wout = jax.random.normal(ks[5], (W, W)) * 0.05
    bout = jnp.zeros((W,))

    ref = fused_attention_layer(
        x, ln_s, ln_b, wqkv, bqkv, wout, bout, heads=H, causal=causal,
        interpret=True,
    )
    wqkv_q, sqkv = quantize_linear(wqkv)
    wout_q, sout = quantize_linear(wout)
    out = fused_attention_layer_i8(
        x, ln_s, ln_b, wqkv_q, sqkv, bqkv, wout_q, sout, bout,
        heads=H, causal=causal, interpret=True,
    )
    assert out.shape == ref.shape
    assert _cos(ref, out) > 0.999


def test_mlp_layer_i8_matches_bf16():
    B, T, W = 4, 8, 128
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    x = jax.random.normal(ks[0], (B, T, W)) * 0.5
    ln_s = jnp.ones((W,))
    ln_b = jnp.zeros((W,))
    wfc = jax.random.normal(ks[1], (W, 4 * W)) * 0.05
    bfc = 0.01 * jax.random.normal(ks[2], (4 * W,))
    wproj = jax.random.normal(ks[3], (4 * W, W)) * 0.05
    bproj = 0.01 * jax.random.normal(ks[4], (W,))

    ref = fused_mlp_layer(x, ln_s, ln_b, wfc, bfc, wproj, bproj, interpret=True)
    wfc_q, sfc = quantize_linear(wfc)
    wproj_q, sproj = quantize_linear(wproj)
    out = fused_mlp_layer_i8(
        x, ln_s, ln_b, wfc_q, sfc, bfc, wproj_q, sproj, bproj, interpret=True
    )
    assert _cos(ref, out) > 0.999


@pytest.mark.slow
def test_int8_towers_match_bf16_towers():
    """End-to-end: the i8 serving towers track the bf16 fused towers on a
    small-but-real-shape CLIP; feature cosine must survive 12 quantized
    layers well enough that retrieval ranking is unchanged."""
    from tvc.models.clip import (
        CLIPConfig,
        CLIPModel,
        normalize_pixels,
        quantize_clip_params,
        text_features_fused,
        text_features_fused_i8,
        vision_features_fused,
        vision_features_fused_i8,
    )

    cfg = dataclasses.replace(
        CLIPConfig.tiny(), fused_attention=True, dtype=jnp.float32
    )
    model = CLIPModel(cfg, seed=0)
    params = model.params
    qparams = quantize_clip_params(params, cfg)

    key = jax.random.PRNGKey(3)
    pixels = normalize_pixels(
        jax.random.uniform(key, (4, cfg.image_size, cfg.image_size, 3))
    )
    tokens = jnp.asarray(model.tokenize(["a dog", "a cat", "a car", "a boat"]))

    img_ref = vision_features_fused(params, cfg, pixels)
    img_i8 = vision_features_fused_i8(params, qparams, cfg, pixels)
    txt_ref = text_features_fused(params, cfg, tokens)
    txt_i8 = text_features_fused_i8(params, qparams, cfg, tokens)
    assert _cos(img_ref, img_i8) > 0.99
    assert _cos(txt_ref, txt_i8) > 0.99

    # per-row cosine (what retrieval ranking sees)
    def row_cos(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
        )

    assert row_cos(img_ref, img_i8).min() > 0.98
    assert row_cos(txt_ref, txt_i8).min() > 0.98


@pytest.mark.slow
def test_clip_model_int8_dispatch():
    """CLIPModel(int8_serving=True) encodes through the i8 towers; the
    in-trace quantize path and the explicit pre-quantized path agree."""
    from tvc.models.clip import CLIPConfig, CLIPModel

    cfg = dataclasses.replace(
        CLIPConfig.tiny(), fused_attention=True, int8_serving=True,
        dtype=jnp.float32,
    )
    model = CLIPModel(cfg, seed=0)
    feats = model.encode_image(
        [np.zeros((cfg.image_size, cfg.image_size, 3), np.uint8)]
    )
    assert feats.shape == (1, cfg.embed_dim)

    # explicit qparams (pre-quantized serving) == in-trace quantize
    px = jax.random.uniform(jax.random.PRNGKey(0), (2, cfg.image_size, cfg.image_size, 3))
    from tvc.models.clip import normalize_pixels

    a = model.infer_image_features(model.params, normalize_pixels(px))
    b = model.infer_image_features(
        model.params, normalize_pixels(px), qparams=model.qparams()
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_w8_matmul_kernel_parity():
    """W8 matmul kernel vs dequant-then-matmul oracle at decode shapes
    (0.5B qkv/mlp and 7B down-proj slices)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tvc.core.pallas.w8_matmul_kernel import w8_matmul, w8_matmul_reference

    # (192, 2368, 512) forces the K-tiled accumulator path (37 K-steps at
    # bk=64 — 2368 = 2^6*37 shares 18944's odd factor, the Qwen2-7B
    # down-projection shape class that VMEM-OOMed the single-K design)
    for M, K, N in [(192, 896, 1152), (64, 1184, 256), (8, 128, 128),
                    (192, 2368, 512)]:
        key = jax.random.PRNGKey(M)
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (M, K), jnp.float32)
        wf = jax.random.normal(kw, (K, N), jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
        got = np.asarray(w8_matmul(x, wq, s))
        want = np.asarray(w8_matmul_reference(x, wq, s))
        # kernel scales the f32 accumulator once (exact int8 in bf16);
        # oracle rounds w*s per weight — tiny relative differences
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
        # against the exact f32 computation the kernel should be CLOSER
        exact = np.asarray(x) @ (np.asarray(wq, np.float32) * np.asarray(s))
        err_kernel = np.abs(got - exact).max()
        assert err_kernel < 0.15, err_kernel


@pytest.mark.slow
def test_qwen_w8a8_decode_runs():
    """quant_gemm='w8a8' routes decode GEMMs through the all-int8 kernel
    (dynamic per-row activation quantization); the decode must run and
    stay close to the weight-only path on the same int8 weights."""
    import dataclasses

    import numpy as np

    from tvc.models.qwen import QwenConfig, QwenModel

    m8 = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=6, init_int8=True)
    cfg_a8 = dataclasses.replace(QwenConfig.tiny(), quant_gemm="w8a8")
    ma8 = QwenModel(cfg_a8, seed=0, max_new_tokens=6, init_int8=True)

    prompts = ["a cat sat on the mat", "dogs run in the park"]
    # greedy (temperature=0): same weights, so the two quantization
    # schemes should agree on most early tokens
    out8 = m8.generate(prompts, temperature=0.0)
    outa8 = ma8.generate(prompts, temperature=0.0)
    assert len(out8) == len(outa8) == 2
    assert all(isinstance(s, str) for s in outa8)


@pytest.mark.slow
def test_stacked_matmul_kernels_match_sliced():
    """Scalar-prefetch stacked kernels (layer index selects the weight
    blocks, zero slab copies) must match the per-layer kernels on every
    layer of a stacked [L, K, N] tree."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tvc.core.pallas.w8_matmul_kernel import (
        w8_matmul,
        w8_matmul_stacked,
        w8a8_matmul,
        w8a8_matmul_stacked,
    )

    L, M, K, N = 3, 16, 256, 384
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (M, K), jnp.float32)
    wf = jax.random.normal(kw, (L, K, N), jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=1), 1e-12) / 127.0  # [L, N]
    wq = jnp.clip(jnp.round(wf / s[:, None, :]), -127, 127).astype(jnp.int8)
    for l in range(L):
        got_a8 = np.asarray(w8a8_matmul_stacked(x, wq, s, jnp.int32(l)))
        want_a8 = np.asarray(w8a8_matmul(x, wq[l], s[l]))
        np.testing.assert_allclose(got_a8, want_a8, rtol=1e-5, atol=1e-5)
        got_w8 = np.asarray(w8_matmul_stacked(x, wq, s, jnp.int32(l)))
        want_w8 = np.asarray(w8_matmul(x, wq[l], s[l]))
        np.testing.assert_allclose(got_w8, want_w8, rtol=1e-5, atol=1e-5)
        # layers must actually differ (the index is live)
        if l > 0:
            assert np.abs(got_a8 - np.asarray(w8a8_matmul(x, wq[0], s[0]))).max() > 1e-3


def test_stacked_decode_attention_matches_sliced():
    """Stacked-cache decode attention (layer via scalar prefetch) vs the
    per-layer oracle on each layer."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tvc.core.pallas.decode_attention_kernel import (
        decode_gqa_attention_stacked,
        decode_gqa_reference,
    )

    L, B, KV, R, S, D = 3, 8, 2, 3, 16, 32
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, KV, R, D), jnp.float32)
    k = jax.random.normal(kk, (L, B, KV, S, D), jnp.float32)
    v = jax.random.normal(kv, (L, B, KV, S, D), jnp.float32)
    mask = jnp.where(jnp.arange(S)[None, :] < 10, 0.0, -jnp.inf)
    mask = jnp.broadcast_to(mask, (B, S))
    for l in range(L):
        got = np.asarray(decode_gqa_attention_stacked(q, k, v, mask, jnp.int32(l)))
        want = np.asarray(decode_gqa_reference(q, k[l], v[l], mask))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
