"""CLIP model: shapes, determinism, differentiability, wrapper API parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc.models import CLIPConfig, CLIPModel, HashTokenizer, normalize_pixels


@pytest.fixture(scope="module")
def clip():
    return CLIPModel(CLIPConfig.tiny(), seed=0)


def test_encode_shapes(clip):
    cfg = clip.config
    imgs = np.random.default_rng(0).random((3, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    feats = clip.encode_image(imgs)
    assert feats.shape == (3, cfg.embed_dim)
    assert np.allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-4)
    tfeats = clip.encode_text(["a cat", "a dog on grass"])
    assert tfeats.shape == (2, cfg.embed_dim)


@pytest.mark.slow
def test_deterministic_init_and_encode():
    a = CLIPModel(CLIPConfig.tiny(), seed=0)
    b = CLIPModel(CLIPConfig.tiny(), seed=0)
    x = np.ones((1, 32, 32, 3), np.float32) * 0.3
    np.testing.assert_array_equal(
        np.asarray(a.encode_image(x)), np.asarray(b.encode_image(x))
    )
    c = CLIPModel(CLIPConfig.tiny(), seed=1)
    assert not np.allclose(np.asarray(a.encode_image(x)), np.asarray(c.encode_image(x)))


@pytest.mark.slow
def test_image_grad_flows(clip):
    """The attack path: grad of similarity wrt input pixels is nonzero."""
    cfg = clip.config
    pixels = jnp.asarray(
        np.random.default_rng(1).random((2, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    tfeat = clip.encode_text(["target text", "other"])

    def loss(px):
        ifeat = clip.encode_image_tensor(normalize_pixels(px))
        return jnp.mean(jnp.sum(ifeat * tfeat, axis=-1))

    g = jax.grad(loss)(pixels)
    assert g.shape == pixels.shape
    assert float(jnp.abs(g).max()) > 0


def test_text_image_similarity_api(clip):
    img = np.random.default_rng(2).random((32, 32, 3)).astype(np.float32)
    sim = clip.get_text_image_similarity("hello world", img)
    assert sim.shape == (1,)
    assert -1.0 <= float(sim[0]) <= 1.0


def test_tokenizer_properties():
    tok = HashTokenizer(vocab_size=512, context_length=16)
    out = tok(["a cat sat", "a cat sat"])
    np.testing.assert_array_equal(out[0], out[1])  # deterministic
    assert out.shape == (2, 16)
    assert out[0, 0] == 510  # sot
    assert 511 in out[0]  # eot present
    # argmax lands on eot (CLIP take-at-argmax convention)
    assert out[0].argmax() == list(out[0]).index(511)
    # truncation
    long = tok(["w " * 100])
    assert long.shape == (1, 16)
    assert long[0, -1] == 511


def test_preprocess_pil_roundtrip(clip):
    from PIL import Image

    im = Image.fromarray((np.random.default_rng(3).random((50, 70, 3)) * 255).astype(np.uint8))
    batch = clip.preprocess([im, im])
    assert batch.shape == (2, clip.config.image_size, clip.config.image_size, 3)
    feats = clip.encode_image([im])
    assert feats.shape == (1, clip.config.embed_dim)


@pytest.mark.slow
def test_fused_attention_encode_matches_standard():
    import dataclasses

    cfg = CLIPConfig.tiny()
    std = CLIPModel(cfg, seed=0)
    fused = CLIPModel(dataclasses.replace(cfg, fused_attention=True), seed=0)
    x = np.random.default_rng(4).random((3, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    a = np.asarray(std.encode_image(x))
    b = np.asarray(fused.encode_image(x))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
    # gradient path still works on the fused-configured model
    import jax
    import jax.numpy as jnp

    tfeat = fused.encode_text(["a", "b", "c"])

    def loss(px):
        return jnp.mean(jnp.sum(fused.encode_image_tensor(normalize_pixels(px)) * tfeat, -1))

    g = jax.grad(loss)(jnp.asarray(x))
    assert float(jnp.abs(g).max()) > 0


def test_clip_config_from_name():
    """Reference SUPPORTED_CLIP_MODELS resolution (src/__init__.py:99-108):
    ViT family in both OpenAI and HF spellings; RN* rejected with a clear
    error."""
    import pytest

    from tvc.models.clip import CLIPConfig

    b32 = CLIPConfig.from_name("ViT-B/32")
    assert (b32.patch_size, b32.vision_width, b32.embed_dim) == (32, 768, 512)
    assert CLIPConfig.from_name("openai/clip-vit-base-patch32") == b32

    b16 = CLIPConfig.from_name("ViT-B/16")
    assert b16.patch_size == 16 and b16.vision_width == 768
    assert CLIPConfig.from_name("openai/clip-vit-base-patch16") == b16

    l14 = CLIPConfig.from_name("ViT-L/14")
    # openai/clip-vit-large-patch14 shapes
    assert (l14.patch_size, l14.vision_layers, l14.vision_width) == (14, 24, 1024)
    assert (l14.text_width, l14.text_heads, l14.embed_dim) == (768, 12, 768)
    assert CLIPConfig.from_name("openai/clip-vit-large-patch14") == l14

    assert CLIPConfig.from_name("tiny").model_name == "tiny"
    with pytest.raises(ValueError, match="RN50|unsupported"):
        CLIPConfig.from_name("RN50")


@pytest.mark.slow
def test_bucketed_text_features_exact(clip):
    """Two-bucket text encode == single-bucket encode, row for row.

    The tower is length-polymorphic (positional embeddings sliced to T,
    causal mask), so padding a sequence to 8 vs 24 must not change its
    features; bucket_text_tokens + infer_text_features_bucketed exploit
    exactly that (bench.py config #1 serving path)."""
    from tvc.models.clip import bucket_text_tokens

    rng = np.random.default_rng(0)
    S, T = 64, 16  # tiny config's full text context
    eot = clip.config.vocab_size - 1
    tokens = np.zeros((S, T), np.int32)
    for i in range(S):
        n = int(rng.integers(2, T if i % 3 else 7))  # mix of short/long
        tokens[i, : n - 1] = rng.integers(1, eot - 1, size=n - 1)
        tokens[i, n - 1] = eot
    bucket = bucket_text_tokens(tokens, short_len=8, capacity_quantum=16)
    assert bucket is not None
    assert bucket["short"].shape[1] == 8 and bucket["long"].shape[1] == T
    assert bucket["short"].shape[0] + bucket["long"].shape[0] == S
    # every short-bucket row keeps its EOT in-window
    assert (bucket["short"].argmax(-1) + 1 <= 8).all()

    params = clip.params
    plain = np.asarray(clip.infer_text_features(params, jnp.asarray(tokens)))
    bucketed = np.asarray(
        clip.infer_text_features_bucketed(
            params,
            jnp.asarray(bucket["short"]),
            jnp.asarray(bucket["long"]),
            jnp.asarray(bucket["inv"]),
        )
    )
    np.testing.assert_allclose(bucketed, plain, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_bucketed_text_features_dedup_exact(clip):
    """dedup=True: duplicate token rows encode once, the inverse gather
    restores per-row features exactly, and the plan never costs more
    encoded tokens than the raw partition (cost-based selection)."""
    from tvc.models.clip import bucket_text_tokens

    rng = np.random.default_rng(3)
    base, T = 24, 16
    eot = clip.config.vocab_size - 1
    uniq = np.zeros((base, T), np.int32)
    for i in range(base):
        n = int(rng.integers(2, T if i % 3 else 7))
        uniq[i, : n - 1] = rng.integers(1, eot - 1, size=n - 1)
        uniq[i, n - 1] = eot
    # heavy duplication: each unique row appears ~4x (the augmenter's
    # pad-with-original pattern at small V)
    idx = rng.integers(0, base, size=96)
    tokens = uniq[idx]
    plain_plan = bucket_text_tokens(tokens, short_len=8, capacity_quantum=16)
    dedup_plan = bucket_text_tokens(
        tokens, short_len=8, capacity_quantum=16, dedup=True
    )
    assert dedup_plan is not None
    n_rows = lambda p: p["short"].shape[0] + p["long"].shape[0]
    assert n_rows(dedup_plan) < n_rows(plain_plan)  # dups actually elided
    cost = lambda p: p["short"].size + p["long"].shape[0] * T
    assert cost(dedup_plan) <= cost(plain_plan)

    params = clip.params
    plain = np.asarray(clip.infer_text_features(params, jnp.asarray(tokens)))
    bucketed = np.asarray(
        clip.infer_text_features_bucketed(
            params,
            jnp.asarray(dedup_plan["short"]),
            jnp.asarray(dedup_plan["long"]),
            jnp.asarray(dedup_plan["inv"]),
        )
    )
    np.testing.assert_allclose(bucketed, plain, atol=2e-5, rtol=2e-5)

    # low-duplicate batch: the cost comparison must never pick a dedup
    # plan that encodes MORE tokens than the raw partition
    tokens2 = np.concatenate([uniq, uniq[:8]])  # 25% dups of 32 rows
    raw2 = bucket_text_tokens(tokens2, short_len=8, capacity_quantum=16)
    ded2 = bucket_text_tokens(tokens2, short_len=8, capacity_quantum=16, dedup=True)
    if raw2 is not None and ded2 is not None:
        assert cost(ded2) <= cost(raw2)


def test_bucket_text_tokens_degenerate():
    from tvc.models.clip import bucket_text_tokens

    # all rows already at/below short_len -> nothing to split
    tokens = np.zeros((64, 8), np.int32)
    tokens[:, 3] = 1000
    assert bucket_text_tokens(tokens, short_len=8, capacity_quantum=16) is None
    # no short rows -> None
    tokens = np.zeros((64, 16), np.int32)
    tokens[:, 12] = 1000
    assert bucket_text_tokens(tokens, short_len=8, capacity_quantum=16) is None


@pytest.mark.slow
def test_bucket_text_tokens_sharded_dedup(clip):
    """Per-shard dedup (mesh serving): duplicate rows within a shard encode
    once, inv stays LOCAL per shard, and the cost comparison never picks a
    plan that encodes more tokens than the raw per-shard partition.

    slow: compiles a shard_map program; the bucketing core path stays in
    the fast tier via test_bucket_text_tokens_degenerate."""
    from tvc.models.clip import bucket_text_tokens_sharded

    rng = np.random.default_rng(5)
    T, n_shards, g = 16, 4, 64
    eot = clip.config.vocab_size - 1
    uniq = np.zeros((16, T), np.int32)
    for i in range(16):
        n = int(rng.integers(2, T if i % 3 else 7))
        uniq[i, : n - 1] = rng.integers(1, eot - 1, size=n - 1)
        uniq[i, n - 1] = eot
    tokens = uniq[rng.integers(0, 16, size=n_shards * g)]  # ~4x dups/shard
    raw = bucket_text_tokens_sharded(tokens, n_shards, short_len=8, capacity_quantum=16)
    ded = bucket_text_tokens_sharded(
        tokens, n_shards, short_len=8, capacity_quantum=16, dedup=True
    )
    assert ded is not None
    cost = lambda p: p["short"].size + p["long"].shape[0] * T
    if raw is not None:
        assert cost(ded) <= cost(raw)
    ns = ded["short"].shape[0] // n_shards
    nl = ded["long"].shape[0] // n_shards
    assert ded["inv"].max() < ns + nl  # local index space per shard
    # feature parity through the per-shard gather (single device stands in
    # for each shard: concat(short_k, long_k)[inv_k] == plain rows)
    params = clip.params
    plain = np.asarray(clip.infer_text_features(params, jnp.asarray(tokens)))
    for k in range(n_shards):
        fs = np.asarray(
            clip.infer_text_features(
                params, jnp.asarray(ded["short"][k * ns : (k + 1) * ns])
            )
        )
        fl = np.asarray(
            clip.infer_text_features(
                params, jnp.asarray(ded["long"][k * nl : (k + 1) * nl])
            )
        )
        got = np.concatenate([fs, fl])[ded["inv"][k * g : (k + 1) * g]]
        np.testing.assert_allclose(got, plain[k * g : (k + 1) * g], atol=2e-5, rtol=2e-5)
