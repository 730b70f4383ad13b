"""Qwen2 decode loop + Stable Diffusion sampler + SD reference generator
(tiny configs; architecture/determinism/integration correctness)."""

import numpy as np
import pytest

from tvc.models.qwen import QwenConfig, QwenModel
from tvc.models.sd import SDConfig, StableDiffusionModel, ddim_schedule
from tvc.sd_ref import SDReferenceConfig, SDReferenceGenerator, assess_image_quality


@pytest.fixture(scope="module")
def qwen():
    return QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=8)


@pytest.fixture(scope="module")
def sd():
    return StableDiffusionModel(SDConfig.tiny(), seed=0)


# ---- Qwen -------------------------------------------------------------------


def test_qwen_greedy_deterministic(qwen):
    a = qwen.generate(["hello world test"], temperature=0.0)
    b = qwen.generate(["hello world test"], temperature=0.0)
    assert a == b


def test_qwen_paraphrases_api(qwen):
    outs = qwen.generate_paraphrases("a cat sat on the mat", num_paraphrases=3)
    assert len(outs) <= 3
    assert all(isinstance(o, str) for o in outs)


@pytest.mark.slow
def test_qwen_sampling_varies_with_temperature(qwen):
    outs = qwen.generate(["same prompt"] * 4, temperature=1.5, seed=3)
    assert len(set(outs)) > 1  # different sample keys -> different outputs


@pytest.mark.slow
def test_qwen_augmenter_integration(qwen):
    from tvc.augment import TextAugmentConfig, TextAugmenter

    aug = TextAugmenter(
        TextAugmentConfig(
            enable_synonym_replacement=False,
            enable_syntax_transformation=False,
            enable_template=False,
            enable_quality_filter=False,
        ),
        paraphrase_generator=qwen.as_paraphrase_generator(),
    )
    out = aug.generate_variants("a dog runs in the park", 2)
    assert isinstance(out, list)


@pytest.mark.slow
def test_qwen_translate_api(qwen):
    """Batched translation decode: aligned, deterministic (greedy)."""
    texts = ["a dog in the park", "two cats on a mat"]
    out = qwen.translate(texts, "en", "de")
    assert len(out) == len(texts)
    assert all(isinstance(o, str) and o for o in out)
    assert out == qwen.translate(texts, "en", "de")  # greedy determinism


@pytest.mark.slow
def test_back_translation_live_via_qwen(qwen):
    """VERDICT r2 item 7: with a Qwen-backed paraphrase generator, the
    back-translation strategy runs with NO injected translator (reference
    ships Helsinki-NLP pipelines, src/text_augment.py:380-460)."""
    from tvc.augment import TextAugmentConfig, TextAugmenter

    aug = TextAugmenter(
        TextAugmentConfig(
            enable_synonym_replacement=False,
            enable_syntax_transformation=False,
            enable_template=False,
            enable_paraphrase_generation=False,
            enable_back_translation=True,
            enable_quality_filter=False,
        ),
        paraphrase_generator=qwen.as_paraphrase_generator(),
    )
    bt = aug.strategies["back_translation"]
    assert bt.translator is not None  # auto-derived from the Qwen model
    out = bt.augment("a dog runs in the park", 2)
    # tiny random-weight Qwen emits junk tokens, but the round-trip must
    # produce aligned, non-empty strings through the real decode path
    assert len(out) <= 2 and all(isinstance(o, str) for o in out)


@pytest.mark.slow
def test_qwen_kv_cache_matches_full_forward():
    """Greedy decode with KV cache must equal argmax over full re-forward."""
    import jax.numpy as jnp

    m = QwenModel(QwenConfig.tiny(), seed=1, max_new_tokens=4)
    prompt = "check cache equivalence now"
    out_cached = m.generate([prompt], temperature=0.0)[0]

    # manual: repeatedly full-forward and take argmax
    tok = m.tokenizer([prompt])
    lengths = (tok != m.tokenizer.pad_id).sum(axis=1)
    plen = int(lengths[0])
    ids = list(tok[0][:plen])
    for _ in range(4):
        T = len(ids)
        positions = jnp.arange(T)[None]
        mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -jnp.inf)[None, None]
        logits, _ = m.module.apply(
            {"params": m.params}, jnp.asarray([ids]), positions, mask
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        ids.append(nxt)
        if nxt == m.tokenizer.eot_id:
            break
    manual = m._detokenize(np.asarray(ids[plen:]))
    assert out_cached == manual


# ---- SD ---------------------------------------------------------------------


@pytest.mark.slow
def test_sd_generation_shapes_and_range(sd):
    imgs = sd.generate_image("a blue house", num_images=2, seed=1)
    assert len(imgs) == 2
    assert imgs[0].shape == (32, 32, 3)
    assert imgs[0].min() >= 0.0 and imgs[0].max() <= 1.0


@pytest.mark.slow
def test_sd_deterministic_per_seed(sd):
    a = sd.generate_image("a tree", num_images=1, seed=9)[0]
    b = sd.generate_image("a tree", num_images=1, seed=9)[0]
    c = sd.generate_image("a tree", num_images=1, seed=10)[0]
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


@pytest.mark.slow
def test_sd_batched_prompts(sd):
    out = sd.generate_images_batch(["a", "b", "c"], num_images=2, seed=0)
    assert len(out) == 3 and len(out[0]) == 2


@pytest.mark.slow
def test_sd_vae_roundtrip_shapes(sd):
    imgs = np.random.default_rng(0).random((2, 32, 32, 3)).astype(np.float32)
    lat = sd.encode_image(imgs)
    assert lat.shape == (2, 16, 16, 4)
    dec = np.asarray(sd.decode_latents(lat))
    assert dec.shape == (2, 32, 32, 3)
    assert dec.min() >= 0.0 and dec.max() <= 1.0


def test_ddim_schedule_monotone():
    ts, ac = ddim_schedule(SDConfig.tiny())
    assert len(ts) == SDConfig.tiny().num_inference_steps
    assert np.all(np.diff(ts) < 0)  # descending timesteps
    assert np.all(np.diff(ac) < 0)  # alphas_cumprod decreasing
    assert 0 < ac[-1] < ac[0] < 1


# ---- sd_ref ------------------------------------------------------------------


def test_assess_image_quality():
    blank = np.zeros((32, 32, 3))
    assert assess_image_quality(blank) == 0.0
    rng = np.random.default_rng(0)
    rich = rng.random((32, 32, 3))
    assert assess_image_quality(rich) > 0.2


@pytest.mark.slow
def test_sd_reference_generator(sd):
    from tvc.models import CLIPConfig, CLIPModel

    clip = CLIPModel(CLIPConfig.tiny(), seed=0)
    gen = SDReferenceGenerator(
        sd, SDReferenceConfig(num_images=2, quality_threshold=0.0), clip_model=clip
    )
    res = gen.generate_reference_images("a cat on a chair")
    assert len(res["images"]) == 2
    vecs = gen.generate_reference_vectors(["a cat", "a dog"], 2)
    assert vecs.shape == (2, 2, clip.config.embed_dim)
    # detector adapter
    adapter = gen.as_reference_generator()
    assert adapter(["x"], 2).shape == (1, 2, clip.config.embed_dim)


@pytest.mark.slow
def test_sd_reference_cache(tmp_path, sd):
    from tvc.models import CLIPConfig, CLIPModel

    clip = CLIPModel(CLIPConfig.tiny(), seed=0)
    gen = SDReferenceGenerator(
        sd,
        SDReferenceConfig(num_images=1, cache_dir=str(tmp_path), quality_threshold=0.0),
        clip_model=clip,
    )
    r1 = gen.generate_reference_images("cached prompt")
    assert not r1["cache_hit"]
    r2 = gen.generate_reference_images("cached prompt")
    assert r2["cache_hit"]
    np.testing.assert_array_equal(np.stack(r1["images"]), np.stack(r2["images"]))


@pytest.mark.slow
def test_sd_mesh_sharded_generation_matches_single():
    import jax

    from tvc.parallel import create_mesh

    mesh = create_mesh()
    sd_m = StableDiffusionModel(SDConfig.tiny(), seed=0, mesh=mesh)
    sd_s = StableDiffusionModel(SDConfig.tiny(), seed=0)
    a = sd_m.generate_images_batch(["x", "y", "z", "w"], num_images=2, seed=4)
    b = sd_s.generate_images_batch(["x", "y", "z", "w"], num_images=2, seed=4)
    for pa, pb in zip(a, b):
        for ia, ib in zip(pa, pb):
            # images travel device->host as uint8 (sd.py _build_sampler):
            # a float ULP of mesh-vs-single difference at a 0.5 rounding
            # boundary flips a pixel by exactly one 8-bit step
            np.testing.assert_allclose(ia, ib, atol=1.01 / 255)


@pytest.mark.slow
def test_qwen_int8_weight_only():
    """quantize_weights_int8: dequant roundtrip within per-channel scale
    bound; prefill logits track bf16; generate() runs end-to-end on the
    quantized tree (the decode program dequantizes in-trace)."""
    import jax
    import jax.numpy as jnp

    from tvc.models.qwen import QwenConfig, QwenModel

    m_ref = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=4)
    m_q = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=4)
    m_q.quantize_weights_int8()

    # quantized leaves exist and dequant stays within scale/2 per element
    flat = jax.tree_util.tree_leaves(
        m_q.params, is_leaf=lambda x: isinstance(x, dict) and "int8" in x
    )
    qleaves = [x for x in flat if isinstance(x, dict) and "int8" in x]
    assert qleaves, "no quantized leaves"
    deq = QwenModel._dequant(m_q.params)
    ref_leaves = jax.tree_util.tree_leaves(m_ref.params)
    deq_leaves = jax.tree_util.tree_leaves(deq)
    assert len(ref_leaves) == len(deq_leaves)

    # prefill logits parity (cosine, both through the decode-path math)
    B, T = 2, 8
    tok = np.ones((B, T), np.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    mask = jnp.where(
        jnp.arange(T)[None, None, None, :] <= jnp.arange(T)[None, None, :, None],
        0.0, -jnp.inf,
    )
    lg_ref, _ = m_ref.module.apply({"params": m_ref.params}, jnp.asarray(tok), pos, mask)
    lg_q, _ = m_q.module.apply({"params": QwenModel._dequant(m_q.params)}, jnp.asarray(tok), pos, mask)
    a = np.asarray(lg_ref, np.float64).ravel()
    b = np.asarray(lg_q, np.float64).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos

    # end-to-end generate on the quantized tree
    outs = m_q.generate_paraphrases("a cat sat on a mat", num_paraphrases=2)
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)

    # int8 x TP (round-2 VERDICT item 1): the quantized decode runs over a
    # 2D mesh with int8+scale leaves sharded on the model axis, and GREEDY
    # decode matches the single-device quantized model token-for-token
    from jax.sharding import Mesh
    from tvc.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), (DATA_AXIS, MODEL_AXIS))
    m_tp = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=4, mesh=mesh)
    m_tp.quantize_weights_int8()
    prompts = ["a cat sat on a mat", "two dogs run in a park"]
    tp_out = m_tp.generate(prompts, temperature=0.0)
    single_out = m_q.generate(prompts, temperature=0.0)
    assert tp_out == single_out, (tp_out, single_out)


@pytest.mark.slow
def test_qwen_init_int8_and_shared_prefill():
    """init_int8 (layer-wise int8 random init — the only 7B-feasible init
    on 16 GB) produces the same tree STRUCTURE as post-hoc quantization,
    and the shared-prefix n_samples decode (a) matches per-prompt grouping
    semantics, (b) under greedy decode equals the replicated-prompt path
    token-for-token (same KV contents, same logits)."""
    import dataclasses

    import jax

    from tvc.models.qwen import QwenConfig, QwenModel

    cfg = dataclasses.replace(QwenConfig.tiny(), tie_embeddings=False)
    m_post = QwenModel(cfg, seed=0, max_new_tokens=4)
    m_post.quantize_weights_int8()
    m_init = QwenModel(cfg, seed=0, max_new_tokens=4, init_int8=True)
    assert jax.tree_util.tree_structure(
        m_post.params
    ) == jax.tree_util.tree_structure(m_init.params)

    prompts = ["a cat sat on a mat", "two dogs run in a park"]
    # greedy: n_samples tiling must reproduce the replicated-prompt batch
    tiled = m_init.generate(prompts, temperature=0.0, n_samples=3)
    replicated = m_init.generate(
        [p for p in prompts for _ in range(3)], temperature=0.0
    )
    assert tiled == replicated, (tiled, replicated)
    # sampled: rows group per prompt, chains are independent (not all equal)
    outs = m_init.generate(prompts, temperature=1.0, n_samples=4, seed=1)
    assert len(outs) == 8
    assert len(set(outs)) > 1, "sampling chains collapsed to one sequence"


def test_generate_async_matches_sync(qwen):
    """generate_async is the dispatch/finalize split of generate: identical
    output for the same seed, and the dispatch returns before the result
    (the single-threaded double-buffering primitive for serving)."""
    texts = ["a dog runs in the park", "a red car on the street"]
    handle = qwen.generate_paraphrases_batch_async(texts, 2, seed=3)
    assert callable(handle)
    sync = qwen.generate_paraphrases_batch(texts, 2, seed=3)
    assert handle() == sync
    # empty input short-circuits without a decode
    assert qwen.generate_paraphrases_batch_async([], 2)() == []


def test_batch_generate_variants_async_matches_sync(qwen):
    """TextAugmenter.batch_generate_variants_async finalizer returns the
    same variants as the sync batch path (same adapter, same texts)."""
    from tvc.augment.text_augment import TextAugmentConfig, TextAugmenter

    aug_async = TextAugmenter(
        TextAugmentConfig(enable_back_translation=False),
        paraphrase_generator=qwen.as_paraphrase_generator(),
    )
    aug_sync = TextAugmenter(
        TextAugmentConfig(enable_back_translation=False),
        paraphrase_generator=qwen.as_paraphrase_generator(),
    )
    texts = ["a dog runs in the park", "a red car on the street"]
    handle = aug_async.batch_generate_variants_async(texts, 3)
    assert aug_sync.batch_generate_variants(texts, 3) == handle()


def test_token_mask_constrains_decode(qwen):
    """generate(..., token_mask=...) never emits a disallowed id: decoded
    continuations only contain tokens from the allowed vocabulary rows
    (plus EOT so chains can terminate)."""
    import numpy as np

    vocab = qwen.config.vocab_size
    eot = qwen.tokenizer.eot_id
    rng = np.random.default_rng(0)
    mask = np.zeros((vocab,), bool)
    mask[rng.choice(vocab, size=vocab // 4, replace=False)] = True
    mask[eot] = True
    prompts = ["a dog runs", "a red car"]
    h = qwen.generate_async(prompts, temperature=0.8, seed=2, token_mask=mask)
    h()  # detok output is tokenizer-dependent; inspect raw ids instead
    non_layer, stacked = qwen._decode_state()
    import jax, jax.numpy as jnp

    tok = qwen.tokenizer(prompts)
    lengths = (tok != qwen.tokenizer.pad_id).sum(axis=1)
    plen, _, _, n_allowed, _ = qwen._decode_fn[0]
    allowed = np.nonzero(mask)[0].astype(np.int32)
    n_real = len(allowed)
    assert n_allowed == -(-n_real // 128) * 128
    allowed = np.pad(allowed, (0, n_allowed - n_real), constant_values=int(allowed[0]))
    out = qwen._decode_fn[1](
        non_layer, stacked, jnp.asarray(tok[:, :plen]),
        jnp.asarray(np.minimum(lengths, plen), np.int32),
        jax.random.PRNGKey(2), jnp.asarray(0.8, jnp.float32),
        jnp.asarray(allowed), jnp.asarray(n_real, jnp.int32),
    )
    ids = np.asarray(out)
    assert mask[ids.reshape(-1)].all(), ids

    # all-True mask reproduces the unconstrained output bit-for-bit
    free = qwen.generate(prompts, temperature=0.8, seed=3)
    ones = qwen.generate(
        prompts, temperature=0.8, seed=3, token_mask=np.ones((vocab,), bool)
    )
    assert free == ones


@pytest.mark.slow
def test_decode_state_invalidates_on_params_swap():
    """Reassigning .params must rebuild the stacked decode tree (the
    fixture pattern `model.params = loaded` must not serve stale
    weights), and a decode_only model whose per-layer params were freed
    raises a clear error instead of KeyError."""
    import copy

    import numpy as np

    m = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=4)
    out_a = m.generate(["a b c"], temperature=0.0)
    state_a = m._decode_state()
    # swap in a different weight tree (re-init at another seed)
    m.params = QwenModel(QwenConfig.tiny(), seed=1, max_new_tokens=4).params
    state_b = m._decode_state()
    assert state_b is not state_a
    out_b = m.generate(["a b c"], temperature=0.0)
    assert out_a != out_b  # new weights actually serve

    d = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=4, decode_only=True)
    d.generate(["a b c"], temperature=0.0)  # builds state, frees layers
    d.quantize_weights_int8()  # resets the cache; layers are gone
    import pytest

    with pytest.raises(RuntimeError, match="decode_only"):
        d.generate(["a b c"], temperature=0.0)


@pytest.mark.slow
def test_chunked_decode_matches_single_chunk():
    """The early-exit chunked decode (while_loop over DECODE_CHUNK-step
    scans) is bit-identical to one uninterrupted scan: the per-step RNG
    sequence is unchanged and skipped steps only emit the EOT fill."""
    import tvc.models.qwen as qwen_mod

    prompts = ["a dog runs", "a red car on the street"]
    orig = qwen_mod.DECODE_CHUNK
    try:
        qwen_mod.DECODE_CHUNK = 8  # max_new == chunk -> plain scan path
        m1 = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=8)
        plain = m1.generate(prompts, temperature=0.8, seed=5, n_samples=2)
        qwen_mod.DECODE_CHUNK = 4  # chunked while_loop path
        m2 = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=8)
        chunked = m2.generate(prompts, temperature=0.8, seed=5, n_samples=2)
    finally:
        qwen_mod.DECODE_CHUNK = orig
    assert plain == chunked


def test_chunked_decode_early_exit_all_eot(qwen):
    """A mask allowing only EOT drives every chain done on step 1; the
    early-exit path must still return the full-width all-EOT buffer."""
    import numpy as np

    eot = qwen.tokenizer.eot_id
    mask = np.zeros((qwen.config.vocab_size,), bool)
    mask[eot] = True
    out = qwen.generate(["a dog runs"], temperature=0.8, seed=1, token_mask=mask)
    assert out == [""]  # all-EOT continuation detokenizes to empty


def test_ascii_token_mask_shape(qwen):
    """ascii_token_mask: bool [vocab], EOT allowed, cached per instance."""
    m = qwen.ascii_token_mask()
    assert m.shape == (qwen.config.vocab_size,) and m.dtype == bool
    assert m[qwen.tokenizer.eot_id]
    assert m is qwen.ascii_token_mask()  # cached


# ---- prefix-shared prefill --------------------------------------------------


class _WordTok:
    """Word-level tokenizer WITHOUT per-call BOS/EOS wrapping — splitting a
    prompt at a space boundary is token-exact, so the prefix-shared prefill
    path engages (unlike HashTokenizer, whose sot/eot wrappers force the
    fallback)."""

    def __init__(self, vocab_size=512, context_length=48):
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.pad_id = 0
        self.eot_id = vocab_size - 1

    def _ids(self, text):
        ws = "".join(c if c.isalnum() else " " for c in text.lower()).split()
        return [1 + (hash(w) % (self.vocab_size - 3)) for w in ws]

    def __call__(self, texts):
        import numpy as np

        out = np.full((len(texts), self.context_length), self.pad_id, np.int32)
        for i, t in enumerate(texts):
            ids = self._ids(t)[: self.context_length]
            out[i, : len(ids)] = ids
        return out

    def decode(self, ids):
        return " ".join(
            f"w{int(i)}" for i in ids if i not in (self.pad_id, self.eot_id)
        )


@pytest.mark.slow
def test_prefix_shared_prefill_matches_plain():
    """Two-phase prefix-shared prefill (batch-1 prefix KV broadcast + suffix
    prefill at offset P) is numerically the same program as plain prefill:
    greedy decode matches token-for-token, and the prefix path actually
    engaged (verdict cache records the split as token-exact)."""
    from tvc.models.qwen import QwenConfig, QwenModel

    tok = _WordTok()
    prompts = [
        "rewrite this sentence: a cat sat on the mat",
        "rewrite this sentence: two dogs run in a park today",
    ]
    m = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=6, tokenizer=tok)
    plain = m.generate(prompts, temperature=0.0)
    m2 = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=6, tokenizer=tok)
    pref = m2.generate(
        prompts, temperature=0.0, shared_prefix="rewrite this sentence:"
    )
    assert m2._prefix_ok_cache == {"rewrite this sentence:": True}
    assert pref == plain, (pref, plain)
    # n_samples grouping survives the prefix path (greedy: tiled == repeat)
    tiled = m2.generate(
        prompts, temperature=0.0, n_samples=2,
        shared_prefix="rewrite this sentence:",
    )
    assert tiled == [p for p in plain for _ in range(2)]


def test_prefix_shared_prefill_fallback_hash_tokenizer(qwen):
    """HashTokenizer wraps every call in sot/eot, so no string split is
    token-exact — generate with shared_prefix must fall back to plain
    prefill (same output, verdict cached False), not raise."""
    prompts = ["rewrite: a cat", "rewrite: a dog"]
    plain = qwen.generate(prompts, temperature=0.0)
    pref = qwen.generate(prompts, temperature=0.0, shared_prefix="rewrite:")
    assert pref == plain
    assert qwen._prefix_ok_cache["rewrite:"] is False


@pytest.mark.slow
def test_paraphrase_prefix_splits_real_qwen_tokenizer():
    """PARAPHRASE_PREFIX / TRANSLATE_PREFIX end on a byte-level-BPE
    pretokenizer boundary: prefix ids + suffix ids == full-prompt ids under
    the REAL Qwen2 tokenizer, over real COCO captions."""
    import json
    from pathlib import Path

    import numpy as np

    from tvc.models.qwen import (
        PARAPHRASE_PROMPT,
        PARAPHRASE_PREFIX,
        TRANSLATE_PROMPT,
        TRANSLATE_PREFIX,
    )
    from tvc.models.tokenizer import ASSET_DIR, get_tokenizer

    if not (ASSET_DIR / "qwen_tokenizer" / "vocab.json").exists():
        import pytest

        pytest.skip("qwen tokenizer assets not bundled")
    tok = get_tokenizer(vocab_size=151936, context_length=128)
    coco = Path("/root/reference/data/raw/coco/annotations/captions_val2017.json")
    if coco.exists():
        anns = json.loads(coco.read_text())["annotations"]
        texts = [a["caption"].strip() for a in anns[:25]]
    else:
        texts = ["a cat sat on the mat", "Two dogs playing in a park."]
    cases = [(PARAPHRASE_PREFIX, PARAPHRASE_PROMPT.format(text=t)) for t in texts]
    tp = TRANSLATE_PREFIX.format(src="English", dst="German")
    cases += [
        (tp, TRANSLATE_PROMPT.format(src="English", dst="German", text=t))
        for t in texts[:5]
    ]
    pad = tok.pad_id
    for prefix, full in cases:
        fids = tok([full])[0]
        pids = tok([prefix])[0]
        sids = tok([full[len(prefix):]])[0]
        real = lambda r: r[: int((r != pad).sum())]
        got = np.concatenate([real(pids), real(sids)])
        want = real(fids)
        assert np.array_equal(got, want), (prefix, full)
