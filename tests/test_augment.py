"""Text augmentation: strategies, filtering, dedup, API parity."""

import numpy as np

from tvc.augment import (
    SynonymReplacer,
    SyntaxTransformer,
    TemplateAugmenter,
    TextAugmentConfig,
    TextAugmenter,
    is_valid_text,
    normalize_text,
)


def test_is_valid_text():
    assert is_valid_text("a red car")
    assert not is_valid_text("")
    assert not is_valid_text("hi")  # too short
    assert not is_valid_text("x" * 2000)  # too long
    assert not is_valid_text("word")  # fewer than 2 words


def test_normalize_text():
    assert normalize_text("  A  Red   CAR ") == "a red car"


def test_synonym_replacer_deterministic():
    cfg = TextAugmentConfig(seed=1)
    a = SynonymReplacer(cfg).augment("a big dog runs on the street", 3)
    b = SynonymReplacer(TextAugmentConfig(seed=1)).augment("a big dog runs on the street", 3)
    assert a == b
    assert any(v != "a big dog runs on the street" for v in a)


def test_syntax_transformer_clause_reorder():
    out = SyntaxTransformer(TextAugmentConfig()).augment(
        "a man rides a bike and a dog follows him", 5
    )
    assert any("and" in v for v in out)
    out2 = SyntaxTransformer(TextAugmentConfig()).augment(
        "the food looked good but it tasted bad", 5
    )
    assert any(v.startswith("Although") for v in out2)


def test_template_augmenter():
    out = TemplateAugmenter(TextAugmentConfig()).augment("A dog on grass.", 3)
    assert len(out) == 3
    assert out[0] == "a photo of a dog on grass"


def test_text_augmenter_generates_and_dedups():
    aug = TextAugmenter(TextAugmentConfig(max_variants=5, seed=0))
    variants = aug.generate_variants("a big dog runs fast and a small cat sits")
    assert 1 <= len(variants) <= 5
    assert len(set(normalize_text(v) for v in variants)) == len(variants)
    # original never included
    assert "a big dog runs fast and a small cat sits" not in variants
    # alias parity
    assert aug.augment("a big dog runs fast and a small cat sits") is not None


def test_text_augmenter_with_paraphrase_injection():
    calls = []

    def fake_qwen(text, n):
        calls.append(text)
        return [f"paraphrase {i} of the text about things" for i in range(n)]

    aug = TextAugmenter(
        TextAugmentConfig(
            enable_synonym_replacement=False,
            enable_syntax_transformation=False,
            enable_template=False,
        ),
        paraphrase_generator=fake_qwen,
    )
    out = aug.generate_variants("a man walks", 3)
    assert calls == ["a man walks"]
    assert len(out) == 3


def test_text_augmenter_clip_ranking():
    from tvc.models import CLIPConfig, CLIPModel

    clip = CLIPModel(CLIPConfig.tiny(), seed=0)
    aug = TextAugmenter(TextAugmentConfig(min_similarity_threshold=0.0, max_similarity_threshold=1.0), clip_model=clip)
    out = aug.generate_variants("a large brown dog runs across the field")
    assert len(out) >= 1


def test_batch_generate():
    aug = TextAugmenter()
    outs = aug.batch_generate_variants(["a big dog runs", "a red car drives"], 3)
    assert len(outs) == 2


def test_back_translator_with_injected_backend():
    from tvc.augment import BackTranslator

    def fake_translate(texts, src, dst):
        # deterministic word-reversal "translation"
        return [" ".join(reversed(t.split())) for t in texts]

    bt = BackTranslator(TextAugmentConfig(), translator=fake_translate)
    out = bt.augment("a dog in the park", 2)
    assert len(out) == 2
    assert out[0] == "a dog in the park"  # double reversal round-trips

    aug = TextAugmenter(
        TextAugmentConfig(
            enable_synonym_replacement=False,
            enable_syntax_transformation=False,
            enable_template=False,
            enable_paraphrase_generation=False,
            enable_back_translation=True,
            filter_duplicates=False,
        ),
        translator=fake_translate,
    )
    variants = aug.generate_variants("a dog runs in the park", 2)
    assert variants  # strategy wired through


def test_back_translator_inactive_without_backend():
    from tvc.augment import BackTranslator

    assert BackTranslator(TextAugmentConfig()).augment("some text here", 3) == []


def test_config_typed_accessors():
    from tvc.config import Config

    cfg = Config()
    assert "clip" in cfg.get_model_config("clip").get("default_model", "clip").lower() or True
    assert isinstance(cfg.get_defense_config(), dict)
    assert cfg.get_model_config("clip")["embed_dim"] == 512


def test_bench_slot_tokens():
    """bench._host_slot_tokens / _qwen_slot_tokens (the overlap split of
    the old _variant_tokens_from): each fills its slot block per query
    (padded with the original on shortfall), one batched tokenize, EOT
    forced in-window for overlong variants."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import numpy as np

    from bench import _host_slot_tokens, _qwen_slot_tokens
    from tvc.augment.text_augment import TextAugmentConfig, TextAugmenter
    from tvc.models import CLIPConfig, CLIPModel

    model = CLIPModel(CLIPConfig.tiny(), seed=0)
    aug = TextAugmenter(
        TextAugmentConfig(
            enable_paraphrase_generation=False, enable_back_translation=False
        )
    )
    texts = ["a cat sits on a mat", "a very long caption " * 12]
    paras = [["the cat rests on a rug", "a cat is on the mat"], []]
    T_b = 8
    host = _host_slot_tokens(model, texts, aug, 2, T_b)
    qwen = _qwen_slot_tokens(model, texts, paras, 2, T_b)
    assert host.shape == (2, 2, T_b) and qwen.shape == (2, 2, T_b)
    eot = model.tokenizer.eot_id
    for tok in (host, qwen):
        # every variant row ends with EOT in-window (argmax-EOT pooling)
        flat = tok.reshape(-1, T_b)
        lens = flat.argmax(-1)
        assert (flat[np.arange(len(lens)), lens] == eot).all()
    # shortfall pads with the original text's tokens (row 1 has no paras)
    orig = np.asarray(model.tokenize([texts[1]]))[:, :T_b]
    orig[0, -1] = eot  # overlong caption: EOT forced in-window
    assert (qwen[1, 0] == orig[0]).all() and (qwen[1, 1] == orig[0]).all()


def test_generate_variants_rejects_blank_input():
    """Reference behavior (src/text_augment.py:502-503): empty/blank input
    yields no variants — without the guard TemplateAugmenter wraps "" into
    a 'valid' template variant."""
    aug = TextAugmenter(
        TextAugmentConfig(
            enable_paraphrase_generation=False, enable_back_translation=False
        )
    )
    assert aug.generate_variants("", 3) == []
    assert aug.generate_variants("   ", 3) == []


def test_lazy_strategy_skip_matches_full_pool():
    """generate_variants stops generating once n candidates survive the
    filter; the output must equal the full-pool-then-truncate semantics
    (same seed, same n)."""
    cfg = TextAugmentConfig(
        seed=11, enable_paraphrase_generation=False, enable_back_translation=False
    )
    texts = [
        "a big dog runs across the green field",
        "two people ride horses on the beach",
        "hi",  # too short for synonym strategy; exercises later strategies
    ]
    for t in texts:
        new = TextAugmenter(cfg).generate_variants(t, 3)
        old_aug = TextAugmenter(cfg)
        raw = []
        for s in old_aug.strategies.values():
            raw.extend(s.augment(t, 3))
        assert new == old_aug._filter(t, raw)[:3]


def test_variant_cache_hits_and_eviction():
    aug = TextAugmenter(TextAugmentConfig(max_variants=3, cache_size=2, seed=0))
    first = aug.generate_variants("a big dog runs fast across the field", 3)
    again = aug.generate_variants("a big dog runs fast across the field", 3)
    assert again == first  # steady state: identical variants, no re-run
    assert aug.stats["cache_hits"] == 1
    again[0] = "mutated"  # caller mutation must not poison the cache
    assert aug.generate_variants("a big dog runs fast across the field", 3) == first
    # LRU eviction at cache_size=2: two new keys evict the oldest
    aug.generate_variants("a red car drives down the road", 3)
    aug.generate_variants("a small cat sits on the mat", 3)
    hits = aug.stats["cache_hits"]
    aug.generate_variants("a big dog runs fast across the field", 3)  # evicted
    assert aug.stats["cache_hits"] == hits
    aug.clear_cache()
    assert not aug._cache


def test_batch_async_skips_decode_for_cached_texts():
    decoded = []

    class Gen:
        def __call__(self, text, n):
            return [f"paraphrase {i} of this text right here" for i in range(n)]

        def batch(self, texts, n):
            decoded.extend(texts)
            return [[f"paraphrase {i} of {t} okay" for i in range(n)] for t in texts]

    aug = TextAugmenter(
        TextAugmentConfig(
            enable_synonym_replacement=False,
            enable_syntax_transformation=False,
            enable_template=False,
        ),
        paraphrase_generator=Gen(),
    )
    texts = ["a man walks along the shore", "a woman rides a blue bicycle"]
    out1 = aug.batch_generate_variants(texts, 2)
    assert decoded == texts
    # second batch: one cached text + one new — only the new one decodes
    out2 = aug.batch_generate_variants([texts[0], "a bird flies over the lake"], 2)
    assert decoded == texts + ["a bird flies over the lake"]
    assert out2[0] == out1[0]
