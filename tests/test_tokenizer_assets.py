"""Bundled real tokenizer assets: the BPE path must be numerically
identical to the published tokenizers (transformers as local oracle)."""

import numpy as np
import pytest

from tvc.models.tokenizer import (
    ASSET_DIR,
    BPETokenizer,
    HashTokenizer,
    get_tokenizer,
)

CLIP_ASSETS = ASSET_DIR / "clip_tokenizer"
QWEN_ASSETS = ASSET_DIR / "qwen_tokenizer"

TEXTS = [
    "a photo of a dog",
    "A big red car on the street!",
    "two children play with a ball near the river",
    "an IMAGE showing a cat, sitting on a table.",
    "counting 1 2 3 four five",
]


@pytest.mark.skipif(not CLIP_ASSETS.exists(), reason="assets not bundled")
def test_clip_bpe_matches_transformers():
    from transformers import CLIPTokenizer

    oracle = CLIPTokenizer.from_pretrained(str(CLIP_ASSETS))
    tok = get_tokenizer(vocab_size=49408, context_length=77)
    assert isinstance(tok, BPETokenizer)  # real BPE is the default now
    for t in TEXTS:
        want = oracle(t)["input_ids"]
        got = tok([t])[0]
        got = [int(i) for i in got if i != tok.pad_id]
        assert got == want, (t, got, want)


@pytest.mark.skipif(not CLIP_ASSETS.exists(), reason="assets not bundled")
def test_clip_bpe_known_ids():
    """'a photo of a dog' -> the published OpenAI-CLIP token ids."""
    tok = get_tokenizer(49408, 77)
    ids = [int(i) for i in tok(["a photo of a dog"])[0] if i != 0]
    assert ids == [49406, 320, 1125, 539, 320, 1929, 49407]
    assert tok.eot_id == 49407  # argmax-pooling convention holds


@pytest.mark.skipif(not QWEN_ASSETS.exists(), reason="assets not bundled")
def test_qwen_tokenizer_roundtrip():
    tok = get_tokenizer(vocab_size=151936, context_length=64)
    ids = tok(["rewrite this sentence please"])
    assert ids.shape == (1, 64)
    text = tok.decode(ids[0])
    assert "rewrite this sentence" in text


def test_tiny_configs_keep_hash_fallback():
    tok = get_tokenizer(vocab_size=512, context_length=16)
    assert isinstance(tok, HashTokenizer)


@pytest.mark.slow
def test_clip_model_defaults_to_real_bpe():
    from tvc.models import CLIPConfig, CLIPModel

    model = CLIPModel(CLIPConfig(), seed=0)
    assert isinstance(model.tokenizer, BPETokenizer)
    ids = model.tokenize(["a photo of a dog"])
    assert int(ids[0][0]) == 49406
