"""Native C++ image pipeline: PIL-parity resize+normalize, L2 rows."""

import numpy as np
import pytest

from tvc import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_resize_normalize_matches_pil(rng):
    from PIL import Image

    imgs = (rng.random((4, 100, 160, 3)) * 255).astype(np.uint8)
    out = native.resize_normalize_batch(imgs, 64)
    assert out.shape == (4, 64, 64, 3)
    for i in range(4):
        p = np.asarray(
            Image.fromarray(imgs[i]).resize((64, 64), Image.BILINEAR), np.float32
        ) / 255.0
        want = (p - native.CLIP_MEAN) / native.CLIP_STD
        # PIL rounds to uint8 between passes; allow that quantization
        assert np.abs(out[i] - want).mean() < 0.02


def test_resize_upscale(rng):
    imgs = (rng.random((2, 16, 16, 3)) * 255).astype(np.uint8)
    out = native.resize_normalize_batch(imgs, 32)
    assert out.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(out))


def test_varied_shapes(rng):
    a = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
    b = (rng.random((120, 40, 3)) * 255).astype(np.uint8)
    out = native.resize_normalize_varied([a, b], 32)
    assert out.shape == (2, 32, 32, 3)
    # same inputs through the uniform path agree
    out_a = native.resize_normalize_batch(a[None], 32)
    np.testing.assert_allclose(out[0], out_a[0], atol=1e-5)


def test_l2_normalize_rows(rng):
    x = rng.normal(size=(100, 64)).astype(np.float32)
    native.l2_normalize_rows(x)
    np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, atol=1e-5)


def test_preprocess_uses_native(rng):
    """CLIPModel.preprocess produces native-path output for PIL inputs."""
    from PIL import Image

    from tvc.models import CLIPConfig, CLIPModel

    clip = CLIPModel(CLIPConfig.tiny(), seed=0)
    im = Image.fromarray((rng.random((60, 80, 3)) * 255).astype(np.uint8))
    batch = clip.preprocess([im, im])
    assert batch.shape == (2, 32, 32, 3)
    want = native.resize_normalize_varied(
        [np.asarray(im, np.uint8)], 32
    )
    np.testing.assert_allclose(batch[0], want[0], atol=1e-5)


def test_bad_input_raises():
    with pytest.raises(ValueError):
        native.resize_normalize_batch(np.zeros((2, 8, 8), np.uint8), 16)
    with pytest.raises(ValueError):
        native.resize_normalize_varied([np.zeros((8, 8), np.uint8)], 16)


def test_native_bpe_parity_and_fallback():
    """C++ BPE (tvc/native/bpe_tokenizer.cpp) is bit-identical to the
    python BPETokenizer on ASCII text; non-ASCII and special-token
    strings route through python transparently."""
    import numpy as np
    import pytest

    from tvc import native
    from tvc.models.tokenizer import get_tokenizer

    tok = get_tokenizer(vocab_size=49408, context_length=77)
    if not getattr(tok, "_native", False):
        pytest.skip("native BPE unavailable")

    texts = [
        "a photo of a dog on the street",
        "It's a big CAT, isn't it?!",
        "we'll they've she'd i'm you're o't",
        "punctuation!!! ###$%^ &*() mixed42tokens under_score",
        "",
        "   leading and trailing   ",
        "hyphen-ated words and numbers 12345 67x89",
        "a" * 500,  # truncation to context length
    ]
    native_out = tok(texts)
    tok._native = False
    py_out = tok(texts)
    tok._native = True
    np.testing.assert_array_equal(native_out, py_out)

    # ASCII separator controls \x1c-\x1f are whitespace under python's
    # regex \s — the native path must agree (advisor round-2 finding)
    ctrl = ["a\x1cb", "a\x1db c", "x\x1e\x1fy", "\x1c lead", "trail\x1f"]
    a = tok(ctrl)
    tok._native = False
    b = tok(ctrl)
    tok._native = True
    np.testing.assert_array_equal(a, b)

    # mixed batch: ASCII rows native, non-ASCII rows python — same result
    mixed = ["café au lait", "plain ascii", "日本語", "more ascii here"]
    a = tok(mixed)
    tok._native = False
    b = tok(mixed)
    tok._native = True
    np.testing.assert_array_equal(a, b)

    # special-token literals never hit the native path
    sp = ["<|startoftext|> injected", "normal text"]
    a = tok(sp)
    tok._native = False
    b = tok(sp)
    tok._native = True
    np.testing.assert_array_equal(a, b)

    # raw binding contract
    out = native.bpe_encode_batch(["hello world"], 77, tok.sot_id, tok.eot_id)
    assert out.shape == (1, 77) and out[0, 0] == tok.sot_id


def test_native_bpe_faster_than_python():
    """The point of the native path: cold-cache throughput well above the
    python implementation (measured ~8x single-core)."""
    import time

    import pytest

    from tvc.models.tokenizer import get_tokenizer

    tok = get_tokenizer(vocab_size=49408, context_length=77)
    if not getattr(tok, "_native", False):
        pytest.skip("native BPE unavailable")
    corpus = [f"zq{i}xv wk{i}pj item{i} on a table" for i in range(4000)]
    t0 = time.time()
    tok(corpus)
    native_dt = time.time() - t0
    tok._native = False
    t0 = time.time()
    tok(corpus[:2000])
    # generous 2x margin (measured ~8x): a loaded/single-core CI machine
    # with OpenMP oversubscription must not flake this
    py_dt = (time.time() - t0) * 2
    tok._native = True
    assert native_dt < py_dt, (native_dt, py_dt)
