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
