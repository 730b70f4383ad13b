"""Fused Pallas consistency kernel vs the pure-jnp oracle (interpret mode on
CPU; the same pallas_call compiles on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tvc.core.pallas import consistency_scores_reference, fused_consistency_scores

KEYS = [
    "tv_score",
    "sd_score",
    "consistency_score",
    "aggregated",
    "orig_similarity",
    "variant_mean",
    "variant_std",
]


def make_inputs(rng, B=13, D=128, V=5, R=3):
    img = rng.normal(size=(B, D)).astype(np.float32)
    txt = rng.normal(size=(B, D)).astype(np.float32)
    variants = rng.normal(size=(B, V, D)).astype(np.float32)
    refs = rng.normal(size=(B, R, D)).astype(np.float32)
    vmask = rng.random((B, V)) > 0.2
    rmask = rng.random((B, R)) > 0.2
    vmask[0] = False  # a query with no variants
    rmask[1] = False  # a query with no references
    return tuple(jnp.asarray(x) for x in (img, txt, variants, refs, vmask, rmask))


@pytest.mark.parametrize("block_b", [128, 8])
def test_kernel_matches_oracle(rng, block_b):
    img, txt, variants, refs, vmask, rmask = make_inputs(rng)
    got = fused_consistency_scores(
        img, txt, variants, refs, vmask, rmask, block_b=block_b
    )
    want = consistency_scores_reference(img, txt, variants, refs, vmask, rmask)
    for k in KEYS:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=2e-5, err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(got["is_adversarial"]), np.asarray(want["is_adversarial"])
    )


def test_kernel_no_masks(rng):
    img, txt, variants, refs, _, _ = make_inputs(rng, B=4, V=8, R=8)
    got = fused_consistency_scores(img, txt, variants, refs, block_b=8)
    want = consistency_scores_reference(img, txt, variants, refs)
    for k in KEYS:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=2e-5, err_msg=k
        )


def test_kernel_custom_weights_threshold(rng):
    img, txt, variants, refs, vmask, rmask = make_inputs(rng, B=6)
    w = (0.2, 0.3, 0.5)
    got = fused_consistency_scores(
        img, txt, variants, refs, vmask, rmask, weights=w, threshold=0.4, block_b=8
    )
    want = consistency_scores_reference(
        img, txt, variants, refs, vmask, rmask, weights=w, threshold=0.4
    )
    np.testing.assert_allclose(
        np.asarray(got["aggregated"]), np.asarray(want["aggregated"]), atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got["is_adversarial"]), np.asarray(want["is_adversarial"])
    )


@pytest.mark.parametrize("fn", [fused_consistency_scores, consistency_scores_reference])
def test_shape_mismatch_raises(rng, fn):
    img, txt, variants, refs, _, _ = make_inputs(rng, B=4)
    with pytest.raises(ValueError, match="txt shape"):
        fn(img, txt[:2], variants, refs)
    with pytest.raises(ValueError, match="variants"):
        fn(img, txt, variants[:, :, :64], refs)
    with pytest.raises(ValueError, match="refs"):
        fn(img, txt, variants, refs[:1])
    with pytest.raises(ValueError, match="img"):
        fn(img[None], txt, variants, refs)
