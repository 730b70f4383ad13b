"""Detector math vs closed-form oracles ported from the reference formulas
(reference src/detector.py:479-485,:542,:579,:655-680;
experiments/defenses/consistency_checker.py:130-242)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tvc.core import consistency as C


def np_text_variant_score(orig, vsims):
    consistency = 1.0 - abs(orig - vsims.mean())
    variability = 1.0 - vsims.std()
    return 1.0 - (0.7 * consistency + 0.3 * variability)


def test_text_variant_score_formula(rng):
    orig = rng.random(6).astype(np.float32)
    vs = rng.random((6, 5)).astype(np.float32)
    got = np.asarray(C.text_variant_score(jnp.asarray(orig), jnp.asarray(vs)))
    want = np.array([np_text_variant_score(orig[b], vs[b]) for b in range(6)])
    assert np.allclose(got, want, atol=1e-5)


def test_text_variant_score_empty_mask_is_zero():
    orig = jnp.asarray([0.5])
    vs = jnp.zeros((1, 4))
    mask = jnp.zeros((1, 4), dtype=bool)
    assert float(C.text_variant_score(orig, vs, mask)[0]) == 0.0


def test_reference_score(rng):
    rs = rng.random((3, 4)).astype(np.float32)
    got = np.asarray(C.reference_score(jnp.asarray(rs)))
    assert np.allclose(got, 1.0 - rs.mean(-1), atol=1e-5)


def test_aggregate_weighted_mean_default_weights(rng):
    scores = rng.random((5, 3)).astype(np.float32)
    got = np.asarray(C.aggregate_scores(jnp.asarray(scores), method="weighted_mean"))
    w = np.array([0.4, 0.4, 0.2])
    want = (scores * w).sum(-1) / w.sum()
    assert np.allclose(got, want, atol=1e-5)


def test_aggregate_methods(rng):
    scores = rng.random((4, 3)).astype(np.float32)
    s = jnp.asarray(scores)
    assert np.allclose(np.asarray(C.aggregate_scores(s, method="mean")), scores.mean(-1), atol=1e-5)
    assert np.allclose(np.asarray(C.aggregate_scores(s, method="max")), scores.max(-1), atol=1e-5)
    assert np.allclose(np.asarray(C.aggregate_scores(s, method="min")), scores.min(-1), atol=1e-5)
    with pytest.raises(ValueError):
        C.aggregate_scores(s, method="median")


def test_aggregate_respects_missing_methods():
    scores = jnp.asarray([[0.8, 0.0, 0.4]])
    present = jnp.asarray([[True, False, True]])
    got = float(C.aggregate_scores(scores, present, method="weighted_mean")[0])
    want = (0.8 * 0.4 + 0.4 * 0.2) / (0.4 + 0.2)
    assert np.isclose(got, want, atol=1e-6)


def test_detect_end_to_end_directions(rng):
    """Clean query: image matches text & variants & refs -> low score.
    Adversarial: image far from everything -> high score."""
    D = 64
    t = rng.normal(size=(D,)).astype(np.float32)
    clean_img = t + 0.05 * rng.normal(size=(D,)).astype(np.float32)
    adv_img = -t + 0.05 * rng.normal(size=(D,)).astype(np.float32)
    variants = np.stack([t + 0.1 * rng.normal(size=(D,)) for _ in range(6)]).astype(np.float32)
    refs = np.stack([t + 0.1 * rng.normal(size=(D,)) for _ in range(4)]).astype(np.float32)

    from tvc.core import similarity as S

    img = jnp.asarray(np.stack([clean_img, adv_img]))
    txt = jnp.asarray(np.stack([t, t]))
    vs = S.batched_set_cosine(img, jnp.asarray(np.stack([variants, variants])))
    rs = S.batched_set_cosine(img, jnp.asarray(np.stack([refs, refs])))
    orig = S.cosine_similarity(img, txt)
    flags, agg, per = C.detect(orig, vs, rs)
    assert float(agg[1]) > float(agg[0])
    assert bool(flags[1]) and not bool(flags[0])


# ---- alt stack -------------------------------------------------------------


def test_consistency_metrics_matches_reference_semantics(rng):
    orig = np.array([0.6, 0.2], dtype=np.float32)
    vs = rng.random((2, 5)).astype(np.float32)
    rsims = rng.random((2, 3)).astype(np.float32)
    gs = rng.random((2, 3)).astype(np.float32)
    vmask = np.ones((2, 5), bool)
    vmask[1] = False  # no variants -> falls back to orig similarity
    m = C.compute_consistency_metrics(
        jnp.asarray(orig), jnp.asarray(vs), jnp.asarray(rsims), jnp.asarray(gs),
        variant_mask=jnp.asarray(vmask),
    )
    assert np.isclose(float(m.text_variant_consistency[0]), vs[0].mean(), atol=1e-5)
    assert np.isclose(float(m.text_variant_std[0]), vs[0].std(), atol=1e-5)
    assert np.isclose(float(m.text_variant_consistency[1]), orig[1], atol=1e-6)
    assert float(m.text_variant_std[1]) == 0.0
    # cross-modal variance over positive sims
    sims0 = np.array([orig[0], vs[0].mean(), rsims[0].mean(), gs[0].mean()])
    pos = sims0[sims0 > 0]
    assert np.isclose(float(m.cross_modal_variance[0]), pos.var(), atol=1e-5)


def test_overall_score_strategies(rng):
    orig = jnp.asarray([0.5])
    vs = jnp.asarray(rng.random((1, 4)).astype(np.float32))
    rsims = jnp.asarray(rng.random((1, 3)).astype(np.float32))
    gs = jnp.asarray(rng.random((1, 3)).astype(np.float32))
    m = C.compute_consistency_metrics(orig, vs, rsims, gs)
    sims = np.asarray(m.stacked())[0]
    simple = float(C.overall_score(m, "simple")[0])
    assert np.isclose(simple, sims[sims > 0].mean(), atol=1e-5)
    weighted = float(C.overall_score(m, "weighted")[0])
    assert np.isclose(weighted, np.average(sims, weights=[0.25] * 4), atol=1e-5)
    # adaptive: reliability weights 1/(1+std), orig weight 1, normalized
    stds = np.asarray(m.stds())[0]
    rel = np.concatenate([[1.0], 1.0 / (1.0 + stds)])
    rel = rel / rel.sum()
    want = (sims * rel).sum() / rel.sum()
    assert np.isclose(float(C.overall_score(m, "adaptive")[0]), want, atol=1e-5)


def test_adaptive_threshold_bumps_and_clip():
    base = 0.5
    m = C.ConsistencyMetrics(
        original_similarity=jnp.asarray([0.5, 0.5]),
        text_variant_consistency=jnp.asarray([0.5, 0.5]),
        text_variant_std=jnp.asarray([0.0, 0.5]),
        retrieval_consistency=jnp.asarray([0.5, 0.5]),
        retrieval_std=jnp.asarray([0.0, 0.5]),
        generative_consistency=jnp.asarray([0.5, 0.5]),
        generative_std=jnp.asarray([0.0, 0.5]),
        cross_modal_variance=jnp.asarray([0.0, 0.5]),
    )
    thr = np.asarray(C.adaptive_threshold(m, base))
    assert np.isclose(thr[0], 0.5)
    assert np.isclose(thr[1], 0.65)  # +0.1 (variance) +0.05 (std)
    # smoothing toward history
    thr2 = np.asarray(C.adaptive_threshold(m, base, history_mean=jnp.asarray(0.9)))
    assert np.isclose(thr2[0], 0.7 * 0.5 + 0.3 * 0.9, atol=1e-6)


def test_alt_decision_direction():
    assert bool(C.alt_is_adversarial(jnp.asarray(0.3), jnp.asarray(0.5)))
    assert not bool(C.alt_is_adversarial(jnp.asarray(0.7), jnp.asarray(0.5)))
