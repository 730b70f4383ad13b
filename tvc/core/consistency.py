"""Text-Variant-Consistency detector math — pure, batched, jittable.

Implements both detector formulations found in the reference, as
closed-form batched functions over embeddings (no per-sample loops):

* the **primary stack** (reference src/detector.py:441-680): three detection
  scores in [0, 1] — text-variant, reference-image, global-consistency —
  aggregated by mean/max/min/weighted-mean; ``aggregated > threshold``
  means adversarial.
* the **alt stack** (reference experiments/defenses/detector.py:228-293 and
  consistency_checker.py:119-242): consistency *metrics* (means + stds +
  cross-modal variance), fused by simple/weighted/adaptive voting;
  ``overall < threshold`` means adversarial, with an optional adaptive
  threshold bump.

Everything here consumes similarity values (typically produced by
``tvc.core.similarity`` einsums or the fused Pallas kernel in
``tvc.core.pallas.consistency_kernel``) and returns per-query arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from jax import Array

from tvc.core.similarity import masked_mean, masked_mean_std

# ---------------------------------------------------------------------------
# Primary stack (src/detector.py)
# ---------------------------------------------------------------------------

#: aggregation weights of the primary detector
#: (reference src/detector.py:666-670)
DEFAULT_WEIGHTS: Dict[str, float] = {
    "text_variants": 0.4,
    "sd_reference": 0.4,
    "consistency": 0.2,
}

#: default decision threshold (reference src/detector.py:399, DetectorConfig)
DEFAULT_THRESHOLD: float = 0.5


def text_variant_score(
    orig_sim: Array, variant_sims: Array, variant_mask: Optional[Array] = None
) -> Array:
    """Text-variant detection score in [0, 1].

    ``orig_sim: [B]`` — cos(query image, original text);
    ``variant_sims: [B, V]`` — cos(query image, each text variant);
    ``variant_mask: [B, V]`` — True for real (non-pad) variants.

    Formula (reference src/detector.py:473-485):
      consistency  = 1 - |orig - mean(variant_sims)|
      variability  = 1 - std(variant_sims)
      score        = 1 - (0.7 * consistency + 0.3 * variability)

    Queries with zero variants score 0.0 (reference :456-458).
    """
    mean, std = masked_mean_std(variant_sims, variant_mask, axis=-1)
    consistency = 1.0 - jnp.abs(orig_sim - mean)
    variability = 1.0 - std
    score = 1.0 - (0.7 * consistency + 0.3 * variability)
    if variant_mask is not None:
        has_any = jnp.sum(variant_mask.astype(jnp.int32), axis=-1) > 0
        score = jnp.where(has_any, score, 0.0)
    return score


def reference_score(ref_sims: Array, ref_mask: Optional[Array] = None) -> Array:
    """Reference-image detection score: ``1 - mean(cos(query, refs))``.

    (reference src/detector.py:527-542 — SD-generated or retrieved reference
    images; low similarity to references => likely adversarial.)
    """
    mean = masked_mean(ref_sims, ref_mask, axis=-1)
    score = 1.0 - mean
    if ref_mask is not None:
        has_any = jnp.sum(ref_mask.astype(jnp.int32), axis=-1) > 0
        score = jnp.where(has_any, score, 0.0)
    return score


def global_consistency_score(orig_sim: Array) -> Array:
    """Global image-text consistency score: ``1 - cos(image, text)``
    (reference src/detector.py:573-579)."""
    return 1.0 - orig_sim


def aggregate_scores(
    scores: Array,
    present: Optional[Array] = None,
    method: str = "weighted_mean",
    weights: Optional[Array] = None,
) -> Array:
    """Aggregate per-method scores to a single detection score.

    ``scores: [B, M]`` — one column per detection method;
    ``present: [B, M]`` — which methods ran for each query (pad-and-mask);
    ``weights: [M]`` — per-method weights for ``weighted_mean`` (default
    0.4/0.4/0.2 column order text_variants, sd_reference, consistency —
    reference src/detector.py:655-680).
    """
    if present is None:
        present = jnp.ones_like(scores, dtype=bool)
    if method == "mean":
        return masked_mean(scores, present, axis=-1)
    if method == "max":
        neg = jnp.finfo(scores.dtype).min
        return jnp.max(jnp.where(present, scores, neg), axis=-1)
    if method == "min":
        pos = jnp.finfo(scores.dtype).max
        return jnp.min(jnp.where(present, scores, pos), axis=-1)
    if method == "weighted_mean":
        if weights is None:
            weights = jnp.asarray(
                [
                    DEFAULT_WEIGHTS["text_variants"],
                    DEFAULT_WEIGHTS["sd_reference"],
                    DEFAULT_WEIGHTS["consistency"],
                ],
                dtype=scores.dtype,
            )
        w = weights * present.astype(scores.dtype)
        total = jnp.sum(w, axis=-1)
        num = jnp.sum(scores * w, axis=-1)
        return jnp.where(total > 0, num / jnp.maximum(total, 1e-12), 0.0)
    raise ValueError(f"unknown aggregation method: {method}")


def is_adversarial(aggregated: Array, threshold: float = DEFAULT_THRESHOLD) -> Array:
    """Primary-stack decision: score > threshold => adversarial
    (reference src/detector.py:399)."""
    return aggregated > threshold


def detect(
    orig_sim: Array,
    variant_sims: Array,
    ref_sims: Array,
    variant_mask: Optional[Array] = None,
    ref_mask: Optional[Array] = None,
    method: str = "weighted_mean",
    weights: Optional[Array] = None,
    threshold: float = DEFAULT_THRESHOLD,
) -> Tuple[Array, Array, Array]:
    """Full primary-stack detection, batched.

    Returns ``(flags [B] bool, aggregated [B], per_method [B, 3])`` with
    per-method columns (text_variants, sd_reference, consistency).
    """
    tv = text_variant_score(orig_sim, variant_sims, variant_mask)
    sd = reference_score(ref_sims, ref_mask)
    gc = global_consistency_score(orig_sim)
    per_method = jnp.stack([tv, sd, gc], axis=-1)
    if variant_mask is not None:
        tv_present = jnp.sum(variant_mask.astype(jnp.int32), axis=-1) > 0
    else:
        tv_present = jnp.ones_like(orig_sim, dtype=bool)
    if ref_mask is not None:
        sd_present = jnp.sum(ref_mask.astype(jnp.int32), axis=-1) > 0
    else:
        sd_present = jnp.ones_like(orig_sim, dtype=bool)
    present = jnp.stack(
        [tv_present, sd_present, jnp.ones_like(tv_present)], axis=-1
    )
    agg = aggregate_scores(per_method, present, method=method, weights=weights)
    return is_adversarial(agg, threshold), agg, per_method


# ---------------------------------------------------------------------------
# Alt stack (experiments/defenses) — consistency metrics + voting
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ConsistencyMetrics:
    """Batched consistency statistics (reference
    experiments/defenses/detector.py:228-293). All fields are [B] arrays."""

    original_similarity: Array
    text_variant_consistency: Array
    text_variant_std: Array
    retrieval_consistency: Array
    retrieval_std: Array
    generative_consistency: Array
    generative_std: Array
    cross_modal_variance: Array

    def stacked(self) -> Array:
        """[B, 4] column order: original, text_variant, retrieval, generative."""
        return jnp.stack(
            [
                self.original_similarity,
                self.text_variant_consistency,
                self.retrieval_consistency,
                self.generative_consistency,
            ],
            axis=-1,
        )

    def stds(self) -> Array:
        """[B, 3] column order: text_variant, retrieval, generative."""
        return jnp.stack(
            [self.text_variant_std, self.retrieval_std, self.generative_std],
            axis=-1,
        )


def compute_consistency_metrics(
    orig_sim: Array,
    variant_sims: Array,
    retrieval_sims: Array,
    generative_sims: Array,
    variant_mask: Optional[Array] = None,
    retrieval_mask: Optional[Array] = None,
    generative_mask: Optional[Array] = None,
) -> ConsistencyMetrics:
    """Batched version of the alt stack's score dict.

    Semantics preserved from the reference:
      * no variants  -> variant consistency falls back to ``orig_sim``,
        std 0 (detector.py:253-255);
      * empty retrieval/generative sets -> consistency 0, std 0;
      * cross-modal variance = population variance over the (>0) entries of
        the four consistency values, 0 if fewer than two are positive
        (detector.py:295-300).
    """
    v_mean, v_std = masked_mean_std(variant_sims, variant_mask, axis=-1)
    if variant_mask is not None:
        v_has = jnp.sum(variant_mask.astype(jnp.int32), axis=-1) > 0
        v_mean = jnp.where(v_has, v_mean, orig_sim)
        v_std = jnp.where(v_has, v_std, 0.0)
    r_mean, r_std = masked_mean_std(retrieval_sims, retrieval_mask, axis=-1)
    g_mean, g_std = masked_mean_std(generative_sims, generative_mask, axis=-1)

    sims = jnp.stack([orig_sim, v_mean, r_mean, g_mean], axis=-1)  # [B, 4]
    pos = sims > 0
    n_pos = jnp.sum(pos.astype(sims.dtype), axis=-1)
    mean_pos = jnp.sum(jnp.where(pos, sims, 0.0), axis=-1) / jnp.maximum(n_pos, 1.0)
    var_pos = jnp.sum(
        jnp.where(pos, jnp.square(sims - mean_pos[..., None]), 0.0), axis=-1
    ) / jnp.maximum(n_pos, 1.0)
    cross_modal = jnp.where(n_pos >= 2, var_pos, 0.0)

    return ConsistencyMetrics(
        original_similarity=orig_sim,
        text_variant_consistency=v_mean,
        text_variant_std=v_std,
        retrieval_consistency=r_mean,
        retrieval_std=r_std,
        generative_consistency=g_mean,
        generative_std=g_std,
        cross_modal_variance=cross_modal,
    )


#: alt-stack default fusion weights (consistency_checker.py:61-66)
ALT_DEFAULT_WEIGHTS = (0.25, 0.25, 0.25, 0.25)


def overall_score(
    metrics: ConsistencyMetrics,
    strategy: str = "weighted",
    weights: Optional[Array] = None,
) -> Array:
    """Fuse consistency metrics into one score per query.

    Strategies (reference consistency_checker.py:130-186):
      * ``simple``   — mean of the positive consistency values;
      * ``weighted`` — preset weights over positive values, renormalized;
      * ``adaptive`` — reliability weights 1/(1+std) (original similarity
        weight 1.0), normalized, over positive values (:188-212).
    """
    sims = metrics.stacked()  # [B, 4]
    pos = (sims > 0).astype(sims.dtype)
    if strategy == "simple":
        n = jnp.sum(pos, axis=-1)
        return jnp.where(
            n > 0, jnp.sum(sims * pos, axis=-1) / jnp.maximum(n, 1.0), 0.0
        )
    if strategy == "weighted":
        if weights is None:
            weights = jnp.asarray(ALT_DEFAULT_WEIGHTS, dtype=sims.dtype)
        w = weights * pos
        tw = jnp.sum(w, axis=-1)
        return jnp.where(
            tw > 0, jnp.sum(sims * w, axis=-1) / jnp.maximum(tw, 1e-12), 0.0
        )
    if strategy == "adaptive":
        stds = metrics.stds()  # [B, 3]
        rel = jnp.concatenate(
            [jnp.ones_like(stds[..., :1]), 1.0 / (1.0 + stds)], axis=-1
        )  # [B, 4]
        rel = rel / jnp.maximum(jnp.sum(rel, axis=-1, keepdims=True), 1e-12)
        w = rel * pos
        tw = jnp.sum(w, axis=-1)
        return jnp.where(
            tw > 0, jnp.sum(sims * w, axis=-1) / jnp.maximum(tw, 1e-12), 0.0
        )
    raise ValueError(f"unknown voting strategy: {strategy}")


def adaptive_threshold(
    metrics: ConsistencyMetrics,
    base_threshold: float = 0.5,
    history_mean: Optional[Array] = None,
) -> Array:
    """Adaptive per-query threshold (reference consistency_checker.py:214-242).

    Bumps: +0.1 if cross-modal variance > 0.1; +0.05 if mean of the three
    stds > 0.2; smoothed 0.7/0.3 toward ``history_mean`` (the mean of the
    last 10 thresholds, carried by the caller as running state); clipped to
    [0.1, 0.9].
    """
    thr = jnp.full_like(metrics.original_similarity, base_threshold)
    thr = thr + jnp.where(metrics.cross_modal_variance > 0.1, 0.1, 0.0)
    avg_std = jnp.mean(metrics.stds(), axis=-1)
    thr = thr + jnp.where(avg_std > 0.2, 0.05, 0.0)
    if history_mean is not None:
        thr = 0.7 * thr + 0.3 * history_mean
    return jnp.clip(thr, 0.1, 0.9)


def alt_is_adversarial(overall: Array, threshold: Array) -> Array:
    """Alt-stack decision direction: LOW consistency => adversarial
    (reference consistency_checker.py:93)."""
    return overall < threshold


def decision_confidence(
    overall: Array, threshold: Array, cross_modal_variance: Array
) -> Array:
    """Detection confidence in [0, 1] (consistency_checker.py:246-262 shape:
    distance-to-threshold relative to threshold, damped by cross-modal
    variance)."""
    dist = jnp.abs(overall - threshold) / jnp.maximum(threshold, 1e-12)
    conf = jnp.clip(dist, 0.0, 1.0)
    return conf * (1.0 / (1.0 + cross_modal_variance))
