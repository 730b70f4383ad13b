"""Adaptive (defense-aware) attacks: the evaluation the reference never ran.

The reference evaluates TVC only against oblivious attackers — PGD/hubness
optimize a retrieval objective with no knowledge of the defense (reference
src/attacks/pgd_attack.py, hubness_attack.py; detection of those attacks:
src/detector.py:441-590). A white-box adaptive attacker instead *knows the
whole detector* — the text variants, the retrieval references (fetched by
the TEXT embedding, hence constant w.r.t. the image: tvc/parallel/steps.py
``make_serving_step``), the aggregation weights, and the calibrated clean
band — and optimizes

    attack_objective(adv)  -  λ · band_penalty(aggregated_score(adv))

where ``aggregated_score`` is the differentiable TVC aggregate
(tvc/core/consistency.detect — pure JAX, ``jax.grad`` flows through it) and
``band_penalty`` is the hinge distance outside the calibrated clean band
[lower, upper]. λ = 0 reproduces the standard oblivious attack; sweeping λ
traces the attacker's evasion/effectiveness frontier. This is the only
evaluation that stresses TVC itself (round-3 VERDICT item 2).

Everything — forward, grad, sign step, ε-ball projection, the consistency
math — runs inside ONE jitted ``lax.fori_loop``; the per-λ sweep reuses the
same compiled program (λ is a traced operand).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from tvc.attacks.common import (
    AttackResult,
    AttackStats,
    linf_project,
    make_encoder,
    prepare_images,
)
from tvc.core import consistency as C
from tvc.core.similarity import l2_normalize
from tvc.models.clip import CLIPModel


@dataclasses.dataclass(frozen=True)
class AdaptiveAttackConfig:
    """Defense-aware attack parameters.

    ``base`` selects the attack objective the evasion penalty is traded
    against: ``pgd`` minimizes cos(image, paired text) (reference
    src/attacks/pgd_attack.py semantics), ``hubness`` maximizes the mean
    cos to a per-sample query set (reference src/attacks/hubness_attack.py
    :671-674). ``band_lower``/``band_upper`` are the calibrated clean-band
    thresholds the attacker wants the aggregated score to stay inside
    (AdversarialDetector.calibrate_two_sided)."""

    base: str = "pgd"  # pgd | hubness
    epsilon: float = 8.0 / 255.0
    alpha: float = 1.0 / 255.0
    num_steps: int = 100
    penalty_weight: float = 1.0  # λ — traced, sweeps don't recompile
    band_lower: float = 0.0
    band_upper: float = 1.0
    weights: tuple = (0.4, 0.4, 0.2)  # detector aggregation weights (known)
    random_init: bool = True
    clip_min: float = 0.0
    clip_max: float = 1.0
    seed: int = 0


def aggregated_score_fn(
    encode,
    params,
    txt_feats: Array,
    var_feats: Array,
    var_mask: Array,
    refs: Array,
    ref_mask: Array,
    weights: Array,
):
    """Differentiable TVC aggregate as a function of raw pixels.

    Reproduces exactly what the serving step computes per query
    (tvc/parallel/steps.make_serving_step: orig/variant/reference cosine
    sims -> tvc/core/consistency.detect): the attacker's gradient flows
    through the same math the defender scores with. ``refs`` are the
    text-retrieved bank rows — constant w.r.t. the image, so no
    straight-through estimators are needed anywhere."""

    def agg(adv_pixels: Array) -> Array:
        img = encode(params, adv_pixels)  # [B, D] L2-normalized
        orig = jnp.sum(img * txt_feats, axis=-1)  # [B]
        vsims = jnp.einsum("bd,bvd->bv", img, var_feats)
        rsims = jnp.einsum("bd,brd->br", img, refs)
        _, aggregated, _ = C.detect(
            orig,
            vsims,
            rsims,
            variant_mask=var_mask,
            ref_mask=ref_mask,
            weights=weights,
        )
        return aggregated

    return agg


def _adaptive_run(
    encode,
    cfg: AdaptiveAttackConfig,
    params,
    pixels: Array,
    txt_feats: Array,
    var_feats: Array,
    var_mask: Array,
    refs: Array,
    ref_mask: Array,
    queries: Array,
    lam: Array,
    key: Array,
):
    """Pure attack program. Returns (adv_pixels, final sims, final agg)."""
    weights = jnp.asarray(cfg.weights, jnp.float32)
    agg_of = aggregated_score_fn(
        encode, params, txt_feats, var_feats, var_mask, refs, ref_mask, weights
    )

    def band_penalty(agg: Array) -> Array:
        # hinge distance outside the calibrated clean band: zero inside,
        # grows linearly outside — its gradient pulls the aggregate back
        # toward the band from either side (the two-sided detector flags
        # both sides, detector.calibrate_two_sided)
        return jnp.maximum(agg - cfg.band_upper, 0.0) + jnp.maximum(
            cfg.band_lower - agg, 0.0
        )

    def objective(adv: Array) -> Array:
        img = encode(params, adv)
        if cfg.base == "hubness":
            atk = jnp.mean(jnp.einsum("bd,bqd->bq", img, queries))  # maximize
        else:
            atk = -jnp.mean(jnp.sum(img * txt_feats, axis=-1))  # minimize sim
        return atk - lam * jnp.mean(band_penalty(agg_of(adv)))

    grad_fn = jax.grad(objective)

    adv0 = pixels
    if cfg.random_init and cfg.num_steps > 1:
        noise = jax.random.uniform(
            key, pixels.shape, minval=-cfg.epsilon, maxval=cfg.epsilon
        )
        adv0 = jnp.clip(pixels + noise, cfg.clip_min, cfg.clip_max)

    def body(_, adv):
        adv = adv + cfg.alpha * jnp.sign(grad_fn(adv))  # ascend
        return linf_project(adv, pixels, cfg.epsilon)

    adv = jax.lax.fori_loop(0, cfg.num_steps, body, adv0)
    img = encode(params, adv)
    final_sims = jnp.sum(img * txt_feats, axis=-1)
    # per-sample base-objective value: mean query sim (hubness) — the
    # success criterion for the hub; paired-text sim otherwise
    if cfg.base == "hubness":
        final_obj = jnp.einsum("bd,bqd->bq", img, queries).mean(axis=-1)
    else:
        final_obj = final_sims
    return adv, final_sims, final_obj, agg_of(adv)


class AdaptiveAttacker:
    """Compiles the defense-aware attack once per (model, config shape);
    the penalty weight λ is a runtime operand, so a sweep is free."""

    def __init__(self, model: CLIPModel, config: Optional[AdaptiveAttackConfig] = None):
        self.model = model
        self.config = config or AdaptiveAttackConfig()
        self.stats = AttackStats()
        self._encode = make_encoder(model)
        self._run = jax.jit(functools.partial(_adaptive_run, self._encode, self.config))

    def attack(
        self,
        images,
        texts: Sequence[str],
        variants: Sequence[Sequence[str]],
        refs: np.ndarray,
        query_pool: Optional[Sequence[str]] = None,
        penalty_weight: Optional[float] = None,
        gallery_feats: Optional[np.ndarray] = None,
    ) -> AttackResult:
        """``variants``: the per-query variant texts the attacker knows
        (white-box: the defender's augmenter output or a sample from the
        same distribution); ``refs``: [B, R, D] text-retrieved reference
        embeddings; ``query_pool``: hubness-base target captions;
        ``gallery_feats``: [N, D] gallery image embeddings — with these the
        hubness-base success criterion is the real hubness score (fraction
        of queries whose top-1 over gallery ∪ {adv} is adv,
        tvc/attacks/hubness.hubness_score) > 0.5, else mean query sim >
        0.5."""
        cfg = self.config
        t0 = time.time()
        pixels = jnp.asarray(prepare_images(self.model, images))
        B = pixels.shape[0]
        txt_feats = jnp.asarray(self.model.encode_text(list(texts)))
        D = txt_feats.shape[-1]

        V = max(len(v) for v in variants) if variants else 1
        var_feats = np.zeros((B, max(V, 1), D), np.float32)
        var_mask = np.zeros((B, max(V, 1)), bool)
        flat = [v for vl in variants for v in vl]
        if flat:
            emb = np.asarray(self.model.encode_text(flat))
            pos = 0
            for b, vl in enumerate(variants):
                var_feats[b, : len(vl)] = emb[pos : pos + len(vl)]
                var_mask[b, : len(vl)] = True
                pos += len(vl)

        refs = np.asarray(refs, np.float32)
        ref_mask = np.any(refs != 0, axis=-1)

        if cfg.base == "hubness":
            if query_pool is None:
                raise ValueError("hubness base requires query_pool")
            pool = self.model.encode_text(list(query_pool))
            M = pool.shape[0]
            Q = min(100, M)
            idx = jax.vmap(
                lambda k: jax.random.choice(k, M, shape=(Q,), replace=False)
            )(jax.random.split(jax.random.PRNGKey(cfg.seed), B))
            queries = l2_normalize(pool[idx])
        else:
            queries = jnp.zeros((B, 1, D), jnp.float32)

        lam = jnp.float32(
            cfg.penalty_weight if penalty_weight is None else penalty_weight
        )
        adv, sims, obj, agg = self._run(
            self.model.params,
            pixels,
            txt_feats,
            jnp.asarray(var_feats),
            jnp.asarray(var_mask),
            jnp.asarray(refs),
            jnp.asarray(ref_mask),
            queries,
            lam,
            jax.random.PRNGKey(cfg.seed),
        )
        delta = np.asarray(adv) - np.asarray(pixels)
        inside = (np.asarray(agg) >= cfg.band_lower) & (
            np.asarray(agg) <= cfg.band_upper
        )
        hub_scores = None
        if cfg.base == "hubness":
            if gallery_feats is not None:
                from tvc.attacks.hubness import hubness_score

                adv_feats = self.model.encode_image(np.asarray(adv))
                hub_scores = np.asarray(
                    hubness_score(adv_feats, queries, jnp.asarray(gallery_feats))
                )
            success = (
                hub_scores > 0.5 if hub_scores is not None else np.asarray(obj) > 0.5
            )
        else:
            # paired-text sim broken below the reference bar (common.py
            # UNTARGETED_SUCCESS_SIM)
            success = np.asarray(obj) < 0.3
        result = AttackResult(
            adv_images=np.asarray(adv),
            success=success,
            final_similarity=np.asarray(sims),
            perturbation_linf=np.abs(delta).reshape(B, -1).max(-1),
            perturbation_l2=np.linalg.norm(delta.reshape(B, -1), axis=-1),
            info={
                "final_aggregated": np.asarray(agg),
                "final_objective": np.asarray(obj),
                "inside_band": inside,
                "penalty_weight": float(lam),
                "hubness_scores": hub_scores,
            },
        )
        self.stats.update(result, time.time() - t0)
        return result

    batch_attack = attack

    def get_stats(self):
        return self.stats.get_stats()


def create_adaptive_attacker(
    model: CLIPModel, config: Optional[AdaptiveAttackConfig] = None
) -> AdaptiveAttacker:
    return AdaptiveAttacker(model, config)


#: default λ sweep for the harness mode — 0 is the oblivious baseline
DEFAULT_PENALTY_SWEEP = (0.0, 0.3, 1.0, 3.0, 10.0)


def run_adaptive_evaluation(
    model: CLIPModel,
    detector,
    images,
    texts: Sequence[str],
    variants: Sequence[Sequence[str]],
    refs: np.ndarray,
    clean_scores: np.ndarray,
    base: str = "pgd",
    query_pool: Optional[Sequence[str]] = None,
    sweep: Sequence[float] = DEFAULT_PENALTY_SWEEP,
    attack_config: Optional[AdaptiveAttackConfig] = None,
    score_batch=None,
    gallery_feats: Optional[np.ndarray] = None,
) -> Dict[str, Any]:
    """Full adaptive-attack evaluation against a calibrated detector.

    Calibrates the clean band from ``clean_scores`` quantiles (the shipped
    two-sided protocol, AdversarialDetector.calibrate_two_sided), then for
    each λ in ``sweep`` runs the defense-aware attack and reports:

    * ``attack_success_rate`` — the base objective still succeeds
      (pgd: cos < 0.3; hubness: mean query sim > 0.5);
    * ``detection_rate`` — fraction flagged outside the calibrated band by
      the PRODUCTION scoring path (``score_batch(adv_images) -> scores``,
      defaults to ``detector.detect_batch`` — fresh defender variants, so
      the defender does NOT reuse the attacker's variant sample);
    * ``auroc_band`` — AUROC of the band-distance anomaly score
      (max(s-hi, lo-s)), the shipped decision statistic;
    * ``evasion_success_rate`` — attack succeeded AND not detected: the
      number that actually matters against an adaptive adversary.
    """
    from tvc.metrics import DetectionEvaluator

    lo = float(np.quantile(clean_scores, 0.005))
    hi = float(np.quantile(clean_scores, 0.995))
    cfg = attack_config or AdaptiveAttackConfig()
    cfg = dataclasses.replace(cfg, base=base, band_lower=lo, band_upper=hi)
    attacker = AdaptiveAttacker(model, cfg)

    if score_batch is None:
        score_batch = lambda adv: detector.detect_batch(adv, list(texts)).aggregated_score

    def band_dist(s):
        return np.maximum(s - hi, lo - s)

    n = len(texts)
    labels = np.concatenate([np.zeros(n), np.ones(n)])
    out: Dict[str, Any] = {
        "band": [lo, hi],
        "base": base,
        "epsilon": cfg.epsilon,
        "num_steps": cfg.num_steps,
        "sweep": {},
    }
    for lam in sweep:
        res = attacker.attack(
            images, texts, variants, refs,
            query_pool=query_pool, penalty_weight=lam,
            gallery_feats=gallery_feats,
        )
        adv_scores = np.asarray(score_batch(res.adv_images))
        detected = band_dist(adv_scores) > 0
        auroc = DetectionEvaluator.auroc(
            labels, np.concatenate([band_dist(clean_scores), band_dist(adv_scores)])
        )
        success = res.success
        out["sweep"][str(lam)] = {
            "attack_success_rate": float(np.mean(success)),
            "detection_rate": float(np.mean(detected)),
            "auroc_band": float(auroc),
            "evasion_success_rate": float(np.mean(success & ~detected)),
            "mean_final_similarity": float(np.mean(res.final_similarity)),
            "mean_aggregated": float(np.mean(adv_scores)),
            "inside_band_rate_selfscored": float(
                np.mean(res.info["inside_band"])
            ),
            **(
                {"mean_hubness_score": float(np.mean(res.info["hubness_scores"]))}
                if res.info.get("hubness_scores") is not None
                else {}
            ),
        }
    return out
