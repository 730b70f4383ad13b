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
    #: MI-FGSM momentum (Dong et al. 2018) — plain sign ascent oscillates
    #: on the hubness-style objectives (measured mean hijack 0.37 plain vs
    #: 0.90 with momentum on the geometry-regularized fixture); the
    #: evaluation must field the strongest attacker
    use_momentum: bool = True
    momentum: float = 0.9
    #: counter-adaptation against the defender's hub probe
    #: (AdversarialDetector.set_hub_probe): weight of the penalty keeping
    #: the attacker's OWN probe-pool draw's top-m mean similarity under the
    #: threshold. 0 disables (and the probe args are ignored).
    probe_weight: float = 0.0
    probe_top_m: int = 8


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
    straight-through estimators are needed anywhere.

    ``var_feats``/``var_mask`` may carry an EOT axis — [B, M, V, D] /
    [B, M, V]: M independent draws from the defender's variant-sampling
    randomness. The returned aggregate is then [M, B] (one defender
    hypothesis per row); expectation-over-transformation attacks average
    their penalty over M."""
    eot = var_feats.ndim == 4

    def agg(adv_pixels: Array) -> Array:
        img = encode(params, adv_pixels)  # [B, D] L2-normalized
        orig = jnp.sum(img * txt_feats, axis=-1)  # [B]
        rsims = jnp.einsum("bd,brd->br", img, refs)
        if eot:
            B, M, V, _ = var_feats.shape
            vsims = jnp.einsum("bd,bmvd->bmv", img, var_feats)
            # fold the M defender draws into the batch: ONE C.detect call
            _, aggregated, _ = C.detect(
                jnp.tile(orig, M),
                vsims.transpose(1, 0, 2).reshape(M * B, V),
                jnp.tile(rsims, (M, 1)),
                variant_mask=var_mask.transpose(1, 0, 2).reshape(M * B, V),
                ref_mask=jnp.tile(ref_mask, (M, 1)),
                weights=weights,
            )
            return aggregated.reshape(M, B)
        vsims = jnp.einsum("bd,bvd->bv", img, var_feats)
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
    probe: Optional[Array] = None,
    probe_thr: Optional[Array] = None,
):
    """Pure attack program. Returns (adv_pixels, final sims, final agg).

    ``probe`` [P, D] + ``probe_thr``: the attacker's own draw from the
    defender's hub-probe caption distribution (cfg.probe_weight > 0) — the
    counter-adaptive penalty keeps the top-m probe similarity under the
    threshold the way the band penalty keeps the aggregate in the band."""
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
        obj = atk - lam * jnp.mean(band_penalty(agg_of(adv)))
        if cfg.probe_weight > 0.0 and probe is not None:
            top, _ = jax.lax.top_k(img @ probe.T, cfg.probe_top_m)
            probe_score = jnp.mean(top, axis=-1)  # [B]
            obj = obj - cfg.probe_weight * jnp.mean(
                jnp.maximum(probe_score - probe_thr, 0.0)
            )
        return obj

    grad_fn = jax.grad(objective)

    adv0 = pixels
    if cfg.random_init and cfg.num_steps > 1:
        noise = jax.random.uniform(
            key, pixels.shape, minval=-cfg.epsilon, maxval=cfg.epsilon
        )
        adv0 = jnp.clip(pixels + noise, cfg.clip_min, cfg.clip_max)

    if cfg.use_momentum:

        def body(_, state):
            adv, m = state
            g = grad_fn(adv)
            m = cfg.momentum * m + g / (jnp.mean(jnp.abs(g)) + 1e-12)
            adv = linf_project(adv + cfg.alpha * jnp.sign(m), pixels, cfg.epsilon)
            return adv, m

        adv, _ = jax.lax.fori_loop(
            0, cfg.num_steps, body, (adv0, jnp.zeros_like(adv0))
        )
    else:

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
    agg = agg_of(adv)
    if agg.ndim == 2:  # EOT: report the expectation over defender draws
        agg = agg.mean(axis=0)
    return adv, final_sims, final_obj, agg


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
        variant_samples: Optional[Sequence[Sequence[Sequence[str]]]] = None,
        probe_feats: Optional[np.ndarray] = None,
        probe_threshold: Optional[float] = None,
    ) -> AttackResult:
        """``variants``: the per-query variant texts the attacker knows
        (white-box: the defender's augmenter output or a sample from the
        same distribution); ``refs``: [B, R, D] text-retrieved reference
        embeddings; ``query_pool``: hubness-base target captions;
        ``gallery_feats``: [N, D] gallery image embeddings — with these the
        hubness-base success criterion is the real hubness score (fraction
        of queries whose top-1 over gallery ∪ {adv} is adv,
        tvc/attacks/hubness.hubness_score) > 0.5, else mean query sim >
        0.5. ``variant_samples``: M independent draws [M][B][V] from the
        defender's variant-sampling randomness — the attack then averages
        its band penalty over all M (expectation over transformation), so
        it cannot overfit the one sample the defender won't reuse."""
        cfg = self.config
        t0 = time.time()
        pixels = jnp.asarray(prepare_images(self.model, images))
        B = pixels.shape[0]
        txt_feats = jnp.asarray(self.model.encode_text(list(texts)))
        D = txt_feats.shape[-1]

        samples = (
            [list(s) for s in variant_samples]
            if variant_samples is not None
            else [list(variants)]
        )
        M = len(samples)
        V = max(
            (len(v) for s in samples for v in s), default=1
        )
        var_feats = np.zeros((B, M, max(V, 1), D), np.float32)
        var_mask = np.zeros((B, M, max(V, 1)), bool)
        flat = [v for s in samples for vl in s for v in vl]
        if flat:
            emb = np.asarray(self.model.encode_text(flat))
            pos = 0
            for m, s in enumerate(samples):
                for b, vl in enumerate(s):
                    var_feats[b, m, : len(vl)] = emb[pos : pos + len(vl)]
                    var_mask[b, m, : len(vl)] = True
                    pos += len(vl)
        if M == 1:  # single-sample path keeps the original [B, V, D] program
            var_feats, var_mask = var_feats[:, 0], var_mask[:, 0]

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
        probe = (
            l2_normalize(jnp.asarray(probe_feats, jnp.float32))
            if probe_feats is not None
            else None
        )
        pthr = (
            jnp.float32(probe_threshold) if probe_threshold is not None else None
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
            probe,
            pthr,
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


class AdaptiveTextAttacker:
    """Defense-aware text attack (round-4 VERDICT item 5: the adaptive
    evaluation covered image-space bases only).

    TextFooler-style greedy synonym substitution (tvc/attacks/text_attack.py;
    reference src/attacks/text_attack.py:88-500) whose candidate score is

        cos(image, candidate_text)  +  λ · band_dist(aggregated(candidate))

    — the attacker minimizes image-text similarity WHILE keeping the
    white-box TVC aggregate inside the calibrated clean band. The aggregate
    is computed by ``score_fn(image, candidate_texts) -> scores``: the
    attacker's own replica of the full defense (variants of the CANDIDATE
    text, retrieval by the candidate's embedding — everything the defender
    would recompute for the perturbed query; reference scoring under
    attack: src/detector.py:441-590). Candidates per step are scored in
    one batched call."""

    def __init__(
        self,
        model: CLIPModel,
        score_fn,
        config=None,
        penalty_weight: float = 1.0,
        band: tuple = (0.0, 1.0),
    ):
        from tvc.attacks.text_attack import TextAttackConfig

        self.model = model
        self.config = config or TextAttackConfig()
        self.score_fn = score_fn
        self.lam = float(penalty_weight)
        self.band_lower, self.band_upper = float(band[0]), float(band[1])

    def _band_dist(self, s: np.ndarray) -> np.ndarray:
        return np.maximum(s - self.band_upper, self.band_lower - s)

    def attack_single(self, image, text: str):
        from tvc.attacks.text_attack import STOPWORDS, get_synonyms

        cfg = self.config
        img = np.asarray(image)
        image_feat = np.asarray(self.model.encode_image(img[None]))[0]

        def sims(cands):
            return np.asarray(self.model.encode_text(list(cands))) @ image_feat

        def combined(cands):
            s = sims(cands)
            pen = self._band_dist(np.asarray(self.score_fn(img, list(cands))))
            return s + self.lam * np.maximum(pen, 0.0), s

        words = text.split()
        idxs = [
            i
            for i, w in enumerate(words)
            if len(w) >= cfg.min_word_length
            and not (cfg.preserve_stopwords and w.lower() in STOPWORDS)
        ]
        cur_total, cur_sim = combined([text])
        cur_total, cur_sim = float(cur_total[0]), float(cur_sim[0])
        if not idxs:
            return text, {"similarity": cur_sim, "changed": 0}
        orig_text_feat = np.asarray(self.model.encode_text([text]))[0]
        # word importance by deletion drop (batched plain sims — importance
        # ranking needs no defense replica)
        deleted = [" ".join(words[:i] + words[i + 1 :]) for i in idxs]
        importance = cur_sim - sims(deleted)
        order = [idxs[j] for j in np.argsort(-importance)]

        budget = max(1, int(len(words) * cfg.max_perturbation_ratio))
        current, changed = list(words), 0
        for i in order:
            if changed >= budget:
                break
            syns = get_synonyms(words[i].lower(), cfg.num_synonyms)
            if not syns:
                continue
            cands = []
            for s in syns:
                c = list(current)
                c[i] = s
                cands.append(" ".join(c))
            totals, cand_sims = combined(cands)
            text_sims = np.asarray(self.model.encode_text(cands)) @ orig_text_feat
            totals = np.where(text_sims >= cfg.min_text_similarity, totals, np.inf)
            best = int(np.argmin(totals))
            if totals[best] < cur_total:
                current[i] = syns[best]
                cur_total, cur_sim = float(totals[best]), float(cand_sims[best])
                changed += 1
        final = " ".join(current)
        agg = float(np.asarray(self.score_fn(img, [final]))[0])
        return final, {
            "similarity": cur_sim,
            "changed": changed,
            "aggregated": agg,
            "inside_band": bool(self._band_dist(np.asarray([agg]))[0] <= 0),
        }

    def attack(self, images, texts: Sequence[str]):
        from tvc.attacks.text_attack import TextAttackResult

        t0 = time.time()
        adv_texts, sims, changed, inside = [], [], [], []
        for image, text in zip(list(images), texts):
            adv, info = self.attack_single(image, text)
            adv_texts.append(adv)
            sims.append(info["similarity"])
            changed.append(info["changed"])
            inside.append(info.get("inside_band", False))
        sims = np.asarray(sims)
        return TextAttackResult(
            adv_texts=adv_texts,
            original_texts=list(texts),
            success=sims < self.config.success_threshold,
            final_similarity=sims,
            num_words_changed=np.asarray(changed),
            info={
                "elapsed": time.time() - t0,
                "inside_band": np.asarray(inside),
                "penalty_weight": self.lam,
            },
        )


#: default λ sweep for the harness mode — 0 is the oblivious baseline; the
#: grid is densest around the measured knee (λ ∈ [1, 3], round-4 sweep)
DEFAULT_PENALTY_SWEEP = (0.0, 0.3, 1.0, 1.5, 2.0, 3.0, 10.0)


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
    variant_sampler=None,
    eot_samples: int = 4,
    strong_steps: int = 500,
    probe_score_batch=None,
    probe_threshold: Optional[float] = None,
    attacker_probe_feats: Optional[np.ndarray] = None,
    probe_weight: float = 3.0,
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

    After the sweep, a STRONG pass re-attacks at the λ with the best
    evasion rate using ``strong_steps`` PGD steps and — when
    ``variant_sampler`` (a zero-arg callable returning one fresh [B][V]
    variant draw) is given — expectation-over-transformation across
    ``eot_samples`` independent defender variant draws, so the attacker
    cannot overfit a single variant sample (round-4 VERDICT item 5). Its
    result lands in ``out["strong"]``; the defense claim should be read
    off that row, not the 100-step sweep.

    Hub-probe evaluation (AdversarialDetector.set_hub_probe):
    ``probe_score_batch(adv_images) -> scores`` + ``probe_threshold``
    score every row with the probe branch active
    (``detection_rate_with_hub_probe`` / ``evasion_with_hub_probe``).
    ``attacker_probe_feats`` arms a COUNTER-ADAPTIVE strong pass
    (``out["strong_vs_probe"]``): the attacker additionally penalizes its
    own draw from the probe caption distribution at ``probe_weight`` —
    the fully-informed adversary the probe must survive."""
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

    def eval_attack(res) -> Dict[str, Any]:
        adv_scores = np.asarray(score_batch(res.adv_images))
        detected = band_dist(adv_scores) > 0
        auroc = DetectionEvaluator.auroc(
            labels, np.concatenate([band_dist(clean_scores), band_dist(adv_scores)])
        )
        success = res.success
        probe_cols: Dict[str, Any] = {}
        if probe_score_batch is not None and probe_threshold is not None:
            ps = np.asarray(probe_score_batch(res.adv_images))
            det_p = detected | (ps > probe_threshold)
            probe_cols = {
                "mean_hub_probe_score": float(np.mean(ps)),
                "detection_rate_with_hub_probe": float(np.mean(det_p)),
                "evasion_with_hub_probe": float(np.mean(success & ~det_p)),
            }
        return {
            **probe_cols,
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
        out["sweep"][str(lam)] = eval_attack(res)

    if strong_steps and strong_steps > cfg.num_steps:
        # best λ for the attacker = highest evasion, ties broken toward
        # lower band-AUROC (harder for the defense)
        rows = [(k, v) for k, v in out["sweep"].items() if float(k) > 0]
        best_lam = float(
            max(
                rows,
                key=lambda kv: (
                    kv[1]["evasion_success_rate"],
                    -kv[1]["auroc_band"],
                ),
            )[0]
        )
        eot = (
            [variant_sampler() for _ in range(eot_samples)]
            if variant_sampler is not None
            else None
        )
        strong_attacker = AdaptiveAttacker(
            model, dataclasses.replace(cfg, num_steps=int(strong_steps))
        )
        res = strong_attacker.attack(
            images, texts, variants, refs,
            query_pool=query_pool, penalty_weight=best_lam,
            gallery_feats=gallery_feats, variant_samples=eot,
        )
        out["strong"] = {
            "penalty_weight": best_lam,
            "num_steps": int(strong_steps),
            "eot_samples": len(eot) if eot else 1,
            **eval_attack(res),
        }

        if (
            attacker_probe_feats is not None
            and probe_score_batch is not None
            and probe_threshold is not None
        ):
            # counter-adaptive: the attacker ALSO suppresses its own draw
            # from the probe caption distribution
            cfg_vs = dataclasses.replace(
                cfg, num_steps=int(strong_steps), probe_weight=float(probe_weight)
            )
            res = AdaptiveAttacker(model, cfg_vs).attack(
                images, texts, variants, refs,
                query_pool=query_pool, penalty_weight=best_lam,
                gallery_feats=gallery_feats, variant_samples=eot,
                probe_feats=attacker_probe_feats,
                probe_threshold=probe_threshold,
            )
            out["strong_vs_probe"] = {
                "penalty_weight": best_lam,
                "probe_weight": float(probe_weight),
                "num_steps": int(strong_steps),
                "eot_samples": len(eot) if eot else 1,
                **eval_attack(res),
            }
    return out
