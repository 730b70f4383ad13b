"""FSTA — Feature-Space Targeted Attack.

Behavior parity with reference src/attacks/fsta_attack.py: pushes image
features toward target text-feature centroids with the composite loss
  total = 1.0·feature + 0.1·output + 0.05·diversity        (:45-47)
where feature = −cos(img, target) + cos(img, text) (:254-268),
output = MSE(img_feat, target_feat) (:272-276), diversity = mean off-diag
cosine between batch features (:279-300); momentum-accumulated signed
descent, ε=8/255, 20 iters (:30-32), optional lr decay.

One jitted fori_loop; the batch diversity term is a single [B, B] matmul.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

from tvc.attacks.common import (
    AttackResult,
    AttackStats,
    l2_project,
    linf_project,
    make_encoder,
    prepare_images,
    result_from_device,
)
from tvc.core.similarity import l2_normalize
from tvc.models.clip import CLIPModel


@dataclasses.dataclass(frozen=True)
class FSTAAttackConfig:
    """(reference src/attacks/fsta_attack.py:20-70)"""

    epsilon: float = 8.0 / 255.0
    learning_rate: float = 2.0 / 255.0
    num_iter: int = 20
    feature_weight: float = 1.0
    output_weight: float = 0.1
    diversity_weight: float = 0.05
    momentum: float = 0.9
    norm_type: str = "inf"  # inf | l2
    feature_distance_metric: str = "cosine"  # cosine | euclidean
    adaptive_step_size: bool = False
    decay_factor: float = 0.98
    seed: int = 0


class FSTAAttacker:
    def __init__(self, model: CLIPModel, config: Optional[FSTAAttackConfig] = None):
        self.model = model
        self.config = config or FSTAAttackConfig()
        self.stats = AttackStats()
        self._encode = make_encoder(model)
        self._run = jax.jit(functools.partial(_fsta_run, self._encode, self.config))

    def attack(self, images, texts, target_texts=None) -> AttackResult:
        """target_texts default: per-sample random orthogonal targets
        (reference _generate_random_targets)."""
        t0 = time.time()
        pixels = jnp.asarray(prepare_images(self.model, images))
        text_feats = self.model.encode_text(texts)
        if target_texts is not None:
            target_feats = self.model.encode_text(target_texts)
        else:
            key = jax.random.PRNGKey(self.config.seed)
            rand = jax.random.normal(key, text_feats.shape)
            # orthogonalize against the original text direction
            proj = jnp.sum(rand * text_feats, -1, keepdims=True) * text_feats
            target_feats = l2_normalize(rand - proj)
        adv, sims = self._run(self.model.params, pixels, text_feats, target_feats)
        result = result_from_device(adv, pixels, sims, targeted=False)
        self.stats.update(result, time.time() - t0)
        return result

    batch_attack = attack

    def get_stats(self):
        return self.stats.get_stats()


def _fsta_run(encode, cfg: FSTAAttackConfig, params, pixels: Array, text_feats: Array, target_feats: Array):
    B = pixels.shape[0]

    def loss_fn(adv):
        feats = encode(params, adv)  # already L2-normalized
        if cfg.feature_distance_metric == "cosine":
            feature_loss = (
                -jnp.mean(jnp.sum(feats * target_feats, -1))
                + jnp.mean(jnp.sum(feats * text_feats, -1))
            )
        else:
            feature_loss = (
                jnp.mean(jnp.linalg.norm(feats - target_feats, axis=-1))
                - jnp.mean(jnp.linalg.norm(feats - text_feats, axis=-1))
            )
        output_loss = jnp.mean(jnp.square(feats - target_feats))
        sim_matrix = feats @ feats.T  # [B, B]
        off_diag = sim_matrix - jnp.diag(jnp.diag(sim_matrix))
        diversity_loss = jnp.where(
            B > 1, jnp.sum(off_diag) / jnp.maximum(B * (B - 1), 1), 0.0
        )
        return (
            cfg.feature_weight * feature_loss
            + cfg.output_weight * output_loss
            + cfg.diversity_weight * diversity_loss
        )

    grad_fn = jax.grad(loss_fn)
    project = linf_project if cfg.norm_type == "inf" else l2_project

    def body(i, state):
        adv, mom, lr = state
        g = grad_fn(adv)
        mom = cfg.momentum * mom + g
        adv = adv - lr * jnp.sign(mom)  # descend the loss
        adv = project(adv, pixels, cfg.epsilon)
        lr = jnp.where(cfg.adaptive_step_size, lr * cfg.decay_factor, lr)
        return adv, mom, lr

    adv, _, _ = jax.lax.fori_loop(
        0, cfg.num_iter, body,
        (pixels, jnp.zeros_like(pixels), jnp.asarray(cfg.learning_rate)),
    )
    sims = jnp.sum(encode(params, adv) * text_feats, axis=-1)
    return adv, sims


def create_fsta_attacker(model: CLIPModel, config: Optional[FSTAAttackConfig] = None) -> FSTAAttacker:
    return FSTAAttacker(model, config)


class FSTAAttackPresets:
    """(reference :409+)"""

    @staticmethod
    def fast() -> FSTAAttackConfig:
        return FSTAAttackConfig(num_iter=5)

    @staticmethod
    def standard() -> FSTAAttackConfig:
        return FSTAAttackConfig()

    @staticmethod
    def strong() -> FSTAAttackConfig:
        return FSTAAttackConfig(epsilon=16 / 255, num_iter=50)
