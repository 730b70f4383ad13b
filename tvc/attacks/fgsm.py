"""FGSM: single-step sign-gradient attack on CLIP similarity.

(reference src/attacks/fgsm_attack.py — same wrapper shape as PGD with one
step and no projection loop.)
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
    make_encoder,
    prepare_images,
    result_from_device,
)
from tvc.models.clip import CLIPModel


@dataclasses.dataclass(frozen=True)
class FGSMAttackConfig:
    """(reference src/attacks/fgsm_attack.py:20-58)"""

    epsilon: float = 8.0 / 255.0
    targeted: bool = False
    clip_min: float = 0.0
    clip_max: float = 1.0


class FGSMAttacker:
    def __init__(self, model: CLIPModel, config: Optional[FGSMAttackConfig] = None):
        self.model = model
        self.config = config or FGSMAttackConfig()
        self.stats = AttackStats()
        self._encode = make_encoder(model)
        self._run = jax.jit(functools.partial(_fgsm_run, self._encode, self.config))

    def attack(self, images, texts, target_texts=None) -> AttackResult:
        t0 = time.time()
        pixels = jnp.asarray(prepare_images(self.model, images))
        text_feats = self.model.encode_text(texts)
        target_feats = (
            self.model.encode_text(target_texts)
            if (self.config.targeted and target_texts is not None)
            else text_feats
        )
        adv, sims = self._run(self.model.params, pixels, text_feats, target_feats)
        result = result_from_device(adv, pixels, sims, self.config.targeted)
        self.stats.update(result, time.time() - t0)
        return result

    batch_attack = attack

    def get_stats(self):
        return self.stats.get_stats()


def _fgsm_run(encode, cfg: FGSMAttackConfig, params, pixels: Array, text_feats: Array, target_feats: Array):
    objective_feats = target_feats if cfg.targeted else text_feats
    direction = 1.0 if cfg.targeted else -1.0

    def objective(adv):
        return direction * jnp.mean(jnp.sum(encode(params, adv) * objective_feats, axis=-1))

    g = jax.grad(objective)(pixels)
    adv = jnp.clip(pixels + cfg.epsilon * jnp.sign(g), cfg.clip_min, cfg.clip_max)
    sims = jnp.sum(encode(params, adv) * text_feats, axis=-1)
    return adv, sims


def create_fgsm_attacker(model: CLIPModel, config: Optional[FGSMAttackConfig] = None) -> FGSMAttacker:
    return FGSMAttacker(model, config)


class FGSMAttackPresets:
    """(reference src/attacks/fgsm_attack.py:636+)"""

    @staticmethod
    def weak() -> FGSMAttackConfig:
        return FGSMAttackConfig(epsilon=2 / 255)

    @staticmethod
    def standard() -> FGSMAttackConfig:
        return FGSMAttackConfig()

    @staticmethod
    def strong() -> FGSMAttackConfig:
        return FGSMAttackConfig(epsilon=16 / 255)
