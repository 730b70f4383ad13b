"""SMA — Semantic Misalignment Attack.

Behavior parity with reference src/attacks/sma_attack.py: drives image
features toward a mismatched semantic target while keeping visual quality:
  total = 2.0·semantic + 0.5·perceptual + 0.1·diversity      (:36-38)
semantic = −cos(img, target) + cos(img, text) − shift·(cos_target −
cos_text) (:320-341); perceptual = MSE(adv, orig) (:344-352); diversity as
in FSTA (:355-373). Targets come from orthogonal / random / adversarial
(−text) strategies (:375-411). Optional JPEG-robustness: the reference
"simulates" JPEG with quality-scaled noise (:413-420); we implement a real
differentiable approximation — blockwise DCT quantization with
straight-through rounding — which is both stronger and honest about what it
tests. ε=8/255, 15 iters, momentum signed descent.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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
class SMAAttackConfig:
    """(reference src/attacks/sma_attack.py:21-84)"""

    epsilon: float = 8.0 / 255.0
    learning_rate: float = 2.0 / 255.0
    num_iter: int = 15
    semantic_weight: float = 2.0
    perceptual_weight: float = 0.5
    diversity_weight: float = 0.1
    semantic_shift_strength: float = 0.5
    target_selection: str = "semantic"  # semantic | random | adversarial
    momentum: float = 0.9
    norm_type: str = "inf"
    jpeg_robust: bool = False
    jpeg_quality: int = 75
    seed: int = 0


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)
    mat = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    mat[0] *= 1.0 / np.sqrt(2.0)
    return mat.astype(np.float32)


def jpeg_approx(images: Array, quality: int) -> Array:
    """Differentiable JPEG approximation: 8x8 blockwise DCT, uniform
    quantization with straight-through rounding, inverse DCT. Luma-style
    single quant scale (no chroma subsampling) — a strict upgrade on the
    reference's additive-noise simulation (sma_attack.py:413-420)."""
    D = jnp.asarray(_dct_matrix(8))
    B, H, W, C = images.shape
    pad_h = (-H) % 8
    pad_w = (-W) % 8
    x = jnp.pad(images, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    Hp, Wp = H + pad_h, W + pad_w
    x = x * 255.0 - 128.0
    x = x.reshape(B, Hp // 8, 8, Wp // 8, 8, C).transpose(0, 1, 3, 5, 2, 4)
    coeffs = jnp.einsum("ij,...jk,lk->...il", D, x, D)
    scale = jnp.maximum((100.0 - quality) / 50.0, 0.02) * 16.0
    q = coeffs / scale
    # straight-through round: forward rounds, gradient passes through
    q = q + jax.lax.stop_gradient(jnp.round(q) - q)
    coeffs = q * scale
    x = jnp.einsum("ji,...jk,kl->...il", D, coeffs, D)
    x = x.transpose(0, 1, 4, 2, 5, 3).reshape(B, Hp, Wp, C)
    return jnp.clip((x[:, :H, :W] + 128.0) / 255.0, 0.0, 1.0)


class SMAAttacker:
    def __init__(self, model: CLIPModel, config: Optional[SMAAttackConfig] = None):
        self.model = model
        self.config = config or SMAAttackConfig()
        self.stats = AttackStats()
        self._encode = make_encoder(model)
        self._run = jax.jit(functools.partial(_sma_run, self._encode, self.config))

    def _make_targets(self, text_feats: Array) -> Array:
        """(reference :375-411)"""
        cfg = self.config
        key = jax.random.PRNGKey(cfg.seed)
        if cfg.target_selection == "adversarial":
            return -l2_normalize(text_feats)
        rand = jax.random.normal(key, text_feats.shape)
        if cfg.target_selection == "random":
            return l2_normalize(rand)
        # "semantic": orthogonalize against the text direction (Gram-Schmidt)
        t = l2_normalize(text_feats)
        proj = jnp.sum(rand * t, -1, keepdims=True) * t
        return l2_normalize(rand - proj)

    def attack(self, images, texts, target_texts=None) -> AttackResult:
        t0 = time.time()
        pixels = jnp.asarray(prepare_images(self.model, images))
        text_feats = self.model.encode_text(texts)
        target_feats = (
            self.model.encode_text(target_texts)
            if target_texts is not None
            else self._make_targets(text_feats)
        )
        adv, sims = self._run(self.model.params, pixels, text_feats, target_feats)
        result = result_from_device(adv, pixels, sims, targeted=False)
        self.stats.update(result, time.time() - t0)
        return result

    batch_attack = attack

    def get_stats(self):
        return self.stats.get_stats()


def _sma_run(encode, cfg: SMAAttackConfig, params, pixels: Array, text_feats: Array, target_feats: Array):
    B = pixels.shape[0]
    tgt = l2_normalize(target_feats)
    txt = l2_normalize(text_feats)

    def loss_fn(adv):
        x = jpeg_approx(adv, cfg.jpeg_quality) if cfg.jpeg_robust else adv
        feats = encode(params, x)
        cos_t = jnp.sum(feats * tgt, -1)
        cos_x = jnp.sum(feats * txt, -1)
        semantic = (
            -cos_t.mean()
            + cos_x.mean()
            - cfg.semantic_shift_strength * (cos_t - cos_x).mean()
        )
        perceptual = jnp.mean(jnp.square(adv - pixels))
        sim_matrix = feats @ feats.T
        off_diag = sim_matrix - jnp.diag(jnp.diag(sim_matrix))
        diversity = jnp.where(
            B > 1, jnp.sum(off_diag) / jnp.maximum(B * (B - 1), 1), 0.0
        )
        return (
            cfg.semantic_weight * semantic
            + cfg.perceptual_weight * perceptual
            + cfg.diversity_weight * diversity
        )

    grad_fn = jax.grad(loss_fn)
    project = linf_project if cfg.norm_type == "inf" else l2_project

    def body(_, state):
        adv, mom = state
        g = grad_fn(adv)
        mom = cfg.momentum * mom + g
        adv = adv - cfg.learning_rate * jnp.sign(mom)
        return project(adv, pixels, cfg.epsilon), mom

    adv, _ = jax.lax.fori_loop(0, cfg.num_iter, body, (pixels, jnp.zeros_like(pixels)))
    sims = jnp.sum(encode(params, adv) * txt, axis=-1)
    return adv, sims


def create_sma_attacker(model: CLIPModel, config: Optional[SMAAttackConfig] = None) -> SMAAttacker:
    return SMAAttacker(model, config)


class SMAAttackPresets:
    """(reference :794+)"""

    @staticmethod
    def fast() -> SMAAttackConfig:
        return SMAAttackConfig(num_iter=5)

    @staticmethod
    def standard() -> SMAAttackConfig:
        return SMAAttackConfig()

    @staticmethod
    def jpeg_robust() -> SMAAttackConfig:
        return SMAAttackConfig(jpeg_robust=True, num_iter=30)
