"""Carlini-Wagner L2 attack with tanh reparameterization + binary search.

Behavior parity with reference src/attacks/cw_attack.py:264-430:
  minimize ||δ||₂ + c · max(0, f(x+δ) − κ)
with f = cos(image, text) untargeted / −cos(image, target) targeted,
w = atanh((2x−1)·0.999999), Adam on w, 9 binary-search steps over c with
per-sample bound updates (success → c halves toward lower bound; failure →
lower bound rises, c ×10 until bounded).

TPU rewrite: the reference's per-sample python binary-search loop
(:318-334) becomes vectorized per-sample bound state inside an outer
``lax.fori_loop``; the inner Adam loop is another ``fori_loop`` — the whole
attack is a single XLA program with static iteration counts.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax import Array

from tvc.attacks.common import (
    AttackResult,
    AttackStats,
    check_success,
    make_encoder,
    prepare_images,
    result_from_device,
)
from tvc.models.clip import CLIPModel


@dataclasses.dataclass(frozen=True)
class CWAttackConfig:
    """(reference src/attacks/cw_attack.py:20-72)"""

    max_iterations: int = 1000
    binary_search_steps: int = 9
    learning_rate: float = 0.01
    initial_const: float = 1e-3
    kappa: float = 0.0
    targeted: bool = False
    loss_type: str = "cosine"  # cosine | mse
    optimizer_type: str = "adam"  # adam | sgd


class CWAttacker:
    def __init__(self, model: CLIPModel, config: Optional[CWAttackConfig] = None):
        self.model = model
        self.config = config or CWAttackConfig()
        self.stats = AttackStats()
        self._encode = make_encoder(model)
        self._run = jax.jit(functools.partial(_cw_run, self._encode, self.config))

    def attack(self, images, texts, target_texts=None) -> AttackResult:
        t0 = time.time()
        pixels = jnp.asarray(prepare_images(self.model, images))
        text_feats = self.model.encode_text(texts)
        target_feats = (
            self.model.encode_text(target_texts)
            if (self.config.targeted and target_texts is not None)
            else text_feats
        )
        adv, sims, best_l2 = self._run(self.model.params, pixels, text_feats, target_feats)
        result = result_from_device(
            adv, pixels, sims, self.config.targeted,
            info={"best_l2": jax.device_get(best_l2)},
        )
        self.stats.update(result, time.time() - t0)
        return result

    batch_attack = attack

    def get_stats(self):
        return self.stats.get_stats()


def _cw_run(encode, cfg: CWAttackConfig, params, pixels: Array, text_feats: Array, target_feats: Array):
    B = pixels.shape[0]
    objective_feats = target_feats if cfg.targeted else text_feats
    w0 = jnp.arctanh((pixels * 2.0 - 1.0) * 0.999999)

    if cfg.optimizer_type == "adam":
        opt = optax.adam(cfg.learning_rate)
    else:
        opt = optax.sgd(cfg.learning_rate)

    def attack_fval(feats):
        """f(x+δ): >0 means attack not yet confident (reference :327-330)."""
        sims = jnp.sum(feats * objective_feats, axis=-1)
        if cfg.loss_type == "cosine":
            per = -sims if cfg.targeted else sims
        else:
            diff = jnp.mean(jnp.square(feats - objective_feats), axis=-1)
            per = diff if cfg.targeted else -diff
        return per

    def total_loss(w, const):
        adv = (jnp.tanh(w) + 1.0) / 2.0
        feats = encode(params, adv)
        fval = jnp.maximum(attack_fval(feats).mean() - cfg.kappa, 0.0)
        l2 = jnp.linalg.norm((adv - pixels).reshape(B, -1), axis=-1)
        return l2.mean() + const.mean() * fval

    grad_fn = jax.grad(total_loss)

    def optimize_for_const(const):
        def body(_, state):
            w, opt_state = state
            g = grad_fn(w, const)
            updates, opt_state = opt.update(g, opt_state, w)
            return optax.apply_updates(w, updates), opt_state

        w, _ = jax.lax.fori_loop(
            0, cfg.max_iterations, body, (w0, opt.init(w0))
        )
        return (jnp.tanh(w) + 1.0) / 2.0

    def binary_step(_, state):
        lower, upper, const, best_l2, best_adv = state
        adv = optimize_for_const(const)
        sims = jnp.sum(encode(params, adv) * text_feats, axis=-1)
        success = check_success(sims, cfg.targeted)
        l2 = jnp.linalg.norm((adv - pixels).reshape(B, -1), axis=-1)
        improved = success & (l2 < best_l2)
        best_l2 = jnp.where(improved, l2, best_l2)
        best_adv = jnp.where(improved.reshape(-1, 1, 1, 1), adv, best_adv)
        # per-sample bound updates (reference :325-334)
        upper = jnp.where(success, const, upper)
        lower = jnp.where(success, lower, const)
        const = jnp.where(upper < 1e9, (lower + upper) / 2.0, lower * 10.0)
        return lower, upper, const, best_l2, best_adv

    lower = jnp.zeros(B)
    upper = jnp.full(B, 1e10)
    const = jnp.full(B, cfg.initial_const)
    best_l2 = jnp.full(B, 1e10)
    state = jax.lax.fori_loop(
        0, cfg.binary_search_steps, binary_step,
        (lower, upper, const, best_l2, pixels),
    )
    _, _, _, best_l2, best_adv = state
    final_sims = jnp.sum(encode(params, best_adv) * text_feats, axis=-1)
    return best_adv, final_sims, best_l2


def create_cw_attacker(model: CLIPModel, config: Optional[CWAttackConfig] = None) -> CWAttacker:
    return CWAttacker(model, config)


class CWAttackPresets:
    """(reference :836+)"""

    @staticmethod
    def fast() -> CWAttackConfig:
        return CWAttackConfig(max_iterations=100, binary_search_steps=3)

    @staticmethod
    def standard() -> CWAttackConfig:
        return CWAttackConfig()

    @staticmethod
    def high_confidence() -> CWAttackConfig:
        return CWAttackConfig(kappa=0.2)
