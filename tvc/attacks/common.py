"""Shared attack machinery.

All attacks operate in pixel space ([0, 1], NHWC) against a CLIP encoder.
The whole optimization loop — forward, ``jax.grad``, step, projection —
lives inside one jitted ``lax.fori_loop`` (SURVEY.md §3.4: the reference
runs 500 python-loop iterations with per-sample python inner loops and
host round-trips per step; here one XLA program runs the entire attack).

Deviation from the reference, documented: the reference's untargeted PGD
update *ascends* the similarity gradient while its own comments and success
criterion (sim < 0.3, pgd_attack.py:536-541) require descending it
(pgd_attack.py:262-291). We implement the documented intent: untargeted
attacks MINIMIZE cos(image, original text); targeted attacks MAXIMIZE
cos(image, target text).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from tvc.core.similarity import l2_normalize
from tvc.models.clip import CLIPModel, normalize_pixels

# success thresholds (reference src/attacks/pgd_attack.py:536-541)
UNTARGETED_SUCCESS_SIM = 0.3
TARGETED_SUCCESS_SIM = 0.5


@dataclasses.dataclass
class AttackResult:
    """Host-side result bundle (parity with the reference attack dicts)."""

    adv_images: np.ndarray  # [B, H, W, 3] in [0, 1]
    success: np.ndarray  # [B] bool
    final_similarity: np.ndarray  # [B] cos(adv, text)
    perturbation_linf: np.ndarray  # [B]
    perturbation_l2: np.ndarray  # [B]
    info: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def success_rate(self) -> float:
        return float(np.mean(self.success)) if self.success.size else 0.0


def make_encoder(model: CLIPModel) -> Callable[[Any, Array], Array]:
    """(params, pixels [0,1]) -> L2-normalized embeddings (differentiable).

    Params are threaded as a jit ARGUMENT, never closed over — closing over
    them would bake every weight into the compiled program as constants
    (bloating the HLO past what compilers accept and defeating donation).
    CLIP normalization happens inside so attacks perturb raw pixels
    (matching the reference's pipeline, pgd_attack.py:95-106)."""

    def encode(params, pixels01: Array) -> Array:
        feats = model.image_features(params, normalize_pixels(pixels01))
        return l2_normalize(feats)

    return encode


def linf_project(adv: Array, orig: Array, eps: float) -> Array:
    """Project onto the L∞ ε-ball around orig, then into [0, 1]."""
    delta = jnp.clip(adv - orig, -eps, eps)
    return jnp.clip(orig + delta, 0.0, 1.0)


def l2_project(adv: Array, orig: Array, eps: float) -> Array:
    """Project onto the per-sample L2 ε-ball around orig, then into [0, 1]."""
    delta = adv - orig
    flat = delta.reshape(delta.shape[0], -1)
    norms = jnp.linalg.norm(flat, axis=-1)
    factor = jnp.minimum(1.0, eps / jnp.maximum(norms, 1e-12))
    delta = delta * factor.reshape(-1, *([1] * (delta.ndim - 1)))
    return jnp.clip(orig + delta, 0.0, 1.0)


def perturbation_norms(adv: Array, orig: Array) -> Tuple[Array, Array]:
    delta = (adv - orig).reshape(adv.shape[0], -1)
    return jnp.max(jnp.abs(delta), axis=-1), jnp.linalg.norm(delta, axis=-1)


def check_success(
    sims: Array, targeted: bool, threshold: Optional[float] = None
) -> Array:
    if targeted:
        return sims > (TARGETED_SUCCESS_SIM if threshold is None else threshold)
    return sims < (UNTARGETED_SUCCESS_SIM if threshold is None else threshold)


def prepare_images(model: CLIPModel, images) -> np.ndarray:
    """PIL list / array -> [B, H, W, 3] float32 pixels in [0, 1] (NO CLIP
    normalization — attacks perturb raw pixels)."""
    if isinstance(images, np.ndarray) and images.ndim == 4:
        return images.astype(np.float32)
    if isinstance(images, (list, tuple)):
        return np.stack(
            [
                np.asarray(
                    im.convert("RGB").resize(
                        (model.config.image_size, model.config.image_size)
                    ),
                    dtype=np.float32,
                )
                / 255.0
                if hasattr(im, "convert")
                else np.asarray(im, dtype=np.float32)
                for im in images
            ]
        )
    arr = np.asarray(images, dtype=np.float32)
    if arr.ndim == 3:
        arr = arr[None]
    return arr


def result_from_device(
    adv: Array,
    orig: Array,
    sims: Array,
    targeted: bool,
    info: Optional[Dict[str, Any]] = None,
    success_threshold: Optional[float] = None,
) -> AttackResult:
    linf, l2 = perturbation_norms(adv, orig)
    success = check_success(sims, targeted, success_threshold)
    return AttackResult(
        adv_images=np.asarray(adv),
        success=np.asarray(success),
        final_similarity=np.asarray(sims),
        perturbation_linf=np.asarray(linf),
        perturbation_l2=np.asarray(l2),
        info=info or {},
    )


class AttackStats:
    """Running stats dict (parity with reference ``get_stats``,
    pgd_attack.py:591-627)."""

    def __init__(self):
        self.total_attacks = 0
        self.successful_attacks = 0
        self.total_time = 0.0
        self.sum_linf = 0.0

    def update(self, result: AttackResult, elapsed: float) -> None:
        n = len(result.success)
        self.total_attacks += n
        self.successful_attacks += int(result.success.sum())
        self.total_time += elapsed
        self.sum_linf += float(result.perturbation_linf.sum())

    def get_stats(self) -> Dict[str, float]:
        n = max(self.total_attacks, 1)
        return {
            "total_attacks": self.total_attacks,
            "successful_attacks": self.successful_attacks,
            "success_rate": self.successful_attacks / n,
            "average_attack_time": self.total_time / n,
            "average_perturbation": self.sum_linf / n,
        }
