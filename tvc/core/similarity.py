"""Batched cosine-similarity statistics (pure JAX, jit-friendly).

Replaces the reference's per-sample python loops over GPU similarity calls
(reference: src/detector.py:466-471, src/utils/metrics.py:109-276
``SimilarityCalculator``) with masked [B, V]-shaped einsums.

All functions are shape-polymorphic pure functions over jnp arrays and are
safe under jit/vmap/shard_map. Variable-length variant/reference sets are
expressed as padded arrays plus boolean masks (SURVEY.md §7 "pad-and-mask").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

EPS = 1e-8


def l2_normalize(x: Array, axis: int = -1, eps: float = EPS) -> Array:
    """L2-normalize along ``axis`` (stable for zero vectors)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def cosine_similarity(a: Array, b: Array, axis: int = -1) -> Array:
    """Cosine similarity along ``axis`` with broadcasting.

    ``a: [..., D], b: [..., D] -> [...]``.
    """
    a = l2_normalize(a, axis=axis)
    b = l2_normalize(b, axis=axis)
    return jnp.sum(a * b, axis=axis)


def pairwise_cosine(a: Array, b: Array) -> Array:
    """All-pairs cosine: ``a: [M, D], b: [N, D] -> [M, N]`` (one MXU matmul)."""
    a = l2_normalize(a)
    b = l2_normalize(b)
    return jnp.dot(
        a,
        b.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def batched_set_cosine(query: Array, refs: Array) -> Array:
    """Per-query similarity to a per-query reference set.

    ``query: [B, D], refs: [B, R, D] -> [B, R]``.
    """
    q = l2_normalize(query)
    r = l2_normalize(refs)
    return jnp.einsum(
        "bd,brd->br",
        q,
        r,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def masked_mean(x: Array, mask: Optional[Array], axis: int = -1) -> Array:
    """Mean over ``axis`` counting only ``mask``-true entries.

    Empty sets yield 0 (matching the reference's "no variants -> score 0.0"
    convention, src/detector.py:456-458).
    """
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = mask.astype(x.dtype)
    count = jnp.sum(m, axis=axis)
    total = jnp.sum(x * m, axis=axis)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def masked_std(x: Array, mask: Optional[Array], axis: int = -1) -> Array:
    """Population std over masked entries (numpy ``.std()`` semantics, ddof=0,
    matching reference src/detector.py:474-475)."""
    if mask is None:
        return jnp.std(x, axis=axis)
    m = mask.astype(x.dtype)
    count = jnp.sum(m, axis=axis)
    mean = masked_mean(x, mask, axis=axis)
    sq = jnp.sum(jnp.square(x - jnp.expand_dims(mean, axis)) * m, axis=axis)
    var = jnp.where(count > 0, sq / jnp.maximum(count, 1.0), 0.0)
    return jnp.sqrt(jnp.maximum(var, 0.0))


def masked_mean_std(
    x: Array, mask: Optional[Array], axis: int = -1
) -> Tuple[Array, Array]:
    """Fused masked mean + population std (one pass over the data)."""
    if mask is None:
        return jnp.mean(x, axis=axis), jnp.std(x, axis=axis)
    m = mask.astype(x.dtype)
    count = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    nonempty = jnp.sum(m, axis=axis) > 0
    mean = jnp.sum(x * m, axis=axis) / count
    ex2 = jnp.sum(jnp.square(x) * m, axis=axis) / count
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    mean = jnp.where(nonempty, mean, 0.0)
    # double-where sqrt: d(sqrt)/dx at 0 is inf, and a plain where does NOT
    # block the NaN from the untaken branch under jax.grad (the adaptive
    # attacker differentiates THROUGH this std). Values are unchanged; the
    # var==0 subgradient is 0.
    pos = var > 0
    std = jnp.where(pos & nonempty, jnp.sqrt(jnp.where(pos, var, 1.0)), 0.0)
    return mean, std


def masked_max(x: Array, mask: Optional[Array], axis: int = -1) -> Array:
    if mask is None:
        return jnp.max(x, axis=axis)
    neg = jnp.finfo(x.dtype).min
    return jnp.max(jnp.where(mask, x, neg), axis=axis)
