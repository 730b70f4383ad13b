"""Fused TVC consistency-scoring Pallas kernel.

One kernel pass computes, per query, everything the reference detector
computes across four python loops and ~10 GPU round-trips
(reference src/detector.py:441-680):

  given  img [B, D], txt [B, D], variants [B, V, D] (+mask), refs [B, R, D]
  (+mask):
    orig      = cos(img, txt)
    var_sims  = cos(img, variants)       -> mean, std (masked, ddof=0)
    ref_sims  = cos(img, refs)           -> mean      (masked)
    tv        = 1 - (0.7*(1-|orig-mean|) + 0.3*(1-std))
    sd        = 1 - ref_mean
    cons      = 1 - orig
    agg       = weighted_mean(tv, sd, cons)
    flag      = agg > threshold

Embeddings are read from HBM exactly once; all similarity math runs on the
VPU over VMEM tiles; no intermediate [B, V]/[B, R] arrays hit HBM.

The public entry point ``fused_consistency_scores`` pads to TPU tile shapes,
dispatches the kernel (interpret mode off-TPU so the same code path runs in
CPU tests), and returns a dict of [B] arrays. ``consistency_scores_reference``
is the pure-jnp oracle used for parity tests.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvc.core import consistency as C
from tvc.core import similarity as S

# output column layout of the kernel ([B, NSTATS])
ROW_TV, ROW_SD, ROW_CONS, ROW_AGG, ROW_FLAG, ROW_ORIG, ROW_VMEAN, ROW_VSTD = range(8)
NSTATS = 8

_EPS = 1e-8


def _norm(x: Array) -> Array:
    inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), _EPS * _EPS))
    return x * inv


def _consistency_kernel(
    params_ref,  # SMEM [4]: w_tv, w_sd, w_cons, threshold (traced, so
    #            calibration updates do NOT recompile the kernel)
    img_ref,
    txt_ref,
    var_ref,
    vmask_ref,
    ref_ref,
    rmask_ref,
    out_ref,
):
    w_tv = params_ref[0]
    w_sd = params_ref[1]
    w_cons = params_ref[2]
    threshold = params_ref[3]
    img = _norm(img_ref[:].astype(jnp.float32))  # [TB, D]
    txt = _norm(txt_ref[:].astype(jnp.float32))  # [TB, D]
    var = _norm(var_ref[:].astype(jnp.float32))  # [TB, V, D]
    ref = _norm(ref_ref[:].astype(jnp.float32))  # [TB, R, D]
    vmask = vmask_ref[:].astype(jnp.float32)  # [TB, V]
    rmask = rmask_ref[:].astype(jnp.float32)  # [TB, R]

    orig = jnp.sum(img * txt, axis=-1)  # [TB]

    # variant sims + masked mean/std (population, matching numpy .std())
    vsims = jnp.sum(var * img[:, None, :], axis=-1) * vmask  # [TB, V]
    vcount = jnp.sum(vmask, axis=-1)
    vsafe = jnp.maximum(vcount, 1.0)
    vmean = jnp.sum(vsims, axis=-1) / vsafe
    vex2 = jnp.sum(vsims * vsims, axis=-1) / vsafe
    vvar = jnp.maximum(vex2 - vmean * vmean, 0.0)
    vstd = jnp.sqrt(vvar)
    v_has = vcount > 0.0

    # reference sims + masked mean
    rsims = jnp.sum(ref * img[:, None, :], axis=-1) * rmask  # [TB, R]
    rcount = jnp.sum(rmask, axis=-1)
    rmean = jnp.sum(rsims, axis=-1) / jnp.maximum(rcount, 1.0)
    r_has = rcount > 0.0

    # detector formulas (reference src/detector.py:479-485, :542, :579)
    tv = 1.0 - (0.7 * (1.0 - jnp.abs(orig - vmean)) + 0.3 * (1.0 - vstd))
    tv = jnp.where(v_has, tv, 0.0)
    sd = jnp.where(r_has, 1.0 - rmean, 0.0)
    cons = 1.0 - orig

    # weighted-mean aggregation over the methods that ran (:655-680)
    wt = w_tv * v_has.astype(jnp.float32)
    ws = w_sd * r_has.astype(jnp.float32)
    total_w = wt + ws + w_cons
    agg = (tv * wt + sd * ws + cons * w_cons) / jnp.maximum(total_w, 1e-12)
    flag = (agg > threshold).astype(jnp.float32)

    out_ref[:] = jnp.stack(
        [
            tv,
            sd,
            cons,
            agg,
            flag,
            orig,
            jnp.where(v_has, vmean, 0.0),
            jnp.where(v_has, vstd, 0.0),
        ],
        axis=-1,
    )


def _check_embed_shapes(img: Array, txt: Array, variants: Array, refs: Array) -> None:
    if img.ndim != 2:
        raise ValueError(f"img must be [B, D], got {img.shape}")
    B, D = img.shape
    if txt.shape != (B, D):
        raise ValueError(f"txt shape {txt.shape} must match img shape {(B, D)}")
    if variants.ndim != 3 or variants.shape[0] != B or variants.shape[2] != D:
        raise ValueError(
            f"variants must be [B={B}, V, D={D}], got {variants.shape}"
        )
    if refs.ndim != 3 or refs.shape[0] != B or refs.shape[2] != D:
        raise ValueError(f"refs must be [B={B}, R, D={D}], got {refs.shape}")


def _pad_axis(x: Array, axis: int, multiple: int, value: float = 0.0) -> Array:
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("block_b", "interpret"),
)
def fused_consistency_scores(
    img: Array,
    txt: Array,
    variants: Array,
    refs: Array,
    variant_mask: Optional[Array] = None,
    ref_mask: Optional[Array] = None,
    weights: Tuple[float, float, float] = (0.4, 0.4, 0.2),
    threshold: float = C.DEFAULT_THRESHOLD,
    block_b: int = 128,
    interpret: Optional[bool] = None,
) -> Dict[str, Array]:
    """Fused consistency scoring for a batch of queries.

    Args:
      img:       [B, D] query image embeddings.
      txt:       [B, D] original-text embeddings.
      variants:  [B, V, D] text-variant embeddings (zero-padded).
      refs:      [B, R, D] reference-image embeddings (zero-padded).
      variant_mask / ref_mask: [B, V] / [B, R] bool; default all-true.
      weights:   (text_variants, sd_reference, consistency) aggregation
                 weights; threshold: decision threshold.

    Returns dict with [B] float32 arrays: ``tv_score``, ``sd_score``,
    ``consistency_score``, ``aggregated``, ``is_adversarial`` (bool),
    ``orig_similarity``, ``variant_mean``, ``variant_std``.
    """
    _check_embed_shapes(img, txt, variants, refs)
    B, D = img.shape
    V = variants.shape[1]
    R = refs.shape[1]
    if variant_mask is None:
        variant_mask = jnp.ones((B, V), dtype=bool)
    if ref_mask is None:
        ref_mask = jnp.ones((B, R), dtype=bool)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # pad to TPU tiles: B -> block_b, V/R -> sublane 8, D assumed 128-aligned
    imgp = _pad_axis(img.astype(jnp.float32), 0, block_b)
    txtp = _pad_axis(txt.astype(jnp.float32), 0, block_b)
    varp = _pad_axis(_pad_axis(variants.astype(jnp.float32), 1, 8), 0, block_b)
    refp = _pad_axis(_pad_axis(refs.astype(jnp.float32), 1, 8), 0, block_b)
    vmp = _pad_axis(
        _pad_axis(variant_mask.astype(jnp.float32), 1, 8), 0, block_b
    )
    rmp = _pad_axis(_pad_axis(ref_mask.astype(jnp.float32), 1, 8), 0, block_b)
    Bp, Vp, Rp = imgp.shape[0], varp.shape[1], refp.shape[1]

    grid = (Bp // block_b,)
    params = jnp.concatenate(
        [
            jnp.asarray(weights, jnp.float32).reshape(3),
            jnp.asarray(threshold, jnp.float32).reshape(1),
        ]
    )
    out = pl.pallas_call(
        _consistency_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Vp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Vp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Rp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Rp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, NSTATS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, NSTATS), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * D * (Vp + Rp + 1),
            bytes_accessed=4 * Bp * D * (Vp + Rp + 2) + 4 * NSTATS * Bp,
            transcendentals=0,
        ),
    )(params, imgp, txtp, varp, vmp, refp, rmp)

    out = out[:B, :]
    return {
        "tv_score": out[:, ROW_TV],
        "sd_score": out[:, ROW_SD],
        "consistency_score": out[:, ROW_CONS],
        "aggregated": out[:, ROW_AGG],
        "is_adversarial": out[:, ROW_FLAG] > 0.5,
        "orig_similarity": out[:, ROW_ORIG],
        "variant_mean": out[:, ROW_VMEAN],
        "variant_std": out[:, ROW_VSTD],
    }


def consistency_scores_reference(
    img: Array,
    txt: Array,
    variants: Array,
    refs: Array,
    variant_mask: Optional[Array] = None,
    ref_mask: Optional[Array] = None,
    weights: Tuple[float, float, float] = (0.4, 0.4, 0.2),
    threshold: float = C.DEFAULT_THRESHOLD,
) -> Dict[str, Array]:
    """Pure-jnp oracle with identical outputs (used in parity tests)."""
    _check_embed_shapes(img, txt, variants, refs)
    orig = S.cosine_similarity(img, txt)
    vsims = S.batched_set_cosine(img, variants)
    rsims = S.batched_set_cosine(img, refs)
    w = jnp.asarray(weights, dtype=jnp.float32)
    flags, agg, per_method = C.detect(
        orig,
        vsims,
        rsims,
        variant_mask=variant_mask,
        ref_mask=ref_mask,
        method="weighted_mean",
        weights=w,
        threshold=threshold,
    )
    vmean, vstd = S.masked_mean_std(vsims, variant_mask, axis=-1)
    if variant_mask is not None:
        has = jnp.sum(variant_mask.astype(jnp.int32), axis=-1) > 0
        vmean = jnp.where(has, vmean, 0.0)
        vstd = jnp.where(has, vstd, 0.0)
    return {
        "tv_score": per_method[:, 0],
        "sd_score": per_method[:, 1],
        "consistency_score": per_method[:, 2],
        "aggregated": agg,
        "is_adversarial": flags,
        "orig_similarity": orig,
        "variant_mean": vmean,
        "variant_std": vstd,
    }
