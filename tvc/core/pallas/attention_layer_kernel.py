"""Fully fused ViT attention LAYER kernel (inference hot path).

Round-1 measurement (docs/architecture.md): the ViT-B/32 vision tower at
B=256/T=50 spends 14.8 ms in attention even with the fused-MHA kernel —
the per-head (50x64x50) GEMMs are free, the cost is HBM traffic and
dispatch around them: LN read/write, the QKV projection intermediate, the
[B,T,H,D]->[B*H,T,D] transposes in and out of the MHA kernel, and the
out-projection intermediate.

This kernel computes the ENTIRE pre-LN attention sub-block per grid step:

    out = x + Dense_out( MHA( split_heads( Dense_qkv( LN(x) ) ) ) )

reading x from HBM once and writing the residual output once. The QKV and
output projections are well-shaped MXU GEMMs ([Bb*T, W] x [W, 3W]); the
per-head attention runs entirely in VMEM; weights stay VMEM-resident
across grid steps (constant index_map). Numerics follow the einsum path
(f32 layernorm + softmax, bf16 matmuls) — parity test in
tests/test_pallas_attention.py.

Inference-only (no custom VJP): gradient paths keep einsum attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_layer_kernel(
    x_ref,
    ln_scale_ref,
    ln_bias_ref,
    wqkv_ref,
    bqkv_ref,
    wout_ref,
    bout_ref,
    o_ref,
    *,
    heads: int,
    eps: float,
    causal: bool,
    compute_dtype,
):
    x = x_ref[:]  # [Bb, T, W]
    Bb, T, W = x.shape
    D = W // heads

    # layernorm in f32 (matches flax nn.LayerNorm(dtype=f32))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(jnp.float32)
    h = h.astype(compute_dtype)

    # QKV projection: one [Bb*T, W] x [W, 3W] MXU GEMM
    h2 = h.reshape(Bb * T, W)
    qkv = (
        jnp.dot(h2, wqkv_ref[:].astype(compute_dtype), preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(compute_dtype)
    qkv = qkv.reshape(Bb, T, 3 * W)

    scale = 1.0 / np.sqrt(D)
    outs = []
    for g in range(heads):
        q = qkv[:, :, g * D : (g + 1) * D]
        k = qkv[:, :, W + g * D : W + (g + 1) * D]
        v = qkv[:, :, 2 * W + g * D : 2 * W + (g + 1) * D]
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [Bb, T, T]
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (Bb, T, T), 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (Bb, T, T), 2)
            logits = jnp.where(col <= row, logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
        outs.append(
            jax.lax.dot_general(
                w, v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(compute_dtype)
        )  # [Bb, T, D]
    attn = jnp.concatenate(outs, axis=-1)  # [Bb, T, W]

    # output projection + residual
    out = (
        jnp.dot(
            attn.reshape(Bb * T, W),
            wout_ref[:].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + bout_ref[:].astype(jnp.float32)
    ).reshape(Bb, T, W)
    o_ref[:] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


def _mlp_layer_kernel(
    x_ref, ln_scale_ref, ln_bias_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
    o_ref, *, eps: float, compute_dtype,
):
    x = x_ref[:]  # [Bb, T, W]
    Bb, T, W = x.shape
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(jnp.float32)
    h = h.astype(compute_dtype).reshape(Bb * T, W)
    h = (
        jnp.dot(h, wfc_ref[:].astype(compute_dtype), preferred_element_type=jnp.float32)
        + bfc_ref[:].astype(jnp.float32)
    )
    h = (h * jax.nn.sigmoid(1.702 * h)).astype(compute_dtype)  # quick_gelu
    out = (
        jnp.dot(h, wproj_ref[:].astype(compute_dtype), preferred_element_type=jnp.float32)
        + bproj_ref[:].astype(jnp.float32)
    ).reshape(Bb, T, W)
    o_ref[:] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_b", "interpret"))
def fused_mlp_layer(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    wfc: Array,
    bfc: Array,
    wproj: Array,
    bproj: Array,
    eps: float = 1e-5,
    block_b: int = 4,
    interpret: Optional[bool] = None,
) -> Array:
    """Pre-LN MLP sub-block, fully fused: x + proj(quick_gelu(fc(LN(x)))).

    Removes the LN round-trip and the [B, T, 4W] hidden intermediate from
    HBM (ViT-B/32 at B=256: ~78 MB/layer of hidden traffic). Weights stay
    VMEM-resident across grid steps.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, W = x.shape
    Bb = min(block_b, B)
    while B % Bb != 0:
        Bb //= 2
    grid = (B // Bb,)
    compute_dtype = x.dtype  # f32 inputs compute in f32 (tests), bf16 in bf16
    kernel = functools.partial(
        _mlp_layer_kernel, eps=eps, compute_dtype=compute_dtype
    )
    const = lambda i: (0,)
    const2 = lambda i: (0, 0)
    Wh = wfc.shape[1]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bb, T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Wh), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Wh,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Wh, W), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Bb, T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, W), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * Wh * 2,
            bytes_accessed=2 * 2 * B * T * W + 2 * 2 * W * Wh,
            transcendentals=B * T * Wh,
        ),
    )(x, ln_scale, ln_bias, wfc, bfc, wproj, bproj)


@functools.partial(
    jax.jit, static_argnames=("heads", "eps", "causal", "block_b", "interpret")
)
def fused_attention_layer(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    wqkv: Array,
    bqkv: Array,
    wout: Array,
    bout: Array,
    heads: int,
    eps: float = 1e-5,
    causal: bool = False,
    block_b: int = 8,
    interpret: Optional[bool] = None,
) -> Array:
    """One pre-LN attention sub-block, fully fused.

    x [B, T, W]; wqkv [W, 3W]; wout [W, W]. Returns x + attn(LN(x)).
    T*W blocks must fit VMEM (ViT-B/32: T=50, W=768 — fine).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, W = x.shape
    Bb = min(block_b, B)
    while B % Bb != 0:
        Bb //= 2
    grid = (B // Bb,)
    compute_dtype = x.dtype  # f32 inputs compute in f32 (tests), bf16 in bf16
    kernel = functools.partial(
        _attn_layer_kernel,
        heads=heads,
        eps=eps,
        causal=causal,
        compute_dtype=compute_dtype,
    )
    const = lambda i: (0,)
    const2 = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bb, T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3 * W), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Bb, T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, W), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * (3 * W + W) + 4 * B * T * T * W,
            bytes_accessed=2 * 2 * B * T * W + 2 * (4 * W * W) + 12 * B * T * T,
            transcendentals=B * heads * T * T,
        ),
    )(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout)
