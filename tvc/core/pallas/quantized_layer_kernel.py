"""Int8 (W8A8, dynamic per-token activations) fused transformer layer
kernels — the quantized serving path.

Why: the v5e MXU executes int8 x int8 -> int32 at ~1.5x the bf16 rate
(measured on this chip: 183 TOP/s vs 122 TF/s at 8192^3; 114 vs 94 at the
ViT-B/32 MLP shape). The defended step is GEMM-dominated (vision tower
19.1 ms of a 35.8 ms step, docs/architecture.md), so quantizing the four
projection GEMMs per layer (QKV, attn-out, MLP fc, MLP proj) buys real
throughput with no HBM round-trips added: quantize/dequantize live inside
the same VMEM-resident kernel as the bf16 versions in
``attention_layer_kernel.py``.

Scheme (standard W8A8 dynamic, e.g. LLM.int8/SmoothQuant lineage):
  * weights: symmetric per-output-channel int8, prepared ONCE from the
    bf16/f32 params (``quantize_linear``) — scales [N] f32;
  * activations: symmetric per-token int8 computed in-kernel right after
    the (f32) layernorm — scales [rows, 1] f32;
  * GEMM int8 x int8 -> int32 on the MXU, dequantized as
    acc * row_scale * col_scale + bias in f32.
Numerically-sensitive ops (layernorm, softmax, residual add) stay f32,
matching the bf16 kernels; the per-head attention GEMMs stay bf16 (tiny
FLOPs, int8 would hurt logit fidelity).

Inference-only (no custom VJP): gradients keep the einsum path, exactly
like the bf16 fused kernels. Reference equivalent: none — the reference
serves f16/f32 via PyTorch (its AMP is training-side only,
src/attacks/pgd_attack.py:449); this is TPU-native headroom.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "quantize_linear",
    "fused_attention_layer_i8",
    "fused_mlp_layer_i8",
]


def quantize_linear(w: Array) -> Tuple[Array, Array]:
    """Symmetric per-output-channel int8 quantization of a [K, N] weight.

    Returns (w_q int8 [K, N], scale f32 [N]) with w ~= w_q * scale."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def _quant_rows(h: Array) -> Tuple[Array, Array]:
    """Dynamic symmetric per-row int8: h [M, K] f32 -> (int8, scale [M,1])."""
    rs = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-12) / 127.0
    return jnp.clip(jnp.round(h / rs), -127, 127).astype(jnp.int8), rs


def _layernorm_rows(x: Array, scale_ref, bias_ref, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    return h * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)


def _attn_layer_i8_kernel(
    x_ref,
    ln_scale_ref,
    ln_bias_ref,
    wqkv_ref,   # int8 [W, 3W]
    sqkv_ref,   # f32 [3W]
    bqkv_ref,   # f32 [3W]
    wout_ref,   # int8 [W, W]
    sout_ref,   # f32 [W]
    bout_ref,   # f32 [W]
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

    h = _layernorm_rows(x, ln_scale_ref, ln_bias_ref, eps).reshape(Bb * T, W)
    hq, hs = _quant_rows(h)
    acc = jnp.dot(hq, wqkv_ref[:], preferred_element_type=jnp.int32)
    qkv = (
        acc.astype(jnp.float32) * hs * sqkv_ref[:] + bqkv_ref[:]
    ).astype(compute_dtype).reshape(Bb, T, 3 * W)

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
            )
        )  # [Bb, T, D] f32
    attn = jnp.concatenate(outs, axis=-1).reshape(Bb * T, W)  # f32

    aq, as_ = _quant_rows(attn)
    acc2 = jnp.dot(aq, wout_ref[:], preferred_element_type=jnp.int32)
    out = (
        acc2.astype(jnp.float32) * as_ * sout_ref[:] + bout_ref[:]
    ).reshape(Bb, T, W)
    o_ref[:] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


def _mlp_layer_i8_kernel(
    x_ref,
    ln_scale_ref,
    ln_bias_ref,
    wfc_ref,    # int8 [W, Wh]
    sfc_ref,    # f32 [Wh]
    bfc_ref,    # f32 [Wh]
    wproj_ref,  # int8 [Wh, W]
    sproj_ref,  # f32 [W]
    bproj_ref,  # f32 [W]
    o_ref,
    *,
    eps: float,
):
    x = x_ref[:]  # [Bb, T, W]
    Bb, T, W = x.shape
    h = _layernorm_rows(x, ln_scale_ref, ln_bias_ref, eps).reshape(Bb * T, W)
    hq, hs = _quant_rows(h)
    acc = jnp.dot(hq, wfc_ref[:], preferred_element_type=jnp.int32)
    hf = acc.astype(jnp.float32) * hs * sfc_ref[:] + bfc_ref[:]
    g = hf * jax.nn.sigmoid(1.702 * hf)  # quick_gelu, f32
    gq, gs = _quant_rows(g)
    acc2 = jnp.dot(gq, wproj_ref[:], preferred_element_type=jnp.int32)
    out = (
        acc2.astype(jnp.float32) * gs * sproj_ref[:] + bproj_ref[:]
    ).reshape(Bb, T, W)
    o_ref[:] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


def _pick_block(B: int, block_b: int) -> int:
    Bb = min(block_b, B)
    while B % Bb != 0:
        Bb //= 2
    return max(Bb, 1)


@functools.partial(
    jax.jit, static_argnames=("heads", "eps", "causal", "block_b", "interpret")
)
def fused_attention_layer_i8(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    wqkv_q: Array,
    sqkv: Array,
    bqkv: Array,
    wout_q: Array,
    sout: Array,
    bout: Array,
    heads: int,
    eps: float = 1e-5,
    causal: bool = False,
    block_b: int = 8,
    interpret: Optional[bool] = None,
) -> Array:
    """Pre-LN attention sub-block with int8 QKV / out-proj GEMMs.

    Same contract as ``fused_attention_layer`` but takes pre-quantized
    weights from ``quantize_linear``: x + out(MHA(qkv(LN(x))))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, W = x.shape
    Bb = _pick_block(B, block_b)
    compute_dtype = x.dtype  # f32 inputs compute in f32 (tests), bf16 in bf16
    kernel = functools.partial(
        _attn_layer_i8_kernel,
        heads=heads,
        eps=eps,
        causal=causal,
        compute_dtype=compute_dtype,
    )
    const = lambda i: (0,)
    const2 = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3 * W), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Bb, T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, W), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * (3 * W + W) + 4 * B * T * T * W,
            bytes_accessed=2 * 2 * B * T * W + 4 * W * W + 12 * B * T * T,
            transcendentals=B * heads * T * T,
        ),
    )(x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wout_q, sout, bout)


@functools.partial(jax.jit, static_argnames=("eps", "block_b", "interpret"))
def fused_mlp_layer_i8(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    wfc_q: Array,
    sfc: Array,
    bfc: Array,
    wproj_q: Array,
    sproj: Array,
    bproj: Array,
    eps: float = 1e-5,
    block_b: int = 8,
    interpret: Optional[bool] = None,
) -> Array:
    """Pre-LN MLP sub-block with int8 fc / proj GEMMs:
    x + proj(quick_gelu(fc(LN(x)))). Weights from ``quantize_linear``.

    int8 weights halve the VMEM-resident footprint vs bf16, so the default
    batch block is 8 (vs 4 for the bf16 kernel)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, W = x.shape
    Bb = _pick_block(B, block_b)
    Wh = wfc_q.shape[1]
    kernel = functools.partial(_mlp_layer_i8_kernel, eps=eps)
    const = lambda i: (0,)
    const2 = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Wh), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Wh,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Wh,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Wh, W), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Bb, T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, W), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * Wh * 2,
            bytes_accessed=2 * 2 * B * T * W + 2 * W * Wh,
            transcendentals=B * T * Wh,
        ),
    )(x, ln_scale, ln_bias, wfc_q, sfc, bfc, wproj_q, sproj, bproj)
