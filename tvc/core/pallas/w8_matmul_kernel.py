"""Weight-only-int8 matmul: bf16 activations x int8 weights, dequantized
in VMEM (per-output-channel scales), f32 MXU accumulation.

Why: Qwen2-7B int8 decode through XLA dequant-then-matmul materializes a
bf16 copy of every weight in HBM each step — ~6 GB of int8 reads become
~30 GB of traffic (int8 read + bf16 write + bf16 read), measured ~20
ms/step at the paraphrase batch where the int8-read roofline is ~8 ms.
This kernel streams weight tiles HBM->VMEM ONCE as int8, converts
in-register, and matmuls against VMEM-resident activation tiles: weight
traffic drops to exactly 1 byte/param.

Tiled over BOTH N and K (K innermost, f32 VMEM scratch accumulator,
output written on the last K step): a single-K-block design holds an
[M, K] activation block plus a dequantized [K, bn] tile in VMEM, which
blows the 16 MB scoped-VMEM limit at Qwen2-7B's down-projection
(K=18944 -> 7.3 MB activations + 9.7 MB weights). With 512x512 tiles
every shape in the 7B decode fits in <2 MB.

Used by the single-device stacked-layer decode path
(tvc/models/qwen.py merged_layer / lm_head) whenever the weight leaf is
int8-quantized; activations stay in the model dtype. Reference stack
equivalent being replaced: bitsandbytes-style CUDA W8 kernels under HF
`model.generate` (the reference serves Qwen2-7B across 6 GPUs in f16).

Inference-only (no VJP). Parity vs the dequant-then-matmul oracle in
tests/test_pallas_quantized.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w8_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref[:])

    x = x_ref[:]  # [M, bk] model dtype
    w = w_ref[:].astype(x.dtype)  # [bk, bn] int8 -> in-register convert
    acc_ref[:] += jax.lax.dot_general(
        x, w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == nk - 1)
    def _flush():
        o_ref[:] = (acc_ref[:] * s_ref[0][None, :]).astype(o_ref.dtype)


def _divisor_blocks(dim: int, cap: int) -> list:
    """Divisors of dim that are multiples of 128 (lane-aligned minor
    tiles), descending, capped. Qwen dims all factor as 128 x odd
    (18944 = 128*148, 3584 = 128*28 ...), so power-of-2 halving alone
    strands the block at 512 and the grid at hundreds of latency-bound
    steps. Falls back to halving for non-128-multiple dims."""
    if dim % 128:
        out, b = [], min(dim, cap)
        while dim % b:
            b //= 2
        return [b]
    out = [d for d in range(128, min(dim, cap) + 1, 128) if dim % d == 0]
    return sorted(out, reverse=True)


def _pick_blocks(M: int, K: int, N: int, budget: int = 11 << 20):
    """Largest (bk, bn) tile pair whose VMEM high water fits the budget:
    x double-buffered + int8 weight tile double-buffered + its in-register
    bf16 dequant + f32 accumulator + output tile. Bigger weight tiles
    (>= ~1 MB) keep the HBM stream bandwidth-bound instead of
    DMA-latency-bound — 512x512 tiles measured 64 ms/step on the Qwen2-7B
    decode where the int8-read roofline is ~8 ms."""
    best = None
    for bk in _divisor_blocks(K, 8192):
        for bn in _divisor_blocks(N, 512):
            vmem = (
                2 * M * bk * 2  # x tiles (bf16, double-buffered)
                + 2 * bk * bn  # int8 weight tiles (double-buffered)
                + bk * bn * 2  # dequantized bf16 copy
                + M * bn * 4  # f32 accumulator scratch
                + M * bn * 2  # output tile
            )
            if vmem <= budget and (best is None or bk * bn > best[0]):
                best = (bk * bn, bk, bn)
    if best is None:  # tiny fallback: smallest legal tiles always fit
        return _divisor_blocks(K, 8192)[-1], _divisor_blocks(N, 512)[-1]
    return best[1], best[2]


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "interpret")
)
def w8_matmul(
    x: Array,
    w_q: Array,
    scale: Array,
    block_n: int = 0,
    block_k: int = 0,
    interpret: Optional[bool] = None,
) -> Array:
    """x [M, K] (bf16/f32) @ (w_q [K, N] int8 * scale [N] f32) -> [M, N].

    Grid (N/bn, K/bk) with K fastest-varying: each output tile accumulates
    in an f32 scratch across its K steps and is written once. Block sizes
    come from the VMEM-budgeted divisor search (_pick_blocks): at the 7B
    decode batch (M=192) the down-projection runs 4736x256 weight tiles
    (1.2 MB DMAs, 56 grid steps) and the square projections stream whole-K
    3584-row tiles.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    N = w_q.shape[1]
    if w_q.shape[0] != K or scale.size != N:
        raise ValueError(
            f"w8_matmul: x [{M}, {K}] needs w_q [K, N] / scale [N], got "
            f"w_q {tuple(w_q.shape)}, scale {tuple(scale.shape)}"
        )
    bk0, bn0 = _pick_blocks(M, K, N)
    bn = block_n or bn0
    bk = block_k or bk0
    nk = K // bk
    s2 = scale.astype(jnp.float32).reshape(1, N)
    return pl.pallas_call(
        functools.partial(_w8_matmul_kernel, nk=nk),
        grid=(pl.cdiv(N, bn), nk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        interpret=interpret,
    )(x, w_q, s2)


def _w8a8_matmul_kernel(x_ref, w_ref, rs_ref, cs_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref[:])

    # int8 x int8 -> int32 natively on the MXU (~1.5-2x the bf16 rate on
    # v5e) — no K*N-sized convert anywhere
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(1) == nk - 1)
    def _flush():
        o_ref[:] = (
            acc_ref[:].astype(jnp.float32) * rs_ref[:] * cs_ref[0][None, :]
        ).astype(o_ref.dtype)


def _pick_blocks_w8a8(M: int, K: int, N: int, budget: int = 11 << 20):
    """Like _pick_blocks but for the all-int8 kernel: x tiles are 1
    byte/elem and there is no dequantized weight copy, so tiles can be
    roughly 2x larger at the same VMEM budget."""
    best = None
    for bk in _divisor_blocks(K, 8192):
        for bn in _divisor_blocks(N, 512):
            vmem = (
                2 * M * bk  # int8 x tiles (double-buffered)
                + 2 * bk * bn  # int8 weight tiles (double-buffered)
                + M * bn * 4  # int32 accumulator scratch
                + M * bn * 2  # output tile
            )
            if vmem <= budget and (best is None or bk * bn > best[0]):
                best = (bk * bn, bk, bn)
    if best is None:
        return _divisor_blocks(K, 8192)[-1], _divisor_blocks(N, 512)[-1]
    return best[1], best[2]


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "interpret")
)
def w8a8_matmul(
    x: Array,
    w_q: Array,
    scale: Array,
    block_n: int = 0,
    block_k: int = 0,
    interpret: Optional[bool] = None,
) -> Array:
    """x [M, K] (bf16/f32) @ (w_q [K, N] int8 * scale [N]) with the
    activations dynamically quantized to symmetric per-row int8 — the
    production Qwen decode GEMM.

    Why not weight-only: the W8 kernel's in-register int8->bf16 weight
    convert runs on the VPU at ~256 elems/cycle — a ~260 GB/s ceiling on
    weight streaming, measured 97-260 GB/s against the chip's 820 GB/s
    HBM (the convert touches all K*N weights). Quantizing the activations
    instead moves every convert to [M, K] + [M, N] tensors (~1/100th the
    elements at decode shapes) and runs the GEMM as the MXU's native
    int8 x int8 -> int32. Same scheme as the CLIP serving path
    (quantized_layer_kernel.py, SmoothQuant/LLM.int8 lineage): weights
    per-output-channel, activations per-row dynamic, f32 dequant of the
    int32 accumulator.

    The row quantization runs in XLA outside the kernel (it needs the
    full-K row max; its traffic is negligible next to the weights).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    N = w_q.shape[1]
    if w_q.shape[0] != K or scale.size != N:
        raise ValueError(
            f"w8a8_matmul: x [{M}, {K}] needs w_q [K, N] / scale [N], got "
            f"w_q {tuple(w_q.shape)}, scale {tuple(scale.shape)}"
        )
    xf = x.astype(jnp.float32)
    rs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / rs), -127, 127).astype(jnp.int8)
    bk0, bn0 = _pick_blocks_w8a8(M, K, N)
    bn = block_n or bn0
    bk = block_k or bk0
    nk = K // bk
    s2 = scale.astype(jnp.float32).reshape(1, N)
    return pl.pallas_call(
        functools.partial(_w8a8_matmul_kernel, nk=nk),
        grid=(pl.cdiv(N, bn), nk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda j, k: (k, j)),
            pl.BlockSpec((M, 1), lambda j, k: (0, 0)),
            pl.BlockSpec((1, bn), lambda j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.int32)],
        interpret=interpret,
    )(xq, w_q, rs, s2)


def _w8a8_stacked_kernel(l_ref, x_ref, w_ref, rs_ref, cs_ref, o_ref, acc_ref, *, nk: int):
    # identical math to _w8a8_matmul_kernel; w/cs blocks carry a leading
    # singleton layer dim selected by the prefetched layer index
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref[:])

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(1) == nk - 1)
    def _flush():
        o_ref[:] = (
            acc_ref[:].astype(jnp.float32) * rs_ref[:] * cs_ref[0][0][None, :]
        ).astype(o_ref.dtype)


def _w8_stacked_kernel(l_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref[:])

    x = x_ref[:]
    w = w_ref[0].astype(x.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x, w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == nk - 1)
    def _flush():
        o_ref[:] = (acc_ref[:] * s_ref[0][0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def w8a8_matmul_stacked(
    x: Array,
    w_q: Array,
    scale: Array,
    layer: Array,
    interpret: Optional[bool] = None,
) -> Array:
    """x [M, K] @ (w_q [L, K, N] int8)[layer] * scale [L, N][layer].

    The layer index rides Pallas scalar prefetch: block index_maps select
    layer ``layer`` of the STACKED weight tree directly, so a
    ``lax.scan`` over transformer layers never materializes a per-layer
    weight slab — the XLA alternative (``dynamic_index_in_dim`` inside
    the scan body) copies every [K, N] int8 slab it touches, measured
    ~17 ms/decode-step across Qwen2-7B's 28 layers (profiler trace,
    B=576) against this kernel's zero-copy block DMAs."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    L, K2, N = w_q.shape
    if K2 != K or scale.shape != (L, N):
        raise ValueError(
            f"w8a8_matmul_stacked: x [{M}, {K}] needs w_q [L, K, N] / "
            f"scale [L, N], got w_q {tuple(w_q.shape)}, scale {tuple(scale.shape)}"
        )
    xf = x.astype(jnp.float32)
    rs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / rs), -127, 127).astype(jnp.int8)
    bk, bn = _pick_blocks_w8a8(M, K, N)
    nk = K // bk
    s3 = scale.astype(jnp.float32).reshape(L, 1, N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(N, bn), nk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, k, l: (0, k)),
            pl.BlockSpec((1, bk, bn), lambda j, k, l: (l[0], k, j)),
            pl.BlockSpec((M, 1), lambda j, k, l: (0, 0)),
            pl.BlockSpec((1, 1, bn), lambda j, k, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k, l: (0, j)),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_w8a8_stacked_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xq, w_q, rs, s3)


@functools.partial(jax.jit, static_argnames=("interpret",))
def w8_matmul_stacked(
    x: Array,
    w_q: Array,
    scale: Array,
    layer: Array,
    interpret: Optional[bool] = None,
) -> Array:
    """Weight-only variant of :func:`w8a8_matmul_stacked` (bf16
    activations, in-register weight dequant) — same zero-copy stacked
    weight selection via scalar prefetch."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    L, K2, N = w_q.shape
    if K2 != K or scale.shape != (L, N):
        raise ValueError(
            f"w8_matmul_stacked: x [{M}, {K}] needs w_q [L, K, N] / "
            f"scale [L, N], got w_q {tuple(w_q.shape)}, scale {tuple(scale.shape)}"
        )
    bk, bn = _pick_blocks(M, K, N)
    nk = K // bk
    s3 = scale.astype(jnp.float32).reshape(L, 1, N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(N, bn), nk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, k, l: (0, k)),
            pl.BlockSpec((1, bk, bn), lambda j, k, l: (l[0], k, j)),
            pl.BlockSpec((1, 1, bn), lambda j, k, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k, l: (0, j)),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_w8_stacked_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, w_q, s3)


def w8_matmul_reference(x: Array, w_q: Array, scale: Array) -> Array:
    """Dequant-then-matmul oracle (the XLA path this kernel replaces)."""
    w = w_q.astype(x.dtype) * scale.astype(x.dtype)
    return (
        jax.lax.dot_general(
            x, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).astype(x.dtype)
