"""Fused GQA decode attention over the KV cache (one token per sequence).

At the paraphrase decode batch (B=768, 24 layers, S=64, 2 KV heads) XLA
spends ~6.8 ms/step on attention (measured by ablation: full step 11.8
ms/step, attention removed 5.0) where the cache-read roofline is ~0.74 ms:
the 5-D grouped einsums lower to thousands of sub-tile batched-GEMM
instances plus f32 logit round-trips through HBM, and the in-loop
dynamic-update-slice forces an extra cache materialization between the
update and the read. This kernel computes logits -> masked softmax -> AV
for a block of sequences entirely in VMEM: ONE HBM read of the k/v cache
block, one small output write, no intermediates.

Replaces (for the reference stack): per-head torch SDPA decode inside HF
`model.generate` driven by src/text_augment.py:304-380 (paraphrase
generation) — the TPU-native design batches all sequences' single-token
attention into one kernel launch per layer.

Inference-only (no VJP): the decode loop never differentiates. Numerics
mirror the einsum path op-for-op (f32 logits, f32 softmax, bf16 AV with
f32 MXU accumulation) — parity-tested in tests/test_qwen_sd.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl


def _pick_block_b(B: int, S: int, D: int, R: int, itemsize: int, block_b: int) -> int:
    """Largest batch block (multiple of 8, ≤ block_b) whose double-buffered
    q/k/v/out blocks fit the ~16 MB VMEM scoped budget (12 MB target,
    leaving headroom for mask/softmax temporaries). Counts the TPU tile
    padding (last dim → 128 lanes, second-to-last → 8 sublanes): a D=64
    f32 cache block really occupies 2x its logical bytes."""
    d_pad = -(-D // 128) * 128
    s_pad = -(-S // 8) * 8
    r_pad = -(-R // 8) * 8
    budget = 12 * 1024 * 1024
    bb = min(block_b, max(8, -(-B // 8) * 8))
    while bb > 8:
        kv_bytes = bb * s_pad * d_pad * itemsize
        qo_bytes = bb * r_pad * d_pad * itemsize
        total = 2 * (2 * kv_bytes + 2 * qo_bytes) + bb * s_pad * 4
        if total <= budget:
            break
        bb -= 8
    return bb


def _decode_gqa_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # blocks: q [bb, 1, R, D], k/v [bb, 1, S, D], mask [bb, S] (additive f32)
    q = q_ref[:, 0]  # [bb, R, D]
    k = k_ref[:, 0]  # [bb, S, D]
    v = v_ref[:, 0]
    logits = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # [bb, R, S]
    logits = logits + mask_ref[:][:, None, :]
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o = jax.lax.dot_general(
        w,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [bb, R, D]
    o_ref[:, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def decode_gqa_attention(
    q: Array,
    k: Array,
    v: Array,
    mask: Array,
    block_b: int = 128,
    interpret: Optional[bool] = None,
) -> Array:
    """Single-position grouped-query attention over a KV cache.

    q: [B, KV, R, D]   (R = query heads per KV head)
    k, v: [B, KV, S, D] (KV-major cache layout — each (b, kv) slab is a
                         contiguous [S, D] matrix, so one DMA per grid
                         cell reads it exactly once)
    mask: [B, S] additive f32 (0 = attend, -inf = masked slot)
    returns [B, KV, R, D] in q.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, KV, R, D = q.shape
    S = k.shape[2]
    scale = 1.0 / np.sqrt(D)
    bb = _pick_block_b(B, S, D, R, q.dtype.itemsize, block_b)
    grid = (pl.cdiv(B, bb), KV)

    return pl.pallas_call(
        functools.partial(_decode_gqa_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, 1, R, D), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((bb, 1, S, D), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((bb, 1, S, D), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((bb, S), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bb, 1, R, D), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, KV, R, D), q.dtype),
        interpret=interpret,
    )(q, k, v, mask)


def _decode_gqa_stacked_kernel(l_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # same math as _decode_gqa_kernel; k/v blocks carry a leading
    # singleton layer dim selected by the prefetched layer index
    q = q_ref[:, 0]  # [bb, R, D]
    k = k_ref[0][:, 0]  # [bb, S, D]
    v = v_ref[0][:, 0]
    logits = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    logits = logits + mask_ref[:][:, None, :]
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o = jax.lax.dot_general(
        w,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def decode_gqa_attention_stacked(
    q: Array,
    k: Array,
    v: Array,
    mask: Array,
    layer: Array,
    block_b: int = 128,
    interpret: Optional[bool] = None,
) -> Array:
    """:func:`decode_gqa_attention` over the STACKED all-layer cache.

    q: [B, KV, R, D]; k, v: [L, B, KV, S, D] (the whole-model KV cache as
    carried by the decode layer scan); mask: [B, S]; layer: scalar int32.

    The layer index rides Pallas scalar prefetch into the k/v block
    index_maps, so the layer scan reads layer ``layer``'s cache blocks
    straight out of the stacked HBM buffer — the XLA alternative
    (``dynamic_index_in_dim`` + slab write-back per layer) copies the
    full [B, KV, S, D] slab twice per layer per step, ~12 ms/decode-step
    at the Qwen2-7B paraphrase batch (B=576, profiler trace)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, KV, R, D = q.shape
    S = k.shape[3]
    scale = 1.0 / np.sqrt(D)
    bb = _pick_block_b(B, S, D, R, q.dtype.itemsize, block_b)
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(B, bb), KV),
        in_specs=[
            pl.BlockSpec((bb, 1, R, D), lambda i, j, l: (i, j, 0, 0)),
            pl.BlockSpec((1, bb, 1, S, D), lambda i, j, l: (l[0], i, j, 0, 0)),
            pl.BlockSpec((1, bb, 1, S, D), lambda i, j, l: (l[0], i, j, 0, 0)),
            pl.BlockSpec((bb, S), lambda i, j, l: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bb, 1, R, D), lambda i, j, l: (i, j, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_decode_gqa_stacked_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, R, D), q.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), q, k, v, mask)


def decode_gqa_reference(q: Array, k: Array, v: Array, mask: Array) -> Array:
    """jnp oracle with identical layout/semantics (parity tests)."""
    D = q.shape[-1]
    logits = jnp.einsum(
        "bkrd,bksd->bkrs", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(D)
    logits = logits + mask[:, None, None, :]
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bkrs,bksd->bkrd", w, v)
