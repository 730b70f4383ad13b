"""Fused matmul + running top-k Pallas kernel for bank retrieval.

The jnp path (tvc/bank/index.py) materializes the full [B, N] similarity
matrix in HBM before ``lax.top_k`` — at serving scale (B=256, N=600k
captions) that is 600 MB of HBM traffic per batch. This kernel streams the
bank through VMEM in N-tiles, computes each [B, tile] score block on the
MXU, and folds it into a running top-k held in VMEM scratch — the [B, N]
matrix never exists.

Exact (not approximate): per tile, k rounds of argmax+mask merge the tile
into the running candidates.

``bank_topk`` is the public entry; parity-tested against numpy argsort
(tests/test_pallas_topk.py) in interpret mode and verified bit-identical
against lax.top_k compiled on TPU v5e.

Measured on v5e-1 (B=256, N=131072, D=512, k=10, f32): fused kernel
10.9 ms vs XLA matmul+lax.top_k 2.5 ms — at this scale the [B, N]
intermediate adds only ~15% HBM traffic over the mandatory bank read while
the in-kernel argmax merge serializes on the VPU, so the jnp path
(tvc/bank/index.py) remains the DEFAULT. This kernel is the right shape
when the intermediate would not fit (N in the tens of millions) or for
bf16 banks where the matmul tiles can be fused with on-the-fly dequant;
kept as an exact, tested alternative.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvc.core.similarity import l2_normalize

NEG = -jnp.inf


def _topk_kernel(
    q_ref,  # [B, D] queries (VMEM, whole)
    bank_ref,  # [TN, D] bank tile (VMEM)
    valid_ref,  # [1, TN] validity of tile rows (f32)
    out_vals_ref,  # [B, K]
    out_idx_ref,  # [B, K] (i32)
    vals_scratch,  # [B, K] f32
    idx_scratch,  # [B, K] i32
    *,
    k: int,
    block_n: int,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        vals_scratch[:] = jnp.full_like(vals_scratch, NEG)
        idx_scratch[:] = jnp.zeros_like(idx_scratch)

    q = q_ref[:]  # [B, D]
    bank = bank_ref[:]  # [TN, D]
    scores = jax.lax.dot_general(
        q,
        bank,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TN]
    valid = valid_ref[0, :] > 0.5
    scores = jnp.where(valid[None, :], scores, NEG)
    B = scores.shape[0]
    tile_idx = jax.lax.broadcasted_iota(jnp.int32, (B, block_n), 1) + t * block_n

    # merge tile into running top-k: combined [B, K + TN]
    combined = jnp.concatenate([vals_scratch[:], scores], axis=1)
    combined_idx = jnp.concatenate([idx_scratch[:], tile_idx], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, combined.shape, 1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)
    new_vals = jnp.zeros((B, k), jnp.float32)
    new_idx = jnp.zeros((B, k), jnp.int32)
    for j in range(k):  # static unroll: no scatter/gather in Mosaic
        m = jnp.max(combined, axis=1)  # [B]
        am = jnp.argmax(combined, axis=1)  # [B]
        onehot = cols == am[:, None]  # exactly one column per row
        picked_idx = jnp.sum(jnp.where(onehot, combined_idx, 0), axis=1)
        write = out_cols == j  # static column select
        new_vals = jnp.where(write, m[:, None], new_vals)
        new_idx = jnp.where(write, picked_idx[:, None], new_idx)
        combined = jnp.where(onehot, NEG, combined)
    vals_scratch[:] = new_vals
    idx_scratch[:] = new_idx

    @pl.when(t == pl.num_programs(0) - 1)
    def _emit():
        out_vals_ref[:] = vals_scratch[:]
        out_idx_ref[:] = idx_scratch[:]


@functools.partial(
    jax.jit, static_argnames=("k", "block_n", "normalize", "interpret")
)
def bank_topk(
    queries: Array,
    bank: Array,
    k: int,
    n_valid: Optional[Array] = None,
    block_n: int = 2048,
    normalize: bool = True,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Exact top-k over a bank without materializing [B, N] in HBM.

    queries [B, D]; bank [N, D] (N padded to block_n internally);
    n_valid: scalar count of real bank rows (default all).
    Returns (scores [B, k], indices [B, k]) by descending similarity.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, D = queries.shape
    N = bank.shape[0]
    q = l2_normalize(queries.astype(jnp.float32)) if normalize else queries
    bk = l2_normalize(bank.astype(jnp.float32)) if normalize else bank
    Np = -(-N // block_n) * block_n
    if Np != N:
        bk = jnp.pad(bk, ((0, Np - N), (0, 0)))
    nv = jnp.asarray(N if n_valid is None else n_valid, jnp.int32)
    valid = (jnp.arange(Np, dtype=jnp.int32) < nv).astype(jnp.float32)[None, :]

    grid = (Np // block_n,)
    kernel = functools.partial(_topk_kernel, k=k, block_n=block_n)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, k), jnp.float32),
            pltpu.VMEM((B, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * Np,
            bytes_accessed=4 * (B * D + Np * D + 2 * B * k),
            transcendentals=0,
        ),
    )(q, bk, valid)
    return vals, idx
