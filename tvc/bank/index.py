"""On-TPU exact top-k retrieval over an HBM-sharded embedding bank.

Replaces FAISS (reference src/retrieval.py:477-525 ``_build_faiss_index`` with
flat/IVF/HNSW variants, and experiments/defenses/retrieval_ref.py:126-266)
with an exact, bit-deterministic matmul + ``lax.top_k``:

  * the bank ``[N, D]`` lives in HBM, row-sharded over the mesh's ``data``
    axis; queries are replicated;
  * each device computes ``Q @ bank_shard.T`` on the MXU and a local top-k;
  * global top-k merges the per-shard candidates with one all_gather of
    ``[B, k]`` values/indices (tiny), inside ``shard_map``.

At reference scale (COCO: 118k images / 590k captions, coco.yaml:14) exact
search is both faster than ANN on TPU and exactly reproducible, so the
IVF/HNSW/PQ index types collapse into ``index_type="exact"``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tvc.core.similarity import l2_normalize
from tvc.parallel.mesh import bank_shard_axis, pad_to_multiple


def topk_exact(
    queries: Array, bank: Array, k: int, normalize: bool = True
) -> Tuple[Array, Array]:
    """Single-device exact top-k: ``queries [B, D] x bank [N, D] -> ([B, k], [B, k])``.

    Returns (scores, indices) by descending cosine/IP similarity.
    """
    if normalize:
        queries = l2_normalize(queries)
        bank = l2_normalize(bank)
    sims = jnp.dot(
        queries,
        bank.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, N] on the MXU
    return jax.lax.top_k(sims, k)


def _sharded_topk(
    queries: Array,
    bank_shard: Array,
    valid_shard: Array,
    k: int,
    shard_rows: int,
    axis: str,
) -> Tuple[Array, Array]:
    """Per-device body under shard_map: local matmul top-k + global merge
    over ``axis`` (the bank shard axis, tvc/parallel/mesh.bank_shard_axis)."""
    sims = jnp.dot(
        queries,
        bank_shard.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sims = jnp.where(valid_shard[None, :], sims, -jnp.inf)  # mask pad rows
    local_scores, local_idx = jax.lax.top_k(sims, k)  # [B, k]
    shard_id = jax.lax.axis_index(axis)
    global_idx = local_idx + shard_id * shard_rows

    all_scores = jax.lax.all_gather(local_scores, axis, axis=1)  # [B, S, k]
    all_idx = jax.lax.all_gather(global_idx, axis, axis=1)
    B = all_scores.shape[0]
    flat_scores = all_scores.reshape(B, -1)
    flat_idx = all_idx.reshape(B, -1)
    top_scores, pos = jax.lax.top_k(flat_scores, k)
    top_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
    return top_scores, top_idx


class EmbeddingBank:
    """Sharded, persistent embedding index (FAISS-flat + ReferenceBank roles).

    The bank is padded to a mesh-divisible, lane-aligned row count and placed
    with rows sharded over the mesh. ``search`` runs one jitted shard_map.

    Reference APIs covered: ``MultiModalRetriever.{build_image_index,
    build_text_index,retrieve_*}`` (src/retrieval.py:372-660) and
    ``FAISSIndexBuilder`` (scripts/build_faiss_indices.py:31-120).
    """

    def __init__(
        self,
        dim: int,
        mesh: Optional[Mesh] = None,
        normalize: bool = True,
    ):
        self.dim = dim
        self.mesh = mesh
        self.normalize = normalize
        self._bank: Optional[Array] = None  # [Np, D] padded (device)
        self._n: int = 0  # real row count
        self._search_fn = None

    # -- construction --------------------------------------------------------
    @property
    def size(self) -> int:
        return self._n

    def build(self, embeddings: np.ndarray) -> "EmbeddingBank":
        """Load a [N, D] host array as the bank (replaces index training)."""
        emb = np.asarray(embeddings, dtype=np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}], got {emb.shape}")
        self._n = emb.shape[0]
        axis = bank_shard_axis(self.mesh) if self.mesh is not None else None
        n_shards = self.mesh.shape[axis] if self.mesh is not None else 1
        rows = pad_to_multiple(max(self._n, 1), n_shards * 8)
        padded = np.zeros((rows, self.dim), dtype=np.float32)
        padded[: self._n] = emb
        if self.normalize:
            norms = np.linalg.norm(padded, axis=1, keepdims=True)
            padded = padded / np.maximum(norms, 1e-8)
        if self.mesh is not None:
            sharding = NamedSharding(self.mesh, P(axis, None))
            self._bank = jax.device_put(padded, sharding)
        else:
            self._bank = jnp.asarray(padded)
        self._search_fn = None  # invalidate jit cache (shape may change)
        return self

    # -- search ----------------------------------------------------------------
    def _make_search(self, k: int):
        """Bank and validity mask are jit ARGUMENTS (closing over the device
        array would bake it into the compiled program as a constant)."""
        n_rows = self._bank.shape[0]

        if self.mesh is None:
            @jax.jit
            def search(bank, valid, queries):
                q = l2_normalize(queries) if self.normalize else queries
                sims = jnp.dot(
                    q,
                    bank.T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                sims = jnp.where(valid[None, :], sims, -jnp.inf)
                return jax.lax.top_k(sims, k)

            return search

        mesh = self.mesh
        axis = bank_shard_axis(mesh)
        shard_rows = n_rows // mesh.shape[axis]
        body = functools.partial(
            _sharded_topk, k=k, shard_rows=shard_rows, axis=axis
        )
        mapped = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis)),
            out_specs=(P(), P()),
            # outputs are replicated by construction (identical all_gather +
            # top_k on every device) but the checker can't infer that
            check_vma=False,
        )

        @jax.jit
        def search(bank, valid, queries):
            q = l2_normalize(queries) if self.normalize else queries
            return mapped(q, bank, valid)

        return search

    def search(self, queries: Array, k: int) -> Tuple[Array, Array]:
        """Top-k over the bank: ``queries [B, D] -> (scores [B, k], idx [B, k])``.

        Indices of pad rows never appear (scores -inf) as long as k <= size.
        """
        if self._bank is None:
            raise RuntimeError("bank is empty; call build() first")
        if k > self._n:
            raise ValueError(f"k={k} exceeds bank size {self._n}")
        if self._search_fn is None or self._search_fn[0] != k:
            self._search_fn = (k, self._make_search(k))
        valid = jnp.arange(self._bank.shape[0]) < self._n
        return self._search_fn[1](self._bank, valid, queries.astype(jnp.float32))

    def similarity_matrix(self, queries: Array) -> Array:
        """Full [B, N] similarity matrix (reference
        src/retrieval.py:682 ``compute_similarity_matrix``)."""
        if self._bank is None:
            raise RuntimeError("bank is empty; call build() first")
        q = l2_normalize(queries.astype(jnp.float32)) if self.normalize else queries
        sims = jnp.dot(
                    q,
                    self._bank.T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
        return sims[:, : self._n]

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        """Persist bank rows (replaces faiss.write_index + feature pickles,
        reference src/retrieval.py:764-882)."""
        if self._bank is None:
            raise RuntimeError("bank is empty")
        host = np.asarray(jax.device_get(self._bank))[: self._n]
        np.savez_compressed(path, embeddings=host, dim=self.dim, n=self._n)

    @classmethod
    def load(
        cls, path: str, mesh: Optional[Mesh] = None, normalize: bool = True
    ) -> "EmbeddingBank":
        data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        bank = cls(int(data["dim"]), mesh=mesh, normalize=normalize)
        bank.build(data["embeddings"])
        return bank
