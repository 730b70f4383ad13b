"""Dual-encoder retrieval API over sharded embedding banks.

Covers reference src/retrieval.py (``MultiModalRetriever``: build_image_index
:372, build_text_index :434, retrieve_images_by_text :527,
retrieve_texts_by_image :578, compute_similarity_matrix :682, save/load
:764-882) and experiments/defenses/retrieval_ref.py
(``RetrievalReferenceGenerator``). FAISS is replaced by
``tvc.bank.EmbeddingBank`` (exact matmul top-k under shard_map).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from tvc.bank.index import EmbeddingBank
from tvc.models.clip import CLIPModel


@dataclasses.dataclass
class RetrievalConfig:
    """(reference src/retrieval.py:290-315 + IndexConfig :25-40)"""

    top_k: int = 10
    batch_size: int = 256
    index_type: str = "exact"  # flat/ivf/hnsw/pq all collapse to exact on TPU
    normalize: bool = True
    cache_enabled: bool = True

    def __post_init__(self):
        if self.top_k < 1:
            raise ValueError("top_k must be >= 1")


@dataclasses.dataclass
class RetrievalResult:
    """(reference src/retrieval.py:42-60)"""

    indices: np.ndarray  # [B, k]
    scores: np.ndarray  # [B, k]
    items: List[List[Any]]  # retrieved metadata (paths / captions)
    query_time: float


class MultiModalRetriever:
    """Text->image and image->text retrieval against CLIP embedding banks."""

    def __init__(
        self,
        model: CLIPModel,
        config: Optional[RetrievalConfig] = None,
        mesh: Optional[Mesh] = None,
    ):
        self.model = model
        self.config = config or RetrievalConfig()
        self.mesh = mesh
        self.image_bank: Optional[EmbeddingBank] = None
        self.text_bank: Optional[EmbeddingBank] = None
        self.image_items: List[Any] = []  # paths / PIL refs / metadata
        self.text_items: List[str] = []
        self._cache: Dict[str, RetrievalResult] = {}
        self.stats = {"queries": 0, "cache_hits": 0, "total_query_time": 0.0}

    # -- index construction -------------------------------------------------
    def build_image_index(
        self,
        images: Optional[Sequence] = None,
        embeddings: Optional[np.ndarray] = None,
        items: Optional[Sequence[Any]] = None,
    ) -> None:
        """From raw images (encoded in batches) or precomputed embeddings
        (reference :372-433)."""
        if embeddings is None:
            if images is None:
                raise ValueError("need images or embeddings")
            embeddings = self._encode_images_batched(images)
        self.image_bank = EmbeddingBank(
            dim=embeddings.shape[1], mesh=self.mesh, normalize=self.config.normalize
        ).build(np.asarray(embeddings))
        self.image_items = list(items) if items is not None else list(range(len(embeddings)))
        self._cache.clear()

    def build_text_index(
        self,
        texts: Optional[Sequence[str]] = None,
        embeddings: Optional[np.ndarray] = None,
    ) -> None:
        """(reference :434-476)"""
        if embeddings is None:
            if texts is None:
                raise ValueError("need texts or embeddings")
            embeddings = self._encode_texts_batched(texts)
            self.text_items = list(texts)
        self.text_bank = EmbeddingBank(
            dim=np.asarray(embeddings).shape[1],
            mesh=self.mesh,
            normalize=self.config.normalize,
        ).build(np.asarray(embeddings))
        if texts is not None:
            self.text_items = list(texts)
        elif not self.text_items:
            self.text_items = list(range(len(embeddings)))
        self._cache.clear()

    def _encode_images_batched(self, images: Sequence) -> np.ndarray:
        bs = self.config.batch_size
        chunks = []
        for i in range(0, len(images), bs):
            chunk = images[i : i + bs]
            chunks.append(np.asarray(self.model.encode_image(list(chunk))))
        return np.concatenate(chunks, axis=0)

    def _encode_texts_batched(self, texts: Sequence[str]) -> np.ndarray:
        bs = self.config.batch_size
        chunks = []
        for i in range(0, len(texts), bs):
            chunks.append(np.asarray(self.model.encode_text(list(texts[i : i + bs]))))
        return np.concatenate(chunks, axis=0)

    # -- retrieval -----------------------------------------------------------
    def retrieve_images_by_text(
        self, texts, top_k: Optional[int] = None
    ) -> RetrievalResult:
        """(reference :527-577; batched: accepts one str or a list)"""
        if self.image_bank is None:
            raise RuntimeError("image index not built")
        single = isinstance(texts, str)
        texts = [texts] if single else list(texts)
        k = top_k or self.config.top_k
        cache_key = None
        if self.config.cache_enabled and single:
            cache_key = f"t2i:{k}:{texts[0]}"
            if cache_key in self._cache:
                self.stats["cache_hits"] += 1
                return self._cache[cache_key]
        t0 = time.time()
        q = self.model.encode_text(texts)
        scores, idx = self.image_bank.search(q, k)
        result = self._make_result(scores, idx, self.image_items, t0)
        if cache_key:
            self._cache[cache_key] = result
        return result

    def retrieve_texts_by_image(self, images, top_k: Optional[int] = None) -> RetrievalResult:
        """(reference :578-660)"""
        if self.text_bank is None:
            raise RuntimeError("text index not built")
        if not isinstance(images, (list, tuple)):
            images = [images] if hasattr(images, "convert") else images
        k = top_k or self.config.top_k
        t0 = time.time()
        q = self.model.encode_image(images)
        scores, idx = self.text_bank.search(q, k)
        return self._make_result(scores, idx, self.text_items, t0)

    def retrieve_reference_embeddings(self, texts, top_k: Optional[int] = None) -> np.ndarray:
        """[B, k, D] reference vectors for the detector (the alt stack's
        RetrievalReferenceGenerator.retrieve_references, retrieval_ref.py:173)."""
        if self.image_bank is None:
            raise RuntimeError("image index not built")
        k = top_k or self.config.top_k
        q = self.model.encode_text([texts] if isinstance(texts, str) else list(texts))
        _, idx = self.image_bank.search(q, k)
        host_bank = np.asarray(jax.device_get(self.image_bank._bank))[
            : self.image_bank.size
        ]
        return host_bank[np.asarray(idx)]

    def compute_similarity_matrix(self, texts, images=None) -> np.ndarray:
        """Full [T, N] text-vs-image-bank similarity (reference :682-760)."""
        if self.image_bank is None:
            raise RuntimeError("image index not built")
        q = self.model.encode_text([texts] if isinstance(texts, str) else list(texts))
        return np.asarray(self.image_bank.similarity_matrix(q))

    def _make_result(self, scores, idx, items, t0) -> RetrievalResult:
        idx_np = np.asarray(idx)
        elapsed = time.time() - t0
        self.stats["queries"] += idx_np.shape[0]
        self.stats["total_query_time"] += elapsed
        got = [
            [items[j] if 0 <= j < len(items) else None for j in row]
            for row in idx_np
        ]
        return RetrievalResult(
            indices=idx_np, scores=np.asarray(scores), items=got, query_time=elapsed
        )

    # -- persistence ---------------------------------------------------------
    def save(self, directory: str) -> None:
        """(reference save_image_index/save_text_index :764-830)"""
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        if self.image_bank is not None:
            self.image_bank.save(str(d / "image_bank"))
        if self.text_bank is not None:
            self.text_bank.save(str(d / "text_bank"))
        meta = {
            "config": dataclasses.asdict(self.config),
            "image_items": [str(x) for x in self.image_items],
            "text_items": [str(x) for x in self.text_items],
        }
        (d / "retriever.json").write_text(json.dumps(meta))

    def load(self, directory: str) -> None:
        d = Path(directory)
        meta = json.loads((d / "retriever.json").read_text())
        self.config = RetrievalConfig(**meta["config"])
        if (d / "image_bank.npz").exists():
            self.image_bank = EmbeddingBank.load(
                str(d / "image_bank"), mesh=self.mesh, normalize=self.config.normalize
            )
        if (d / "text_bank.npz").exists():
            self.text_bank = EmbeddingBank.load(
                str(d / "text_bank"), mesh=self.mesh, normalize=self.config.normalize
            )
        self.image_items = meta["image_items"]
        self.text_items = meta["text_items"]

    def get_stats(self) -> Dict[str, Any]:
        return dict(self.stats)


def create_retriever(model: CLIPModel, config: Optional[RetrievalConfig] = None, **kw) -> MultiModalRetriever:
    return MultiModalRetriever(model, config, **kw)
