"""Dataset hygiene validation.

Covers reference src/evaluation/data_validator.py (DataValidationConfig
:28, ValidationResult :68: exact/near-duplicate detection, train/test
leakage checks, distribution + quality checks via CLIP image features and
TF-IDF text features :30-54).

Batched TPU path: all CLIP encodes happen in a few large batches; duplicate
detection is one [N, N] similarity matmul (or blocked for large N).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class DataValidationConfig:
    """(reference :28-67)"""

    near_duplicate_threshold: float = 0.97
    text_duplicate_threshold: float = 0.95
    min_caption_words: int = 2
    max_caption_words: int = 80
    min_image_std: float = 0.01  # blank-image heuristic
    batch_size: int = 256
    block_size: int = 2048  # similarity matmul blocking


@dataclasses.dataclass
class ValidationResult:
    """(reference :68-107)"""

    num_samples: int
    exact_duplicate_pairs: List[tuple]
    near_duplicate_pairs: List[tuple]
    text_duplicate_pairs: List[tuple]
    leakage_pairs: List[tuple]
    invalid_captions: List[int]
    low_quality_images: List[int]
    passed: bool
    summary: Dict[str, Any] = dataclasses.field(default_factory=dict)


class DataValidator:
    def __init__(self, clip_model=None, config: Optional[DataValidationConfig] = None):
        self.clip = clip_model
        self.config = config or DataValidationConfig()

    # -- feature extraction -----------------------------------------------------
    def _image_features(self, images: np.ndarray) -> np.ndarray:
        if self.clip is not None:
            bs = self.config.batch_size
            chunks = [
                np.asarray(self.clip.encode_image(images[i : i + bs]))
                for i in range(0, len(images), bs)
            ]
            return np.concatenate(chunks)
        flat = images.reshape(len(images), -1).astype(np.float32)
        return flat / np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-8)

    def _text_features(self, texts: Sequence[str]) -> np.ndarray:
        from sklearn.feature_extraction.text import TfidfVectorizer

        if len(texts) < 2:
            return np.zeros((len(texts), 1), np.float32)
        vec = TfidfVectorizer().fit_transform(texts)
        arr = np.asarray(vec.todense(), dtype=np.float32)
        norms = np.maximum(np.linalg.norm(arr, axis=1, keepdims=True), 1e-8)
        return arr / norms

    def _duplicate_pairs(self, feats: np.ndarray, threshold: float) -> List[tuple]:
        """Blocked upper-triangular similarity scan."""
        n = len(feats)
        bs = self.config.block_size
        pairs = []
        for i0 in range(0, n, bs):
            a = feats[i0 : i0 + bs]
            for j0 in range(i0, n, bs):
                b = feats[j0 : j0 + bs]
                sims = a @ b.T
                ii, jj = np.where(sims >= threshold)
                for i, j in zip(ii + i0, jj + j0):
                    if i < j:
                        pairs.append((int(i), int(j), float(sims[i - i0, j - j0])))
        return pairs

    # -- checks ------------------------------------------------------------------
    def validate(
        self,
        images: np.ndarray,
        texts: Sequence[str],
        train_images: Optional[np.ndarray] = None,
    ) -> ValidationResult:
        cfg = self.config
        n = len(texts)

        # caption validity
        invalid = [
            i
            for i, t in enumerate(texts)
            if not (cfg.min_caption_words <= len(t.split()) <= cfg.max_caption_words)
        ]
        # image quality (blank/flat detection)
        stds = np.asarray(images).reshape(n, -1).std(axis=1)
        low_quality = [int(i) for i in np.where(stds < cfg.min_image_std)[0]]

        # duplicates
        feats = self._image_features(np.asarray(images))
        near_dupes = self._duplicate_pairs(feats, cfg.near_duplicate_threshold)
        exact = [(i, j, s) for i, j, s in near_dupes if s > 0.9999]

        tfeats = self._text_features(texts)
        text_dupes = (
            self._duplicate_pairs(tfeats, cfg.text_duplicate_threshold)
            if tfeats.shape[1] > 1
            else []
        )

        # train/test leakage: eval images near-identical to train images
        leakage: List[tuple] = []
        if train_images is not None:
            train_feats = self._image_features(np.asarray(train_images))
            sims = feats @ train_feats.T
            ii, jj = np.where(sims >= cfg.near_duplicate_threshold)
            leakage = [
                (int(i), int(j), float(sims[i, j])) for i, j in zip(ii, jj)
            ]

        passed = not (exact or leakage or invalid or low_quality)
        return ValidationResult(
            num_samples=n,
            exact_duplicate_pairs=exact,
            near_duplicate_pairs=near_dupes,
            text_duplicate_pairs=text_dupes,
            leakage_pairs=leakage,
            invalid_captions=invalid,
            low_quality_images=low_quality,
            passed=passed,
            summary={
                "num_samples": n,
                "near_duplicates": len(near_dupes),
                "text_duplicates": len(text_dupes),
                "leakage": len(leakage),
                "invalid_captions": len(invalid),
                "low_quality_images": len(low_quality),
            },
        )
