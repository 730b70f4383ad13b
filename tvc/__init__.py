"""tvc — TPU-native Text-Variant-Consistency defense framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Zhang-Xin-Duke/multimodal-detection-consistency``: detection of adversarial
queries against CLIP-based multimodal retrieval via text-variant consistency,
plus the full attack suite, embedding-bank retrieval (FAISS replacement), and
the four-scenarios experiment harness.

Design notes (vs. reference at /root/reference):
  - batch-first: per-query python loops (reference src/detector.py:466-471,
    src/pipeline.py:555-568) become [B, V]/[B, R] einsums and one fused
    Pallas consistency kernel (tvc/core/pallas/consistency_kernel.py).
  - FAISS (reference src/retrieval.py:477-525) becomes an exact matmul top-k
    over an HBM-sharded embedding bank under shard_map (tvc/bank/index.py).
  - attacks (reference src/attacks/*.py) become jitted lax.fori_loop gradient
    loops (tvc/attacks/) — no DataParallel, no host round-trips per step.
  - multi-device scaling is SPMD over a jax.sharding.Mesh (tvc/parallel/),
    replacing the reference's GPUWorker pool / nn.DataParallel / NCCL DDP
    scaffolding (reference src/utils/multi_gpu_processor.py).
"""

__version__ = "0.1.0"

from tvc import core  # noqa: F401

# Lazy top-level API (mirrors reference src/__init__.py exports without
# importing heavy deps at package-import time).
_LAZY = {
    "CLIPModel": "tvc.models",
    "CLIPConfig": "tvc.models",
    "QwenModel": "tvc.models",
    "QwenConfig": "tvc.models",
    "StableDiffusionModel": "tvc.models",
    "SDConfig": "tvc.models",
    "TextAugmenter": "tvc.augment",
    "TextAugmentConfig": "tvc.augment",
    "MultiModalRetriever": "tvc.retrieval",
    "RetrievalConfig": "tvc.retrieval",
    "AdversarialDetector": "tvc.detector",
    "DetectorConfig": "tvc.detector",
    "EnsembleDetector": "tvc.detector",
    "MultiModalDetectionPipeline": "tvc.pipeline",
    "DefensePipeline": "tvc.pipeline",
    "PipelineConfig": "tvc.pipeline",
    "SDReferenceGenerator": "tvc.sd_ref",
    "EmbeddingBank": "tvc.bank",
    "ReferenceBank": "tvc.bank",
    "ServingRuntime": "tvc.serving",
    "ServingConfig": "tvc.serving",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'tvc' has no attribute {name!r}")
