"""Pretrained-weight conversion: HF checkpoints -> tvc param trees.

The environment is zero-egress, so weight FILES may be absent — but the
converters are exact: they map HuggingFace ``CLIPModel`` and
``Qwen2ForCausalLM`` state dicts onto the tvc Flax modules, and the test
suite proves numerical parity against transformers' torch implementations
on random weights (tests/test_weight_loading.py). Point them at a local
checkout (``$TVC_CLIP_WEIGHTS`` / ``$TVC_QWEN_WEIGHTS`` or an explicit
path) to run with real weights.

The SD UNet here is an independent TPU-first architecture (not a diffusers
clone), so diffusers checkpoints do not map onto it; SD params persist
through ``save_params``/``load_params`` (msgpack via flax.serialization).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# state-dict IO
# ---------------------------------------------------------------------------


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch/safetensors checkpoint into a numpy dict."""
    p = Path(path)
    if p.is_dir():
        # HF layout: model.safetensors / pytorch_model.bin (possibly sharded)
        candidates = sorted(p.glob("*.safetensors")) or sorted(p.glob("pytorch_model*.bin"))
        if not candidates:
            raise FileNotFoundError(f"no checkpoint files under {p}")
        out: Dict[str, np.ndarray] = {}
        for c in candidates:
            out.update(load_state_dict(str(c)))
        return out
    if p.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(p)))
    import torch

    sd = torch.load(str(p), map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out, in] -> flax kernel [in, out]."""
    return np.ascontiguousarray(w.T)


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


def _convert_clip_tower(sd: Dict[str, np.ndarray], prefix: str, layers: int) -> Dict[str, Any]:
    """Shared encoder-layer conversion for HF CLIP text/vision towers."""
    blocks: Dict[str, Any] = {}
    for i in range(layers):
        lp = f"{prefix}.encoder.layers.{i}"
        qkv_kernel = np.concatenate(
            [_t(sd[f"{lp}.self_attn.{n}_proj.weight"]) for n in ("q", "k", "v")],
            axis=1,
        )
        qkv_bias = np.concatenate(
            [sd[f"{lp}.self_attn.{n}_proj.bias"] for n in ("q", "k", "v")]
        )
        blocks[f"block_{i}"] = {
            "ln_1": {
                "scale": sd[f"{lp}.layer_norm1.weight"],
                "bias": sd[f"{lp}.layer_norm1.bias"],
            },
            "attn": {
                "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                "out": {
                    "kernel": _t(sd[f"{lp}.self_attn.out_proj.weight"]),
                    "bias": sd[f"{lp}.self_attn.out_proj.bias"],
                },
            },
            "ln_2": {
                "scale": sd[f"{lp}.layer_norm2.weight"],
                "bias": sd[f"{lp}.layer_norm2.bias"],
            },
            "mlp": {
                "fc": {
                    "kernel": _t(sd[f"{lp}.mlp.fc1.weight"]),
                    "bias": sd[f"{lp}.mlp.fc1.bias"],
                },
                "proj": {
                    "kernel": _t(sd[f"{lp}.mlp.fc2.weight"]),
                    "bias": sd[f"{lp}.mlp.fc2.bias"],
                },
            },
        }
    return blocks


def convert_clip_state_dict(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """HF ``transformers.CLIPModel`` state dict -> tvc CLIPModule params.

    Weight-name map documented inline; validated numerically in
    tests/test_weight_loading.py.
    """
    vp = "vision_model"
    tp = "text_model"
    patch = sd[f"{vp}.embeddings.patch_embedding.weight"]  # [W, 3, P, P] OIHW
    visual = {
        "patch_embed": {"kernel": np.transpose(patch, (2, 3, 1, 0))},  # HWIO
        "class_embedding": sd[f"{vp}.embeddings.class_embedding"],
        "positional_embedding": sd[f"{vp}.embeddings.position_embedding.weight"],
        "ln_pre": {
            "scale": sd[f"{vp}.pre_layrnorm.weight"],  # (sic - HF typo)
            "bias": sd[f"{vp}.pre_layrnorm.bias"],
        },
        "transformer": _convert_clip_tower(sd, vp, config.vision_layers),
        "ln_post": {
            "scale": sd[f"{vp}.post_layernorm.weight"],
            "bias": sd[f"{vp}.post_layernorm.bias"],
        },
        "proj": _t(sd["visual_projection.weight"]),
    }
    text = {
        "token_embedding": {
            "embedding": sd[f"{tp}.embeddings.token_embedding.weight"]
        },
        "positional_embedding": sd[f"{tp}.embeddings.position_embedding.weight"],
        "transformer": _convert_clip_tower(sd, tp, config.text_layers),
        "ln_final": {
            "scale": sd[f"{tp}.final_layer_norm.weight"],
            "bias": sd[f"{tp}.final_layer_norm.bias"],
        },
        "text_projection": _t(sd["text_projection.weight"]),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": sd["logit_scale"],
    }


def load_clip_weights(config=None, path: Optional[str] = None):
    """Build a CLIPModel with converted HF weights from ``path`` (or
    $TVC_CLIP_WEIGHTS). Returns None if no checkpoint is available."""
    from tvc.models.clip import CLIPConfig, CLIPModel

    path = path or os.environ.get("TVC_CLIP_WEIGHTS")
    if not path or not Path(path).exists():
        return None
    config = config or CLIPConfig()
    sd = load_state_dict(path)
    params = convert_clip_state_dict(sd, config)
    return CLIPModel(config, params=params)


# ---------------------------------------------------------------------------
# Qwen2
# ---------------------------------------------------------------------------


def convert_qwen_state_dict(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """HF ``Qwen2ForCausalLM`` state dict -> tvc QwenLM params."""
    params: Dict[str, Any] = {
        "embed": {"embedding": sd["model.embed_tokens.weight"]},
        "ln_f": {"scale": sd["model.norm.weight"]},
    }
    for i in range(config.num_layers):
        lp = f"model.layers.{i}"
        params[f"layer_{i}"] = {
            "ln_attn": {"scale": sd[f"{lp}.input_layernorm.weight"]},
            "attn": {
                "q": {
                    "kernel": _t(sd[f"{lp}.self_attn.q_proj.weight"]),
                    "bias": sd[f"{lp}.self_attn.q_proj.bias"],
                },
                "k": {
                    "kernel": _t(sd[f"{lp}.self_attn.k_proj.weight"]),
                    "bias": sd[f"{lp}.self_attn.k_proj.bias"],
                },
                "v": {
                    "kernel": _t(sd[f"{lp}.self_attn.v_proj.weight"]),
                    "bias": sd[f"{lp}.self_attn.v_proj.bias"],
                },
                "o": {"kernel": _t(sd[f"{lp}.self_attn.o_proj.weight"])},
            },
            "ln_mlp": {"scale": sd[f"{lp}.post_attention_layernorm.weight"]},
            "mlp": {
                "gate": {"kernel": _t(sd[f"{lp}.mlp.gate_proj.weight"])},
                "up": {"kernel": _t(sd[f"{lp}.mlp.up_proj.weight"])},
                "down": {"kernel": _t(sd[f"{lp}.mlp.down_proj.weight"])},
            },
        }
    if not config.tie_embeddings:
        params["lm_head"] = {"kernel": _t(sd["lm_head.weight"])}
    return params


def load_qwen_weights(config=None, path: Optional[str] = None):
    from tvc.models.qwen import QwenConfig, QwenModel

    path = path or os.environ.get("TVC_QWEN_WEIGHTS")
    if not path or not Path(path).exists():
        return None
    config = config or QwenConfig()
    sd = load_state_dict(path)
    params = convert_qwen_state_dict(sd, config)
    return QwenModel(config, params=params)


# ---------------------------------------------------------------------------
# generic param persistence (SD + fine-tuned models)
# ---------------------------------------------------------------------------


def save_params(params: Any, path: str) -> None:
    """flax msgpack serialization (checkpoint role, SURVEY.md §5.4)."""
    from flax import serialization

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(serialization.to_bytes(params))


def load_params(template: Any, path: str) -> Any:
    from flax import serialization

    return serialization.from_bytes(template, Path(path).read_bytes())
