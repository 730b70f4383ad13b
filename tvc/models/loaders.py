"""Pretrained-weight conversion: HF checkpoints -> tvc param trees.

The environment is zero-egress, so weight FILES may be absent — but the
converters are exact: they map HuggingFace ``CLIPModel`` and
``Qwen2ForCausalLM`` state dicts onto the tvc Flax modules, and the test
suite proves numerical parity against transformers' torch implementations
on random weights (tests/test_weight_loading.py). Point them at a local
checkout (``$TVC_CLIP_WEIGHTS`` / ``$TVC_QWEN_WEIGHTS`` or an explicit
path) to run with real weights.

Stable Diffusion: tvc's native UNet (tvc/models/sd.py) is an independent
TPU-first architecture, so diffusers checkpoints do not map onto it —
``tvc/models/sd_hf.py`` provides the HF-layout-compatible UNet/VAE mirror,
and ``convert_sd_unet_state_dict`` / ``convert_sd_vae_state_dict`` here map
a diffusers ``UNet2DConditionModel`` / ``AutoencoderKL`` state dict onto it
key-for-key (strict: missing/extra keys raise). ``load_sd_weights`` builds
a ready ``StableDiffusionModel`` from an on-disk
``runwayml/stable-diffusion-v1-5``-layout checkout (reference contract:
src/sd_ref.py:299-405). Fine-tuned tvc params persist through
``save_params``/``load_params`` (msgpack via flax.serialization).
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
    model = CLIPModel(config, params=params)
    _warn_hash_tokenizer(model.tokenizer, "CLIP", "$TVC_CLIP_BPE")
    return model


def _warn_hash_tokenizer(tokenizer, what: str, env_hint: str) -> None:
    """Real weights + the hash-fallback tokenizer silently produce garbage
    embeddings (round-1 weak item 8): warn loudly, or hard-fail with
    $TVC_STRICT_TOKENIZER=1."""
    from tvc.models.tokenizer import HashTokenizer

    if not isinstance(tokenizer, HashTokenizer):
        return
    msg = (
        f"{what} weights are REAL but the tokenizer is the semantically "
        f"meaningless hash fallback — text embeddings will be garbage. "
        f"Provide the vocab/merges files ({env_hint})."
    )
    if os.environ.get("TVC_STRICT_TOKENIZER"):
        raise RuntimeError(msg)
    import warnings

    warnings.warn(msg, stacklevel=3)


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
    model = QwenModel(config, params=params)
    _warn_hash_tokenizer(model.tokenizer, "Qwen", "$TVC_QWEN_TOKENIZER")
    return model


# ---------------------------------------------------------------------------
# Stable Diffusion (diffusers layout -> tvc/models/sd_hf.py mirrors)
# ---------------------------------------------------------------------------

#: dotted diffusers sub-paths that are single flax modules in sd_hf.py
_SD_NAME_REWRITES = (
    ("ff.net.0.proj", "ff_net_0_proj"),
    ("ff.net.2", "ff_net_2"),
    ("to_out.0", "to_out_0"),
    ("downsamplers.0.conv", "downsamplers_0_conv"),
    ("upsamplers.0.conv", "upsamplers_0_conv"),
    ("time_embedding.linear_1", "time_embedding_linear_1"),
    ("time_embedding.linear_2", "time_embedding_linear_2"),
)

#: top-level block prefixes whose immediate child merges into one module name
_SD_BLOCK_CHILDREN = (
    "resnets_", "attentions_", "downsamplers_0_conv", "upsamplers_0_conv"
)


def _sd_flax_path(dotted: str) -> list:
    """diffusers param path (without .weight/.bias) -> flax tree path."""
    for pat, repl in _SD_NAME_REWRITES:
        dotted = dotted.replace(pat, repl)
    segs = []
    for s in dotted.split("."):
        if s.isdigit() and segs:
            segs[-1] = f"{segs[-1]}_{s}"
        else:
            segs.append(s)
    out: list = []
    for s in segs:
        if out and s.startswith(_SD_BLOCK_CHILDREN) and (
            out[-1] == "mid_block"
            or (
                out[-1].startswith(("down_blocks_", "up_blocks_"))
                and not any(c in out[-1] for c in _SD_BLOCK_CHILDREN)
            )
        ):
            out[-1] = f"{out[-1]}_{s}"
        else:
            out.append(s)
    return out


def _sd_leaf(name: str, w: np.ndarray):
    """(leaf param name, converted array) for a diffusers weight/bias."""
    if name == "bias":
        return "bias", w
    if w.ndim == 4:  # conv OIHW -> HWIO
        return "kernel", np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 2:  # linear [out, in] -> [in, out]
        return "kernel", _t(w)
    return "scale", w  # norm weight


def _sd_convert(sd: Dict[str, np.ndarray], key_filter=None) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, w in sd.items():
        if key_filter is not None:
            key = key_filter(key)
            if key is None:
                continue
        dotted, _, leaf_name = key.rpartition(".")
        path = _sd_flax_path(dotted)
        leaf, arr = _sd_leaf(leaf_name, np.asarray(w))
        node = out
        for seg in path:
            node = node.setdefault(seg, {})
        node[leaf] = arr
    return out


def _assert_tree_matches(converted: Dict, template: Dict, what: str) -> None:
    """Strict structural + shape check (the converter's built-in test)."""
    import jax

    conv_leaves = {
        "/".join(str(k.key) for k in path): v.shape
        for path, v in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    tmpl_leaves = {
        "/".join(str(k.key) for k in path): v.shape
        for path, v in jax.tree_util.tree_flatten_with_path(template)[0]
    }
    missing = sorted(set(tmpl_leaves) - set(conv_leaves))
    extra = sorted(set(conv_leaves) - set(tmpl_leaves))
    if missing or extra:
        raise ValueError(
            f"{what}: converted tree mismatch; missing={missing[:5]} "
            f"extra={extra[:5]} (of {len(missing)}/{len(extra)})"
        )
    bad = [
        (k, conv_leaves[k], tmpl_leaves[k])
        for k in tmpl_leaves
        if tuple(conv_leaves[k]) != tuple(tmpl_leaves[k])
    ]
    if bad:
        raise ValueError(f"{what}: shape mismatches: {bad[:5]}")


def convert_sd_unet_state_dict(
    sd: Dict[str, np.ndarray], config=None, validate: bool = True
) -> Dict[str, Any]:
    """diffusers ``UNet2DConditionModel`` state dict -> ``HFUNet`` params."""
    import jax
    import jax.numpy as jnp

    from tvc.models.sd_hf import HFUNet, HFUNetConfig

    config = config or HFUNetConfig()
    params = _sd_convert(sd)
    if validate:
        unet = HFUNet(config)
        size = 64  # any latent size works; params are size-independent
        tmpl = jax.eval_shape(
            lambda: unet.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, size // 8, size // 8, config.in_channels)),
                jnp.zeros((1,)),
                jnp.zeros((1, 4, config.cross_attention_dim)),
            )["params"]
        )
        _assert_tree_matches(params, tmpl, "sd_unet")
    return params


def convert_sd_vae_state_dict(
    sd: Dict[str, np.ndarray], config=None, validate: bool = True
) -> Dict[str, Any]:
    """diffusers ``AutoencoderKL`` state dict -> ``(HFVAEEncoder params,
    HFVAEDecoder params)``. The AutoencoderKL top-level ``quant_conv`` /
    ``post_quant_conv`` route into encoder / decoder respectively."""
    import jax
    import jax.numpy as jnp

    from tvc.models.sd_hf import HFVAEConfig, HFVAEDecoder, HFVAEEncoder

    config = config or HFVAEConfig()

    def enc_filter(key: str):
        if key.startswith("encoder."):
            return key[len("encoder."):]
        if key.startswith("quant_conv."):
            return key
        return None

    def dec_filter(key: str):
        if key.startswith("decoder."):
            return key[len("decoder."):]
        if key.startswith("post_quant_conv."):
            return key
        return None

    enc_params = _sd_convert(sd, enc_filter)
    dec_params = _sd_convert(sd, dec_filter)
    if validate:
        f = 2 ** (len(config.block_out_channels) - 1)
        size = 8 * f
        enc_tmpl = jax.eval_shape(
            lambda: HFVAEEncoder(config).init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, size, size, config.in_channels)),
            )["params"]
        )
        dec_tmpl = jax.eval_shape(
            lambda: HFVAEDecoder(config).init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 8, 8, config.latent_channels)),
            )["params"]
        )
        _assert_tree_matches(enc_params, enc_tmpl, "sd_vae_encoder")
        _assert_tree_matches(dec_params, dec_tmpl, "sd_vae_decoder")
    return enc_params, dec_params


def load_sd_weights(
    path: Optional[str] = None,
    image_size: int = 512,
    unet_config=None,
    vae_config=None,
    **sd_kwargs,
):
    """Build a ``StableDiffusionModel`` from a diffusers-layout checkout
    (``$TVC_SD_WEIGHTS`` or ``path``; expects ``unet/`` and ``vae/``
    subdirectories a la runwayml/stable-diffusion-v1-5). Returns None when
    no checkpoint is available."""
    from tvc.models.sd import SDConfig, StableDiffusionModel
    from tvc.models.sd_hf import HFUNet, HFUNetConfig, HFVAEConfig, HFVAEDecoder, HFVAEEncoder

    path = path or os.environ.get("TVC_SD_WEIGHTS")
    if not path or not Path(path).exists():
        return None
    root = Path(path)
    unet_config = unet_config or HFUNetConfig()
    vae_config = vae_config or HFVAEConfig()
    unet_params = convert_sd_unet_state_dict(
        load_state_dict(str(root / "unet")), unet_config
    )
    enc_params, dec_params = convert_sd_vae_state_dict(
        load_state_dict(str(root / "vae")), vae_config
    )
    cfg = SDConfig(
        image_size=image_size,
        context_dim=unet_config.cross_attention_dim,
        vae_scale=vae_config.scaling_factor,
        model_name=str(root),
    )
    return StableDiffusionModel(
        cfg,
        params={"unet": unet_params, "vae_enc": enc_params, "vae_dec": dec_params},
        unet=HFUNet(unet_config),
        vae_enc=HFVAEEncoder(vae_config),
        vae_dec=HFVAEDecoder(vae_config),
        **sd_kwargs,
    )


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
