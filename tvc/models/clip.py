"""CLIP dual encoder in Flax — the first-class model package the reference
imports but never shipped (SURVEY.md §2.2; call-site API reconstructed from
reference src/retrieval.py:356-454, src/detector.py:266-269,461-463,
src/attacks/pgd_attack.py:173,254, src/attacks/hubness_attack.py:199,586).

TPU-first design:
  * pre-LN ViT + text transformer as plain Flax modules; everything jits
    into single XLA programs, matmuls in bf16 on the MXU with f32
    layernorms/softmax;
  * the "differentiable path" the reference exposes as a separate
    ``encode_image_tensor(requires_grad=True)`` method is just the same
    pure function here — attacks take ``jax.grad`` of it directly;
  * batch-sharded inference under the mesh replaces DataParallel.

Weight loading from HF/OpenAI checkpoints is gated (zero-egress default:
random init with a fixed threefry key — deterministic and sufficient for
architecture/pipeline correctness work).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import Array

from tvc.core.similarity import cosine_similarity, l2_normalize

# CLIP-native preprocessing constants (OpenAI CLIP; the reference itself is
# inconsistent, using ImageNet stats in attacks (pgd_attack.py:95-100) — we
# standardize on CLIP-native and document the deviation, SURVEY.md §7).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """Architecture + runtime config.

    Defaults are ViT-B/32 (the reference default model,
    configs/default.yaml models.clip.default_model "ViT-B/32").
    """

    # vision tower
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text tower
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    # joint
    embed_dim: int = 512
    # runtime
    dtype: Any = jnp.bfloat16  # activation/matmul dtype on the MXU
    model_name: str = "ViT-B/32"
    #: use the fused VMEM-resident MHA Pallas kernel in the vision tower
    #: (inference only - no VJP; CLIPModel keeps the einsum path for grads)
    fused_attention: bool = False
    #: quantized serving: int8 (W8A8 dynamic per-token) projection GEMMs in
    #: the fused inference towers — ~1.5x MXU rate on v5e. Requires
    #: fused_attention. Gradients/training stay bf16 on the einsum path.
    int8_serving: bool = False

    @classmethod
    def tiny(cls) -> "CLIPConfig":
        """Tiny config for tests (runs in ms on CPU)."""
        return cls(
            image_size=32,
            patch_size=16,
            vision_width=64,
            vision_layers=2,
            vision_heads=2,
            vocab_size=512,
            context_length=16,
            text_width=64,
            text_layers=2,
            text_heads=2,
            embed_dim=32,
            dtype=jnp.float32,
            model_name="tiny",
        )

    @classmethod
    def vit_b32(cls, **kw) -> "CLIPConfig":
        return cls(model_name="ViT-B/32", **kw)

    @classmethod
    def vit_b16(cls, **kw) -> "CLIPConfig":
        """ViT-B/16: same towers as B/32 with 16px patches (seq 197)."""
        return cls(patch_size=16, model_name="ViT-B/16", **kw)

    @classmethod
    def vit_l14(cls, **kw) -> "CLIPConfig":
        """ViT-L/14 (openai/clip-vit-large-patch14 shapes)."""
        return cls(
            patch_size=14,
            vision_width=1024,
            vision_layers=24,
            vision_heads=16,
            text_width=768,
            text_layers=12,
            text_heads=12,
            embed_dim=768,
            model_name="ViT-L/14",
            **kw,
        )

    @classmethod
    def tiny_coco(cls) -> "CLIPConfig":
        """Tiny quality-fixture config for REAL captions: the full CLIP BPE
        vocab and a 32-token context (natural COCO captions exceed tiny's
        16-token context; vocab 512 would hash-collide distinct words the
        caption renderer keeps distinct — tvc/data/loaders.py
        render_caption_image)."""
        return cls(
            image_size=32,
            patch_size=8,
            vision_width=64,
            vision_layers=2,
            vision_heads=2,
            vocab_size=49408,
            context_length=32,
            text_width=64,
            text_layers=2,
            text_heads=2,
            embed_dim=32,
            dtype=jnp.float32,
            model_name="tiny_coco",
        )

    @classmethod
    def from_name(cls, name: str, **kw) -> "CLIPConfig":
        """Resolve a reference model name (src/__init__.py:99-108
        SUPPORTED_CLIP_MODELS, both OpenAI "ViT-B/32" and HF
        "openai/clip-vit-base-patch32" spellings) to a config. The RN*
        ResNet variants are not supported — the reference never uses them
        in any shipped config (configs/default.yaml ViT-B/32)."""
        canon = {
            "vit-b/32": cls.vit_b32,
            "openai/clip-vit-base-patch32": cls.vit_b32,
            "vit-b/16": cls.vit_b16,
            "openai/clip-vit-base-patch16": cls.vit_b16,
            "vit-l/14": cls.vit_l14,
            "openai/clip-vit-large-patch14": cls.vit_l14,
            # forward kwargs (e.g. int8_serving=True) instead of silently
            # dropping them
            "tiny": lambda **k: dataclasses.replace(cls.tiny(), **k),
            "tiny_coco": lambda **k: dataclasses.replace(cls.tiny_coco(), **k),
        }
        key = name.strip().lower()
        if key not in canon:
            raise ValueError(
                f"unsupported CLIP model {name!r}; supported: "
                "ViT-B/32, ViT-B/16, ViT-L/14 (and HF spellings), tiny"
            )
        return canon[key](**kw)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class MLP(nn.Module):
    width: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="fc")(x)
        h = quick_gelu(h)
        return nn.Dense(self.width, dtype=self.dtype, name="proj")(h)


class Attention(nn.Module):
    width: int
    heads: int
    dtype: Any
    fused: bool = False  # fused Pallas MHA (inference; mask must be None)

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        B, T, _ = x.shape
        head_dim = self.width // self.heads
        qkv = nn.Dense(self.width * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.fused and mask is None:
            from tvc.core.pallas.attention_kernel import fused_mha

            q4 = q.reshape(B, T, self.heads, head_dim)
            k4 = k.reshape(B, T, self.heads, head_dim)
            v4 = v.reshape(B, T, self.heads, head_dim)
            out = fused_mha(q4, k4, v4).reshape(B, T, self.width)
            return nn.Dense(self.width, dtype=self.dtype, name="out")(out)

        def heads_split(t):
            return t.reshape(B, T, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        scale = 1.0 / np.sqrt(head_dim)
        # f32 softmax for stability regardless of activation dtype
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            logits = logits + mask
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out")(out)


class ResidualBlock(nn.Module):
    width: int
    heads: int
    dtype: Any
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        # pre-LN; layernorm in f32
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        x = x + Attention(
            self.width, self.heads, self.dtype, self.fused, name="attn"
        )(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        x = x + MLP(self.width, self.dtype, name="mlp")(h)
        return x


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: Any
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        for i in range(self.layers):
            x = ResidualBlock(
                self.width, self.heads, self.dtype, self.fused, name=f"block_{i}"
            )(x, mask)
        return x


class VisionTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images: Array) -> Array:
        """images: [B, H, W, 3] (NHWC, TPU-native layout) -> [B, embed_dim]."""
        c = self.cfg
        x = images.astype(c.dtype)
        # patchify: conv with stride=patch (one big MXU matmul after im2col)
        x = nn.Conv(
            c.vision_width,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=c.dtype,
            name="patch_embed",
        )(x)
        B = x.shape[0]
        x = x.reshape(B, -1, c.vision_width)  # [B, P, W]
        cls = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=c.vision_width**-0.5),
            (c.vision_width,),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(c.dtype), (B, 1, c.vision_width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=c.vision_width**-0.5),
            (x.shape[1], c.vision_width),
        )
        x = x + pos.astype(c.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x).astype(c.dtype)
        x = Transformer(
            c.vision_width, c.vision_layers, c.vision_heads, c.dtype,
            c.fused_attention, name="transformer"
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj",
            nn.initializers.normal(stddev=c.vision_width**-0.5),
            (c.vision_width, c.embed_dim),
        )
        return jnp.dot(
            x.astype(jnp.float32), proj.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )


class TextTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        """tokens: [B, T] int32 -> [B, embed_dim]. Feature at EOT (= argmax
        token id, CLIP convention)."""
        c = self.cfg
        emb = nn.Embed(
            c.vocab_size, c.text_width, dtype=c.dtype, name="token_embedding"
        )(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (c.context_length, c.text_width),
        )
        x = emb + pos[None, : tokens.shape[1]].astype(c.dtype)
        T = tokens.shape[1]
        causal = jnp.where(
            jnp.tril(jnp.ones((T, T), dtype=bool)), 0.0, -jnp.inf
        )[None, None]
        x = Transformer(
            c.text_width, c.text_layers, c.text_heads, c.dtype, name="transformer"
        )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(stddev=c.text_width**-0.5),
            (c.text_width, c.embed_dim),
        )
        return jnp.dot(
            x.astype(jnp.float32), proj.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )


class CLIPModule(nn.Module):
    """Joint module: owns both towers + logit scale."""

    cfg: CLIPConfig

    def setup(self):
        self.visual = VisionTower(self.cfg)
        self.text = TextTower(self.cfg)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ()
        )

    def encode_image(self, images: Array) -> Array:
        return self.visual(images)

    def encode_text(self, tokens: Array) -> Array:
        return self.text(tokens)

    def __call__(self, images: Array, tokens: Array) -> Tuple[Array, Array, Array]:
        img = l2_normalize(self.encode_image(images))
        txt = l2_normalize(self.encode_text(tokens))
        logits = jnp.exp(self.logit_scale) * img @ txt.T
        return img, txt, logits


# ---------------------------------------------------------------------------
# hand-scheduled inference vision tower (serving hot path)
# ---------------------------------------------------------------------------


def _layernorm_f32(x: Array, scale: Array, bias: Array, eps: float = 1e-5) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale.astype(
        jnp.float32
    ) + bias.astype(jnp.float32)


def vision_features_fused(params: Dict, cfg: CLIPConfig, pixels: Array) -> Array:
    """Inference-only ViT forward with each attention sub-block as ONE
    fused Pallas kernel (LN + QKV + per-head attention + out-proj +
    residual, tvc/core/pallas/attention_layer_kernel.py).

    Same math as ``VisionTower.__call__`` on the SAME param tree; round-1
    profiling showed attention HBM round-trips dominate the defended step
    (docs/architecture.md), so the serving path hand-schedules them away.
    pixels: CLIP-normalized [B, H, W, 3]. Returns [B, embed_dim] f32
    (unnormalized features).
    """
    from tvc.core.pallas.attention_layer_kernel import (
        fused_attention_layer,
        fused_mlp_layer,
    )

    v = params["visual"]
    dtype = cfg.dtype
    x = jax.lax.conv_general_dilated(
        pixels.astype(dtype),
        v["patch_embed"]["kernel"].astype(dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.vision_width)
    cls = jnp.broadcast_to(
        v["class_embedding"].astype(dtype), (B, 1, cfg.vision_width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"].astype(dtype)
    x = _layernorm_f32(x, v["ln_pre"]["scale"], v["ln_pre"]["bias"]).astype(dtype)
    for i in range(cfg.vision_layers):
        blk = v["transformer"][f"block_{i}"]
        x = fused_attention_layer(
            x,
            blk["ln_1"]["scale"],
            blk["ln_1"]["bias"],
            # pre-cast: weight blocks live VMEM-resident across grid steps,
            # bf16 halves their footprint
            blk["attn"]["qkv"]["kernel"].astype(dtype),
            blk["attn"]["qkv"]["bias"].astype(jnp.float32),
            blk["attn"]["out"]["kernel"].astype(dtype),
            blk["attn"]["out"]["bias"].astype(jnp.float32),
            heads=cfg.vision_heads,
        )
        x = fused_mlp_layer(
            x,
            blk["ln_2"]["scale"],
            blk["ln_2"]["bias"],
            blk["mlp"]["fc"]["kernel"].astype(dtype),
            blk["mlp"]["fc"]["bias"].astype(jnp.float32),
            blk["mlp"]["proj"]["kernel"].astype(dtype),
            blk["mlp"]["proj"]["bias"].astype(jnp.float32),
        )
    x = _layernorm_f32(x[:, 0, :], v["ln_post"]["scale"], v["ln_post"]["bias"])
    return jnp.dot(
        x, v["proj"].astype(jnp.float32), preferred_element_type=jnp.float32
    )


def text_features_fused(params: Dict, cfg: CLIPConfig, tokens: Array) -> Array:
    """Inference-only text-tower forward with fused attention layers
    (causal). Same math as ``TextTower.__call__`` on the same param tree.

    The VARIANT text encode is the defended step's biggest stage (B*V
    sequences per batch); at T~32 the per-layer HBM round-trips dominate
    even more than in the vision tower.
    """
    from tvc.core.pallas.attention_layer_kernel import (
        fused_attention_layer,
        fused_mlp_layer,
    )

    t = params["text"]
    dtype = cfg.dtype
    emb = t["token_embedding"]["embedding"].astype(dtype)
    x = jnp.take(emb, tokens, axis=0)  # [B, T, W]
    T = tokens.shape[1]
    x = x + t["positional_embedding"][:T].astype(dtype)
    for i in range(cfg.text_layers):
        blk = t["transformer"][f"block_{i}"]
        x = fused_attention_layer(
            x,
            blk["ln_1"]["scale"],
            blk["ln_1"]["bias"],
            blk["attn"]["qkv"]["kernel"].astype(dtype),
            blk["attn"]["qkv"]["bias"].astype(jnp.float32),
            blk["attn"]["out"]["kernel"].astype(dtype),
            blk["attn"]["out"]["bias"].astype(jnp.float32),
            heads=cfg.text_heads,
            causal=True,
            # VMEM budget: larger batch blocks for shorter sequences
            block_b=64 if T <= 16 else (32 if T <= 32 else 16),
        )
        x = fused_mlp_layer(
            x,
            blk["ln_2"]["scale"],
            blk["ln_2"]["bias"],
            blk["mlp"]["fc"]["kernel"].astype(dtype),
            blk["mlp"]["fc"]["bias"].astype(jnp.float32),
            blk["mlp"]["proj"]["kernel"].astype(dtype),
            blk["mlp"]["proj"]["bias"].astype(jnp.float32),
            block_b=16 if T <= 32 else 8,
        )
    x = _layernorm_f32(x, t["ln_final"]["scale"], t["ln_final"]["bias"])
    eot = jnp.argmax(tokens, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.dot(
        x, t["text_projection"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def quantize_clip_params(params: Dict, cfg: CLIPConfig) -> Dict:
    """Prepare the int8 serving weights: per-output-channel symmetric int8
    for the four projection GEMMs of every transformer block in both towers
    (QKV, attn-out, MLP fc, MLP proj). One-time preprocessing — serving
    programs take this tree alongside ``params``.

    Returns {"visual"|"text": {"block_i": {name: (w_q int8, scale f32)}}}.
    """
    from tvc.core.pallas.quantized_layer_kernel import quantize_linear

    def tower(tree: Dict, layers: int) -> Dict:
        out = {}
        for i in range(layers):
            blk = tree["transformer"][f"block_{i}"]
            out[f"block_{i}"] = {
                "qkv": quantize_linear(blk["attn"]["qkv"]["kernel"]),
                "out": quantize_linear(blk["attn"]["out"]["kernel"]),
                "fc": quantize_linear(blk["mlp"]["fc"]["kernel"]),
                "proj": quantize_linear(blk["mlp"]["proj"]["kernel"]),
            }
        return out

    return {
        "visual": tower(params["visual"], cfg.vision_layers),
        "text": tower(params["text"], cfg.text_layers),
    }


def vision_features_fused_i8(
    params: Dict, qparams: Dict, cfg: CLIPConfig, pixels: Array
) -> Array:
    """``vision_features_fused`` with int8 projection GEMMs (W8A8 dynamic,
    tvc/core/pallas/quantized_layer_kernel.py). qparams from
    ``quantize_clip_params``. Inference-only."""
    from tvc.core.pallas.quantized_layer_kernel import (
        fused_attention_layer_i8,
        fused_mlp_layer_i8,
    )

    v = params["visual"]
    qv = qparams["visual"]
    dtype = cfg.dtype
    x = jax.lax.conv_general_dilated(
        pixels.astype(dtype),
        v["patch_embed"]["kernel"].astype(dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.vision_width)
    cls = jnp.broadcast_to(
        v["class_embedding"].astype(dtype), (B, 1, cfg.vision_width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"].astype(dtype)
    x = _layernorm_f32(x, v["ln_pre"]["scale"], v["ln_pre"]["bias"]).astype(dtype)
    for i in range(cfg.vision_layers):
        blk = v["transformer"][f"block_{i}"]
        qblk = qv[f"block_{i}"]
        x = fused_attention_layer_i8(
            x,
            blk["ln_1"]["scale"],
            blk["ln_1"]["bias"],
            qblk["qkv"][0],
            qblk["qkv"][1],
            blk["attn"]["qkv"]["bias"].astype(jnp.float32),
            qblk["out"][0],
            qblk["out"][1],
            blk["attn"]["out"]["bias"].astype(jnp.float32),
            heads=cfg.vision_heads,
        )
        x = fused_mlp_layer_i8(
            x,
            blk["ln_2"]["scale"],
            blk["ln_2"]["bias"],
            qblk["fc"][0],
            qblk["fc"][1],
            blk["mlp"]["fc"]["bias"].astype(jnp.float32),
            qblk["proj"][0],
            qblk["proj"][1],
            blk["mlp"]["proj"]["bias"].astype(jnp.float32),
        )
    x = _layernorm_f32(x[:, 0, :], v["ln_post"]["scale"], v["ln_post"]["bias"])
    return jnp.dot(
        x, v["proj"].astype(jnp.float32), preferred_element_type=jnp.float32
    )


def text_features_fused_i8(
    params: Dict, qparams: Dict, cfg: CLIPConfig, tokens: Array
) -> Array:
    """``text_features_fused`` with int8 projection GEMMs. Inference-only."""
    from tvc.core.pallas.quantized_layer_kernel import (
        fused_attention_layer_i8,
        fused_mlp_layer_i8,
    )

    t = params["text"]
    qt = qparams["text"]
    dtype = cfg.dtype
    emb = t["token_embedding"]["embedding"].astype(dtype)
    x = jnp.take(emb, tokens, axis=0)  # [B, T, W]
    T = tokens.shape[1]
    x = x + t["positional_embedding"][:T].astype(dtype)
    for i in range(cfg.text_layers):
        blk = t["transformer"][f"block_{i}"]
        qblk = qt[f"block_{i}"]
        x = fused_attention_layer_i8(
            x,
            blk["ln_1"]["scale"],
            blk["ln_1"]["bias"],
            qblk["qkv"][0],
            qblk["qkv"][1],
            blk["attn"]["qkv"]["bias"].astype(jnp.float32),
            qblk["out"][0],
            qblk["out"][1],
            blk["attn"]["out"]["bias"].astype(jnp.float32),
            heads=cfg.text_heads,
            causal=True,
            block_b=64 if T <= 16 else (32 if T <= 32 else 16),
        )
        x = fused_mlp_layer_i8(
            x,
            blk["ln_2"]["scale"],
            blk["ln_2"]["bias"],
            qblk["fc"][0],
            qblk["fc"][1],
            blk["mlp"]["fc"]["bias"].astype(jnp.float32),
            qblk["proj"][0],
            qblk["proj"][1],
            blk["mlp"]["proj"]["bias"].astype(jnp.float32),
            block_b=32 if T <= 32 else 8,
        )
    x = _layernorm_f32(x, t["ln_final"]["scale"], t["ln_final"]["bias"])
    eot = jnp.argmax(tokens, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.dot(
        x, t["text_projection"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# host-side preprocessing
# ---------------------------------------------------------------------------


def preprocess_images(
    images: Sequence, image_size: int = 224, normalize: bool = True
) -> np.ndarray:
    """PIL images / uint8 arrays -> [B, H, W, 3] float32 in CLIP stats.

    (Implied reference API ``CLIPModel.preprocess``,
    hubness_attack.py:523,717.) Uses the native C++ resize+normalize
    pipeline (tvc/native) when built — anti-aliased triangle filter matching
    PIL BILINEAR, OpenMP-parallel over the batch — with PIL as fallback.
    """
    if normalize:
        try:
            from tvc import native

            if native.available():
                raws = []
                for im in images:
                    if hasattr(im, "convert"):
                        raws.append(np.asarray(im.convert("RGB"), dtype=np.uint8))
                    else:
                        arr = np.asarray(im)
                        if arr.dtype != np.uint8:
                            arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
                        raws.append(arr)
                if all(r.ndim == 3 and r.shape[-1] == 3 for r in raws):
                    return native.resize_normalize_varied(raws, image_size)
        except Exception:
            pass  # fall through to the PIL path
    out = []
    for im in images:
        if hasattr(im, "convert"):  # PIL (ndarray also has .resize)
            im = im.convert("RGB").resize((image_size, image_size))
            arr = np.asarray(im, dtype=np.float32) / 255.0
        else:
            arr = np.asarray(im, dtype=np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
            if arr.shape[:2] != (image_size, image_size):
                try:
                    from PIL import Image as PILImage

                    pil = PILImage.fromarray((arr * 255).astype(np.uint8))
                    arr = (
                        np.asarray(
                            pil.resize((image_size, image_size)), dtype=np.float32
                        )
                        / 255.0
                    )
                except ImportError:  # pragma: no cover
                    raise ValueError(f"cannot resize array of shape {arr.shape}")
        out.append(arr)
    batch = np.stack(out)
    if normalize:
        batch = (batch - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    return batch.astype(np.float32)


def normalize_pixels(pixels: Array) -> Array:
    """[0,1] pixels -> CLIP-normalized (jit-safe; attacks perturb in pixel
    space and re-normalize inside the gradient loop)."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (pixels - mean) / std


def bucket_text_tokens(
    tokens: np.ndarray,
    short_len: int = 16,
    capacity_quantum: int = 256,
    dedup: bool = False,
) -> Optional[Dict[str, np.ndarray]]:
    """Host-side two-bucket partition of a padded token batch [S, T] for
    :meth:`CLIPModel.infer_text_features_bucketed`.

    Sorts rows by real length (EOT position + 1 — EOT is the highest
    token id), puts the C shortest in a ``short_len``-wide bucket and the
    rest in a full-T bucket, where C is the largest multiple of
    ``capacity_quantum`` that is <= the number of rows actually fitting
    ``short_len`` (quantizing C bounds the number of compiled program
    shapes a serving process accumulates). Returns None when bucketing
    cannot help: T <= short_len already, or fewer than one quantum of
    short rows. The stable sort keeps equal-length rows in input order so
    the partition is deterministic.

    ``dedup=True`` additionally considers encoding each DISTINCT token row
    once: a variant batch flattens originals + V variants per query, and
    the augmenter pads shortfalls by repeating texts (serving measured ~7%
    exact-duplicate rows on real COCO captions at V=6, and far more when
    strategies under-produce), so duplicate rows are wasted text-tower
    FLOPs. Because bucket capacities quantize (the dedup'd long bucket
    zero-pads UP to a ``capacity_quantum`` multiple for compiled-shape
    stability), dedup can LOSE to the raw partition at low duplicate rates
    — both plans are costed as encoded-token counts and the cheaper one is
    returned, so dedup is a strict non-loss. Exact either way — deduping
    reorders/elides identical encodes only; pad rows are never referenced
    by ``inv``.

    Output dict: ``short`` [C, short_len], ``long`` [L, T], ``inv``
    [S] int32 — ``concat(feats_short, feats_long)[inv]`` restores the
    input row order.
    """
    S, T = tokens.shape
    if T <= short_len or S < 2 * capacity_quantum:
        return None

    def _plan(rows, pad_long_to_quantum):
        U = rows.shape[0]
        lens = rows.argmax(-1) + 1
        # safety net: argmax-EOT undercounts rows whose EOT fell out of the
        # window (malformed input) — such a row must NOT be sliced to
        # short_len. Right-pad is id 0 for the CLIP tokenizers; for any
        # tokenizer padding with a nonzero id this makes every row "long"
        # and the function just declines to bucket (correct, no win).
        nonzero = rows != 0
        content = np.where(
            nonzero.any(axis=-1), T - nonzero[:, ::-1].argmax(-1), 0
        )
        lens = np.maximum(lens, content)
        n_short = int((lens <= short_len).sum())
        C = (n_short // capacity_quantum) * capacity_quantum
        if C < capacity_quantum or C >= U:
            return None
        order = np.argsort(lens, kind="stable")
        pos = np.empty(U, dtype=np.int32)
        pos[order] = np.arange(U, dtype=np.int32)
        long_rows = rows[order[C:], :]
        if pad_long_to_quantum:
            L = -(-(U - C) // capacity_quantum) * capacity_quantum
            if L > U - C:
                long_rows = np.concatenate(
                    [long_rows, np.zeros((L - (U - C), T), dtype=rows.dtype)]
                )
        return {
            "short": np.ascontiguousarray(rows[order[:C], :short_len]),
            "long": np.ascontiguousarray(long_rows),
            "pos": pos,
        }

    def _cost(plan):
        # encoded-token count ~ text-tower FLOPs (both buckets run the
        # same per-token work)
        return plan["short"].size + plan["long"].shape[0] * T

    raw = _plan(tokens, pad_long_to_quantum=False)
    best, inv_u = raw, None
    if dedup:
        uniq, iu = np.unique(tokens, axis=0, return_inverse=True)
        if uniq.shape[0] < S:
            dp = _plan(uniq, pad_long_to_quantum=True)
            if dp is not None and (raw is None or _cost(dp) < _cost(raw)):
                best, inv_u = dp, iu.astype(np.int32)
    if best is None:
        return None
    inv = best["pos"] if inv_u is None else best["pos"][inv_u]
    return {
        "short": best["short"],
        "long": best["long"],
        "inv": np.ascontiguousarray(inv.astype(np.int32)),
    }


def bucket_text_tokens_sharded(
    tokens: np.ndarray,
    n_shards: int,
    short_len: int = 16,
    capacity_quantum: int = 64,
    dedup: bool = False,
) -> Optional[Dict[str, np.ndarray]]:
    """Per-shard two-bucket partition for MESH serving
    (tvc/parallel/steps.make_serving_step's bucketed program under
    shard_map).

    ``tokens`` [S, T] flattens a batch-sharded [B, V+1, T] block b-major,
    so shard k of a ``data``-axis sharding owns the contiguous rows
    [k*g, (k+1)*g), g = S/n_shards. Each shard partitions its own rows
    like :func:`bucket_text_tokens`, but every shard uses ONE shared
    (short, long) capacity so the stacked arrays stay SPMD-uniform:
    ``n_short`` = the min over shards of per-shard short counts, quantized
    to ``capacity_quantum`` (a shard's surplus short rows overflow into
    its full-T long bucket — always valid). ``inv`` holds LOCAL indices
    (0..n_short+n_long) so the feature gather never crosses devices.

    ``dedup=True`` dedups WITHIN each shard (cross-shard dedup would need
    a collective gather at serve time): as in :func:`bucket_text_tokens`,
    both plans are costed and the cheaper wins, so dedup never regresses.

    Returns ``short`` [n_shards*n_short, short_len], ``long``
    [n_shards*n_long, T], ``inv`` [S] int32, or None when bucketing cannot
    help (T <= short_len, rows not shardable, or too few short rows)."""
    S, T = tokens.shape
    if T <= short_len or n_shards < 1 or S % n_shards != 0:
        return None
    g = S // n_shards

    def _lens(rows):
        ln = rows.argmax(-1) + 1
        nonzero = rows != 0
        content = np.where(
            nonzero.any(axis=-1), T - nonzero[:, ::-1].argmax(-1), 0
        )
        return np.maximum(ln, content)

    def _plan(shard_rows, shard_inv_u, pad_to_quantum):
        """shard_rows[k]: the rows shard k encodes (unique when dedup);
        shard_inv_u[k]: original-row -> shard-row mapping or None."""
        counts_short = []
        for rows in shard_rows:
            counts_short.append(int((_lens(rows) <= short_len).sum()))
        n_short = (min(counts_short) // capacity_quantum) * capacity_quantum
        if n_short < capacity_quantum or any(
            n_short >= r.shape[0] for r in shard_rows
        ):
            return None
        if pad_to_quantum:
            n_long = max(
                -(-(r.shape[0] - n_short) // capacity_quantum) * capacity_quantum
                for r in shard_rows
            )
        else:
            n_long = max(r.shape[0] - n_short for r in shard_rows)
        shorts, longs, invs = [], [], []
        for k, rows in enumerate(shard_rows):
            order = np.argsort(_lens(rows), kind="stable")
            pos = np.empty(rows.shape[0], dtype=np.int32)
            pos[order] = np.arange(rows.shape[0], dtype=np.int32)
            long_rows = rows[order[n_short:], :]
            if long_rows.shape[0] < n_long:
                long_rows = np.concatenate(
                    [
                        long_rows,
                        np.zeros((n_long - long_rows.shape[0], T), rows.dtype),
                    ]
                )
            shorts.append(rows[order[:n_short], :short_len])
            longs.append(long_rows)
            inv = pos if shard_inv_u[k] is None else pos[shard_inv_u[k]]
            invs.append(inv.astype(np.int32))
        return {
            "short": np.ascontiguousarray(np.concatenate(shorts)),
            "long": np.ascontiguousarray(np.concatenate(longs)),
            "inv": np.ascontiguousarray(np.concatenate(invs)),
        }

    def _cost(plan):
        return plan["short"].size + plan["long"].shape[0] * T

    raw_rows = [tokens[k * g : (k + 1) * g] for k in range(n_shards)]
    best = _plan(raw_rows, [None] * n_shards, pad_to_quantum=False)
    if dedup:
        uniq_rows, inv_us = [], []
        any_dup = False
        for rows in raw_rows:
            u, iu = np.unique(rows, axis=0, return_inverse=True)
            any_dup = any_dup or u.shape[0] < rows.shape[0]
            uniq_rows.append(u)
            inv_us.append(iu.astype(np.int32))
        if any_dup:
            dp = _plan(uniq_rows, inv_us, pad_to_quantum=True)
            if dp is not None and (best is None or _cost(dp) < _cost(best)):
                best = dp
    return best


# ---------------------------------------------------------------------------
# user-facing wrapper (the reference's implied CLIPModel API)
# ---------------------------------------------------------------------------


class CLIPModel:
    """Stateful convenience wrapper: params + jitted encode fns.

    API parity with the implied reference wrapper (SURVEY.md §2.2):
    ``encode_image``, ``encode_text``, ``encode_image_tensor``,
    ``get_text_image_similarity``, ``preprocess``, ``tokenize``.
    """

    def __init__(
        self,
        config: Optional[CLIPConfig] = None,
        params: Optional[Dict] = None,
        seed: int = 0,
        tokenizer: Optional[Callable] = None,
    ):
        self.config = config or CLIPConfig()
        # grad-safe module (einsum attention) for attacks / training; the
        # fused-attention variant below serves inference encodes only
        self.module = CLIPModule(
            dataclasses.replace(self.config, fused_attention=False)
        )
        if params is None:
            key = jax.random.PRNGKey(seed)
            dummy_img = jnp.zeros(
                (1, self.config.image_size, self.config.image_size, 3), jnp.float32
            )
            dummy_tok = jnp.zeros((1, self.config.context_length), jnp.int32)
            # jitted init: one compiled program, not per-op dispatches
            params = jax.jit(self.module.init)(key, dummy_img, dummy_tok)["params"]
        self.params = params
        if tokenizer is None:
            from tvc.models.tokenizer import get_tokenizer

            tokenizer = get_tokenizer(
                vocab_size=self.config.vocab_size,
                context_length=self.config.context_length,
            )
        self.tokenizer = tokenizer

        # inference encodes use the fused attention-LAYER vision path when
        # enabled (same param tree; no VJP, so gradients stay on self.module)
        self._infer_module = CLIPModule(self.config)
        #: public handle for building custom inference programs (NOT
        #: differentiable when config.fused_attention)
        self.inference_module = self._infer_module
        self._encode_image = jax.jit(self.infer_image_features)
        self._encode_text = jax.jit(self.infer_text_features)

    def qparams(self) -> Dict:
        """Materialized int8 serving weights (quantize_clip_params) from
        self.params — for pre-quantized hot paths that pass ``qparams``
        explicitly to ``infer_*_features`` (skips the in-trace quantize)."""
        return jax.jit(lambda p: quantize_clip_params(p, self.config))(
            self.params
        )

    # -- functional core (for attacks / pipelines) --------------------------
    def infer_image_features(
        self, params: Dict, pixels: Array, qparams: Optional[Dict] = None
    ) -> Array:
        """INFERENCE image features on CLIP-normalized pixels: the fused
        Pallas attention-layer path when config.fused_attention, else the
        standard module. Not differentiable in fused mode — gradients use
        ``image_features``.

        int8_serving: weights quantize IN-TRACE from ``params`` (XLA hoists
        this out of serving loops; never closed over as constants — closure
        constants blow the remote compiler's request limit on axon). Pass a
        pre-materialized ``qparams`` (see :meth:`qparams`) to skip the
        in-trace quantize on single-dispatch latency paths."""
        if self.config.fused_attention:
            if self.config.int8_serving:
                qp = qparams or quantize_clip_params(params, self.config)
                return vision_features_fused_i8(params, qp, self.config, pixels)
            return vision_features_fused(params, self.config, pixels)
        return self._infer_module.apply(
            {"params": params}, pixels, method=CLIPModule.encode_image
        )

    def infer_text_features(
        self, params: Dict, tokens: Array, qparams: Optional[Dict] = None
    ) -> Array:
        """INFERENCE text features: fused Pallas path when
        config.fused_attention, else the standard module. See
        ``infer_image_features`` for int8_serving/qparams semantics."""
        if self.config.fused_attention:
            if self.config.int8_serving:
                qp = qparams or quantize_clip_params(params, self.config)
                return text_features_fused_i8(params, qp, self.config, tokens)
            return text_features_fused(params, self.config, tokens)
        return self._infer_module.apply(
            {"params": params}, tokens, method=CLIPModule.encode_text
        )

    def infer_text_features_bucketed(
        self,
        params: Dict,
        short_tokens: Array,
        long_tokens: Array,
        inv_perm: Array,
        qparams: Optional[Dict] = None,
    ) -> Array:
        """Two-bucket text inference: encode the short bucket at its own
        (smaller) sequence length and the long bucket at full length, then
        gather rows back to the caller's original order via ``inv_perm``
        (built by :func:`bucket_text_tokens`).

        Why: real captions are length-skewed — ~80% of COCO
        caption/variant sequences fit 16 BPE tokens while the batch max is
        ~27, so a single-bucket encode pads everything to 32 and pays ~2x
        the text-tower FLOPs (the defended step's biggest stage). The
        tower is length-polymorphic (positional embeddings sliced to T,
        causal mask), so a sequence encodes to the SAME features at any
        padded length that keeps its EOT in-window — bucketing is exact,
        not an approximation. Replaces: the reference pads all text to the
        CLIP context (77) unconditionally via its HF processor."""
        fs = self.infer_text_features(params, short_tokens, qparams=qparams)
        fl = self.infer_text_features(params, long_tokens, qparams=qparams)
        return jnp.take(jnp.concatenate([fs, fl], axis=0), inv_perm, axis=0)

    def image_features(self, params: Dict, pixels: Array) -> Array:
        """Pure fn: CLIP-normalized pixels [B,H,W,3] -> [B,E]. Differentiable
        (this replaces the reference's encode_image_tensor(requires_grad))."""
        return self.module.apply(
            {"params": params}, pixels, method=CLIPModule.encode_image
        )

    def text_features(self, params: Dict, tokens: Array) -> Array:
        return self.module.apply(
            {"params": params}, tokens, method=CLIPModule.encode_text
        )

    # -- reference-parity convenience API ------------------------------------
    def preprocess(self, images: Sequence) -> np.ndarray:
        return preprocess_images(images, self.config.image_size)

    def tokenize(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        return self.tokenizer(texts)

    def encode_image(self, images, normalize: bool = True) -> Array:
        """PIL list or raw [0,1] pixel array -> embeddings [B, E].

        Arrays are assumed to be RAW pixels in [0, 1] (NHWC) and are
        CLIP-normalized here; for already-normalized tensors use
        ``encode_image_tensor`` (mirrors the reference's
        encode_image vs encode_image_tensor split, SURVEY.md §2.2).
        """
        if isinstance(images, (list, tuple)):
            images = self.preprocess(images)  # resize + CLIP stats
        else:
            arr = jnp.asarray(images)
            if arr.ndim == 3:
                arr = arr[None]
            images = normalize_pixels(arr)
        feats = self._encode_image(self.params, jnp.asarray(images))
        return l2_normalize(feats) if normalize else feats

    def encode_image_tensor(self, pixels: Array, normalize: bool = True) -> Array:
        """Differentiable path on already-normalized pixels (attack loop)."""
        feats = self.image_features(self.params, pixels)
        return l2_normalize(feats) if normalize else feats

    def encode_text(self, texts, normalize: bool = True) -> Array:
        if isinstance(texts, (str,)) or (
            isinstance(texts, (list, tuple)) and texts and isinstance(texts[0], str)
        ):
            tokens = self.tokenize(texts)
            # sequence bucketing: the tower is length-polymorphic, so
            # encode at the smallest 8-multiple covering the batch's real
            # tokens instead of the full 77-token context — ~4.8x fewer
            # text FLOPs at caption lengths, exact results. Shapes are
            # quantized to multiples of 8, bounding the jit cache at
            # context/8 programs. Only applied to tokens WE just built
            # (tokenizers always keep EOT in-window); caller-supplied
            # token arrays pass through untouched.
            real = int(tokens.argmax(-1).max()) + 1
            nonzero = tokens != 0
            content = int(
                np.where(
                    nonzero.any(axis=-1),
                    tokens.shape[-1] - nonzero[:, ::-1].argmax(-1),
                    0,
                ).max()
            )
            t_b = min(
                -(-max(real, content, 8) // 8) * 8, tokens.shape[-1]
            )
            tokens = tokens[:, :t_b]
        else:
            tokens = texts
        feats = self._encode_text(self.params, jnp.asarray(tokens))
        return l2_normalize(feats) if normalize else feats

    def get_text_image_similarity(self, text, image) -> Array:
        """cos(text, image) (reference src/detector.py:461-463)."""
        t = self.encode_text([text] if isinstance(text, str) else text)
        i = self.encode_image(image if isinstance(image, (list, tuple)) else [image])
        return cosine_similarity(t, i)
