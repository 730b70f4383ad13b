"""HF/diffusers-layout Stable Diffusion UNet + VAE in Flax.

tvc's native UNet (tvc/models/sd.py) is an independent TPU-first
architecture, so diffusers checkpoints cannot map onto it. THIS module is
the weight-compatibility path (round-1 VERDICT missing item 4): a Flax
mirror of diffusers' ``UNet2DConditionModel`` / ``AutoencoderKL`` at the
SD-1.5 configuration, param-tree-shaped so ``tvc/models/loaders.
convert_sd_unet_state_dict`` / ``convert_sd_vae_state_dict`` map a
``runwayml/stable-diffusion-v1-5`` state dict onto it key-for-key
(reference contract: src/sd_ref.py:299-405, src/__init__.py:110-114).

Architecture semantics mirrored from diffusers (documented per block):

* ``ResnetBlock2D``: GN32(eps 1e-5) -> silu -> conv1 -> (+time_emb_proj
  (silu(temb))) -> GN32 -> silu -> conv2, 1x1 conv_shortcut when channels
  change.
* ``Transformer2DModel``: GN32(eps **1e-6**) -> 1x1 proj_in (SD-1.5 uses
  use_linear_projection=False) -> BasicTransformerBlock(s) -> 1x1
  proj_out, residual from the *pre-norm* input.
* ``BasicTransformerBlock``: x += attn1(LN(x)) (self); x += attn2(LN(x),
  context) (cross); x += FF(LN(x)) with GEGLU (proj to 8C, split,
  ``hidden * gelu(gate)``, project 4C -> C). Attention q/k/v have no bias;
  out projection does. SD-1.5's ``attention_head_dim=8`` historically
  means **8 heads** (diffusers preserves the bug: num_attention_heads :=
  attention_head_dim).
* Timesteps: [cos | sin] ordering (flip_sin_to_cos=True,
  downscale_freq_shift=0) -> linear_1 -> silu -> linear_2.
* UNet Downsample2D: 3x3 stride-2 conv, SAME-1 padding. VAE encoder
  Downsample2D: **asymmetric** (0,1,0,1) pad then VALID stride-2 conv.
* Upsample2D: nearest x2 then 3x3 conv.
* VAE mid attention: single-head spatial attention with group_norm and
  to_q/to_k/to_v/to_out (biased).

Everything is NHWC internally (TPU-native); the converter transposes
checkpoint OIHW conv kernels to HWIO once at load time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import Array


@dataclasses.dataclass(frozen=True)
class HFUNetConfig:
    """Mirror of the UNet2DConditionModel config subset SD-1.x/2.x use."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    #: which down blocks are CrossAttnDownBlock2D (SD-1.5: all but the last)
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    attention_heads: int = 8  # SD-1.5 "attention_head_dim": 8 == 8 heads
    cross_attention_dim: int = 768
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @classmethod
    def tiny(cls) -> "HFUNetConfig":
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attn_blocks=(True, False),
            attention_heads=2,
            cross_attention_dim=32,
            dtype=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class HFVAEConfig:
    """Mirror of AutoencoderKL config (SD-1.5 defaults)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_eps: float = 1e-6
    scaling_factor: float = 0.18215
    dtype: Any = jnp.bfloat16

    @classmethod
    def tiny(cls) -> "HFVAEConfig":
        return cls(
            block_out_channels=(32, 64), layers_per_block=1, dtype=jnp.float32
        )


def hf_timestep_embedding(t: Array, dim: int) -> Array:
    """diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0):
    [cos | sin]."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class HFResnetBlock(nn.Module):
    """diffusers ResnetBlock2D."""

    out_ch: int
    eps: float
    dtype: Any
    with_temb: bool = True

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None) -> Array:
        h = nn.GroupNorm(32, epsilon=self.eps, dtype=jnp.float32, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv1")(
            nn.silu(h).astype(self.dtype)
        )
        if self.with_temb and temb is not None:
            h = h + nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )[:, None, None, :]
        h = nn.GroupNorm(32, epsilon=self.eps, dtype=jnp.float32, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv2")(
            nn.silu(h).astype(self.dtype)
        )
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(
                self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class HFCrossAttention(nn.Module):
    """diffusers Attention: to_q/to_k/to_v (no bias) + to_out_0 (bias)."""

    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        C = x.shape[-1]
        kv = x if context is None else context
        head_dim = C // self.heads
        q = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_k")(kv)
        v = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_v")(kv)
        B = x.shape[0]
        q = q.reshape(B, -1, self.heads, head_dim)
        k = k.reshape(B, -1, self.heads, head_dim)
        v = v.reshape(B, -1, self.heads, head_dim)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(head_dim)
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, -1, C)
        return nn.Dense(C, dtype=self.dtype, name="to_out_0")(o)


class HFBasicTransformerBlock(nn.Module):
    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + HFCrossAttention(self.heads, self.dtype, name="attn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        x = x + HFCrossAttention(self.heads, self.dtype, name="attn2")(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        C = x.shape[-1]
        # GEGLU: proj to 8C, split into (hidden, gate), hidden * gelu(gate)
        hg = nn.Dense(C * 8, dtype=self.dtype, name="ff_net_0_proj")(h)
        hidden, gate = jnp.split(hg, 2, axis=-1)
        ff = hidden * nn.gelu(gate.astype(jnp.float32)).astype(self.dtype)
        return x + nn.Dense(C, dtype=self.dtype, name="ff_net_2")(ff)


class HFTransformer2D(nn.Module):
    """diffusers Transformer2DModel (use_linear_projection=False)."""

    heads: int
    eps: float
    dtype: Any
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h.astype(self.dtype))
        h = h.reshape(B, H * W, C)
        for i in range(self.num_layers):
            h = HFBasicTransformerBlock(
                self.heads, self.dtype, name=f"transformer_blocks_{i}"
            )(h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class HFUNet(nn.Module):
    """diffusers UNet2DConditionModel at the SD-1.x layout.

    ``__call__(latents [B,h,w,4] NHWC, t [B], context [B,T,ctx]) -> eps``.
    """

    cfg: HFUNetConfig

    @nn.compact
    def __call__(self, latents: Array, t: Array, context: Array) -> Array:
        c = self.cfg
        ch0 = c.block_out_channels[0]
        temb_dim = ch0 * 4
        temb = hf_timestep_embedding(t, ch0)
        temb = nn.Dense(temb_dim, dtype=c.dtype, name="time_embedding_linear_1")(temb)
        temb = nn.Dense(temb_dim, dtype=c.dtype, name="time_embedding_linear_2")(
            nn.silu(temb)
        )
        context = context.astype(c.dtype)

        x = nn.Conv(ch0, (3, 3), dtype=c.dtype, name="conv_in")(
            latents.astype(c.dtype)
        )
        skips = [x]
        n_blocks = len(c.block_out_channels)
        # down
        for bi, ch in enumerate(c.block_out_channels):
            for li in range(c.layers_per_block):
                x = HFResnetBlock(
                    ch, c.norm_eps, c.dtype,
                    name=f"down_blocks_{bi}_resnets_{li}",
                )(x, temb)
                if c.cross_attn_blocks[bi]:
                    x = HFTransformer2D(
                        c.attention_heads, c.norm_eps, c.dtype,
                        name=f"down_blocks_{bi}_attentions_{li}",
                    )(x, context)
                skips.append(x)
            if bi < n_blocks - 1:
                x = nn.Conv(
                    ch, (3, 3), strides=(2, 2), dtype=c.dtype,
                    name=f"down_blocks_{bi}_downsamplers_0_conv",
                )(x)
                skips.append(x)
        # mid
        mid_ch = c.block_out_channels[-1]
        x = HFResnetBlock(mid_ch, c.norm_eps, c.dtype, name="mid_block_resnets_0")(x, temb)
        x = HFTransformer2D(
            c.attention_heads, c.norm_eps, c.dtype, name="mid_block_attentions_0"
        )(x, context)
        x = HFResnetBlock(mid_ch, c.norm_eps, c.dtype, name="mid_block_resnets_1")(x, temb)
        # up (reversed channels; layers_per_block + 1 resnets per block)
        for ui, bi in enumerate(reversed(range(n_blocks))):
            ch = c.block_out_channels[bi]
            for li in range(c.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = HFResnetBlock(
                    ch, c.norm_eps, c.dtype, name=f"up_blocks_{ui}_resnets_{li}"
                )(x, temb)
                if c.cross_attn_blocks[bi]:
                    x = HFTransformer2D(
                        c.attention_heads, c.norm_eps, c.dtype,
                        name=f"up_blocks_{ui}_attentions_{li}",
                    )(x, context)
            if bi > 0:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
                x = nn.Conv(
                    ch, (3, 3), dtype=c.dtype, name=f"up_blocks_{ui}_upsamplers_0_conv"
                )(x)
        x = nn.GroupNorm(32, epsilon=c.norm_eps, dtype=jnp.float32, name="conv_norm_out")(x)
        x = nn.Conv(c.out_channels, (3, 3), dtype=jnp.float32, name="conv_out")(
            nn.silu(x).astype(c.dtype)
        )
        return x.astype(jnp.float32)


class HFVAEAttention(nn.Module):
    """AutoencoderKL mid-block attention: single-head spatial attention
    with group_norm; q/k/v/out all biased."""

    eps: float
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        h = nn.GroupNorm(32, epsilon=self.eps, dtype=jnp.float32, name="group_norm")(x)
        flat = h.reshape(B, H * W, C).astype(self.dtype)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(flat)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(flat)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(flat)
        logits = jnp.einsum(
            "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(C)
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum("bqk,bkc->bqc", w, v)
        o = nn.Dense(C, dtype=self.dtype, name="to_out_0")(o)
        return x + o.reshape(B, H, W, C).astype(x.dtype)


class HFVAEEncoder(nn.Module):
    """AutoencoderKL.encoder + quant_conv: images -> (mean, logvar)."""

    cfg: HFVAEConfig

    @nn.compact
    def __call__(self, images: Array) -> Tuple[Array, Array]:
        c = self.cfg
        x = nn.Conv(c.block_out_channels[0], (3, 3), dtype=c.dtype, name="conv_in")(
            images.astype(c.dtype)
        )
        n = len(c.block_out_channels)
        for bi, ch in enumerate(c.block_out_channels):
            for li in range(c.layers_per_block):
                x = HFResnetBlock(
                    ch, c.norm_eps, c.dtype, with_temb=False,
                    name=f"down_blocks_{bi}_resnets_{li}",
                )(x)
            if bi < n - 1:
                # VAE Downsample2D: asymmetric (0,1,0,1) pad + VALID stride-2
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding="VALID", dtype=c.dtype,
                    name=f"down_blocks_{bi}_downsamplers_0_conv",
                )(x)
        ch = c.block_out_channels[-1]
        x = HFResnetBlock(ch, c.norm_eps, c.dtype, with_temb=False, name="mid_block_resnets_0")(x)
        x = HFVAEAttention(c.norm_eps, c.dtype, name="mid_block_attentions_0")(x)
        x = HFResnetBlock(ch, c.norm_eps, c.dtype, with_temb=False, name="mid_block_resnets_1")(x)
        x = nn.GroupNorm(32, epsilon=c.norm_eps, dtype=jnp.float32, name="conv_norm_out")(x)
        x = nn.Conv(
            c.latent_channels * 2, (3, 3), dtype=jnp.float32, name="conv_out"
        )(nn.silu(x).astype(c.dtype))
        moments = nn.Conv(
            c.latent_channels * 2, (1, 1), dtype=jnp.float32, name="quant_conv"
        )(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class HFVAEDecoder(nn.Module):
    """post_quant_conv + AutoencoderKL.decoder: latents -> images [-1, 1]."""

    cfg: HFVAEConfig

    @nn.compact
    def __call__(self, latents: Array) -> Array:
        c = self.cfg
        x = nn.Conv(
            c.latent_channels, (1, 1), dtype=jnp.float32, name="post_quant_conv"
        )(latents)
        chs = tuple(reversed(c.block_out_channels))
        x = nn.Conv(chs[0], (3, 3), dtype=c.dtype, name="conv_in")(x.astype(c.dtype))
        x = HFResnetBlock(chs[0], c.norm_eps, c.dtype, with_temb=False, name="mid_block_resnets_0")(x)
        x = HFVAEAttention(c.norm_eps, c.dtype, name="mid_block_attentions_0")(x)
        x = HFResnetBlock(chs[0], c.norm_eps, c.dtype, with_temb=False, name="mid_block_resnets_1")(x)
        n = len(chs)
        for bi, ch in enumerate(chs):
            for li in range(c.layers_per_block + 1):
                x = HFResnetBlock(
                    ch, c.norm_eps, c.dtype, with_temb=False,
                    name=f"up_blocks_{bi}_resnets_{li}",
                )(x)
            if bi < n - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
                x = nn.Conv(
                    ch, (3, 3), dtype=c.dtype, name=f"up_blocks_{bi}_upsamplers_0_conv"
                )(x)
        x = nn.GroupNorm(32, epsilon=c.norm_eps, dtype=jnp.float32, name="conv_norm_out")(x)
        x = nn.Conv(c.out_channels, (3, 3), dtype=jnp.float32, name="conv_out")(
            nn.silu(x).astype(c.dtype)
        )
        return x.astype(jnp.float32)
