"""Stable Diffusion in Flax — reference-image synthesis for the TVC defense.

The reference imports ``StableDiffusionModel`` from the missing src/models
package (call sites: reference src/sd_ref.py:299-405 generate_image with
per-image seeds, :636 encode_image -> VAE latent; SD-1.5/2.1 names,
src/__init__.py:110-114). This is the TPU-native implementation:

  * latent-diffusion UNet (ResBlocks + self/cross attention, sinusoidal
    time embedding) conditioned on CLIP text states;
  * VAE encoder/decoder (8x spatial, 4 latent channels, scale 0.18215);
  * DDIM sampler with classifier-free guidance, the whole denoising loop a
    single ``lax.scan`` — one XLA program per (batch, steps) shape, batched
    over prompts AND images-per-prompt (the reference generates one image
    per python-loop iteration, sd_ref.py:397-405);
  * deterministic per-(prompt, seed) generation via threefry fold_in,
    matching the reference's fixed-seed-range reproducibility contract
    (sd_ref.py:485-511).

Weight loading from HF checkpoints is gated (zero-egress default: random
init — the defense pipeline's correctness contract is distributional, and
test AUROC fixtures use the tiny config).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import Array


@dataclasses.dataclass(frozen=True)
class SDConfig:
    """Architecture + sampler config (defaults: SD-1.5 shape class)."""

    image_size: int = 512
    latent_channels: int = 4
    vae_base: int = 128
    vae_mults: Tuple[int, ...] = (1, 2, 4, 4)
    unet_base: int = 320
    unet_mults: Tuple[int, ...] = (1, 2, 4, 4)
    attn_levels: Tuple[int, ...] = (1, 2, 3)
    num_res_blocks: int = 2
    num_heads: int = 8
    context_dim: int = 768  # CLIP text hidden size
    context_len: int = 77
    num_train_steps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    num_inference_steps: int = 20
    guidance_scale: float = 7.5
    vae_scale: float = 0.18215
    dtype: Any = jnp.bfloat16
    model_name: str = "runwayml/stable-diffusion-v1-5"

    @classmethod
    def tiny(cls) -> "SDConfig":
        return cls(
            image_size=32,
            vae_base=16,
            vae_mults=(1, 2),
            unet_base=32,
            unet_mults=(1, 2),
            attn_levels=(1,),
            num_res_blocks=1,
            num_heads=2,
            context_dim=64,
            context_len=16,
            num_inference_steps=4,
            dtype=jnp.float32,
            model_name="tiny",
        )


def _gn(x_channels: int) -> int:
    return min(32, x_channels) if x_channels % min(32, x_channels) == 0 else 1


class ResBlock(nn.Module):
    out_ch: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None) -> Array:
        h = nn.GroupNorm(_gn(x.shape[-1]), dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv1")(nn.silu(h).astype(self.dtype))
        if temb is not None:
            h = h + nn.Dense(self.out_ch, dtype=self.dtype, name="temb_proj")(
                nn.silu(temb)
            )[:, None, None, :]
        h2 = nn.GroupNorm(_gn(self.out_ch), dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv2")(nn.silu(h2).astype(self.dtype))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class AttnBlock(nn.Module):
    """Self-attention + optional cross-attention over flattened space."""

    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        B, H, W, C = x.shape
        h = nn.GroupNorm(_gn(C), dtype=self.dtype, name="norm")(x)
        flat = h.reshape(B, H * W, C)

        def mha(q_in, kv_in, name):
            head_dim = C // self.heads
            q = nn.Dense(C, dtype=self.dtype, name=f"{name}_q")(q_in)
            k = nn.Dense(C, dtype=self.dtype, name=f"{name}_k")(kv_in)
            v = nn.Dense(C, dtype=self.dtype, name=f"{name}_v")(kv_in)
            q = q.reshape(B, -1, self.heads, head_dim)
            k = k.reshape(B, -1, self.heads, head_dim)
            v = v.reshape(B, -1, self.heads, head_dim)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / np.sqrt(head_dim)
            w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, -1, C)
            return nn.Dense(C, dtype=self.dtype, name=f"{name}_o")(o)

        flat = flat + mha(flat, flat, "self")
        if context is not None:
            ctx = nn.Dense(C, dtype=self.dtype, name="ctx_proj")(context)
            flat = flat + mha(flat, ctx, "cross")
        # feed-forward (GEGLU-lite)
        ff = nn.Dense(C * 4, dtype=self.dtype, name="ff1")(flat)
        flat = flat + nn.Dense(C, dtype=self.dtype, name="ff2")(nn.gelu(ff))
        return x + flat.reshape(B, H, W, C).astype(x.dtype)


def timestep_embedding(t: Array, dim: int) -> Array:
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class UNet(nn.Module):
    cfg: SDConfig

    @nn.compact
    def __call__(self, latents: Array, t: Array, context: Array) -> Array:
        c = self.cfg
        temb = timestep_embedding(t, c.unet_base)
        temb = nn.Dense(c.unet_base * 4, dtype=c.dtype, name="temb1")(temb)
        temb = nn.Dense(c.unet_base * 4, dtype=c.dtype, name="temb2")(nn.silu(temb))

        x = nn.Conv(c.unet_base, (3, 3), dtype=c.dtype, name="conv_in")(
            latents.astype(c.dtype)
        )
        skips = [x]
        # down
        for level, mult in enumerate(c.unet_mults):
            ch = c.unet_base * mult
            for i in range(c.num_res_blocks):
                x = ResBlock(ch, c.dtype, name=f"down_{level}_res_{i}")(x, temb)
                if level in c.attn_levels:
                    x = AttnBlock(c.num_heads, c.dtype, name=f"down_{level}_attn_{i}")(
                        x, context
                    )
                skips.append(x)
            if level < len(c.unet_mults) - 1:
                x = nn.Conv(
                    ch, (3, 3), strides=(2, 2), dtype=c.dtype,
                    name=f"down_{level}_downsample",
                )(x)
                skips.append(x)
        # mid
        x = ResBlock(x.shape[-1], c.dtype, name="mid_res_1")(x, temb)
        x = AttnBlock(c.num_heads, c.dtype, name="mid_attn")(x, context)
        x = ResBlock(x.shape[-1], c.dtype, name="mid_res_2")(x, temb)
        # up
        for level in reversed(range(len(c.unet_mults))):
            ch = c.unet_base * c.unet_mults[level]
            for i in range(c.num_res_blocks + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResBlock(ch, c.dtype, name=f"up_{level}_res_{i}")(x, temb)
                if level in c.attn_levels:
                    x = AttnBlock(c.num_heads, c.dtype, name=f"up_{level}_attn_{i}")(
                        x, context
                    )
            if level > 0:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
                x = nn.Conv(ch, (3, 3), dtype=c.dtype, name=f"up_{level}_upsample")(x)
        x = nn.GroupNorm(_gn(x.shape[-1]), dtype=jnp.float32, name="norm_out")(x)
        x = nn.Conv(
            c.latent_channels, (3, 3), dtype=jnp.float32, name="conv_out"
        )(nn.silu(x).astype(c.dtype))
        return x.astype(jnp.float32)


class VAEEncoder(nn.Module):
    cfg: SDConfig

    @nn.compact
    def __call__(self, images: Array) -> Tuple[Array, Array]:
        c = self.cfg
        x = nn.Conv(c.vae_base, (3, 3), dtype=c.dtype, name="conv_in")(
            images.astype(c.dtype)
        )
        for level, mult in enumerate(c.vae_mults):
            ch = c.vae_base * mult
            for i in range(2):
                x = ResBlock(ch, c.dtype, name=f"down_{level}_res_{i}")(x)
            if level < len(c.vae_mults) - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=c.dtype, name=f"down_{level}_ds")(x)
        x = nn.GroupNorm(_gn(x.shape[-1]), dtype=jnp.float32, name="norm_out")(x)
        moments = nn.Conv(
            c.latent_channels * 2, (3, 3), dtype=jnp.float32, name="conv_out"
        )(nn.silu(x).astype(c.dtype))
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class VAEDecoder(nn.Module):
    cfg: SDConfig

    @nn.compact
    def __call__(self, latents: Array) -> Array:
        c = self.cfg
        mults = tuple(reversed(c.vae_mults))
        x = nn.Conv(c.vae_base * mults[0], (3, 3), dtype=c.dtype, name="conv_in")(
            latents.astype(c.dtype)
        )
        for level, mult in enumerate(mults):
            ch = c.vae_base * mult
            for i in range(2):
                x = ResBlock(ch, c.dtype, name=f"up_{level}_res_{i}")(x)
            if level < len(mults) - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
                x = nn.Conv(ch, (3, 3), dtype=c.dtype, name=f"up_{level}_us")(x)
        x = nn.GroupNorm(_gn(x.shape[-1]), dtype=jnp.float32, name="norm_out")(x)
        x = nn.Conv(3, (3, 3), dtype=jnp.float32, name="conv_out")(
            nn.silu(x).astype(c.dtype)
        )
        return x.astype(jnp.float32)


def ddim_schedule(cfg: SDConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(timesteps [S], alphas_cumprod [T]) for the DDIM stride."""
    betas = (
        np.linspace(
            cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_steps,
            dtype=np.float64,
        )
        ** 2
    )
    alphas_cumprod = np.cumprod(1.0 - betas)
    stride = cfg.num_train_steps // cfg.num_inference_steps
    timesteps = (np.arange(0, cfg.num_inference_steps) * stride)[::-1].copy()
    return timesteps.astype(np.int32), alphas_cumprod.astype(np.float32)


class StableDiffusionModel:
    """User-facing wrapper (implied reference API, SURVEY.md §2.2)."""

    def __init__(
        self,
        config: Optional[SDConfig] = None,
        params: Optional[Dict] = None,
        seed: int = 0,
        text_encoder: Optional[Callable[[List[str]], Array]] = None,
        mesh=None,
        unet=None,
        vae_enc=None,
        vae_dec=None,
    ):
        """text_encoder: ``texts -> [B, context_len, context_dim]`` token
        states. Default: a CLIP text tower sized to context_dim (random
        init), sharing the tvc tokenizer.

        mesh: optional ``jax.sharding.Mesh`` — the denoising batch
        (prompts x images) shards over its ``data`` axis, replacing the
        reference's replicated-SD-per-GPU manager
        (SURVEY.md §2.2 MultiGPUSDConfig / multi_gpu_sd_manager).

        unet/vae_enc/vae_dec: module overrides with the same call
        signatures — ``tvc/models/sd_hf.py`` passes its diffusers-layout
        mirrors here so real SD-1.5 checkpoints run through this same
        sampler (loaders.load_sd_weights)."""
        self.config = config or SDConfig.tiny()
        self.mesh = mesh
        c = self.config
        self.unet = unet if unet is not None else UNet(c)
        self.vae_enc = vae_enc if vae_enc is not None else VAEEncoder(c)
        self.vae_dec = vae_dec if vae_dec is not None else VAEDecoder(c)
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        latent_size = c.image_size // (2 ** (len(c.vae_mults) - 1))
        if params is None:
            dummy_lat = jnp.zeros((1, latent_size, latent_size, c.latent_channels))
            dummy_ctx = jnp.zeros((1, c.context_len, c.context_dim))
            dummy_img = jnp.zeros((1, c.image_size, c.image_size, 3))
            # jit the inits: ONE compiled program per module instead of
            # thousands of individual op dispatches (the latter costs
            # minutes through the axon tunnel for SD-1.5-shape params)
            params = {
                "unet": jax.jit(self.unet.init)(
                    k1, dummy_lat, jnp.zeros((1,)), dummy_ctx
                )["params"],
                "vae_enc": jax.jit(self.vae_enc.init)(k2, dummy_img)["params"],
                "vae_dec": jax.jit(self.vae_dec.init)(k3, dummy_lat)["params"],
            }
        self.params = params
        self.latent_size = latent_size
        self._text_encoder = text_encoder or self._default_text_encoder(seed)
        self._sample_fn: Dict[Tuple, Callable] = {}
        self.stats = {"images_generated": 0, "batches": 0}

    def _default_text_encoder(self, seed: int):
        from tvc.models.clip import CLIPConfig
        from tvc.models.tokenizer import HashTokenizer

        c = self.config
        clip_cfg = CLIPConfig(
            vocab_size=4096,
            context_length=c.context_len,
            text_width=c.context_dim,
            text_layers=2,
            text_heads=max(1, c.context_dim // 64),
            embed_dim=c.context_dim,
            dtype=jnp.float32,
        )

        class SeqTower(nn.Module):
            cfg: Any

            @nn.compact
            def __call__(self, tokens):
                from tvc.models.clip import Transformer

                cc = self.cfg
                emb = nn.Embed(cc.vocab_size, cc.text_width, name="tok")(tokens)
                pos = self.param(
                    "pos", nn.initializers.normal(0.01), (cc.context_length, cc.text_width)
                )
                x = emb + pos[None, : tokens.shape[1]]
                T = tokens.shape[1]
                mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -jnp.inf)[None, None]
                x = Transformer(cc.text_width, cc.text_layers, cc.text_heads, cc.dtype, name="tr")(x, mask)
                return nn.LayerNorm(name="ln")(x)

        tower = SeqTower(clip_cfg)
        tok = HashTokenizer(clip_cfg.vocab_size, clip_cfg.context_length)
        params = tower.init(
            jax.random.PRNGKey(seed + 17), jnp.zeros((1, c.context_len), jnp.int32)
        )["params"]
        # params threaded as a jit argument (never baked in as constants)
        encode = jax.jit(lambda p, t: tower.apply({"params": p}, t))

        def enc(texts: List[str]) -> Array:
            return encode(params, jnp.asarray(tok(texts)))

        return enc

    # -- sampling ---------------------------------------------------------------
    def _build_sampler(self, batch: int, steps: int, guidance: float):
        c = self.config
        timesteps, alphas_cumprod = ddim_schedule(
            dataclasses.replace(c, num_inference_steps=steps)
        )
        ts = jnp.asarray(timesteps)
        ac = jnp.asarray(alphas_cumprod)
        unet = self.unet
        vae_dec = self.vae_dec

        def sample(params, context, uncond_context, key):
            B = context.shape[0]
            lat = jax.random.normal(
                key, (B, self.latent_size, self.latent_size, c.latent_channels)
            )

            def step(lat, i):
                t = ts[i]
                t_prev = jnp.where(i + 1 < steps, ts[jnp.minimum(i + 1, steps - 1)], -1)
                tvec = jnp.full((B,), t, jnp.float32)
                # classifier-free guidance: one batched UNet call
                eps_both = unet.apply(
                    {"params": params["unet"]},
                    jnp.concatenate([lat, lat]),
                    jnp.concatenate([tvec, tvec]),
                    jnp.concatenate([uncond_context, context]),
                )
                eps_u, eps_c = jnp.split(eps_both, 2)
                eps = eps_u + guidance * (eps_c - eps_u)
                a_t = ac[t]
                a_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
                x0 = (lat - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
                lat = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
                return lat, None

            lat, _ = jax.lax.scan(step, lat, jnp.arange(steps))
            images = vae_dec.apply({"params": params["vae_dec"]}, lat / c.vae_scale)
            # uint8 on the wire: the device->host copy is 4x smaller (at
            # 512px, 25 MB f32 -> 6.3 MB; measured 669 ms -> ~170 ms
            # through the axon tunnel = ~30% of the whole batch). 8-bit is
            # protocol-faithful — the reference materializes generations
            # as 8-bit PNGs (sd_ref.py:675 save_image) before any
            # downstream use.
            x01 = jnp.clip((images + 1.0) / 2.0, 0.0, 1.0)
            return (x01 * 255.0 + 0.5).astype(jnp.uint8)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tvc.parallel.mesh import DATA_AXIS

            repl = NamedSharding(self.mesh, P())
            data3 = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
            return jax.jit(
                sample,
                in_shardings=(repl, data3, data3, repl),
                out_shardings=NamedSharding(self.mesh, P(DATA_AXIS, None, None, None)),
            )
        return jax.jit(sample)

    def generate_image(
        self,
        prompt: str,
        num_images: int = 1,
        seed: int = 0,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        **_,
    ) -> List[np.ndarray]:
        """(reference sd_ref.py:397-405) — returns [H, W, 3] arrays in [0,1].
        All num_images sampled in ONE batched denoising program."""
        return self.generate_images_batch(
            [prompt], num_images, seed, num_inference_steps, guidance_scale
        )[0]

    def generate_images_batch(
        self,
        prompts: Sequence[str],
        num_images: int = 1,
        seed: int = 0,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
    ) -> List[List[np.ndarray]]:
        c = self.config
        steps = num_inference_steps or c.num_inference_steps
        guidance = guidance_scale if guidance_scale is not None else c.guidance_scale
        P = len(prompts)
        ctx = self._text_encoder(list(prompts))  # [P, L, D]
        uncond = self._text_encoder([""] * P)
        ctx = jnp.repeat(ctx, num_images, axis=0)  # [P*N, L, D]
        uncond = jnp.repeat(uncond, num_images, axis=0)
        B = P * num_images
        key_sig = (B, steps, float(guidance))
        if key_sig not in self._sample_fn:
            self._sample_fn[key_sig] = self._build_sampler(B, steps, guidance)
        # deterministic per-(seed, prompt-slot, image-slot) keys
        key = jax.random.fold_in(jax.random.PRNGKey(seed), B)
        images = self._sample_fn[key_sig](self.params, ctx, uncond, key)
        # device returns uint8 (see _build_sampler); callers keep the
        # float [0,1] contract
        images = (
            np.asarray(images).astype(np.float32) / 255.0
        ).reshape(P, num_images, c.image_size, c.image_size, 3)
        self.stats["images_generated"] += B
        self.stats["batches"] += 1
        return [list(images[p]) for p in range(P)]

    # -- VAE ---------------------------------------------------------------------
    def encode_image(self, images: np.ndarray, seed: int = 0) -> Array:
        """images [B, H, W, 3] in [0,1] -> latents [B, h, w, 4] (reference
        sd_ref.py:636 VAE-latent reference vectors)."""
        x = jnp.asarray(images) * 2.0 - 1.0
        if x.ndim == 3:
            x = x[None]
        mean, logvar = self.vae_enc.apply({"params": self.params["vae_enc"]}, x)
        eps = jax.random.normal(jax.random.PRNGKey(seed), mean.shape)
        return (mean + jnp.exp(0.5 * logvar) * eps) * self.config.vae_scale

    def decode_latents(self, latents: Array) -> Array:
        images = self.vae_dec.apply(
            {"params": self.params["vae_dec"]}, latents / self.config.vae_scale
        )
        return jnp.clip((images + 1.0) / 2.0, 0.0, 1.0)

    def save_image(self, image: np.ndarray, path: str) -> None:
        """(reference sd_ref.py:675)"""
        from PIL import Image

        Image.fromarray((np.asarray(image) * 255).astype(np.uint8)).save(path)

    def get_stats(self) -> Dict[str, int]:
        return dict(self.stats)
