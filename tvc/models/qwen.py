"""Qwen2 decoder-only LM in Flax — paraphrase generation for text variants.

The reference imports ``QwenModel.generate_paraphrases`` from the missing
src/models package (call sites: reference src/text_augment.py:281-308;
models Qwen2-{0.5B,1.5B,7B}-Instruct, src/__init__.py:116-120). This is the
TPU-native implementation: Qwen2 architecture (RMSNorm, rotary position
embeddings, grouped-query attention, SwiGLU MLP) with a KV-cached
``lax.scan`` decode loop — prefill + decode are two XLA programs, batched
over the N requested paraphrases.

Weight loading from HF safetensors is gated (zero-egress default: random
init). The tokenizer loads Qwen's vocab.json+merges.txt when present
($TVC_QWEN_TOKENIZER or HF cache), else the deterministic hash fallback.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import Array


@dataclasses.dataclass(frozen=True)
class QwenConfig:
    """Qwen2 architecture knobs (defaults: Qwen2-0.5B shape class)."""

    vocab_size: int = 151936
    hidden_size: int = 896
    intermediate_size: int = 4864
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    max_seq_len: int = 512
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    tie_embeddings: bool = True
    dtype: Any = jnp.bfloat16
    model_name: str = "Qwen/Qwen2-0.5B-Instruct"

    @classmethod
    def tiny(cls) -> "QwenConfig":
        return cls(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            max_seq_len=64,
            dtype=jnp.float32,
            model_name="tiny",
        )

    @classmethod
    def qwen2_1_5b(cls) -> "QwenConfig":
        return cls(
            hidden_size=1536, intermediate_size=8960, num_layers=28,
            num_heads=12, num_kv_heads=2, model_name="Qwen/Qwen2-1.5B-Instruct",
        )

    @classmethod
    def qwen2_7b(cls) -> "QwenConfig":
        return cls(
            hidden_size=3584, intermediate_size=18944, num_layers=28,
            num_heads=28, num_kv_heads=4, tie_embeddings=False,
            model_name="Qwen/Qwen2-7B-Instruct",
        )


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.eps)
        return (normed * scale).astype(x.dtype)


def rope(x: Array, positions: Array, theta: float) -> Array:
    """Rotary embedding. x: [B, T, H, Dh]; positions: [B, T]."""
    dh = x.shape[-1]
    half = dh // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, T, half]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class QwenAttention(nn.Module):
    cfg: QwenConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        positions: Array,
        mask: Array,
        cache: Optional[Tuple[Array, Array]] = None,
        cache_index: Optional[Array] = None,
    ):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        B, T, _ = x.shape
        q = nn.Dense(c.num_heads * head_dim, dtype=c.dtype, use_bias=True, name="q")(x)
        k = nn.Dense(c.num_kv_heads * head_dim, dtype=c.dtype, use_bias=True, name="k")(x)
        v = nn.Dense(c.num_kv_heads * head_dim, dtype=c.dtype, use_bias=True, name="v")(x)
        q = q.reshape(B, T, c.num_heads, head_dim)
        k = k.reshape(B, T, c.num_kv_heads, head_dim)
        v = v.reshape(B, T, c.num_kv_heads, head_dim)
        q = rope(q, positions, c.rope_theta)
        k = rope(k, positions, c.rope_theta)

        if cache is not None:
            # decode: insert this step's k/v at cache_index
            ck, cv = cache  # [B, S, KV, Dh]
            ck = jax.lax.dynamic_update_slice(ck, k, (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v, (0, cache_index, 0, 0))
            k, v = ck, cv
            new_cache = (ck, cv)
        else:
            new_cache = None

        # GQA: repeat kv heads
        reps = c.num_heads // c.num_kv_heads
        k = jnp.repeat(k, reps, axis=2)
        v = jnp.repeat(v, reps, axis=2)

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(head_dim)
        logits = logits + mask
        weights = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(B, T, c.num_heads * head_dim)
        out = nn.Dense(c.hidden_size, dtype=c.dtype, use_bias=False, name="o")(out)
        return out, new_cache


class QwenMLP(nn.Module):
    cfg: QwenConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.cfg
        gate = nn.Dense(c.intermediate_size, dtype=c.dtype, use_bias=False, name="gate")(x)
        up = nn.Dense(c.intermediate_size, dtype=c.dtype, use_bias=False, name="up")(x)
        return nn.Dense(c.hidden_size, dtype=c.dtype, use_bias=False, name="down")(
            nn.silu(gate) * up
        )


class QwenBlock(nn.Module):
    cfg: QwenConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache=None, cache_index=None):
        h, new_cache = QwenAttention(self.cfg, name="attn")(
            RMSNorm(self.cfg.rms_eps, name="ln_attn")(x),
            positions, mask, cache, cache_index,
        )
        x = x + h
        x = x + QwenMLP(self.cfg, name="mlp")(RMSNorm(self.cfg.rms_eps, name="ln_mlp")(x))
        return x, new_cache


class QwenLM(nn.Module):
    cfg: QwenConfig

    @nn.compact
    def __call__(
        self,
        tokens: Array,
        positions: Array,
        mask: Array,
        caches: Optional[List] = None,
        cache_index: Optional[Array] = None,
        gather_index: Optional[Array] = None,
    ):
        """gather_index [B]: compute LM-head logits only at this position
        per sample (prefill needs next-token logits at each sample's last
        real token; materializing [B, T, vocab] for large decode batches
        blows HBM — 1280 x 24 x 152k f32 is 18.7 GB)."""
        c = self.cfg
        embed = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype, name="embed")
        x = embed(tokens)
        new_caches = []
        for i in range(c.num_layers):
            cache_i = caches[i] if caches is not None else None
            x, nc = QwenBlock(c, name=f"layer_{i}")(
                x, positions, mask, cache_i, cache_index
            )
            new_caches.append(nc)
        x = RMSNorm(c.rms_eps, name="ln_f")(x)
        if gather_index is not None:
            x = jnp.take_along_axis(x, gather_index[:, None, None], axis=1)
        if c.tie_embeddings:
            logits = embed.attend(x.astype(jnp.float32))
        else:
            logits = nn.Dense(c.vocab_size, dtype=jnp.float32, use_bias=False, name="lm_head")(x)
        return logits.astype(jnp.float32), new_caches



def _stable_seed(text: str) -> int:
    """FNV-1a digest -> [0, 2^31): python hash() is randomized per process
    (PYTHONHASHSEED), which would make variant generation — and therefore
    detection scores — non-reproducible across runs."""
    h = 0xCBF29CE484222325
    for b in text.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % (2**31)

PARAPHRASE_PROMPT = (
    "Rewrite the following sentence with the same meaning but different "
    "wording.\nSentence: {text}\nRewrite:"
)

TRANSLATE_PROMPT = (
    "Translate the following sentence from {src} to {dst}. Reply with only "
    "the translation.\nSentence: {text}\nTranslation:"
)

#: ISO codes the reference's back-translation uses
#: (src/text_augment.py:78-80: de/fr/es via Helsinki-NLP pipelines)
_LANG_NAMES = {
    "en": "English",
    "de": "German",
    "fr": "French",
    "es": "Spanish",
    "zh": "Chinese",
    "ja": "Japanese",
}


class QwenModel:
    """User-facing wrapper (implied reference API, SURVEY.md §2.2):
    ``generate_paraphrases(text, num_paraphrases, temperature)``."""

    def __init__(
        self,
        config: Optional[QwenConfig] = None,
        params: Optional[Dict] = None,
        seed: int = 0,
        tokenizer: Optional[Callable] = None,
        max_new_tokens: int = 32,
        cast_params_bf16: bool = False,
        mesh=None,
    ):
        """cast_params_bf16: store matrix params in bf16 (halves HBM reads
        per decode step; norms/biases stay f32). Recommended for inference.

        mesh: optional Mesh with a 'model' axis — params get Megatron-layout
        tensor-parallel shardings (tvc/parallel/tp.py) and the decode
        program runs TP (required for Qwen2-7B on 16 GB chips)."""
        self.config = config or QwenConfig.tiny()
        self.module = QwenLM(self.config)
        self.max_new_tokens = max_new_tokens
        c = self.config
        if params is None:
            dummy = jnp.zeros((1, 4), jnp.int32)
            pos = jnp.zeros((1, 4), jnp.int32)
            mask = jnp.zeros((1, 1, 4, 4), jnp.float32)
            params = jax.jit(self.module.init)(
                jax.random.PRNGKey(seed), dummy, pos, mask
            )["params"]
        if cast_params_bf16:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16) if getattr(x, "ndim", 0) >= 2 else x,
                params,
            )
        if mesh is not None:
            from tvc.parallel.tp import shard_qwen_params

            params = shard_qwen_params(params, mesh)
        self.mesh = mesh
        self.params = params
        if tokenizer is None:
            from tvc.models.tokenizer import get_tokenizer
            import os

            merges = os.environ.get("TVC_QWEN_TOKENIZER")
            tokenizer = get_tokenizer(
                vocab_size=c.vocab_size,
                context_length=c.max_seq_len,
                merges_path=merges,
            )
        self.tokenizer = tokenizer
        self._decode_fn = None

    # -- int8 weight-only serving ----------------------------------------------
    def quantize_weights_int8(self, include_embed: bool = True) -> None:
        """Weight-only int8 for decode: per-output-channel symmetric int8
        on every 2D matrix param, dequantized to bf16 INSIDE the jitted
        decode (XLA fuses the convert into the matmul weight load).

        When to use (measured on v5e, Qwen2-0.5B shape): SMALL decode
        batches, where weight streaming dominates — and to halve weight
        memory (Qwen2-7B on a 16 GB chip). At large decode batches the
        KV cache dominates HBM traffic and int8 weights measure ~4%
        SLOWER (1280-seq batch: 18.6k vs 19.4k tok/s) — keep bf16 for
        batch-throughput serving. Activations and the KV cache stay
        bf16; the reference has no serving quantization at all (its AMP
        is attack-side training only, src/attacks/pgd_attack.py:449).

        include_embed: also quantize the [vocab, hidden] embedding table
        (27%% of Qwen2-0.5B weight bytes; tied lm-head logits then use the
        dequantized table). Not supported together with tensor-parallel
        ``mesh`` sharding."""
        if self.mesh is not None:
            raise NotImplementedError("int8 weights + TP sharding")

        def q(path, x):
            is_embed = any(getattr(p, "key", None) == "embed" for p in path)
            if getattr(x, "ndim", 0) != 2 or (is_embed and not include_embed):
                return x
            xf = jnp.asarray(x, jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(xf), axis=0), 1e-12) / 127.0
            wq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
            return {"int8": wq, "scale": s.astype(jnp.float32)}

        self.params = jax.jit(
            lambda p: jax.tree_util.tree_map_with_path(q, p)
        )(self.params)

    @staticmethod
    def _dequant(params):
        """bf16 view of a (possibly) int8-quantized param tree — a no-op
        for plain trees; called at the top of every jitted entry."""
        def dq(x):
            if isinstance(x, dict) and "int8" in x:
                return x["int8"].astype(jnp.bfloat16) * x["scale"].astype(
                    jnp.bfloat16
                )
            return x

        return jax.tree_util.tree_map(
            dq, params, is_leaf=lambda x: isinstance(x, dict) and "int8" in x
        )

    # -- compiled prefill+decode -----------------------------------------------
    def _build_decode(self, prompt_len: int, batch: int):
        c = self.config
        S = prompt_len + self.max_new_tokens
        module = self.module
        eot = getattr(self.tokenizer, "eot_id", -1)

        def decode(params, prompt_tokens, lengths, key, temperature):
            """lengths [B]: real (un-padded) prompt lengths <= prompt_len.
            Cache slots [0, plen) hold the padded prompt; generated tokens
            occupy [plen, S). Pad slots are masked out of attention; RoPE
            positions of generated tokens continue per-sample from the real
            prompt end."""
            params = QwenModel._dequant(params)  # int8 serving weights
            B = prompt_tokens.shape[0]
            positions = jnp.broadcast_to(jnp.arange(prompt_len), (B, prompt_len))
            head_dim = c.hidden_size // c.num_heads
            caches = [
                (
                    jnp.zeros((B, S, c.num_kv_heads, head_dim), c.dtype),
                    jnp.zeros((B, S, c.num_kv_heads, head_dim), c.dtype),
                )
                for _ in range(c.num_layers)
            ]
            ks = jnp.arange(S)
            # [B, 1, plen, S]: causal over the real prompt only
            prefill_mask = jnp.where(
                (ks[None, None, None, :] <= jnp.arange(prompt_len)[None, None, :, None])
                & (ks[None, None, None, :] < lengths[:, None, None, None]),
                0.0,
                -jnp.inf,
            )
            logits, caches = module.apply(
                {"params": params}, prompt_tokens, positions, prefill_mask, caches, 0,
                gather_index=lengths - 1,  # head only at the last real token
            )
            next_logits = logits[:, 0]  # [B, vocab]

            def sample(lg, k):
                return jax.lax.cond(
                    temperature > 1e-4,
                    lambda: jax.random.categorical(k, lg / jnp.maximum(temperature, 1e-4)),
                    lambda: jnp.argmax(lg, axis=-1),
                )

            def step(carry, i):
                caches, next_logits, key, done = carry
                key, sk = jax.random.split(key)
                tok = sample(next_logits, sk)  # [B]
                tok = jnp.where(done, eot, tok)
                done = done | (tok == eot)
                cache_pos = prompt_len + i  # uniform cache slot
                positions = (lengths + i)[:, None]  # per-sample RoPE position
                # keys valid: real prompt [0, len_b) or generated [plen, cache_pos]
                valid = (ks[None, :] < lengths[:, None]) | (
                    (ks[None, :] >= prompt_len) & (ks[None, :] <= cache_pos)
                )
                step_mask = jnp.where(valid, 0.0, -jnp.inf)[:, None, None, :]
                logits, caches = module.apply(
                    {"params": params}, tok[:, None], positions, step_mask,
                    caches, cache_pos,
                )
                return (caches, logits[:, 0], key, done), tok

            done0 = jnp.zeros((B,), bool)
            (_, _, _, _), tokens = jax.lax.scan(
                step,
                (caches, next_logits, key, done0),
                jnp.arange(self.max_new_tokens),
            )
            return tokens.T  # [B, max_new_tokens]

        return jax.jit(decode)

    def generate(
        self,
        prompts: List[str],
        temperature: float = 0.8,
        seed: int = 0,
    ) -> List[str]:
        """Batched prompt -> continuation decode."""
        tok = self.tokenizer(prompts)  # [B, ctx] padded
        # truncate to the longest real prompt, bucketed to a multiple of 8 so
        # nearby prompt lengths reuse one compiled decode program
        lengths = (tok != getattr(self.tokenizer, "pad_id", 0)).sum(axis=1)
        plen = min(
            -(-max(int(lengths.max()), 4) // 8) * 8,
            self.config.max_seq_len - self.max_new_tokens,
        )
        tok = tok[:, :plen]
        key_shape = (plen, tok.shape[0])
        if self._decode_fn is None or self._decode_fn[0] != key_shape:
            self._decode_fn = (key_shape, self._build_decode(plen, tok.shape[0]))
        out = self._decode_fn[1](
            self.params,
            jnp.asarray(tok),
            jnp.asarray(np.minimum(lengths, plen), jnp.int32),
            jax.random.PRNGKey(seed),
            jnp.asarray(temperature, jnp.float32),
        )
        return [self._detokenize(row) for row in np.asarray(out)]

    def _detokenize(self, ids: np.ndarray) -> str:
        eot = getattr(self.tokenizer, "eot_id", -1)
        ids = [int(i) for i in ids if int(i) != eot]
        decode = getattr(self.tokenizer, "decode", None)
        if decode is not None:
            return decode(ids)
        # hash tokenizer is not invertible: deterministic placeholder words
        return " ".join(f"tok{i}" for i in ids)

    def generate_paraphrases(
        self, text: str, num_paraphrases: int = 3, temperature: float = 0.8
    ) -> List[str]:
        """(implied reference API, text_augment.py:304-308) — N samples of the
        paraphrase prompt, batched into one decode."""
        prompts = [PARAPHRASE_PROMPT.format(text=text)] * num_paraphrases
        outs = self.generate(prompts, temperature=temperature, seed=_stable_seed(text))
        return [o.strip() for o in outs if o.strip()]

    def generate_paraphrases_batch(
        self,
        texts: List[str],
        num_paraphrases: int = 3,
        temperature: float = 0.8,
        seed: int = 0,
    ) -> List[List[str]]:
        """ALL queries' paraphrases in ONE decode batch of B*N sequences —
        the serving-throughput path (per-text seeding forced one decode
        batch per query in round 1; at 9.7k q/s ambitions variant
        generation was the unmeasured wall)."""
        n = num_paraphrases
        prompts = [PARAPHRASE_PROMPT.format(text=t) for t in texts for _ in range(n)]
        if not prompts:
            return [[] for _ in texts]
        outs = self.generate(prompts, temperature=temperature, seed=seed)
        return [
            [o.strip() for o in outs[i * n : (i + 1) * n] if o.strip()]
            for i in range(len(texts))
        ]

    def translate(
        self, texts: List[str], src: str, dst: str, temperature: float = 0.0
    ) -> List[str]:
        """Batched prompt-based translation — backs the BackTranslator
        strategy with zero extra dependencies (the reference loads
        Helsinki-NLP HF pipelines per language pair instead,
        src/text_augment.py:389-410). Greedy decode: translation wants
        fidelity, not diversity."""
        sn = _LANG_NAMES.get(src, src)
        dn = _LANG_NAMES.get(dst, dst)
        prompts = [TRANSLATE_PROMPT.format(src=sn, dst=dn, text=t) for t in texts]
        outs = self.generate(
            prompts, temperature=temperature,
            seed=_stable_seed(f"{src}->{dst}:" + "\x00".join(texts)),
        )
        # keep positional alignment: round-trips pair output i with input i
        return [o.strip() or texts[i] for i, o in enumerate(outs)]

    def as_translator(self):
        """Callable ``(texts, src, dst) -> list[str]`` for the
        TextAugmenter/BackTranslator injection point."""
        return self.translate

    def as_paraphrase_generator(self) -> "ParaphraseAdapter":
        """Adapter for TextAugmenter's paraphrase_generator injection point
        (callable ``(text, n)`` with a ``batch(texts, n)`` fast path)."""
        return ParaphraseAdapter(self)


class ParaphraseAdapter:
    """Callable ``(text, n) -> list[str]`` plus ``batch(texts, n)`` so the
    TextAugmenter can run one decode across a whole query batch."""

    def __init__(self, model: QwenModel, temperature: float = 0.8):
        self.model = model
        self.temperature = temperature

    def __call__(self, text: str, n: int) -> List[str]:
        return self.model.generate_paraphrases(text, n, self.temperature)

    def batch(self, texts: List[str], n: int) -> List[List[str]]:
        return self.model.generate_paraphrases_batch(
            texts, n, self.temperature, seed=_stable_seed("\x00".join(texts))
        )
