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

from tvc.core.pallas.decode_attention_kernel import decode_gqa_attention_stacked
from tvc.core.pallas.w8_matmul_kernel import (
    w8_matmul,
    w8_matmul_stacked,
    w8a8_matmul,
    w8a8_matmul_stacked,
)


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
    #: which Pallas GEMM serves int8 weight leaves in the merged decode:
    #: "w8" streams int8 weights and dequants in-register (weight-only);
    #: "w8a8" also dynamically quantizes activations per-row and runs the
    #: MXU's native s8xs8->s32 (~1.5x the bf16 rate on v5e) — the CLIP
    #: serving scheme (quantized_layer_kernel.py, LLM.int8 lineage)
    quant_gemm: str = "w8"

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

        # GQA without materializing repeated KV: q regrouped to
        # [B, T, KV, reps, Dh] contracts against k/v [B, S, KV, Dh]
        # directly. jnp.repeat costs real HBM traffic at decode: at
        # B=1280, S=64 the repeated KV is 7 GB/step of reads (measured
        # 100 ms/step before; the roofline is ~10 ms).
        reps = c.num_heads // c.num_kv_heads
        qg = q.reshape(B, T, c.num_kv_heads, reps, head_dim)
        logits = jnp.einsum(
            "btkrd,bskd->bkrts", qg, k, preferred_element_type=jnp.float32
        ) / np.sqrt(head_dim)
        logits = logits + mask[:, 0][:, None, None]  # [B,1,1,T,S]
        weights = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        out = jnp.einsum("bkrts,bskd->btkrd", weights, v)
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



#: early-exit decode granularity: the decode while_loop checks the
#: all-sequences-done flag every DECODE_CHUNK steps (see _build_decode).
#: Applied when max_new_tokens is a larger multiple of it.
DECODE_CHUNK = 4


def _stable_seed(text: str) -> int:
    """FNV-1a digest -> [0, 2^31): python hash() is randomized per process
    (PYTHONHASHSEED), which would make variant generation — and therefore
    detection scores — non-reproducible across runs."""
    h = 0xCBF29CE484222325
    for b in text.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % (2**31)

#: the instruction prefix is IDENTICAL across every paraphrase prompt in a
#: batch — generate_async prefills its KV once at batch 1 and broadcasts
#: (prefix-shared prefill; the prefix is ~40% of the prompt tokens at COCO
#: caption lengths). The split point sits on a byte-level-BPE pretokenizer
#: boundary (prefix ends ':', suffix starts ' '), so
#: tokenize(prefix) + tokenize(suffix) == tokenize(prefix + suffix)
#: exactly (checked at runtime per call; test_qwen_sd.py asserts it over
#: real COCO captions).
PARAPHRASE_PREFIX = (
    "Rewrite the following sentence with the same meaning but different "
    "wording.\nSentence:"
)
PARAPHRASE_PROMPT = PARAPHRASE_PREFIX + " {text}\nRewrite:"

#: like PARAPHRASE_PREFIX: constant within one translate() call (src/dst
#: fixed), split on a pretokenizer boundary (':' | ' ')
TRANSLATE_PREFIX = (
    "Translate the following sentence from {src} to {dst}. Reply with only "
    "the translation.\nSentence:"
)
TRANSLATE_PROMPT = TRANSLATE_PREFIX + " {text}\nTranslation:"

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


def _quantize_leaf(path, x, include_embed: bool = True):
    """Per-output-channel symmetric int8 for 2D matrix params; other leaves
    pass through. Shared by quantize_weights_int8 (post-hoc) and the
    int8-at-init path (Qwen2-7B: a full-precision init tree would not fit
    a 16 GB chip in the first place)."""
    is_embed = any(getattr(p, "key", None) == "embed" for p in path)
    if getattr(x, "ndim", 0) != 2 or (is_embed and not include_embed):
        return x
    xf = jnp.asarray(x, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return {"int8": wq, "scale": s.astype(jnp.float32)}


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
        init_int8: bool = False,
        decode_only: bool = False,
    ):
        """cast_params_bf16: store matrix params in bf16 (halves HBM reads
        per decode step; norms/biases stay f32). Recommended for inference.

        mesh: optional Mesh with a 'model' axis — params get Megatron-layout
        tensor-parallel shardings (tvc/parallel/tp.py) and the decode
        program runs TP (required for Qwen2-7B on 16 GB chips).

        init_int8: initialize DIRECTLY into int8 weights, layer by layer —
        the only way to stand up Qwen2-7B on one 16 GB chip (a full f32
        init tree is ~30 GB; even bf16 is 15.2 GB before quantizing; the
        layer-wise path peaks at one layer's f32 transient, ~0.9 GB).

        decode_only: this model will only ever run the stacked-layer decode
        path (generate / paraphrases) — per-layer param entries are FREED
        once the stacked decode tree is built, halving peak HBM. Required
        to fit Qwen2-7B next to its KV cache on one 16 GB chip; the
        module.apply forward paths raise KeyError afterwards."""
        self.config = config or QwenConfig.tiny()
        self.module = QwenLM(self.config)
        self.max_new_tokens = max_new_tokens
        self.decode_only = decode_only
        c = self.config
        if params is None:
            if init_int8:
                params = self._init_params_int8(seed)
                cast_params_bf16 = False  # int8 leaves are dicts; cast would corrupt
            else:
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
        self._decode_state_cache = None

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
        dequantized table). Composes with tensor-parallel ``mesh``
        sharding: the decode's stacked layer tree re-shards int8+scale
        leaves over the model axis (tvc/parallel/tp.py
        shard_stacked_qwen_layers)."""

        self.params = jax.jit(
            lambda p: jax.tree_util.tree_map_with_path(
                lambda pa, x: _quantize_leaf(pa, x, include_embed), p
            )
        )(self.params)
        self._decode_state_cache = None  # rebuild stacked decode tree
        self._decode_fn = None

    def _init_params_int8(self, seed: int) -> Dict:
        """Layer-wise random init straight into int8 serving form. Each
        QwenBlock inits and quantizes inside ONE jitted program, so the f32
        transient is one layer (~0.9 GB at 7B shape), never the whole tree.
        Matches the module's param structure (embed / layer_i / ln_f /
        lm_head) so the stacked-decode path works unchanged."""
        c = self.config
        block = QwenBlock(c)
        x = jnp.zeros((1, 4, c.hidden_size), c.dtype)
        pos = jnp.zeros((1, 4), jnp.int32)
        mask = jnp.zeros((1, 1, 4, 4), jnp.float32)

        init_layer = jax.jit(
            lambda key: jax.tree_util.tree_map_with_path(
                _quantize_leaf, block.init(key, x, pos, mask)["params"]
            )
        )
        keys = jax.random.split(jax.random.PRNGKey(seed), c.num_layers + 2)
        params: Dict[str, Any] = {
            f"layer_{i}": jax.block_until_ready(init_layer(keys[i]))
            for i in range(c.num_layers)
        }
        # embedding table (HF init convention: normal(0, 0.02)); path key
        # "embed" so _quantize_leaf's include_embed gate applies as usual
        init_embed = jax.jit(
            lambda key: jax.tree_util.tree_map_with_path(
                _quantize_leaf,
                {
                    "embed": {
                        "embedding": 0.02
                        * jax.random.normal(
                            key, (c.vocab_size, c.hidden_size), jnp.float32
                        )
                    }
                },
            )
        )
        params["embed"] = init_embed(keys[-2])["embed"]
        params["ln_f"] = {"scale": jnp.ones((c.hidden_size,), jnp.float32)}
        if not c.tie_embeddings:
            init_head = jax.jit(
                lambda key: jax.tree_util.tree_map_with_path(
                    _quantize_leaf,
                    {
                        "lm_head": {
                            "kernel": 0.02
                            * jax.random.normal(
                                key, (c.hidden_size, c.vocab_size), jnp.float32
                            )
                        }
                    },
                )
            )
            params["lm_head"] = init_head(keys[-1])["lm_head"]
        return params

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
    def _decode_state(self):
        """(non_layer_params, stacked_layer_params) for the scan-over-layers
        decode. Stacking happens ONCE here (device-side), not per call:
        decode xs are [L, ...] arrays, so the compiled program is one
        layer's HLO scanned L times — 24x smaller than the unrolled module
        (measured: unrolled 0.5B decode compiled in ~260-1000 s through the
        remote TPU compiler; scanned compiles in tens of seconds). Cached;
        invalidated by quantize_weights_int8 or reassigning ``params``
        (identity-checked — a swapped weight tree must not serve the old
        stacked copy)."""
        if (
            self._decode_state_cache is not None
            and self._decode_state_cache[0] is self.params
        ):
            return self._decode_state_cache[1]
        c = self.config
        params = self.params
        if self.decode_only and "layer_0" not in params:
            raise RuntimeError(
                "decode_only=True freed the per-layer params when the "
                "stacked decode tree was built; the weight tree cannot be "
                "rebuilt (reassign .params with a full tree, or construct "
                "the model with the desired weights/quantization up front)"
            )
        layer_trees = [params[f"layer_{i}"] for i in range(c.num_layers)]
        is_q = lambda x: isinstance(x, dict) and "int8" in x

        def _delete(leaf):
            for a in (
                (leaf["int8"], leaf["scale"]) if is_q(leaf) else (leaf,)
            ):
                if hasattr(a, "delete"):
                    a.delete()

        # leaf-group-at-a-time stacking; with decode_only, each group's
        # per-layer constituents are FREED right after its [L, ...] stack
        # exists. At Qwen2-7B int8 (~7.1 GB params) holding the per-layer
        # tree AND the full stacked copy simultaneously is ~14 GB — over a
        # 16 GB chip once the KV cache lands (measured OOM); freeing as we
        # go bounds the peak at params + one stacked group (~9 GB).
        flats = [
            jax.tree_util.tree_flatten(t, is_leaf=is_q) for t in layer_trees
        ]
        treedef = flats[0][1]
        stacked_leaves = []
        for group in zip(*(f[0] for f in flats)):
            if is_q(group[0]):
                s = {
                    "int8": jnp.stack([g["int8"] for g in group]),
                    "scale": jnp.stack([g["scale"] for g in group]),
                }
            else:
                s = jnp.stack(group)
            if self.decode_only:
                jax.block_until_ready(s)
                for g in group:
                    _delete(g)
            stacked_leaves.append(s)
        stacked = jax.tree_util.tree_unflatten(treedef, stacked_leaves)
        if self.decode_only:
            for i in range(c.num_layers):
                params.pop(f"layer_{i}", None)
        if self.mesh is not None:
            from tvc.parallel.tp import shard_stacked_qwen_layers

            stacked = shard_stacked_qwen_layers(stacked, self.mesh)
        else:
            # single-device: merge q|k|v and gate|up into single GEMM
            # operands (concat along the OUTPUT dim — each output column's
            # contraction is unchanged, so numerics match the unmerged
            # path). 7 small GEMMs/layer -> 4; the k/v projections alone
            # are [H, KV*Dh] = [896, 128] at 0.5B, far below MXU tile
            # efficiency. NOT done under TP: column-sharding a concatenated
            # dim would split at merged-width/t boundaries, breaking the
            # per-shard q|k|v head grouping.
            stacked = self._merge_stacked(stacked)
        non_layer = {
            k: v for k, v in params.items() if not k.startswith("layer_")
        }
        self._decode_state_cache = (self.params, (non_layer, stacked))
        return self._decode_state_cache[1]

    @staticmethod
    def _merge_stacked(stacked: Dict[str, Any]) -> Dict[str, Any]:
        """Merged-GEMM decode layout from the stacked per-module tree.
        int8-aware: concatenating per-output-channel quantized kernels
        along the output dim concatenates their scales."""
        is_q = lambda x: isinstance(x, dict) and "int8" in x

        def cat(leaves):
            if is_q(leaves[0]):
                out = {
                    "int8": jnp.concatenate([l["int8"] for l in leaves], axis=-1),
                    "scale": jnp.concatenate([l["scale"] for l in leaves], axis=-1),
                }
            else:
                out = jnp.concatenate(leaves, axis=-1)
            jax.block_until_ready(out)
            for l in leaves:  # free sources: 7B can't hold two copies
                for a in (l["int8"], l["scale"]) if is_q(l) else (l,):
                    if hasattr(a, "delete"):
                        a.delete()
            return out

        attn, mlp = stacked["attn"], stacked["mlp"]
        return {
            "ln_attn": stacked["ln_attn"]["scale"],
            "ln_mlp": stacked["ln_mlp"]["scale"],
            "wqkv": cat([attn["q"]["kernel"], attn["k"]["kernel"], attn["v"]["kernel"]]),
            "bqkv": cat([attn["q"]["bias"], attn["k"]["bias"], attn["v"]["bias"]]),
            "wo": attn["o"]["kernel"],
            "wgu": cat([mlp["gate"]["kernel"], mlp["up"]["kernel"]]),
            "wd": mlp["down"]["kernel"],
        }

    def _build_decode(
        self,
        prompt_len: int,
        batch: int,
        n_samples: int = 1,
        n_allowed: Optional[int] = None,
        prefix_len: int = 0,
    ):
        """n_samples: decode n sampled continuations per prompt from ONE
        shared prefill. The paraphrase batch runs N identical prompt rows
        per query; prefill is ~3x the decode FLOPs at paraphrase shapes
        (plen 48 vs 16 new tokens), so prefilling unique prompts once and
        tiling the KV cache N-fold is a ~3x wall win at N=5 (measured
        4.6 -> 1.5 ms/query, B=256).

        n_allowed: static padded size of the allowed-vocabulary id list
        for constrained decoding (None = unconstrained). The allowed rows
        of the output head are GATHERED once per decode call and logits
        are computed only over them — [B, Va] instead of [B, 152k]: a
        ~40% smaller lm_head GEMM for the ASCII mask (90,916 of 151,936
        ids), no full-vocab mask `where` per step, and a smaller top-k
        (isolated head+topk microbench: 2.17 -> 1.69 ms/step at the 0.5B
        paraphrase batch; profiler-traced device total with the gathered
        head: 7.78 ms/step, near the ~6.3 ms bf16 GEMM roofline)."""
        c = self.config
        S = prompt_len + self.max_new_tokens
        eot = getattr(self.tokenizer, "eot_id", -1)
        block = QwenBlock(c)
        head_dim = c.hidden_size // c.num_heads
        dequant = QwenModel._dequant

        def rmsnorm(x, scale):
            x32 = x.astype(jnp.float32)
            var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
            return (x32 * jax.lax.rsqrt(var + c.rms_eps) * scale).astype(x.dtype)

        def mm(x3, leaf):
            """x [B, T, K] @ weight leaf. int8 leaves route through a
            Pallas quantized GEMM (config.quant_gemm: weight-only "w8"
            streams weights as 1 byte/param and dequants in-register;
            "w8a8" also int8-quantizes activations per-row for the MXU's
            native s8xs8 path — tvc/core/pallas/w8_matmul_kernel.py) when
            the activation block fits VMEM. Bigger blocks (prefill, and
            decode batches past the VMEM budget): under "w8a8" the GEMM
            still runs all-int8, but through XLA's native s8xs8->s32
            dot_general with the per-row quantization fused around it —
            measured at the 7B prefill block [9216, K] 376 ms vs 639 ms
            for dequant-then-bf16-matmul and 789 ms for the Pallas kernel
            (whose VMEM-budgeted tiles go latency-bound at M=9216) per 28
            layers; at the doubled decode batch [1152, K] 48.7 vs 84.6
            ms. Weight-only "w8" keeps the bf16 dequant fallback — its
            contract is bf16-activation numerics."""
            B_, T_ = x3.shape[0], x3.shape[1]
            if isinstance(leaf, dict) and "int8" in leaf:
                if B_ * T_ <= 1024:
                    kern = w8a8_matmul if c.quant_gemm == "w8a8" else w8_matmul
                    y = kern(
                        x3.reshape(B_ * T_, -1).astype(c.dtype),
                        leaf["int8"],
                        leaf["scale"],
                    )
                    return y.reshape(B_, T_, -1)
                if c.quant_gemm == "w8a8":
                    xf = x3.astype(jnp.float32)
                    rs = (
                        jnp.maximum(
                            jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12
                        )
                        / 127.0
                    )
                    xq = jnp.clip(jnp.round(xf / rs), -127, 127).astype(jnp.int8)
                    acc = jax.lax.dot_general(
                        xq,
                        leaf["int8"],
                        (((xq.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    return (
                        acc.astype(jnp.float32)
                        * rs
                        * leaf["scale"].astype(jnp.float32)
                    ).astype(c.dtype)
                w = leaf["int8"].astype(c.dtype) * leaf["scale"].astype(c.dtype)
                return x3.astype(c.dtype) @ w
            return x3.astype(c.dtype) @ leaf.astype(c.dtype)

        def lm_head(x, non_layer):
            """Logits in c.dtype matmul (f32 accumulate on the MXU), f32 out
            — numerically identical to nn.Embed.attend / the module path
            for tied embeddings; the untied head also computes in c.dtype
            (an f32 [B, vocab] GEMM at 7B scale is ~8x off MXU peak)."""
            if c.tie_embeddings:
                tbl = dequant(non_layer["embed"])["embedding"]
                return (x.astype(c.dtype) @ tbl.astype(c.dtype).T).astype(
                    jnp.float32
                )
            return mm(x, non_layer["lm_head"]["kernel"]).astype(jnp.float32)

        def run_layers(non_layer, stacked, x, positions, mask, caches, cache_index, ctx=0):
            """One lax.scan over the L stacked layers. caches: (ck, cv)
            [L, B, S, KV, Dh] or None (no-cache forward).

            The caches ride the scan CARRY, NOT the xs/ys stream: scan ys
            materialize a fresh [L, B, S, KV, Dh] output buffer every
            decode step, a full-cache copy (measured 3.7 ms/step at the
            0.5B paraphrase batch); carried buffers get in-place
            dynamic-update-slice from XLA.

            The merged (single-device) decode path never materializes a
            per-layer slab of ANYTHING: weight GEMMs and attention take
            the STACKED arrays plus the layer index through Pallas scalar
            prefetch (block index_maps select the layer; zero-copy DMAs),
            and cache updates dynamic-update-slice one token column
            directly into the stacked carry. The XLA alternative —
            dynamic_index_in_dim slab extract + slab write-back per layer
            inside the scan, this function's previous shape — measured
            ~29 ms of pure copies per decode step at the Qwen2-7B
            paraphrase batch (B=576: ~17 ms weight slabs + ~12 ms cache
            slabs, profiler trace) against ~21 ms of actual GEMM work."""

            merged = "wqkv" in stacked
            nq = c.num_heads * head_dim
            nkv = c.num_kv_heads * head_dim
            reps = c.num_heads // c.num_kv_heads

            def mm_stacked(x3, leaf, l):
                """x [B, T, K] @ (stacked weight leaf)[l]. int8 leaves
                with VMEM-sized activation blocks ride the scalar-prefetch
                stacked kernels; everything else slices the layer's leaf
                (one slab copy — only taken on the prefill block, where
                it is amortized over the whole prompt) and reuses mm()."""
                B_, T_ = x3.shape[0], x3.shape[1]
                if (
                    isinstance(leaf, dict)
                    and "int8" in leaf
                    and B_ * T_ <= 1024
                ):
                    kern = (
                        w8a8_matmul_stacked
                        if c.quant_gemm == "w8a8"
                        else w8_matmul_stacked
                    )
                    y = kern(
                        x3.reshape(B_ * T_, -1).astype(c.dtype),
                        leaf["int8"],
                        leaf["scale"],
                        l,
                    )
                    return y.reshape(B_, T_, -1)
                sliced = jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
                    leaf,
                )
                return mm(x3, sliced)

            def merged_layer(h, l, ck, cv):
                """QwenBlock math with q|k|v and gate|up as single GEMMs
                (numerics match the module path — output columns contract
                identically; verified token-for-token by
                tests/test_qwen_sd.py greedy parity).

                Cache layout here is KV-MAJOR: ck/cv [L, B, KV, S, Dh], so
                each (b, kv) slab is a contiguous [S, Dh] matrix — the
                layout the fused decode-attention kernel DMAs in one read
                (tvc/core/pallas/decode_attention_kernel.py)."""
                B, T = h.shape[0], h.shape[1]

                def lidx(a):
                    return jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False)

                x = rmsnorm(h, lidx(stacked["ln_attn"]))
                qkv = mm_stacked(x, stacked["wqkv"], l) + lidx(
                    stacked["bqkv"]
                ).astype(c.dtype)
                q = qkv[..., :nq].reshape(B, T, c.num_heads, head_dim)
                k = qkv[..., nq : nq + nkv].reshape(B, T, c.num_kv_heads, head_dim)
                v = qkv[..., nq + nkv :].reshape(B, T, c.num_kv_heads, head_dim)
                q = rope(q, positions, c.rope_theta)
                k = rope(k, positions, c.rope_theta)
                # one token column (decode) / the prompt block (prefill)
                # written IN PLACE into the stacked carry — never a slab
                k_t = k.transpose(0, 2, 1, 3).astype(ck.dtype)  # [B, KV, T, Dh]
                v_t = v.transpose(0, 2, 1, 3).astype(cv.dtype)
                ck = jax.lax.dynamic_update_slice(
                    ck, k_t[None], (l, 0, 0, cache_index, 0)
                )
                cv = jax.lax.dynamic_update_slice(
                    cv, v_t[None], (l, 0, 0, cache_index, 0)
                )
                if T == 1:
                    # decode: fused Pallas GQA straight over the stacked
                    # cache — one HBM read of layer l's k/v, no logits
                    # round-trip, no slab copy
                    qg = q.reshape(B, c.num_kv_heads, reps, head_dim)
                    out = decode_gqa_attention_stacked(
                        qg, ck, cv, mask[:, 0, 0], l
                    )
                    out = out.reshape(B, T, c.num_heads * head_dim)
                else:
                    # prefill: attention over the just-computed block k/v
                    # plus (prefix-shared prefill, ctx > 0) the ctx cache
                    # slots written by the phase-1 prefix pass — read back
                    # from the just-updated stacked cache in one slice
                    # (the key range [0, ctx+T) is contiguous by layout)
                    qg = q.reshape(B, T, c.num_kv_heads, reps, head_dim)
                    if ctx:
                        kk = jax.lax.dynamic_slice(
                            ck, (l, 0, 0, 0, 0),
                            (1, B, c.num_kv_heads, ctx + T, head_dim),
                        )[0]
                        vv = jax.lax.dynamic_slice(
                            cv, (l, 0, 0, 0, 0),
                            (1, B, c.num_kv_heads, ctx + T, head_dim),
                        )[0]
                    else:
                        kk, vv = k_t, v_t
                    lg = jnp.einsum(
                        "btkrd,bksd->bkrts", qg, kk, preferred_element_type=jnp.float32
                    ) / np.sqrt(head_dim)
                    lg = lg + mask[:, 0][:, None, None, :, : ctx + T]
                    w = jax.nn.softmax(lg, axis=-1).astype(c.dtype)
                    out = jnp.einsum("bkrts,bksd->btkrd", w, vv)
                    out = out.reshape(B, T, c.num_heads * head_dim)
                h = h + mm_stacked(out, stacked["wo"], l)
                x2 = rmsnorm(h, lidx(stacked["ln_mlp"]))
                gu = mm_stacked(x2, stacked["wgu"], l)
                act = jax.nn.silu(gu[..., : c.intermediate_size]) * gu[
                    ..., c.intermediate_size :
                ]
                h = h + mm_stacked(act.astype(c.dtype), stacked["wd"], l)
                return h, ck, cv

            def body(carry, l):
                h, ck, cv = carry
                if merged:
                    # stacked weights/caches stay put; Pallas scalar
                    # prefetch selects layer l blockwise (int8 leaves are
                    # read as 1 byte/param — no whole-layer bf16
                    # materialization either)
                    h, ck, cv = merged_layer(h, l, ck, cv)
                else:
                    # module path (TP/module parity flows): per-layer
                    # slab extract + write-back, layout S-major
                    lp = jax.tree_util.tree_map(
                        lambda a: jax.lax.dynamic_index_in_dim(
                            a, l, 0, keepdims=False
                        ),
                        stacked,
                    )
                    kl = jax.lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
                    vl = jax.lax.dynamic_index_in_dim(cv, l, 0, keepdims=False)
                    # int8 dequant INSIDE the body: only one layer's bf16
                    # copy is ever materialized (whole-tree dequant of
                    # int8 Qwen2-7B would need a 14 GB transient next to
                    # the 7.5 GB int8 tree — over the 16 GB HBM)
                    h, (nkl, nvl) = block.apply(
                        {"params": dequant(lp)}, h, positions, mask, (kl, vl), cache_index
                    )
                    ck = jax.lax.dynamic_update_index_in_dim(ck, nkl, l, 0)
                    cv = jax.lax.dynamic_update_index_in_dim(cv, nvl, l, 0)
                return (h, ck, cv), None

            (x, ck, cv), _ = jax.lax.scan(
                body, (x, caches[0], caches[1]), jnp.arange(c.num_layers)
            )
            return x, (ck, cv)

        def embed_lookup(non_layer, tokens):
            """take-then-dequant: gathering int8 rows first keeps the
            transient at [B, T, H] — dequanting the whole Qwen2-7B table
            first writes+reads a 1.1 GB bf16 copy EVERY decode step."""
            e = non_layer["embed"]["embedding"]
            if isinstance(e, dict) and "int8" in e:
                rows = jnp.take(e["int8"], tokens, axis=0).astype(c.dtype)
                return rows * e["scale"].astype(c.dtype)
            return jnp.take(e, tokens, axis=0).astype(c.dtype)

        def decode(
            non_layer, stacked, prompt_tokens, lengths, key, temperature,
            allowed_ids, n_real,
        ):
            """lengths [B]: real (un-padded) prompt lengths <= prompt_len.
            Cache slots [0, plen) hold the padded prompt; generated tokens
            occupy [plen, S). Pad slots are masked out of attention; RoPE
            positions of generated tokens continue per-sample from the real
            prompt end.

            With a static prefix_len, prompt_tokens is (prefix [P],
            suffixes [B, plen-P]) and plen/lengths count prefix + suffix:
            cache slots [0, P) hold the shared prefix (prefilled once at
            batch 1, broadcast), [P, plen) the padded suffixes — real
            tokens stay contiguous per row, so the decode loop below is
            untouched by prefix sharing."""
            B = (
                prompt_tokens[1].shape[0]
                if prefix_len
                else prompt_tokens.shape[0]
            )
            # constrained decoding: gather the allowed-vocab head rows ONCE
            # per call; every step's logits/sampling then run at [*, Va]
            if n_allowed is not None:
                if c.tie_embeddings:
                    e = non_layer["embed"]["embedding"]
                    if isinstance(e, dict) and "int8" in e:
                        g_tbl = jnp.take(
                            e["int8"], allowed_ids, axis=0
                        ).astype(c.dtype) * e["scale"].astype(c.dtype)
                    else:
                        g_tbl = jnp.take(e, allowed_ids, axis=0).astype(c.dtype)

                    def head_fn(x):
                        return (x.astype(c.dtype) @ g_tbl.T).astype(jnp.float32)

                else:
                    kern = non_layer["lm_head"]["kernel"]
                    if isinstance(kern, dict) and "int8" in kern:
                        g_leaf = {
                            "int8": jnp.take(kern["int8"], allowed_ids, axis=1),
                            "scale": jnp.take(kern["scale"], allowed_ids, axis=0),
                        }
                    else:
                        g_leaf = jnp.take(kern, allowed_ids, axis=1)

                    def head_fn(x):
                        return mm(x, g_leaf).astype(jnp.float32)

            else:

                def head_fn(x):
                    return lm_head(x, non_layer)

            merged = "wqkv" in stacked
            if prefix_len:
                prefix_tokens, suffix_tokens = prompt_tokens
                B = suffix_tokens.shape[0]
            else:
                suffix_tokens = prompt_tokens
            # merged (single-device) path uses the KV-major cache layout
            # the fused decode-attention kernel wants; the module/TP path
            # keeps the S-major layout QwenAttention updates
            def cache_shape(b, s):
                return (
                    (c.num_layers, b, c.num_kv_heads, s, head_dim)
                    if merged
                    else (c.num_layers, b, s, c.num_kv_heads, head_dim)
                )

            caches = (
                jnp.zeros(cache_shape(B, S), c.dtype),
                jnp.zeros(cache_shape(B, S), c.dtype),
            )
            ks = jnp.arange(S)
            if prefix_len:
                # prefix-shared prefill, phase 1: the instruction prefix
                # is IDENTICAL across the batch, so its KV is computed
                # ONCE at batch 1 and broadcast into every row's cache
                # slots [0, prefix_len) — prefix FLOPs drop B-fold (the
                # prefix is ~40% of the prompt at paraphrase shapes)
                P = prefix_len
                pre_pos = jnp.arange(P)[None]
                ks_p = jnp.arange(P)
                pre_mask = jnp.where(
                    ks_p[None, None, None, :] <= ks_p[None, None, :, None],
                    0.0,
                    -jnp.inf,
                )  # [1, 1, P, P] causal, every prefix token real
                pre_caches = (
                    jnp.zeros(cache_shape(1, P), c.dtype),
                    jnp.zeros(cache_shape(1, P), c.dtype),
                )
                xp = embed_lookup(non_layer, prefix_tokens[None])
                _, pre_caches = run_layers(
                    non_layer, stacked, xp, pre_pos, pre_mask, pre_caches, 0
                )
                caches = tuple(
                    jax.lax.dynamic_update_slice(
                        cz,
                        jnp.broadcast_to(
                            cp, (cp.shape[0], B) + cp.shape[2:]
                        ).astype(cz.dtype),
                        (0, 0, 0, 0, 0),
                    )
                    for cz, cp in zip(caches, pre_caches)
                )
                # phase 2: suffix-only prefill at cache offset P; queries
                # see the whole prefix + a causal window over their own
                # real suffix tokens (lengths are TOTAL: P + suffix_len)
                Tsuf = prompt_len - P
                positions = P + jnp.broadcast_to(jnp.arange(Tsuf), (B, Tsuf))
                t_idx = jnp.arange(Tsuf)
                prefill_mask = jnp.where(
                    (ks[None, None, None, :] < P)
                    | (
                        (ks[None, None, None, :] <= P + t_idx[None, None, :, None])
                        & (ks[None, None, None, :] < lengths[:, None, None, None])
                    ),
                    0.0,
                    -jnp.inf,
                )  # [B, 1, Tsuf, S]
                x = embed_lookup(non_layer, suffix_tokens)
                x, caches = run_layers(
                    non_layer, stacked, x, positions, prefill_mask, caches,
                    P, ctx=P,
                )
                x = rmsnorm(x, non_layer["ln_f"]["scale"])
                # head only at the last real token per sample (index
                # within the suffix block)
                x = jnp.take_along_axis(
                    x, (lengths - P - 1)[:, None, None], axis=1
                )
            else:
                positions = jnp.broadcast_to(jnp.arange(prompt_len), (B, prompt_len))
                # [B, 1, plen, S]: causal over the real prompt only
                prefill_mask = jnp.where(
                    (ks[None, None, None, :] <= jnp.arange(prompt_len)[None, None, :, None])
                    & (ks[None, None, None, :] < lengths[:, None, None, None]),
                    0.0,
                    -jnp.inf,
                )
                x = embed_lookup(non_layer, suffix_tokens)
                x, caches = run_layers(
                    non_layer, stacked, x, positions, prefill_mask, caches, 0
                )
                x = rmsnorm(x, non_layer["ln_f"]["scale"])
                # head only at the last real token per sample
                x = jnp.take_along_axis(x, (lengths - 1)[:, None, None], axis=1)
            next_logits = head_fn(x)[:, 0]  # [B, vocab-or-Va]

            if n_samples > 1:
                # shared-prefix tiling: each prompt's prefilled KV serves
                # n_samples independent sampling chains (row i of the
                # output batch = prompt i // n_samples)
                caches = jax.tree_util.tree_map(
                    lambda a: jnp.repeat(a, n_samples, axis=1), caches
                )
                next_logits = jnp.repeat(next_logits, n_samples, axis=0)
                lengths = jnp.repeat(lengths, n_samples, axis=0)

            # top-k=50 truncated sampling (HF generate's default top_k — the
            # sampler the reference's paraphrase path runs through,
            # src/text_augment.py:304-308). Also ~1 ms/step cheaper at the
            # paraphrase batch than full-vocab categorical: Gumbel noise
            # over [B, 152k] f32 costs a 467 MB write+read per step.
            top_k = min(50, n_allowed or c.vocab_size)

            def sample(lg, k):
                # constrained decoding: logits already span only the
                # gathered allowed ids; mask out the pad rows (duplicates
                # of allowed_ids[0] beyond n_real) so they're never sampled
                if n_allowed is not None:
                    lg = jnp.where(jnp.arange(n_allowed) < n_real, lg, -jnp.inf)

                def sampled():
                    # approx_max_k: TPU-native bucketed top-k (~0.95 recall
                    # on the shortlist BOUNDARY — the high-probability head
                    # is always kept). exact lax.top_k is a sort at this
                    # vocab: measured 20.3 ms/step vs 0.99 ms/step for
                    # approx at [768, 152k]
                    topv, topi = jax.lax.approx_max_k(lg, top_k)
                    choice = jax.random.categorical(
                        k, topv / jnp.maximum(temperature, 1e-4)
                    )
                    return jnp.take_along_axis(topi, choice[:, None], axis=1)[:, 0]

                loc = jax.lax.cond(
                    temperature > 1e-4,
                    sampled,
                    lambda: jnp.argmax(lg, axis=-1),
                )
                # map gathered-row index back to the real vocabulary id
                return jnp.take(allowed_ids, loc) if n_allowed is not None else loc

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
                x = embed_lookup(non_layer, tok[:, None])
                x, caches = run_layers(
                    non_layer, stacked, x, positions, step_mask, caches, cache_pos
                )
                x = rmsnorm(x, non_layer["ln_f"]["scale"])
                logits = head_fn(x)
                return (caches, logits[:, 0], key, done), tok

            done0 = jnp.zeros((next_logits.shape[0],), bool)  # B * n_samples
            n_total = self.max_new_tokens
            chunk = DECODE_CHUNK
            if n_total > chunk and n_total % chunk == 0:
                # early-exit chunked decode: scan `chunk` steps at a time
                # inside a while_loop that stops once EVERY sequence has
                # emitted EOT — with real weights short paraphrases skip
                # the tail chunks entirely. Bit-identical to the plain
                # scan: the per-step RNG key sequence is unchanged and
                # skipped steps would only have emitted the EOT fill the
                # output buffer is pre-filled with.
                bs = next_logits.shape[0]
                tokens0 = jnp.full((n_total, bs), eot, jnp.int32)

                def chunk_cond(state):
                    c, (_, _, _, done), _ = state
                    return (c * chunk < n_total) & ~jnp.all(done)

                def chunk_body(state):
                    c, carry, tokens = state
                    carry, toks = jax.lax.scan(
                        step, carry, c * chunk + jnp.arange(chunk)
                    )
                    tokens = jax.lax.dynamic_update_slice(
                        tokens, toks.astype(jnp.int32), (c * chunk, 0)
                    )
                    return c + 1, carry, tokens

                _, _, tokens = jax.lax.while_loop(
                    chunk_cond,
                    chunk_body,
                    (jnp.asarray(0), (caches, next_logits, key, done0), tokens0),
                )
            else:
                (_, _, _, _), tokens = jax.lax.scan(
                    step,
                    (caches, next_logits, key, done0),
                    jnp.arange(n_total),
                )
            return tokens.T  # [B, max_new_tokens]

        return jax.jit(decode)

    def _prefix_ids(self, prefix: str) -> np.ndarray:
        """Token ids of a shared prompt prefix (small per-string cache —
        paraphrase/translate prefixes are a handful of fixed strings)."""
        cache = getattr(self, "_prefix_ids_cache", None)
        if cache is None:
            cache = self._prefix_ids_cache = {}
        ids = cache.get(prefix)
        if ids is None:
            row = self.tokenizer([prefix])[0]
            pad = getattr(self.tokenizer, "pad_id", 0)
            ids = row[: int((row != pad).sum())].astype(np.int32)
            if len(cache) >= 8:
                cache.clear()
            cache[prefix] = ids
        return ids

    def generate_async(
        self,
        prompts: List[str],
        temperature: float = 0.8,
        seed: int = 0,
        n_samples: int = 1,
        token_mask: Optional[np.ndarray] = None,
        shared_prefix: Optional[str] = None,
    ) -> Callable[[], List[str]]:
        """Dispatch the batched decode WITHOUT blocking; returns a zero-arg
        callable whose invocation performs the device->host readback and
        detokenization. JAX dispatch is async, so host work — and device
        programs dispatched afterwards — overlap the in-flight decode.
        This is the single-threaded double-buffering primitive for the
        serving cold path (a producer *thread* fights the consumer for the
        GIL over detokenize/tokenize/augment; measured 2.4x slower than
        this on the full-TVC bench loop).

        shared_prefix: an instruction prefix every prompt starts with.
        Its KV cache is prefilled ONCE at batch 1 and broadcast
        (prefix-shared prefill) — prefix prefill FLOPs drop B-fold, and
        only the (much shorter) suffixes prefill at batch B. The prefix
        must split the prompts on a byte-level-BPE pretokenizer boundary
        (end it at punctuation/newline with the suffix starting with a
        space or newline); token-id equality of the split is checked
        against the first prompt (~0.1 ms, verdict cached per prefix) and
        the call falls back to plain full-prompt prefill when the split
        changes the ids (e.g. a tokenizer that wraps every call in
        BOS/EOS, like the random-weight HashTokenizer)."""
        pad = getattr(self.tokenizer, "pad_id", 0)
        prefix_ids = np.zeros((0,), np.int32)
        if shared_prefix:
            bad = next(
                (p for p in prompts if not p.startswith(shared_prefix)), None
            )
            if bad is not None:
                raise ValueError(
                    f"shared_prefix {shared_prefix!r} is not a prefix of "
                    f"prompt {bad!r}"
                )
            ok_cache = getattr(self, "_prefix_ok_cache", None)
            if ok_cache is None:
                ok_cache = self._prefix_ok_cache = {}
            if ok_cache.get(shared_prefix, True):
                prefix_ids = self._prefix_ids(shared_prefix)
                suffixes = [p[len(shared_prefix) :] for p in prompts]
                tok = self.tokenizer(suffixes)  # [B, ctx] padded
                if prompts and shared_prefix not in ok_cache:
                    full0 = self.tokenizer([prompts[0]])[0]
                    n0 = int((full0 != pad).sum())
                    ns = int((tok[0] != pad).sum())
                    split0 = np.concatenate([prefix_ids, tok[0, :ns]])
                    ok_cache[shared_prefix] = bool(
                        n0 == len(split0) and np.array_equal(full0[:n0], split0)
                    )
            if not ok_cache.get(shared_prefix, True):
                # split not token-exact for this tokenizer: plain prefill
                prefix_ids = np.zeros((0,), np.int32)
                tok = self.tokenizer(prompts)
        else:
            tok = self.tokenizer(prompts)  # [B, ctx] padded
        P = len(prefix_ids)
        # truncate to the longest real prompt, bucketed to a multiple of 8 so
        # nearby prompt lengths reuse one compiled decode program
        lengths = (tok != pad).sum(axis=1)
        plen = min(
            -(-max(int(lengths.max()), 4) // 8) * 8,
            self.config.max_seq_len - self.max_new_tokens - P,
        )
        tok = tok[:, :plen]
        # constrained decoding: convert the bool mask to a padded
        # allowed-id list (the decode program gathers the head rows once
        # per call; pad slots duplicate allowed[0] and are masked by
        # n_real). All-True masks take the unconstrained program.
        allowed = None
        n_real = 0
        if token_mask is not None:
            m_np = np.asarray(token_mask, bool)
            if m_np.shape != (self.config.vocab_size,):
                raise ValueError(
                    f"token_mask must be bool [{self.config.vocab_size}], "
                    f"got shape {m_np.shape}"
                )
            if not m_np.any():
                raise ValueError("token_mask allows no vocabulary ids")
            if not m_np.all():
                # device-cache the padded allowed-id array per mask
                # content: the serving loop passes the SAME mask every
                # call, and re-uploading 360 KB host->device each decode
                # costs a tunnel round-trip on the pipelined critical
                # path. Exact-match on the stored bytes (a bare hash
                # could collide silently into the WRONG vocabulary).
                key_m = m_np.tobytes()
                cached = getattr(self, "_allowed_cache", None)
                if cached is not None and cached[0] == key_m:
                    _, allowed, n_real = cached
                else:
                    ids = np.nonzero(m_np)[0].astype(np.int32)
                    n_real = len(ids)
                    va = -(-n_real // 128) * 128  # lane-aligned padded size
                    ids = np.pad(
                        ids, (0, va - n_real), constant_values=int(ids[0])
                    )
                    allowed = jax.device_put(jnp.asarray(ids))
                    self._allowed_cache = (key_m, allowed, n_real)
        key_shape = (
            plen, tok.shape[0], n_samples,
            None if allowed is None else len(allowed),
            P,  # prefix ids are traced args — the program depends only
            # on the prefix LENGTH, so same-length prefixes share it
        )
        if self._decode_fn is None or self._decode_fn[0] != key_shape:
            self._decode_fn = (
                key_shape,
                self._build_decode(
                    plen + P, tok.shape[0], n_samples,
                    n_allowed=key_shape[3],
                    prefix_len=P,
                ),
            )
        non_layer, stacked = self._decode_state()
        prompt_arg = (
            (jnp.asarray(prefix_ids), jnp.asarray(tok)) if P else jnp.asarray(tok)
        )
        out = self._decode_fn[1](
            non_layer,
            stacked,
            prompt_arg,
            jnp.asarray(np.minimum(lengths, plen) + P, jnp.int32),
            jax.random.PRNGKey(seed),
            jnp.asarray(temperature, jnp.float32),
            allowed if allowed is not None else jnp.zeros((0,), jnp.int32),
            jnp.asarray(n_real, jnp.int32),
        )

        def result() -> List[str]:
            rows = np.asarray(out)  # readback = sync with the device
            batch_decode = getattr(self.tokenizer, "decode_batch", None)
            if batch_decode is not None:
                eot = getattr(self.tokenizer, "eot_id", -1)
                return batch_decode(
                    [[i for i in row if i != eot] for row in rows.tolist()]
                )
            return [self._detokenize(row) for row in rows]

        return result

    def generate(
        self,
        prompts: List[str],
        temperature: float = 0.8,
        seed: int = 0,
        n_samples: int = 1,
        token_mask: Optional[np.ndarray] = None,
        shared_prefix: Optional[str] = None,
    ) -> List[str]:
        """Batched prompt -> continuation decode. ``n_samples > 1`` returns
        n independent sampled continuations per prompt (output rows
        ``i*n .. (i+1)*n`` belong to prompt i) from ONE shared prefill —
        the cheap way to run the paraphrase batch's N-samples-per-query.
        ``token_mask`` (bool [vocab]) constrains sampling to the allowed
        vocabulary rows (see ascii_token_mask)."""
        return self.generate_async(
            prompts, temperature, seed, n_samples, token_mask, shared_prefix
        )()

    def ascii_token_mask(self) -> np.ndarray:
        """Boolean [vocab] mask of token ids whose decoded text is
        printable ASCII (plus EOT) — for vocabulary-constrained decoding
        (``generate(..., token_mask=...)``). Serving uses: constrain
        paraphrase output to the character class downstream tokenizers
        have fast paths for; with random bench weights it also keeps the
        decoded text representative of real-weight (English) output
        instead of uniform unicode garbage, which would otherwise send
        the CLIP BPE down its slow non-ASCII fallback ~6x the real cost.
        Computed once per model instance (one batched single-token decode
        over the vocab) and cached."""
        cached = getattr(self, "_ascii_mask", None)
        if cached is not None:
            return cached
        vocab = self.config.vocab_size
        mask = np.ones((vocab,), bool)
        inner = getattr(self.tokenizer, "tok", None)  # HF-backed tokenizer
        if inner is not None:
            n = min(vocab, len(inner))
            texts = inner.batch_decode(
                [[i] for i in range(n)], skip_special_tokens=False
            )
            mask = np.zeros((vocab,), bool)
            mask[:n] = np.fromiter(
                ((t.isascii() and t.isprintable()) or t == "" for t in texts),
                bool,
                count=n,
            )
        eot = getattr(self.tokenizer, "eot_id", None)
        if eot is not None:
            mask[int(eot)] = True  # chains must be able to terminate
        self._ascii_mask = mask
        return mask

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
        outs = self.generate(
            [PARAPHRASE_PROMPT.format(text=text)],
            temperature=temperature,
            seed=_stable_seed(text),
            n_samples=num_paraphrases,
        )
        return [o.strip() for o in outs if o.strip()]

    def generate_paraphrases_batch(
        self,
        texts: List[str],
        num_paraphrases: int = 3,
        temperature: float = 0.8,
        seed: int = 0,
        token_mask: Optional[np.ndarray] = None,
    ) -> List[List[str]]:
        """ALL queries' paraphrases in ONE decode batch of B*N sequences —
        the serving-throughput path (per-text seeding forced one decode
        batch per query in round 1; at 9.7k q/s ambitions variant
        generation was the unmeasured wall)."""
        return self.generate_paraphrases_batch_async(
            texts, num_paraphrases, temperature, seed, token_mask
        )()

    def generate_paraphrases_batch_async(
        self,
        texts: List[str],
        num_paraphrases: int = 3,
        temperature: float = 0.8,
        seed: int = 0,
        token_mask: Optional[np.ndarray] = None,
    ) -> Callable[[], List[List[str]]]:
        """Async form of generate_paraphrases_batch: dispatches the decode
        and returns a zero-arg finalizer (see generate_async) — lets a
        serving loop start batch i+1's decode before consuming batch i."""
        n = num_paraphrases
        prompts = [PARAPHRASE_PROMPT.format(text=t) for t in texts]
        if not prompts:
            return lambda: [[] for _ in texts]
        # one prefill per UNIQUE prompt; the decode tiles each prompt's KV
        # n-fold for independent sampling chains (n_samples path). The
        # instruction prefix prefills once for the whole batch
        # (prefix-shared prefill, see generate_async).
        handle = self.generate_async(
            prompts,
            temperature=temperature,
            seed=seed,
            n_samples=n,
            token_mask=token_mask,
            shared_prefix=PARAPHRASE_PREFIX,
        )

        def result() -> List[List[str]]:
            outs = handle()
            return [
                [o.strip() for o in outs[i * n : (i + 1) * n] if o.strip()]
                for i in range(len(texts))
            ]

        return result

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
            shared_prefix=TRANSLATE_PREFIX.format(src=sn, dst=dn),
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
        return self.batch_async(texts, n)()

    def batch_async(self, texts: List[str], n: int) -> Callable[[], List[List[str]]]:
        """Dispatch-now/finalize-later form (QwenModel.generate_async) for
        TextAugmenter.batch_generate_variants_async's overlap path."""
        return self.model.generate_paraphrases_batch_async(
            texts, n, self.temperature, seed=_stable_seed("\x00".join(texts))
        )
