"""Text tokenizers for the CLIP text tower and the Qwen LM.

Implementations:

* ``BPETokenizer`` — byte-pair-encoding matching the published CLIP
  tokenizer. The REAL vocab.json + merges.txt are bundled under
  ``tvc/assets/clip_tokenizer/`` (public OpenAI-CLIP artifacts), so the
  BPE path is the DEFAULT for real-shape CLIP configs — token ids are
  numerically identical to ``transformers.CLIPTokenizer`` (parity test in
  tests/test_tokenizer_assets.py).
* ``HFTokenizerWrapper`` — transformers tokenizer loaded from LOCAL files
  (zero egress), adapted to the tvc contract; the Qwen2 tokenizer assets
  are bundled under ``tvc/assets/qwen_tokenizer/``.
* ``HashTokenizer`` — deterministic, dependency-free fallback: words hash
  into the vocab range (tiny test configs and any vocab without bundled
  assets). Exactly reproducible across processes (stable FNV-1a).

All produce fixed-length int32 ``[B, context_length]``; CLIP's
take-feature-at-argmax convention (tvc/models/clip.py TextTower) holds
because EOT is the highest id in both the real CLIP vocab (49407) and the
hash fallback (vocab-1).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Callable, List, Optional, Sequence

import numpy as np

ASSET_DIR = Path(__file__).resolve().parent.parent / "assets"


def _fnv1a(word: str) -> int:
    h = 0xCBF29CE484222325
    for b in word.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


class HashTokenizer:
    """Deterministic hash tokenizer (test / random-weight operation)."""

    def __init__(self, vocab_size: int = 49408, context_length: int = 77):
        if vocab_size < 8:
            raise ValueError("vocab_size too small")
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.pad_id = 0
        self.sot_id = vocab_size - 2
        self.eot_id = vocab_size - 1

    def _word_ids(self, text: str) -> List[int]:
        words = "".join(
            ch if ch.isalnum() else " " for ch in text.lower()
        ).split()
        # ids in [1, sot_id)
        span = self.sot_id - 1
        return [1 + (_fnv1a(w) % span) for w in words]

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.full((len(texts), self.context_length), self.pad_id, dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot_id] + self._word_ids(t)[: self.context_length - 2] + [
                self.eot_id
            ]
            out[i, : len(ids)] = ids
        return out


class BPETokenizer:
    """CLIP-style BPE over a merges file (gated on asset availability).

    Loads an OpenAI-CLIP ``bpe_simple_vocab_16e6``-format merges list or a
    HF ``vocab.json``+``merges.txt`` pair. Kept intentionally minimal; the
    semantics follow the published CLIP tokenizer (lowercase, whitespace
    split with basic punctuation handling, ``</w>`` end-of-word marker).
    """

    def __init__(
        self,
        merges_path: str,
        vocab_size: int = 49408,
        context_length: int = 77,
        vocab_path: Optional[str] = None,
    ):
        """vocab_path: an HF ``vocab.json`` with the authoritative
        token->id mapping (preferred); without it the vocab is
        reconstructed OpenAI-style from byte units + merges."""
        self.vocab_size = vocab_size
        self.context_length = context_length
        byte_list = self._bytes_to_unicode()
        merges: List[tuple] = []
        with open(merges_path, "r", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # skip header lines that aren't pairs
        for line in lines:
            parts = line.strip().split()
            if len(parts) == 2:
                merges.append(tuple(parts))
        if vocab_path:
            with open(vocab_path, encoding="utf-8") as f:
                self.encoder = json.load(f)
        else:
            vocab = list(byte_list.values())
            vocab.extend([v + "</w>" for v in vocab])
            merges = merges[: vocab_size - len(vocab) - 2]
            for m in merges:
                vocab.append("".join(m))
            vocab.extend(["<|startoftext|>", "<|endoftext|>"])
            self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = byte_list
        self.sot_id = self.encoder["<|startoftext|>"]
        self.eot_id = self.encoder["<|endoftext|>"]
        self.pad_id = 0
        self._cache = {}
        # first-party C++ fast path (tvc/native/bpe_tokenizer.cpp): ~35k
        # texts/s in python is a host ceiling at 8.6k q/s x 7 texts/query;
        # the native path handles lowercased-ASCII strings bit-identically
        # (parity test tests/test_native.py), python keeps the rest
        self._native = False
        try:
            from tvc import native

            self._native = native.bpe_init(self.encoder, self.bpe_ranks)
        except Exception:
            self._native = False

    @staticmethod
    def _bytes_to_unicode():
        bs = (
            list(range(ord("!"), ord("~") + 1))
            + list(range(ord("\xa1"), ord("\xac") + 1))
            + list(range(ord("\xae"), ord("\xff") + 1))
        )
        cs = bs[:]
        n = 0
        for b in range(256):
            if b not in bs:
                bs.append(b)
                cs.append(256 + n)
                n += 1
        return dict(zip(bs, [chr(c) for c in cs]))

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            new_word = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        self._cache[token] = list(word)
        return list(word)

    def _encode_text(self, text: str) -> List[int]:
        import re

        pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\w]+|[^\s\w]+",
            re.IGNORECASE,
        )
        ids: List[int] = []
        for token in pat.findall(text.lower().strip()):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder.get(t, 0) for t in self._bpe(token))
        return ids

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        lowered = [t.lower() for t in texts]
        if self._native:
            # native handles lowercased pure-ASCII strings without special
            # tokens; everything else falls through to python below.
            # (The C++ table state is global — one vocab per process,
            # which is the only configuration tvc ships.)
            fast = [
                i
                for i, t in enumerate(lowered)
                if t.isascii() and "<|" not in t
            ]
            if len(fast) == len(texts):
                from tvc import native

                return native.bpe_encode_batch(
                    lowered, self.context_length, self.sot_id, self.eot_id,
                    self.pad_id,
                )
            if fast:
                from tvc import native

                out = np.full(
                    (len(texts), self.context_length), self.pad_id, np.int32
                )
                out[fast] = native.bpe_encode_batch(
                    [lowered[i] for i in fast], self.context_length,
                    self.sot_id, self.eot_id, self.pad_id,
                )
                fast_set = set(fast)
                for i, t in enumerate(texts):
                    if i not in fast_set:
                        ids = (
                            [self.sot_id]
                            + self._encode_text(t)[: self.context_length - 2]
                            + [self.eot_id]
                        )
                        out[i, : len(ids)] = ids
                return out
        out = np.full((len(texts), self.context_length), self.pad_id, dtype=np.int32)
        for i, t in enumerate(texts):
            ids = (
                [self.sot_id]
                + self._encode_text(t)[: self.context_length - 2]
                + [self.eot_id]
            )
            out[i, : len(ids)] = ids
        return out


class HFTokenizerWrapper:
    """transformers tokenizer from LOCAL files, adapted to the tvc
    contract: ``__call__(texts) -> [B, context_length] int32`` right-padded,
    with ``pad_id``/``sot_id``/``eot_id`` attributes and ``decode``."""

    def __init__(self, path: str, context_length: int = 512):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(str(path))
        self.context_length = context_length
        self.vocab_size = len(self.tok)
        eos = self.tok.eos_token_id
        pad = self.tok.pad_token_id
        self.eot_id = eos if eos is not None else self.vocab_size - 1
        self.pad_id = pad if pad is not None else self.eot_id
        bos = self.tok.bos_token_id
        self.sot_id = bos if bos is not None else self.eot_id

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.full(
            (len(texts), self.context_length), self.pad_id, dtype=np.int32
        )
        # one batched call straight into the Rust backend:
        # encode_batch_fast skips offset/overflow bookkeeping and the
        # BatchEncoding wrapper — 18.5 vs 33.6 ms per 256 paraphrase
        # prompts on the single-core host (this sits on the full-TVC
        # decode-dispatch critical path, bench.py config #4)
        backend = getattr(self.tok, "backend_tokenizer", None)
        if backend is not None:
            fast = getattr(backend, "encode_batch_fast", backend.encode_batch)
            batch = [e.ids for e in fast(list(texts), add_special_tokens=False)]
        else:
            batch = self.tok(list(texts), add_special_tokens=False)["input_ids"]
        for i, ids in enumerate(batch):
            ids = ids[: self.context_length]
            out[i, : len(ids)] = ids
        return out

    def decode(self, ids: Sequence[int]) -> str:
        return self.tok.decode(
            [int(i) for i in ids if int(i) != self.pad_id],
            skip_special_tokens=True,
        )

    def decode_batch(self, ids_batch) -> list:
        """Batched row decode (same pad/special filtering as ``decode``)."""
        rows = [
            [int(i) for i in row if int(i) != self.pad_id] for row in ids_batch
        ]
        return self.tok.batch_decode(rows, skip_special_tokens=True)


#: real Qwen2 tokenizer vocab size (bundled assets)
QWEN2_VOCAB = 151936


def get_tokenizer(
    vocab_size: int = 49408,
    context_length: int = 77,
    merges_path: Optional[str] = None,
) -> Callable[[Sequence[str]], np.ndarray]:
    """Return the best available tokenizer for the vocab size.

    * 49408 (CLIP): the REAL BPE by default — bundled assets under
      tvc/assets/clip_tokenizer/, overridable via arg or $TVC_CLIP_BPE;
    * 151936 (Qwen2): the real Qwen2 tokenizer — bundled assets under
      tvc/assets/qwen_tokenizer/, overridable via $TVC_QWEN_TOKENIZER
      (a merges.txt path or an HF tokenizer directory);
    * anything else (tiny test configs): the deterministic hash fallback.
    """
    if vocab_size == 49408:
        merges_path = merges_path or os.environ.get("TVC_CLIP_BPE")
        if merges_path and os.path.exists(merges_path):
            vocab_json = Path(merges_path).parent / "vocab.json"
            return BPETokenizer(
                merges_path, vocab_size, context_length,
                vocab_path=str(vocab_json) if vocab_json.exists() else None,
            )
        bundled = ASSET_DIR / "clip_tokenizer"
        if (bundled / "merges.txt").exists():
            return BPETokenizer(
                str(bundled / "merges.txt"), vocab_size, context_length,
                vocab_path=str(bundled / "vocab.json"),
            )
    if vocab_size == QWEN2_VOCAB:
        for cand in (
            merges_path or os.environ.get("TVC_QWEN_TOKENIZER"),
            ASSET_DIR / "qwen_tokenizer",
        ):
            if not cand:
                continue
            p = Path(cand)
            if p.is_file():  # legacy: a merges.txt path -> use its directory
                p = p.parent
            if (p / "vocab.json").exists():
                try:
                    return HFTokenizerWrapper(str(p), context_length)
                except Exception:
                    continue
    return HashTokenizer(vocab_size, context_length)
