"""MiniLM-class sentence encoder as a native Flax module (the flagship model).

A 6-layer, 384-hidden, 12-head BERT-style encoder with mean pooling + L2 norm — the
same architecture class the reference delegates to via sentence-transformers
`all-MiniLM-L6-v2` (semantic_aggregator.py:47). Implemented from scratch in Flax so
the whole encode path is one XLA program on TPU: embeddings -> N transformer blocks
(bf16 matmuls on the MXU) -> masked mean pool -> normalize.

Weights: `load_hf_weights(path)` maps a HuggingFace `model.safetensors` state dict
into the Flax params. In egress-free environments with no weight file, the model
random-initializes from a fixed seed — still useful as the flagship forward for
compile checks and compute benchmarks; retrieval quality then comes from the
HashedNGramEncoder default.

Tokenization: uses `transformers` AutoTokenizer when a local tokenizer dir is given;
otherwise a deterministic hashing tokenizer (stable blake2b word -> id) so the model
is runnable end-to-end offline.
"""
from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MiniLMConfig:
    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    intermediate: int = 1536
    max_positions: int = 512
    type_vocab: int = 2
    layer_norm_eps: float = 1e-12
    max_len: int = 128  # static sequence length for jit


class TransformerBlock(nn.Module):
    cfg: MiniLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = c.hidden
        # self-attention (post-LN, BERT-style)
        q = nn.Dense(h, name="q")(x)
        k = nn.Dense(h, name="k")(x)
        v = nn.Dense(h, name="v")(x)
        B, T, _ = x.shape
        hd = h // c.heads

        def split(t):
            return t.reshape(B, T, c.heads, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhtd,bhsd->bhts", split(q), split(k),
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
        attn = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("bhts,bhsd->bhtd", attn, split(v),
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, h)
        attn_out = nn.Dense(h, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_attn")(x + attn_out)
        # feed-forward
        ff = nn.Dense(c.intermediate, name="ff_in")(x)
        ff = jax.nn.gelu(ff, approximate=False)
        ff = nn.Dense(h, name="ff_out")(ff)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_ff")(x + ff)


class MiniLMModel(nn.Module):
    cfg: MiniLMConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B, T = ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden, name="tok_emb")(ids)
        pos = nn.Embed(c.max_positions, c.hidden, name="pos_emb")(
            jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)))
        typ = nn.Embed(c.type_vocab, c.hidden, name="type_emb")(jnp.zeros_like(ids))
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_emb")(tok + pos + typ)
        for i in range(c.layers):
            x = TransformerBlock(c, name=f"block_{i}")(x, mask)
        # masked mean pooling + L2 norm (sentence-transformers pooling contract)
        m = mask[..., None].astype(x.dtype)
        pooled = (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-9)
        return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)


_WORD_RE = re.compile(r"[a-zA-Z0-9]+|[^\sa-zA-Z0-9]")


def _hash_token_id(token: str, vocab: int) -> int:
    h = hashlib.blake2b(token.lower().encode("utf-8"), digest_size=8).digest()
    return 1000 + int.from_bytes(h, "little") % (vocab - 1000)


class MiniLMEncoder:
    CLS, SEP, PAD = 101, 102, 0

    def __init__(self, cfg: Optional[MiniLMConfig] = None, seed: int = 0,
                 weights_path: Optional[str] = None, tokenizer_path: Optional[str] = None):
        self.cfg = cfg or MiniLMConfig()
        self.name = "minilm-flax-l6-h384"
        self.dim = self.cfg.hidden
        self.model = MiniLMModel(self.cfg)
        dummy = jnp.zeros((1, self.cfg.max_len), dtype=jnp.int32)
        self.params = self.model.init(jax.random.PRNGKey(seed), dummy,
                                      jnp.ones_like(dummy))["params"]
        self._hf_tokenizer = None
        if tokenizer_path:
            try:  # pragma: no cover - needs local tokenizer files
                from transformers import AutoTokenizer
                self._hf_tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)
            except Exception:
                self._hf_tokenizer = None
        if weights_path:
            self.load_hf_weights(weights_path)
        self._forward = jax.jit(lambda p, ids, mask: self.model.apply({"params": p}, ids, mask))

    # -- tokenization --------------------------------------------------------
    def _tokenize(self, texts: List[str]) -> tuple[np.ndarray, np.ndarray]:
        T = self.cfg.max_len
        ids = np.full((len(texts), T), self.PAD, dtype=np.int32)
        mask = np.zeros((len(texts), T), dtype=np.int32)
        for i, text in enumerate(texts):
            if self._hf_tokenizer is not None:  # pragma: no cover
                enc = self._hf_tokenizer(text, truncation=True, max_length=T)
                row = enc["input_ids"][:T]
            else:
                toks = _WORD_RE.findall(text or "")[: T - 2]
                row = [self.CLS] + [_hash_token_id(t, self.cfg.vocab_size) for t in toks] + [self.SEP]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask

    # -- HF weight mapping ---------------------------------------------------
    def load_hf_weights(self, path: str) -> None:  # pragma: no cover - needs weight file
        """Map a HuggingFace BERT/MiniLM safetensors checkpoint into Flax params."""
        from safetensors.numpy import load_file
        sd = load_file(path)

        def g(k):
            return jnp.asarray(sd[k])

        p: Dict[str, Any] = dict(self.params)
        pre = "bert." if any(k.startswith("bert.") for k in sd) else ""
        p["tok_emb"] = {"embedding": g(f"{pre}embeddings.word_embeddings.weight")}
        p["pos_emb"] = {"embedding": g(f"{pre}embeddings.position_embeddings.weight")}
        p["type_emb"] = {"embedding": g(f"{pre}embeddings.token_type_embeddings.weight")}
        p["ln_emb"] = {"scale": g(f"{pre}embeddings.LayerNorm.weight"),
                       "bias": g(f"{pre}embeddings.LayerNorm.bias")}
        for i in range(self.cfg.layers):
            lp = f"{pre}encoder.layer.{i}."
            blk = {}
            for flax_name, hf_name in [("q", "attention.self.query"), ("k", "attention.self.key"),
                                       ("v", "attention.self.value"),
                                       ("attn_out", "attention.output.dense"),
                                       ("ff_in", "intermediate.dense"),
                                       ("ff_out", "output.dense")]:
                blk[flax_name] = {"kernel": g(lp + hf_name + ".weight").T,
                                  "bias": g(lp + hf_name + ".bias")}
            blk["ln_attn"] = {"scale": g(lp + "attention.output.LayerNorm.weight"),
                              "bias": g(lp + "attention.output.LayerNorm.bias")}
            blk["ln_ff"] = {"scale": g(lp + "output.LayerNorm.weight"),
                            "bias": g(lp + "output.LayerNorm.bias")}
            p[f"block_{i}"] = blk
        self.params = p

    # -- encoding ------------------------------------------------------------
    def encode_device(self, texts: List[str]) -> jnp.ndarray:
        if not texts:
            return jnp.zeros((0, self.dim), dtype=jnp.float32)
        ids, mask = self._tokenize(texts)
        return self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))

    def encode(self, texts: List[str]) -> np.ndarray:
        return np.asarray(self.encode_device(texts))
