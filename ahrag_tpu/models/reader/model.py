"""SpanReader: a small flax transformer that points at answer spans.

TPU-first design choices:
- static shapes everywhere (SEQ_LEN tokens, fixed scalar channel count)
  so one compiled program serves every question;
- d_model 128 keeps every matmul lane-aligned on the MXU; attention is
  plain dot-product over 352 tokens — tiny, fully fused by XLA;
- the forward is pure and jittable; training wraps it in one jitted
  update scanned over many steps per dispatch (train.py) so tunnel RTT
  never dominates device time.

Counterpart being replaced: the reference's LLM read of the evidence
(answer/generator.py:100). The reader consumes hashed token identities
plus structural scalars (features.py) and emits start/end logits over
evidence positions.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ahrag_tpu.models.reader.features import (N_SCALARS, SEQ_LEN, STEM_VOCAB,
                                              WORD_VOCAB)


class ReaderConfig:
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 2
    d_ff: int = 256

    def __init__(self, d_model: int = 128, n_heads: int = 4,
                 n_layers: int = 2, d_ff: int = 256) -> None:
        self.d_model, self.n_heads = d_model, n_heads
        self.n_layers, self.d_ff = n_layers, d_ff


class _Block(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        attn_mask = mask[:, None, None, :]  # [B, 1, 1, L] keys
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model)(
                h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.d_ff)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model)(h)
        return x + h


class SpanReader(nn.Module):
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 2
    d_ff: int = 256

    @nn.compact
    def __call__(self, word_ids: jnp.ndarray, stem_ids: jnp.ndarray,
                 scalars: jnp.ndarray, segments: jnp.ndarray,
                 mask: jnp.ndarray, ev_mask: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = self.d_model
        x = (nn.Embed(WORD_VOCAB, d, name="word_emb")(word_ids)
             + nn.Embed(STEM_VOCAB, d, name="stem_emb")(stem_ids)
             + nn.Dense(d, name="scalar_proj")(scalars)
             + nn.Embed(2, d, name="segment_emb")(segments)
             + self.param("pos_emb", nn.initializers.normal(0.02),
                          (SEQ_LEN, d))[None, :, :])
        x = nn.LayerNorm()(x)
        for i in range(self.n_layers):
            x = _Block(d, self.n_heads, self.d_ff, name=f"block_{i}")(x, mask)
        x = nn.LayerNorm(name="final_ln")(x)
        start = nn.Dense(1, name="start_head")(x).squeeze(-1)
        end = nn.Dense(1, name="end_head")(x).squeeze(-1)
        neg = jnp.finfo(start.dtype).min
        start = jnp.where(ev_mask, start, neg)
        end = jnp.where(ev_mask, end, neg)
        return start, end
