"""Inference bridge for the learned span reader.

Sits between the typed fact chain (answer/qa.py) and generic span
scoring in answer/extractive.py::extract_answer: when the fact tables
don't know a question's relation (the schema-generalization gap the v5
eval measures), the trained SpanReader reads the same cleaned evidence
sentences and points at the answer, with its joint span probability as
the abstention signal.

This is the TPU-native counterpart of the reference's LLM read
(answer/generator.py:100): learned, schema-free, on-device — not
another hand rule. The model never saw any v1-v5 relation during
training (models/reader/data.py randomizes every relation surface), so
its answers here are zero-shot schema generalization by construction.
"""
from __future__ import annotations

import os
from functools import lru_cache
from typing import List, Optional, Tuple

import numpy as np

DEFAULT_CKPT = "checkpoints/reader.msgpack"


class ReaderAnswerer:
    """Loads a trained SpanReader checkpoint and answers from sentences."""

    def __init__(self, ckpt_path: str, d_model: int = 128,
                 n_layers: int = 2, min_conf: float = 0.25) -> None:
        import jax
        from flax import serialization

        from ahrag_tpu.models.reader.model import SpanReader

        self.min_conf = float(min_conf)
        self._model = SpanReader(d_model=d_model, n_layers=n_layers)
        # template params (correct tree structure) then load bytes
        from ahrag_tpu.models.reader.features import (N_SCALARS, SEQ_LEN)
        import jax.numpy as jnp
        z_i = jnp.zeros((1, SEQ_LEN), jnp.int32)
        z_f = jnp.zeros((1, SEQ_LEN, N_SCALARS), jnp.float32)
        z_b = jnp.zeros((1, SEQ_LEN), bool)
        params = self._model.init(jax.random.PRNGKey(0), z_i, z_i, z_f,
                                  z_i, z_b, z_b)
        with open(ckpt_path, "rb") as f:
            self._params = serialization.from_bytes(params, f.read())
        self._apply = jax.jit(self._model.apply)

    def answer(self, query: str, sentences: List[str],
               max_span_len: int = 6) -> Tuple[Optional[str], float]:
        """(answer text or None, confidence in [0, 1])."""
        from ahrag_tpu.models.reader.features import (best_span, decode_span,
                                                      featurize)
        fb, ev = featurize(query, sentences)
        if not ev.tokens:
            return None, 0.0
        s_log, e_log = self._apply(self._params, fb.word_ids, fb.stem_ids,
                                   fb.scalars, fb.segments, fb.mask,
                                   fb.ev_mask)
        from ahrag_tpu.models.reader.features import Q_LEN
        s = np.asarray(s_log)[0, Q_LEN:]
        e = np.asarray(e_log)[0, Q_LEN:]
        i, j, prob = best_span(s, e, ev, max_len=max_span_len)
        text = decode_span(ev, i, j).strip()
        if not text:
            return None, 0.0
        # never answer with a span the question already contains
        if text.lower() in query.lower():
            return None, prob
        return text, prob


@lru_cache(maxsize=2)
def get_reader(ckpt_path: str, min_conf: float = 0.25
               ) -> Optional[ReaderAnswerer]:
    """Cached reader; None when the checkpoint doesn't exist (reader off)."""
    if not ckpt_path or not os.path.exists(ckpt_path):
        return None
    try:
        return ReaderAnswerer(ckpt_path, min_conf=min_conf)
    except Exception:  # pragma: no cover - corrupt checkpoint must not break QA
        return None
