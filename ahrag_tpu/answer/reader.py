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
import re
from functools import lru_cache
from typing import List, Optional, Tuple

import numpy as np

DEFAULT_CKPT = "checkpoints/reader.msgpack"

_TOKEN_RE = re.compile(r"[A-Za-z0-9][\w']*")
_STOP = {"the", "a", "an", "of", "in", "on", "at", "to", "for", "by", "from",
         "with", "and", "or", "is", "are", "was", "were", "did", "does", "do",
         "who", "whom", "what", "which", "where", "when", "why", "how", "that",
         "this", "it", "its", "their", "his", "her", "as", "be", "been"}


def select_evidence(query: str, sentences: List[str],
                    budget: int = 320) -> List[str]:
    """Dedupe and budget-select evidence sentences for the reader.

    Pipeline contexts repeat node text (skeleton + details + expansion all
    render the same sentence) and routinely exceed the reader's fixed
    evidence window. Duplicates split the span softmax across identical
    positions (confidence dilution), and arrival-order truncation can cut
    the answer sentence entirely. So: keep the FIRST occurrence of each
    distinct sentence, and when the dedup'd evidence still exceeds the
    token budget, keep the sentences most lexically entangled with the
    question (content-word/stem overlap + capitalized-anchor hits),
    in original order, until the budget fills. Paragraph seams (""
    sentinels) are preserved between kept sentences so the model's
    per-paragraph novelty features keep their meaning.
    """
    q_toks = _TOKEN_RE.findall(query)
    q_content = {t.lower() for t in q_toks
                 if t.lower() not in _STOP and len(t) > 2}
    q_stems = {w[:4] for w in q_content}
    q_caps = {t.lower() for t in q_toks if t[:1].isupper()}

    # dedupe, tracking paragraph id per kept sentence
    kept: List[Tuple[int, str, List[str]]] = []   # (para, text, tokens)
    seen = set()
    para = 0
    for s in sentences:
        if s == "":
            para += 1
            continue
        key = " ".join(_TOKEN_RE.findall(s.lower()))
        if not key or key in seen:
            continue
        seen.add(key)
        kept.append((para, s, _TOKEN_RE.findall(s)))

    total = sum(len(t) for _, _, t in kept)
    if total > budget:
        def score(entry):
            _, _, toks = entry
            low = {t.lower() for t in toks}
            stems = {t.lower()[:4] for t in toks}
            ov = sum(1 for w in q_content if w in low or w[:4] in stems)
            anchor = sum(1 for w in q_caps if w in low)
            return ov / max(1, len(q_content)) + anchor
        order = sorted(range(len(kept)), key=lambda i: -score(kept[i]))
        chosen = set()
        used = 0
        for i in order:
            n = len(kept[i][2])
            if used + n > budget and chosen:
                continue
            chosen.add(i)
            used += n
            if used >= budget:
                break
        kept = [kept[i] for i in sorted(chosen)]

    out: List[str] = []
    prev_para = None
    for p, s, _ in kept:
        if prev_para is not None and p != prev_para:
            out.append("")
        out.append(s)
        prev_para = p
    return out


_YEAR_SHAPE = re.compile(r"^(1[5-9]\d{2}|20\d{2})$")
_NUM_SHAPE = re.compile(r"^\d+(?:\.\d+)?$")


_YEAR_Q = re.compile(r"\b(?:what|which)\s+year\b|\bwhen\b|\bin what year\b",
                     re.IGNORECASE)
_WHO_Q = re.compile(r"^\s*(?:who|whom)\b|\bname the (?:person|figure)\b"
                    r"|\bto whom\b|\bwith whom\b",
                    re.IGNORECASE)
# occupation/vocation-intent questions expect a lowercase noun answer —
# question-intent vocabulary (general English), not relation vocabulary
_NOUN_Q = re.compile(r"\b(?:occupation|profession|vocation|trade|calling)\b"
                     r"|\bline of work\b|\b(?:make|earn)s? a living\b"
                     r"|\bdo(?:es)? .{0,40}for a living\b",
                     re.IGNORECASE)


def expected_shape(query: str) -> Optional[str]:
    """Coarse expected answer shape from the question word alone — generic
    English, no relation vocabulary (the v5 disjointness discipline)."""
    if _YEAR_Q.search(query):
        return "year"
    if _NOUN_Q.search(query):
        return "noun"
    if _WHO_Q.search(query):
        return "name"
    return None


def answer_shape(text: str) -> str:
    """Coarse span shape for per-type confidence calibration."""
    t = text.strip()
    if _YEAR_SHAPE.match(t):
        return "year"
    if _NUM_SHAPE.match(t):
        return "number"
    if t[:1].isupper():
        return "name"
    return "noun"


class ReaderAnswerer:
    """Loads a trained SpanReader checkpoint and answers from sentences."""

    #: per-shape confidence at which the reader PRE-EMPTS span scoring (vs
    #: min_conf, below which it never answers; between the two it only
    #: answers when span scoring found nothing — see
    #: extractive.py::extract_answer). Round-4 used one global 0.95, set
    #: where year reads were never observed wrong; round 5 calibrates per
    #: answer SHAPE on v5 DEV probes (tools/calibrate_reader.py writes
    #: reports/reader_calibration_r5.json; test split untouched): each
    #: shape's threshold is the lowest band whose dev precision is 1.0.
    hi_conf_by_shape = {"year": 0.95, "number": 0.95, "name": 0.95,
                        "noun": 0.95}

    @property
    def hi_conf(self) -> float:  # back-compat floor for external readers
        return min(self.hi_conf_by_shape.values())

    def hi_conf_for(self, text: str) -> float:
        return self.hi_conf_by_shape.get(answer_shape(text), 0.95)

    def __init__(self, ckpt_path: str, d_model: Optional[int] = None,
                 n_layers: Optional[int] = None, min_conf: float = 0.25
                 ) -> None:
        import jax
        from flax import serialization

        from ahrag_tpu.models.reader.model import SpanReader

        # the trainer writes <ckpt-stem>_curve.json with the architecture;
        # read it so checkpoints self-describe (a mismatched template makes
        # from_bytes fail and get_reader silently disables the reader)
        if d_model is None or n_layers is None:
            meta_path = re.sub(r"\.msgpack$", "", ckpt_path) + "_curve.json"
            try:
                import json
                with open(meta_path) as f:
                    meta = json.load(f)
                d_model = d_model or int(meta.get("d_model", 128))
                n_layers = n_layers or int(meta.get("n_layers", 2))
            except (OSError, ValueError):
                d_model, n_layers = d_model or 128, n_layers or 2

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

    def _read(self, query: str, window: List[str],
              max_span_len: int = 6) -> Tuple[Optional[str], float]:
        """One forward read of an already-selected evidence window."""
        from ahrag_tpu.models.reader.features import (Q_LEN, best_span,
                                                      decode_span, featurize)
        fb, ev = featurize(query, window)
        if not ev.tokens:
            return None, 0.0
        s_log, e_log = self._apply(self._params, fb.word_ids, fb.stem_ids,
                                   fb.scalars, fb.segments, fb.mask,
                                   fb.ev_mask)
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

    def answer(self, query: str, sentences: List[str],
               max_span_len: int = 6) -> Tuple[Optional[str], float]:
        """(answer text or None, confidence in [0, 1]).

        Two-window bridge mode (VERDICT r4 item 3): when the first read
        returns a NAME span where the question's answer type wants a year,
        or the read is weak, that name is treated as a bridge entity — the
        evidence window is re-selected with the name's tokens added to the
        anchor set (pulling in the bridge entity's own paragraph, which has
        zero lexical overlap with the question and so loses the first
        window's budget contest), and the SAME question is read again over
        the new window. Accepted only on answer-type agreement or a clear
        confidence gain, so a correct first read is never displaced.
        """
        from ahrag_tpu.models.reader.features import E_LEN
        text, prob = self._read(query, select_evidence(query, sentences,
                                                       budget=E_LEN),
                                max_span_len)
        exp = expected_shape(query)
        if (text and answer_shape(text) == "name"
                and (exp in ("year", "noun") or prob < 0.5)):
            win2 = select_evidence(query + " " + text, sentences,
                                   budget=E_LEN)
            t2, p2 = self._read(query, win2, max_span_len)
            if t2:
                if exp in ("year", "noun") and answer_shape(t2) == exp:
                    return t2, p2
                if exp is None and t2 != text and p2 > max(prob, 0.35):
                    return t2, p2
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
