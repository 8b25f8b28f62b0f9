"""Extractive answer spotting for the LLM-free answer path.

The reference's deterministic fallback pastes evidence snippets into the answer
(generator.py:128-217), which floors F1/EM. This module does better without any
model: type the question (who / when / which-X / where / how-many), collect typed
candidate spans (proper-name runs, years, numbers) from the evidence sentences,
and score them by keyword co-occurrence with the question — minus the spans the
question itself already contains (asking "Who directed Ed Wood?" must not answer
"Ed Wood").

Pure string processing; deterministic; used by AnswerGenerator before its
snippet-synthesis fallback.
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

_NAME_RE = re.compile(r"\b[A-Z][a-zA-Z']+(?:\s+(?:of|the|[A-Z][a-zA-Z']+))*\b")
_YEAR_RE = re.compile(r"\b(1[5-9]\d{2}|20\d{2})\b")
_NUM_RE = re.compile(r"\b\d+(?:\.\d+)?\b")
_SENT_SPLIT = re.compile(r"(?<=[.!?。])\s+")
_CAP_STOP = {"The", "He", "She", "It", "In", "On", "At", "A", "An", "This", "That",
             "They", "His", "Her", "Its", "After", "Before", "When", "While",
             "During", "From", "For", "With", "And", "But", "Or", "Who", "What",
             "Which", "Where", "Why", "How", "Entity", "Summary", "Relation",
             "Keywords", "Evidence", "Based"}
_STOPWORDS = {"the", "a", "an", "of", "in", "on", "at", "to", "for", "by", "from",
              "with", "and", "or", "is", "are", "was", "were", "did", "does", "do",
              "who", "what", "which", "where", "when", "why", "how", "that", "this",
              "it", "its", "their", "his", "her", "as", "be", "been"}


def _question_type(query: str) -> Tuple[str, Optional[str]]:
    """(type, focus-noun) — type in {who, year, number, which, where, general}."""
    ql = query.lower()
    if re.search(r"\bwho\b|\bwhom\b", ql):
        return "who", None
    if re.search(r"\bwhen\b|\bwhat year\b|\bin which year\b|\bwhich year\b", ql):
        return "year", None
    if re.search(r"\bhow (many|much)\b", ql):
        return "number", None
    m = re.search(r"\b(?:which|what)\s+([a-z]+)", ql)
    if m and m.group(1) not in _STOPWORDS:
        return "which", m.group(1)
    if re.search(r"\bwhere\b", ql):
        return "where", None
    return "general", None


def _keywords(query: str) -> List[str]:
    return [w for w in re.findall(r"[a-z0-9]+", query.lower())
            if w not in _STOPWORDS and len(w) > 2]


def _clean_sentences(context_text: str) -> List[str]:
    """Evidence text -> plain sentences (strip skeleton/detail markers and ids)."""
    lines = []
    for raw in context_text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        line = re.sub(r"^\- \[[^\]]*\]\s*\([a-z]*\)\s*", "", line)
        line = re.sub(r"^\[DETAIL:[^\]]*\]\s*", "", line)
        line = re.sub(r"^\[KEEP:[^\]]*\]\s*", "", line)
        line = line.replace("::", ". ")
        if line:
            lines.append(line)
    text = " ".join(lines)
    return [s.strip() for s in _SENT_SPLIT.split(text) if s.strip()]


def _name_spans(sentence: str) -> List[str]:
    spans = []
    for m in _NAME_RE.finditer(sentence):
        span = m.group(0).strip()
        words = span.split()
        while words and words[0] in _CAP_STOP:
            words = words[1:]
        while words and words[-1].lower() in {"of", "the"}:
            words = words[:-1]
        if not words:
            continue
        span = " ".join(words)
        if span and span not in spans:
            spans.append(span)
    return spans


_VERB_HINTS = {"won", "wins", "stars", "made"}


def _question_verbs(keywords: List[str]) -> List[str]:
    """Verb-ish question keywords ('directed', 'attended', 'won', ...)."""
    return [k for k in keywords if k.endswith("ed") or k in _VERB_HINTS]


def _agent_signal(span_l: str, s_lower: str, verbs: List[str]) -> float:
    """Verb-argument structure for who-questions: '<verb> by <span>' and
    '<span> <verb>' mark the agent; 'as ... <span>' marks a role apposition
    (an object complement, not the asked-for agent). Positive = agent evidence."""
    signal = 0.0
    for verb in verbs:
        if f"{verb} by {span_l}" in s_lower:
            signal += 2.5
        if f"{span_l} {verb}" in s_lower:
            signal += 1.5
    pos = s_lower.find(span_l)
    if pos > 0:
        preceding = s_lower[max(0, pos - 40):pos]
        if re.search(r"\bas (a |an |the )?[a-z ]*$", preceding):
            signal -= 2.0
    return signal


def extract_answer(query: str, context_text: str) -> Optional[str]:
    """Best typed answer span from the evidence, or None when nothing scores."""
    qtype, focus = _question_type(query)
    keywords = _keywords(query)
    if not keywords:
        return None
    query_lower = query.lower()
    verbs = _question_verbs(keywords)
    # (tier, tie, score): tier 1 = the span sits in the agent position of a
    # question verb with decent keyword support — such candidates dominate plain
    # keyword co-occurrence (which is fooled by role appositions and distractors).
    # Among tier-1 candidates keyword overlap dominates pattern strength, so a
    # distractor sharing only the verb can't beat the sentence about the asked
    # entity.
    best: Tuple[int, float, float, str] | None = None

    for sentence in _clean_sentences(context_text):
        s_lower = sentence.lower()
        overlap = sum(1 for k in keywords if k in s_lower)
        if overlap == 0:
            continue
        if qtype == "year":
            cands = _YEAR_RE.findall(sentence)
        elif qtype == "number":
            cands = _NUM_RE.findall(sentence)
        else:
            cands = _name_spans(sentence)
        for span in cands:
            span_l = span.lower()
            if span_l in query_lower:
                continue  # the question already contains it
            score = float(overlap)
            tier = 0
            if qtype == "which" and focus:
                if focus in span_l:
                    score += 2.0
                elif focus not in s_lower:
                    score -= 0.5
            if qtype == "who":
                if " " in span:  # prefer multi-word proper names
                    score += 0.5
                signal = _agent_signal(span_l, s_lower, verbs)
                score += signal
                if signal > 0 and overlap >= 2:
                    tier = 1
            # light penalty for spans made of generic words
            if all(w.lower() in _STOPWORDS for w in span.split()):
                continue
            tie = float(overlap) if tier == 1 else -1.0
            if best is None or (tier, tie, score) > (best[0], best[1], best[2]):
                best = (tier, tie, score, span)
    if best and best[2] >= 2.0:
        return best[3]
    return None
