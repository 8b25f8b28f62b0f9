"""Mechanical template-disjointness audit for the v2 synthetic eval.

Round-2 verdict: the v1 eval was circular — answer/qa.py's fact patterns and
cue lexicons were one-to-one with eval/synth.py's corpus/question templates, so
F1 measured template coverage. The v2 corpus realizations must be PROVABLY
disjoint from the answerer's literals, and must stay that way as the answerer
evolves (lexically fitting qa.py to the v2 renderers would re-create the
circularity). This audit enforces, mechanically:

1. **No marker leaks into the answerer.** Every phrase in
   ``synth.V2_RELATION_MARKERS`` must not occur — as a phrase — anywhere in the
   sources of ``answer/qa.py`` or ``answer/extractive.py`` (comments included),
   and no content token (len >= 5) of any marker may equal or contain a token
   drawn from those modules' *string literals* (the matchable logic: regexes
   and cue lexicons live in literals). A short blocklist extends the token rule
   to the relation-critical short stems (cast/born/star/helm/made/set).
2. **Markers are live.** Every marker must actually occur in the generated v2
   corpus across the three frozen splits — the marker list cannot go stale.
3. **No v1 template leaks into v2 text.** The v1 relation phrases
   (``directed by``, ``founded by``, ``headquarters of`` ...) must not occur in
   any v2 paragraph.

Run: ``python tools/audit_synth_disjoint.py [--out report.json]``; exits 1 on
any violation. Wrapped as a CI test in tests/test_synth_v2.py.
"""
from __future__ import annotations

import argparse
import ast
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ahrag_tpu.eval import synth

ANSWER_SOURCES = ["ahrag_tpu/answer/qa.py", "ahrag_tpu/answer/extractive.py",
                  # the reader's meta-training generator: its word pools
                  # leaking a marker would train the "zero-shot" model on
                  # the very surfaces v5 holds out
                  "ahrag_tpu/models/reader/data.py"]

# v1 corpus relation phrases (eval/synth.py v1 renderers) that must not appear
# in v2 paragraphs — v2 text carrying v1 phrasing would silently re-enable the
# v1-fit extraction patterns
V1_RELATION_PHRASES = [
    "directed by", "stars ", "founded by", "is an organization",
    "headquarters of", "is a city in", "set in", "released in",
    "was born in", "began working as",
]

# relation-critical stems shorter than the 5-char token rule
SHORT_STEM_BLOCKLIST = {"cast", "born", "star", "helm", "made", "set", "hq"}

# function words carry no relation semantics: an answerer containing a bare
# preposition/determiner (e.g. a sentence-starter stoplist) cannot match a
# fact through it, so marker tokens in this closed class are not violations
FUNCTION_WORD_WHITELIST = {"among", "since", "over", "under", "between",
                           "about", "after", "before", "during", "while",
                           "where", "there", "their", "these", "those",
                           "through"}

_TOKEN_RE = re.compile(r"[a-z]+")


def _source_literal_tokens(path: str) -> set:
    """Tokens (len >= 5) drawn from the module's string literals, EXCLUDING
    docstrings — prose about the code is not matchable logic; regexes and cue
    lexicons are."""
    with open(path, encoding="utf-8") as fh:
        tree = ast.parse(fh.read())
    docstrings = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            body = getattr(node, "body", [])
            if (body and isinstance(body[0], ast.Expr)
                    and isinstance(body[0].value, ast.Constant)
                    and isinstance(body[0].value.value, str)):
                docstrings.add(id(body[0].value))
    toks = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Constant) and isinstance(node.value, str)
                and id(node) not in docstrings):
            toks.update(t for t in _TOKEN_RE.findall(node.value.lower())
                        if len(t) >= 5)
    return toks


def _v2_corpus_text() -> str:
    """Generated v2 + v5 corpus text (v5 worlds are v2 renderers plus the
    held-out relation extras, so this single corpus serves the liveness check
    for both marker sets)."""
    import random
    parts = []
    for seed in synth.SPLIT_SEEDS_V2.values():
        world = synth.make_world(random.Random(seed), version="v2")
        for sents in world["paragraphs"].values():
            parts.append(" ".join(sents))
    for seed in synth.SPLIT_SEEDS_V5.values():
        rng = random.Random(seed)
        world = synth.make_world(rng, n_orgs=14, version="v2")
        synth.attach_v5_extras(world, rng)
        for sents in world["paragraphs"].values():
            parts.append(" ".join(sents))
    return "\n".join(parts).lower()


def run_audit(repo_root: str) -> dict:
    violations = []
    src_text = ""
    src_tokens = set()
    for rel in ANSWER_SOURCES:
        path = os.path.join(repo_root, rel)
        with open(path, encoding="utf-8") as fh:
            src_text += fh.read().lower()
        src_tokens |= _source_literal_tokens(path)

    markers = [(name, m) for name, ms in synth.V2_RELATION_MARKERS.items()
               for m in ms]
    markers += [(f"v5:{name}", m)
                for name, ms in synth.V5_RELATION_MARKERS.items() for m in ms]

    # 1) phrase + token disjointness vs the answerer sources
    for name, marker in markers:
        ml = marker.lower()
        if ml in src_text:
            violations.append(f"marker phrase '{marker}' ({name}) occurs in an "
                              f"answerer source")
        for tok in _TOKEN_RE.findall(ml):
            if any(tok.startswith(stem) for stem in SHORT_STEM_BLOCKLIST):
                violations.append(f"marker token '{tok}' ({name}) hits the "
                                  f"short-stem blocklist")
            if len(tok) < 5 or tok in FUNCTION_WORD_WHITELIST:
                continue
            for st in src_tokens:
                if tok == st or st in tok:
                    violations.append(f"marker token '{tok}' ({name}) collides "
                                      f"with answerer literal token '{st}'")

    # 2) every marker is live in the generated v2 corpus
    corpus = _v2_corpus_text()
    for name, marker in markers:
        if marker.lower() not in corpus:
            violations.append(f"marker '{marker}' ({name}) never occurs in the "
                              f"generated v2 corpus (stale marker list)")

    # 3) no v1 relation phrase leaks into v2 paragraphs
    for phrase in V1_RELATION_PHRASES:
        if phrase.lower() in corpus:
            violations.append(f"v1 relation phrase '{phrase}' occurs in the v2 "
                              f"corpus")

    return {
        "markers_checked": len(markers),
        "answer_sources": ANSWER_SOURCES,
        "source_literal_tokens": len(src_tokens),
        "v1_phrases_checked": len(V1_RELATION_PHRASES),
        "violations": violations,
        "ok": not violations,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    report = run_audit(repo_root)
    text = json.dumps(report, indent=2)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(text + "\n")
    print(text)
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
