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
_NUMWORD_RE = re.compile(r"\b(one|two|three|four|five|six|seven|eight|nine|ten|"
                         r"eleven|twelve|twenty|thirty|hundred)\b", re.IGNORECASE)
# split after sentence-final punctuation, including the description-joiner
# form "<snippet>.; <snippet>". A BARE semicolon stays inside its sentence:
# it coordinates clauses that share the discourse topic ("On <Film>, the
# camera answered to X; <second clause about the same film>") — splitting
# there severs the second clause from the film and the fact layer loses it.
_SENT_SPLIT = re.compile(r"(?<=[.!?。])(?:\s*;\s*|\s+)")
_CAP_STOP = {"The", "He", "She", "It", "In", "On", "At", "A", "An", "This", "That",
             "They", "His", "Her", "Its", "After", "Before", "When", "While",
             "During", "From", "For", "With", "And", "But", "Or", "Who", "What",
             "Which", "Where", "Why", "How", "Entity", "Summary", "Relation",
             "Keywords", "Evidence", "Based", "Among", "Since", "Over",
             "Under", "Between", "To", "Of", "By"}
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
    m = re.search(r"\b(?:which|what)\s+(?:\d+\s+)*([a-z]+)", ql)
    if m and m.group(1) not in _STOPWORDS:
        return "which", m.group(1)
    if re.search(r"\bwhere\b", ql):
        return "where", None
    return "general", None


def _keywords(query: str) -> List[str]:
    return [w for w in re.findall(r"[a-z0-9]+", query.lower())
            if w not in _STOPWORDS and len(w) > 2]


_SKELETON_RE = re.compile(r"^\- \[([^\]]+)\]\s*\([a-z]*\)\s*(.*)$")
_DETAIL_RE = re.compile(r"^\[DETAIL:([^\]]+)\]\s*(.*)$")
_PRONOUN_RE = re.compile(r"^(?:He|She|It|They)\b")
_HEADER_RE = re.compile(r"===\s*([^=]+?)\s*===")
_PROPER_NAME_RE = re.compile(r"^[A-Z][\w.'-]*(?: [A-Z][\w.'-]*)*$")


def _subject_name(raw: Optional[str]) -> Optional[str]:
    """A usable coref subject: a proper name ('Kathryn Bigelow'), possibly with a
    parenthetical dropped ('Ed Wood (film)' -> 'Ed Wood'); topic-word titles
    ('directed / academy / scott') are not subjects."""
    if not raw:
        return None
    name = re.sub(r"\s*\([^)]*\)\s*$", "", raw.strip())
    return name if _PROPER_NAME_RE.match(name) else None


def _clean_sentences(context_text: str) -> List[str]:
    """Evidence text -> plain sentences (strip skeleton/detail markers and ids).

    Evidence excerpts routinely state the decisive fact with a pronoun subject
    ("He directed ...") because the name lives in the section header or the
    block's skeleton entry — fatal for span scoring, which needs name and fact
    in one sentence. Sentence-leading pronouns are resolved to the governing
    subject: the most recent ``=== Section ===`` header inside the block, else
    the block's owning node name (from the ``[DETAIL:<id>]`` / skeleton-line
    mapping) — unless that subject is itself named later in the sentence (then
    the pronoun refers to someone else: "He directed ..., starring <owner>").
    """
    names: dict = {}
    blocks: List[tuple] = []  # (owner_name_or_None, text)
    owner: Optional[str] = None
    cur: List[str] = []

    def flush() -> None:
        if cur:
            blocks.append((owner, " ".join(cur)))
            cur.clear()

    for raw in context_text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        m = _SKELETON_RE.match(line)
        if m:
            nid, rest = m.groups()
            name = rest.split("::", 1)[0].strip()
            if name:
                names[nid] = name
            flush()
            owner = name or None  # continuation lines stay owned by this node
            # start the block with the entry text so hard-wrapped continuation
            # lines rejoin their sentence instead of splitting it mid-clause
            cur.append(rest.replace("::", ". "))
            continue
        m = _DETAIL_RE.match(line)
        if m:
            flush()
            owner = names.get(m.group(1))
            if m.group(2):
                cur.append(m.group(2).replace("::", ". "))
            continue
        line = re.sub(r"^\[KEEP:[^\]]*\]\s*", "", line)
        line = line.replace("::", ". ")
        if line.strip():
            cur.append(line.strip())
    flush()

    out: List[str] = []
    for block_owner, text in blocks:
        if out and out[-1] != "":
            # block-boundary sentinel: consecutive sentences in the flattened
            # list can come from DIFFERENT evidence blocks (different source
            # paragraphs) — topic-continuity inheritance across the seam
            # fabricates facts (a subject-less location sentence from one org
            # inheriting another org's subject). extract_facts resets its
            # running subject on the empty string.
            out.append("")
        # section headers switch the governing subject within the block
        subject = _subject_name(block_owner)
        parts = _HEADER_RE.split(text)  # [text, header, text, header, text...]
        for i, part in enumerate(parts):
            if i % 2 == 1:  # header
                subject = _subject_name(part) or subject
                continue
            for s in _SENT_SPLIT.split(part):
                s = s.strip()
                if not s:
                    continue
                # summary bodies concatenate MEMBER snippets under lowercase
                # slash-joined topic-title prefixes. The prefix is a
                # member-boundary seam: the sentences after it come from a
                # DIFFERENT source paragraph than the ones before, so the
                # running subject must reset or a subject-less snippet
                # inherits the wrong owner (observed: one org's location
                # sentence attributed to another org).
                tm = re.match(r"^[;,]?\s*([a-z][\w'-]*(?: / [a-z][\w'-]*)+)"
                              r"\s*:\s*(.*)$", s)
                if tm:
                    out.append("")
                    s = tm.group(2).strip()
                    if not s:
                        continue
                # only resolve into COMPLETE sentences — substituting into a
                # brief truncated mid-clause ("He directed ..., which starred")
                # fabricates facts about the subject
                if (subject and s[-1] in ".!?。"
                        and subject.lower() not in s.lower()):
                    s = _PRONOUN_RE.sub(subject, s)
                out.append(s)
    return out


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


def extract_answer(query: str, context_text: str,
                   allow_span_scoring: bool = True,
                   reader=None) -> Optional[str]:
    """Best typed answer span from the evidence, or None when nothing scores.

    Tries the typed fact-KB chain first (answer/qa.py — handles paraphrased
    relation vocabulary and one-hop bridge questions structurally), then the
    learned span reader when one is supplied (answer/reader.py — the
    schema-free path for relations the fact tables don't know), then falls
    back to span scoring. ``allow_span_scoring=False`` stops after the fact
    chain — used for comparison questions, where a scored name span can never
    be the (yes/no) answer."""
    from ahrag_tpu.answer.qa import answer_from_facts, unanswerable
    sentences = _clean_sentences(context_text)
    fact_answer = answer_from_facts(query, sentences)
    if fact_answer:
        return fact_answer
    # abstention precedes span scoring: when every named entity is absent
    # from the evidence, any scored span is a distractor artifact — saying so
    # beats a confident wrong answer (squad_v2 no-answer behavior)
    if unanswerable(query, sentences):
        return "unanswerable"
    if not allow_span_scoring:
        return None
    # learned reader, two thresholds: above hi_conf it pre-empts span
    # scoring (it is reading the evidence, the scorer is pattern-matching);
    # between min_conf and hi_conf it only answers when span scoring finds
    # nothing — so a mildly-confident read can never displace a span the
    # scorer already supports, it can only fill a blank.
    reader_ans: Optional[str] = None
    reader_conf = 0.0
    if reader is not None:
        reader_ans, reader_conf = reader.answer(query, sentences)
        if reader_ans and reader_conf >= getattr(reader, "hi_conf", 0.6):
            return reader_ans
        if reader_ans and reader_conf < reader.min_conf:
            reader_ans = None
    qtype, focus = _question_type(query)
    keywords = _keywords(query)
    if not keywords:
        return reader_ans
    query_lower = query.lower()
    verbs = _question_verbs(keywords)
    # (tier, tie, score): tier 1 = the span sits in the agent position of a
    # question verb with decent keyword support — such candidates dominate plain
    # keyword co-occurrence (which is fooled by role appositions and distractors).
    # Among tier-1 candidates keyword overlap dominates pattern strength, so a
    # distractor sharing only the verb can't beat the sentence about the asked
    # entity.
    best: Tuple[int, float, float, str] | None = None

    # proper-name spans the question itself contains: sentences about the
    # asked entity stay candidates for place questions even when the question
    # paraphrases every relation word — it still names the org, and the org's
    # own sentences are where the place lives
    q_entities = [s.lower() for s in _name_spans(query)]

    for sentence in sentences:
        s_lower = sentence.lower()
        overlap = sum(1 for k in keywords if k in s_lower)
        if overlap == 0:
            if qtype in ("where", "which") and any(e in s_lower
                                                  for e in q_entities):
                overlap = 1  # entity-anchored sentence
            else:
                continue
        if qtype == "year":
            cands = _YEAR_RE.findall(sentence)
        elif qtype == "number":
            # spelled-out counts answer how-many at least as often as digits
            cands = _NUM_RE.findall(sentence) + _NUMWORD_RE.findall(sentence)
        else:
            cands = _name_spans(sentence)
        for span in cands:
            span_l = span.lower()
            if span_l in query_lower:
                continue  # the question already contains it
            score = float(overlap)
            tier = 0
            # keyword proximity: among same-sentence candidates the span
            # adjacent to the matched keywords wins ("<S> carries the leading
            # role" must answer S, not the name 40 chars upstream) — a generic
            # locality cue, no relation vocabulary involved
            spos_prox = s_lower.find(span_l)
            if spos_prox >= 0:
                dists = [abs(spos_prox - s_lower.find(k))
                         for k in keywords if k in s_lower]
                if dists and min(dists) <= 40:
                    score += 1.0 - min(dists) / 80.0
            if qtype == "which" and focus:
                # 'Which <focus> ...' — candidates tied to the focus noun (in
                # the span or its sentence) dominate ones that merely share
                # keywords ('Which Marvel film...' must not answer a person)
                if focus in span_l:
                    score += 2.0
                    tier = 1
                elif focus in s_lower:
                    tier = 1
                    # appositive proximity: "...superhero film Doctor Strange"
                    # names the focus immediately before the span
                    fpos = s_lower.find(focus)
                    spos = s_lower.find(span_l)
                    if 0 <= spos - fpos <= len(focus) + 20:
                        score += 1.5
                else:
                    score -= 0.5
            if qtype != "who":  # who has its own verb-argument logic below
                # object position: the word right before the span (through
                # articles/prepositions) is a question keyword — "attended
                # Duke University", "born in 1966", "received two Academy..."
                m = re.search(r"(\w+)\s+(?:(?:the|a|an|in|at|on|of)\s+)*"
                              + re.escape(span_l), s_lower)
                if (m and m.group(1).isalpha()  # content word, not a number
                        and any(m.group(1).startswith(k[:6]) for k in keywords)):
                    score += 1.5
            if qtype == "number" and _YEAR_RE.fullmatch(span):
                score -= 1.0  # a year is rarely the answer to "how many"
            if qtype == "who":
                if " " in span:  # prefer multi-word proper names
                    score += 0.5
                if (span.startswith(("The ", "A ", "An "))
                        or f"the {span_l}" in s_lower
                        or f"an {span_l}" in s_lower):
                    # a who-question asks for a person; determiner-led spans
                    # are titles/works, not people (generic shape cue; the
                    # span extractor strips the leading article, so check the
                    # sentence context too)
                    score -= 2.5
                if any(k in span_l.split() for k in keywords):
                    # a span built from the question's own words names the
                    # thing asked ABOUT, not the person asked FOR ("Best
                    # Picture" for a Best-Director question)
                    score -= 1.5
                signal = _agent_signal(span_l, s_lower, verbs)
                score += signal
                # tier dominance only for the question's MAIN verb (the first:
                # "Who directed the film that starred X" asks about directing;
                # an agent of the relative-clause verb is not the answer)
                if (verbs and overlap >= 2
                        and _agent_signal(span_l, s_lower, verbs[:1]) > 0):
                    tier = 1
            # light penalty for spans made of generic words
            if all(w.lower() in _STOPWORDS for w in span.split()):
                continue
            tie = float(overlap) if tier == 1 else -1.0
            # final tie-break: longer span ('Doctor Strange' over a 'Doctor'
            # fragment from a truncated brief)
            key = (tier, tie, score, len(span))
            if best is None or key > best[:4]:
                best = (tier, tie, score, len(span), span)
    if best and best[2] >= 2.0:
        return best[4]
    return reader_ans
