"""Meta-training data for the span reader: randomized relation surfaces.

The point of the reader is schema generalization, so its training data
must make memorizing any relation impossible. Every instance samples its
OWN relation surfaces: verb phrases are drawn fresh from word pools (and
pseudo-words), subjects/objects from generated name pools, and the
question re-describes the relation with DIFFERENT words than the
evidence sentence uses. The only stable regularities across the corpus —
and therefore the only things the model can learn — are structural:

- the answer lives in a sentence that mentions the question's anchor
  entities (or, for 2-hop items, in the paragraph of the entity that
  co-occurs with the anchor);
- the answer's surface type agrees with the question word (who -> name,
  when/what year -> year, which <noun> -> lowercase noun, ...);
- the answer is never a token the question already contains;
- appended facts are rarer/later than a paragraph's boilerplate.

This mirrors how the reference's LLM answers unseen schemas (it reads;
it does not look relations up) — learned here from first principles, on
device. Word pools are disjoint from eval/synth.py's v5 relation
markers; tools/audit_synth_disjoint.py enforces that (this file is in
its scan set), so v5 stays a true zero-shot schema for the reader.
"""
from __future__ import annotations

import random
from typing import Dict, List, NamedTuple, Optional, Tuple

# ----------------------------------------------------------------- pools
_SYL_A = ["ba", "den", "kor", "mel", "tar", "vin", "sor", "lue", "pra", "nim",
          "gos", "har", "jel", "fen", "rud", "cas", "tol", "wer", "zan", "bri"]
_SYL_B = ["dor", "lin", "mak", "sen", "vik", "rno", "tel", "gard", "bel",
          "mon", "ric", "sta", "ver", "lan", "dis", "fort", "ner", "holm"]

# generic verbs/nouns for relation surfaces — none of these words appears
# in any v5 relation marker phrase (audited)
_VERBS = ["organized", "reviewed", "championed", "catalogued", "restored",
          "audited", "sketched", "financed", "translated", "archived",
          "curated", "surveyed", "drafted", "inspected", "promoted",
          "assembled", "endorsed", "documented", "chronicled", "sponsored",
          "revised", "examined", "compiled", "launched", "convened"]
_NOUNS = ["ledger", "charter", "mural", "archive", "pavilion", "treatise",
          "registry", "almanac", "portfolio", "gazette", "atlas", "dossier",
          "manifesto", "catalogue", "anthology", "compendium", "bulletin",
          "prospectus", "inventory", "blueprint"]
_ADJS = ["celebrated", "reclusive", "prolific", "itinerant", "seasoned",
         "versatile", "meticulous", "renowned", "spirited", "studious"]
_ROLES = ["archivist", "cartographer", "botanist", "glassblower", "engraver",
          "luthier", "falconer", "apiarist", "milliner", "chandler",
          "cooper", "farrier", "saddler", "thatcher", "vintner"]
_OBJ_NOUNS = ["quillwork", "fresco", "tapestry", "sundial", "orrery",
              "astrolabe", "lithograph", "woodcut", "etching", "mosaic",
              "filigree", "marquetry", "cloisonne", "scrimshaw", "repousse",
              "intaglio"]
_ORG_SUFFIX = ["Circle", "Union", "Syndicate", "Assembly", "League",
               "Bureau", "Consortium", "Cooperative", "Guild", "Society"]
_Q_CATS = ["technique", "specialty", "discipline", "pursuit",
           "medium", "artform", "vocation"]


def _pseudo_word(rng: random.Random, syls: int = 2) -> str:
    return "".join(rng.choice(_SYL_A if i % 2 == 0 else _SYL_B)
                   for i in range(syls))


def _person(rng: random.Random) -> str:
    return (_pseudo_word(rng).capitalize() + " "
            + _pseudo_word(rng, 2 + rng.randrange(2)).capitalize())


def _org(rng: random.Random) -> str:
    return (_pseudo_word(rng, 2).capitalize() + " " + rng.choice(_ORG_SUFFIX))


def _city(rng: random.Random) -> str:
    return _pseudo_word(rng, 2 + rng.randrange(2)).capitalize()


def _year(rng: random.Random) -> str:
    return str(1900 + rng.randrange(120))


class Instance(NamedTuple):
    question: str
    sentences: List[str]        # with "" paragraph seams
    answer: str
    gold_sentence: int          # index into the non-"" sentence sequence


# ------------------------------------------------------- fact rendering

def _render_fact(rng: random.Random, subj: str, obj: str, obj_kind: str,
                 extra_entity: Optional[str] = None) -> str:
    """One fact sentence with a freshly sampled relation surface."""
    vp = rng.choice(_VERBS)
    noun = rng.choice(_NOUNS)
    style = rng.randrange(4)
    if obj_kind == "year":
        anchor = extra_entity or f"the {noun}"
        if style == 0:
            return f"{subj} {vp} {anchor} in {obj}."
        if style == 1:
            return f"In {obj}, {subj} {vp} {anchor}."
        if style == 2:
            return f"{obj} marked the season {subj} {vp} {anchor}."
        return f"{subj} first {vp} {anchor} back in {obj}."
    if obj_kind == "noun":
        if style == 0:
            return f"{subj} {vp} the {obj} for ages."
        if style == 1:
            return f"The {obj} remained {subj}'s chosen field."
        if style == 2:
            return f"{subj} gave long seasons to the {obj}."
        return f"Much of {subj}'s renown rests on the {obj}."
    # person / org / city objects
    if style == 0:
        return f"{subj} {vp} the {noun} of {obj}."
    if style == 1:
        return f"{obj} and {subj} together {vp} a {noun}."
    if style == 2:
        return f"{subj} frequently {vp} works alongside {obj}."
    return f"At the request of {obj}, {subj} {vp} a {noun}."


def _render_question(rng: random.Random, subj: str, obj_kind: str,
                     extra_entity: Optional[str] = None,
                     cat: Optional[str] = None) -> str:
    """Question re-describing the relation WITHOUT the fact's verb phrase."""
    qv = rng.choice(["collaborated with", "worked with", "was involved with",
                     "dealt with", "was connected to"])
    if obj_kind == "person":
        return rng.choice([
            f"Who {qv} {subj}?",
            f"Which person is associated with {subj}?",
            f"Name the figure linked to {subj}.",
        ])
    if obj_kind == "org":
        return rng.choice([
            f"Which organization is tied to {subj}?",
            f"What group did {subj} have dealings with?",
        ])
    if obj_kind == "city":
        return rng.choice([
            f"Which place is connected with {subj}?",
            f"What locality features in {subj}'s record?",
        ])
    if obj_kind == "year":
        anchor = extra_entity or "it"
        return rng.choice([
            f"In what year did {subj} engage with {anchor}?",
            f"When was {subj} occupied with {anchor}?",
            f"What year connects {subj} and {anchor}?",
        ])
    # noun object
    c = cat or rng.choice(_Q_CATS)
    return rng.choice([
        f"Which {c} is {subj} identified with?",
        f"What {c} does {subj} follow?",
        f"For what {c} is {subj} recognized?",
    ])


# --------------------------------------------------------- world builder

def make_instance(rng: random.Random) -> Instance:
    """One (question, evidence, answer) item over a freshly sampled world."""
    n_paras = 5 + rng.randrange(4)
    people = [_person(rng) for _ in range(n_paras)]
    city_of = {p: _city(rng) for p in people}
    year_of = {p: _year(rng) for p in people}
    role_of = {p: rng.choice(_ROLES) for p in people}
    # per-world boilerplate template (repeats across paragraphs -> the
    # novelty channel learns that template facts are rarely the answer)
    adj = rng.choice(_ADJS)
    base_noun = rng.choice(_NOUNS)

    # choose the queried fact. No bare-year and no 1-hop-city questions:
    # a year with no co-mentioned anchor is indistinguishable from the
    # boilerplate settle-year (label noise, not signal), and city answers
    # are covered by the boilerplate/2-hop forms below.
    hop2 = rng.random() < 0.25
    boiler_q = not hop2 and rng.random() < 0.15
    subj = people[0]
    obj_kind = rng.choice(["person", "person", "year", "noun", "org"])
    extra_entity = None
    if obj_kind == "person":
        obj = people[1]
    elif obj_kind == "org":
        obj = _org(rng)
    elif obj_kind == "year":
        obj = _year(rng)
        # every year question carries an anchor that appears in both the
        # question and the fact sentence (award_year/marriage_year-style):
        # a named artifact, or a second person
        if rng.random() < 0.5:
            extra_entity = ("the " + _pseudo_word(rng, 2).capitalize() + " "
                            + rng.choice(_NOUNS).capitalize())
        else:
            extra_entity = people[1]
    else:
        obj = rng.choice(_OBJ_NOUNS)

    paragraphs: List[List[str]] = []
    gold_para = 0
    for i, p in enumerate(people):
        sents = [f"{p} is a {adj} {role_of[p]} who settled near "
                 f"{city_of[p]} in {year_of[p]}."]
        # 1-2 distractor facts with their own random surfaces. The GOLD
        # paragraph excludes distractors of the queried kind — a second
        # same-typed object in the same paragraph with no disambiguating
        # overlap is label noise. (The noun question keeps its intended
        # competitor: the boilerplate role noun — the model must learn
        # that the NOVEL sentence carries the asked fact.)
        kinds = ["person", "year", "noun", "org"]
        if i == 0:
            kinds = [k for k in kinds if k != obj_kind]
        for _ in range(1 + rng.randrange(2)):
            dk = rng.choice(kinds)
            if dk == "person":
                dobj = rng.choice([x for x in people if x != p])
            elif dk == "org":
                dobj = _org(rng)
            elif dk == "year":
                dobj = _year(rng)
            else:
                dobj = rng.choice([x for x in _OBJ_NOUNS if x != obj])
            sents.append(_render_fact(rng, p, dobj, dk))
        paragraphs.append(sents)

    if boiler_q:
        # the question targets the boilerplate fact itself, with stem
        # overlap ("settle" ~ "settled") as the disambiguating signal —
        # teaches that lexical overlap, when present, beats novelty
        attr_kind = rng.choice(["city", "year"])
        answer = city_of[subj] if attr_kind == "city" else year_of[subj]
        gold_para = 0
        gold_sentence_local = 0
        if attr_kind == "city":
            question = rng.choice([
                f"Near which place did {subj} settle?",
                f"Where did {subj} settle down?",
            ])
        else:
            question = rng.choice([
                f"In what year did {subj} settle?",
                f"When did {subj} settle near {city_of[subj]}?",
            ])
    elif hop2 and obj_kind in ("person",):
        # 2-hop: question asks an attribute of the LINKED person; the link
        # fact sits in subj's paragraph, the attribute in obj's boilerplate
        mid = obj
        paragraphs[0].append(_render_fact(rng, subj, mid, "person"))
        attr_kind = rng.choice(["city", "year"])
        answer = city_of[mid] if attr_kind == "city" else year_of[mid]
        gold_para = people.index(mid)
        gold_sentence_local = 0  # the boilerplate sentence carries it
        qv = rng.choice(["collaborated with", "worked with",
                         "was connected to"])
        if attr_kind == "city":
            question = rng.choice([
                f"Near which place did the person who {qv} {subj} settle?",
                f"Where did the figure linked to {subj} make a home?",
            ])
        else:
            question = rng.choice([
                f"In what year did the person who {qv} {subj} settle?",
                f"When did the figure linked to {subj} take up residence?",
            ])
    else:
        paragraphs[0].append(_render_fact(rng, subj, obj, obj_kind,
                                          extra_entity=extra_entity))
        answer = obj
        gold_para = 0
        gold_sentence_local = len(paragraphs[0]) - 1
        question = _render_question(rng, subj, obj_kind,
                                    extra_entity=extra_entity)

    # shuffle paragraph order (the gold paragraph is not always first)
    order = list(range(n_paras))
    rng.shuffle(order)
    sentences: List[str] = []
    gold_sentence = -1
    seen_sents = 0
    for pos, pi in enumerate(order):
        if pos > 0:
            sentences.append("")
        for si, s in enumerate(paragraphs[pi]):
            if pi == gold_para and si == gold_sentence_local:
                gold_sentence = seen_sents
            sentences.append(s)
            seen_sents += 1
    return Instance(question, sentences, answer, gold_sentence)


# ------------------------------------------------------------ batch prep

def build_training_arrays(n_items: int, seed: int = 7):
    """Featurized arrays + gold span targets for ``n_items`` instances.

    Returns (FeatureBatch, starts [N] int32, ends [N] int32); items whose
    gold span fell outside the token window are dropped (rare: long
    worlds truncated at E_LEN).
    """
    import numpy as np

    from ahrag_tpu.models.reader.features import featurize, stack

    rng = random.Random(seed)
    feats, starts, ends = [], [], []
    while len(feats) < n_items:
        inst = make_instance(rng)
        fb, ev = featurize(inst.question, inst.sentences)
        span = _locate(ev, inst)
        if span is None:
            continue
        s, e = span
        feats.append(fb)
        starts.append(s)
        ends.append(e)
    return stack(feats), (np.asarray(starts, np.int32),
                          np.asarray(ends, np.int32))


def _locate(ev, inst: Instance) -> Optional[Tuple[int, int]]:
    """Token positions of the answer inside the gold sentence."""
    from ahrag_tpu.models.reader.features import _tokenize

    ans_toks = [t.lower() for t in _tokenize(inst.answer)]
    if not ans_toks:
        return None
    for i in range(len(ev.tokens)):
        if ev.sent_index[i] != inst.gold_sentence:
            continue
        j = i + len(ans_toks) - 1
        if j >= len(ev.tokens) or ev.sent_index[j] != inst.gold_sentence:
            continue
        if [t.lower() for t in ev.tokens[i:j + 1]] == ans_toks:
            return i, j
    return None
