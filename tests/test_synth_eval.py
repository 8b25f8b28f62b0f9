"""Frozen adversarial eval generator: determinism, schema, answerability.

The committed samples/synth_eval_{train,dev,test}.jsonl are the held-out
evaluation sets (VERDICT r1 item 2); these tests pin that the generator is
deterministic (the frozen files can always be reproduced byte-for-byte) and
that every question is actually answerable from its gold paragraphs.
"""
import json
import os

from ahrag_tpu.eval.synth import SPLIT_SEEDS, make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_deterministic():
    a = make_dataset(33, 20)
    b = make_dataset(33, 20)
    assert a == b
    c = make_dataset(22, 20, split="dev")
    assert [x["question"] for x in c] != [x["question"] for x in a]


def test_schema_and_answerability():
    items = make_dataset(33, 60)
    assert len({it["question"] for it in items}) == 60  # unique questions
    for it in items:
        ctx = it["context"]
        assert len(ctx["title"]) == len(ctx["sentences"])
        assert set(it["gold_titles"]) <= set(ctx["title"])
        gold_text = " ".join(
            " ".join(s) for t, s in zip(ctx["title"], ctx["sentences"])
            if t in it["gold_titles"]).lower()
        if it["qtype"] == "same_nationality":
            assert it["answers"][0] in ("yes", "no")
        else:
            assert any(a.lower() in gold_text for a in it["answers"]), it["id"]


def test_attr_questions_unambiguous():
    """film_by_attrs contexts contain no second film with the gold's genre/year."""
    items = [it for it in make_dataset(33, 120) if it["qtype"] == "film_by_attrs"]
    assert items
    for it in items:
        q = it["question"]
        gold = it["gold_titles"][0]
        for t, sents in zip(it["context"]["title"], it["context"]["sentences"]):
            if t == gold or "film directed by" not in sents[0]:
                continue
            # first sentence is "<title> is a <year> <genre> film directed by ..."
            body = sents[0].split(" is a ", 1)[1]
            year = body.split()[0]
            genre = body.split(" film ")[0].split(" ", 1)[1]
            assert not (genre in q and year in q), (it["id"], t)


def test_frozen_files_match_generator():
    """The committed JSONL artifacts are exactly what the frozen seeds produce."""
    for split, n in (("train", 100), ("dev", 100), ("test", 120)):
        path = os.path.join(REPO, "samples", f"synth_eval_{split}.jsonl")
        with open(path, encoding="utf-8") as f:
            on_disk = [json.loads(l) for l in f if l.strip()]
        assert on_disk == make_dataset(SPLIT_SEEDS[split], n, split=split), split


def test_question_vocab_disjoint_from_corpus_relations():
    """The adversarial axis: corpus relation stems never appear in questions."""
    items = make_dataset(33, 120)
    corpus_stems = ("directed", "stars", "founded", "headquarters", "released",
                    "born")
    for it in items:
        q = it["question"].lower()
        for stem in corpus_stems:
            assert stem not in q, (it["id"], stem)
