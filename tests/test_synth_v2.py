"""v2 eval generator: template disjointness (CI-enforced), schema, frozen files.

Round-2 verdict item 2: the v1 eval was circular (answer/qa.py's patterns
mirrored synth's templates) and saturated. v2 renders every paragraph through
realization templates provably disjoint from the answerer's literals, plus
question families that name no gold entity. The disjointness audit
(tools/audit_synth_disjoint.py) runs here as a test so the answerer can never
re-acquire the v2 templates lexically without failing CI.
"""
import json
import os
import sys

from ahrag_tpu.eval.synth import (NO_NAME_FAMILIES, SPLIT_SEEDS_V2,
                                  V2_QUESTION_FAMILIES, make_dataset)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_disjointness_audit_passes():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from audit_synth_disjoint import run_audit
    report = run_audit(REPO)
    assert report["ok"], report["violations"]


def test_v2_deterministic_and_distinct_from_v1():
    a = make_dataset(222, 20, split="dev", version="v2")
    b = make_dataset(222, 20, split="dev", version="v2")
    assert a == b
    v1 = make_dataset(22, 20, split="dev", version="v1")
    v1_sents = {s for it in v1 for ss in it["context"]["sentences"] for s in ss}
    v2_sents = {s for it in a for ss in it["context"]["sentences"] for s in ss}
    assert not (v1_sents & v2_sents)  # zero shared surface realizations


def test_v2_schema_and_answerability():
    items = make_dataset(333, 90, split="test", version="v2")
    assert len({it["question"] for it in items}) == 90
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


def test_no_name_families_have_no_gold_tokens():
    """The no-anchor regime: no token of any gold title appears in the
    question (retrieval cannot free-ride on entity names)."""
    items = make_dataset(333, 130, split="test", version="v2")
    no_name = [it for it in items if it["qtype"] in NO_NAME_FAMILIES]
    assert len(no_name) >= 20  # the regime is well represented
    assert len({it["qtype"] for it in no_name}) >= 3
    for it in no_name:
        q_tokens = set(it["question"].lower().replace("?", " ").split())
        for title in it["gold_titles"]:
            for tok in title.lower().split():
                if tok in ("the", "of"):
                    continue
                assert tok not in q_tokens, (it["id"], tok)


def test_v2_frozen_files_match_generator():
    for split, n in (("train", 100), ("dev", 100), ("test", 130)):
        path = os.path.join(REPO, "samples", f"synth_v2_{split}.jsonl")
        with open(path, encoding="utf-8") as f:
            on_disk = [json.loads(l) for l in f if l.strip()]
        assert on_disk == make_dataset(SPLIT_SEEDS_V2[split], n, split=split,
                                       version="v2"), split


def test_v2_families_all_present():
    items = make_dataset(222, 100, split="dev", version="v2")
    want = {name for name, _ in V2_QUESTION_FAMILIES}
    assert {it["qtype"] for it in items} == want
