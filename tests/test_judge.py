"""Deterministic judge: grounding, contradiction, type checks, and — the round-2
verdict's 'done' condition — seeded fault injection routed to the right
component by the diagnosis formula (no LLM anywhere)."""
import pytest

from ahrag_tpu.eval.answer_eval import AnswerEvaluator
from ahrag_tpu.eval.judge import (judge_answer_relevancy,
                                  judge_contextual_precision,
                                  judge_faithfulness)


def _obj(answer, evidence_text, citations=None, used=None, rationale=""):
    return {
        "answer": answer,
        "rationale": rationale,
        "citations": citations or [],
        "context": {"context_text": evidence_text,
                    "used_nodes": used or [], "stats": {"tokens_used": 10}},
        "evidence": {"summaries": [], "entities": []},
    }


def test_faithfulness_grounded_vs_fabricated():
    ev_text = "Tim Burton directed Ed Wood. The film premiered in 1994."
    good = judge_faithfulness(_obj("Tim Burton", ev_text))
    bad = judge_faithfulness(_obj("Stanley Kubrick", ev_text))
    assert good > 0.7 > bad


def test_faithfulness_number_contradiction_caps_score():
    ev_text = "The film premiered in 1994 to wide acclaim from critics."
    right = judge_faithfulness(_obj("1994", ev_text))
    wrong = judge_faithfulness(_obj("1987", ev_text))
    assert right > 0.7
    assert wrong <= 0.2  # hallucinated year caps faithfulness


def test_faithfulness_citation_validity():
    ev_text = "Tim Burton directed Ed Wood."
    valid = judge_faithfulness(_obj("Tim Burton", ev_text,
                                    citations=["ent:1"], used=["ent:1"]))
    invalid = judge_faithfulness(_obj("Tim Burton", ev_text,
                                      citations=["ent:999"], used=["ent:1"]))
    assert valid > invalid


def test_faithfulness_empty_answer_is_zero():
    assert judge_faithfulness(_obj("", "evidence")) == 0.0


@pytest.mark.parametrize("question,answer,hi", [
    ("Who directed the film?", "Tim Burton", True),
    ("Who directed the film?", "in 1994 the film premiered and many watched",
     False),
    ("When did the film come out?", "1994", True),
    ("When did the film come out?", "Tim Burton", False),
    ("Are A Person and B Person from the same country?", "yes", True),
])
def test_relevancy_type_agreement(question, answer, hi):
    score = judge_answer_relevancy(question, {"answer": answer})
    assert (score >= 0.9) == hi, (question, answer, score)


def test_relevancy_echo_penalty():
    # answering with the question's own entity says nothing
    s = judge_answer_relevancy("Who directed Ed Wood?", {"answer": "Ed Wood"})
    assert s < 0.5


def test_relevancy_snippet_paste_penalty():
    paste = ("The film is a 1994 film directed by someone and it stars many "
             "people and it was released to wide acclaim and the story "
             "follows a director through production of a film about films")
    s = judge_answer_relevancy("What is the film about?", {"answer": paste})
    assert s < 0.6


def test_contextual_precision_counts_related_nodes():
    obj = {
        "answer": "Tim Burton",
        "evidence": {"summaries": [
            {"title": "directors", "summary": "tim burton directed ed wood"},
            {"title": "volcanoes", "summary": "magma rises through vents"},
        ], "entities": []},
    }
    p = judge_contextual_precision("Who directed Ed Wood?", obj)
    assert p == 0.5  # 1 of 2 evidence nodes is on-topic


# ---------------------------------------------------------------------------
# Fault injection -> diagnosis routing (VERDICT r2 item 6 'done' condition)
# ---------------------------------------------------------------------------

def _evaluate(answer_obj):
    return AnswerEvaluator().evaluate(answer_obj, graph=None, config={})


def _base_session():
    return {"stats": {"cumulative": {"steps": 2, "expansions": 1, "time_s": 0.1},
                      "actions": [{"action": "expand_parents",
                                   "inputs": ["ent:1"]}]}}


def test_fault_injection_generator_failure_routes_to_generator():
    """Retrieval delivered the right evidence; the generator fabricated a
    different year -> faithfulness collapses, relevancy stays high (a year IS
    the right answer type) -> diagnosis 'generator'."""
    obj = {
        "query": "When did Ed Wood premiere?",
        "answer": "1987",   # evidence says 1994
        "gold_answers": ["1994"],
        "citations": [],
        "evidence": {"summaries": [{"node_id": "sum:0", "title": "Ed Wood",
                                    "summary": "premiered in 1994"}],
                     "entities": []},
        "context": {"context_text": "Ed Wood premiered in 1994.",
                    "used_nodes": ["sum:0"], "stats": {"tokens_used": 12}},
        "retrieved_nodes": ["sum:0"],
        "session_data": _base_session(),
    }
    out = _evaluate(obj)
    assert out["scores"]["faithfulness"] <= 0.2
    assert out["details"]["diagnosis"]["primary_issue"] == "generator"


def test_fault_injection_retrieval_failure_routes_to_retriever():
    """The generator faithfully echoes the evidence, but the evidence is
    off-topic garbage -> relevancy collapses while faithfulness stays high ->
    diagnosis 'retriever'."""
    obj = {
        "query": "Who directed Ed Wood?",
        "answer": "magma rises through deep vents under the volcano system "
                  "and lava flows shape the island's coast over centuries "
                  "while ash clouds drift far away over the open sea",
        "gold_answers": ["Tim Burton"],
        "citations": ["sum:0"],
        "evidence": {"summaries": [{"node_id": "sum:0", "title": "volcanoes",
                                    "summary": "magma rises through deep vents "
                                               "under the volcano system"}],
                     "entities": []},
        "context": {"context_text": "magma rises through deep vents under the "
                                    "volcano system and lava flows shape the "
                                    "island's coast over centuries while ash "
                                    "clouds drift far away over the open sea",
                    "used_nodes": ["sum:0"], "stats": {"tokens_used": 30}},
        "retrieved_nodes": ["sum:0"],
        "session_data": _base_session(),
    }
    out = _evaluate(obj)
    assert out["scores"]["faithfulness"] > 0.7
    assert out["scores"]["answer_relevancy"] < 0.5
    assert out["details"]["diagnosis"]["primary_issue"] == "retriever"


def test_nominal_case_stays_edge_case():
    obj = {
        "query": "Who directed Ed Wood?",
        "answer": "Tim Burton",
        "gold_answers": ["Tim Burton"],
        "citations": ["ent:1"],
        "evidence": {"summaries": [], "entities": [
            {"node_id": "ent:1", "title": "Tim Burton",
             "summary": "tim burton directed ed wood"}]},
        "context": {"context_text": "Tim Burton directed Ed Wood.",
                    "used_nodes": ["ent:1"], "stats": {"tokens_used": 8}},
        "retrieved_nodes": ["ent:1"],
        "session_data": _base_session(),
    }
    out = _evaluate(obj)
    assert out["details"]["diagnosis"]["primary_issue"] == "edge_case"


def test_fault_injection_precision_failure_routes_to_retriever():
    """Grounded-but-wrong: the answer is a type-plausible span quoted from
    evidence that has NOTHING to do with the question -> faithfulness and
    answer_relevancy both saturate (the round-3 blind spot that hid every
    such failure in edge_case), but contextual precision collapses: no used
    evidence item shares content with the question or the answer -> the
    calibrated precision branch routes it to 'retriever'."""
    obj = {
        "query": "Who directed Ed Wood?",
        "answer": "Marcus Webb",   # quoted from the off-target evidence
        "gold_answers": ["Tim Burton"],
        "citations": ["sum:9"],
        "evidence": {"summaries": [
            {"node_id": "sum:9", "title": "pottery",
             "summary": "ceramic bowls fired in a mountain kiln"},
            {"node_id": "sum:8", "title": "geology",
             "summary": "granite weathers slowly along the ridge"}],
            "entities": []},
        "context": {"context_text": "Marcus Webb fired ceramic bowls in a "
                                    "mountain kiln.",
                    "used_nodes": ["sum:9", "sum:8"],
                    "stats": {"tokens_used": 14}},
        "retrieved_nodes": ["sum:9", "sum:8"],
        "session_data": _base_session(),
    }
    out = _evaluate(obj)
    assert out["scores"]["faithfulness"] > 0.7          # grounded
    assert out["scores"]["answer_relevancy"] > 0.7      # right type
    assert out["scores"]["contextual_precision"] < 0.25
    d = out["details"]["diagnosis"]
    assert d["primary_issue"] == "retriever"
    assert "precision" in d["reason"]


def test_fault_injection_reading_failure_routes_to_generator():
    """Reading-layer failure (r4): the evidence DOES cover the question (the
    Ed Wood node is retrieved and used, precision fine) and the produced span
    IS quoted from the evidence (faithfulness saturates) — but every sentence
    attesting the span lives in a paragraph with no tie to the question's
    entities or keywords. answer_grounding collapses to 0.25 and the new
    grounding branch routes 'generator' instead of hiding in edge_case (on
    v5 zero-edit dev, 60/75 failing items carried exactly this signature)."""
    obj = {
        "query": "Who directed Ed Wood?",
        "answer": "Marcus Webb",   # lifted from the mural paragraph
        "gold_answers": ["Tim Burton"],
        "citations": ["sum:9"],
        "evidence": {"summaries": [
            {"node_id": "sum:9", "title": "murals",
             "summary": "colorful city art across several walls"},
            {"node_id": "sum:1", "title": "Ed Wood",
             "summary": "a film production of the nineties"}],
            "entities": []},
        "context": {"context_text": "- [sum:1] Ed Wood skeleton\n"
                                    "Ed Wood was directed by someone in 1994.\n"
                                    "- [sum:9] murals skeleton\n"
                                    "Marcus Webb painted murals in Lisbon.\n",
                    "used_nodes": ["sum:1", "sum:9"],
                    "stats": {"tokens_used": 20}},
        "retrieved_nodes": ["sum:1", "sum:9"],
        "session_data": _base_session(),
    }
    out = _evaluate(obj)
    assert out["scores"]["faithfulness"] > 0.7            # span is quoted
    assert out["scores"]["contextual_precision"] >= 0.25  # evidence on-topic
    assert out["scores"]["answer_grounding"] <= 0.25
    d = out["details"]["diagnosis"]
    assert d["primary_issue"] == "generator"
    assert "grounding" in d["reason"]


def test_boolean_verdict_grounding_exempt():
    """A yes/no comparison answer is a judgment, not a lifted span — "yes"
    never appears in any paragraph, so span attestation cannot grade it.
    Before the exemption this routed a CORRECT comparison answer (local q2,
    F1 100) to 'generator' via the grounding branch."""
    from ahrag_tpu.eval.judge import judge_answer_grounding
    q = "Were Alice Monroe and Bella Hart of the same nationality?"
    ev = ("- [ent:1] Alice Monroe\nAlice Monroe is an American director.\n"
          "- [ent:2] Bella Hart\nBella Hart is an American producer.\n")
    assert judge_answer_grounding(q, {"answer": "Yes",
                                      "context": {"context_text": ev}}) == 1.0
    # a justification tail IS gradeable — and this one is tied to the question
    assert judge_answer_grounding(
        q, {"answer": "Yes, both are American",
            "context": {"context_text": ev}}) == 1.0


def test_no_signal_split_from_edge_case():
    """VERDICT r4 item 9: an item graded against gold and FAILING while every
    proxy reads green routes to 'no_signal' (low confidence), not edge_case;
    without gold answers the same metrics stay edge_case."""
    from ahrag_tpu.eval.answer_eval import AnswerEvaluator
    ev = AnswerEvaluator()
    green = {"faithfulness": 0.9, "answer_relevancy": 0.9,
             "contextual_recall": 0.9, "contextual_precision": 0.65,
             "answer_grounding": 1.0}
    d = ev.apply_diagnosis_formula({**green, "f1": 0.0, "gold_available": 1.0})
    assert d["primary_issue"] == "no_signal"
    assert d["confidence"] < 0.3
    # passing item: nominal edge_case
    d = ev.apply_diagnosis_formula({**green, "f1": 100.0,
                                    "gold_available": 1.0})
    assert d["primary_issue"] == "edge_case"
    # no gold provided: f1 == 0 is meaningless, stays edge_case
    d = ev.apply_diagnosis_formula({**green, "f1": 0.0, "gold_available": 0.0})
    assert d["primary_issue"] == "edge_case"


def test_no_signal_suppressed_in_parity_mode():
    """Parity mode pins the reference's gold-blind formula: a failing item
    with green proxies must NOT route no_signal there."""
    from ahrag_tpu.eval.answer_eval import AnswerEvaluator
    ev = AnswerEvaluator()
    obj = {
        "query": "Who directed Ed Wood?",
        "answer": "totally wrong span",
        "gold_answers": ["Tim Burton"],
        "citations": ["ent:1"],
        "evidence": {"entities": [{"node_id": "ent:1", "title": "Tim Burton",
                                   "summary": "american director"}]},
        "context": {"used_nodes": ["ent:1"], "stats": {"tokens_used": 20}},
        "retrieved_nodes": ["ent:1"],
        "session_data": {"stats": {"cumulative": {"steps": 1, "expansions": 0,
                                                  "time_s": 0.01}}},
    }
    out = ev.evaluate(obj, config={"evaluation": {"judge": {"mode": "parity"}}})
    assert out["details"]["diagnosis"]["primary_issue"] != "no_signal"
