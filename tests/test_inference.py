import json
import os

import pytest

from ahrag_tpu.agent.agent import AHRAG_Agent, run_agent_once
from ahrag_tpu.agent.environment import GraphEnvironment
from ahrag_tpu.agent.inference import InferenceEngine, pick_top_ids
from tests.helpers import build_film_graph


@pytest.fixture
def env(tmp_path):
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    return GraphEnvironment(hg=hg, log_dir=str(tmp_path / "sessions"))


def test_rule_agent_prefers_expand_parents(env):
    agent = AHRAG_Agent(env, use_llm=False)
    obs, _ = env.reset(seed_query="Tim Burton")
    d = agent.decide(obs)
    assert d["action"] == "expand_parents"
    assert d["params"]["node_ids"]


def test_rule_agent_ends_on_empty():
    agent = AHRAG_Agent.__new__(AHRAG_Agent)
    agent.use_llm = False
    d = agent._rule_based({"selection": [], "state": {"frontier_ids": []}})
    assert d["action"] == "end_episode"


def test_llm_agent_decision(env, fake_llm):
    fake_llm["default"] = ('{"action": "expand_related", '
                           '"params": {"node_ids": ["sum:0"]}}')
    agent = AHRAG_Agent(env, use_llm=True)
    agent.use_llm = True  # backend makes module enabled
    obs, _ = env.reset(seed_query="Tim Burton")
    d = agent.decide(obs)
    assert d == {"action": "expand_related", "params": {"node_ids": ["sum:0"]}}


def test_llm_agent_bad_json_falls_back(env, fake_llm):
    fake_llm["default"] = "garbage not json"
    agent = AHRAG_Agent(env, use_llm=True)
    agent.use_llm = True
    obs, _ = env.reset(seed_query="Tim Burton")
    d = agent.decide(obs)
    assert d["action"] in {"expand_parents", "expand_related", "end_episode"}


def test_run_agent_once(env):
    agent = AHRAG_Agent(env, use_llm=False)
    obs, summary = run_agent_once(env, agent, "Who directed Ed Wood?", steps=3)
    assert summary["stats"]["cumulative"]["steps"] >= 2


def test_pick_top_ids_director_query():
    obs = {"selection": [
        {"node_id": "e_film", "node_type": "entity", "entity_type": "work",
         "score": 0.9, "name": "Ed Wood"},
        {"node_id": "e_person", "node_type": "entity", "entity_type": "person",
         "score": 0.5, "name": "Tim Burton"},
        {"node_id": "s1", "node_type": "summary", "score": 0.8},
    ]}
    ids = pick_top_ids(obs, "Who is the director of Ed Wood?")
    assert ids[0] == "e_person"   # person prioritized for director queries
    assert "s1" in ids            # best summary appended


def test_pick_top_ids_nationality_comparison_name_match():
    obs = {"selection": [
        {"node_id": "e1", "node_type": "entity", "entity_type": "person",
         "score": 0.3, "name": "Tim Burton"},
        {"node_id": "e2", "node_type": "entity", "entity_type": "person",
         "score": 0.2, "name": "Scott Derrickson"},
        {"node_id": "e3", "node_type": "entity", "entity_type": "person",
         "score": 0.9, "name": "Unrelated Person"},
    ]}
    ids = pick_top_ids(obs, "Were Scott Derrickson and Tim Burton of the same "
                            "nationality?")
    assert set(ids[:2]) == {"e1", "e2"}


def test_inference_end_to_end(env):
    engine = InferenceEngine(env, AHRAG_Agent(env, use_llm=False))
    out = engine.run_inference("Were Scott Derrickson and Tim Burton of the same "
                               "nationality?", steps=4)
    assert set(out) >= {"query", "answer", "rationale", "citations", "evidence",
                        "context", "retrieved_nodes", "metrics", "session_data"}
    assert out["retrieved_nodes"]
    assert out["evidence"]["summaries"] or out["evidence"]["entities"]
    assert "Evidence Skeleton" in out["context"]["context_text"]
    assert out["answer"]
    # artifacts persisted
    assert os.path.exists(os.path.join(out["session_path"], "answer.json"))
    events = open(os.path.join(out["session_path"], "events.jsonl")).read()
    assert "context_assembled" in events


def test_inference_evidence_caps(env):
    engine = InferenceEngine(env, AHRAG_Agent(env, use_llm=False))
    engine.env.reset(seed_query="American films and directors")
    engine.env.commit_selection(list(engine.env.hg.nodes))
    ev = engine.collect_evidence(max_summaries=3, max_entities=5)
    assert len(ev["summaries"]) <= 3 and len(ev["entities"]) <= 5
