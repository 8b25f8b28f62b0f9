"""End-to-end offline pipeline: ingest -> hierarchy -> search -> QA -> benchmark.

The e2e contract the reference only exercises manually (SURVEY §4: its tests assume
a pre-built graph/ directory). Everything here runs LLM-free and deterministic.
"""
import json
import os

import pytest

from ahrag_tpu.cli.benchmark import run_benchmark
from ahrag_tpu.cli.demo import run_pipeline

SAMPLE = os.path.join(os.path.dirname(__file__), "..", "samples", "mini_films.txt")
QUESTIONS = os.path.join(os.path.dirname(__file__), "..", "samples",
                         "mini_questions.jsonl")


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e")
    artifacts = str(base / "artifacts")
    graph_dir = str(base / "graph")
    hg = run_pipeline(SAMPLE, artifacts_dir=artifacts, graph_dir=graph_dir,
                      encoder_name="hashed")
    return hg, artifacts, graph_dir


def test_pipeline_artifacts_written(built):
    _, artifacts, graph_dir = built
    for name in ("extractions.json", "embeddings.npy", "topics.json",
                 "l1_nodes.json", "l1_summaries.json", "l1_edges.json",
                 "l2_nodes.json", "l1_to_l2.json", "metrics.json"):
        assert os.path.exists(os.path.join(artifacts, name)), name
    assert os.path.exists(os.path.join(graph_dir, "structure.json"))
    assert os.path.exists(os.path.join(graph_dir, "meta.json"))
    assert os.path.exists(os.path.join(graph_dir, "embeddings.npz"))


def test_pipeline_graph_sane(built):
    hg, _, _ = built
    st = hg.stats()
    assert st["nodes"]["entity"] >= 5
    assert st["nodes"]["summary"] >= 1
    assert st["nodes"]["hyperedge"] >= 3
    assert hg.validate_belongs_to_dag()
    assert hg.find_entity("Tim Burton")
    assert hg.find_entity("Scott Derrickson")


def test_pipeline_search_finds_the_director(built):
    hg, _, _ = built
    res = hg.search("Who directed the film Ed Wood?", top_k=5)
    names = {(r.get("name") or r.get("title") or "") for r in res}
    assert any("Burton" in n or "Ed Wood" in n for n in names), res


def test_inference_answers_from_built_graph(built):
    from ahrag_tpu.agent.agent import AHRAG_Agent
    from ahrag_tpu.agent.environment import GraphEnvironment
    from ahrag_tpu.agent.inference import InferenceEngine
    hg, _, _ = built
    env = GraphEnvironment(hg=hg, log_level="off")
    out = InferenceEngine(env, AHRAG_Agent(env)).run_inference(
        "Who directed the 1994 film Ed Wood?", steps=4)
    assert out["answer"]
    assert out["citations"] or out["retrieved_nodes"]


def test_benchmark_on_local_dataset(built, tmp_path):
    _, _, graph_dir = built
    out = str(tmp_path / "report.json")
    report = run_benchmark("local", system="both", limit=3, data_path=QUESTIONS,
                           graph_dir=graph_dir, judge_sample=0.0, out=out)
    assert os.path.exists(out)
    assert len(report["aggregate"]) == 2  # ah_rag and naive
    for agg in report["aggregate"]:
        assert 0.0 <= agg["overall_score"] <= 1.0
        assert agg["n"] == 3
    systems = {a["system"] for a in report["aggregate"]}
    assert systems == {"ah_rag", "naive"}


def test_eval_gate_runs(built, tmp_path, monkeypatch, capsys):
    _, _, graph_dir = built
    import sys

    from ahrag_tpu.cli import eval_gate
    monkeypatch.setattr(sys, "argv", [
        "eval_gate", "--data", QUESTIONS, "--limit", "2", "--graph", graph_dir,
        "--out", str(tmp_path / "gate.json"), "--f1-min", "0.0",
        "--faith-min", "0.0"])
    eval_gate.main()  # must not raise with zero thresholds
    out = capsys.readouterr().out
    assert '"passed": true' in out


def test_benchmark_per_question_context_build(tmp_path):
    """HotpotQA-style per-question KG build, in-process (no subprocess)."""
    import json as _json
    data = tmp_path / "ctx.jsonl"
    item = {
        "id": "c1",
        "question": "Who directed Ed Wood?",
        "answers": ["Tim Burton"],
        "context": {
            "title": ["Tim Burton", "Ed Wood (film)"],
            "sentences": [
                ["Tim Burton is an American director.",
                 "He directed the 1994 film Ed Wood."],
                ["Ed Wood is a 1994 American film.",
                 "It was directed by Tim Burton."],
            ],
        },
    }
    data.write_text(_json.dumps(item) + "\n")
    report = run_benchmark("local", system="ah_rag", limit=1,
                           data_path=str(data), judge_sample=0.0,
                           out=str(tmp_path / "r.json"))
    assert report["aggregate"][0]["n"] == 1
    assert report["items"][0]["system"] == "ah_rag"
