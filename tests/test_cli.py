"""CLI smoke tests: every entry point parses args and runs end-to-end offline."""
import json
import os
import sys

import pytest

SAMPLE = os.path.join(os.path.dirname(__file__), "..", "samples", "mini_films.txt")
QUESTIONS = os.path.join(os.path.dirname(__file__), "..", "samples",
                         "mini_questions.jsonl")
HOTPOT = os.path.join(os.path.dirname(__file__), "..", "samples",
                      "mini_hotpot.jsonl")


@pytest.fixture(scope="module")
def graph_dir(tmp_path_factory):
    from ahrag_tpu.cli.demo import run_pipeline
    base = tmp_path_factory.mktemp("cli")
    gd = str(base / "graph")
    run_pipeline(SAMPLE, artifacts_dir=str(base / "a"), graph_dir=gd,
                 encoder_name="hashed")
    return gd


def _run(module, argv, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", argv)
    module.main()
    return capsys.readouterr().out


def test_demo_cli_no_repl(tmp_path, monkeypatch, capsys):
    from ahrag_tpu.cli import demo
    out = _run(demo, ["demo", SAMPLE, "--artifacts", str(tmp_path / "a"),
                      "--graph", str(tmp_path / "g"), "--no-repl"],
               monkeypatch, capsys)
    assert "Ready" in out


def test_env_cli(graph_dir, monkeypatch, capsys):
    from ahrag_tpu.cli import env
    out = _run(env, ["env", "Who directed Ed Wood?", "--graph", graph_dir,
                     "--weights", "alpha=0.8", "--filters", "type=entity,summary",
                     "--expand", "parents", "--end"], monkeypatch, capsys)
    assert "semantic_anchor" in out and "expand_parents" in out


def test_agent_cli(graph_dir, monkeypatch, capsys):
    from ahrag_tpu.cli import agent
    out = _run(agent, ["agent", "Who directed Ed Wood?", "--graph", graph_dir,
                       "--steps", "2"], monkeypatch, capsys)
    assert "cumulative" in out


def test_answer_cli(graph_dir, tmp_path, monkeypatch, capsys):
    from ahrag_tpu.cli import answer
    from ahrag_tpu.graph import HierarchicalGraph
    hg = HierarchicalGraph.load(graph_dir)
    nid = hg.find_entity("Tim Burton") or next(iter(hg.nodes))
    evidence = {"summaries": [], "entities": [{"node_id": nid}]}
    p = tmp_path / "ev.json"
    p.write_text(json.dumps(evidence))
    out = _run(answer, ["answer", "Who directed Ed Wood?", "--evidence", str(p),
                        "--graph", graph_dir, "--budget", "500"],
               monkeypatch, capsys)
    obj = json.loads(out)
    assert "answer" in obj["answer"] or obj["answer"]["answer"]


def test_train_rl_cli(tmp_path, monkeypatch, capsys, graph_dir):
    from ahrag_tpu.cli import collect_trajectories, train_rl
    traj = str(tmp_path / "t.jsonl")
    _run(collect_trajectories,
         ["collect", "--data", QUESTIONS, "--limit", "2", "--graph", graph_dir,
          "--out", traj, "--max-steps", "2"], monkeypatch, capsys)
    out = _run(train_rl, ["train_rl", "--traj", traj,
                          "--out", str(tmp_path / "p.json")], monkeypatch, capsys)
    assert "Saved naive policy" in out
    probs = json.loads((tmp_path / "p.json").read_text())["action_probs"]
    assert abs(sum(probs.values()) - 1.0) < 1e-6


def test_eval_rl_policy_cli(tmp_path, monkeypatch, capsys, graph_dir):
    from ahrag_tpu.cli import eval_rl_policy
    out_path = str(tmp_path / "eval.json")
    _run(eval_rl_policy,
         ["eval_rl", "--data", QUESTIONS, "--limit", "2", "--graph", graph_dir,
          "--policy", "/nonexistent.json", "--out", out_path, "--max-steps", "2"],
         monkeypatch, capsys)
    obj = json.loads(open(out_path).read())
    assert len(obj["items"]) == 2
    assert "scores" in obj["items"][0]


def test_build_rl_snapshot_cli(tmp_path, monkeypatch, capsys):
    from ahrag_tpu.cli import build_rl_snapshot
    out = _run(build_rl_snapshot,
               ["snapshot", "--data", HOTPOT, "--limit", "2",
                "--out-graph", str(tmp_path / "graph_rl"),
                "--artifacts", str(tmp_path / "a_rl")], monkeypatch, capsys)
    assert "Frozen snapshot" in out
    from ahrag_tpu.graph import HierarchicalGraph
    hg = HierarchicalGraph.load(str(tmp_path / "graph_rl"))
    assert hg.number_of_nodes() > 0
    assert hg.find_entity("Tim Burton") or hg.find_entity("Scott Derrickson")


def test_benchmark_hotpot_contexts(tmp_path, monkeypatch, capsys):
    from ahrag_tpu.cli import benchmark
    out = _run(benchmark,
               ["bench", "--dataset", "local", "--data", HOTPOT, "--system",
                "ah_rag", "--limit", "2", "--judge-sample", "0.0",
                "--out", str(tmp_path / "r.json")], monkeypatch, capsys)
    assert "ah_rag" in out
    report = json.loads((tmp_path / "r.json").read_text())
    assert report["aggregate"][0]["n"] == 2
