from ahrag_tpu.eval.retrieval import hit_rate_at_k, recall_at_k
from tests.helpers import build_film_graph


def test_recall_at_k_title_matching():
    hg = build_film_graph()
    burton = hg.find_entity("Tim Burton")
    wood = hg.find_entity("Ed Wood")
    retrieved = [burton, wood, "sum:0"]
    assert recall_at_k(retrieved, ["Tim Burton", "Ed Wood (film)"], hg) == 1.0
    assert recall_at_k(retrieved, ["Tim Burton", "Kathryn Bigelow"], hg) == 0.5
    assert recall_at_k([], ["Tim Burton"], hg) == 0.0
    assert recall_at_k(retrieved, [], hg) == 0.0
    # k-cut applies
    assert recall_at_k(retrieved, ["Ed Wood"], hg, k=1) == 0.0
    assert hit_rate_at_k(retrieved, ["Ed Wood"], hg) == 1.0


def test_benchmark_emits_retrieval_recall(tmp_path):
    import json
    from ahrag_tpu.cli.benchmark import run_benchmark
    from ahrag_tpu.cli.demo import run_pipeline
    import os
    sample = os.path.join(os.path.dirname(__file__), "..", "samples",
                          "mini_films.txt")
    graph_dir = str(tmp_path / "graph")
    run_pipeline(sample, artifacts_dir=str(tmp_path / "a"), graph_dir=graph_dir,
                 encoder_name="hashed")
    data = tmp_path / "q.jsonl"
    data.write_text(json.dumps({
        "id": "q1", "question": "Who directed the 1994 film Ed Wood?",
        "answers": ["Tim Burton"], "gold_titles": ["Ed Wood"],
    }) + "\n")
    # flat top-k retrieval reliably surfaces the lexical match
    report = run_benchmark("local", system="naive", limit=1,
                           data_path=str(data), graph_dir=graph_dir,
                           judge_sample=0.0)
    item = report["items"][0]
    assert "retrieval_recall_at_10" in item
    assert item["retrieval_recall_at_10"] > 0.0
    assert "retrieval_recall_at_10" in report["aggregate"][0]
