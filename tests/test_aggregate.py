import json
import os

import numpy as np
import pytest

from ahrag_tpu.aggregate.aggregator import SemanticAggregator
from ahrag_tpu.aggregate.community import greedy_modularity_communities
from ahrag_tpu.extract.extractor import HypergraphExtractor
from ahrag_tpu.ops.kmeans import spherical_kmeans

TEXT = ("Tim Burton is an American film director. Ed Wood is a 1994 film directed "
        "by Tim Burton. Scott Derrickson is an American director of horror films. "
        "Doctor Strange is a 2016 film directed by Scott Derrickson. "
        "Quantum computing uses qubits. InnovateCorp builds quantum processors. "
        "Geneva hosted the TechSummit conference. MIT Department collaborated.")


@pytest.fixture
def agg(tmp_path):
    a = SemanticAggregator(encoder_name="hashed", artifact_dir=str(tmp_path))
    extractions = HypergraphExtractor().fallback_extract(TEXT)
    a.embed_l0_entities(extractions)
    return a


def test_kmeans_separates_clear_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(loc=(5, 0, 0), scale=0.1, size=(20, 3))
    b = rng.normal(loc=(0, 5, 0), scale=0.1, size=(20, 3))
    x = np.concatenate([a, b]).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    assign, cents = spherical_kmeans(x, k=2, seed=0)
    assign = np.asarray(assign)
    assert len(set(assign[:20].tolist())) == 1
    assert len(set(assign[20:].tolist())) == 1
    assert assign[0] != assign[20]


def test_embed_persists_artifacts(agg, tmp_path):
    assert os.path.exists(tmp_path / "embeddings.npy")
    emb = np.load(tmp_path / "embeddings.npy")
    assert emb.shape[0] == len(agg.entity_names) and emb.shape[1] == 384


def test_cluster_artifact_contract(agg, tmp_path):
    res = agg.cluster_entities(seed=42)
    topics = json.loads((tmp_path / "topics.json").read_text())
    assert set(topics) == {"entity_to_parents", "l1_nodes"}
    # every entity has at least one parent with a prob
    for name in agg.entity_names:
        parents = topics["entity_to_parents"][name]
        assert parents and all(0 <= p["prob"] <= 1.0001 for p in parents)
        assert len(parents) <= 2  # max_parents
    for node in topics["l1_nodes"]:
        assert set(node) >= {"topic_id", "top_words", "members", "centroid"}
        assert node["members"]
    # deterministic
    res2 = agg.cluster_entities(seed=42)
    assert res["entity_to_parents"] == res2["entity_to_parents"]


def test_summaries_offline_fallback(agg, tmp_path):
    res = agg.cluster_entities(seed=42)
    out = agg.summarize_topics(res["l1_nodes"])
    assert len(out) == len(res["l1_nodes"])
    assert all(s.title and s.summary for s in out)
    nodes = json.loads((tmp_path / "l1_nodes.json").read_text())
    assert all(n.get("title") for n in nodes)


def test_summaries_llm_path(agg, fake_llm):
    res = agg.cluster_entities(seed=42)
    fake_llm["default"] = ('{"topic_id": 0, "title": "LLM Title", '
                           '"summary": "LLM summary.", "confidence": 8.0}')
    out = agg.summarize_topics(res["l1_nodes"])
    assert all(s.title == "LLM Title" for s in out)


def test_relations_and_weights(agg, tmp_path):
    res = agg.cluster_entities(seed=42)
    agg.summarize_topics(res["l1_nodes"])
    edges = agg.generate_l1_relations(res["l1_nodes"], min_overlap=1,
                                      min_jaccard=0.05, min_cosine=0.3)
    for e in edges:
        assert abs(e["weight"] - round(0.5 * e["jaccard"] + 0.5 * e["cosine"], 4)) < 1e-3
        assert e["relation_type"] == "related_summary"
    nodes = json.loads((tmp_path / "l1_nodes.json").read_text())
    assert all("neighbors" in n for n in nodes)


def test_greedy_modularity_two_cliques():
    nodes = list(range(6))
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
             (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0),
             (2, 3, 0.1)]
    comms = greedy_modularity_communities(nodes, edges)
    comms_sets = [set(c) for c in comms]
    assert {0, 1, 2} in comms_sets and {3, 4, 5} in comms_sets


def test_l2_and_escalation(agg, tmp_path):
    res = agg.cluster_entities(seed=42, n_topics=4)
    agg.summarize_topics(res["l1_nodes"])
    agg.generate_l1_relations(res["l1_nodes"], min_overlap=1, min_jaccard=0.01,
                              min_cosine=0.1)
    l2 = agg.aggregate_level2_via_communities(res["l1_nodes"], min_comm_size=2)
    assert os.path.exists(tmp_path / "l2_nodes.json")
    assert os.path.exists(tmp_path / "l1_to_l2.json")
    metrics = agg.compute_escalation_metrics(res["l1_nodes"], l2)
    assert set(metrics) >= {"compression_ratio_l1_over_l2", "coverage_l1_to_l2",
                            "should_stop_escalation", "thresholds"}
    if l2:
        assert metrics["compression_ratio_l1_over_l2"] > 0
        for n in l2:
            assert n["level"] == 2 and n["members"]
            assert all(m.startswith("sum:") for m in n["members"])


def test_judge_disabled_returns_empty(agg):
    res = agg.cluster_entities(seed=42)
    out = agg.judge_samples(res["l1_nodes"], [])
    assert out == {"nodes": [], "edges": []}


def test_judge_with_fake_llm(agg, tmp_path, fake_llm):
    res = agg.cluster_entities(seed=42)
    fake_llm["default"] = ('{"id": 0, "consistency": 8, "accuracy": 7, '
                           '"informativeness": 7, "overall": 7.5, "comments": "ok"}')
    out = agg.judge_samples(res["l1_nodes"], [], node_sample_size=2)
    assert out["nodes"] and out["nodes"][0].overall == 7.5
    assert os.path.exists(tmp_path / "l1_judge_nodes.json")


def test_judge_llm_failure_neutral_fallback(agg, fake_llm):
    fake_llm["default"] = "not json"
    out = agg.judge_samples(agg.cluster_entities(seed=42)["l1_nodes"], [],
                            node_sample_size=1)
    assert out["nodes"][0].overall == 6.0
    assert out["nodes"][0].comments == "fallback"


def test_escalate_builds_levels_until_stop(agg, tmp_path):
    res = agg.cluster_entities(seed=42, n_topics=6)
    agg.summarize_topics(res["l1_nodes"])
    agg.generate_l1_relations(res["l1_nodes"], min_overlap=1, min_jaccard=0.01,
                              min_cosine=0.1)
    built = agg.escalate(res["l1_nodes"], max_levels=4, min_comm_size=2)
    # L2 exists; each built level's artifacts are present with correct levels
    assert built, "no levels built"
    for i, nodes in enumerate(built, start=2):
        assert all(n["level"] == i for n in nodes)
        assert os.path.exists(tmp_path / f"l{i}_nodes.json")
    # L1 artifacts not clobbered by higher-level relation passes
    l1 = json.loads((tmp_path / "l1_nodes.json").read_text())
    assert all("topic_id" in n for n in l1)
    assert len(l1) == 6


def test_escalate_with_llm_summaries(agg, fake_llm):
    fake_llm["default"] = ('{"topic_id": 0, "title": "Community", '
                           '"summary": "LLM community summary.", '
                           '"confidence": 8.0}')
    res = agg.cluster_entities(seed=42, n_topics=6)
    agg.summarize_topics(res["l1_nodes"])
    agg.generate_l1_relations(res["l1_nodes"], min_overlap=1, min_jaccard=0.01,
                              min_cosine=0.1)
    built = agg.escalate(res["l1_nodes"], max_levels=3, min_comm_size=2,
                         judge_sample_size=1)
    assert built
    assert any(n["summary"] == "LLM community summary." for n in built[0])
