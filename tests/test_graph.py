import numpy as np
import pytest

from ahrag_tpu.graph import HierarchicalGraph
from tests.helpers import build_film_graph, oracle_search


@pytest.fixture
def hg():
    g = build_film_graph()
    g.build_vector_index(layers=(0, 1, 2))
    return g


def test_stats_and_validators(hg):
    st = hg.stats()
    assert st["nodes"] == {"entity": 5, "hyperedge": 2, "summary": 3}
    assert st["edges"]["belongs_to"] == 7
    assert st["edges"]["participates_in"] == 4
    assert hg.validate_belongs_to_dag()
    probs = hg.validate_required_attributes()
    assert all(not v for v in probs.values())


def test_typed_queries(hg):
    burton = hg.find_entity("Tim Burton")
    assert hg.get_belongs_to(burton) == ["sum:0"]
    assert set(hg.get_summary_members("sum:0")) == {
        hg.find_entity("Tim Burton"), hg.find_entity("Scott Derrickson"),
        hg.find_entity("Adam Collis")}
    assert hg.get_entity_hyperedges(burton) == ["hedge:h1"]
    assert set(hg.get_hyperedge_participants("hedge:h1")) == {
        burton, hg.find_entity("Ed Wood")}
    sibs = hg.get_siblings(burton)
    assert hg.find_entity("Scott Derrickson") in sibs and burton not in sibs
    assert hg.get_related("sum:0") == ["sum:1"]
    assert hg.get_related("sum:1") == ["sum:0"]


def test_search_returns_scored_typed_results(hg):
    # reference test_graph_search.py contract
    res = hg.search("Who directed Ed Wood?", top_k=5)
    assert res, "search returned nothing"
    for r in res:
        assert set(r) >= {"node_id", "node_type", "layer", "semantic", "score"}
    assert res[0]["score"] >= res[-1]["score"]


def test_search_parity_with_oracle(hg):
    for query in ["Who directed the film Ed Wood?", "American film directors",
                  "Scott Derrickson horror", "Doctor Strange 2016"]:
        ours = hg.search(query, top_k=5)
        oracle = oracle_search(hg, query, top_k=5)
        assert [r["node_id"] for r in ours] == [r["node_id"] for r in oracle], query
        for a, b in zip(ours, oracle):
            assert abs(a["score"] - b["score"]) < 1e-3, (query, a, b)


def test_search_filters_parity(hg):
    ours = hg.search("American film directors", top_k=5, type_filter=["summary"])
    oracle = oracle_search(hg, "American film directors", top_k=5,
                           type_filter=["summary"])
    assert [r["node_id"] for r in ours] == [r["node_id"] for r in oracle]
    assert all(r["node_type"] == "summary" for r in ours)

    # judge filter drops nodes without judge scores (null-judge semantics)
    ours_j = hg.search("American film directors", top_k=5, judge_overall_min=5.0)
    assert [r["node_id"] for r in ours_j] == ["sum:0"]


def test_search_cluster_contract(hg):
    out = hg.search("Who directed Ed Wood?", top_k=3, return_cluster=True)
    assert set(out) == {"seeds", "expanded", "reranked"}
    assert len(out["seeds"]) == 3
    assert len(out["expanded"]) >= len(out["seeds"])
    seed_ids = {s["node_id"] for s in out["seeds"]}
    exp_ids = {e["node_id"] for e in out["expanded"]}
    assert seed_ids <= exp_ids


def test_entity_merge_semantics():
    hg = HierarchicalGraph(encoder_name="hashed")
    nid = hg.add_entity("X", description=None, entity_type=None)
    hg.add_entity("X", description="first", entity_type="person")
    assert hg.nodes[nid]["description"] == "first"
    hg.add_entity("X", description="second")  # must NOT overwrite
    assert hg.nodes[nid]["description"] == "first"


def test_save_load_roundtrip(hg, tmp_path):
    d = str(tmp_path / "graph")
    hg.save(d, meta={"source": "test"})
    hg2 = HierarchicalGraph.load(d)
    assert hg2.stats() == hg.stats()
    assert hg2.vector_index["indexed_nodes"] == hg.vector_index["indexed_nodes"]
    assert not hg2.dirty
    # search works on the loaded snapshot without re-encoding
    r1 = hg.search("Who directed Ed Wood?", top_k=3)
    r2 = hg2.search("Who directed Ed Wood?", top_k=3)
    assert [x["node_id"] for x in r1] == [x["node_id"] for x in r2]


def test_incremental_indexing(hg):
    n = hg.build_vector_index(layers=(0, 1, 2))
    assert n == 0  # nothing changed
    hg.nodes[hg.find_entity("Tim Burton")]["description"] = "changed description"
    n = hg.build_vector_index(layers=(0, 1, 2))
    assert n == 1  # only the changed node re-encoded


def test_graph_hash_changes_with_content(hg):
    h1 = hg._graph_snapshot_hash()
    hg.add_entity("New Entity", "something", "concept")
    assert hg._graph_snapshot_hash() != h1


def test_dag_validator_detects_cycle():
    hg = HierarchicalGraph(encoder_name="hashed")
    a = hg.add_summary(0, "A", "a")
    b = hg.add_summary(1, "B", "b")
    hg.add_belongs_to(a, b)
    assert hg.validate_belongs_to_dag()
    hg.add_belongs_to(b, a)
    assert not hg.validate_belongs_to_dag()


def test_build_from_artifacts(tmp_path):
    import json
    art = tmp_path / "artifacts"
    art.mkdir()
    extractions = [{
        "hyperedge": "Tim Burton directed Ed Wood", "relation_type": "Directed",
        "confidence_score": 9.0,
        "entities": [
            {"name": "Tim Burton", "type": "person", "description": "American director"},
            {"name": "Ed Wood", "type": "work", "description": "1994 film"},
        ]}]
    topics = {"entity_to_parents": {"Tim Burton": [{"topic_id": 0, "prob": 0.9}],
                                    "Ed Wood": [{"topic_id": 0, "prob": 0.8}]},
              "l1_nodes": [{"topic_id": 0, "title": "Films", "summary": "Film topic",
                            "confidence": 7.0, "top_words": ["film"],
                            "members": ["Tim Burton", "Ed Wood"]}]}
    (art / "extractions.json").write_text(json.dumps(extractions))
    (art / "topics.json").write_text(json.dumps(topics))
    (art / "l1_judge_nodes.json").write_text(json.dumps(
        [{"id": 0, "overall": 7.5, "consistency": 7.0, "accuracy": 7.0,
          "informativeness": 7.0, "comments": ""}]))

    hg = HierarchicalGraph(encoder_name="hashed")
    hg.build_from_artifacts(str(art))
    st = hg.stats()
    assert st["nodes"] == {"entity": 2, "hyperedge": 1, "summary": 1}
    assert hg.node_judge_overall("sum:0") == 7.5
    assert hg.nodes[hg.find_entity("Tim Burton")]["l1_parents"] == {"0": 0.9}
    hg.build_vector_index(layers=(0, 1, 2))
    res = hg.search("Who directed Ed Wood?", top_k=3)
    assert res


def test_search_params_from_loaded_meta(tmp_path):
    """Stored search_params act as call-time defaults (hierarchical_graph.py:681-699)."""
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    hg.search_params["type_filter"] = ["summary"]
    d = str(tmp_path / "g")
    hg.save(d)
    hg2 = HierarchicalGraph.load(d)
    res = hg2.search("American directors", top_k=5)
    assert res and all(r["node_type"] == "summary" for r in res)
    # explicit argument overrides the stored default
    res2 = hg2.search("American directors", top_k=5, type_filter=["entity"])
    assert all(r["node_type"] == "entity" for r in res2)


def test_packed_children_search_parity():
    """pack_children=True must reproduce the unpacked search bit for bit
    (ids, scores) on a graph with summary fan-out > member_top_m."""
    import jax.numpy as jnp
    import numpy as np

    from ahrag_tpu.graph.search import SearchWeights, hybrid_search_batch
    from ahrag_tpu.graph.tensors import build_graph_tensors

    rng = np.random.default_rng(21)
    n_ent, n_sum = 96, 4
    n = n_ent + n_sum
    emb = rng.normal(size=(n, 48)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    parents = {i: [n_ent + i % n_sum] for i in range(n_ent)}
    children = {n_ent + s: [i for i in range(n_ent) if i % n_sum == s]
                for s in range(n_sum)}
    kw = dict(
        embeddings=emb,
        node_types=[0] * n_ent + [1] * n_sum,
        levels=[0] * n_ent + [1] * n_sum,
        judges=[None] * n,
        confs=[7.0] * n,
        indexed=[True] * n,
        parents=parents, children=children,
        related={}, hyperedges={}, members={},
    )
    gt_plain = build_graph_tensors(**kw, pack_children=False)
    gt_pack = build_graph_tensors(**kw, pack_children=True)
    assert gt_pack.child_pack_emb is not None
    assert gt_plain.child_pack_emb is None

    q = rng.normal(size=(6, 48)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w = SearchWeights.create()
    r1 = hybrid_search_batch(gt_plain, jnp.asarray(q), w, top_k=5,
                             member_top_m=3)
    r2 = hybrid_search_batch(gt_pack, jnp.asarray(q), w, top_k=5,
                             member_top_m=3)
    np.testing.assert_array_equal(np.asarray(r1.reranked_idx),
                                  np.asarray(r2.reranked_idx))
    np.testing.assert_array_equal(np.asarray(r1.reranked_score),
                                  np.asarray(r2.reranked_score))
    np.testing.assert_array_equal(np.asarray(r1.cand_idx),
                                  np.asarray(r2.cand_idx))
