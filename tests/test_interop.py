"""Interop: reference-built graph snapshots load directly.

The reference persists NetworkX node-link JSON with JSON-string-encoded attributes
(hierarchical_graph.py:175-218). Our loader accepts that format, so a user can
point this framework at an existing reference ``graph/`` directory.
"""
import json

from ahrag_tpu.graph import HierarchicalGraph


def _reference_style_structure():
    return {
        "directed": True,
        "multigraph": False,
        "graph": {},
        "nodes": [
            {"id": "ent:aaaaaaaaaa", "node_type": "entity", "name": "Tim Burton",
             "description": "American director", "entity_type": "person",
             "l1_parents": json.dumps({"0": 0.9})},
            {"id": "ent:bbbbbbbbbb", "node_type": "entity", "name": "Ed Wood",
             "description": "1994 film", "entity_type": "work",
             "l1_parents": None},
            {"id": "sum:0", "node_type": "summary", "topic_id": 0,
             "title": "Films", "summary_text": "Film topic", "confidence": 7.0,
             "top_words": json.dumps(["film", "director"]),
             "members": json.dumps(["Tim Burton", "Ed Wood"]),
             "judge_scores": json.dumps({"overall": 8.0}),
             "centroid": None},
            {"id": "hedge:h1", "node_type": "hyperedge",
             "description": "Tim Burton directed Ed Wood",
             "relation_type": "Directed", "confidence_score": 9.0},
        ],
        # reference saves edges under "links" (node-link format)
        "links": [
            {"source": "ent:aaaaaaaaaa", "target": "sum:0",
             "edge_type": "belongs_to", "prob": 0.9},
            {"source": "ent:bbbbbbbbbb", "target": "sum:0",
             "edge_type": "belongs_to", "prob": 0.8},
            {"source": "ent:aaaaaaaaaa", "target": "hedge:h1",
             "edge_type": "participates_in", "role": None},
        ],
    }


def _reference_style_meta():
    return {
        "search_params": {"alpha": 0.7, "member_top_m": 3},
        "graph_hash": "abc", "dirty": False,
        "vector_index": {"db_path": "vector_db", "model": "all-MiniLM-L6-v2",
                         "indexed_nodes": 0, "indexed_meta": {}},
    }


def test_load_reference_node_link_snapshot(tmp_path):
    d = tmp_path / "graph"
    d.mkdir()
    (d / "structure.json").write_text(json.dumps(_reference_style_structure()))
    (d / "meta.json").write_text(json.dumps(_reference_style_meta()))

    hg = HierarchicalGraph.load(str(d))
    st = hg.stats()
    assert st["nodes"] == {"entity": 2, "hyperedge": 1, "summary": 1}
    assert st["edges"]["belongs_to"] == 2
    # JSON-string attrs decoded
    assert hg.nodes["sum:0"]["members"] == ["Tim Burton", "Ed Wood"]
    assert hg.node_judge_overall("sum:0") == 8.0
    assert hg.nodes["ent:aaaaaaaaaa"]["l1_parents"] == {"0": 0.9}
    # stored search params merged in
    assert hg.search_params["alpha"] == 0.7
    assert hg.search_params["member_top_m"] == 3
    # indices rebuilt
    assert hg.find_entity("Tim Burton") == "ent:aaaaaaaaaa"
    assert hg.find_summary(0) == "sum:0"
    # no cached embeddings in a reference dir -> marked dirty, reindex + search works
    assert hg.dirty
    hg._encoder_name = "hashed"
    res = hg.search("Who directed Ed Wood?", top_k=3)
    assert res


def test_loaded_snapshot_resaves_in_our_format(tmp_path):
    d = tmp_path / "graph"
    d.mkdir()
    (d / "structure.json").write_text(json.dumps(_reference_style_structure()))
    (d / "meta.json").write_text(json.dumps(_reference_style_meta()))
    hg = HierarchicalGraph.load(str(d))
    out = tmp_path / "graph2"
    hg.save(str(out))
    hg2 = HierarchicalGraph.load(str(out))
    assert hg2.stats() == hg.stats()
