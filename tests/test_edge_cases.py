"""Robustness edge cases: empty/tiny graphs, missing data, degenerate inputs."""
import jax.numpy as jnp
import numpy as np

from ahrag_tpu.agent.environment import GraphEnvironment
from ahrag_tpu.agent.gym import AHRAGGymEnv
from ahrag_tpu.graph import HierarchicalGraph
from ahrag_tpu.graph.search import SearchWeights, hybrid_search


def _empty_graph():
    hg = HierarchicalGraph(encoder_name="hashed")
    hg.build_vector_index(layers=(0, 1, 2))
    return hg


def test_search_on_empty_graph():
    hg = _empty_graph()
    assert hg.search("anything", top_k=5) == []
    out = hg.search("anything", top_k=5, return_cluster=True)
    assert out["seeds"] == [] and out["reranked"] == []


def test_env_on_empty_graph(tmp_path):
    hg = _empty_graph()
    env = GraphEnvironment(hg=hg, log_dir=str(tmp_path))
    obs, info = env.reset(seed_query="anything")
    assert obs["selection"] == []
    obs2, info2 = env.expand_parents(["nonexistent"])
    assert info2["returned"] == 0
    summary = env.end_episode()
    assert summary["selection_size"] == 0


def test_gym_empty_graph_masks_to_end(tmp_path):
    hg = _empty_graph()
    gym = AHRAGGymEnv(hg=hg, max_steps=3)
    vec, info = gym.reset("anything")
    assert info["action_mask"] == [0, 0, 0, 0, 0, 1]
    _, r, done, _ = gym.step(5)
    assert done


def test_single_node_graph_search():
    hg = HierarchicalGraph(encoder_name="hashed")
    hg.add_entity("Solo Node", "the only node here", "concept")
    hg.build_vector_index(layers=(0, 1, 2))
    res = hg.search("solo node", top_k=5)
    assert len(res) == 1 and res[0]["name"] == "Solo Node"


def test_hybrid_search_all_filtered_out():
    hg = HierarchicalGraph(encoder_name="hashed")
    hg.add_entity("A Node", "some text", "concept")
    hg.build_vector_index(layers=(0, 1, 2))
    # judge filter drops everything (no judge scores exist)
    res = hg.search("some text", top_k=5, judge_overall_min=5.0)
    assert res == []


def test_commit_nonexistent_nodes(tmp_path):
    from tests.helpers import build_film_graph
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    env = GraphEnvironment(hg=hg, log_dir=str(tmp_path))
    env.reset(seed_query="x")
    _, info = env.commit_selection(["ghost:123", "also:missing"])
    assert info["added"] == []


def test_query_details_missing_node(tmp_path):
    from tests.helpers import build_film_graph
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    env = GraphEnvironment(hg=hg, log_dir=str(tmp_path))
    env.reset(seed_query="x")
    obs, info = env.query_node_details("ghost:404")
    assert info["error"] == "node_not_found"


def test_lca_of_unrelated_nodes(tmp_path):
    hg = HierarchicalGraph(encoder_name="hashed")
    a = hg.add_entity("Island A", "isolated", "concept")
    b = hg.add_entity("Island B", "isolated", "concept")
    hg.build_vector_index(layers=(0, 1, 2))
    env = GraphEnvironment(hg=hg, log_dir=str(tmp_path))
    env.reset(seed_query="x")
    obs, info = env.expand_to_lca([a, b])
    assert info["lca_count"] == 0


def test_context_empty_evidence():
    from ahrag_tpu.answer.context import ContextProcessor
    out = ContextProcessor().build_context({"summaries": [], "entities": []},
                                           _empty_graph(), 1000, {})
    assert out["used_nodes"] == []
    assert "Evidence Skeleton" in out["context_text"]


def test_generator_empty_context():
    from ahrag_tpu.answer.generator import AnswerGenerator
    out = AnswerGenerator().generate("any question?",
                                     {"context_text": "", "used_nodes": []},
                                     {"use_llm": False})
    assert "No sufficient evidence" in out["answer"]
    assert out["citations"] == []


def test_device_search_invalid_rows_never_surface():
    """Padding rows (valid=False) must never appear in results."""
    from tests.helpers import build_film_graph
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    gt = hg.tensors()
    q = jnp.asarray(hg.encode_query(["zzz completely unrelated query"])[0])
    res = hybrid_search(gt, q, SearchWeights.create(), top_k=10)
    idx = np.asarray(res.reranked_idx)
    ok = np.asarray(res.reranked_valid)
    assert (idx[ok] < gt.n_nodes).all()
