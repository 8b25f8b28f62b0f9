import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ahrag_tpu.agent.featurizer import OBS_DIM
from ahrag_tpu.agent.ppo import PPOLearner
from ahrag_tpu.graph import HierarchicalGraph
from ahrag_tpu.graph.multi import (hybrid_search_multi, rollout_multi,
                                   stack_graph_tensors)
from ahrag_tpu.graph.search import SearchWeights, hybrid_search
from tests.helpers import build_film_graph


def _science_graph():
    hg = HierarchicalGraph(encoder_name="hashed")
    ents = [("Marie Curie", "physicist who discovered radium", "person"),
            ("Radium", "radioactive element discovered by Marie Curie", "concept"),
            ("Nobel Prize", "award won twice by Marie Curie", "concept")]
    s = hg.add_summary(0, "Radioactivity pioneers",
                       "Scientists who studied radioactivity", confidence=6.0,
                       members=[e[0] for e in ents])
    for name, desc, t in ents:
        hg.add_belongs_to(hg.add_entity(name, desc, t), s, prob=0.9)
    hg.build_vector_index(layers=(0, 1, 2))
    return hg


@pytest.fixture(scope="module")
def graphs():
    a = build_film_graph()
    a.build_vector_index(layers=(0, 1, 2))
    b = _science_graph()
    return [a, b]


def test_stack_shapes(graphs):
    batched = stack_graph_tensors([g.tensors() for g in graphs])
    assert batched.emb.ndim == 3 and batched.emb.shape[0] == 2
    assert batched.parents.shape[0] == 2
    # padding rows invalid
    assert not bool(batched.valid[1, graphs[1].number_of_nodes():].any())


def test_multi_search_matches_individual(graphs):
    queries = ["Who directed the film Ed Wood?", "Who discovered radium?"]
    batched = stack_graph_tensors([g.tensors() for g in graphs])
    q_embs = jnp.stack([jnp.asarray(g.encode_query([q])[0])
                        for g, q in zip(graphs, queries)])
    w = SearchWeights.create()
    multi = hybrid_search_multi(batched, q_embs, w)
    for i, (g, q) in enumerate(zip(graphs, queries)):
        single = hybrid_search(g.tensors(), q_embs[i], w)
        s_ids = [g.idx_to_id(int(x)) for x, ok in
                 zip(np.asarray(single.reranked_idx),
                     np.asarray(single.reranked_valid)) if ok]
        m_idx = np.asarray(multi.reranked_idx[i])
        m_ok = np.asarray(multi.reranked_valid[i])
        m_ids = [g.idx_to_id(int(x)) for x, ok in zip(m_idx, m_ok) if ok]
        assert m_ids == s_ids, (i, m_ids, s_ids)
        np.testing.assert_allclose(
            np.asarray(multi.reranked_score[i])[m_ok],
            np.asarray(single.reranked_score)[np.asarray(single.reranked_valid)],
            rtol=1e-5)


def test_rollout_multi_runs(graphs):
    queries = ["Who directed Ed Wood?", "radium discovery"]
    batched = stack_graph_tensors([g.tensors() for g in graphs])
    q_embs = jnp.stack([jnp.asarray(g.encode_query([q])[0])
                        for g, q in zip(graphs, queries)])
    learner = PPOLearner(OBS_DIM, 6)
    traj, final = rollout_multi(batched, q_embs, learner.params, learner.apply_fn,
                                jax.random.PRNGKey(0), SearchWeights.create(),
                                max_steps=4)
    assert traj.obs.shape == (2, 4, OBS_DIM)
    assert bool(traj.mask[:, 0].all())
