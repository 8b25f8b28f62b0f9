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


# ----------------------------------------------------- fleet + multi PPO
def _mini_items():
    return [
        {"id": "t0", "question": "Who discovered Radium?",
         "gold_titles": ["Marie Curie"],
         "context": {"title": ["Marie Curie", "Radium"],
                     "sentences": [["Marie Curie is a Polish physicist who "
                                    "discovered radium in 1898."],
                                   ["Radium is a radioactive element "
                                    "discovered by Marie Curie."]]}},
        {"id": "t1", "question": "What element did Marie Curie discover?",
         "gold_titles": ["Radium"],
         "context": {"title": ["Marie Curie", "Radium"],
                     "sentences": [["Marie Curie is a Polish physicist who "
                                    "discovered radium in 1898."],
                                   ["Radium is a radioactive element "
                                    "discovered by Marie Curie."]]}},
    ]


def test_fleet_builder_and_gold_masks():
    from ahrag_tpu.agent.fleet import build_question_fleet
    bgts, q_embs, gold_masks, metas = build_question_fleet(
        _mini_items(), log=lambda s: None)
    assert bgts.n_graphs == 2 and q_embs.shape == (2, bgts.emb.shape[2])
    assert gold_masks.shape == (2, bgts.n_pad)
    # each item's gold title resolves to at least one node
    assert gold_masks[0].sum() >= 1 and gold_masks[1].sum() >= 1
    # masks differ (different gold titles)
    assert not np.array_equal(gold_masks[0], gold_masks[1])


def test_ppo_train_multi_smoke(tmp_path):
    from ahrag_tpu.agent.fleet import build_question_fleet
    from ahrag_tpu.agent.ppo import PPOConfig, ppo_train_multi

    bgts, q_embs, gold_masks, _ = build_question_fleet(
        _mini_items(), log=lambda s: None)
    curve_path = tmp_path / "curve.json"
    model_path = tmp_path / "ppo.msgpack"
    learner = ppo_train_multi(bgts, q_embs, SearchWeights.create(),
                              gold_masks=gold_masks, n_updates=3,
                              ppo_cfg=PPOConfig(epochs=1),
                              save_path=str(model_path),
                              curve_out=str(curve_path),
                              log=lambda s: None, seed=0)
    assert model_path.exists() and curve_path.exists()
    import json
    curve = json.loads(curve_path.read_text())
    assert curve["n_updates"] == 3 and curve["n_graphs"] == 2
    assert all("mean_final_recall" in c for c in curve["curve"])
    # checkpoint round-trips into the learner loader
    reloaded = PPOLearner.load(str(model_path))
    assert reloaded.n_actions == learner.n_actions


def test_terminal_recall_reward_lands_on_last_live_step():
    """A policy that commits everything must earn the recall bonus; the bonus
    must sit on the last live step only (GAE correctness)."""
    from ahrag_tpu.agent.fleet import build_question_fleet
    from ahrag_tpu.agent.vec_env import N_ACTIONS

    bgts, q_embs, gold_masks, _ = build_question_fleet(
        _mini_items(), log=lambda s: None)

    def commit_policy(params, obs):
        # always action 3 (commit_top) -> logits peaked there
        logits = jnp.full((obs.shape[0], N_ACTIONS), -1e9)
        logits = logits.at[:, 3].set(0.0)
        return logits, jnp.zeros(obs.shape[0])

    traj, final = rollout_multi(bgts, jnp.asarray(q_embs), None, commit_policy,
                                jax.random.PRNGKey(0), SearchWeights.create(),
                                max_steps=4)
    sel = np.asarray(final.selection)
    hits = (sel & gold_masks).sum(axis=1)
    # committing top-3 every step should capture the gold node in these
    # two-paragraph graphs (the question names it)
    assert hits.sum() >= 1
