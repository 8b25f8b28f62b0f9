import json
import os

import numpy as np
import pytest

from ahrag_tpu.agent.environment import GraphEnvironment
from ahrag_tpu.agent.featurizer import OBS_DIM, featurize_observation
from ahrag_tpu.agent.gym import AHRAGGymEnv
from ahrag_tpu.agent.reward import final_reward, step_reward
from tests.helpers import build_film_graph


@pytest.fixture
def env(tmp_path):
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    return GraphEnvironment(hg=hg, log_dir=str(tmp_path / "sessions"))


def test_reset_with_seed_produces_anchor_contract(env):
    obs, info = env.reset(seed_query="Who directed Ed Wood?")
    # reference test_environment.py contract
    assert info["action"] == "semantic_anchor"
    assert "time_s" in info and info["returned"] > 0
    assert obs["selection"] and obs["seeds"]
    assert obs["state"]["frontier_ids"]
    assert obs["counts"]["n_nodes"] == 10


def test_expansions_and_commit(env):
    obs, _ = env.reset(seed_query="Tim Burton")
    top = obs["selection"][0]["node_id"]
    obs2, info2 = env.expand_parents([top])
    assert info2["action"] == "expand_parents"
    obs3, info3 = env.commit_selection([top])
    assert top in env.selection_set and top not in env.frontier_set
    assert info3["added"] == [top]
    # commit again is a no-op
    _, info4 = env.commit_selection([top])
    assert info4["added"] == []


def test_expand_related_includes_hyperedge_coparticipants(env):
    env.reset(seed_query="x")
    burton = env.hg.find_entity("Tim Burton")
    obs, info = env.expand_related([burton], limit=10)
    ids = {n["node_id"] for n in obs["selection"]}
    assert "hedge:h1" in ids                       # the hyperedge itself
    assert env.hg.find_entity("Ed Wood") in ids    # co-participant


def test_expand_to_lca(env):
    env.reset(seed_query="x")
    burton = env.hg.find_entity("Tim Burton")
    wood = env.hg.find_entity("Ed Wood")
    obs, info = env.expand_to_lca([burton, wood])
    assert info["dag"] is True
    # lowest common ancestor of a director and a film is the L2 community
    assert [n["node_id"] for n in obs["selection"]] == ["sum:2"]


def test_filters_and_weights_state(env):
    info = env.set_filters(judge_overall_min=5.0, type_filter=["summary"])
    assert env.current_filters["judge_overall_min"] == 5.0
    info = env.set_search_weights(alpha=0.9, top_k=3)
    assert env.current_weights["alpha"] == 0.9
    obs, _ = env.reset(seed_query="American directors")
    assert all(n["node_type"] == "summary" for n in obs["selection"])


def test_end_episode_summary(env, tmp_path):
    env.reset(seed_query="Tim Burton")
    summary = env.end_episode()
    assert summary["stats"]["cumulative"]["queries"] == 1
    assert os.path.exists(os.path.join(env.session_path, "summary.json"))
    assert os.path.exists(os.path.join(env.session_path, "events.jsonl"))


def test_featurizer_layout(env):
    obs, _ = env.reset(seed_query="Who directed Ed Wood?")
    vec, aux = featurize_observation(obs)
    assert vec.shape == (OBS_DIM,) and vec.dtype == np.float32
    assert vec[0] == obs["step"]
    assert vec[3] == len(obs["seeds"])
    assert aux["top_node_ids"][0] == obs["selection"][0]["node_id"]
    # first node block one-hot sums to 1
    assert vec[4] + vec[5] + vec[6] == 1.0


def test_step_reward_formula():
    prev = {"state": {"selection_ids": [], "frontier_ids": ["a"]}}
    cur = {"state": {"selection_ids": ["x", "y"], "frontier_ids": ["a", "b", "c"]}}
    r = step_reward(prev, cur)
    assert abs(r - (2.0 + 0.05 * 2 - 0.05)) < 1e-9
    assert step_reward(None, cur) == 0.0


def test_final_reward_formula():
    r = final_reward({"f1": 1.0, "faithfulness": 0.5, "answer_relevancy": 0.5,
                      "contextual_recall": 1.0})
    assert abs(r - (0.4 + 0.15 + 0.1 + 0.1)) < 1e-9


class TestGym:
    @pytest.fixture
    def gym(self, tmp_path):
        hg = build_film_graph()
        hg.build_vector_index(layers=(0, 1, 2))
        return AHRAGGymEnv(hg=hg, max_steps=6)

    def test_reset_and_mask(self, gym):
        vec, info = gym.reset("Who directed Ed Wood?")
        assert vec.shape == (OBS_DIM,)
        assert info["action_mask"] == [1] * 6

    def test_episode_caps_at_max_steps(self, gym):
        gym.reset("Tim Burton")
        done = False
        steps = 0
        while not done:
            _, r, done, info = gym.step(0)
            steps += 1
        assert steps == 6

    def test_end_action_terminates(self, gym):
        gym.reset("Tim Burton")
        _, r, done, _ = gym.step(5)
        assert done and r == 0.0

    def test_repeat_penalty(self):
        hg = build_film_graph()
        hg.build_vector_index(layers=(0, 1, 2))
        rewards = {}
        for penalty in (0.0, 0.02):
            g = AHRAGGymEnv(hg=hg, max_steps=6, repeat_penalty=penalty)
            g.reset("Tim Burton")
            g.step(0)
            _, r2, _, _ = g.step(0)  # repeated action
            rewards[penalty] = r2
        # identical transition; the only difference is the repeat penalty
        assert abs((rewards[0.0] - rewards[0.02]) - 0.02) < 1e-9

    def test_commit_action_moves_selection(self, gym):
        gym.reset("Who directed Ed Wood?")
        _, r, _, info = gym.step(3)  # commit top3
        assert len(gym.env.selection_set) > 0
        assert r > 0  # selections reward
