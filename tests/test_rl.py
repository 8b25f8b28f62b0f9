import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ahrag_tpu.agent.bc import act_bc, load_bc, train_bc
from ahrag_tpu.agent.featurizer import OBS_DIM
from ahrag_tpu.agent.gym import AHRAGGymEnv
from ahrag_tpu.agent.ppo import PPOConfig, PPOLearner, act_ppo, compute_gae, ppo_train
from ahrag_tpu.agent import vec_env
from ahrag_tpu.graph.search import SearchWeights
from tests.helpers import build_film_graph


@pytest.fixture(scope="module")
def graph():
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    hg.tensors()
    return hg


def test_compute_gae_matches_manual():
    adv, ret = compute_gae([1.0, 0.0, 1.0], [0.5, 0.5, 0.5], [False, False, True],
                           gamma=0.9, lam=0.9)
    # manual: t=2 terminal: delta2 = 1 - .5 = .5; t=1: delta = 0 + .9*.5 - .5 = -.05,
    # A1 = -.05 + .81*.5 = .355; t=0: delta = 1 + .9*.5 - .5 = .95, A0 = .95+.81*.355
    raw = np.array([0.95 + 0.81 * 0.355, 0.355, 0.5], dtype=np.float32)
    expect_ret = raw + 0.5
    np.testing.assert_allclose(ret, expect_ret, rtol=1e-5)
    # adv is normalized
    assert abs(float(np.mean(adv))) < 1e-6


def test_bc_train_and_act(tmp_path):
    traj_path = tmp_path / "traj.jsonl"
    rng = np.random.default_rng(0)
    with open(traj_path, "w") as f:
        for _ in range(30):
            steps = [{"action": int(rng.integers(0, 6)),
                      "reward": 0.1,
                      "obs_vec": rng.normal(size=OBS_DIM).tolist()}
                     for _ in range(4)]
            f.write(json.dumps({"query": "q", "steps": steps}) + "\n")
    out_path = str(tmp_path / "bc.msgpack")
    report = train_bc(str(traj_path), out_path, epochs=2)
    assert report["n_samples"] == 120 and report["final_loss"] > 0
    apply_fn, meta = load_bc(out_path)
    assert meta == {"in_dim": OBS_DIM, "n_actions": 6}
    a = act_bc(apply_fn, np.zeros(OBS_DIM, np.float32), seed=1)
    assert 0 <= a < 6


def test_ppo_learner_update_reduces_loss():
    learner = PPOLearner(OBS_DIM, 6, PPOConfig(epochs=2, batch_size=32), seed=0)
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(64, OBS_DIM)).astype(np.float32)
    acts = rng.integers(0, 6, size=64)
    logp = np.full(64, -1.8, np.float32)
    ret = rng.normal(size=64).astype(np.float32)
    adv = rng.normal(size=64).astype(np.float32)
    losses = learner.update(obs, acts, logp, ret, adv)
    assert set(losses) == {"policy", "value", "entropy"}


def test_ppo_save_load_roundtrip(tmp_path):
    learner = PPOLearner(OBS_DIM, 6)
    p = str(tmp_path / "ppo.msgpack")
    learner.save(p)
    loaded = PPOLearner.load(p)
    x = jnp.ones((1, OBS_DIM))
    l1, v1 = learner.apply_fn(learner.params, x)
    l2, v2 = loaded.apply_fn(loaded.params, x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_act_ppo_respects_mask():
    learner = PPOLearner(OBS_DIM, 6)
    mask = np.zeros(6, np.float32)
    mask[5] = 1.0
    for s in range(5):
        assert act_ppo(learner, np.zeros(OBS_DIM, np.float32), mask=mask, seed=s) == 5


def test_ppo_train_host_smoke(graph, tmp_path):
    out = str(tmp_path / "ppo.msgpack")
    learner = ppo_train(lambda: AHRAGGymEnv(hg=graph, max_steps=3),
                        questions=["Who directed Ed Wood?", "American directors"],
                        total_episodes=2, max_steps=3,
                        ppo_cfg=PPOConfig(epochs=1, batch_size=16),
                        save_path=out, n_envs=1, log=lambda s: None)
    assert learner.in_dim == OBS_DIM
    import os
    assert os.path.exists(out)


class TestVecEnvParity:
    """Host gym and device env must produce identical trajectories."""

    @pytest.mark.parametrize("actions", [
        [0, 3, 2, 1], [3, 0, 0, 2], [1, 2, 3, 4], [4, 3, 1, 0],
    ])
    def test_trajectory_parity(self, graph, actions):
        query = "Who directed the film Ed Wood?"
        w = SearchWeights.create()
        gt = graph.tensors()
        q = jnp.asarray(graph.encode_query([query])[0])

        gym = AHRAGGymEnv(hg=graph, max_steps=6)
        hvec, _ = gym.reset(query)
        dstate = vec_env.env_reset(gt, q, w)
        dvec = np.asarray(vec_env.observe(gt, dstate))
        np.testing.assert_allclose(hvec, dvec, atol=2e-3)

        for a in actions:
            hvec, hr, hdone, _ = gym.step(a)
            dstate, dr, ddone = vec_env.env_step(gt, dstate, jnp.int32(a))
            assert abs(float(dr) - hr) < 1e-5, (a, float(dr), hr)
            assert bool(ddone) == hdone
            dvec = np.asarray(vec_env.observe(gt, dstate))
            np.testing.assert_allclose(hvec, dvec, atol=2e-3, err_msg=f"action {a}")
            if hdone:
                break

    def test_end_action_parity(self, graph):
        w = SearchWeights.create()
        gt = graph.tensors()
        q = jnp.asarray(graph.encode_query(["Tim Burton"])[0])
        state = vec_env.env_reset(gt, q, w)
        state, r, done = vec_env.env_step(gt, state, jnp.int32(5))
        assert bool(done) and float(r) == 0.0


def test_rollout_batch_shapes(graph):
    gt = graph.tensors()
    qs = graph.encode_query(["Who directed Ed Wood?", "American directors",
                             "Doctor Strange film"])
    learner = PPOLearner(OBS_DIM, 6)
    traj, final = vec_env.rollout_batch(gt, jnp.asarray(qs), learner.params,
                                        learner.apply_fn, jax.random.PRNGKey(0),
                                        SearchWeights.create(), max_steps=4)
    assert traj.obs.shape == (3, 4, OBS_DIM)
    assert traj.actions.shape == (3, 4)
    assert bool(traj.mask[:, 0].all())  # first step always live
    assert np.asarray(final.done).all() or traj.mask.any()


def test_ppo_train_device_smoke(graph, tmp_path):
    from ahrag_tpu.agent.ppo import ppo_train_device
    gt = graph.tensors()
    qs = graph.encode_query(["Who directed Ed Wood?", "American directors"])
    learner = ppo_train_device(gt, qs, SearchWeights.create(), n_updates=2,
                               max_steps=3, batch_size=2,
                               ppo_cfg=PPOConfig(epochs=1, batch_size=8),
                               save_path=str(tmp_path / "ppo_dev.msgpack"),
                               log=lambda s: None,
                               curve_out=str(tmp_path / "curve.json"))
    import json
    import os
    assert os.path.exists(tmp_path / "ppo_dev.msgpack")
    curve = json.load(open(tmp_path / "curve.json"))
    assert curve["n_updates"] == 2 and len(curve["curve"]) == 2
    assert all(np.isfinite(c["mean_ep_reward"]) for c in curve["curve"])
    assert {"policy", "value", "entropy"} <= set(curve["curve"][0])


class TestLCAAction:
    def test_gym_lca_action(self, graph):
        gym = AHRAGGymEnv(hg=graph, max_steps=6, include_lca_action=True)
        assert gym.action_size == 7
        gym.reset("Who directed the film Ed Wood?")
        vec, r, done, info = gym.step(6)
        ids = info["aux"]["top_node_ids"]
        assert ids, "LCA action returned nothing"

    def test_device_lca_parity(self, graph):
        query = "Who directed the film Ed Wood?"
        gym = AHRAGGymEnv(hg=graph, max_steps=6, include_lca_action=True)
        hvec, _ = gym.reset(query)
        gt = graph.tensors()
        q = jnp.asarray(graph.encode_query([query])[0])
        dstate = vec_env.env_reset(gt, q, SearchWeights.create())
        hvec, hr, hdone, hinfo = gym.step(6)
        dstate, dr, ddone = vec_env.env_step(gt, dstate, jnp.int32(6),
                                             enable_lca=True)
        dvec = np.asarray(vec_env.observe(gt, dstate))
        np.testing.assert_allclose(hvec, dvec, atol=2e-3)
        assert abs(float(dr) - hr) < 1e-5
        # same LCA node ids, in order
        host_ids = hinfo["aux"]["top_node_ids"]
        dev_ids = [graph.idx_to_id(int(i)) for i in np.asarray(dstate.top_ids)
                   if i < gt.n_pad]
        assert dev_ids == host_ids


def test_collect_trajectories_device_mode(graph, tmp_path, monkeypatch):
    import sys
    d = str(tmp_path / "graph")
    graph.save(d)
    out = str(tmp_path / "traj.jsonl")
    from ahrag_tpu.cli import collect_trajectories as ct
    data = tmp_path / "q.jsonl"
    data.write_text('{"id": "1", "question": "Who directed Ed Wood?", '
                    '"answers": ["Tim Burton"]}\n'
                    '{"id": "2", "question": "American directors", '
                    '"answers": []}\n')
    monkeypatch.setattr(sys, "argv", [
        "collect", "--data", str(data), "--graph", d, "--out", out,
        "--max-steps", "3", "--device"])
    ct.main()
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 2
    traj = json.loads(lines[0])
    assert traj["steps"] and len(traj["steps"][0]["obs_vec"]) == OBS_DIM
    # BC trains from device-collected trajectories
    report = train_bc(out, str(tmp_path / "bc.msgpack"), epochs=1)
    assert report["n_samples"] > 0
