import os

import numpy as np

from ahrag_tpu.agent.featurizer import OBS_DIM
from ahrag_tpu.agent.gym import AHRAGGymEnv
from ahrag_tpu.agent.ppo import PPOConfig, PPOLearner, ppo_train
from ahrag_tpu.utils.profiling import Timers
from tests.helpers import build_film_graph


def test_timers_accumulate():
    t = Timers()
    with t.timed("op"):
        sum(range(1000))
    with t.timed("op"):
        sum(range(1000))
    snap = t.snapshot()
    assert snap["op"]["count"] == 2
    assert snap["op"]["total_s"] > 0
    assert snap["op"]["mean_s"] <= snap["op"]["max_s"] + 1e-12


def test_training_state_roundtrip(tmp_path):
    learner = PPOLearner(OBS_DIM, 6, PPOConfig(epochs=1))
    rng = np.random.default_rng(0)
    learner.update(rng.normal(size=(32, OBS_DIM)).astype(np.float32),
                   rng.integers(0, 6, 32), np.full(32, -1.8, np.float32),
                   rng.normal(size=32).astype(np.float32),
                   rng.normal(size=32).astype(np.float32))
    p = str(tmp_path / "state.msgpack")
    learner.save_training_state(p, {"next_index": 7, "best_mavg": 0.5,
                                    "stale": 1, "ep_idx": 3})
    fresh = PPOLearner(OBS_DIM, 6, PPOConfig(epochs=1))
    progress = fresh.restore_training_state(p)
    assert progress["next_index"] == 7 and progress["ep_idx"] == 3
    a = jax_leaves(learner.params)
    b = jax_leaves(fresh.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def jax_leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def test_ppo_train_resume(tmp_path):
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    out = str(tmp_path / "ppo.msgpack")
    qs = ["Who directed Ed Wood?", "American directors", "Doctor Strange",
          "Tim Burton films"]
    ppo_train(lambda: AHRAGGymEnv(hg=hg, max_steps=2), qs, total_episodes=2,
              max_steps=2, ppo_cfg=PPOConfig(epochs=1), save_path=out,
              n_envs=1, log=lambda s: None)
    assert os.path.exists(out + ".train")
    # resume picks up from the stored index and completes without error
    logs = []
    ppo_train(lambda: AHRAGGymEnv(hg=hg, max_steps=2), qs, total_episodes=4,
              max_steps=2, ppo_cfg=PPOConfig(epochs=1), save_path=out,
              n_envs=1, resume=True, log=logs.append)
    assert any("resumed" in s for s in logs)
