"""RLPolicyAgent: trained PPO policy as an InferenceEngine-compatible agent.

Parity with agent/rl_agent.py:10-43 — featurize the observation, sample an action,
map the discrete id to the environment verb with the gym's top-id picks. The action
mask is applied at inference (fixing the reference's unmasked act_ppo).
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ahrag_tpu.agent.featurizer import featurize_observation
from ahrag_tpu.agent.ppo import PPOLearner, act_ppo


class RLPolicyAgent:
    def __init__(self, env: Any, model_path: str, seed: int = 0) -> None:
        self.env_like = env
        self.learner = PPOLearner.load(model_path)
        self._seed = seed

    def _pick_top_ids(self, observation: Dict[str, Any], k: int = 2) -> List[str]:
        return [n["node_id"] for n in (observation.get("selection") or [])[:k]
                if n.get("node_id")]

    def decide(self, observation: Dict[str, Any]) -> Dict[str, Any]:
        vec, _ = featurize_observation(observation)
        has_top = bool(observation.get("selection"))
        mask = np.ones(self.learner.n_actions, dtype=np.float32)
        if not has_top:
            mask[:-1] = 0.0
        self._seed += 1
        a = act_ppo(self.learner, vec, mask=mask, seed=self._seed)
        if a == 0:
            return {"action": "expand_parents",
                    "params": {"node_ids": self._pick_top_ids(observation, 2)}}
        if a == 1:
            return {"action": "expand_children",
                    "params": {"node_ids": self._pick_top_ids(observation, 2)}}
        if a == 2:
            return {"action": "expand_related",
                    "params": {"node_ids": self._pick_top_ids(observation, 1)}}
        if a == 3:
            return {"action": "commit_selection",
                    "params": {"node_ids": self._pick_top_ids(observation, 3)}}
        if a == 4:
            return {"action": "query_node_details",
                    "params": {"node_ids": self._pick_top_ids(observation, 1)}}
        return {"action": "end_episode", "params": {}}
