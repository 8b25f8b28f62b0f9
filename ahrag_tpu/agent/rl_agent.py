"""RLPolicyAgent: a trained PPO policy as an InferenceEngine-compatible agent.

Capability parity with the reference adapter (agent/rl_agent.py:10-43): featurize
the observation, sample a discrete action, translate it to an environment verb with
the gym's top-id picks. Two differences: the action->verb translation is
table-driven, and the action mask applies at inference (the reference samples
unmasked, policy_ppo.py:254-260 — flagged in SURVEY §7.1 step 7).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ahrag_tpu.agent.featurizer import featurize_observation
from ahrag_tpu.agent.ppo import PPOLearner, act_ppo

# action id -> (environment verb, how many top nodes it consumes)
_VERB_TABLE = {
    0: ("expand_parents", 2),
    1: ("expand_children", 2),
    2: ("expand_related", 1),
    3: ("commit_selection", 3),
    4: ("query_node_details", 1),
}


class RLPolicyAgent:
    def __init__(self, env: Any, model_path: str, seed: int = 0) -> None:
        self.env_like = env
        self.learner = PPOLearner.load(model_path)
        self._seed = seed

    def decide(self, observation: Dict[str, Any]) -> Dict[str, Any]:
        vec, _ = featurize_observation(observation)
        selection = observation.get("selection") or []
        mask = np.ones(self.learner.n_actions, dtype=np.float32)
        if not selection:
            mask[:-1] = 0.0  # end-only when the observation has no top nodes
        self._seed += 1
        action = act_ppo(self.learner, vec, mask=mask, seed=self._seed)
        verb, k = _VERB_TABLE.get(int(action), ("end_episode", 0))
        if verb == "end_episode":
            return {"action": verb, "params": {}}
        top_ids = [n["node_id"] for n in selection[:k] if n.get("node_id")]
        return {"action": verb, "params": {"node_ids": top_ids}}
