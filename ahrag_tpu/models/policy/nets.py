"""Policy networks (flax) for BC and PPO.

Architecture parity with the reference torch models: BC = 2x128 ReLU MLP -> 6 logits
(policy_bc.py:20-30); PPO = shared-nothing actor (2x128) + critic (1x128)
(policy_ppo.py:18-34). Re-implemented as flax modules trained with optax.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class MLPPolicy(nn.Module):
    n_actions: int = 6
    hidden: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.n_actions)(x)


class ActorCritic(nn.Module):
    n_actions: int = 6
    hidden: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        a = nn.relu(nn.Dense(self.hidden, name="actor_fc1")(x))
        a = nn.relu(nn.Dense(self.hidden, name="actor_fc2")(a))
        logits = nn.Dense(self.n_actions, name="actor_out")(a)
        c = nn.relu(nn.Dense(self.hidden, name="critic_fc1")(x))
        value = nn.Dense(1, name="critic_out")(c).squeeze(-1)
        return logits, value
