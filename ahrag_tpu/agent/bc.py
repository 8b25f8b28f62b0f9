"""Behavior cloning on trajectory JSONL (capability parity with policy_bc.py:20-121).

Trains the 2x128 MLP policy with optax cross-entropy on (obs_vec, action) pairs;
checkpoints are flax-msgpack payloads ``{params, in_dim, n_actions}``.
"""
from __future__ import annotations

import json
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ahrag_tpu.models.policy.nets import MLPPolicy


def load_trajectories(path: str) -> Tuple[np.ndarray, np.ndarray]:
    X: List[List[float]] = []
    y: List[int] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            try:
                obj = json.loads(line)
            except Exception:
                continue
            for s in obj.get("steps", []):
                vec = s.get("obs_vec") or []
                act = s.get("action")
                if isinstance(act, int) and vec:
                    X.append([float(v) for v in vec])
                    y.append(int(act))
    if not X:
        raise RuntimeError("No (obs_vec, action) pairs found in trajectories")
    return np.asarray(X, dtype=np.float32), np.asarray(y, dtype=np.int64)


def train_bc(traj_path: str, out_path: str, epochs: int = 5, lr: float = 1e-3,
             n_actions: int = 6, batch_size: int = 256, seed: int = 0) -> dict:
    X, y = load_trajectories(traj_path)
    in_dim = X.shape[1]
    model = MLPPolicy(n_actions=n_actions)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, in_dim)))["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = model.apply({"params": p}, xb)
            return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = X.shape[0]
    history = []
    for ep in range(epochs):
        perm = rng.permutation(n)
        total = 0.0
        for i in range(0, n, batch_size):
            b = perm[i:i + batch_size]
            params, opt_state, loss = update(params, opt_state,
                                             jnp.asarray(X[b]), jnp.asarray(y[b]))
            total += float(loss) * len(b)
        history.append(total / max(1, n))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    payload = {"params": jax.tree_util.tree_map(np.asarray, params),
               "in_dim": in_dim, "n_actions": n_actions}
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return {"epochs": epochs, "final_loss": history[-1], "history": history,
            "n_samples": int(n)}


def load_bc(path: str):
    """Returns (apply_fn(obs[B, D]) -> logits, meta dict)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    model = MLPPolicy(n_actions=int(payload["n_actions"]))
    params = payload["params"]

    @jax.jit
    def apply_fn(obs):
        return model.apply({"params": params}, obs)

    return apply_fn, {"in_dim": int(payload["in_dim"]),
                      "n_actions": int(payload["n_actions"])}


def act_bc(apply_fn, obs_vec: np.ndarray, seed: int = 0) -> int:
    logits = apply_fn(jnp.asarray(obs_vec.reshape(1, -1)))
    key = jax.random.PRNGKey(seed)
    return int(jax.random.categorical(key, logits[0]))
