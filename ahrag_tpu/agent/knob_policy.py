"""Retrieval-knob policy: the round-5 PPO unfreeze lever (VERDICT r4 item 6).

The round-4 freeze diagnosis was that the 6-action traversal policy cannot
change what the InferenceEngine retrieves — the anchor/rescue/auto-commit
pipeline determines the evidence regardless of the trajectory. This module
gives the policy the designated lever instead: a per-question choice among
knob CONFIGS that verifiably change the retrieved set (rescue-pool width,
evidence caps, hop budget — ``InferenceEngine.run_inference(knobs=...)``;
wiring evidence in reports/knob_rewards_*_r5.json ``retrieved_differs``).

Because the pipeline is deterministic given (question, graph, knobs), one
sweep per item per config is COMPLETE bandit feedback (tools/knob_sweep.py),
and the policy trains with the same clipped-PPO objective the traversal
stack uses (agent/ppo.py PPOConfig semantics) over single-step episodes: state =
question features, action = config id, reward = the item's F1 under that
config, advantage = reward - V(state). Sampling from the full reward matrix
is exact — no rollout variance — so a win or a loss here is a property of
the lever, not of exploration luck.

Measurement protocol: train on the v5 TRAIN matrix, report
``ppo_minus_rule`` (mean F1 of policy-chosen configs minus the default
config) on DEV with a bootstrap CI; the TEST split runs once at round end.
"""
from __future__ import annotations

import json
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

#: mirror of tools/knob_sweep.py CONFIGS (index-aligned with the matrices)
CONFIG_KNOBS: List[Dict[str, int]] = [
    {},
    {"rescue_top_n": 0, "rescue_clause_top_n": 0},
    {"rescue_top_n": 6, "rescue_clause_top_n": 3},
    {"max_entities": 9, "max_summaries": 4},
    {"max_entities": 3, "max_summaries": 2, "hops": 1},
    {"rescue_top_n": 6, "rescue_clause_top_n": 3, "max_entities": 9,
     "hops": 3},
]
N_CONFIGS = len(CONFIG_KNOBS)
N_FEATURES = 16

_TOKEN_RE = re.compile(r"[A-Za-z0-9][\w']*")
_CAP_RUN_RE = re.compile(r"\b[A-Z][\w']*(?:\s+[A-Z][\w']*)+\b")
_YEAR_WORD_RE = re.compile(r"\b(?:year|when)\b", re.IGNORECASE)


def featurize_question(q: str) -> np.ndarray:
    """Question-shape features — generic structure, no relation vocabulary
    (the v5 disjointness discipline applies to the policy too)."""
    toks = _TOKEN_RE.findall(q)
    low = [t.lower() for t in toks]
    caps = [t for t in toks if t[:1].isupper()]
    cap_runs = _CAP_RUN_RE.findall(q)
    n = max(1, len(toks))
    f = np.zeros(N_FEATURES, np.float32)
    f[0] = min(len(toks), 24) / 24.0
    f[1] = len(caps) / n
    f[2] = min(len(cap_runs), 3) / 3.0
    f[3] = float(low[0] in ("who", "whom") if low else 0.0)
    f[4] = float(bool(_YEAR_WORD_RE.search(q)))
    f[5] = float(low[0] in ("what", "which") if low else 0.0)
    f[6] = float(low[0] in ("where",) if low else 0.0)
    f[7] = float(low[0] in ("how",) if low else 0.0)
    f[8] = float("?" in q)
    f[9] = float(any(t in ("of", "by") for t in low))
    f[10] = float(any(t == "the" for t in low[:3]))  # descriptor-led subject
    f[11] = min(sum(1 for t in low if len(t) > 7), 4) / 4.0
    f[12] = float(len(cap_runs) == 0)   # no named anchor at all
    f[13] = float(len(cap_runs) >= 2)   # multi-anchor (comparison/bridge)
    f[14] = min(len(q), 120) / 120.0
    f[15] = 1.0                         # bias
    return f


def train_knob_policy(matrix_path: str, out_path: str, seed: int = 7,
                      steps: int = 400, lr: float = 0.05
                      ) -> Dict[str, float]:
    """Fit the config policy on a knob_sweep reward matrix (train split).

    Single-step PPO on exact bandit feedback: per item, sample a config from
    the current policy, advantage = reward - V(s), clipped-surrogate update
    (agent/ppo.py::ppo_update_jit) over the whole batch per step.
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ahrag_tpu.agent.ppo import PPOConfig
    from ahrag_tpu.models.policy.nets import ActorCritic

    with open(matrix_path, encoding="utf-8") as fh:
        data = json.load(fh)
    items = data["items"]
    feats = np.stack([featurize_question(r["question"]) for r in items])
    rewards = np.asarray([[c["f1"] / 100.0 for c in r["configs"]]
                          for r in items], np.float32)    # [N, C]

    model = ActorCritic(n_actions=N_CONFIGS, hidden=32)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, N_FEATURES), jnp.float32))
    apply_fn = model.apply
    import optax
    cfg = PPOConfig(lr=lr, entropy_coef=0.02, epochs=1)
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed)
    x = jnp.asarray(feats)
    r_all = jnp.asarray(rewards)

    @jax.jit
    def step(params, opt_state, key):
        logits, values = apply_fn(params, x)
        key, k1 = jax.random.split(key)
        acts = jax.random.categorical(k1, logits)           # [N]
        logp = jax.nn.log_softmax(logits)[jnp.arange(x.shape[0]), acts]
        rew = r_all[jnp.arange(x.shape[0]), acts]
        adv = rew - values
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)

        def loss_fn(p):
            lg, v = apply_fn(p, x)
            lp = jax.nn.log_softmax(lg)[jnp.arange(x.shape[0]), acts]
            ratio = jnp.exp(lp - logp)
            s1 = ratio * adv_n
            s2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n
            pol = -jnp.minimum(s1, s2).mean()
            vloss = jnp.mean((v - rew) ** 2)
            ent = -jnp.mean(jnp.sum(jax.nn.softmax(lg)
                                    * jax.nn.log_softmax(lg), axis=1))
            return pol + cfg.value_coef * vloss - cfg.entropy_coef * ent
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, key, rew.mean()

    for i in range(steps):
        params, opt_state, key, mean_r = step(params, opt_state, key)
    # greedy train accuracy vs oracle
    logits, _ = apply_fn(params, x)
    greedy = np.asarray(jnp.argmax(logits, axis=1))
    train_f1 = float(np.mean(rewards[np.arange(len(items)), greedy]) * 100)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return {"train_policy_f1": round(train_f1, 2),
            "train_default_f1": round(float(rewards[:, 0].mean() * 100), 2),
            "train_oracle_f1": round(float(rewards.max(axis=1).mean() * 100),
                                     2)}


import functools


@functools.lru_cache(maxsize=4)
def load_knob_policy(ckpt_path: str):
    """(predict_fn question -> knobs dict) from a trained checkpoint."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ahrag_tpu.models.policy.nets import ActorCritic

    model = ActorCritic(n_actions=N_CONFIGS, hidden=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, N_FEATURES), jnp.float32))
    apply_fn = model.apply
    with open(ckpt_path, "rb") as f:
        params = serialization.from_bytes(params, f.read())

    def predict(question: str) -> Dict[str, int]:
        x = jnp.asarray(featurize_question(question)[None])
        logits, _ = apply_fn(params, x)
        return CONFIG_KNOBS[int(jnp.argmax(logits[0]))]

    return predict


def evaluate_policy(matrix_path: str, ckpt_path: str,
                    n_boot: int = 2000, seed: int = 3
                    ) -> Dict[str, object]:
    """ppo_minus_rule on a held-out matrix, with a bootstrap CI."""
    predict = load_knob_policy(ckpt_path)
    with open(matrix_path, encoding="utf-8") as fh:
        data = json.load(fh)
    items = data["items"]
    deltas = []
    pol_f1, def_f1 = [], []
    for r in items:
        knobs = predict(r["question"])
        ci = CONFIG_KNOBS.index(knobs)
        pol_f1.append(r["configs"][ci]["f1"])
        def_f1.append(r["configs"][0]["f1"])
        deltas.append(pol_f1[-1] - def_f1[-1])
    deltas = np.asarray(deltas)
    rng = np.random.default_rng(seed)
    boots = [float(deltas[rng.integers(0, len(deltas),
                                       len(deltas))].mean())
             for _ in range(n_boot)]
    lo, hi = np.percentile(boots, [2.5, 97.5])
    return {"n": len(items),
            "policy_f1": round(float(np.mean(pol_f1)), 2),
            "default_f1": round(float(np.mean(def_f1)), 2),
            "ppo_minus_rule": round(float(deltas.mean()), 3),
            "ci95": [round(float(lo), 3), round(float(hi), 3)]}
