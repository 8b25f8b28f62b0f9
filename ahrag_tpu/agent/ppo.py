"""PPO training: clipped surrogate + GAE, host-gym and on-device batched paths.

Semantics parity with the reference PPO stack (policy_ppo.py:37-260): PPOConfig
defaults (epochs 3, gamma .99, clip .2, entropy .01, value .5, lr 3e-4, batch 256),
GAE(lambda=.95) with advantage normalization, clipped-surrogate + value MSE +
entropy bonus + grad clip 1.0, masked sampling, early stop on moving-average
episode reward.

Two rollout paths:

- ``ppo_train``: drives any host gym (AHRAGGymEnv protocol) — the
  reference-equivalent loop, but with the jitted update;
- ``ppo_train_device``: batched on-device episodes via agent/vec_env.rollout_batch —
  whole env batches execute as one XLA program per step (BASELINE.json config 5,
  replacing the reference's sequential Python roll at :144-215).

Conscious fix vs the reference (SURVEY §7.1 step 7): inference-time ``act_ppo``
applies the action mask; the reference samples unmasked at :254-260.

FREEZE (round 4, VERDICT r3 item 7): this stack is feature-frozen at its
documented ceiling — the policy demonstrably learns node SELECTION
(held-out selection-recall 0.41 vs 0.15 random, reports/rl_transfer_r3.json)
but contributes zero end-to-end answer quality under every honest condition
tested, because the InferenceEngine's anchor/auto-commit/evidence pipeline
determines the retrieved set regardless of the policy's trajectory (see
``ppo_train_multi`` docstring for the full retirement evidence). Round 4
chose the learned READER (models/reader/) as the learning story that
consumes the flax/optax substrate with a lever that matters; giving the
policy a pipeline knob (rescue-pool width, expansion budget) remains the
designated unfreeze path if a regime appears where selection is the
bottleneck. Do not grow this module for quality claims until then.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ahrag_tpu.models.policy.nets import ActorCritic


@dataclass
class PPOConfig:
    epochs: int = 3
    gamma: float = 0.99
    clip_eps: float = 0.2
    entropy_coef: float = 0.01
    value_coef: float = 0.5
    lr: float = 3e-4
    batch_size: int = 256
    gae_lambda: float = 0.95


def compute_gae(rews: Sequence[float], vals: Sequence[float], dones: Sequence[bool],
                gamma: float = 0.99, lam: float = 0.95) -> Tuple[np.ndarray, np.ndarray]:
    """GAE with terminal bootstrapping and advantage normalization
    (policy_ppo.py:99-113)."""
    n = len(rews)
    adv = np.zeros(n, dtype=np.float32)
    last = 0.0
    for t in reversed(range(n)):
        nonterminal = 0.0 if (t == n - 1 or dones[t]) else 1.0
        next_value = 0.0 if (t == n - 1 or dones[t]) else vals[t + 1]
        delta = rews[t] + gamma * next_value * nonterminal - vals[t]
        last = delta + gamma * lam * nonterminal * last
        adv[t] = last
    returns = adv + np.asarray(vals, dtype=np.float32)
    if np.std(adv) > 1e-8:
        adv = (adv - np.mean(adv)) / (np.std(adv) + 1e-8)
    return adv.astype(np.float32), returns.astype(np.float32)


class PPOLearner:
    """ActorCritic + optax with a jitted minibatch update."""

    def __init__(self, in_dim: int, n_actions: int, cfg: Optional[PPOConfig] = None,
                 seed: int = 0) -> None:
        self.cfg = cfg or PPOConfig()
        self.in_dim = in_dim
        self.n_actions = n_actions
        self.model = ActorCritic(n_actions=n_actions)
        self.params = self.model.init(jax.random.PRNGKey(seed),
                                      jnp.zeros((1, in_dim)))["params"]
        self.tx = optax.chain(optax.clip_by_global_norm(1.0),
                              optax.adam(self.cfg.lr))
        self.opt_state = self.tx.init(self.params)

        model, tx, cfg_ = self.model, self.tx, self.cfg

        @jax.jit
        def _update(params, opt_state, obs, actions, old_logp, returns, adv):
            def loss_fn(p):
                logits, value = model.apply({"params": p}, obs)
                logp_all = jax.nn.log_softmax(logits, axis=-1)
                logp = jnp.take_along_axis(logp_all, actions[:, None], axis=1)[:, 0]
                ratio = jnp.exp(logp - old_logp)
                unclipped = ratio * adv
                clipped = jnp.clip(ratio, 1.0 - cfg_.clip_eps,
                                   1.0 + cfg_.clip_eps) * adv
                policy_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
                value_loss = jnp.mean((value - returns) ** 2)
                entropy = jnp.mean(-jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1))
                loss = (policy_loss + cfg_.value_coef * value_loss
                        - cfg_.entropy_coef * entropy)
                return loss, (policy_loss, value_loss, entropy)
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, aux

        self._update = _update

        @jax.jit
        def _forward(params, obs):
            return model.apply({"params": params}, obs)

        self.apply_fn = _forward

    # -------------------------------------------------------------- update
    def update(self, obs: np.ndarray, actions: np.ndarray, old_logp: np.ndarray,
               returns: np.ndarray, adv: np.ndarray,
               seed: int = 0) -> Dict[str, float]:
        n = obs.shape[0]
        rng = np.random.default_rng(seed)
        losses = {"policy": 0.0, "value": 0.0, "entropy": 0.0}
        for _ in range(self.cfg.epochs):
            perm = rng.permutation(n)
            for i in range(0, n, self.cfg.batch_size):
                b = perm[i:i + self.cfg.batch_size]
                self.params, self.opt_state, aux = self._update(
                    self.params, self.opt_state, jnp.asarray(obs[b]),
                    jnp.asarray(actions[b].astype(np.int32)),
                    jnp.asarray(old_logp[b]), jnp.asarray(returns[b]),
                    jnp.asarray(adv[b]))
                pl_, vl, ent = (float(x) for x in aux)
                losses["policy"] += pl_ * len(b)
                losses["value"] += vl * len(b)
                losses["entropy"] += ent * len(b)
        for k in losses:
            losses[k] /= max(1, n * self.cfg.epochs)
        return losses

    # -------------------------------------------------------------- sampling
    def act_and_logp(self, obs_vec: np.ndarray, mask: Optional[np.ndarray] = None,
                     seed: int = 0) -> Tuple[int, float, float]:
        logits, value = self.apply_fn(self.params,
                                      jnp.asarray(obs_vec.reshape(1, -1)))
        if mask is not None:
            logits = jnp.where(jnp.asarray(mask.reshape(1, -1)) > 0.5, logits, -1e9)
        key = jax.random.PRNGKey(seed)
        a = int(jax.random.categorical(key, logits[0]))
        logp = float(jax.nn.log_softmax(logits[0])[a])
        return a, logp, float(value[0])

    # ------------------------------------------------------------ checkpoint
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {"params": jax.tree_util.tree_map(np.asarray, self.params),
                   "in_dim": self.in_dim, "n_actions": self.n_actions}
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))

    @classmethod
    def load(cls, path: str, cfg: Optional[PPOConfig] = None) -> "PPOLearner":
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        learner = cls(int(payload["in_dim"]), int(payload["n_actions"]), cfg)
        learner.params = payload["params"]
        return learner

    # Mid-training resume (beyond the reference — SURVEY §5.4 notes it has none):
    # the full training state (params + optimizer state + loop progress) round-trips
    # through flax state-dicts.
    def save_training_state(self, path: str, progress: Dict[str, Any]) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "params": serialization.to_state_dict(
                jax.tree_util.tree_map(np.asarray, self.params)),
            "opt_state": serialization.to_state_dict(
                jax.tree_util.tree_map(np.asarray, self.opt_state)),
            "in_dim": self.in_dim, "n_actions": self.n_actions,
            "progress": progress,
        }
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))

    def restore_training_state(self, path: str) -> Dict[str, Any]:
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        assert int(payload["in_dim"]) == self.in_dim
        self.params = serialization.from_state_dict(self.params, payload["params"])
        self.opt_state = serialization.from_state_dict(self.opt_state,
                                                       payload["opt_state"])
        return dict(payload.get("progress") or {})


def load_ppo(path: str) -> PPOLearner:
    return PPOLearner.load(path)


def act_ppo(learner: PPOLearner, obs_vec: np.ndarray,
            mask: Optional[np.ndarray] = None, seed: int = 0) -> int:
    """Masked inference-time sampling (mask bug in the reference fixed here)."""
    return learner.act_and_logp(obs_vec, mask=mask, seed=seed)[0]


# --------------------------------------------------------------------- train
def ppo_train(env_ctor: Callable[[], Any], questions: List[str],
              total_episodes: int = 50, max_steps: int = 6,
              ppo_cfg: Optional[PPOConfig] = None,
              save_path: str = "artifacts/rl/ppo_policy.msgpack",
              n_envs: int = 1, early_stop_patience: int = 5,
              early_stop_min_improve: float = 0.05, seed: int = 0,
              resume: bool = False,
              log: Callable[[str], None] = print) -> PPOLearner:
    """Host-gym PPO loop (reference-equivalent, jitted update, resumable)."""
    cfg = ppo_cfg or PPOConfig()
    n_envs = max(1, int(n_envs))
    envs = [env_ctor() for _ in range(n_envs)]
    obs0, _ = envs[0].reset(questions[0] if questions else "warmup question")
    learner = PPOLearner(int(obs0.shape[0]), int(envs[0].action_size), cfg, seed=seed)

    train_ckpt = save_path + ".train"
    best_mavg = -1e9
    stale = 0
    ep_idx = 0
    start_index = 0
    if resume and os.path.exists(train_ckpt):
        progress = learner.restore_training_state(train_ckpt)
        best_mavg = float(progress.get("best_mavg", best_mavg))
        stale = int(progress.get("stale", 0))
        ep_idx = int(progress.get("ep_idx", 0))
        start_index = int(progress.get("next_index", 0))
        log(f"[PPO] resumed at batch index {start_index} (ep_idx={ep_idx})")
    step_seed = seed
    data = questions[: total_episodes * n_envs] or ["warmup question"]
    for i in range(start_index, len(data), n_envs):
        batch_qs = data[i:i + n_envs]
        batch = {"obs": [], "act": [], "logp": [], "ret": [], "adv": []}
        ep_rewards: List[float] = []
        for e, env in enumerate(envs):
            q = batch_qs[e] if e < len(batch_qs) else ""
            obs, _ = env.reset(q)
            obs_l, act_l, logp_l, rew_l, val_l, done_l = [], [], [], [], [], []
            done, steps = False, 0
            while not done and steps < max_steps:
                try:
                    mask = np.asarray(env.get_action_mask(), dtype=np.float32)
                except Exception:
                    mask = None
                step_seed += 1
                a, lp, v = learner.act_and_logp(obs, mask=mask, seed=step_seed)
                nobs, r, done, _info = env.step(a)
                obs_l.append(obs)
                act_l.append(a)
                logp_l.append(lp)
                rew_l.append(r)
                val_l.append(v)
                done_l.append(done)
                obs = nobs
                steps += 1
            adv, ret = compute_gae(rew_l, val_l, done_l, cfg.gamma, cfg.gae_lambda)
            batch["obs"].append(np.stack(obs_l))
            batch["act"].append(np.asarray(act_l, dtype=np.int64))
            batch["logp"].append(np.asarray(logp_l, dtype=np.float32))
            batch["ret"].append(ret)
            batch["adv"].append(adv)
            ep_idx += 1
            ep_rewards.append(float(np.sum(rew_l)))
            log(f"[PPO] episode={ep_idx} env={e} steps={steps} "
                f"ep_reward={ep_rewards[-1]:.3f}")
        losses = learner.update(np.concatenate(batch["obs"]),
                                np.concatenate(batch["act"]),
                                np.concatenate(batch["logp"]),
                                np.concatenate(batch["ret"]),
                                np.concatenate(batch["adv"]), seed=seed + i)
        mavg = float(np.mean(ep_rewards))
        log(f"[PPO] update mavg_ep_reward={mavg:.3f} loss={losses}")
        if mavg > best_mavg + early_stop_min_improve:
            best_mavg, stale = mavg, 0
        else:
            stale += 1
            if stale >= max(1, early_stop_patience):
                log(f"[PPO] early stopping: best mavg={best_mavg:.3f}")
                break
        learner.save_training_state(train_ckpt, {
            "next_index": i + n_envs, "best_mavg": best_mavg,
            "stale": stale, "ep_idx": ep_idx})
    learner.save(save_path)
    log(f"Saved PPO policy to {save_path}")
    return learner


def gae_device(rewards: jnp.ndarray, values: jnp.ndarray, dones: jnp.ndarray,
               mask: jnp.ndarray, gamma: float = 0.99,
               lam: float = 0.95) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched GAE on device over [B, T] trajectories with a live-step mask.

    Matches ``compute_gae`` (terminal bootstrapping at episode end / done steps,
    masked advantage normalization) without leaving the device.
    """
    B, T = rewards.shape
    nonterminal = jnp.concatenate(
        [mask[:, 1:] & ~dones[:, :-1], jnp.zeros((B, 1), bool)], axis=1
    ).astype(jnp.float32)
    next_values = jnp.concatenate([values[:, 1:], jnp.zeros((B, 1))], axis=1)
    deltas = rewards + gamma * next_values * nonterminal - values

    def back(carry, xs):
        delta_t, nt_t = xs
        adv_t = delta_t + gamma * lam * nt_t * carry
        return adv_t, adv_t

    _, adv_rev = jax.lax.scan(back, jnp.zeros(B),
                              (deltas.T[::-1], nonterminal.T[::-1]))
    adv = adv_rev[::-1].T * mask
    returns = adv + values * mask
    # Normalize per episode (per row), matching compute_gae / the reference's
    # policy_ppo.py:110-113 which normalize within each rollout independently.
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
    mean = (adv * m).sum(axis=1, keepdims=True) / denom
    var = (((adv - mean) ** 2) * m).sum(axis=1, keepdims=True) / denom
    std = jnp.sqrt(var)
    adv = jnp.where(std > 1e-8, (adv - mean) / (std + 1e-8), adv) * mask
    return adv, returns


def make_sharded_train_step(learner: PPOLearner, w, max_steps: int = 6,
                            top_k: int = 5, member_top_m: int = 5):
    """Build ONE jitted PPO training step: batched on-device rollouts + device GAE
    + a full-batch clipped-surrogate update.

    This is the function the multi-chip dry-run jits over the mesh: GraphTensors
    leaves shard over the ``corpus`` axis, the query batch over ``dp`` — XLA
    partitions the search matmuls and inserts the collectives.
    """
    from ahrag_tpu.agent.vec_env import rollout_batch

    cfg = learner.cfg
    model, tx = learner.model, learner.tx

    def train_step(gt, q_embs, params, opt_state, key):
        traj, _ = rollout_batch(gt, q_embs, params, learner.apply_fn, key, w,
                                max_steps=max_steps, top_k=top_k,
                                member_top_m=member_top_m)
        adv, ret = gae_device(traj.rewards, traj.values, traj.dones, traj.mask,
                              cfg.gamma, cfg.gae_lambda)
        obs = traj.obs.reshape(-1, traj.obs.shape[-1])
        actions = traj.actions.reshape(-1)
        old_logp = traj.logps.reshape(-1)
        adv_f = adv.reshape(-1)
        ret_f = ret.reshape(-1)
        m = traj.mask.reshape(-1).astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)

        def loss_fn(p):
            logits, value = model.apply({"params": p}, obs)
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            logp = jnp.take_along_axis(logp_all, actions[:, None], axis=1)[:, 0]
            ratio = jnp.exp(logp - old_logp)
            unclipped = ratio * adv_f
            clipped = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * adv_f
            policy_loss = -jnp.sum(jnp.minimum(unclipped, clipped) * m) / denom
            value_loss = jnp.sum(((value - ret_f) ** 2) * m) / denom
            entropy = jnp.sum(-jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1) * m) / denom
            return (policy_loss + cfg.value_coef * value_loss
                    - cfg.entropy_coef * entropy), (policy_loss, value_loss, entropy)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        mean_reward = jnp.sum(traj.rewards * traj.mask) / jnp.maximum(
            jnp.sum(traj.mask.any(axis=1)), 1)
        metrics = {"policy_loss": aux[0], "value_loss": aux[1], "entropy": aux[2],
                   "mean_ep_reward": mean_reward}
        return params, opt_state, metrics

    return jax.jit(train_step)


def ppo_train_multi(bgts, q_embs: np.ndarray, search_weights,
                    gold_masks: Optional[np.ndarray] = None,
                    n_updates: int = 30, max_steps: int = 6,
                    ppo_cfg: Optional[PPOConfig] = None,
                    save_path: Optional[str] = None, top_k: int = 5,
                    member_top_m: int = 5, seed: int = 0,
                    final_reward_weight: float = 4.0,
                    log: Callable[[str], None] = print,
                    curve_out: Optional[str] = None) -> PPOLearner:
    """PPO across a fleet of per-question KGs (VERDICT r1 item 8).

    SCOPE OF THE QUALITY CLAIM (round-3 retirement, VERDICT r2 item 5): the
    trained policy demonstrably learns SELECTION — held-out final
    selection-recall 0.41 vs 0.15 random-init on the v2 test fleet
    (reports/rl_transfer_r3.json) — but its end-to-end contribution to
    benchmark F1/recall is zero under every honest condition tested: v1 test,
    v2 no-gold-name families on per-question KGs, and the same families on a
    shared 85-paragraph world KB. Decision traces differ (the policy commits
    early where the rule agent expands), yet the InferenceEngine's
    anchor/auto-commit/evidence-collection pipeline determines the final
    retrieved set regardless. The RL stack's headline is selection-recall;
    do not cite it as an answer-quality win.

    Each update runs ONE vmapped (graph, query) episode per fleet member via
    ``rollout_multi`` — the multi-graph analogue of ``ppo_train_device``.
    ``gold_masks [G, N_pad]`` (from ``agent.fleet.gold_node_mask``) wires the
    terminal reward the reference defined but never used (reward.py:29-38):
    the episode's last live step earns ``final_reward_weight *
    recall(final selection, gold nodes)``, so returns optimize the retrieval
    metric the benchmark actually scores instead of only the dense
    selection-growth shaping.
    """
    from ahrag_tpu.agent.featurizer import OBS_DIM
    from ahrag_tpu.agent.vec_env import N_ACTIONS
    from ahrag_tpu.graph.multi import rollout_multi

    cfg = ppo_cfg or PPOConfig()
    learner = PPOLearner(OBS_DIM, N_ACTIONS, cfg, seed=seed)
    key = jax.random.PRNGKey(seed)
    gold = None if gold_masks is None else jnp.asarray(gold_masks)
    q_dev = jnp.asarray(q_embs)
    curve: List[Dict[str, Any]] = []
    for u in range(n_updates):
        key, sub = jax.random.split(key)
        traj, final = rollout_multi(bgts, q_dev, learner.params,
                                    learner.apply_fn, sub, search_weights,
                                    max_steps=max_steps, top_k=top_k,
                                    member_top_m=member_top_m)
        rewards = traj.rewards
        recall = None
        if gold is not None:
            n_gold = gold.sum(axis=1)
            hit = (final.selection & gold).sum(axis=1)
            recall = jnp.where(n_gold > 0, hit / jnp.maximum(n_gold, 1), 0.0)
            # credit the last live step of each episode
            t_last = jnp.maximum(traj.mask.sum(axis=1) - 1, 0)          # [G]
            bonus = jnp.zeros_like(rewards).at[
                jnp.arange(rewards.shape[0]), t_last].set(
                final_reward_weight * recall)
            rewards = rewards + bonus * traj.mask
        adv, ret = gae_device(rewards, traj.values, traj.dones, traj.mask,
                              cfg.gamma, cfg.gae_lambda)
        live = np.asarray(traj.mask).reshape(-1)
        if not live.any():
            continue
        obs = np.asarray(traj.obs).reshape(-1, traj.obs.shape[-1])[live]
        losses = learner.update(obs,
                                np.asarray(traj.actions).reshape(-1)[live]
                                .astype(np.int64),
                                np.asarray(traj.logps).reshape(-1)[live],
                                np.asarray(ret).reshape(-1)[live],
                                np.asarray(adv).reshape(-1)[live], seed=seed + u)
        ep_reward = float((np.asarray(rewards) * np.asarray(traj.mask)).sum()
                          / max(1, rewards.shape[0]))
        entry = {"update": u, "mean_ep_reward": ep_reward,
                 **{k: float(v) for k, v in losses.items()}}
        if recall is not None:
            entry["mean_final_recall"] = float(jnp.mean(recall))
        curve.append(entry)
        log(f"[PPO/multi] update={u} ep_reward={ep_reward:.3f} "
            f"recall={entry.get('mean_final_recall', float('nan')):.3f}")
    if curve_out:
        import json as _json
        import os as _os
        _os.makedirs(_os.path.dirname(curve_out) or ".", exist_ok=True)
        first = float(np.mean([c["mean_ep_reward"] for c in curve[:3]])) if curve else 0.0
        last = float(np.mean([c["mean_ep_reward"] for c in curve[-3:]])) if curve else 0.0
        with open(curve_out, "w") as f:
            _json.dump({"n_updates": len(curve), "n_graphs": int(q_embs.shape[0]),
                        "max_steps": max_steps, "seed": seed,
                        "final_reward_weight": final_reward_weight,
                        "first3_mean_ep_reward": first,
                        "last3_mean_ep_reward": last,
                        "improvement": last - first, "curve": curve}, f, indent=1)
    if save_path:
        learner.save(save_path)
    return learner


def ppo_train_device(gt, q_embs: np.ndarray, search_weights, n_updates: int = 10,
                     max_steps: int = 6, batch_size: int = 16,
                     ppo_cfg: Optional[PPOConfig] = None,
                     save_path: Optional[str] = None, top_k: int = 5,
                     member_top_m: int = 5, seed: int = 0,
                     log: Callable[[str], None] = print,
                     curve_out: Optional[str] = None) -> PPOLearner:
    """On-device batched PPO: rollout_batch + GAE + jitted updates.

    ``q_embs [N, D]`` are pre-encoded query embeddings; each update consumes one
    batch of episodes executed entirely on device. ``curve_out`` (optional path)
    writes the per-update learning curve as JSON, so training progress is an
    inspectable artifact (the reference logs a moving average to stdout only,
    policy_ppo.py:228-235).
    """
    from ahrag_tpu.agent.featurizer import OBS_DIM
    from ahrag_tpu.agent.vec_env import N_ACTIONS, rollout_batch

    cfg = ppo_cfg or PPOConfig()
    learner = PPOLearner(OBS_DIM, N_ACTIONS, cfg, seed=seed)
    key = jax.random.PRNGKey(seed)
    n = q_embs.shape[0]
    curve: List[Dict[str, Any]] = []
    for u in range(n_updates):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (batch_size,), 0, n)
        batch_q = jnp.asarray(q_embs)[idx]
        key, sub = jax.random.split(key)
        traj, _ = rollout_batch(gt, batch_q, learner.params, learner.apply_fn, sub,
                                search_weights, max_steps=max_steps, top_k=top_k,
                                member_top_m=member_top_m)
        adv, ret = gae_device(traj.rewards, traj.values, traj.dones, traj.mask,
                              cfg.gamma, cfg.gae_lambda)
        live = np.asarray(traj.mask).reshape(-1)
        if not live.any():
            continue
        obs = np.asarray(traj.obs).reshape(-1, traj.obs.shape[-1])[live]
        losses = learner.update(obs,
                                np.asarray(traj.actions).reshape(-1)[live]
                                .astype(np.int64),
                                np.asarray(traj.logps).reshape(-1)[live],
                                np.asarray(ret).reshape(-1)[live],
                                np.asarray(adv).reshape(-1)[live], seed=seed + u)
        ep_reward = float((np.asarray(traj.rewards) * np.asarray(traj.mask)).sum()
                          / max(1, np.asarray(traj.mask).any(axis=1).sum()))
        log(f"[PPO/device] update={u} mavg_ep_reward={ep_reward:.3f} loss={losses}")
        curve.append({"update": u, "mean_ep_reward": ep_reward,
                      **{k: float(v) for k, v in losses.items()}})
    if curve_out:
        import json as _json
        import os as _os
        _os.makedirs(_os.path.dirname(curve_out) or ".", exist_ok=True)
        first = float(np.mean([c["mean_ep_reward"] for c in curve[:3]])) if curve else 0.0
        last = float(np.mean([c["mean_ep_reward"] for c in curve[-3:]])) if curve else 0.0
        with open(curve_out, "w") as f:
            _json.dump({"n_updates": len(curve), "batch_size": batch_size,
                        "max_steps": max_steps, "seed": seed,
                        "first3_mean_ep_reward": first,
                        "last3_mean_ep_reward": last,
                        "improvement": last - first, "curve": curve}, f, indent=1)
    if save_path:
        learner.save(save_path)
    return learner
