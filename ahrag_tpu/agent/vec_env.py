"""Vectorized on-device environment: batched episodes under ``lax.scan``.

This is the TPU-native replacement for the reference's sequential Python episode
loop (policy_ppo.py:144-215, "sequential roll" — SURVEY §2.4 DP row): the gym
semantics (agent/gym_env.py) re-expressed as pure functions over fixed-capacity
arrays so whole batches of episodes execute as ONE XLA program:

- EnvState: selection/frontier boolean masks over ``N_pad``, a fixed ``TOP_CAP``
  ordered top list (the observation's "selection" entries), step/done/last-action
  scalars;
- the 6 gym actions are ``lax.switch`` branches built from vectorized ELL gathers
  with order-preserving dedup (the same priority-scatter trick as search);
- per-step reward/featurization/masking match the host formulas (tests assert
  host-vs-device parity trajectory by trajectory);
- ``rollout_batch`` = ``vmap(scan(step))`` over query embeddings, sampling actions
  from a policy's masked logits — BASELINE.json config 5.

Observation-visible sizes: the host environment builds the observation BEFORE
applying an expansion's frontier update (environment.py:408-410), omits the
``state`` block entirely from query_node_details observations (:322-330), and caps
the frontier display at 50 ids (:134) — so the reward and the featurizer globals
see *observation-visible* sizes, not the true set sizes. EnvState carries those
explicitly as ``obs_sel_size`` / ``obs_frontier_size``.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ahrag_tpu.agent.featurizer import K_NODES, featurize_device
from ahrag_tpu.graph.search import SearchWeights, hybrid_search
from ahrag_tpu.graph.tensors import GraphTensors

TOP_CAP = 10            # observation top-list capacity (= featurizer K_NODES)
EXPAND_LIMIT = 10       # expansion cap (environment.py expand_* limit default)
N_ACTIONS = 6
FRONTIER_DISPLAY_CAP = 50


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EnvState:
    selection: jnp.ndarray          # [N_pad] bool
    frontier: jnp.ndarray           # [N_pad] bool
    top_ids: jnp.ndarray            # [TOP_CAP] i32, n_pad = empty slot
    top_score: jnp.ndarray          # [TOP_CAP] f32
    top_sem: jnp.ndarray            # [TOP_CAP] f32
    n_seeds: jnp.ndarray            # i32 (featurizer's n_seeds global)
    obs_sel_size: jnp.ndarray       # i32 - selection size as the host obs reports it
    obs_frontier_size: jnp.ndarray  # i32 - frontier size as the host obs reports it
    step: jnp.ndarray               # i32 - ENV action counter (obs "step"; skipped
                                    #       actions do not bump it, environment.py)
    gym_step: jnp.ndarray           # i32 - gym step counter (always bumps; drives
                                    #       the max_steps episode cap, gym_env.py:87)
    done: jnp.ndarray               # bool
    last_action: jnp.ndarray        # i32 (-1 = none)

    def replace(self, **kw) -> "EnvState":
        from dataclasses import replace as _replace
        return _replace(self, **kw)


def _obs_frontier_size(frontier: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(jnp.sum(frontier), FRONTIER_DISPLAY_CAP).astype(jnp.int32)


def _dedup_cap(ids: jnp.ndarray, n_pad: int, cap: int) -> jnp.ndarray:
    """Order-preserving dedup of ``ids`` (n_pad = invalid), compacted to [cap].

    Candidate-space O(C^2) earlier-occurrence test — C is tens, and under
    vmap(switch) every branch runs for every lane, so nothing here may touch
    O(N_pad) buffers.
    """
    n = ids.shape[0]
    pos = jnp.arange(n)
    valid = ids < n_pad
    eq_earlier = ((ids[:, None] == ids[None, :]) & valid[:, None] & valid[None, :]
                  & (pos[None, :] < pos[:, None]))
    win = valid & ~eq_earlier.any(axis=1)
    slot_pos = jnp.cumsum(win) - 1
    out = jnp.full(cap + 1, n_pad, jnp.int32)
    slot = jnp.where(win & (slot_pos < cap), slot_pos, cap)
    out = out.at[slot].set(jnp.where(win, ids, n_pad))
    # duplicate writes to the dump slot `cap` are all n_pad -> deterministic
    return out[:cap]


def _top_k_ids(state: EnvState, k: int) -> jnp.ndarray:
    return state.top_ids[:k]


def _gather_rows(table: jnp.ndarray, ids: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """Gather ELL rows for ids (n_pad-safe); -1 entries -> n_pad sentinels."""
    safe = jnp.clip(ids, 0, n_pad - 1)
    rows = table[safe]
    ok = (rows >= 0) & (ids[:, None] < n_pad)
    return jnp.where(ok, rows, n_pad)


def _set_expansion_top(state: EnvState, gt: GraphTensors,
                       ids: jnp.ndarray) -> EnvState:
    """Install an expansion result: obs sizes snapshot BEFORE the frontier update
    (environment.py:408-410), then frontier |= expanded."""
    obs_sel = jnp.sum(state.selection).astype(jnp.int32)
    obs_frontier = _obs_frontier_size(state.frontier)
    valid = ids < gt.n_pad
    frontier = state.frontier.at[jnp.where(valid, ids, gt.n_pad - 1)].max(valid)
    zeros = jnp.zeros(ids.shape[0], jnp.float32)
    return state.replace(frontier=frontier, top_ids=ids, top_score=zeros,
                         top_sem=zeros, n_seeds=jnp.sum(valid).astype(jnp.int32),
                         obs_sel_size=obs_sel, obs_frontier_size=obs_frontier)


# ----------------------------------------------------------------- actions
def act_expand_parents(gt: GraphTensors, state: EnvState) -> EnvState:
    rows = _gather_rows(gt.parents, _top_k_ids(state, 2), gt.n_pad)
    return _set_expansion_top(state, gt,
                              _dedup_cap(rows.reshape(-1), gt.n_pad, EXPAND_LIMIT))


def act_expand_children(gt: GraphTensors, state: EnvState) -> EnvState:
    rows = _gather_rows(gt.children, _top_k_ids(state, 2), gt.n_pad)
    return _set_expansion_top(state, gt,
                              _dedup_cap(rows.reshape(-1), gt.n_pad, EXPAND_LIMIT))


def act_expand_related(gt: GraphTensors, state: EnvState) -> EnvState:
    """related_to rows of the top node, plus (for entities) hyperedges interleaved
    with their co-participants (environment.py:440-480 order)."""
    top1 = _top_k_ids(state, 1)
    rel = _gather_rows(gt.related, top1, gt.n_pad).reshape(-1)          # [K_rel]
    is_ent = jnp.where(top1 < gt.n_pad,
                       gt.node_type[jnp.clip(top1, 0, gt.n_pad - 1)] == 0, False)[0]
    hedges = _gather_rows(gt.hyperedges, top1, gt.n_pad).reshape(-1)    # [K_hedge]
    hedges = jnp.where(is_ent, hedges, gt.n_pad)
    parts = _gather_rows(gt.members, hedges, gt.n_pad)                  # [K_hedge, K_mem]
    parts = jnp.where(parts == jnp.broadcast_to(top1, parts.shape), gt.n_pad, parts)
    hedge_block = jnp.concatenate([hedges[:, None], parts], axis=1).reshape(-1)
    cand = jnp.concatenate([rel, hedge_block])
    return _set_expansion_top(state, gt, _dedup_cap(cand, gt.n_pad, EXPAND_LIMIT))


def act_commit_top(gt: GraphTensors, state: EnvState) -> EnvState:
    """commit obs is built AFTER set updates (environment.py:340-355)."""
    ids = _top_k_ids(state, 3)
    valid = ids < gt.n_pad
    safe = jnp.where(valid, ids, gt.n_pad - 1)
    already = state.selection[safe]
    newly = valid & ~already
    selection = state.selection.at[safe].max(valid)
    # only newly-committed ids leave the frontier (environment.py:345-349)
    frontier = state.frontier.at[safe].min(~newly)
    new_ids = _dedup_cap(jnp.where(newly, ids, gt.n_pad), gt.n_pad, TOP_CAP)
    zeros = jnp.zeros(TOP_CAP, jnp.float32)
    return state.replace(selection=selection, frontier=frontier, top_ids=new_ids,
                         top_score=zeros, top_sem=zeros, n_seeds=jnp.int32(0),
                         obs_sel_size=jnp.sum(selection).astype(jnp.int32),
                         obs_frontier_size=_obs_frontier_size(frontier))


def act_query_details(gt: GraphTensors, state: EnvState) -> EnvState:
    """details obs has no ``state`` block -> obs sizes read as 0 (environment.py
    :322-330)."""
    ids = jnp.full(TOP_CAP, gt.n_pad, jnp.int32).at[0].set(state.top_ids[0])
    zeros = jnp.zeros(TOP_CAP, jnp.float32)
    return state.replace(top_ids=ids, top_score=zeros, top_sem=zeros,
                         n_seeds=jnp.int32(0), obs_sel_size=jnp.int32(0),
                         obs_frontier_size=jnp.int32(0))


def act_end(gt: GraphTensors, state: EnvState) -> EnvState:
    return state.replace(done=jnp.bool_(True))


def act_expand_to_lca(gt: GraphTensors, state: EnvState, max_levels: int = 4,
                      max_results: int = 5) -> EnvState:
    """Lowest common ancestors of the top-2 nodes over the belongs_to DAG
    (environment.py:243-299): ancestor sets via ``max_levels`` rounds of parent
    propagation, intersect, keep nodes with no parent inside the intersection,
    order by (level-or-1, node index). Frontier is NOT updated (reference parity).

    Deviation: ties within a level order by node index (insertion order) rather
    than the reference's lexicographic hash-id sort — both are arbitrary total
    orders over content hashes.
    """
    n_pad = gt.n_pad
    tops = state.top_ids[:2]
    valid_in = tops < n_pad

    def ancestors(start: jnp.ndarray, ok: jnp.ndarray) -> jnp.ndarray:
        anc = jnp.zeros(n_pad + 1, bool).at[jnp.where(ok, start, n_pad)].set(True)

        def body(_, a):
            rows = jnp.where(a[:n_pad, None], gt.parents, -1)
            tgt = jnp.where(rows >= 0, rows, n_pad).reshape(-1)
            return a.at[tgt].set(True)

        return jax.lax.fori_loop(0, max_levels, body, anc)[:n_pad]

    anc0 = ancestors(tops[0], valid_in[0])
    anc1 = ancestors(tops[1], valid_in[1])
    inter = (jnp.where(valid_in[0], anc0, True)
             & jnp.where(valid_in[1], anc1, True)
             & gt.valid & jnp.any(valid_in))
    inter_ext = jnp.concatenate([inter, jnp.zeros(1, bool)])
    tgt = jnp.where(gt.parents >= 0, gt.parents, n_pad)
    parent_in_inter = inter_ext[tgt].any(axis=1)
    lca = inter & ~parent_in_inter

    # smallest (level-or-1, index) first: int32 top-k of the negated composite key
    lvl = jnp.where(gt.level == 0, 1, gt.level)
    key = -(lvl * n_pad + jnp.arange(n_pad, dtype=jnp.int32))
    masked_key = jnp.where(lca, key, jnp.int32(-(2 ** 31 - 1)))
    _, order = jax.lax.top_k(masked_key[None, :], max_results)
    count = jnp.sum(lca).astype(jnp.int32)
    slots = jnp.arange(max_results)
    ids = jnp.where(slots < jnp.minimum(count, max_results), order[0], n_pad)
    top_ids = jnp.full(TOP_CAP, n_pad, jnp.int32).at[:max_results].set(
        ids.astype(jnp.int32))
    zeros = jnp.zeros(TOP_CAP, jnp.float32)
    n_found = jnp.minimum(count, max_results)
    return state.replace(top_ids=top_ids, top_score=zeros, top_sem=zeros,
                         n_seeds=n_found,
                         obs_sel_size=jnp.sum(state.selection).astype(jnp.int32),
                         obs_frontier_size=_obs_frontier_size(state.frontier))


# ------------------------------------------------------------------ reset
def env_reset(gt: GraphTensors, q_emb: jnp.ndarray, w: SearchWeights,
              top_k: int = 5, member_top_m: int = 5) -> EnvState:
    """reset(seed_query): semantic anchor; frontier = reranked set (gym_env.py:41-52)."""
    # certify=False: env_reset runs under vmap in the rollout paths, where the
    # certified wrapper's lax.cond degrades to a select that executes the
    # full-corpus HIGHEST fallback on every lane (ops/topk.py docstring); the
    # rollouts tolerate the uncertified-but-exact-in-practice result
    res = hybrid_search(gt, q_emb, w, top_k=top_k, member_top_m=member_top_m,
                        certify=False)
    n_pad = gt.n_pad
    top_ids = jnp.full(TOP_CAP, n_pad, jnp.int32).at[:top_k].set(res.reranked_idx)
    top_score = jnp.zeros(TOP_CAP, jnp.float32).at[:top_k].set(
        jnp.where(res.reranked_valid, res.reranked_score, 0.0))
    top_sem = jnp.zeros(TOP_CAP, jnp.float32).at[:top_k].set(
        jnp.where(res.reranked_valid, res.reranked_sem, 0.0))
    frontier = jnp.zeros(n_pad, dtype=bool)
    safe = jnp.where(res.reranked_valid, res.reranked_idx, n_pad - 1)
    frontier = frontier.at[safe].max(res.reranked_valid)
    return EnvState(
        selection=jnp.zeros(n_pad, dtype=bool), frontier=frontier,
        top_ids=top_ids, top_score=top_score, top_sem=top_sem,
        n_seeds=jnp.sum(res.seed_valid).astype(jnp.int32),
        obs_sel_size=jnp.int32(0),
        obs_frontier_size=_obs_frontier_size(frontier),
        step=jnp.int32(1),  # the anchor consumed env-step 1 (environment.py:197)
        gym_step=jnp.int32(0),
        done=jnp.bool_(False), last_action=jnp.int32(-1))


# ---------------------------------------------------------------- step/obs
def action_mask(state: EnvState, n_pad: int) -> jnp.ndarray:
    """end-only when no top nodes (gym_env.py:54-75)."""
    has_top = state.top_ids[0] < n_pad
    end_only = jnp.zeros(N_ACTIONS, bool).at[N_ACTIONS - 1].set(True)
    return jnp.where(has_top, jnp.ones(N_ACTIONS, bool), end_only)


def observe(gt: GraphTensors, state: EnvState) -> jnp.ndarray:
    """84-dim observation vector (featurizer layout over obs-visible sizes)."""
    ids = state.top_ids[:K_NODES]
    valid = ids < gt.n_pad
    safe = jnp.clip(ids, 0, gt.n_pad - 1)
    judge = jnp.where(gt.has_judge[safe], gt.judge[safe], 0.0)
    conf = jnp.where(gt.has_conf[safe], gt.conf[safe], 0.0)
    return featurize_device(
        step=state.step,
        selection_size=state.obs_sel_size,
        frontier_size=state.obs_frontier_size,
        n_seeds=state.n_seeds,
        top_valid=valid, top_type=gt.node_type[safe], top_layer=gt.level[safe],
        top_score=state.top_score[:K_NODES], top_sem=state.top_sem[:K_NODES],
        top_judge=judge, top_conf=conf)


def env_step(gt: GraphTensors, state: EnvState, action: jnp.ndarray,
             max_steps: int = 6, repeat_penalty: float = 0.02,
             enable_lca: bool = False) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
    """One gym step; returns (new_state, reward, done). Matches AHRAGGymEnv.step
    including the obs-visible reward accounting (reward.py:6-26 over obs state).

    ``enable_lca`` statically gates action 6: under vmap, ``lax.switch`` computes
    EVERY branch for every lane, and the LCA branch is the only O(N_pad) action —
    leaving it off keeps rollout steps candidate-space-only.
    """
    prev_sel = state.obs_sel_size
    prev_frontier = state.obs_frontier_size
    bumped = state.replace(step=state.step + 1)
    lca_branch = (lambda s: act_expand_to_lca(gt, s)) if enable_lca else \
        (lambda s: s)  # disabled: inert branch (mask excludes action 6 anyway)
    new = jax.lax.switch(jnp.clip(action, 0, N_ACTIONS), [
        lambda s: act_expand_parents(gt, s),
        lambda s: act_expand_children(gt, s),
        lambda s: act_expand_related(gt, s),
        lambda s: act_commit_top(gt, s),
        lambda s: act_query_details(gt, s),
        lambda s: act_end(gt, s),
        lca_branch,
    ], bumped)
    # host gym skips query_node_details entirely when there is no top node
    # (gym_env.py:101-106: obs = prev_raw, env untouched) -> revert the transition
    skipped = (action == 4) & (state.top_ids[0] >= gt.n_pad)
    new = jax.tree_util.tree_map(lambda a, b: jnp.where(skipped, a, b), state, new)
    ended = action == N_ACTIONS - 1
    # selection only grows, and obs sizes zero out on detail steps, so the host's
    # set-difference counts equal these clamped size deltas
    add_sel = jnp.maximum(new.obs_sel_size - prev_sel, 0).astype(jnp.float32)
    add_frontier = jnp.maximum(new.obs_frontier_size - prev_frontier, 0)
    reward = (1.0 * add_sel
              + 0.05 * jnp.minimum(add_frontier, 10).astype(jnp.float32) - 0.05)
    reward = jnp.where(ended, 0.0, reward)
    reward -= jnp.where((~ended) & (state.last_action == action)
                        & (state.last_action >= 0), repeat_penalty, 0.0)
    reward = jnp.where(state.done, 0.0, reward)
    gym_steps = state.gym_step + 1  # this transition included (skips still count)
    done = state.done | ended | (gym_steps >= max_steps)
    out = jax.tree_util.tree_map(lambda a, b: jnp.where(state.done, a, b), state, new)
    out = out.replace(done=done,
                      gym_step=jnp.where(state.done, state.gym_step, gym_steps),
                      last_action=jnp.where(state.done, state.last_action, action))
    return out, reward, done


# ----------------------------------------------------------------- rollout
class Trajectory(NamedTuple):
    obs: jnp.ndarray        # [B, T, OBS_DIM]
    actions: jnp.ndarray    # [B, T] i32
    logps: jnp.ndarray      # [B, T] f32
    rewards: jnp.ndarray    # [B, T] f32
    values: jnp.ndarray     # [B, T] f32
    dones: jnp.ndarray      # [B, T] bool
    mask: jnp.ndarray       # [B, T] bool - step was live (pre-step not done)


@functools.partial(jax.jit,
                   static_argnames=("apply_fn", "max_steps", "top_k", "member_top_m"))
def rollout_batch(gt: GraphTensors, q_embs: jnp.ndarray, params: Any,
                  apply_fn: Callable, key: jnp.ndarray, w: SearchWeights,
                  max_steps: int = 6, top_k: int = 5,
                  member_top_m: int = 5) -> Tuple[Trajectory, EnvState]:
    """Batched on-device episodes: anchor once, then scan policy-driven steps.

    ``apply_fn(params, obs[B, D]) -> (logits [B, A], value [B])``.
    """
    B = q_embs.shape[0]

    def reset_one(q):
        return env_reset(gt, q, w, top_k=top_k, member_top_m=member_top_m)

    state0 = jax.vmap(reset_one)(q_embs)

    def step_fn(carry, step_key):
        state = carry
        obs = jax.vmap(lambda s: observe(gt, s))(state)
        logits, value = apply_fn(params, obs)
        mask = jax.vmap(lambda s: action_mask(s, gt.n_pad))(state)
        logits = jnp.where(mask, logits, -1e9)
        action = jax.random.categorical(step_key, logits, axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)[jnp.arange(B), action]
        live = ~state.done
        new_state, reward, done = jax.vmap(
            lambda s, a: env_step(gt, s, a, max_steps=max_steps))(state, action)
        return new_state, (obs, action.astype(jnp.int32), logp, reward, value,
                           done, live)

    keys = jax.random.split(key, max_steps)
    final_state, (obs, actions, logps, rewards, values, dones, live) = jax.lax.scan(
        step_fn, state0, keys)
    traj = Trajectory(
        obs=jnp.swapaxes(obs, 0, 1), actions=jnp.swapaxes(actions, 0, 1),
        logps=jnp.swapaxes(logps, 0, 1), rewards=jnp.swapaxes(rewards, 0, 1),
        values=jnp.swapaxes(values, 0, 1), dones=jnp.swapaxes(dones, 0, 1),
        mask=jnp.swapaxes(live, 0, 1))
    return traj, final_state
