"""Batched multi-graph compile: stacked GraphTensors + vmapped search/rollouts.

The reference benchmark rebuilds a graph PER QUESTION via subprocess
(run_benchmark.py:68-104) and PPO rolls environments sequentially in Python
(policy_ppo.py:144-215). The TPU-native answer (SURVEY §7.3.7): pad many small
per-question graphs to a common shape, stack them along a leading graph axis,
and vmap the already-jitted hybrid search / env rollout over (graph, query)
pairs — a whole benchmark batch or RL meta-batch becomes ONE XLA program.

Exactness: stacking only grows each graph's padding (extra rows are
invalid/unindexed), so per-(graph,query) results are bit-identical to running
``hybrid_search`` on each graph alone (tested in test_multi_graph.py).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ahrag_tpu.agent.vec_env import (Trajectory, action_mask, env_reset,
                                     env_step, observe)
from ahrag_tpu.graph.search import SearchResult, SearchWeights, hybrid_search
from ahrag_tpu.graph.tensors import GraphTensors, round_up

_LEAVES = ("emb", "node_type", "level", "judge", "has_judge", "conf",
           "has_conf", "indexed", "valid", "parents", "children", "related",
           "hyperedges", "members")
_ELL = ("parents", "children", "related", "hyperedges", "members")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BatchedGraphTensors:
    """GraphTensors with a leading ``[G]`` graph axis on every device leaf."""
    emb: jnp.ndarray            # [G, N_pad, D]
    node_type: jnp.ndarray      # [G, N_pad]
    level: jnp.ndarray
    judge: jnp.ndarray
    has_judge: jnp.ndarray
    conf: jnp.ndarray
    has_conf: jnp.ndarray
    indexed: jnp.ndarray
    valid: jnp.ndarray
    parents: jnp.ndarray        # [G, N_pad, K]
    children: jnp.ndarray
    related: jnp.ndarray
    hyperedges: jnp.ndarray
    members: jnp.ndarray
    n_nodes: Tuple[int, ...] = field(metadata=dict(static=True), default=())

    @property
    def n_graphs(self) -> int:
        return int(self.emb.shape[0])

    @property
    def n_pad(self) -> int:
        return int(self.emb.shape[1])


def _pad_leaf(x: np.ndarray, n_pad: int, fill) -> np.ndarray:
    if x.shape[0] == n_pad:
        return x
    widths = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, widths, constant_values=fill)


def stack_graph_tensors(gts: Sequence[GraphTensors]) -> BatchedGraphTensors:
    """Pad every graph to the common (max) N_pad / ELL widths and stack.

    Extra node rows are invalid + unindexed (zero embedding, node_type -1),
    extra ELL columns are -1, so searches over the stacked batch reproduce the
    per-graph results exactly.
    """
    assert gts, "need at least one graph"
    dims = {g.dim for g in gts}
    assert len(dims) == 1, f"mixed embedding dims {dims}"
    n_pad = round_up(max(g.n_pad for g in gts), 128)
    widths = {t: max(int(getattr(g, t).shape[1]) for g in gts) for t in _ELL}

    stacked = {}
    for name in _LEAVES:
        cols = []
        for g in gts:
            arr = np.asarray(getattr(g, name))
            if name == "node_type":
                arr = _pad_leaf(arr, n_pad, -1)
            elif name in _ELL:
                k = widths[name]
                if arr.shape[1] < k:
                    arr = np.pad(arr, [(0, 0), (0, k - arr.shape[1])],
                                 constant_values=-1)
                arr = _pad_leaf(arr, n_pad, -1)
            elif arr.dtype == bool:
                arr = _pad_leaf(arr, n_pad, False)
            else:
                arr = _pad_leaf(arr, n_pad, 0)
            cols.append(arr)
        stacked[name] = jnp.asarray(np.stack(cols))
    return BatchedGraphTensors(**stacked,
                               n_nodes=tuple(g.n_nodes for g in gts))


def _as_graph(b: BatchedGraphTensors) -> GraphTensors:
    """View the batch as a GraphTensors pytree whose leaves carry the leading
    graph axis — consumed only under ``vmap`` where that axis is mapped out."""
    return GraphTensors(**{name: getattr(b, name) for name in _LEAVES},
                        n_nodes=0, n_edges=0)


@functools.partial(jax.jit, static_argnames=("top_k", "member_top_m"))
def hybrid_search_multi(b: BatchedGraphTensors, q_embs: jnp.ndarray,
                        w: SearchWeights, top_k: int = 5,
                        member_top_m: int = 5) -> SearchResult:
    """One query per graph: ``q_embs [G, D]`` → SearchResult with [G, ...] leaves."""
    return jax.vmap(
        lambda g, q: hybrid_search(g, q, w, top_k=top_k,
                                   member_top_m=member_top_m)
    )(_as_graph(b), q_embs)


@functools.partial(jax.jit, static_argnames=("apply_fn", "max_steps", "top_k",
                                             "member_top_m"))
def rollout_multi(b: BatchedGraphTensors, q_embs: jnp.ndarray, params: Any,
                  apply_fn: Callable, key: jnp.ndarray, w: SearchWeights,
                  max_steps: int = 6, top_k: int = 5,
                  member_top_m: int = 5) -> Tuple[Trajectory, Any]:
    """Policy-driven episodes, one per (graph, query) pair, as one program.

    Same per-step semantics as ``vec_env.rollout_batch`` (which vmaps a SINGLE
    graph over many queries); here the graph leaves are vmapped too, so PPO can
    train across a fleet of per-question KGs (VERDICT round-1 item 8).
    ``apply_fn(params, obs [B, D]) -> (logits [B, A], value [B])``.
    """
    G = q_embs.shape[0]
    keys = jax.random.split(key, G)

    def one(gt: GraphTensors, q: jnp.ndarray, k: jnp.ndarray):
        state0 = env_reset(gt, q, w, top_k=top_k, member_top_m=member_top_m)

        def step_fn(state, step_key):
            obs = observe(gt, state)
            logits, value = apply_fn(params, obs[None])
            logits, value = logits[0], value[0]
            mask = action_mask(state, gt.n_pad)
            logits = jnp.where(mask, logits, -1e9)
            action = jax.random.categorical(step_key, logits)
            logp = jax.nn.log_softmax(logits)[action]
            live = ~state.done
            new_state, reward, done = env_step(gt, state, action,
                                               max_steps=max_steps)
            return new_state, (obs, action.astype(jnp.int32), logp, reward,
                               value, done, live)

        final, outs = jax.lax.scan(step_fn, state0,
                                   jax.random.split(k, max_steps))
        return Trajectory(*outs), final

    return jax.vmap(one)(_as_graph(b), q_embs, keys)
