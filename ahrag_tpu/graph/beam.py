"""Vectorized multi-level beam-search traversal (BASELINE config 3).

A TPU-native extension beyond the reference's 1-hop hybrid search
(hierarchical_graph.py:727-740): instead of a single expansion ring around the
seeds, a fixed-width beam walks the typed adjacency (parents, children,
related_to) for ``depth`` rounds under ``lax.scan``, so multi-level evidence
(e.g. an L2 community summary two ``belongs_to`` hops above an entity seed) is
reachable in ONE jitted program with static shapes.

Design notes (why it looks like this on TPU):
- Per-round frontier dedup is a scatter into an ``[N_pad]`` boolean visited
  mask — vector ops over the node axis are cheap on the VPU and avoid any
  data-dependent shapes.
- Beam selection each round is ``lax.top_k`` over the full masked node axis:
  candidates scatter their reachability into node space first, which
  deduplicates for free and keeps tie-breaking deterministic (lowest index
  wins, matching the reference's dict-insertion stability, :781).
- Node scores reuse the hybrid rerank formula (search.rerank_scores_at,
  hierarchical_graph.py:764-768) over the TRUE per-node cosine (one matvec),
  not a decayed propagation — the beam explores by intrinsic relevance while
  type/judge/conf filters apply only to the returned evidence, so a
  summary-only filter can still traverse THROUGH entities.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ahrag_tpu.graph.search import SearchWeights, filter_mask_at, rerank_scores_at
from ahrag_tpu.graph.tensors import GraphTensors
from ahrag_tpu.ops.topk import NEG_INF


class BeamResult(NamedTuple):
    evidence_idx: jnp.ndarray     # [top_k] i32 (n_pad when invalid)
    evidence_score: jnp.ndarray   # [top_k] f32 rerank scores, descending
    evidence_sem: jnp.ndarray     # [top_k] f32 raw cosine
    evidence_valid: jnp.ndarray   # [top_k] bool
    visited_count: jnp.ndarray    # i32 - nodes the beam touched (incl. seeds)


def _beam_impl(gt: GraphTensors, q_emb: jnp.ndarray, w: SearchWeights,
               beam_width: int, depth: int, top_k: int) -> BeamResult:
    n_pad = gt.n_pad
    idx_all = jnp.arange(n_pad, dtype=jnp.int32)
    sem_all = gt.emb @ q_emb                                   # [N_pad] cosine
    score_all = rerank_scores_at(gt, idx_all, sem_all, w)      # [N_pad]

    # seeds: top beam_width by raw semantic over the indexed subset (the same
    # seed pool as hybrid search stage 1)
    seed_pool = gt.indexed & gt.valid
    seed_score, seed_idx = jax.lax.top_k(jnp.where(seed_pool, sem_all, NEG_INF),
                                         min(beam_width, n_pad))
    seed_ok = seed_score > NEG_INF / 2
    visited = jnp.zeros(n_pad, bool).at[
        jnp.where(seed_ok, seed_idx, 0)].max(seed_ok)

    def gather(table: jnp.ndarray, ids: jnp.ndarray, ok: jnp.ndarray) -> jnp.ndarray:
        rows = table[jnp.clip(ids, 0, n_pad - 1)]
        good = (rows >= 0) & ok[:, None]
        return jnp.where(good, rows, n_pad).reshape(-1)

    def body(carry, _):
        visited, beam_idx, beam_ok = carry
        nbr = jnp.concatenate([gather(gt.parents, beam_idx, beam_ok),
                               gather(gt.children, beam_idx, beam_ok),
                               gather(gt.related, beam_idx, beam_ok)])
        reach = jnp.zeros(n_pad + 1, bool).at[nbr].set(True)[:n_pad]
        cand = reach & gt.valid & ~visited
        new_score, new_beam = jax.lax.top_k(
            jnp.where(cand, score_all, NEG_INF), min(beam_width, n_pad))
        new_ok = new_score > NEG_INF / 2
        visited = visited.at[jnp.where(new_ok, new_beam, 0)].max(new_ok)
        return (visited, new_beam, new_ok), None

    (visited, _, _), _ = jax.lax.scan(body, (visited, seed_idx, seed_ok), None,
                                      length=depth)

    keep = visited & filter_mask_at(gt, idx_all, w)
    ev_score, ev_idx = jax.lax.top_k(jnp.where(keep, score_all, NEG_INF),
                                     min(top_k, n_pad))
    if ev_score.shape[0] < top_k:
        pad = top_k - ev_score.shape[0]
        ev_score = jnp.pad(ev_score, (0, pad), constant_values=NEG_INF)
        ev_idx = jnp.pad(ev_idx, (0, pad))
    ev_valid = ev_score > NEG_INF / 2
    return BeamResult(
        evidence_idx=jnp.where(ev_valid, ev_idx, n_pad).astype(jnp.int32),
        evidence_score=jnp.where(ev_valid, ev_score, NEG_INF),
        evidence_sem=jnp.where(ev_valid, sem_all[jnp.clip(ev_idx, 0, n_pad - 1)],
                               0.0),
        evidence_valid=ev_valid,
        visited_count=jnp.sum(visited & gt.valid).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("beam_width", "depth", "top_k"))
def beam_search(gt: GraphTensors, q_emb: jnp.ndarray, w: SearchWeights,
                beam_width: int = 8, depth: int = 3,
                top_k: int = 10) -> BeamResult:
    """Beam traversal for one query embedding ``q_emb [D]``."""
    return _beam_impl(gt, q_emb, w, beam_width, depth, top_k)


@functools.partial(jax.jit, static_argnames=("beam_width", "depth", "top_k"))
def beam_search_batch(gt: GraphTensors, q_embs: jnp.ndarray, w: SearchWeights,
                      beam_width: int = 8, depth: int = 3,
                      top_k: int = 10) -> BeamResult:
    """Batched beam traversal over ``[B, D]``; XLA batches the per-query matvec
    into one ``[B, N]`` matmul under vmap."""
    return jax.vmap(lambda q: _beam_impl(gt, q, w, beam_width, depth,
                                         top_k))(q_embs)
