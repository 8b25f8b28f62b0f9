"""Hybrid dense + graph search as one jitted XLA program.

Semantics-parity re-design of the reference search pipeline
(graph/hierarchical_graph.py:675-789):

  1. **Seeds** — exact top-k cosine over the indexed subset of the embedding matrix
     (replaces the Chroma HNSW query at :706-714) via the fused top-k op.
  2. **Expansion** — entity seeds pull their first 2 ``belongs_to`` parents at 0.9x
     semantic decay; summary seeds pull their first ``member_top_m`` children at
     0.85x (:727-740). Dedup follows the reference's dict-insertion semantics
     exactly (expansion entries never overwrite, seed self-entries always win) in
     **candidate space** — an O(C^2) earlier-occurrence test over the ~top_k*(3+M)
     candidates, so no O(N) buffers are touched after the seed matmul.
  3. **Filter + rerank** (:743-781) — per candidate:
     ``score = alpha*semantic + beta*sigmoid(judge/10) + gamma*conf/10
     + delta*layer_boost[type]`` with null judge/conf contributing 0 via masks, and
     judge/conf threshold filters dropping null-valued nodes (the reference's
     ``judge is None -> filtered`` behavior).
  4. Final top-k over the C candidates; ties resolve to the highest insertion
     priority — exactly the reference's stable sort over dict order (:781).

Everything is one ``jit`` with static ``top_k``/``member_top_m``; no host round-trips
between stages; only stage 1 is O(N).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ahrag_tpu.graph.tensors import GraphTensors
from ahrag_tpu.ops.topk import NEG_INF, masked_topk, refined_masked_topk

# |cosine| below this is "no lexical relation" — flushed to exact 0.0 before
# seed top-k so tie order among irrelevant nodes is pinned to node index and
# identical across serving batch shapes (a corpus-fitted LSA basis makes
# irrelevant rows exactly orthogonal; their scores are matmul tiling noise
# otherwise). Mirrored by tests/helpers.py::oracle_search.
SEM_FLUSH_EPS = 1e-5

# Query-similar member expansion considers at most this many leading children
# per summary seed. The [B, K, Kc, D] row gather behind the member-similarity
# einsum is the single most expensive post-seed op at corpus scale (measured
# 4.5 ms of a 13.7 ms batch at 1.07M nodes, B=512, Kc=64 —
# reports/search_profile_r4.json); capping the gather halves it while leaving
# every graph with fan-out <= 32 bit-identical, and the packed child tables
# (tensors.py child_pack_*) turn the remaining scattered 768 B-row gather into
# one contiguous ~24 KB row per seed. Mirrored by both oracles
# (tests/helpers.py::oracle_search, bench.py::cpu_reference_search).
from ahrag_tpu.graph.tensors import MEMBER_SIM_CAP  # noqa: F401 (re-export)


class SearchWeights(NamedTuple):
    """Traced rerank parameters (defaults mirror hierarchical_graph.py:37-47)."""
    alpha: jnp.ndarray
    beta: jnp.ndarray
    gamma: jnp.ndarray
    delta: jnp.ndarray
    layer_boost: jnp.ndarray        # [3] by node_type id (entity, summary, hyperedge)
    judge_min: jnp.ndarray          # threshold value (ignored unless use_judge_min)
    use_judge_min: jnp.ndarray      # 0/1 f32
    conf_min: jnp.ndarray
    use_conf_min: jnp.ndarray
    type_mask: jnp.ndarray          # [3] bool - allowed node types

    @staticmethod
    def create(alpha=0.6, beta=0.2, gamma=0.1, delta=0.1,
               layer_boost=(0.0, 1.0, 0.0), judge_min=None, conf_min=None,
               type_filter=None) -> "SearchWeights":
        tm = [True, True, True]
        if type_filter is not None:
            from ahrag_tpu.graph.tensors import NODE_TYPE_IDS
            tm = [False, False, False]
            for t in type_filter:
                if t in NODE_TYPE_IDS:
                    tm[NODE_TYPE_IDS[t]] = True
        return SearchWeights(
            alpha=jnp.float32(alpha), beta=jnp.float32(beta),
            gamma=jnp.float32(gamma), delta=jnp.float32(delta),
            layer_boost=jnp.asarray(layer_boost, jnp.float32),
            judge_min=jnp.float32(0.0 if judge_min is None else judge_min),
            use_judge_min=jnp.float32(0.0 if judge_min is None else 1.0),
            conf_min=jnp.float32(0.0 if conf_min is None else conf_min),
            use_conf_min=jnp.float32(0.0 if conf_min is None else 1.0),
            type_mask=jnp.asarray(tm, dtype=bool),
        )


class SearchResult(NamedTuple):
    seed_idx: jnp.ndarray       # [top_k] i32 (dump-slot = n_pad when invalid)
    seed_sim: jnp.ndarray       # [top_k] f32
    seed_valid: jnp.ndarray     # [top_k] bool
    reranked_idx: jnp.ndarray   # [top_k] i32
    reranked_score: jnp.ndarray  # [top_k] f32
    reranked_sem: jnp.ndarray   # [top_k] f32
    reranked_valid: jnp.ndarray  # [top_k] bool
    cand_idx: jnp.ndarray       # [C] i32 - candidate node ids (n_pad = invalid)
    cand_sem: jnp.ndarray       # [C] f32 - candidate semantics
    cand_win: jnp.ndarray       # [C] bool - dedup winners (the "expanded" cluster)


def expand_candidates(gt: GraphTensors, seed_idx: jnp.ndarray, seed_sim: jnp.ndarray,
                      seed_valid: jnp.ndarray, member_top_m: int,
                      q_emb: jnp.ndarray | None = None,
                      flush_eps: float = 0.0):
    """1-hop expansion with decay, in **candidate space**.

    Returns (cand_idx [C], cand_sem [C], cand_win [C]) where C =
    top_k * (1 + 2 + member_top_m). Candidates are laid out in the reference's
    dict-insertion priority order (:727-740): all seed self-entries first (they
    always win), then per-seed expansion rows seed-major (parents then children —
    mutually exclusive by seed type). Dedup is an O(C^2) earlier-occurrence test:
    tiny, and it avoids the O(N) scatter buffers entirely (the former
    implementation's dominant cost at large corpora).

    Deviation (documented; oracle mirrors it): when a summary seed has MORE
    than ``member_top_m`` children and ``q_emb`` is given, the m children most
    similar to the query are expanded instead of the first m by insertion
    order — at corpus scale a topic summary holds dozens of members and the
    reference's first-m rule (tuned on 10-paragraph graphs, where m covers
    every member) admits arbitrary ones. Identical to the reference whenever
    len(members) <= m, i.e. on every reference-scale graph. Selected children
    keep the reference's 0.85x-of-parent score and re-enter the candidate
    block in insertion order, so dedup priority and tie-breaks are unchanged.
    The similarity selection scans the first ``MEMBER_SIM_CAP`` children only
    (gather-cost cap, see its comment) — identical whenever fan-out <= 32.
    """
    n_pad = gt.n_pad
    dump = n_pad
    safe_seed = jnp.clip(seed_idx, 0, n_pad - 1)

    seed_type = jnp.where(seed_valid, gt.node_type[safe_seed], -1)
    is_ent = seed_type == 0
    is_sum = seed_type == 1

    par = gt.parents[safe_seed, :2]                                    # [K, 2]
    par_ok = (par >= 0) & is_ent[:, None] & seed_valid[:, None]
    par_sem = jnp.broadcast_to((seed_sim * 0.9)[:, None], par.shape)

    packed = (gt.child_pack_emb is not None
              and gt.child_pack_ids.shape[1] <= MEMBER_SIM_CAP)
    if packed:
        # one contiguous [cap, D] row per seed instead of cap scattered rows —
        # same ids, same (storage-dtype) values, bit-identical msim
        slot = jnp.where(seed_valid, gt.child_pack_slot[safe_seed], -1)  # [K]
        slot_safe = jnp.clip(slot, 0, gt.child_pack_ids.shape[0] - 1)
        mem_all = jnp.where(slot[:, None] >= 0,
                            gt.child_pack_ids[slot_safe], -1)          # [K, Kc]
    else:
        mem_all = gt.children[safe_seed]                               # [K, Kc]
        if mem_all.shape[1] > MEMBER_SIM_CAP:
            mem_all = mem_all[:, :MEMBER_SIM_CAP]
    if q_emb is not None and mem_all.shape[1] > member_top_m:
        if packed:
            ce = gt.child_pack_emb[slot_safe]                          # [K, Kc, D]
        else:
            memsafe = jnp.clip(mem_all, 0, n_pad - 1)
            ce = gt.emb[memsafe]                                       # [K, Kc, D]
        msim = jnp.einsum("d,kcd->kc", q_emb.astype(ce.dtype), ce,
                          preferred_element_type=jnp.float32)
        if flush_eps:
            msim = jnp.where(jnp.abs(msim) < flush_eps, 0.0, msim)
        msim = jnp.where(mem_all >= 0, msim, NEG_INF)
        _, sel = jax.lax.top_k(msim, member_top_m)   # ties: lowest slot first
        sel = jnp.sort(sel, axis=1)                  # restore insertion order
        mem = jnp.take_along_axis(mem_all, sel, axis=1)                # [K, M]
    else:
        mem = mem_all[:, :member_top_m]                                # [K, M]
    mem_ok = (mem >= 0) & is_sum[:, None] & seed_valid[:, None]
    mem_sem = jnp.broadcast_to((seed_sim * 0.85)[:, None], mem.shape)

    # per-seed expansion block [K, 2+M] keeps the reference's seed-major insertion
    # order (a node can be reachable both as a parent and as a member of two
    # different seeds; first-seen must win)
    exp_tgt = jnp.concatenate([jnp.where(par_ok, par, dump),
                               jnp.where(mem_ok, mem, dump)], axis=1).reshape(-1)
    exp_sem = jnp.concatenate([par_sem, mem_sem], axis=1).reshape(-1)

    tgt = jnp.concatenate([jnp.where(seed_valid, seed_idx, dump), exp_tgt])
    sem = jnp.concatenate([seed_sim, exp_sem])
    valid = tgt < n_pad
    pos = jnp.arange(tgt.shape[0])
    eq_earlier = ((tgt[:, None] == tgt[None, :]) & valid[:, None] & valid[None, :]
                  & (pos[None, :] < pos[:, None]))
    win = valid & ~eq_earlier.any(axis=1)
    return tgt, sem, win


def rerank_scores_at(gt: GraphTensors, idx: jnp.ndarray, sem: jnp.ndarray,
                     w: SearchWeights) -> jnp.ndarray:
    """Rerank formula evaluated at candidate node ids (hierarchical_graph.py:764-768)."""
    safe = jnp.clip(idx, 0, gt.n_pad - 1)
    nt = jnp.clip(gt.node_type[safe], 0, 2)
    judge_term = jnp.where(gt.has_judge[safe], jax.nn.sigmoid(gt.judge[safe] / 10.0),
                           0.0)
    conf_term = jnp.where(gt.has_conf[safe], gt.conf[safe] / 10.0, 0.0)
    boost = w.layer_boost[nt]
    return w.alpha * sem + w.beta * judge_term + w.gamma * conf_term + w.delta * boost


def filter_mask_at(gt: GraphTensors, idx: jnp.ndarray, w: SearchWeights) -> jnp.ndarray:
    """Type/judge/confidence filters at candidate ids; null judge/conf fail their
    thresholds (:759-761)."""
    safe = jnp.clip(idx, 0, gt.n_pad - 1)
    nt = jnp.clip(gt.node_type[safe], 0, 2)
    keep = (idx < gt.n_pad) & gt.valid[safe] & w.type_mask[nt]
    keep &= jnp.where(w.use_judge_min > 0,
                      gt.has_judge[safe] & (gt.judge[safe] >= w.judge_min), True)
    keep &= jnp.where(w.use_conf_min > 0,
                      gt.has_conf[safe] & (gt.conf[safe] >= w.conf_min), True)
    return keep


def _post_seed(gt: GraphTensors, seed_sim: jnp.ndarray, seed_idx: jnp.ndarray,
               w: SearchWeights, top_k: int, member_top_m: int,
               q_emb: jnp.ndarray | None = None) -> SearchResult:
    """Stages 2-4 (candidate space) given the seed top-k."""
    n_pad = gt.n_pad
    seed_valid = seed_sim > NEG_INF / 2
    cand_idx, cand_sem, cand_win = expand_candidates(gt, seed_idx, seed_sim,
                                                     seed_valid, member_top_m,
                                                     q_emb=q_emb,
                                                     flush_eps=SEM_FLUSH_EPS)
    keep = cand_win & filter_mask_at(gt, cand_idx, w)
    score = rerank_scores_at(gt, cand_idx, cand_sem, w)
    masked = jnp.where(keep, score, NEG_INF)
    k = min(top_k, masked.shape[0])
    rr_score, rr_pos = jax.lax.top_k(masked, k)
    if k < top_k:
        rr_score = jnp.pad(rr_score, (0, top_k - k), constant_values=NEG_INF)
        rr_pos = jnp.pad(rr_pos, (0, top_k - k))
    rr_valid = rr_score > NEG_INF / 2
    rr_idx = jnp.where(rr_valid, cand_idx[rr_pos], n_pad)
    return SearchResult(
        seed_idx=jnp.where(seed_valid, seed_idx, n_pad),
        seed_sim=seed_sim, seed_valid=seed_valid,
        reranked_idx=rr_idx,
        reranked_score=rr_score,
        reranked_sem=jnp.where(rr_valid, cand_sem[rr_pos], 0.0),
        reranked_valid=rr_valid,
        cand_idx=cand_idx, cand_sem=cand_sem, cand_win=cand_win,
    )


@functools.partial(jax.jit, static_argnames=("top_k", "member_top_m",
                                             "certify"))
def hybrid_search(gt: GraphTensors, q_emb: jnp.ndarray, w: SearchWeights,
                  top_k: int = 5, member_top_m: int = 5,
                  certify: bool = True) -> SearchResult:
    """Full hybrid search for a single query embedding ``q_emb [D]``.

    Only the seed scoring touches O(N); expansion/filter/rerank/final-cut all run
    in candidate space (C ~ tens), so batched throughput is seed-matmul-bound.
    Final ties break by candidate priority position — exactly the reference's
    stable sort over dict-insertion order (:781)."""
    # 1) seeds over the indexed subset: fast coarse matmul + f32-HIGHEST
    # re-score of the top candidates (see ops.topk.refined_masked_topk — the pure
    # bf16 path can flip seed membership at the top-k boundary, observed in bench
    # parity, while full-HIGHEST costs 3x the matmul).
    seed_sim, seed_idx = refined_masked_topk(
        q_emb[None, :], gt.emb, gt.indexed & gt.valid, top_k,
        margin=max(12, 2 * top_k + 2), certify=certify,
        flush_eps=SEM_FLUSH_EPS, mask_trivial=gt.mask_trivial,
        emb_binpack=gt.emb_binpack)
    return _post_seed(gt, seed_sim[0], seed_idx[0], w, top_k, member_top_m,
                      q_emb=q_emb)


@functools.partial(jax.jit, static_argnames=("top_k", "member_top_m"))
def hybrid_search_batch(gt: GraphTensors, q_embs: jnp.ndarray, w: SearchWeights,
                        top_k: int = 5, member_top_m: int = 5) -> SearchResult:
    """Batched hybrid search over ``[B, D]`` query embeddings.

    The seed scoring is hoisted out of the vmap as ONE ``[B, N]`` matmul (a
    vmapped per-query matvec re-reads the corpus per query — the difference is
    ~20x wall-clock at 100k nodes) with two-phase precision refinement; only the
    O(candidates) stages are vmapped."""
    seed_sim, seed_idx = refined_masked_topk(
        q_embs, gt.emb, gt.indexed & gt.valid, top_k,
        margin=max(12, 2 * top_k + 2), flush_eps=SEM_FLUSH_EPS,
        mask_trivial=gt.mask_trivial, emb_binpack=gt.emb_binpack)
    return jax.vmap(lambda ss, si, qq: _post_seed(gt, ss, si, w, top_k,
                                                  member_top_m, q_emb=qq)
                    )(seed_sim, seed_idx, q_embs)
