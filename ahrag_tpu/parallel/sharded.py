"""Sharded retrieval and training over the device mesh.

Two composition levels, both idiomatic JAX SPMD:

- ``sharded_dense_topk``: explicit shard_map — each device computes exact top-k over
  its corpus shard, candidates all_gather over ICI, and a tiny replicated re-top-k
  merges them. Rank-equivalent to the flat search with deterministic global-index
  tie-breaking (SURVEY §7.3.2).
- ``shard_graph_tensors`` + the existing jitted search/rollout functions: GSPMD —
  annotate the corpus axis on GraphTensors leaves and the data axis on query
  batches, jit as usual, and XLA partitions the matmuls and inserts the collectives
  (the scaling-book recipe).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ahrag_tpu.graph.tensors import GraphTensors
from ahrag_tpu.ops.topk import NEG_INF
from ahrag_tpu.parallel.mesh import CORPUS_AXIS, DATA_AXIS


def sharded_dense_topk(q: jnp.ndarray, emb: jnp.ndarray, n_valid, k: int,
                       mesh: Mesh) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a corpus-sharded embedding matrix.

    q: [B, D] (replicated), emb: [N, D] sharded along rows over ``corpus``.
    Returns replicated ([B, k] scores, [B, k] global indices).
    """
    n_shards = mesh.shape[CORPUS_AXIS]
    n_total = emb.shape[0]
    assert n_total % n_shards == 0, (n_total, n_shards)
    rows = n_total // n_shards
    n_valid = jnp.asarray(n_valid, jnp.int32)
    kk = min(k, rows)

    def local_fn(q_l, emb_l, nv):
        shard = jax.lax.axis_index(CORPUS_AXIS)
        offset = shard * rows
        scores = jnp.dot(q_l, emb_l.T, preferred_element_type=jnp.float32)
        col = offset + jnp.arange(rows)[None, :]
        scores = jnp.where(col < nv, scores, NEG_INF)
        vals, idx = jax.lax.top_k(scores, kk)          # shard-local top-k
        gidx = idx + offset
        # ICI merge: gather [n_shards, B, kk] candidates, re-top-k (replicated)
        all_vals = jax.lax.all_gather(vals, CORPUS_AXIS)
        all_idx = jax.lax.all_gather(gidx, CORPUS_AXIS)
        b = q_l.shape[0]
        cand_v = all_vals.transpose(1, 0, 2).reshape(b, n_shards * kk)
        cand_i = all_idx.transpose(1, 0, 2).reshape(b, n_shards * kk)
        v, pos = jax.lax.top_k(cand_v, min(k, n_shards * kk))
        i = jnp.take_along_axis(cand_i, pos, axis=1)
        return v, i

    # check_vma=False: after the all_gather every shard computes the identical
    # merge, so the outputs are replicated — the varying-axes inference can't
    # prove that because the local stage used axis_index.
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(CORPUS_AXIS, None), P()),
        out_specs=(P(), P()), check_vma=False)
    vals, idx = fn(q, emb, n_valid)
    if k > vals.shape[1]:
        pad = k - vals.shape[1]
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    return vals, idx


def sharded_refined_topk(q: jnp.ndarray, emb: jnp.ndarray, n_valid, k: int,
                         mesh: Mesh, margin: int = 16
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Certified two-phase top-k over a corpus-sharded embedding matrix.

    Same contract as ``sharded_dense_topk`` but the shard-local stage follows
    the single-chip production ladder (ops/topk.py):

    - shards below the streaming-kernel window run the full LOCAL matmul at
      f32 HIGHEST and merge exact local top-k — exact by construction, no
      certificate or fallback branch needed (3x a small matmul beats a
      bf16-band certificate that fails on clustered scores and pays 4x);
    - >=64k-row 2048-aligned shards run the bin-max Pallas kernel with the
      HIGHEST in-kernel matmul (eps ~1e-6), re-score selected bins' rows at
      HIGHEST locally, and carry a per-shard out-of-net bound ``c_out`` (max
      over NON-selected bin maxima). The exactness certificate is global:
      every row outside every shard's candidate net has exact score <=
      ``max_shard(c_out) + eps``; when the merged k-th value does not clear
      that bound, every shard takes the replicated fallback branch (full local
      HIGHEST matmul + merge).

    Values crossing ICI in the all_gather merge are exact in both regimes.
    Cross-shard traffic is the [n_shards, B, kk] candidate gather plus one
    [n_shards, B] bound gather.
    """
    n_shards = mesh.shape[CORPUS_AXIS]
    n_total = emb.shape[0]
    assert n_total % n_shards == 0, (n_total, n_shards)
    rows = n_total // n_shards
    n_valid = jnp.asarray(n_valid, jnp.int32)
    on_tpu = jax.default_backend() == "tpu"
    m = min(k + margin, rows)
    use_binned = on_tpu and rows % 2048 == 0 and rows >= 65536
    from ahrag_tpu.ops.topk import (binned_rows_of, dense_binmax_pallas,
                                    matmul_eps)
    eps = matmul_eps(jax.default_backend(), emb.shape[1],
                     "highest" if use_binned else "default")

    def local_fn(q_l, emb_l, nv):
        shard = jax.lax.axis_index(CORPUS_AXIS)
        offset = shard * rows
        b = q_l.shape[0]
        if not use_binned:
            # exact local stage: full HIGHEST matmul + local top-k; the merged
            # result is exact unconditionally
            s = jnp.dot(q_l, emb_l.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            cols = offset + jnp.arange(rows)[None, :]
            s = jnp.where(cols < nv, s, NEG_INF)
            kl = min(k, rows)
            fv, fidx = jax.lax.top_k(s, kl)
            fav = jax.lax.all_gather(fv, CORPUS_AXIS)
            fai = jax.lax.all_gather(fidx + offset, CORPUS_AXIS)
            cv = fav.transpose(1, 0, 2).reshape(b, n_shards * kl)
            ci = fai.transpose(1, 0, 2).reshape(b, n_shards * kl)
            kg = min(k, n_shards * kl)
            vv, pp = jax.lax.top_k(cv, kg)
            return vv, jnp.take_along_axis(ci, pp, axis=1)
        col = offset + jnp.arange(rows)
        mask_l = col < nv
        binmax = dense_binmax_pallas(q_l, emb_l, jnp.int32(rows), mask_l,
                                     tile_n=2048, precision="highest")
        nbins = binmax.shape[1]
        mb = min(max(m, 3 * k + 2), nbins)
        bm_vals, bm_idx = jax.lax.top_k(binmax, mb)
        bcol = jax.lax.broadcasted_iota(jnp.int32, binmax.shape, 1)
        chosen = (bcol[:, None, :] == bm_idx[:, :, None]).any(axis=1)
        c_out = jnp.max(jnp.where(chosen, NEG_INF, binmax), axis=1)  # [B]
        idx = binned_rows_of(bm_idx, 2048).reshape(b, -1)   # [B, mb*G] local
        cand_emb = emb_l[idx]                              # [B, m, D] local gather
        exact = jnp.einsum("bd,bmd->bm", q_l, cand_emb,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        exact = jnp.where((idx + offset) < nv, exact, NEG_INF)
        kk = min(k, exact.shape[1])
        vals, pos = jax.lax.top_k(exact, kk)               # exact local top-k
        gidx = jnp.take_along_axis(idx, pos, axis=1) + offset
        all_vals = jax.lax.all_gather(vals, CORPUS_AXIS)
        all_idx = jax.lax.all_gather(gidx, CORPUS_AXIS)
        all_cm = jax.lax.all_gather(c_out, CORPUS_AXIS)    # [n_shards, B]
        cand_v = all_vals.transpose(1, 0, 2).reshape(b, n_shards * kk)
        cand_i = all_idx.transpose(1, 0, 2).reshape(b, n_shards * kk)
        kg = min(k, n_shards * kk)
        v, p = jax.lax.top_k(cand_v, kg)
        i = jnp.take_along_axis(cand_i, p, axis=1)
        if mb >= nbins:
            return v, i  # every bin selected: all rows re-scored exactly
        bound = jnp.max(all_cm, axis=0) + eps              # [B] replicated
        certified = jnp.all((v[:, kg - 1] > bound)
                            | (jnp.max(all_cm, axis=0) <= NEG_INF / 2))

        def fallback():
            s = jnp.dot(q_l, emb_l.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            cols = offset + jnp.arange(rows)[None, :]
            s = jnp.where(cols < nv, s, NEG_INF)
            kl = min(k, rows)
            fv, fidx = jax.lax.top_k(s, kl)
            fav = jax.lax.all_gather(fv, CORPUS_AXIS)
            fai = jax.lax.all_gather(fidx + offset, CORPUS_AXIS)
            cv = fav.transpose(1, 0, 2).reshape(b, n_shards * kl)
            ci = fai.transpose(1, 0, 2).reshape(b, n_shards * kl)
            vv, pp = jax.lax.top_k(cv, kg)
            return vv[:, :kg], jnp.take_along_axis(ci, pp, axis=1)[:, :kg]

        # replicated predicate: every shard takes the same branch; the branches
        # contain collectives, so they MUST run in lockstep across the mesh
        return jax.lax.cond(certified, lambda: (v, i), fallback)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(CORPUS_AXIS, None), P()),
        out_specs=(P(), P()), check_vma=False)
    vals, idx = fn(q, emb, n_valid)
    if k > vals.shape[1]:
        pad = k - vals.shape[1]
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    return vals, idx


SLICE_AXIS = "slice"


def sharded_topk_2level(q: jnp.ndarray, emb: jnp.ndarray, n_valid, k: int,
                        mesh: Mesh) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a 2-axis ``{slice, corpus}`` mesh — the multi-slice
    DCN layout rehearsal (VERDICT r4 item 7).

    The corpus rows shard over BOTH axes jointly; the merge is hierarchical
    so each collective rides the link it would ride on real hardware:
    shard-local top-k -> ``all_gather`` over ``corpus`` (ICI within a slice)
    + re-top-k -> ``all_gather`` over ``slice`` (DCN across slices) + final
    re-top-k. Only ``slices * k`` candidates ever cross DCN per query.
    Rank-equivalent to the flat search with deterministic global-index ties
    (candidates concatenate in shard order; stable top_k keeps the lowest
    global index on equal scores).
    """
    s_sh = mesh.shape[SLICE_AXIS]
    c_sh = mesh.shape[CORPUS_AXIS]
    n_total = emb.shape[0]
    assert n_total % (s_sh * c_sh) == 0, (n_total, s_sh, c_sh)
    rows = n_total // (s_sh * c_sh)
    n_valid = jnp.asarray(n_valid, jnp.int32)
    kk = min(k, rows)

    def local(q_rep, emb_shard):
        si = jax.lax.axis_index(SLICE_AXIS)
        ci = jax.lax.axis_index(CORPUS_AXIS)
        offset = (si * c_sh + ci) * rows
        scores = jnp.dot(q_rep, emb_shard.T,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        col = offset + jnp.arange(rows)[None, :]
        scores = jnp.where(col < n_valid, scores, NEG_INF)
        vals, idx = jax.lax.top_k(scores, kk)
        gidx = idx + offset
        # ICI merge within the slice
        av = jax.lax.all_gather(vals, CORPUS_AXIS)     # [C, B, kk]
        ai = jax.lax.all_gather(gidx, CORPUS_AXIS)
        av = jnp.moveaxis(av, 0, 1).reshape(vals.shape[0], -1)
        ai = jnp.moveaxis(ai, 0, 1).reshape(vals.shape[0], -1)
        v1, p1 = jax.lax.top_k(av, min(k, av.shape[1]))
        i1 = jnp.take_along_axis(ai, p1, axis=1)
        # DCN merge across slices
        av2 = jax.lax.all_gather(v1, SLICE_AXIS)       # [S, B, k]
        ai2 = jax.lax.all_gather(i1, SLICE_AXIS)
        av2 = jnp.moveaxis(av2, 0, 1).reshape(v1.shape[0], -1)
        ai2 = jnp.moveaxis(ai2, 0, 1).reshape(v1.shape[0], -1)
        v2, p2 = jax.lax.top_k(av2, min(k, av2.shape[1]))
        return v2, jnp.take_along_axis(ai2, p2, axis=1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P((SLICE_AXIS, CORPUS_AXIS), None)),
        out_specs=(P(), P()), check_vma=False)
    return fn(q, emb)


def shard_graph_tensors(gt: GraphTensors, mesh: Mesh) -> GraphTensors:
    """Place every per-node leaf with its node axis sharded over ``corpus``."""
    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == gt.n_pad:
            spec = [CORPUS_AXIS] + [None] * (leaf.ndim - 1)
            return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))
        return leaf
    return jax.tree_util.tree_map(place, gt)


def shard_queries(q_embs: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Shard a query/episode batch over the data axis."""
    return jax.device_put(q_embs, NamedSharding(mesh, P(DATA_AXIS, None)))


def shard_minilm_params(params, mesh: Mesh, axis: str = CORPUS_AXIS):
    """Megatron-style tensor parallelism for the MiniLM encoder (SURVEY §2.4 TP
    row: 'keep mesh-ready pjit partitioning of the encoder matmuls as an option').

    Column-parallel: q/k/v and ff_in kernels split on the output dim (head/ffn
    axis); row-parallel: attn_out and ff_out split on the input dim. XLA inserts
    the psum at each row-parallel boundary. Embeddings/LayerNorms replicate.
    """
    col = {"q", "k", "v", "ff_in"}
    row = {"attn_out", "ff_out"}

    def place(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        layer = next((n for n in names if n in col | row), None)
        param = names[-1] if names else ""
        if layer in col:
            spec = P(None, axis) if param == "kernel" else P(axis)
        elif layer in row and param == "kernel":
            spec = P(axis, None)
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
