"""Dense exact top-k retrieval kernels.

This op replaces the reference's ChromaDB/hnswlib ANN lookup
(hierarchical_graph.py:605-611,706-714) with brute-force exact cosine top-k over a
device-resident, row-normalized corpus matrix — the BASELINE.json north star.

Two implementations with identical semantics:

- ``dense_topk_xla``: ``scores = Q @ E^T`` + ``lax.top_k``. Used on CPU (tests) and as
  the parity oracle.
- ``dense_topk_pallas``: a fused Pallas kernel. The corpus streams through VMEM in
  ``TILE_N``-row tiles; each grid step computes the tile's scores on the MXU and
  reduces them to a per-tile top-k on the VPU (k static iterations of max/argmax), so
  only ``num_tiles * k`` candidates ever return to XLA for the final merge. HBM
  traffic is one pass over the corpus; nothing materializes the full ``[B, N]`` score
  matrix.

Tie-breaking is deterministic everywhere: equal scores resolve to the lowest corpus
index (argmax-first-occurrence per tile, in-order tile merge, stable final top_k).
This is required for shard-local/merge equivalence in the sharded path (SURVEY §7.3.2).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("k",))
def dense_topk_xla(q: jnp.ndarray, emb: jnp.ndarray, n_valid: jnp.ndarray,
                   k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k by full matmul. q: [B, D], emb: [N, D] -> ([B, k], [B, k]).

    HIGHEST precision keeps ranking exact on TPU (default bf16 passes can flip
    near-boundary ranks); the Pallas path trades that for throughput and is
    validated against this oracle at rtol 1e-4.
    """
    scores = jnp.dot(q, emb.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    col = jnp.arange(emb.shape[0])[None, :]
    scores = jnp.where(col < n_valid, scores, NEG_INF)
    return jax.lax.top_k(scores, k)


def masked_topk(scores: jnp.ndarray, mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """top_k over the last axis restricted to ``mask`` (invalid slots -> NEG_INF)."""
    return jax.lax.top_k(jnp.where(mask, scores, NEG_INF), k)


def refined_masked_topk(q: jnp.ndarray, emb: jnp.ndarray, mask: jnp.ndarray,
                        k: int, margin: int = 16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-phase exact-in-practice top-k: fast default-precision scores select
    ``k + margin`` coarse candidates, whose dot products are then recomputed at
    f32 HIGHEST for the final ranking.

    On TPU the default f32 matmul runs in bf16 passes (~1e-2 relative error) —
    fast, but able to flip ranks at the top-k boundary; full-HIGHEST costs ~3x the
    matmul. Re-scoring only ``k + margin`` rows keeps the cheap matmul while a rank
    flip would now need > ``margin`` candidates inside the bf16 error band — not a
    thing for real embedding distributions (bench verifies 0-mismatch empirically).

    q: [B, D], emb: [N, D], mask: [N] bool. Returns ([B, k], [B, k]).
    """
    n = emb.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    # approx coarse stage only where flat lax.top_k actually hurts (>=256k
    # rows); at ~100k rows approx recall misses showed up in the bench's
    # oracle probes (2/8) while flat costs little — exactness wins there
    use_approx = on_tpu and n >= 262144
    if use_approx:
        # widen the coarse net when the candidate stage is approximate
        margin = max(margin, 4 * k + 32)
    m = min(k + margin, n)
    if on_tpu and n % 1024 == 0 and n >= 4096 and n < 65536:
        # fused Pallas path: streams the corpus once, no [B, N] materialization
        _, cand = dense_topk_pallas(q, emb, jnp.int32(n), m, tile_n=1024,
                                    mask=mask)
    else:
        coarse = jnp.dot(q, emb.T, preferred_element_type=jnp.float32)
        coarse = jnp.where(mask[None, :], coarse, NEG_INF)
        if use_approx:
            # TPU-native approximate top-k (lax.approx_max_k): 3.5x the flat
            # lax.top_k at 1M rows (7.8ms vs 27.3ms for B=256) at ~0.998
            # coarse recall — the exact HIGHEST re-score below re-ranks the
            # widened candidate set, so the FINAL top-k stays exact in
            # practice (bench's oracle probes verify 0/8 mismatches)
            _, cand = jax.lax.approx_max_k(coarse, m, recall_target=0.99)
        else:
            _, cand = jax.lax.top_k(coarse, m)               # [B, m]
    cand_emb = emb[cand]                                     # [B, m, D]
    exact = jnp.einsum("bd,bmd->bm", q, cand_emb,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    exact = jnp.where(mask[cand], exact, NEG_INF)
    vals, pos = jax.lax.top_k(exact, min(k, m))
    idx = jnp.take_along_axis(cand, pos, axis=1)
    if k > m:
        vals = jnp.pad(vals, ((0, 0), (0, k - m)), constant_values=NEG_INF)
        idx = jnp.pad(idx, ((0, 0), (0, k - m)))
    return vals, idx


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------
def _tile_topk_kernel(nvalid_ref, q_ref, e_ref, mask_ref, vals_ref, idx_ref, *,
                      tile_n: int, k: int, k_pad: int):
    """One grid step: scores for a corpus tile, reduced to the tile's top-k.

    Rows are eligible when below ``n_valid`` AND their ``mask`` entry is > 0
    (the vector index covers a non-contiguous subset of nodes). The k-extraction
    loop is fully functional (one-hot selects, no dynamic-index stores) because
    Mosaic requires lane-dimension store offsets to be statically 128-aligned.
    """
    i = pl.program_id(0)
    scores = jnp.dot(q_ref[:], e_ref[:].T, preferred_element_type=jnp.float32)  # [B, TILE_N]
    base = i * tile_n
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    eligible = (base + col < nvalid_ref[0]) & (mask_ref[:].reshape(1, -1) > 0)
    scores = jnp.where(eligible, scores, NEG_INF)

    B = scores.shape[0]
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, k_pad), dimension=1)  # [B, k_pad] slots

    def body(j, carry):
        s, vals, idx = carry
        best = jnp.max(s, axis=1, keepdims=True)                        # [B, 1]
        arg = jnp.argmax(s, axis=1, keepdims=True).astype(jnp.int32)    # lowest index wins
        hit = slot == j
        vals = jnp.where(hit, best, vals)
        idx = jnp.where(hit, base + arg, idx)
        s = jnp.where(col == arg, NEG_INF, s)
        return s, vals, idx

    _, vals, idx = jax.lax.fori_loop(
        0, k, body,
        (scores, jnp.full((B, k_pad), NEG_INF, jnp.float32), jnp.zeros((B, k_pad), jnp.int32)))
    vals_ref[:, :] = vals
    idx_ref[:, :] = idx


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def dense_topk_pallas(q: jnp.ndarray, emb: jnp.ndarray, n_valid: jnp.ndarray, k: int,
                      tile_n: int = 1024, interpret: bool = False,
                      mask: jnp.ndarray | None = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused matmul + per-tile top-k Pallas kernel, then a tiny XLA merge.

    Shapes: q [B, D], emb [N_pad, D] with N_pad % tile_n == 0 (pad rows are masked by
    ``n_valid``; an optional [N_pad] ``mask`` further restricts eligibility — the
    vector index is a non-contiguous node subset). Returns ([B, k], [B, k]).
    """
    B, D = q.shape
    N = emb.shape[0]
    assert N % tile_n == 0, (N, tile_n)
    num_tiles = N // tile_n
    kk = min(k, tile_n)
    # Mosaic requires the lane (last) dim of VMEM blocks to be 128-aligned; pad the
    # per-tile top-k slots and drop the NEG_INF-filled tail in the XLA merge.
    k_pad = _round_up(kk, 128)
    mask_f = (jnp.ones(N, jnp.float32) if mask is None
              else jnp.asarray(mask, jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i, n: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, k_pad), lambda i, n: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, k_pad), lambda i, n: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    def kernel(nvalid_ref, q_ref, e_ref, mask_ref, vals_ref, idx_ref):
        _tile_topk_kernel(nvalid_ref, q_ref, e_ref, mask_ref,
                          vals_ref.at[0], idx_ref.at[0],
                          tile_n=tile_n, k=kk, k_pad=k_pad)

    tile_vals, tile_idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, B, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, B, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D, bytes_accessed=N * D * 4 + B * D * 4, transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), q, emb, mask_f)

    # Final merge: [num_tiles*kk] candidates per query. Candidates arrive in tile
    # order, so stable top_k keeps lowest-index winners on ties.
    cand_vals = tile_vals[:, :, :kk].transpose(1, 0, 2).reshape(B, num_tiles * kk)
    cand_idx = tile_idx[:, :, :kk].transpose(1, 0, 2).reshape(B, num_tiles * kk)
    vals, pos = jax.lax.top_k(cand_vals, min(k, num_tiles * kk))
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    if k > num_tiles * kk:  # degenerate small-corpus case: pad
        pad = k - num_tiles * kk
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=0)
    return vals, idx


def dense_topk(q: jnp.ndarray, emb: jnp.ndarray, n_valid, k: int,
               prefer_pallas: bool | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend-dispatching entry point: Pallas on TPU, XLA elsewhere."""
    if prefer_pallas is None:
        prefer_pallas = jax.default_backend() not in ("cpu",)
    n_valid = jnp.asarray(n_valid, jnp.int32)
    if prefer_pallas and emb.shape[0] >= 1024 and emb.shape[0] % 1024 == 0:
        return dense_topk_pallas(q, emb, n_valid, k)
    return dense_topk_xla(q, emb, n_valid, k)
