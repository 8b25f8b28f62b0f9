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

# Coarse-stage matmul precision for f32-stored corpora on the binned TPU path.
# "highest" is f32 6-pass on v5e (measured ~5.8x the single-pass bf16 wall);
# "high" is bf16x3 (3-pass), whose error band should be the same ~1e-6 order
# at roughly half the MXU cost. Default stays "highest" until the kernel-true
# calibration + cert-rate + oracle-parity A/B on the real chip validates
# "high" (tools/exp_high_precision.py -> reports/topk_high_precision_r3.json).
# Env override for A/B: AHRAG_COARSE_PRECISION=high|highest.
import os as _os
F32_COARSE_PRECISION = _os.environ.get("AHRAG_COARSE_PRECISION", "highest")


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


@functools.lru_cache(maxsize=None)
def matmul_eps(backend: str, d: int, mode: str = "default") -> float:
    """Calibrated upper bound on the coarse-vs-exact dot-product error band for
    unit vectors of dimension ``d`` on ``backend``.

    The certificate in ``refined_masked_topk`` needs: for every row,
    |exact_HIGHEST_score - coarse_score| <= eps. Both sides are measured
    against a float64 host ground truth on seeded random unit vectors:
    eps = 8 * (max|coarse - f64| + max|HIGHEST - f64|) + 1e-7.

    HONESTY NOTE: this is an empirically calibrated band with an 8x safety
    factor, not an IEEE worst-case proof — embeddings whose rounding errors
    correlate far more heavily across the D accumulation than random unit
    vectors' could in principle exceed it, and the certificate would then
    pass on a wrong result. The formal worst-case bound (sum of per-element
    ulps) is ~100x looser and would make the certificate useless in
    practice; 8x over the measured max on matched-dimension data is the
    engineering compromise, and the property tests adversarially cluster
    scores INSIDE the band to verify the failure path.

    ``mode`` is the coarse matmul's precision: "default" (bf16 passes on TPU,
    eps ~ 4e-3), "highest" (f32 3-pass, eps ~ 1e-6 — only accumulation-order
    noise remains, which is what lets the certificate pass on score
    distributions packed tighter than the bf16 band), or "bf16in" (bf16
    STORAGE: operands are bf16, products are exact in f32 accumulation, so a
    single default-precision pass carries only accumulation-order noise —
    eps ~ 1e-6 without any multi-pass penalty). Cached per (backend, d, mode):
    costs two small matmuls once per process.
    """
    import numpy as np
    with jax.ensure_compile_time_eval():
        # runs eagerly even when first called inside an outer jit trace — the
        # result is a Python float baked into the caller's program as a constant
        key = jax.random.PRNGKey(0)
        kq, ke = jax.random.split(key)
        q = jax.random.normal(kq, (64, d), jnp.float32)
        e = jax.random.normal(ke, (2048, d), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        if mode == "bf16in":
            q = q.astype(jnp.bfloat16)
            e = e.astype(jnp.bfloat16)
        prec = (jax.lax.Precision.HIGHEST if mode == "highest" else None)
        coarse = jnp.dot(q, e.T, preferred_element_type=jnp.float32,
                         precision=prec)
        exact = jnp.dot(q, e.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        true = np.asarray(q, np.float64) @ np.asarray(e, np.float64).T
        err = (float(np.max(np.abs(np.asarray(coarse, np.float64) - true)))
               + float(np.max(np.abs(np.asarray(exact, np.float64) - true))))
    return 8.0 * err + 1e-7


@functools.lru_cache(maxsize=None)
def binmax_eps(backend: str, d: int, tile_n: int, precision: str,
               bf16_in: bool, interpret: bool = False) -> float:
    """Coarse error band calibrated THROUGH ``dense_binmax_pallas`` itself.

    ``matmul_eps`` calibrates an XLA ``jnp.dot``, but the binned certificate's
    coarse scores come from the Pallas kernel, whose per-tile matmul has its
    own tiling/accumulation order — only the 8x safety factor covered that
    gap (ADVICE r2, medium). This measures the kernel directly: with
    ``n_valid = 128`` exactly one corpus row is live per lane bin, so the
    kernel's bin maxima ARE its per-row scores, comparable one-to-one against
    a float64 host ground truth. The refine-stage error (HIGHEST dot for f32
    storage, single-pass bf16 product otherwise) is measured the same way and
    added, then the same 8x engineering margin + 1e-7 floor as matmul_eps.
    Cached per (backend, d, tile_n, precision, bf16_in, interpret): two small
    kernel launches once per process. Unlike ``matmul_eps`` this does NOT use
    ``ensure_compile_time_eval`` — its eval mode cannot run pallas_call
    (no eval rule for ``program_id``); the jitted kernel on concrete inputs
    executes normally even when first reached at trace time.
    """
    import numpy as np
    key = jax.random.PRNGKey(0)
    kq, ke = jax.random.split(key)
    q = jax.random.normal(kq, (64, d), jnp.float32)
    e = jax.random.normal(ke, (tile_n, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
    if bf16_in:
        q = q.astype(jnp.bfloat16)
        e = e.astype(jnp.bfloat16)
    bm = dense_binmax_pallas(q, e, jnp.int32(128),
                             jnp.ones(tile_n, bool), tile_n=tile_n,
                             interpret=interpret, precision=precision)
    coarse = np.asarray(bm[:, :128], np.float64)
    true = np.asarray(q, np.float64) @ np.asarray(e[:128], np.float64).T
    refine = jnp.dot(q, e[:128].T, preferred_element_type=jnp.float32,
                     precision=(None if bf16_in
                                else jax.lax.Precision.HIGHEST))
    err = (float(np.max(np.abs(coarse - true)))
           + float(np.max(np.abs(np.asarray(refine, np.float64) - true))))
    return 8.0 * err + 1e-7


def _flush_tiny(s: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Flush |score| < eps to exact 0.0.

    Purpose: batch-shape-stable tie-breaking. A corpus-fitted LSA basis makes
    query-irrelevant rows EXACTLY orthogonal, so their scores are pure matmul
    noise (~1e-7) whose sign/order varies with the batch tiling — top-k
    membership among them then differs between a bucket-1 and a bucket-64
    serving batch for the same query. Flushing collapses the noise cloud to a
    bitwise-equal 0.0, and ``lax.top_k``'s documented lowest-index-first tie
    break makes the selection deterministic across shapes."""
    return jnp.where(jnp.abs(s) < eps, 0.0, s)


def refined_masked_topk_cert(q: jnp.ndarray, emb: jnp.ndarray, mask: jnp.ndarray,
                             k: int, margin: int = 16, flush_eps: float = 0.0,
                             mask_trivial: bool = False,
                             emb_binpack: jnp.ndarray | None = None
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-phase top-k with a per-query exactness certificate.

    Fast default-precision coarse scores select ``m = k + margin`` candidates;
    candidates are re-scored at f32 HIGHEST. Candidate COVERAGE need not be
    sound for the certificate to be: the binned branch selects bins with
    ``lax.approx_max_k`` (XLA's exact top-k dominates wall time at >=64k
    bins), and a hot bin that approx selection misses lands in ``c_out`` —
    the exact max over NON-selected bin maxima — which then exceeds the k-th
    candidate value and honestly FAILS the certificate instead of corrupting
    the result (the public wrapper recomputes at full HIGHEST). The
    certificate bounds every non-candidate row: its coarse score is <= the
    coarse bound (``c_m`` on the flat branch, ``c_out`` on the binned
    branch), so its exact score is <= bound + ``eps`` with ``eps`` the
    calibrated coarse-vs-f64 error band measured through the SAME computation
    that produced the coarse scores (``matmul_eps`` for the flat XLA dot,
    ``binmax_eps`` through the Pallas kernel itself). If the k-th exact
    candidate value exceeds that bound, no outside row can belong in the
    top-k and the result is certified exact.

    q: [B, D], emb: [N, D], mask: [N] bool.
    Returns (vals [B, k], idx [B, k], certified [B] bool).
    """
    n = emb.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    m = min(k + margin, n)
    is_bf16 = emb.dtype == jnp.bfloat16
    if is_bf16:
        # bf16 STORAGE mode: score against the stored precision — q rounds to
        # bf16 once so every stage (coarse kernel, refine, fallback) computes
        # the SAME bf16 x bf16 products, which are exact in f32 accumulation.
        # A single default-precision pass is then already exact (no 3-pass),
        # and the corpus stream halves (see graph/tensors.py emb_dtype).
        q = q.astype(jnp.bfloat16)
    if on_tpu and n % 1024 == 0 and n >= 4096:
        # streaming bin-max kernel: one corpus pass, no [B, N] materialization,
        # exact coarse coverage (every bin's max upper-bounds its members),
        # then HIERARCHICAL exact bin selection — superbin max-reduce + two
        # small top_k's with a free exact-style out-of-net bound (see
        # binned_refined_topk select="hier"). Measured at 1.07M x 384, B=512,
        # bf16 (reports/topk_r4_tpu.json): 5.4 ms = 94.7k qps, cert_rate 1.0,
        # oracle-exact — vs 16.4-27 ms for the round-3 flat single-pass (the
        # [B, N] f32 score buffer + lax.top_k over 1M columns was ~13 ms of
        # non-matmul wall) and 18.9 ms for approx select + its O(B*m*nbins)
        # c_out pass. For f32 storage the in-kernel matmul runs at HIGHEST
        # (~3x MXU work, but the kernel is HBM-bound) so eps stays ~1e-6 and
        # the certificate remains satisfiable on clustered distributions.
        # Batch-chunked: the kernel's VMEM blocks scale with B (scores tile
        # [B, tile_n] plus the HIGHEST 3-pass scratch); 256 is the measured
        # safe f32 block, doubled for bf16 (halved VMEM blocks). Chunking
        # costs extra corpus passes — milliseconds of HBM stream at these N.
        # Trace-time Python loop: B is static under jit.
        B = q.shape[0]
        tile_n = 1024
        # Margin policy: the out-of-net bound is the m-th selected bin max,
        # which TIGHTENS as m grows. Round 3 kept a wide net for f32 because
        # its default-precision coarse pass had a large eps band; the coarse
        # kernel now runs HIGHEST for f32 (eps ~1e-6, same as bf16's
        # accumulation noise), and the round-5 isolation sweep
        # (reports/kernel_iso_r5.json) measured cert_rate 1.0 at the
        # caller's narrow margin with a 26% wall win (21 -> 15.5 ms at 1M,
        # B=512) — so both dtypes use the caller's margin; a cert failure
        # still falls back to the exact full pass.
        eff_margin = margin
        # bf16 VMEM per chunk row ~ scores tile [B, tile_n] f32 + q/bins;
        # 1024 measured safe (~7 MB live) and halves the number of corpus
        # passes for 1k-query batches vs the round-4 512 cap
        chunk = 1024 if is_bf16 else 256
        outs = []
        for s in range(0, B, chunk):
            outs.append(binned_refined_topk(
                q[s:s + chunk], emb, mask, k,
                margin=eff_margin, tile_n=tile_n,
                coarse_precision=("default" if is_bf16
                                  else F32_COARSE_PRECISION),
                select="hier", mask_trivial=mask_trivial,
                emb_binpack=emb_binpack))
        if len(outs) == 1:
            return outs[0]
        return tuple(jnp.concatenate([o[i] for o in outs]) for i in range(3))
    if (on_tpu and is_bf16 and n >= 4096 and q.shape[0] >= 256
            and q.shape[0] * n * 4 <= (4 << 30)):
        # bf16 STORAGE at a non-kernel-aligned N (rare: anything not padded by
        # build_graph_tensors): one default-precision MXU pass over the bf16
        # operands IS the exact score (products exact in f32 accumulation) —
        # exact by construction, no certificate needed. Costs the [B, N] f32
        # score buffer the binned path above avoids.
        vals, idx = _full_highest_topk(q, emb, mask, k, flush_eps=flush_eps)
        return vals, idx, jnp.ones((q.shape[0],), bool)
    if on_tpu and n < 4096:
        # small corpus: the full HIGHEST matmul is cheap (3x a tiny matmul
        # beats a two-phase whose bf16-band certificate can fail and pay 4x).
        # Large UNALIGNED corpora (rare: anything not built through
        # build_graph_tensors' kernel-window padding) fall through to the flat
        # coarse+rescore+certificate path below instead — a [B, N] HIGHEST
        # matmul at 1M rows is 3x the work and an 8 GB score buffer.
        vals, idx = _full_highest_topk(q, emb, mask, k, flush_eps=flush_eps)
        return vals, idx, jnp.ones((q.shape[0],), bool)
    coarse = jnp.dot(q, emb.T, preferred_element_type=jnp.float32)
    if flush_eps:
        coarse = _flush_tiny(coarse, flush_eps)
    coarse = jnp.where(mask[None, :], coarse, NEG_INF)
    cvals, cand = jax.lax.top_k(coarse, m)                   # [B, m]
    cand_emb = emb[cand]                                     # [B, m, D]
    exact = jnp.einsum("bd,bmd->bm", q, cand_emb,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if flush_eps:
        exact = _flush_tiny(exact, flush_eps)
    exact = jnp.where(mask[cand], exact, NEG_INF)
    vals, pos = jax.lax.top_k(exact, min(k, m))
    idx = jnp.take_along_axis(cand, pos, axis=1)
    if k > m:
        vals = jnp.pad(vals, ((0, 0), (0, k - m)), constant_values=NEG_INF)
        idx = jnp.pad(idx, ((0, 0), (0, k - m)))
    if m >= n:
        # the coarse set is the whole corpus: every row was re-scored exactly
        return vals, idx, jnp.ones((q.shape[0],), bool)
    eps = matmul_eps(jax.default_backend(), emb.shape[1],
                     "bf16in" if is_bf16 else "default")
    c_m = cvals[:, -1]
    # exhausted coarse set (fewer than m valid rows) => every valid row was
    # re-scored exactly => certified regardless of the gap
    cert = (vals[:, min(k, m) - 1] > c_m + eps) | (c_m <= NEG_INF / 2)
    return vals, idx, cert


def _full_highest_topk(q: jnp.ndarray, emb: jnp.ndarray, mask: jnp.ndarray,
                       k: int, flush_eps: float = 0.0
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Certainly-exact fallback: full matmul + flat top_k.

    f32 inputs run at HIGHEST (f32 multi-pass — bf16-pass rank flips are the
    whole reason this fallback exists). bf16 inputs run at default precision:
    bf16 x bf16 products are exact in f32 accumulation, so a single pass is
    already exact and HIGHEST would only trigger a ~3x f32-emulation upcast.
    """
    scores = jnp.dot(q, emb.T, preferred_element_type=jnp.float32,
                     precision=(None if q.dtype == jnp.bfloat16
                                else jax.lax.Precision.HIGHEST))
    if flush_eps:
        scores = _flush_tiny(scores, flush_eps)
    vals, idx = jax.lax.top_k(jnp.where(mask[None, :], scores, NEG_INF), k)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k", "margin", "certify",
                                             "flush_eps", "mask_trivial"))
def refined_masked_topk(q: jnp.ndarray, emb: jnp.ndarray, mask: jnp.ndarray,
                        k: int, margin: int = 16, certify: bool = True,
                        flush_eps: float = 0.0, mask_trivial: bool = False,
                        emb_binpack: jnp.ndarray | None = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Certified-exact two-phase top-k (see ``refined_masked_topk_cert``).

    When any query's certificate fails (scores adversarially clustered inside
    the precision error band), the whole batch recomputes at full HIGHEST — the
    honest price of an exactness guarantee, paid only when the data demands it.
    ``lax.cond`` on the scalar all-certified predicate executes one branch on
    TPU; do NOT call the certified form under ``vmap`` (callers hoist the
    batch dim — cond degrades to a select that executes BOTH branches,
    including the full-corpus HIGHEST fallback, on every call). Callers that
    must run under vmap (RL rollouts) pass ``certify=False``: same coarse +
    exact-rescore result, no fallback branch — exact whenever the certificate
    would have passed, which the rollout paths tolerate.

    q: [B, D], emb: [N, D], mask: [N] bool. Returns ([B, k], [B, k]).

    ``flush_eps`` > 0 flushes |score| < eps to exact 0.0 before each top-k
    (see ``_flush_tiny``) on the flat and small-corpus branches — the graph
    search passes it for batch-shape-stable tie order. The large-N binned TPU
    branch does not flush: at corpus scale the tied-at-zero rows are
    uniformly irrelevant fillers and the streaming kernel's bin order is
    already deterministic per shape.
    """
    if emb.dtype == jnp.bfloat16:
        # bf16 storage contract: EVERY stage (coarse, refine, fallback) scores
        # the same bf16 x bf16 products — the fallback below must not see the
        # unrounded f32 q (it would order near-ties differently than the
        # certified branch, making results depend on batch composition)
        q = q.astype(jnp.bfloat16)
    vals, idx, cert = refined_masked_topk_cert(q, emb, mask, k, margin=margin,
                                               flush_eps=flush_eps,
                                               mask_trivial=mask_trivial,
                                               emb_binpack=emb_binpack)
    if not certify:
        return vals, idx
    return jax.lax.cond(jnp.all(cert),
                        lambda: (vals, idx),
                        lambda: _full_highest_topk(q, emb, mask, k,
                                                   flush_eps=flush_eps))


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


# ---------------------------------------------------------------------------
# Streaming bin-max Pallas kernel (the >=65k-row path)
# ---------------------------------------------------------------------------
def _binmax_kernel(nvalid_ref, q_ref, e_ref, mask_ref, out_ref, *, tile_n: int,
                   precision=None):
    """One grid step: corpus-tile scores on the MXU, reduced to 128 bin maxima.

    Bin ``j`` of a tile holds rows ``{j + 128*i : i < tile_n/128}`` (strided
    layout — the natural Mosaic reshape). The reduction is a single sublane max,
    so unlike the per-tile top-k kernel there is no O(k) extraction loop: the
    VPU cost per tile is ~1 op/element and the kernel stays MXU/HBM-bound.
    """
    i = pl.program_id(0)
    scores = jnp.dot(q_ref[:], e_ref[:].T, preferred_element_type=jnp.float32,
                     precision=precision)
    base = i * tile_n
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    eligible = (base + col < nvalid_ref[0]) & (mask_ref[:].reshape(1, -1) > 0)
    scores = jnp.where(eligible, scores, NEG_INF)
    B = scores.shape[0]
    out_ref[:, :] = scores.reshape(B, tile_n // 128, 128).max(axis=1)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret", "precision"))
def dense_binmax_pallas(q: jnp.ndarray, emb: jnp.ndarray, n_valid: jnp.ndarray,
                        mask: jnp.ndarray, tile_n: int = 4096,
                        interpret: bool = False,
                        precision: str = "default") -> jnp.ndarray:
    """Fused matmul + bin-max over the corpus: [B, D] x [N, D] -> [B, N/G] with
    G = tile_n/128 rows per bin.

    This is the streaming coarse stage for certified top-k at scale: the corpus
    crosses HBM exactly once, nothing materializes [B, N] (the dominant cost of
    flat ``lax.top_k`` at >=1M rows), and — unlike ``lax.approx_max_k`` — every
    row is upper-bounded by its bin's max, so selecting the top-m bins provably
    covers the coarse top-m (an element beaten by < m others has < m bins with a
    larger max; certificate handles boundary ties). Ineligible rows contribute
    NEG_INF.

    ``precision="highest"`` runs the in-kernel matmul as f32 3-pass: ~3x the
    MXU work, but the error band collapses from the bf16 ~4e-3 to ~1e-6, which
    is what keeps the exactness certificate satisfiable on tightly clustered
    score distributions (measured: cert_rate 0.72 -> ~1.0 at 1M rows).
    """
    B, D = q.shape
    N = emb.shape[0]
    assert N % tile_n == 0 and tile_n % 128 == 0, (N, tile_n)
    num_tiles = N // tile_n
    mask_f = jnp.asarray(mask, jnp.float32)
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH}.get(precision)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i, n: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, 128), lambda i, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def kernel(nvalid_ref, q_ref, e_ref, mask_ref, out_ref):
        _binmax_kernel(nvalid_ref, q_ref, e_ref, mask_ref, out_ref.at[0],
                       tile_n=tile_n, precision=prec)

    (tile_bins,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, B, 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D, bytes_accessed=N * D * 4 + B * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), q, emb, mask_f)
    return tile_bins.transpose(1, 0, 2).reshape(B, num_tiles * 128)


def _binmax2_kernel(nvalid_ref, q_ref, e_ref, mask_ref, bins_ref, smax_ref, *,
                    tile_n: int, precision=None, trivial: bool = False):
    """Bin-max kernel v2: per-tile 128 bin maxima PLUS the tile's supermax.

    Two differences from ``_binmax_kernel``, both aimed at the VPU/HBM tax
    around the MXU matmul (measured ~3.5 us/tile vs the ~2 us MXU floor):

    - ``trivial=True`` (static) skips the eligibility masking entirely. Sound
      when the caller guarantees masked-out rows have ZERO embeddings (pad
      rows are zeroed by ``build_graph_tensors``; ``mask_trivial`` asserts all
      real rows are indexed): a zero row scores exactly 0.0, which can only
      displace genuinely negative-scored bins from the coarse net — and the
      refine stage re-applies the true mask exactly, so a query whose true
      top-k includes negative scores fails the certificate honestly and falls
      back, instead of returning a wrong result.
    - the tile's supermax (max over its 128 bin maxima) is emitted as a tiny
      [8, B] block, so hierarchical selection never re-reads the full
      [num_tiles, B, 128] bin array from HBM (273 MB at 1M rows, B=512 — the
      dominant post-kernel cost of the round-4 hier path).
    """
    i = pl.program_id(0)
    scores = jnp.dot(q_ref[:], e_ref[:].T, preferred_element_type=jnp.float32,
                     precision=precision)
    if not trivial:
        base = i * tile_n
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        eligible = (base + col < nvalid_ref[0]) & (mask_ref[:].reshape(1, -1) > 0)
        scores = jnp.where(eligible, scores, NEG_INF)
    B = scores.shape[0]
    bins = scores.reshape(B, tile_n // 128, 128).max(axis=1)
    bins_ref[:, :] = bins
    smax_ref[:, :] = jnp.broadcast_to(bins.max(axis=1)[None, :], (8, B))


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret", "precision",
                                             "trivial"))
def dense_binmax2_pallas(q: jnp.ndarray, emb: jnp.ndarray, n_valid: jnp.ndarray,
                         mask: jnp.ndarray, tile_n: int = 1024,
                         interpret: bool = False,
                         precision: str = "default",
                         trivial: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused matmul + bin-max + tile-supermax: [B, D] x [N, D] ->
    (bins [num_tiles, B, 128], supermax [B, num_tiles]).

    Same coarse math as ``dense_binmax_pallas`` (same matmul precision, same
    strided bin layout: bin ``j`` of tile ``t`` holds rows
    ``{t*tile_n + j + 128*i}``), but (a) bins stay in the kernel's natural
    [tile, B, lane] layout — the caller gathers only SELECTED tiles instead of
    transposing the whole array — and (b) each tile's supermax comes out as a
    2 MB side array that drives hierarchical selection without touching the
    bin array. ``trivial`` statically removes the in-kernel masking (see
    ``_binmax2_kernel`` for the soundness argument). ``binmax_eps`` remains
    the calibrated error band: the per-element score computation (dot + max
    reduce) is instruction-identical to ``dense_binmax_pallas``.
    """
    B, D = q.shape
    N = emb.shape[0]
    assert N % tile_n == 0 and tile_n % 128 == 0, (N, tile_n)
    num_tiles = N // tile_n
    mask_f = jnp.asarray(mask, jnp.float32)
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH}.get(precision)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i, n: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, 128), lambda i, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, B), lambda i, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def kernel(nvalid_ref, q_ref, e_ref, mask_ref, bins_ref, smax_ref):
        _binmax2_kernel(nvalid_ref, q_ref, e_ref, mask_ref, bins_ref.at[0],
                        smax_ref.at[0], tile_n=tile_n, precision=prec,
                        trivial=trivial)

    tile_bins, smax = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, B, 128), jnp.float32),
                   jax.ShapeDtypeStruct((num_tiles, 8, B), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D, bytes_accessed=N * D * 4 + B * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), q, emb, mask_f)
    return tile_bins, smax[:, 0, :].T


def binned_rows_of(bin_idx: jnp.ndarray, tile_n: int) -> jnp.ndarray:
    """Corpus rows covered by global bin ids ([..., m] -> [..., m, G])."""
    g = tile_n // 128
    tile = bin_idx // 128
    lane = bin_idx % 128
    return (tile * tile_n + lane)[..., None] + 128 * jnp.arange(g)


def _safe_binmax_eps(d: int, tile_n: int, coarse_precision: str,
                     is_bf16: bool, interpret: bool) -> float:
    """Kernel-true eps when obtainable, XLA-calibrated band otherwise.

    ``binmax_eps`` runs the Pallas kernel, which cannot execute inside an
    ambient jit trace (inner jits inline; pallas has no eval rule). The lru
    cache is primed eagerly at ``build_graph_tensors`` time and by the
    ``binned_refined_topk`` shell, so traced callers normally find it warm;
    a cold in-trace call falls back to the XLA-dot calibration whose
    kernel-order gap the 8x safety factor covers (the pre-round-3 band)."""
    try:
        return binmax_eps(jax.default_backend(), d, tile_n, coarse_precision,
                          is_bf16, interpret)
    except jax.errors.TracerArrayConversionError:
        return matmul_eps(jax.default_backend(), d,
                          "bf16in" if is_bf16 else coarse_precision)


def binned_refined_topk(q: jnp.ndarray, emb: jnp.ndarray, mask: jnp.ndarray,
                        k: int, margin: int = 16, tile_n: int = 4096,
                        interpret: bool = False,
                        coarse_precision: str = "default",
                        select: str = "exact",
                        recall_target: float = 0.999,
                        mask_trivial: bool = False,
                        emb_binpack: jnp.ndarray | None = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Public shell: resolves the calibrated ``eps`` eagerly (priming the
    kernel-true calibration when called outside a trace), then dispatches the
    jitted implementation with ``eps`` baked in as a static constant."""
    eps = _safe_binmax_eps(emb.shape[1], tile_n, coarse_precision,
                           emb.dtype == jnp.bfloat16, interpret)
    return _binned_refined_topk(q, emb, mask, k, margin=margin, tile_n=tile_n,
                                interpret=interpret,
                                coarse_precision=coarse_precision,
                                select=select, recall_target=recall_target,
                                eps=eps, mask_trivial=mask_trivial,
                                emb_binpack=emb_binpack)


@functools.partial(jax.jit, static_argnames=("k", "margin", "tile_n",
                                             "interpret", "coarse_precision",
                                             "select", "recall_target", "eps",
                                             "mask_trivial"))
def _binned_refined_topk(q: jnp.ndarray, emb: jnp.ndarray, mask: jnp.ndarray,
                         k: int, margin: int = 16, tile_n: int = 4096,
                         interpret: bool = False,
                         coarse_precision: str = "default",
                         select: str = "exact",
                         recall_target: float = 0.999,
                         eps: float = 0.0,
                         mask_trivial: bool = False,
                         emb_binpack: jnp.ndarray | None = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Certified top-k via the streaming bin-max kernel.

    coarse = top-(k+margin) bins by bin max -> gather those bins' G rows each ->
    exact HIGHEST re-score -> top-k. Certificate: every row outside the
    selected bins has coarse score <= ``c_out`` (the exact max over
    NON-selected bin maxima, computed by masking the selected bins out of the
    full bin-max array); its exact score is therefore <= ``c_out + eps`` with
    eps calibrated for ``coarse_precision`` (see ``matmul_eps``).

    ``select`` picks the bin-selection algorithm: "exact" (``lax.top_k``) or
    "approx" (``lax.approx_max_k`` at ``recall_target`` — measured 1.5-2.5x
    faster end-to-end at 1M rows because XLA's exact top-k is the bottleneck,
    not the gather). The certificate stays SOUND under approx selection: a
    missed hot bin lands in ``c_out`` and honestly fails the certificate
    instead of corrupting the result (the public wrapper then recomputes at
    full HIGHEST). Measured at 1M x 384, B=256, k=10, margin 32 (m=42),
    rt=0.999: 16.9 ms, cert_rate 1.0, oracle-exact — vs 34.3 ms with exact
    selection and 18.98 ms for uncertified flat XLA top-k.
    Returns (vals [B, k], idx [B, k], certified [B] bool).
    """
    B = q.shape[0]
    n = emb.shape[0]
    is_bf16 = emb.dtype == jnp.bfloat16
    if is_bf16:
        q = q.astype(jnp.bfloat16)
    num_tiles = n // tile_n
    nbins = num_tiles * 128
    m = min(k + margin, nbins)
    if (select == "hier" and m < nbins and nbins > 2 * 128
            and B % 128 == 0):
        # v2 path: the kernel emits each tile's supermax alongside its bin
        # maxima, and bins stay in [tile, B, 128] layout — selection reads the
        # 2 MB supermax array plus ONLY the selected tiles' bin rows, instead
        # of transposing + max-reducing the full [B, nbins] array (273 MB of
        # HBM re-read at 1M rows, B=512: the round-4 hier path's dominant
        # post-kernel cost). Superbin == tile (128 consecutive bins), so the
        # certificate's two-case soundness argument is unchanged (see below).
        # Gated on B % 128 == 0: the supermax block's lane dim is B.
        tile_bins, smax = dense_binmax2_pallas(
            q, emb, jnp.int32(n), mask, tile_n=tile_n, interpret=interpret,
            precision=coarse_precision, trivial=mask_trivial)
        s_take = min(m, num_tiles)
        _, sb_idx = jax.lax.top_k(smax, s_take)                  # [B, s]
        sub = tile_bins[sb_idx, jnp.arange(B)[:, None]]          # [B, s, 128]
        sub = sub.reshape(B, s_take * 128)
        bins_of = (sb_idx[:, :, None] * 128
                   + jnp.arange(128)[None, None, :]).reshape(B, -1)
        bm_vals, sub_pos = jax.lax.top_k(sub, m)
        bm_idx = jnp.take_along_axis(bins_of, sub_pos, axis=1)
    elif select == "hier" and m < nbins and nbins > 2 * 128:
        # Two-level EXACT selection: superbin maxima (groups of 128 bins) ->
        # top-m superbins -> top-m bins within their union. Pure XLA, no
        # O(B*nbins) top_k (the 60ms bottleneck at 66688 bins) and no
        # O(B*m*nbins) c_out pass (the approx path's tax).
        #
        # Certificate soundness (the property the c_out bound needs is that
        # every NON-selected bin's max <= c_out = the m-th selected value):
        # let B* be a non-selected bin with max v*. Either (a) B*'s superbin
        # was gathered but B* lost the inner top-m — then >= m gathered bins
        # have value >= v*, so c_out >= v*; or (b) B*'s superbin lost the
        # superbin top-m — then m superbins have max >= superbin(B*)'s max
        # >= v*, and each contributes its own best bin (value >= v*) to the
        # gathered set, so again >= m gathered bins >= v* and c_out >= v*.
        # Either way v* <= c_out: the free exact-style bound stays sound.
        binmax = dense_binmax_pallas(q, emb, jnp.int32(n), mask, tile_n=tile_n,
                                     interpret=interpret,
                                     precision=coarse_precision)
        sb = 128
        nb_pad = _round_up(nbins, sb)
        bm_p = (binmax if nb_pad == nbins else
                jnp.pad(binmax, ((0, 0), (0, nb_pad - nbins)),
                        constant_values=NEG_INF))
        bm3 = bm_p.reshape(B, nb_pad // sb, sb)                  # [B, S, 128]
        smax = bm3.max(axis=2)                                   # [B, S]
        s_take = min(m, smax.shape[1])
        _, sb_idx = jax.lax.top_k(smax, s_take)                  # [B, s]
        # gather whole 128-lane superbin ROWS ([B, s, 1] indices -> contiguous
        # lane slices). The former flattened form ([B, s*128] arbitrary
        # element indices into [B, nbins]) lowered to a per-element gather —
        # measured 73 ms at B=512, nbins=66688 vs ~19 ms for the whole approx
        # path it was meant to beat (reports/topk_hier_r3_tpu.json).
        sub = jnp.take_along_axis(bm3, sb_idx[:, :, None], axis=1)
        sub = sub.reshape(B, s_take * sb)                        # [B, s*128]
        bins_of = (sb_idx[:, :, None] * sb
                   + jnp.arange(sb)[None, None, :]).reshape(B, -1)
        bm_vals, sub_pos = jax.lax.top_k(sub, m)
        bm_idx = jnp.take_along_axis(bins_of, sub_pos, axis=1)
    elif select == "approx" and m < nbins:
        binmax = dense_binmax_pallas(q, emb, jnp.int32(n), mask, tile_n=tile_n,
                                     interpret=interpret,
                                     precision=coarse_precision)
        bm_vals, bm_idx = jax.lax.approx_max_k(binmax, m,
                                               recall_target=recall_target)
    else:
        binmax = dense_binmax_pallas(q, emb, jnp.int32(n), mask, tile_n=tile_n,
                                     interpret=interpret,
                                     precision=coarse_precision)
        bm_vals, bm_idx = jax.lax.top_k(binmax, m)           # [B, m]
    rows = binned_rows_of(bm_idx, tile_n).reshape(B, -1)     # [B, m*G]
    if emb_binpack is not None and tile_n == 1024:
        # bin-contiguous copy (tensors.py emb_binpack): ONE ~6 KB descriptor
        # per selected bin instead of G scattered 768 B rows — the scattered
        # form was descriptor-latency-bound (~2 ms of the 1M seed, round 5)
        cand_emb = emb_binpack[bm_idx].reshape(B, -1, emb.shape[1])
    else:
        cand_emb = emb[rows]                                 # [B, m*G, D]
    # bf16 inputs: products are exact; HIGHEST would only trigger a wasteful
    # f32-emulation upcast
    exact = jnp.einsum("bd,bmd->bm", q, cand_emb,
                       preferred_element_type=jnp.float32,
                       precision=(None if is_bf16
                                  else jax.lax.Precision.HIGHEST))
    exact = jnp.where(mask[rows], exact, NEG_INF)
    kk = min(k, exact.shape[1])
    vals, pos = jax.lax.top_k(exact, kk)
    idx = jnp.take_along_axis(rows, pos, axis=1)
    if k > kk:
        vals = jnp.pad(vals, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        idx = jnp.pad(idx, ((0, 0), (0, k - kk)))
    if m >= nbins:
        # every bin selected: all rows re-scored exactly
        return vals, idx, jnp.ones((B,), bool)
    if select == "approx":
        # approx selection can MISS a hot bin, so the out-of-net bound must be
        # computed from the actual non-selected maxima: a missed bin lands in
        # c_out and honestly fails the certificate. O(B*m*nbins) compare —
        # measured ~7ms of the 1M path's wall, which is why exact selection
        # (below) is now the default.
        col = jax.lax.broadcasted_iota(jnp.int32, binmax.shape, 1)
        chosen = (col[:, None, :] == bm_idx[:, :, None]).any(axis=1)
        c_out = jnp.max(jnp.where(chosen, NEG_INF, binmax), axis=1)
    else:
        # EXACT (flat or hier) selection: every non-selected bin max <= the
        # m-th selected value (by definition of top_k for flat; by the
        # two-case argument above for hier), so the bound is free — no
        # O(B*nbins) pass (negligibly looser than the true (m+1)-th max).
        c_out = bm_vals[:, m - 1]
    cert = (vals[:, kk - 1] > c_out + eps) | (c_out <= NEG_INF / 2)
    return vals, idx, cert


def dense_topk(q: jnp.ndarray, emb: jnp.ndarray, n_valid, k: int,
               prefer_pallas: bool | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend-dispatching entry point: Pallas on TPU, XLA elsewhere."""
    if prefer_pallas is None:
        prefer_pallas = jax.default_backend() not in ("cpu",)
    n_valid = jnp.asarray(n_valid, jnp.int32)
    if prefer_pallas and emb.shape[0] >= 1024 and emb.shape[0] % 1024 == 0:
        return dense_topk_pallas(q, emb, n_valid, k)
    return dense_topk_xla(q, emb, n_valid, k)
