#!/usr/bin/env python3
"""Benchmark ladder: hybrid-search throughput, device vs reference-style CPU baseline.

Builds synthetic hierarchical graphs at increasing scale (deterministic, no
LLM/network) and measures at each rung

- **baseline**: a pure-Python/NumPy per-query search loop with the exact reference
  semantics (seed top-k by full cosine scan + 1-hop expansion + Python rerank
  loop) — the computational shape of the reference's Chroma-query +
  NetworkX-expansion + Python-rerank path (hierarchical_graph.py:706-789), run
  sequentially per query as the reference does (sampled + extrapolated at scale);
- **device**: the jitted batched hybrid search over GraphTensors, with achieved
  TFLOP/s, HBM GB/s, and %-of-peak estimates from the analytic cost model.

Rank parity between the two paths is verified before timing at every rung, and a
64-query **certificate audit** cross-checks the certified top-k seeds against a
full-HIGHEST ground-truth matmul on the same device (a benchmark of a wrong
answer is meaningless).

The rung corpus is built DIRECTLY as arrays (clustered unit embeddings +
vectorized ELL adjacency -> build_graph_tensors): the benchmarked quantity is
search throughput, not host-side text featurization, and the former text-encode
build path cost minutes of cold-compile/dict work per rung (round-2 driver run:
457 s before first measurement). Structure matches the old text build: entities
clustered around L1 topics (64/topic), topic->L2 communities (8/community),
related chains, judge/confidence on a deterministic subset.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"};
the headline value is the LARGEST completed rung's qps and detail.ladder holds
every rung. Rungs are attempted in order while the time budget holds; a rung
failure is recorded and does not abort the ladder.

Corpus storage dtype is chosen PER RUNG: bfloat16 at >= 65536 nodes (the HBM
corpus stream is the throughput ceiling there and bf16 x bf16 products are
exact in f32 accumulation — results are exact w.r.t. the bf16-rounded corpus,
a storage-precision choice like any vector store's quantization), float32
below (tiny corpora gain nothing from bf16 and the f32 programs compile
faster cold). The CPU parity/baseline oracle scores the SAME bf16-rounded
values (rounded once on the host), so rank parity is checked against the
storage contract rather than misread near-ties as mismatches (the round-3
failure mode that kept the driver headline on f32, 2.6x under the
framework's own best path).

Env knobs: AHRAG_BENCH_LADDER ("2000,131072,1048576"), AHRAG_BENCH_QUERIES
(2048), AHRAG_BENCH_BUDGET_S (480), AHRAG_BENCH_ENTITIES (legacy: single-rung
override), AHRAG_EMB_DTYPE (float32|bfloat16: force one storage dtype for
every rung instead of the size-based default).
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np


class BenchArrays:
    """Raw per-node arrays shared by the device build and the CPU baseline."""

    def __init__(self, emb, node_type, level, judge, conf, parents_ell,
                 children_ell, related_ell, n_topics, n_l2):
        self.emb = emb                  # [N, D] f32 row-normalized
        self.node_type = node_type      # [N] i32 (0 entity, 1 summary)
        self.level = level              # [N] i32
        self.judge = judge              # [N] f64, NaN = none
        self.conf = conf                # [N] f64, NaN = none
        self.parents_ell = parents_ell  # [N, Kp] i32, -1 padded
        self.children_ell = children_ell
        self.related_ell = related_ell
        self.n_topics = n_topics
        self.n_l2 = n_l2

    @property
    def n(self):
        return self.emb.shape[0]


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)


def build_bench_arrays(n_entities: int, n_topics: int, d: int = 384,
                       seed: int = 7) -> BenchArrays:
    """Vectorized synthetic hierarchy: same shape as the former text-built bench
    graph (entities round-robin over topics, topics round-robin over L2
    communities, even-t related chain, judge on every 3rd topic), but the
    embeddings are clustered unit vectors instead of hashed text — the search
    path under test is identical either way."""
    rng = np.random.default_rng(seed)
    n_l2 = max(1, n_topics // 8)
    n_total = n_entities + n_topics + n_l2
    t0, t1 = n_entities, n_entities + n_topics   # topic/L2 index bases

    centers = _normalize(rng.standard_normal((n_topics, d),
                                             dtype=np.float32))
    ent_topic = (np.arange(n_entities) % n_topics).astype(np.int32)
    emb = np.empty((n_total, d), dtype=np.float32)
    # entity noise from two coprime pools instead of fresh Gaussians per row:
    # this host generates normals at only ~4M samples/s, which made the former
    # per-entity draw the 1M rung's dominant cost (~200 s); gathers run at
    # memory speed. 4096*4093 unique (a, b) combos >> 1M rows, so no two
    # entities share an embedding (exact score ties would stress parity).
    pool_a = rng.standard_normal((4096, d), dtype=np.float32)
    pool_b = rng.standard_normal((4093, d), dtype=np.float32)
    for s in range(0, n_entities, 262144):
        e = min(s + 262144, n_entities)
        idx = np.arange(s, e)
        noise = pool_a[idx % 4096] + pool_b[idx % 4093]
        emb[s:e] = _normalize(centers[ent_topic[s:e]] + 0.39 * noise)
    emb[t0:t1] = _normalize(
        centers + 0.15 * rng.standard_normal((n_topics, d), dtype=np.float32))
    l2_of_topic = (np.arange(n_topics) % n_l2).astype(np.int32)
    l2c = np.zeros((n_l2, d), dtype=np.float32)
    np.add.at(l2c, l2_of_topic, centers)
    emb[t1:] = _normalize(
        l2c + 0.2 * rng.standard_normal((n_l2, d), dtype=np.float32))

    node_type = np.zeros(n_total, np.int32)
    node_type[t0:] = 1                           # topics + L2 are summaries
    level = np.zeros(n_total, np.int32)
    level[t0:t1] = 1
    level[t1:] = 2

    tt = np.arange(n_topics)
    judge = np.full(n_total, np.nan)
    judge[t0:t1] = np.where(tt % 3 == 0, 6.0 + (tt % 4), np.nan)
    conf = np.full(n_total, np.nan)
    conf[t0:t1] = 5.0 + (tt % 5)
    conf[t1:] = 7.0

    # parents (belongs_to out): entity -> its topic; topic -> its L2 community
    parents = np.full((n_total, 1), -1, np.int32)
    parents[:t0, 0] = t0 + ent_topic
    parents[t0:t1, 0] = t1 + l2_of_topic

    # children (belongs_to in, insertion order = ascending member index)
    k_ent = -(-n_entities // n_topics)           # ceil: members per topic
    k_top = -(-n_topics // n_l2)                 # topics per L2 community
    kc = max(k_ent, k_top)
    children = np.full((n_total, kc), -1, np.int32)
    cand = tt[:, None] + n_topics * np.arange(k_ent)[None, :]
    children[t0:t1, :k_ent] = np.where(cand < n_entities, cand, -1)
    cc = np.arange(n_l2)
    candt = cc[:, None] + n_l2 * np.arange(k_top)[None, :]
    children[t1:, :k_top] = np.where(candt < n_topics, t0 + candt, -1)

    # related (union of both directions): even t < n_topics-1 links t <-> t+1
    related = np.full((n_total, 1), -1, np.int32)
    ev = tt[(tt % 2 == 0) & (tt < n_topics - 1)]
    related[t0 + ev, 0] = t0 + ev + 1
    related[t0 + ev + 1, 0] = t0 + ev

    return BenchArrays(emb, node_type, level, judge, conf, parents,
                       children, related, n_topics, n_l2)


def bench_tensors(arrs: BenchArrays, emb_dtype: str):
    from ahrag_tpu.graph.tensors import build_graph_tensors

    n = arrs.n
    empty = np.empty((0, 0), np.int32)
    n_edges = int((arrs.parents_ell >= 0).sum() + (arrs.related_ell >= 0).sum())
    return build_graph_tensors(
        emb_dtype=emb_dtype,
        embeddings=arrs.emb,
        node_types=arrs.node_type,
        levels=arrs.level,
        judges=arrs.judge,
        confs=arrs.conf,
        indexed=np.ones(n, bool),
        parents=arrs.parents_ell,
        children=arrs.children_ell,
        related=arrs.related_ell,
        hyperedges=empty,
        members=empty,
        n_edges=n_edges,
    )


def cpu_reference_search(arrs: BenchArrays, q_vec, top_k=5, member_top_m=5):
    """Reference-shaped per-query search: full cosine scan + python expansion +
    python rerank loop over each candidate (hierarchical_graph.py:706-789)."""
    sims = arrs.emb @ q_vec
    order = np.argsort(-sims, kind="stable")[:top_k]
    expanded = {}
    for i in order:
        i = int(i)
        sem = float(sims[i])
        expanded[i] = sem
        if arrs.node_type[i] == 0:
            for parent in [int(p) for p in arrs.parents_ell[i] if p >= 0][:2]:
                if parent not in expanded:
                    expanded[parent] = sem * 0.9
        else:
            from ahrag_tpu.graph.search import MEMBER_SIM_CAP
            children = [int(c) for c in arrs.children_ell[i][:MEMBER_SIM_CAP]
                        if c >= 0]
            if len(children) > member_top_m:
                # mirror search.py::expand_candidates' documented deviation:
                # big-fan summaries expand their m most query-similar
                # children (|sim|<1e-5 flushed; ties by slot; first
                # MEMBER_SIM_CAP children scanned), re-entered in
                # insertion order
                def _msim(c):
                    s = float(arrs.emb[c] @ q_vec)
                    return 0.0 if abs(s) < 1e-5 else s
                picked = sorted(range(len(children)),
                                key=lambda j: (-_msim(children[j]), j)
                                )[:member_top_m]
                children = [children[j] for j in sorted(picked)]
            for child in children:
                if child not in expanded:
                    expanded[child] = sem * 0.85
    results = []
    for i, sem in expanded.items():
        judge = arrs.judge[i]
        conf = arrs.conf[i]
        jt = 1.0 / (1.0 + math.exp(-(judge / 10.0))) if not math.isnan(judge) else 0.0
        ct = conf / 10.0 if not math.isnan(conf) else 0.0
        boost = 1.0 if arrs.node_type[i] == 1 else 0.0
        score = 0.6 * sem + 0.2 * jt + 0.1 * ct + 0.1 * boost
        results.append((i, score))
    results.sort(key=lambda x: -x[1])
    return results[:top_k]


def certificate_audit(gt, q_dev, res, n_audit=64, k=5):
    """On-device exactness audit: the certified search path's seeds vs a full
    f32-HIGHEST ground truth over the same (storage-dtype) corpus (VERDICT r2
    item 8 — a standing empirical check at every scale the ladder measures,
    not just CPU property tests).

    Reuses the seeds the ALREADY-COMPILED batched search produced
    (``res.seed_idx`` is ``refined_masked_topk``'s output) so the audit adds
    exactly one small eager ground-truth matmul per rung — a separate jitted
    audit batch cost 1-2 extra remote compiles per rung, which on slow-compile
    days pushed the ladder past the driver's budget."""
    import jax
    import jax.numpy as jnp

    from ahrag_tpu.ops.topk import _full_highest_topk

    qa = q_dev[:n_audit]
    mask = gt.indexed & gt.valid
    qx = qa.astype(gt.emb.dtype) if gt.emb.dtype == jnp.bfloat16 else qa
    gvals, gidx = _full_highest_topk(qx, gt.emb, mask, k)
    idx = res.seed_idx[:n_audit]
    vals = res.seed_sim[:n_audit]
    idx, gidx, vals, gvals = jax.device_get((idx, gidx, vals, gvals))
    # exactness means identical rankings up to equal-score ties: orderings of
    # tied scores may differ between kernels, so a position mismatch only
    # counts when the score multisets differ too
    mism = 0
    for b in range(idx.shape[0]):
        if list(idx[b]) != list(gidx[b]) and not np.allclose(
                vals[b], gvals[b], rtol=0, atol=1e-6):
            mism += 1
    return {"audited_queries": int(idx.shape[0]),
            "audit_mismatches": int(mism)}


def run_rung(n_entities: int, n_queries: int, emb_dtype: str) -> dict:
    """Build + measure one ladder rung; returns the rung's metric dict."""
    import jax
    import jax.numpy as jnp

    from ahrag_tpu.graph.search import SearchWeights, hybrid_search_batch

    n_topics = max(8, n_entities // 64)
    t_build0 = time.perf_counter()
    arrs = build_bench_arrays(n_entities, n_topics)
    if emb_dtype == "bfloat16":
        # Round the host copy to the storage precision ONCE: the CPU oracle
        # and the device then score bitwise-identical operand values (bf16
        # products are exact in f32 accumulation), so rank parity checks the
        # storage contract — only ~1e-7 accumulation-order noise remains,
        # orders of magnitude under this corpus's top-k boundary gaps.
        import ml_dtypes
        arrs.emb = arrs.emb.astype(ml_dtypes.bfloat16).astype(np.float32)
    gt = bench_tensors(arrs, emb_dtype)
    jax.block_until_ready(gt.emb)
    build_s = time.perf_counter() - t_build0
    print(f"[bench] rung {n_entities}: build {build_s:.1f}s", file=sys.stderr,
          flush=True)

    # queries: unit vectors near a cycling topic center (the old text queries
    # targeted "the specialist in <topic>"; same geometry, no encoder)
    rng = np.random.default_rng(11)
    q_topics = np.arange(n_queries) % n_topics
    q_mat = _normalize(
        arrs.emb[n_entities + q_topics]
        + 0.35 * rng.standard_normal((n_queries, arrs.emb.shape[1]),
                                     dtype=np.float32))
    if emb_dtype == "bfloat16":
        # the device path rounds q to bf16 once (ops/topk.py bf16 contract);
        # pre-round on the host so the oracle scores the same query values
        import ml_dtypes
        q_mat = q_mat.astype(ml_dtypes.bfloat16).astype(np.float32)

    w = SearchWeights.create()
    q_dev = jnp.asarray(q_mat)

    # parity check on a query subset before timing (full batch shape — avoids a
    # second remote compile for a probe-only batch size; doubles as the warmup)
    t_c0 = time.perf_counter()
    res = hybrid_search_batch(gt, q_dev, w, top_k=5, member_top_m=5)
    jax.block_until_ready(res)
    warm_s = time.perf_counter() - t_c0
    dev_ids = [[int(i) for i, ok in zip(np.asarray(res.reranked_idx[b]),
                                        np.asarray(res.reranked_valid[b]))
                if ok] for b in range(8)]
    mismatches = 0
    for b in range(8):
        ref = [i for i, _ in cpu_reference_search(arrs, q_mat[b])]
        if ref != dev_ids[b]:
            mismatches += 1
    if mismatches:
        print(f"WARNING: rank parity mismatches on {mismatches}/8 probe queries "
              f"at n={n_entities}", file=sys.stderr)

    print(f"[bench] rung {n_entities}: warmup+parity done ({warm_s:.1f}s "
          f"compile, {mismatches}/8 mismatches)", file=sys.stderr, flush=True)
    t_a0 = time.perf_counter()
    audit = certificate_audit(gt, q_dev, res)
    print(f"[bench] rung {n_entities}: cert audit {time.perf_counter()-t_a0:.1f}s "
          f"({audit['audit_mismatches']} mismatches)", file=sys.stderr,
          flush=True)

    # --- CPU baseline timing (sequential per query, as the reference runs).
    # The full query set at 1M nodes would take tens of minutes at ~3 qps; a
    # 64-query sample bounds baseline wall-time and the per-query cost is
    # constant (one full scan + expansion each), so extrapolation is fair.
    sample = min(n_queries, max(64, 2048 * 2000 // max(n_entities, 1)))
    t0 = time.perf_counter()
    for b in range(sample):
        cpu_reference_search(arrs, q_mat[b % q_mat.shape[0]])
    cpu_s = (time.perf_counter() - t0) / sample
    qps_cpu = 1.0 / cpu_s
    print(f"[bench] rung {n_entities}: cpu baseline {sample}q in "
          f"{sample * cpu_s:.1f}s", file=sys.stderr, flush=True)

    # --- device timing (batched, jitted; warmed up by the parity pass).
    # Differential wall (hi-reps minus lo-reps, one final block +
    # materialization each) cancels the tunnel RTT that a plain
    # blocked-loop average folds into every batch (~6 ms/batch observed at
    # reps=5 — a 40% haircut on the 1M rung); inputs VARY per rep (device-
    # side rolls of the query matrix) so no dispatch can be elided.
    q_variants = [q_dev] + [jnp.roll(q_dev, 1 + 7 * v, axis=0)
                            for v in range(3)]
    jax.block_until_ready(q_variants)

    def _run(reps: int) -> float:
        t0 = time.perf_counter()
        out = None
        for r in range(reps):
            out = hybrid_search_batch(gt, q_variants[r % len(q_variants)], w,
                                      top_k=5, member_top_m=5)
        jax.block_until_ready(out)
        np.asarray(out.reranked_idx[:1])
        return time.perf_counter() - t0

    reps_hi, reps_lo = 14, 2
    dev_s = (_run(reps_hi) - _run(reps_lo)) / (reps_hi - reps_lo)
    qps_dev = n_queries / dev_s

    # analytic cost model of the dominant stage (seed scoring over the corpus):
    # flops = 2*B*N*D per batch; HBM = corpus stream N*D*itemsize per batch.
    n_pad, d = int(gt.emb.shape[0]), int(gt.emb.shape[1])
    flops = 2.0 * n_queries * n_pad * d
    hbm_bytes = n_pad * d * gt.emb.dtype.itemsize
    tflops = flops / dev_s / 1e12
    gbps = hbm_bytes / dev_s / 1e9
    peak_tflops = 197.0 if jax.default_backend() == "tpu" else None  # v5e bf16

    return {
        "n_nodes": arrs.n,
        "n_pad": n_pad,
        "n_queries": n_queries,
        "qps": round(qps_dev, 2),
        "cpu_baseline_qps": round(qps_cpu, 2),
        "cpu_baseline_sampled_queries": sample,
        "vs_baseline": round(qps_dev / qps_cpu, 2),
        "parity_mismatches_of_8": mismatches,
        "cert_audit": audit,
        "batch_ms": round(dev_s * 1e3, 3),
        "achieved_tflops": round(tflops, 2),
        "achieved_hbm_gbps": round(gbps, 2),
        "mfu_pct_of_peak_bf16": (round(100 * tflops / peak_tflops, 2)
                                 if peak_tflops else None),
        "emb_dtype": str(gt.emb.dtype),
        "build_s": round(build_s, 1),
        "warmup_compile_s": round(warm_s, 1),
    }


def main() -> None:
    import jax

    # persistent compile cache: the remote-compile latency through the device
    # tunnel (~5-60s/shape) dominates cold wall time; cache across bench runs
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("AHRAG_COMPILE_CACHE",
                                         "/tmp/ahrag_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags

    n_queries = int(os.environ.get("AHRAG_BENCH_QUERIES", 2048))
    budget_s = float(os.environ.get("AHRAG_BENCH_BUDGET_S", 480))
    if "AHRAG_BENCH_ENTITIES" in os.environ:  # legacy single-rung override
        rungs = [int(os.environ["AHRAG_BENCH_ENTITIES"])]
    else:
        # 1M runs SECOND, right after the tiny warmup rung: remote-compile
        # latency through the tunnel varies run to run, and the headline rung
        # must not be the one the budget gate sacrifices
        rungs = [int(x) for x in os.environ.get(
            "AHRAG_BENCH_LADDER", "2000,1048576,131072").split(",")]

    # device-ready probe BEFORE the budget clock starts: the remote slot
    # behind the tunnel can queue a new process for many minutes at
    # interpreter/device init (observed 5-35 min on contended days) — that
    # wait is environmental, not compute, and must not trick the budget gate
    # into skipping the large rungs. init_s is recorded for honesty.
    import jax.numpy as jnp
    t_init = time.perf_counter()
    device_error = None
    try:
        probe = jnp.ones((8, 8), jnp.float32)
        np.asarray(jnp.dot(probe, probe))
    except RuntimeError as e:  # remote backend rejected init (observed:
        # 'Unable to initialize backend axon: UNAVAILABLE' after a 50-min
        # queue) — fall back to CPU and say so in the artifact rather than
        # dying with no JSON at all
        device_error = f"{type(e).__name__}: {e}"
        jax.config.update("jax_platforms", "cpu")
        probe = jnp.ones((8, 8), jnp.float32)
        np.asarray(jnp.dot(probe, probe))
        # CPU fallback: the corpus-scale rungs are TPU-sized (a 1M-row flat
        # matmul rung ran 411 s/batch on this host — observed on an
        # UNAVAILABLE-backend day) and would blow any external timeout while
        # proving nothing about the device path. Shrink to CPU-sized rungs so
        # the run still emits a complete, honest JSON quickly.
        rungs = [n for n in rungs if n <= 8192] or [2000]
    init_s = time.perf_counter() - t_init

    t_start = time.perf_counter()
    ladder = []
    for n_entities in rungs:
        elapsed = time.perf_counter() - t_start
        # estimated rung cost: array build is seconds of NumPy; the dominant
        # cold costs are 1-2 remote compiles (tens of seconds each, variable)
        # plus the corpus transfer and the sampled CPU baseline
        est = 40.0 + n_entities / 12000.0
        if ladder and elapsed + est > budget_s:
            ladder.append({"n_requested": n_entities, "skipped": True,
                           "reason": f"budget ({elapsed:.0f}s elapsed of "
                                     f"{budget_s:.0f}s; est {est:.0f}s)"})
            continue
        # [B, N_pad] f32 score intermediates cap the batch at scale: 2048
        # queries over a 1M-row corpus is an 8.6 GB buffer — beyond what the
        # search pipeline's working set leaves free on a 16 GB v5e
        rung_queries = n_queries if n_entities <= 262144 else min(n_queries, 512)
        # storage dtype per rung: bf16 where the corpus stream dominates (the
        # round-3 failure modes are both addressed — the oracle scores the
        # bf16-rounded host copy, and the 2k rung stays f32 so the ladder's
        # cold-compile count doesn't grow where bf16 buys nothing)
        emb_dtype = os.environ.get(
            "AHRAG_EMB_DTYPE",
            "bfloat16" if (n_entities >= 65536 and device_error is None)
            else "float32")
        try:
            ladder.append(run_rung(n_entities, rung_queries, emb_dtype))
        except Exception as e:  # a rung failure must not discard the ladder
            ladder.append({"n_requested": n_entities, "error": f"{type(e).__name__}: {e}"})

    done = [r for r in ladder if "qps" in r]
    if not done:
        print(json.dumps({"metric": "hybrid_search_qps", "value": 0.0,
                          "unit": "queries/sec", "vs_baseline": 0.0,
                          "detail": {"backend": jax.default_backend(),
                                     "ladder": ladder}}))
        sys.exit(1)
    head = max(done, key=lambda r: r["n_nodes"])  # largest completed rung
    print(json.dumps({
        "metric": "hybrid_search_qps",
        "value": head["qps"],
        "unit": "queries/sec",
        "vs_baseline": head["vs_baseline"],
        "detail": {
            "backend": jax.default_backend(),
            "device_init_s": round(init_s, 1),
            **({"device_error": device_error} if device_error else {}),
            "headline_rung_nodes": head["n_nodes"],
            "ladder": ladder,
        },
    }))


if __name__ == "__main__":
    main()
