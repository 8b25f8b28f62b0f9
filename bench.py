#!/usr/bin/env python3
"""Benchmark ladder: hybrid-search throughput, device vs reference-style CPU baseline.

Builds synthetic hierarchical graphs at increasing scale (deterministic, no
LLM/network) and measures at each rung

- **baseline**: a pure-Python/NumPy per-query search loop with the exact reference
  semantics (seed top-k by full cosine scan + dict-based 1-hop expansion + Python
  rerank loop) — the computational shape of the reference's Chroma-query +
  NetworkX-expansion + Python-rerank path (hierarchical_graph.py:706-789), run
  sequentially per query as the reference does (sampled + extrapolated at scale);
- **device**: the jitted batched hybrid search over GraphTensors, with achieved
  TFLOP/s, HBM GB/s, and %-of-peak estimates from the analytic cost model.

Rank parity between the two paths is verified before timing at every rung (a
benchmark of a wrong answer is meaningless).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"};
the headline value is the LARGEST completed rung's qps and detail.ladder holds
every rung. Rungs are attempted in order while the time budget holds.

Env knobs: AHRAG_BENCH_LADDER ("2000,131072,1048576"), AHRAG_BENCH_QUERIES
(2048), AHRAG_BENCH_BUDGET_S (480), AHRAG_BENCH_ENTITIES (legacy: single-rung
override).
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np


def build_bench_graph(n_entities: int, n_topics: int):
    from ahrag_tpu.graph import HierarchicalGraph

    rng = np.random.default_rng(7)
    first = ["Ada", "Ben", "Cara", "Dan", "Eve", "Fay", "Gil", "Hana", "Ivan", "Joan",
             "Kent", "Lena", "Milo", "Nina", "Otto", "Pia", "Quin", "Rosa", "Sam",
             "Tara"]
    last = ["Archer", "Baker", "Carter", "Dalton", "Ellis", "Foster", "Gibson",
            "Harper", "Irwin", "Jensen", "Keller", "Lowell", "Mercer", "Norris",
            "Oakes", "Parker", "Quimby", "Ramsey", "Sutton", "Turner"]
    topics = ["quantum computing", "film directing", "marine biology", "jazz music",
              "mountain climbing", "renaissance art", "particle physics",
              "urban farming", "deep learning", "ancient history", "space travel",
              "culinary arts", "civil engineering", "sports medicine",
              "wildlife photography", "volcanology"]

    hg = HierarchicalGraph(encoder_name="hashed")
    topic_ids = list(range(n_topics))
    per_topic = {t: [] for t in topic_ids}
    for i in range(n_entities):
        t = i % n_topics
        topic = topics[t % len(topics)]
        name = f"{first[i % 20]} {last[(i // 20) % 20]} {i}"
        desc = (f"{name} is a specialist in {topic}, known for work number {i} "
                f"and collaboration {i % 97} in the field of {topic}")
        hg.add_entity(name, desc, "person")
        per_topic[t].append(name)
    for t in topic_ids:
        topic = topics[t % len(topics)]
        hg.add_summary(t, f"Experts in {topic}",
                       f"People working on {topic} and its applications",
                       confidence=5.0 + (t % 5), members=per_topic[t])
        if t % 3 == 0:
            hg.nodes[f"sum:{t}"]["judge_scores"] = {"overall": 6.0 + (t % 4)}
    for t in topic_ids:
        for name in per_topic[t]:
            hg.add_belongs_to(hg.find_entity(name), f"sum:{t}", prob=0.9)
    for t in topic_ids[:-1]:
        if t % 2 == 0:
            hg.add_related(f"sum:{t}", f"sum:{t + 1}", weight=0.4)
    # L2 communities
    n_l2 = max(1, n_topics // 8)
    for c in range(n_l2):
        members = [f"sum:{t}" for t in topic_ids if t % n_l2 == c]
        hg.add_summary(n_topics + c, f"Community {c}",
                       f"Broad community {c} of topics", confidence=7.0,
                       members=members, level=2)
        for m in members:
            hg.add_belongs_to(m, f"sum:{n_topics + c}", prob=1.0)
    hg.build_vector_index(layers=(0, 1, 2))
    return hg, topics


def cpu_reference_search(hg, emb_ids, emb_mat, q_vec, top_k=5, member_top_m=5):
    """Reference-shaped per-query search: full cosine scan + python expansion/rerank."""
    sims = emb_mat @ q_vec
    order = np.argsort(-sims, kind="stable")[:top_k]
    seeds = [(emb_ids[i], float(sims[i])) for i in order]
    expanded = {}
    for nid, sem in seeds:
        nt = hg.nodes[nid].get("node_type")
        expanded[nid] = sem
        if nt == "entity":
            for parent in hg.get_belongs_to(nid)[:2]:
                if parent not in expanded:
                    expanded[parent] = sem * 0.9
        elif nt == "summary":
            for child in hg.get_summary_members(nid)[:member_top_m]:
                if child not in expanded:
                    expanded[child] = sem * 0.85
    results = []
    for nid, sem in expanded.items():
        judge = hg.node_judge_overall(nid)
        conf = hg.node_confidence(nid)
        nt = hg.nodes[nid].get("node_type")
        judge_term = 1.0 / (1.0 + math.exp(-(judge / 10.0))) if judge is not None else 0.0
        conf_term = conf / 10.0 if conf is not None else 0.0
        boost = 1.0 if nt == "summary" else 0.0
        score = 0.6 * sem + 0.2 * judge_term + 0.1 * conf_term + 0.1 * boost
        results.append((nid, score))
    results.sort(key=lambda x: -x[1])
    return results[:top_k]


def _bench_cache_key(n_entities: int, n_topics: int) -> str:
    import hashlib
    import inspect

    return hashlib.sha1(
        (inspect.getsource(build_bench_graph)
         + f"|{n_entities}|{n_topics}").encode()).hexdigest()[:16]


def _bench_cache_exists(n_entities: int) -> bool:
    n_topics = max(8, n_entities // 64)
    return (n_entities >= 100000 and os.path.exists(
        f"/tmp/ahrag_bench_graph_{_bench_cache_key(n_entities, n_topics)}.pkl"))


def _cached_bench_graph(n_entities: int, n_topics: int):
    """Disk-cached build: the 1M-entity host-side construction costs minutes
    of pure-Python dict work that is NOT the benchmarked quantity (search qps
    is); the cache is keyed on the builder's source so any change to the graph
    shape invalidates it. Disable with AHRAG_BENCH_CACHE=0."""
    import pickle

    if os.environ.get("AHRAG_BENCH_CACHE", "1") != "1" or n_entities < 100000:
        return build_bench_graph(n_entities, n_topics)
    path = (f"/tmp/ahrag_bench_graph_"
            f"{_bench_cache_key(n_entities, n_topics)}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                return pickle.load(fh)
        except Exception:
            pass
    out = build_bench_graph(n_entities, n_topics)
    try:
        out[0].__dict__.pop("_compile_lock", None)  # lazily re-created
        with open(path + ".tmp", "wb") as fh:
            pickle.dump(out, fh, protocol=5)
        os.replace(path + ".tmp", path)
    except Exception:
        pass
    return out


def run_rung(n_entities: int, n_queries: int) -> dict:
    """Build + measure one ladder rung; returns the rung's metric dict."""
    import jax
    import jax.numpy as jnp

    from ahrag_tpu.graph.search import SearchWeights, hybrid_search_batch

    n_topics = max(8, n_entities // 64)
    t_build0 = time.perf_counter()
    hg, topics = _cached_bench_graph(n_entities, n_topics)
    gt = hg.tensors()
    build_s = time.perf_counter() - t_build0

    queries = [f"Who is the specialist in {topics[i % len(topics)]} number {i}?"
               for i in range(n_queries)]
    q_mat = hg.encode_query(queries)  # encoding cost excluded from both sides equally

    # CPU baseline data: flat id/embedding table like the reference's collection
    emb_ids = [nid for nid in hg.nodes if nid in hg._embeddings]
    emb_mat = np.stack([hg._embeddings[i] for i in emb_ids])

    w = SearchWeights.create()
    q_dev = jnp.asarray(q_mat)

    # parity check on a query subset before timing (full batch shape — avoids a
    # second remote compile for a probe-only batch size; doubles as the warmup)
    t_c0 = time.perf_counter()
    res = hybrid_search_batch(gt, q_dev, w, top_k=5, member_top_m=5)
    jax.block_until_ready(res)
    warm_s = time.perf_counter() - t_c0
    dev_ids = [[hg.idx_to_id(int(i)) for i, ok in zip(np.asarray(res.reranked_idx[b]),
                                                      np.asarray(res.reranked_valid[b]))
                if ok] for b in range(8)]
    mismatches = 0
    for b in range(8):
        ref = [nid for nid, _ in cpu_reference_search(hg, emb_ids, emb_mat, q_mat[b])]
        if ref != dev_ids[b]:
            mismatches += 1
    if mismatches:
        print(f"WARNING: rank parity mismatches on {mismatches}/8 probe queries "
              f"at n={n_entities}", file=sys.stderr)

    # --- CPU baseline timing (sequential per query, as the reference runs).
    # The full query set at 1M nodes would take tens of minutes at ~3 qps; a
    # 64-query sample bounds baseline wall-time and the per-query cost is
    # constant (one full scan + dict expansion each), so extrapolation is fair.
    sample = min(n_queries, max(64, 2048 * 2000 // max(n_entities, 1)))
    t0 = time.perf_counter()
    for b in range(sample):
        cpu_reference_search(hg, emb_ids, emb_mat, q_mat[b % q_mat.shape[0]])
    cpu_s = (time.perf_counter() - t0) / sample
    qps_cpu = 1.0 / cpu_s

    # --- device timing (batched, jitted; warmed up by the parity pass) ---
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = hybrid_search_batch(gt, q_dev, w, top_k=5, member_top_m=5)
    jax.block_until_ready(out)
    dev_s = (time.perf_counter() - t0) / reps
    qps_dev = n_queries / dev_s

    # analytic cost model of the dominant stage (seed scoring over the corpus):
    # flops = 2*B*N*D per batch; HBM = corpus stream N*D*4 bytes per batch.
    n_pad, d = int(gt.emb.shape[0]), int(gt.emb.shape[1])
    flops = 2.0 * n_queries * n_pad * d
    hbm_bytes = n_pad * d * gt.emb.dtype.itemsize
    tflops = flops / dev_s / 1e12
    gbps = hbm_bytes / dev_s / 1e9
    peak_tflops = 197.0 if jax.default_backend() == "tpu" else None  # v5e bf16

    return {
        "n_nodes": hg.number_of_nodes(),
        "n_pad": n_pad,
        "n_queries": n_queries,
        "qps": round(qps_dev, 2),
        "cpu_baseline_qps": round(qps_cpu, 2),
        "cpu_baseline_sampled_queries": sample,
        "vs_baseline": round(qps_dev / qps_cpu, 2),
        "parity_mismatches_of_8": mismatches,
        "batch_ms": round(dev_s * 1e3, 3),
        "achieved_tflops": round(tflops, 2),
        "achieved_hbm_gbps": round(gbps, 2),
        "mfu_pct_of_peak_bf16": (round(100 * tflops / peak_tflops, 2)
                                 if peak_tflops else None),
        "build_s": round(build_s, 1),
        "warmup_compile_s": round(warm_s, 1),
    }


def main() -> None:
    import jax

    # persistent compile cache: the remote-compile latency through the device
    # tunnel (~30-60s/shape) dominates wall time; cache across bench runs
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
        rungs = [int(x) for x in os.environ.get(
            "AHRAG_BENCH_LADDER", "2000,131072,1048576").split(",")]

    t_start = time.perf_counter()
    ladder = []
    for i, n_entities in enumerate(rungs):
        elapsed = time.perf_counter() - t_start
        # estimated rung cost: with a warm disk cache the build is a ~15s
        # pickle load + measurement; a cold large build is minutes of host
        # dict work (measured ~1.2ms/entity) — skip what the budget can't
        # finish and record it
        est = (120.0 if _bench_cache_exists(n_entities)
               else 60.0 + n_entities / 900.0)
        if ladder and elapsed + est > budget_s:
            ladder.append({"n_requested": n_entities, "skipped": True,
                           "reason": f"budget ({elapsed:.0f}s elapsed of "
                                     f"{budget_s:.0f}s; est {est:.0f}s)"})
            continue
        # [B, N_pad] f32 score intermediates cap the batch at scale: 2048
        # queries over a 1M-row corpus is an 8.6 GB buffer — beyond what the
        # search pipeline's working set leaves free on a 16 GB v5e
        rung_queries = n_queries if n_entities <= 262144 else min(n_queries, 512)
        ladder.append(run_rung(n_entities, rung_queries))

    done = [r for r in ladder if not r.get("skipped")]
    head = done[-1]
    print(json.dumps({
        "metric": "hybrid_search_qps",
        "value": head["qps"],
        "unit": "queries/sec",
        "vs_baseline": head["vs_baseline"],
        "detail": {
            "backend": jax.default_backend(),
            "headline_rung_nodes": head["n_nodes"],
            "ladder": ladder,
        },
    }))


if __name__ == "__main__":
    main()
