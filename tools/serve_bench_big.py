"""Serving latency at corpus scale (131k / 1M nodes) through the REAL service
stack: text query -> hashed encode -> fused encode+search dispatch ->
micro-batched device search -> result assembly.

VERDICT r2 item 7: the serving artifact needs the 1M-node point, proving
latency stays ~flat as the corpus grows (it lives on-chip; only the seed scan
scales). Building a 1M-node HOST graph through add_entity would take minutes
of dict work that serving never touches, so this harness builds the device
tensors directly (bench.py's array builder) and shims the few host-side
lookups the service needs (node-id table + lazy node dicts for result
assembly). The device path — what's being measured — is byte-identical to
production serving.

Run (TPU, solo): python tools/serve_bench_big.py --nodes 1048576 --out
reports/serving_1m_tpu_r3.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


class _LazyNodes(dict):
    """node_id -> minimal node dict, materialized on first access (result
    assembly touches only the handful of returned ids per query)."""

    def __init__(self, n_entities, n_topics):
        super().__init__()
        self._n_entities = n_entities
        self._n_topics = n_topics

    def _make(self, key):
        i = int(key[1:])
        if i < self._n_entities:
            return {"node_type": "entity", "name": f"Node {i}",
                    "description": f"synthetic entity {i}"}
        if i < self._n_entities + self._n_topics:
            return {"node_type": "summary", "level": 1,
                    "title": f"Topic {i - self._n_entities}",
                    "summary_text": "synthetic topic"}
        return {"node_type": "summary", "level": 2,
                "title": f"Community {i}", "summary_text": "synthetic community"}

    def __missing__(self, key):
        d = self._make(key)
        self[key] = d
        return d

    def get(self, key, default=None):
        try:
            return self[key]
        except Exception:
            return default


def build_service(n_nodes: int, max_batch: int = 512,
                  max_wait_ms: float = 3.0):
    import jax

    import bench
    from ahrag_tpu.graph import HierarchicalGraph
    from ahrag_tpu.serve import RetrievalService

    n_topics = max(8, n_nodes // 64)
    arrs = bench.build_bench_arrays(n_nodes, n_topics)
    # bf16 storage at corpus scale — the serving path inherits the bench
    # ladder's storage contract (see bench.py module docstring)
    emb_dtype = "bfloat16" if n_nodes >= 65536 else "float32"
    gt = bench.bench_tensors(arrs, emb_dtype)
    jax.block_until_ready(gt.emb)

    hg = HierarchicalGraph(encoder_name="hashed")
    hg.nodes = _LazyNodes(n_nodes, n_topics)
    hg._tensors = gt
    hg._idx_to_id = [f"n{i}" for i in range(arrs.n)]
    hg._id_to_idx = {}          # only idx->id is needed on the serve path
    hg._embeddings = {"n0": arrs.emb[0]}   # non-empty: skip (re)index
    hg.dirty = False
    hg.vector_index["indexed_nodes"] = arrs.n
    return RetrievalService(hg=hg, max_batch=max_batch,
                            max_wait_s=max_wait_ms / 1e3)


def run_load(service, n_requests: int, threads: int):
    import threading

    queries = [f"specialist in synthetic topic number {i}" for i in range(64)]
    lat: list = []
    lock = threading.Lock()
    err = [0]

    def worker(k):
        for i in range(n_requests):
            q = queries[(k * n_requests + i) % len(queries)]
            t0 = time.perf_counter()
            try:
                service.search(q)
            except Exception:
                with lock:
                    err[0] += 1
                continue
            with lock:
                lat.append(time.perf_counter() - t0)

    ts = [threading.Thread(target=worker, args=(k,)) for k in range(threads)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    pct = lambda p: round(lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3, 2)
    return {"threads": threads, "requests": len(lat), "errors": err[0],
            "wall_s": round(wall, 2),
            "qps": round(len(lat) / wall, 1),
            "p50_ms": pct(0.50), "p95_ms": pct(0.95), "p99_ms": pct(0.99),
            "max_ms": round(lat[-1] * 1e3, 2) if lat else None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1048576)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--max-batch", type=int, default=512)
    ap.add_argument("--max-wait-ms", type=float, default=3.0)
    ap.add_argument("--threads", default="1,32,256",
                    help="comma-separated closed-loop caller counts")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("AHRAG_COMPILE_CACHE",
                                         "/tmp/ahrag_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    t0 = time.perf_counter()
    service = build_service(args.nodes, max_batch=args.max_batch,
                            max_wait_ms=args.max_wait_ms)
    build_s = time.perf_counter() - t0
    print(f"service up: {args.nodes} nodes in {build_s:.1f}s", flush=True)

    thread_counts = [int(x) for x in args.threads.split(",")]
    # warm every batch bucket the sweep can hit (compiles labeled separately
    # in server_timers as search_batch_warmup): the coalesced batch size is
    # bounded by min(threads, max_batch), and stragglers land in any smaller
    # bucket.
    top = min(max(thread_counts), args.max_batch)
    buckets = {service._bucket(x) for x in (1, 4, 16, 64, 256, top)
               if x <= max(top, 64)}
    for size in sorted(buckets):
        service.search_many(["warm"] * size)
    sweeps = []
    for threads in thread_counts:
        r = run_load(service, args.requests, threads)
        print(json.dumps(r), flush=True)
        sweeps.append(r)
    report = {"n_nodes": args.nodes, "backend": jax.default_backend(),
              "host_cpus": os.cpu_count(),
              "build_s": round(build_s, 1), "sweeps": sweeps,
              "server_timers": service.stats()["timers"],
              "batcher": service.stats()["batcher"]}
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            json.dump(report, fh, indent=2)
    service.close()


if __name__ == "__main__":
    main()
