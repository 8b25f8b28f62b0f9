#!/usr/bin/env python3
"""Round-5 headline lever experiment: batch size x storage dtype at 1M nodes.

The 1M seed stage streams the whole corpus from HBM per batch; doubling the
query batch amortizes that stream over 2x queries, so if the stage is
HBM-bound, qps should nearly double from B=512 -> B=1024. Measures the FULL
production hybrid_search_batch (not the bare kernel) at B in {512,1024,2048}
on bf16 storage and B in {512,1024} on f32 storage, plus a parity probe and
cert audit at the candidate headline shape (bf16 B=1024).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    jax.config.update("jax_compilation_cache_dir", "/tmp/ahrag_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("[probe] device:", jax.devices(), flush=True)
    p = jnp.ones((1024, 1024), jnp.float32)
    np.asarray(jnp.dot(p, p))
    print("[probe] ok", flush=True)

    from bench import build_bench_arrays, bench_tensors, cpu_reference_search
    from ahrag_tpu.graph.search import SearchWeights, hybrid_search_batch

    n_entities, K = 1048576, 5
    t0 = time.perf_counter()
    arrs = build_bench_arrays(n_entities, n_entities // 64)
    arrs.emb = arrs.emb.astype(ml_dtypes.bfloat16).astype(np.float32)
    print(f"[build arrays] {time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(11)
    Bmax = 2048
    q_topics = np.arange(Bmax) % (n_entities // 64)
    q_mat = arrs.emb[n_entities + q_topics] + 0.35 * rng.standard_normal(
        (Bmax, arrs.emb.shape[1]), np.float32)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_mat = q_mat.astype(ml_dtypes.bfloat16).astype(np.float32)
    w = SearchWeights.create()

    def diff_ms(fn, qv, hi=14, lo=2):
        def wall(reps):
            t0 = time.perf_counter()
            out = None
            for r in range(reps):
                out = fn(qv[r % len(qv)])
            jax.block_until_ready(out)
            np.asarray(out.reranked_idx[:1])
            return time.perf_counter() - t0
        return (wall(hi) - wall(lo)) / (hi - lo) * 1e3

    results = {}
    for dtype, batches in (("bfloat16", (512, 1024, 2048)),
                           ("float32", (512, 1024))):
        t0 = time.perf_counter()
        gt = bench_tensors(arrs, dtype)
        jax.block_until_ready(gt.emb)
        print(f"[tensors {dtype}] {time.perf_counter()-t0:.1f}s", flush=True)
        for B in batches:
            q_dev = jnp.asarray(q_mat[:B])
            qv = [q_dev] + [jnp.roll(q_dev, 1 + 7 * v, axis=0)
                            for v in range(3)]
            jax.block_until_ready(qv)
            fn = lambda q: hybrid_search_batch(gt, q, w, top_k=K,
                                               member_top_m=5)
            t0 = time.perf_counter()
            res = fn(q_dev)
            jax.block_until_ready(res)
            print(f"[compile {dtype} B={B}] {time.perf_counter()-t0:.1f}s",
                  flush=True)
            if dtype == "bfloat16" and B == 1024:
                mism = 0
                for b in range(8):
                    dev = [int(i) for i, ok in
                           zip(np.asarray(res.reranked_idx[b]),
                               np.asarray(res.reranked_valid[b])) if ok]
                    ref = [i for i, _ in cpu_reference_search(arrs, q_mat[b])]
                    mism += dev != ref
                print(f"[parity bf16 B=1024] {mism}/8 mismatches", flush=True)
            for rep in range(2):
                ms = diff_ms(fn, qv)
                key = f"{dtype[:4]}_b{B}"
                results.setdefault(key, []).append(round(ms, 3))
                print(f"[measure rep{rep}] {key}: {ms:.3f} ms "
                      f"(qps {B/ms*1e3:.0f})", flush=True)
        del gt

    import json
    with open("reports/batch_sweep_r5.json", "w") as f:
        json.dump({"n": n_entities, "k": K, "ms_by_shape": results}, f,
                  indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
