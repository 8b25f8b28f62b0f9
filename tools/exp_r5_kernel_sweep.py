#!/usr/bin/env python3
"""Round-5 kernel sweep at 1M: isolate the binmax2 kernel cost and test
B/tile variants toward the >=80k qps bar. Writes reports/kernel_sweep_r5.json."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ahrag_jax_cache")
    print("[probe] device:", jax.devices(), flush=True)
    np.asarray(jnp.dot(jnp.ones((1024, 1024)), jnp.ones((1024, 1024))))
    print("[probe] ok", flush=True)

    from bench import build_bench_arrays, bench_tensors
    from ahrag_tpu.graph.search import SearchWeights, hybrid_search_batch
    from ahrag_tpu.ops.topk import (binned_refined_topk, dense_binmax2_pallas,
                                    refined_masked_topk)
    import ml_dtypes

    n_entities = 1048576
    t0 = time.perf_counter()
    arrs = build_bench_arrays(n_entities, n_entities // 64)
    arrs.emb = arrs.emb.astype(ml_dtypes.bfloat16).astype(np.float32)
    gt = bench_tensors(arrs, "bfloat16")
    jax.block_until_ready(gt.emb)
    print(f"[build] {time.perf_counter()-t0:.1f}s", flush=True)
    mask = gt.indexed & gt.valid
    w = SearchWeights.create()

    rng = np.random.default_rng(11)
    qs = arrs.emb[n_entities + (np.arange(1024) % (n_entities // 64))]
    q_mat = qs + 0.35 * rng.standard_normal((1024, arrs.emb.shape[1]),
                                            np.float32)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_mat = q_mat.astype(ml_dtypes.bfloat16).astype(np.float32)
    q1024 = jnp.asarray(q_mat)
    qv = {512: [q1024[:512]] + [jnp.roll(q1024[:512], 1 + 7 * v, axis=0)
                                for v in range(3)],
          1024: [q1024] + [jnp.roll(q1024, 1 + 7 * v, axis=0)
                           for v in range(3)]}
    jax.block_until_ready(qv[1024])

    results = {}

    def diff_ms(fn, B, hi=12, lo=2):
        vs = qv[B]

        def wall(reps):
            t0 = time.perf_counter()
            out = None
            for r in range(reps):
                out = fn(vs[r % len(vs)])
            jax.block_until_ready(out)
            np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
            return time.perf_counter() - t0
        return (wall(hi) - wall(lo)) / (hi - lo) * 1e3

    def run(name, B, fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(qv[B][0]))
        c = time.perf_counter() - t0
        ms = diff_ms(fn, B)
        results[name] = round(ms, 3)
        print(f"[measure] {name}: {ms:.3f} ms (compile {c:.1f}s, "
              f"qps {B/ms*1e3:.0f})", flush=True)

    bq = lambda q: q.astype(jnp.bfloat16)
    # kernel only, B/tile variants
    for B in (512, 1024):
        for tn in (1024, 2048):
            run(f"kernel_b{B}_t{tn}", B,
                lambda q, tn=tn: dense_binmax2_pallas(
                    bq(q), gt.emb, jnp.int32(gt.n_pad), mask, tile_n=tn,
                    trivial=True))
    # full binned select path
    for B in (512, 1024):
        run(f"binned_b{B}_t1024", B,
            lambda q: binned_refined_topk(bq(q), gt.emb, mask, 5, margin=12,
                                          tile_n=1024, select="hier",
                                          mask_trivial=True,
                                          emb_binpack=gt.emb_binpack))
    # production full hybrid at both batch sizes
    for B in (512, 1024):
        run(f"hybrid_b{B}", B,
            lambda q: hybrid_search_batch(gt, q, w, top_k=5, member_top_m=5))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reports", "kernel_sweep_r5.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
