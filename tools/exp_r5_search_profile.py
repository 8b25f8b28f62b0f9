#!/usr/bin/env python3
"""Round-5 TPU profile: seed-kernel v2 + packed member tables at 1M nodes.

Measures (differential walls, varied inputs) the production hybrid search and
its stages after the round-5 changes, writing reports/search_profile_r5.json.
Run ONLY on the real chip, strictly serially (CLAUDE.md TPU discipline).
"""
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print("[probe] device:", jax.devices(), flush=True)
    p = jnp.ones((1024, 1024), jnp.float32)
    t0 = time.perf_counter()
    np.asarray(jnp.dot(p, p))
    print(f"[probe] matmul ok in {time.perf_counter()-t0:.1f}s", flush=True)

    from bench import build_bench_arrays, bench_tensors
    from ahrag_tpu.graph.search import SearchWeights, hybrid_search_batch
    from ahrag_tpu.ops.topk import binned_refined_topk, refined_masked_topk
    import ml_dtypes

    n_entities, B, K = 1048576, 512, 5
    t0 = time.perf_counter()
    arrs = build_bench_arrays(n_entities, n_entities // 64)
    arrs.emb = arrs.emb.astype(ml_dtypes.bfloat16).astype(np.float32)
    gt = bench_tensors(arrs, "bfloat16")
    jax.block_until_ready(gt.emb)
    print(f"[build] packed gt in {time.perf_counter()-t0:.1f}s "
          f"(pack={'yes' if gt.child_pack_emb is not None else 'no'}, "
          f"mask_trivial={gt.mask_trivial})", flush=True)

    rng = np.random.default_rng(11)
    qs = arrs.emb[n_entities + (np.arange(B) % (n_entities // 64))]
    q_mat = qs + 0.35 * rng.standard_normal((B, arrs.emb.shape[1]), np.float32)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_mat = q_mat.astype(ml_dtypes.bfloat16).astype(np.float32)
    q_dev = jnp.asarray(q_mat)
    q_vars = [q_dev] + [jnp.roll(q_dev, 1 + 7 * v, axis=0) for v in range(3)]
    jax.block_until_ready(q_vars)
    w = SearchWeights.create()
    mask = gt.indexed & gt.valid

    def diff_ms(fn, hi=14, lo=2):
        def wall(reps):
            t0 = time.perf_counter()
            out = None
            for r in range(reps):
                out = fn(q_vars[r % len(q_vars)])
            jax.block_until_ready(out)
            np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
            return time.perf_counter() - t0
        return (wall(hi) - wall(lo)) / (hi - lo) * 1e3

    results = {"n": int(gt.emb.shape[0]), "b": B, "k": K, "dtype": "bfloat16",
               "stages_ms": {}}

    def run(name, fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(q_vars[0]))
        compile_s = time.perf_counter() - t0
        ms = diff_ms(fn)
        results["stages_ms"][name] = round(ms, 3)
        print(f"[measure] {name}: {ms:.3f} ms (compile {compile_s:.1f}s, "
              f"qps {B/ms*1e3:.0f})", flush=True)

    # E1: production full hybrid search (new kernel + pack)
    run("hybrid_full", lambda q: hybrid_search_batch(gt, q, w, top_k=K,
                                                     member_top_m=5))
    # E2: production seed stage exactly as called (certify cond included)
    run("seed_prod", lambda q: refined_masked_topk(
        q, gt.emb, mask, K, margin=12, flush_eps=1e-5,
        mask_trivial=gt.mask_trivial))
    # E3: raw binned hier v2 t1024 m12 trivial
    run("binned_v2_t1024_m12", lambda q: binned_refined_topk(
        q.astype(jnp.bfloat16), gt.emb, mask, K, margin=12, tile_n=1024,
        select="hier", mask_trivial=True))
    # E4: t2048 variant
    run("binned_v2_t2048_m12", lambda q: binned_refined_topk(
        q.astype(jnp.bfloat16), gt.emb, mask, K, margin=12, tile_n=2048,
        select="hier", mask_trivial=True))
    # E5: non-trivial mask (old in-kernel masking) for the kernel-tax delta
    run("binned_v2_t1024_m12_masked", lambda q: binned_refined_topk(
        q.astype(jnp.bfloat16), gt.emb, mask, K, margin=12, tile_n=1024,
        select="hier", mask_trivial=False))

    # parity spot-check of the full path vs the CPU oracle (8 queries)
    from bench import cpu_reference_search
    res = hybrid_search_batch(gt, q_dev, w, top_k=K, member_top_m=5)
    mism = 0
    for b in range(8):
        dev_ids = [int(i) for i, ok in zip(np.asarray(res.reranked_idx[b]),
                                           np.asarray(res.reranked_valid[b]))
                   if ok]
        ref = [i for i, _ in cpu_reference_search(arrs, q_mat[b])]
        mism += dev_ids != ref
    results["parity_mismatches_of_8"] = mism
    print(f"[parity] {mism}/8 mismatches", flush=True)

    # E6: unpacked graph (old member gather) — pack gain quantified
    os.environ["AHRAG_PACK_CHILDREN"] = "0"
    gt2 = bench_tensors(arrs, "bfloat16")
    jax.block_until_ready(gt2.emb)
    assert gt2.child_pack_emb is None
    run("hybrid_full_nopack", lambda q: hybrid_search_batch(
        gt2, q, w, top_k=K, member_top_m=5))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reports", "search_profile_r5.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
