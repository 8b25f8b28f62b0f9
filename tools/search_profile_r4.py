"""Stage-level wall profile of hybrid search at the 1M rung (round 4).

The r4 bench measures 19.4 ms/batch (B=512) at 1.07M nodes bf16, while the
top-k kernel sweep measured 5.4 ms standalone — this script attributes the
difference. Differential walls (20 reps - 4 reps, varied inputs, one final
host materialization) per ROUND3 notes; run SOLO on the TPU.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def wall(fn, reps_hi=20, reps_lo=4):
    import jax
    def run(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(i)
        out = jax.block_until_ready(out)
        # force one host materialization of a small slice
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf)[:1]
        return time.perf_counter() - t0
    run(2)  # warmup/compile
    hi = run(reps_hi)
    lo = run(reps_lo)
    return (hi - lo) / (reps_hi - reps_lo)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ahrag_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, ".")
    from bench import build_bench_arrays, bench_tensors
    import ml_dtypes

    from ahrag_tpu.graph.search import SearchWeights, hybrid_search_batch
    from ahrag_tpu.ops import topk as T

    n, B, k = 1048576, 512, 5
    print(f"[profile] building {n}-node graph...", flush=True)
    t0 = time.time()
    arrs = build_bench_arrays(n, max(8, n // 64))
    arrs.emb = arrs.emb.astype(ml_dtypes.bfloat16).astype(np.float32)
    gt = bench_tensors(arrs, "bfloat16")
    jax.block_until_ready(gt.emb)
    print(f"[profile] built in {time.time()-t0:.1f}s; children width "
          f"{gt.children.shape}", flush=True)

    rng = np.random.default_rng(0)
    qs = [jnp.asarray(rng.standard_normal((B, arrs.emb.shape[1]),
                                          dtype=np.float32))
          for _ in range(24)]
    w = SearchWeights.create()
    mask = gt.indexed & gt.valid
    res = {}

    def rep(name, fn):
        ms = wall(fn) * 1e3
        res[name] = round(ms, 3)
        print(f"[profile] {name}: {ms:.3f} ms", flush=True)

    rep("topk_cert_m16_raw", lambda i: T.refined_masked_topk_cert(
        qs[i % 24], gt.emb, mask, k, margin=16, flush_eps=1e-5))
    rep("topk_prod_certify_cond", lambda i: T.refined_masked_topk(
        qs[i % 24], gt.emb, mask, k, margin=16, flush_eps=1e-5))
    rep("topk_cert_m12_raw", lambda i: T.refined_masked_topk_cert(
        qs[i % 24], gt.emb, mask, k, margin=12, flush_eps=1e-5))
    rep("hybrid_full", lambda i: hybrid_search_batch(gt, qs[i % 24], w))

    # post-seed isolated: seeds precomputed once, vmapped stages only
    from ahrag_tpu.graph.search import _post_seed
    seeds = T.refined_masked_topk(qs[0], gt.emb, mask, k, margin=16,
                                  flush_eps=1e-5)
    seeds = jax.block_until_ready(seeds)
    # gt is a jit ARGUMENT (closing over it would bake the corpus into the
    # program as a constant and ship it through the remote compile)
    post = jax.jit(lambda g, ss, si, qq: jax.vmap(
        lambda a, b, c: _post_seed(g, a, b, w, k, 5, q_emb=c)
    )(ss, si, qq))
    rep("post_seed_only", lambda i: post(gt, seeds[0], seeds[1], qs[i % 24]))

    # post-seed without the member-similarity einsum (insertion-order members)
    post_nosim = jax.jit(lambda g, ss, si: jax.vmap(
        lambda a, b: _post_seed(g, a, b, w, k, 5, q_emb=None)
    )(ss, si))
    rep("post_seed_no_membersim",
        lambda i: post_nosim(gt, seeds[0], seeds[1]))

    out = {"n": n, "b": B, "k": k, "dtype": "bfloat16", "stages_ms": res}
    with open("reports/search_profile_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
