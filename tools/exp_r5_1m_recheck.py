#!/usr/bin/env python3
"""Re-check 1M seed timing + cert rate (round 5): was the 43.8ms seed_prod a
cert failure or tunnel interference? Measures each variant twice, interleaved."""
from __future__ import annotations

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
    p = jnp.ones((1024, 1024), jnp.float32)
    np.asarray(jnp.dot(p, p))
    print("[probe] ok", flush=True)

    from bench import build_bench_arrays, bench_tensors
    from ahrag_tpu.graph.search import SearchWeights, hybrid_search_batch
    from ahrag_tpu.ops.topk import refined_masked_topk, refined_masked_topk_cert
    import ml_dtypes

    n_entities, B, K = 1048576, 512, 5
    t0 = time.perf_counter()
    arrs = build_bench_arrays(n_entities, n_entities // 64)
    arrs.emb = arrs.emb.astype(ml_dtypes.bfloat16).astype(np.float32)
    gt = bench_tensors(arrs, "bfloat16")
    jax.block_until_ready(gt.emb)
    print(f"[build] {time.perf_counter()-t0:.1f}s", flush=True)

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

    # cert rate FIRST — is the fallback branch actually taken?
    _, _, cert = refined_masked_topk_cert(
        q_dev.astype(jnp.bfloat16), gt.emb, mask, K, margin=12,
        flush_eps=1e-5, mask_trivial=True)
    print(f"[cert] rate={float(np.asarray(cert).mean()):.4f}", flush=True)

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

    fns = {
        "seed_prod": lambda q: refined_masked_topk(
            q, gt.emb, mask, K, margin=12, flush_eps=1e-5, mask_trivial=True),
        "hybrid_full": lambda q: hybrid_search_batch(gt, q, w, top_k=K,
                                                     member_top_m=5),
    }
    for name, fn in fns.items():  # warm compile
        jax.block_until_ready(fn(q_vars[0]))
    for rep in range(3):
        for name, fn in fns.items():
            ms = diff_ms(fn)
            print(f"[measure rep{rep}] {name}: {ms:.3f} ms "
                  f"(qps {B/ms*1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
