#!/usr/bin/env python3
"""Round-5 kernel isolation: where did bf16 6.85ms go vs r4's direct 5.4ms,
and why is f32 production at 21ms (r4 BENCH: 10.1ms)?

Isolates one delta per variant at 1M x 384, B=512:
  bf16: r4 config (t1024 m12, no pack, no trivial) -> +trivial -> +binpack
        -> production wrapper
  f32:  production margin (m42) vs narrow (m12), pack on/off, trivial on
        (f32 coarse runs HIGHEST in-kernel, eps ~1e-6 -> narrow net may
        certify; if cert_rate 1.0 at m12 the wide-net policy is obsolete)
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
    import ml_dtypes

    jax.config.update("jax_compilation_cache_dir", "/tmp/ahrag_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("[probe] device:", jax.devices(), flush=True)
    p = jnp.ones((1024, 1024), jnp.float32)
    np.asarray(jnp.dot(p, p))
    print("[probe] ok", flush=True)

    from bench import build_bench_arrays, bench_tensors
    from ahrag_tpu.ops.topk import binned_refined_topk, refined_masked_topk

    n_entities, B, K = 1048576, 512, 5
    t0 = time.perf_counter()
    arrs = build_bench_arrays(n_entities, n_entities // 64)
    arrs.emb = arrs.emb.astype(ml_dtypes.bfloat16).astype(np.float32)
    print(f"[build arrays] {time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(11)
    q_mat = arrs.emb[n_entities + (np.arange(B) % (n_entities // 64))] \
        + 0.35 * rng.standard_normal((B, arrs.emb.shape[1]), np.float32)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_mat = q_mat.astype(ml_dtypes.bfloat16).astype(np.float32)

    def diff_ms(fn, qv, hi=14, lo=2):
        def wall(reps):
            t0 = time.perf_counter()
            out = None
            for r in range(reps):
                out = fn(qv[r % len(qv)])
            jax.block_until_ready(out)
            np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
            return time.perf_counter() - t0
        return (wall(hi) - wall(lo)) / (hi - lo) * 1e3

    results = {}

    def measure(name, fn, qv, reps=2):
        t0 = time.perf_counter()
        out = fn(qv[0])
        jax.block_until_ready(out)
        print(f"[compile {name}] {time.perf_counter()-t0:.1f}s", flush=True)
        cert = None
        leaves = jax.tree_util.tree_leaves(out)
        if len(leaves) == 3:
            cert = float(np.asarray(leaves[2]).mean())
        for _ in range(reps):
            ms = diff_ms(fn, qv)
            results.setdefault(name, {"ms": [], "cert": cert})["ms"].append(
                round(ms, 3))
            print(f"[measure] {name}: {ms:.3f} ms (qps {B/ms*1e3:.0f})"
                  + (f" cert={cert:.3f}" if cert is not None else ""),
                  flush=True)

    for dtype in ("bfloat16", "float32"):
        t0 = time.perf_counter()
        gt = bench_tensors(arrs, dtype)
        jax.block_until_ready(gt.emb)
        print(f"[tensors {dtype}] {time.perf_counter()-t0:.1f}s", flush=True)
        mask = gt.indexed & gt.valid
        if dtype == "bfloat16":
            q_dev = jnp.asarray(q_mat).astype(jnp.bfloat16)
            prec = "default"
            cases = [
                ("bf16_r4cfg_m12", dict(margin=12, mask_trivial=False,
                                        emb_binpack=None)),
                ("bf16_trivial_m12", dict(margin=12, mask_trivial=True,
                                          emb_binpack=None)),
                ("bf16_trivial_pack_m12", dict(margin=12, mask_trivial=True,
                                               emb_binpack=gt.emb_binpack)),
            ]
        else:
            q_dev = jnp.asarray(q_mat)
            prec = "highest"
            cases = [
                ("f32_m42_nopack_triv", dict(margin=42, mask_trivial=True,
                                             emb_binpack=None)),
                ("f32_m12_nopack_triv", dict(margin=12, mask_trivial=True,
                                             emb_binpack=None)),
                ("f32_m12_pack_triv", dict(margin=12, mask_trivial=True,
                                           emb_binpack=gt.emb_binpack)),
            ]
        qv = [q_dev] + [jnp.roll(q_dev, 1 + 7 * v, axis=0) for v in range(3)]
        jax.block_until_ready(qv)
        for name, kw in cases:
            fn = (lambda kw: lambda q: binned_refined_topk(
                q, gt.emb, mask, K, tile_n=1024, coarse_precision=prec,
                select="hier", **kw))(kw)
            measure(name, fn, qv)
        # production wrapper for reference
        fn = lambda q: refined_masked_topk(
            q, gt.emb, mask, K, margin=12, flush_eps=1e-5,
            mask_trivial=True, emb_binpack=gt.emb_binpack)
        measure(f"{dtype[:4]}_production", fn, qv, reps=1)
        del gt

    with open("reports/kernel_iso_r5.json", "w") as f:
        json.dump({"n": n_entities, "b": B, "k": K, "variants": results}, f,
                  indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
