"""Measure hierarchical (superbin) exact bin-selection vs the production
1M-row top-k paths on the real chip.

Round-3 follow-up to reports/topk_r3_tpu.json: the bf16 1M path went flat
(single full matmul = exact) at 16.4 ms because bin selection dominated the
binned path (exact lax.top_k over 66688 bins ~60 ms; approx_max_k ~4.7 ms
plus a ~7 ms c_out pass). select="hier" reduces selection to a superbin
max-reduce + two small top_k's (pure XLA, certificate-sound, free exact-style
c_out bound) — if it lands near the 3.5 ms bin-max kernel floor, the binned
path beats flat by ~2x.

Timing per CLAUDE.md: block_until_ready is a NO-OP for bare arrays on this
backend — differential walls (wall(hi reps) - wall(lo reps)) with varied
inputs and one final host materialization cancel RTT and dispatch.

Run (TPU, solo): setsid nohup python tools/topk_hier_bench.py --out
reports/topk_hier_r3_tpu.json > /tmp/hier.log 2>&1 &
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_data(key, n, d, b, nq_pool):
    import jax
    import jax.numpy as jnp
    k1, k2, k3, k4 = jax.random.split(key, 4)

    @jax.jit
    def gen():
        centers = jax.random.normal(k1, (1024, d), jnp.float32)
        ce = centers[jax.random.randint(k2, (n,), 0, 1024)]
        e = ce + 0.3 * jax.random.normal(k3, (n, d), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        cq = centers[jax.random.randint(k4, (nq_pool * b,), 0, 1024)]
        q = cq + 0.3 * jax.random.normal(k1, (nq_pool * b, d), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        return q.reshape(nq_pool, b, d), e

    q, e = gen()
    jax.block_until_ready((q, e))
    return q, e


def diff_wall(fn, qs, lo=4, hi=20):
    """Differential wall over varied query batches; returns ms per call."""
    import numpy as np
    out = fn(qs[0])
    np.asarray(out[0])  # force full materialization of the warmup/compile
    nq = qs.shape[0]

    def run(reps):
        t0 = time.perf_counter()
        out = None
        for i in range(reps):
            out = fn(qs[i % nq])
        np.asarray(out[0][:1])  # one final host sync
        return time.perf_counter() - t0

    run(2)  # settle
    w_lo, w_hi = run(lo), run(hi)
    return (w_hi - w_lo) / (hi - lo) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=1067008)  # 1M rung: 2048-aligned
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ahrag_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from ahrag_tpu.ops.topk import (binned_refined_topk, dense_topk_xla,
                                    refined_masked_topk)

    n, b, d, k = args.n, args.b, args.d, args.k
    interp = jax.default_backend() == "cpu"  # pallas needs interpret on CPU
    print(f"[hier] backend={jax.default_backend()} n={n} b={b} d={d} k={k} "
          f"dtype={args.dtype}", flush=True)
    qs, e = _mk_data(jax.random.PRNGKey(7), n, d, b, nq_pool=5)
    if args.dtype == "bfloat16":
        e = e.astype(jnp.bfloat16)
        qs = qs.astype(jnp.bfloat16)
    mask = jnp.ones(n, bool)
    res = {"n": n, "b": b, "d": d, "k": k, "dtype": args.dtype,
           "backend": jax.default_backend(), "variants": {}}

    # oracle on 8 probes of the first batch (HIGHEST f32 over same operands)
    ov, oi = dense_topk_xla(qs[0][:8], e, jnp.int32(n), k)
    oi = np.asarray(oi)

    def report(name, fn, idx_of, cert_of=None):
        ms = diff_wall(fn, qs)
        out = fn(qs[0])
        mism = int((np.asarray(idx_of(out))[:8] != oi).sum())
        row = {"ms": round(ms, 3), "qps": round(b / (ms / 1e3), 1),
               "oracle_mismatch_of_8x{}".format(k): mism}
        if cert_of is not None:
            row["cert_rate"] = round(float(jnp.mean(
                cert_of(out).astype(jnp.float32))), 4)
        res["variants"][name] = row
        print(f"[hier] {name}: {row}", flush=True)

    # 1) production public path (bf16 large-batch => flat single pass)
    report("production_refined_masked_topk",
           lambda q: refined_masked_topk(q, e, mask, k, margin=16),
           lambda o: o[1])

    # 2) binned + hier select, wide net (current production margin at 1M)
    wide = 8 * k + 2 - k  # m = 8k+2 = 42
    report("binned_hier_m42",
           lambda q: binned_refined_topk(q, e, mask, k, margin=wide,
                                         tile_n=2048, interpret=interp,
                                         coarse_precision="default",
                                         select="hier"),
           lambda o: o[1], cert_of=lambda o: o[2])

    # 3) binned + hier select, narrow net (exact selection needs no approx
    #    slack; does the tighter c_out still certify on clustered data?)
    report("binned_hier_m12",
           lambda q: binned_refined_topk(q, e, mask, k, margin=7,
                                         tile_n=2048, interpret=interp,
                                         coarse_precision="default",
                                         select="hier"),
           lambda o: o[1], cert_of=lambda o: o[2])

    # 4) reference point: binned + approx select (the pre-flat production path)
    report("binned_approx_m42",
           lambda q: binned_refined_topk(q, e, mask, k, margin=wide,
                                         tile_n=2048, interpret=interp,
                                         coarse_precision="default",
                                         select="approx"),
           lambda o: o[1], cert_of=lambda o: o[2])

    print(json.dumps(res, indent=2), flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w", encoding="utf-8") as fh:
            json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
