"""Round-4 1M-row top-k variant sweep on the real chip (VERDICT r3 item 4).

Round 3 shipped the flat bf16 single-pass (16.4 ms at B=512 over 1.07M x 384
= 31k qps) because every binned variant lost to it: exact bin select cost
~60 ms, approx select needed a ~7 ms c_out pass, and select="hier" as first
written gathered [B, m*128] ARBITRARY element indices from [B, nbins] — a
per-element gather measured at 73 ms total. The flat path's own tax is the
[B, N] f32 score buffer (2.2 GB write+read ~5.4 ms) plus lax.top_k over 1M
columns — ~13 ms of non-matmul wall vs the 3.5 ms streaming bin-max kernel.

This sweep measures the repaired hier path (contiguous 128-lane superbin
slice gather + free exact-style bound), the per-tile top-k kernel at 1M
scale, and margin/tile_n trade-offs, against the production flat path.
Selection correctness is oracle-checked per variant; certified rate recorded.

Timing per CLAUDE.md: block_until_ready is a NO-OP for bare arrays on this
backend — differential walls (wall(hi) - wall(lo), varied query batches, one
final host materialization) cancel RTT and dispatch.

Run (TPU, solo): setsid nohup python tools/topk_r4_bench.py --out
reports/topk_r4_tpu.json > /tmp/topk_r4.log 2>&1 &
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
    ap.add_argument("--quick", action="store_true",
                    help="skip the slow comparator variants")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ahrag_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from ahrag_tpu.ops.topk import (binned_refined_topk, dense_topk_pallas,
                                    dense_topk_xla, refined_masked_topk)

    n, b, d, k = args.n, args.b, args.d, args.k
    interp = jax.default_backend() == "cpu"  # pallas needs interpret on CPU
    print(f"[r4] backend={jax.default_backend()} n={n} b={b} d={d} k={k} "
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
        try:
            ms = diff_wall(fn, qs)
            out = fn(qs[0])
        except Exception as exc:  # a failed variant must not kill the sweep
            res["variants"][name] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"[r4] {name}: ERROR {exc}", flush=True)
            return
        mism = int((np.asarray(idx_of(out))[:8] != oi).sum())
        row = {"ms": round(ms, 3), "qps": round(b / (ms / 1e3), 1),
               "oracle_mismatch_of_8x{}".format(k): mism}
        if cert_of is not None:
            row["cert_rate"] = round(float(jnp.mean(
                cert_of(out).astype(jnp.float32))), 4)
        res["variants"][name] = row
        print(f"[r4] {name}: {row}", flush=True)

    # 1) production public path (bf16 large-batch => flat single pass today)
    report("production_refined_masked_topk",
           lambda q: refined_masked_topk(q, e, mask, k, margin=16),
           lambda o: o[1])

    # 2-5) binned + repaired hier select: tile_n x margin sweep. m = k+margin.
    for tile_n in (2048, 1024):
        for margin in (37, 19, 7):
            report(f"binned_hier_t{tile_n}_m{k + margin}",
                   lambda q, tn=tile_n, mg=margin: binned_refined_topk(
                       q, e, mask, k, margin=mg, tile_n=tn, interpret=interp,
                       coarse_precision="default", select="hier"),
                   lambda o: o[1], cert_of=lambda o: o[2])

    # 6) per-tile top-k kernel at 1M (never tried at this scale: k extraction
    #    loop on the VPU per tile, [tiles, B, 128] x2 candidate write-back)
    if not args.quick:
        for tile_n in (1024, 2048):
            report(f"dense_topk_pallas_t{tile_n}",
                   lambda q, tn=tile_n: dense_topk_pallas(
                       q, e, jnp.int32(n), k, tile_n=tn, interpret=interp),
                   lambda o: o[1])

        # 7) reference point: binned + approx select (pre-flat production)
        report("binned_approx_m42",
               lambda q: binned_refined_topk(q, e, mask, k, margin=37,
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
