"""Top-k backend ladder benchmark: flat / approx / per-tile Pallas / bin-max.

Measures the dense retrieval coarse stage at production shapes on the current
backend and emits a JSON report (reports/topk_ladder_*.json). The corpus is
generated ON DEVICE (clustered geometry: Gaussian centers + noise, row
normalized) — a host->device transfer of a 1M-row corpus through a tunneled
device costs minutes and benchmarks the network, not the kernel.

Variants at each (N, B, D, k):
- flat:      default-precision matmul + lax.top_k          (exact coarse)
- approx:    lax.approx_max_k(recall_target=0.99)          (unsound coverage)
- binmax:    dense_binmax_pallas streaming kernel only     (coarse stage)
- binned:    binned_refined_topk end-to-end                (certified exact)
- refined:   refined_masked_topk public path               (certified + fallback)
Oracle: dense_topk_xla at HIGHEST on 8 probe queries; each variant's final
indices are compared (approx compares its raw top-k — documenting its misses).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict


def _mk_data(key, n, d, b):
    import jax
    import jax.numpy as jnp
    k1, k2, k3, k4 = jax.random.split(key, 4)

    @jax.jit
    def gen():
        centers = jax.random.normal(k1, (1024, d), jnp.float32)
        ce = centers[jax.random.randint(k2, (n,), 0, 1024)]
        e = ce + 0.3 * jax.random.normal(k3, (n, d), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        cq = centers[jax.random.randint(k4, (b,), 0, 1024)]
        q = cq + 0.3 * jax.random.normal(k1, (b, d), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        return q, e

    q, e = gen()
    import jax
    jax.block_until_ready(e)
    return q, e


def _time(fn, reps: int) -> float:
    import jax
    out = fn()
    jax.block_until_ready(out)  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def run_ladder(n: int, b: int, d: int, k: int, reps: int = 10,
               variants: str = "flat,approx,binmax,binned,refined"
               ) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    from ahrag_tpu.ops.topk import (NEG_INF, binned_refined_topk,
                                    dense_binmax_pallas, dense_topk_xla,
                                    matmul_eps, refined_masked_topk)

    q, e = _mk_data(jax.random.PRNGKey(7), n, d, b)
    mask = jnp.ones(n, bool)
    out: Dict[str, Any] = {"n": n, "b": b, "d": d, "k": k,
                           "backend": jax.default_backend(),
                           "eps": matmul_eps(jax.default_backend(), d)}
    ov, oi = dense_topk_xla(q[:8], e, jnp.int32(n), k)  # HIGHEST oracle
    gflop = 2.0 * b * n * d / 1e9
    hbm_gb = (n * d * 4 + b * n * 4) / 1e9  # corpus read + score write (flat)

    # NOTE: q/e/mask must be jit ARGUMENTS, not closures — a jitted lambda that
    # closes over the [1M, D] corpus embeds it as an HLO constant, and the
    # tunneled backend then ships ~1.5 GB of program per variant compile
    # (observed: >9 min hang per variant).
    wanted = set(variants.split(","))
    if "flat" in wanted:
        jf = jax.jit(lambda qq, ee, mm: jax.lax.top_k(
            jnp.where(mm[None, :],
                      jnp.dot(qq, ee.T, preferred_element_type=jnp.float32),
                      NEG_INF), k))
        f = lambda: jf(q, e, mask)  # noqa: E731
        dt = _time(f, reps)
        _, fi = f()
        out["flat"] = {"ms": dt * 1e3, "qps": b / dt,
                       "oracle_mismatch": int((fi[:8] != oi).sum()),
                       "tflops": gflop / dt / 1e3}
    if "approx" in wanted:
        jf = jax.jit(lambda qq, ee, mm: jax.lax.approx_max_k(
            jnp.where(mm[None, :],
                      jnp.dot(qq, ee.T, preferred_element_type=jnp.float32),
                      NEG_INF), k, recall_target=0.99))
        f = lambda: jf(q, e, mask)  # noqa: E731
        dt = _time(f, reps)
        _, ai = f()
        out["approx"] = {"ms": dt * 1e3, "qps": b / dt,
                         "oracle_mismatch": int((ai[:8] != oi).sum()),
                         "tflops": gflop / dt / 1e3}
    if "binmax" in wanted and n % 4096 == 0:
        f = lambda: dense_binmax_pallas(q, e, jnp.int32(n), mask,  # noqa: E731
                                        tile_n=4096)
        dt = _time(f, reps)
        out["binmax"] = {"ms": dt * 1e3, "qps": b / dt,
                         "tflops": gflop / dt / 1e3,
                         "hbm_stream_gb": n * d * 4 / 1e9,
                         "gbps": n * d * 4 / 1e9 / dt}
    if "binned" in wanted and n % 4096 == 0:
        f = lambda: binned_refined_topk(q, e, mask, k,  # noqa: E731
                                        margin=4 * k + 32, tile_n=4096)
        dt = _time(f, reps)
        bv, bi, cert = f()
        out["binned"] = {"ms": dt * 1e3, "qps": b / dt,
                         "oracle_mismatch": int((bi[:8] != oi).sum()),
                         "cert_rate": float(jnp.mean(cert.astype(jnp.float32))),
                         "tflops": gflop / dt / 1e3}
    # HIGHEST coarse needs tile_n=2048: the f32 3-pass matmul's scratch blows
    # VMEM at 4096 (observed: Mosaic OOM). Bins shrink to G=16 rows, halving
    # the refine gather as a side effect.
    if "binmax_hi" in wanted and n % 2048 == 0:
        f = lambda: dense_binmax_pallas(q, e, jnp.int32(n), mask,  # noqa: E731
                                        tile_n=2048, precision="highest")
        dt = _time(f, reps)
        out["binmax_hi"] = {"ms": dt * 1e3, "qps": b / dt,
                            "tflops": gflop / dt / 1e3,
                            "gbps": n * d * 4 / 1e9 / dt}
    if "binned_hi" in wanted and n % 2048 == 0:
        # the production >=65k certified config (refined_masked_topk_cert)
        f = lambda: binned_refined_topk(q, e, mask, k,  # noqa: E731
                                        margin=3 * k + 2, tile_n=2048,
                                        coarse_precision="highest",
                                        select="approx")
        dt = _time(f, reps)
        bv, bi, cert = f()
        out["binned_hi"] = {"ms": dt * 1e3, "qps": b / dt,
                            "oracle_mismatch": int((bi[:8] != oi).sum()),
                            "cert_rate": float(jnp.mean(cert.astype(jnp.float32))),
                            "tflops": gflop / dt / 1e3}
    if "refined" in wanted:
        f = lambda: refined_masked_topk(q, e, mask, k, margin=16)  # noqa: E731
        dt = _time(f, reps)
        _, ri = f()
        out["refined"] = {"ms": dt * 1e3, "qps": b / dt,
                          "oracle_mismatch": int((ri[:8] != oi).sum()),
                          "tflops": gflop / dt / 1e3}
    out["flat_hbm_model_gb"] = hbm_gb
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--variants", default="flat,approx,binmax,binned,refined")
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

    res = run_ladder(args.n, args.b, args.d, args.k, reps=args.reps,
                     variants=args.variants)
    print(json.dumps(res, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w", encoding="utf-8") as fh:
            json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
