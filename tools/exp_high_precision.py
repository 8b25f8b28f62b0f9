#!/usr/bin/env python3
"""A/B the f32 binned certified path's coarse precision: HIGHEST (6-pass on
v5e) vs HIGH (bf16x3, 3-pass) vs default (1-pass, for the floor).

Measures, on bench-shaped clustered data at 1M rows (the hard case for the
certificate — scores cluster near the top-k boundary):
  - calibrated eps through the kernel per precision
  - bin-max kernel wall (differential: (wall(hi) - wall(lo)) / (hi - lo) with
    varied query batches; block_until_ready is reliable on tuples only)
  - end-to-end binned_refined_topk wall + cert_rate
  - oracle parity of the certified result vs full-HIGHEST ground truth

Writes reports/topk_high_precision_r3.json.
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

    from bench import _normalize, build_bench_arrays

    from ahrag_tpu.ops import topk as T

    n_entities = 1048576
    n_topics = n_entities // 64
    print("[exp] building arrays...", flush=True)
    arrs = build_bench_arrays(n_entities, n_topics)
    n = arrs.n
    n_pad = ((n + 2047) // 2048) * 2048
    emb_np = np.zeros((n_pad, 384), np.float32)
    emb_np[:n] = arrs.emb
    emb = jnp.asarray(emb_np)
    mask = jnp.asarray(np.arange(n_pad) < n)

    rng = np.random.default_rng(11)
    B, k, reps_lo, reps_hi = 256, 5, 3, 12
    n_batches = 4
    q_batches = []
    for i in range(n_batches):
        qt = (np.arange(B) + i * B) % n_topics
        q_batches.append(jnp.asarray(_normalize(
            arrs.emb[n_entities + qt]
            + 0.35 * rng.standard_normal((B, 384), dtype=np.float32))))

    tile_n = 2048
    wide = 8 * k + 2
    out = {"n": n, "n_pad": n_pad, "B": B, "k": k, "margin": wide,
           "tile_n": tile_n}

    def diff_wall(fn, tag):
        # warmup/compile
        r = fn(q_batches[0])
        jax.block_until_ready(r)

        def run(reps):
            t0 = time.perf_counter()
            last = None
            for i in range(reps):
                last = fn(q_batches[i % n_batches])
            jax.block_until_ready(last)
            # final host materialization defeats any lingering async
            np.asarray(jax.tree_util.tree_leaves(last)[0][:1])
            return time.perf_counter() - t0

        lo = run(reps_lo)
        hi = run(reps_hi)
        ms = (hi - lo) / (reps_hi - reps_lo) * 1e3
        print(f"[exp] {tag}: {ms:.2f} ms", flush=True)
        return ms, r

    # --- eps calibration per precision ---
    for prec in ("default", "high", "highest"):
        eps = T.binmax_eps("tpu", 384, tile_n, prec, False)
        out[f"eps_{prec}"] = eps
        print(f"[exp] eps[{prec}] = {eps:.3e}", flush=True)

    # --- bin-max kernel alone ---
    for prec in ("default", "high", "highest"):
        ms, _ = diff_wall(
            lambda q, p=prec: (T.dense_binmax_pallas(
                q, emb, jnp.int32(n), mask, tile_n=tile_n, precision=p),),
            f"binmax[{prec}]")
        out[f"binmax_ms_{prec}"] = round(ms, 2)

    # --- end-to-end binned certified path ---
    gts = {}
    for prec in ("high", "highest"):
        ms, r = diff_wall(
            lambda q, p=prec: T.binned_refined_topk(
                q, emb, mask, k, margin=wide, tile_n=tile_n,
                coarse_precision=p, select="approx"),
            f"binned_e2e[{prec}]")
        vals, idx, cert = r
        cert_rate = float(np.mean(np.asarray(cert)))
        out[f"e2e_ms_{prec}"] = round(ms, 2)
        out[f"cert_rate_{prec}"] = cert_rate
        out[f"qps_{prec}"] = round(B / (ms / 1e3), 1)
        gts[prec] = (np.asarray(vals), np.asarray(idx))
        print(f"[exp] cert_rate[{prec}] = {cert_rate}", flush=True)

    # --- oracle parity on 64 queries (certified results must match full
    # HIGHEST ground truth except where scores tie within atol) ---
    qa = q_batches[0][:64]
    gvals, gidx = T._full_highest_topk(qa, emb, mask, k)
    gvals, gidx = np.asarray(gvals), np.asarray(gidx)
    for prec in ("high", "highest"):
        vals, idx, cert = T.binned_refined_topk(
            qa, emb, mask, k, margin=wide, tile_n=tile_n,
            coarse_precision=prec, select="approx")
        vals, idx, cert = np.asarray(vals), np.asarray(idx), np.asarray(cert)
        mism = 0
        for b in range(64):
            if not cert[b]:
                continue  # uncertified: public wrapper recomputes; not parity
            if list(idx[b]) != list(gidx[b]) and not np.allclose(
                    vals[b], gvals[b], rtol=0, atol=1e-6):
                mism += 1
        out[f"oracle_mismatch_{prec}"] = mism
        out[f"audit_cert_rate_{prec}"] = float(np.mean(cert))
        print(f"[exp] oracle[{prec}]: {mism} mismatches, "
              f"cert {float(np.mean(cert))}", flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "reports",
            "topk_high_precision_r3.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
