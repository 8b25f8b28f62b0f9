#!/usr/bin/env python3
"""Debug the v2 hier certificate failure on real TPU (round 5).

At 131k x 384 bf16, B=512: check (a) v2 cert rate trivial/masked, (b) v2
results vs full-HIGHEST ground truth, (c) kernel supermax vs bins.max, (d)
v2 bins vs v1 kernel bins.
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/ahrag_jax_cache")
    print("[probe] device:", jax.devices(), flush=True)
    p = jnp.ones((1024, 1024), jnp.float32)
    np.asarray(jnp.dot(p, p))
    print("[probe] ok", flush=True)

    from ahrag_tpu.ops.topk import (_full_highest_topk, binned_refined_topk,
                                    dense_binmax2_pallas, dense_binmax_pallas)
    import ml_dtypes

    rng = np.random.default_rng(3)
    n, d, B, k = 131072, 384, 512, 5
    centers = rng.standard_normal((2048, d)).astype(np.float32)
    e = centers[np.arange(n) % 2048] + 0.39 * rng.standard_normal(
        (n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    e = e.astype(ml_dtypes.bfloat16).astype(np.float32)
    q = centers[np.arange(B) % 2048] + 0.35 * rng.standard_normal(
        (B, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = q.astype(ml_dtypes.bfloat16).astype(np.float32)

    emb = jnp.asarray(e, jnp.bfloat16)
    qd = jnp.asarray(q, jnp.bfloat16)
    mask = jnp.ones(n, bool)

    gv, gi = _full_highest_topk(qd, emb, mask, k)
    gv, gi = np.asarray(gv), np.asarray(gi)
    print("[gt] done", flush=True)

    for trivial in (True, False):
        v, i, c = binned_refined_topk(qd, emb, mask, k, margin=12,
                                      tile_n=1024, select="hier",
                                      mask_trivial=trivial)
        v, i, c = np.asarray(v), np.asarray(i), np.asarray(c)
        mism = sum(1 for b in range(B)
                   if list(i[b]) != list(gi[b])
                   and not np.allclose(v[b], gv[b], atol=1e-6))
        print(f"[v2 trivial={trivial}] cert_rate={c.mean():.4f} "
              f"result_mismatch={mism}/{B}", flush=True)

    bins, smax = dense_binmax2_pallas(qd, emb, jnp.int32(n), mask,
                                      tile_n=1024, trivial=True)
    bins_m, smax_m = dense_binmax2_pallas(qd, emb, jnp.int32(n), mask,
                                          tile_n=1024, trivial=False)
    v1 = dense_binmax_pallas(qd, emb, jnp.int32(n), mask, tile_n=1024)
    bins, smax = np.asarray(bins), np.asarray(smax)
    bins_m, smax_m = np.asarray(bins_m), np.asarray(smax_m)
    v1 = np.asarray(v1)
    flat = bins.transpose(1, 0, 2).reshape(B, -1)
    flat_m = bins_m.transpose(1, 0, 2).reshape(B, -1)
    print("[bins] v2-trivial vs v1 max|diff| =",
          float(np.abs(flat - v1).max()), flush=True)
    print("[bins] v2-masked  vs v1 max|diff| =",
          float(np.abs(flat_m - v1).max()), flush=True)
    sm_true = bins.max(axis=2).T
    print("[smax] trivial vs bins.max: max|diff| =",
          float(np.abs(smax - sm_true).max()),
          " shape", smax.shape, flush=True)
    sm_true_m = bins_m.max(axis=2).T
    print("[smax] masked vs bins.max: max|diff| =",
          float(np.abs(smax_m - sm_true_m).max()), flush=True)

    # eps actually used
    from ahrag_tpu.ops.topk import binmax_eps
    print("[eps] binmax_eps =", binmax_eps("tpu", d, 1024, "default", True,
                                           False), flush=True)


if __name__ == "__main__":
    main()
