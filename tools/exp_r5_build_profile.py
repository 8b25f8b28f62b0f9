#!/usr/bin/env python3
"""Profile the 1M index build stages on TPU (round 5: build grew 118s->364s)."""
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
    np.asarray(jnp.dot(jnp.ones((256, 256)), jnp.ones((256, 256))))
    print("[probe] ok", flush=True)

    from bench import build_bench_arrays
    import ml_dtypes

    def tick(msg, t0):
        t = time.perf_counter()
        print(f"[stage] {msg}: {t - t0:.1f}s", flush=True)
        return t

    t = time.perf_counter()
    arrs = build_bench_arrays(1048576, 1048576 // 64)
    t = tick("host arrays", t)
    arrs.emb = arrs.emb.astype(ml_dtypes.bfloat16).astype(np.float32)
    t = tick("host bf16 round", t)

    n = arrs.n
    n_pad = ((n + 2047) // 2048) * 2048
    emb = np.zeros((n_pad, arrs.emb.shape[1]), np.float32)
    emb[:n] = arrs.emb
    t = tick("host pad copy", t)

    emb_dev = jnp.asarray(emb, dtype=jnp.bfloat16)
    jax.block_until_ready(emb_dev)
    t = tick("emb transfer (819MB bf16)", t)

    ch = np.full((n_pad, 64), -1, np.int32)
    ch[:n] = arrs.children_ell
    ch_dev = jnp.asarray(ch)
    jax.block_until_ready(ch_dev)
    t = tick("children ELL transfer (273MB)", t)

    others = [jnp.asarray(np.zeros((n_pad, 8), np.int32)) for _ in range(4)]
    jax.block_until_ready(others)
    t = tick("4x other ELL transfer (137MB)", t)

    scal = [jnp.asarray(np.zeros(n_pad, np.float32)) for _ in range(6)]
    jax.block_until_ready(scal)
    t = tick("scalar fields transfer", t)

    from ahrag_tpu.ops.topk import binmax_eps
    binmax_eps("tpu", 384, 1024, "default", True, False)
    t = tick("binmax_eps priming", t)

    pack_nodes = np.nonzero(ch[:, 0] >= 0)[0]
    pids = ch[pack_nodes, :32]
    pids_dev = jnp.asarray(np.clip(pids, 0, n_pad - 1))
    pk = jnp.where(jnp.asarray(pids >= 0)[:, :, None],
                   emb_dev[pids_dev], 0).astype(jnp.bfloat16)
    jax.block_until_ready(pk)
    t = tick(f"pack gather ({pids.shape})", t)

    tt = n_pad // 1024
    bp = (emb_dev.reshape(tt, 8, 128, 384)
          .transpose(0, 2, 1, 3).reshape(tt * 128, 8, 384))
    jax.block_until_ready(bp)
    t = tick("binpack transpose", t)


if __name__ == "__main__":
    main()
