"""Sharded top-k parity sweep at corpus scale, refreshed on the round-4 stack.

VERDICT r3 item 6: the at-scale sharded parity artifact predated round 3's
kernel changes. This sweep re-validates the CROSS-SHARD composition — local
stage + all_gather merge + global certificate bound crossing ICI
(parallel/sharded.py) — at >=131k rows for 1/2/4/8 shards on the virtual CPU
mesh, for BOTH storage regimes:

- float32 rows, exact local HIGHEST stage;
- bfloat16-rounded rows (the r4 production storage at scale): operands are
  rounded once on the host, so the single-device oracle and every sharding
  score bitwise-identical products.

What this deliberately does NOT cover: the Pallas bin-max/hier-select kernel
internals — those are TPU-only code paths (ops/topk.py gates on the backend)
and multi-chip TPU hardware does not exist in this environment; their
exactness is covered by the on-device certificate audit at every bench rung
(bench.py::certificate_audit) and the r4 kernel sweep
(reports/topk_r4_tpu.json). Here the parity target is the distributed
algebra: shard-local ranking merged over the mesh must equal the
single-device exact ranking, bit for bit, at every shard count.

Run (CPU): XLA_FLAGS=--xla_force_host_platform_device_count=8
           python tools/sharded_scaling_r4.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main() -> None:
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import ml_dtypes

    from ahrag_tpu.ops.topk import NEG_INF
    from ahrag_tpu.parallel.mesh import make_mesh
    from ahrag_tpu.parallel.sharded import (sharded_dense_topk,
                                            sharded_refined_topk)

    n, d, B, k = 131072, 384, 64, 5
    rng = np.random.default_rng(7)
    # clustered corpus (the adversarial regime for certificates): 2k centers
    centers = rng.standard_normal((2048, d)).astype(np.float32)
    emb = centers[np.arange(n) % 2048] + 0.35 * rng.standard_normal(
        (n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[rng.integers(0, n, B)] + 0.2 * rng.standard_normal(
        (B, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    n_valid = n - 37          # exercise the masked tail

    report = {"n": n, "d": d, "b": B, "k": k, "n_valid": n_valid,
              "backend": jax.default_backend(), "regimes": {}}
    for regime in ("float32", "bfloat16"):
        if regime == "bfloat16":
            emb_r = emb.astype(ml_dtypes.bfloat16).astype(np.float32)
            q_r = q.astype(ml_dtypes.bfloat16).astype(np.float32)
        else:
            emb_r, q_r = emb, q
        # single-device exact oracle over the same operand values
        scores = np.array(jnp.dot(
            jnp.asarray(q_r), jnp.asarray(emb_r).T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
        scores[:, n_valid:] = -np.inf
        ref_idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]

        rows = {}
        for shards in (1, 2, 4, 8):
            mesh = make_mesh(n_devices=shards, dp=1)
            qd = jnp.asarray(q_r)
            ed = jnp.asarray(emb_r)
            t0 = time.perf_counter()
            dv, di = sharded_dense_topk(qd, ed, n_valid, k, mesh)
            di = np.asarray(di)
            t_dense = time.perf_counter() - t0
            t0 = time.perf_counter()
            rv, ri = sharded_refined_topk(qd, ed, n_valid, k, mesh)
            ri = np.asarray(ri)
            t_refined = time.perf_counter() - t0
            mism_d = int((di != ref_idx).any(axis=1).sum())
            mism_r = int((ri != ref_idx).any(axis=1).sum())
            rows[shards] = {"dense_mismatch_q": mism_d,
                            "refined_mismatch_q": mism_r,
                            "dense_wall_s": round(t_dense, 3),
                            "refined_wall_s": round(t_refined, 3)}
            print(f"[{regime}] shards={shards}: dense {mism_d}/{B} "
                  f"refined {mism_r}/{B} mismatched queries", flush=True)
        report["regimes"][regime] = rows

    ok = all(r["dense_mismatch_q"] == 0 and r["refined_mismatch_q"] == 0
             for reg in report["regimes"].values() for r in reg.values())
    report["ok"] = ok
    out = os.path.join(REPO, "reports", "sharded_scaling_r4.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"ok": ok, "out": out}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
