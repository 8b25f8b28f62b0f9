"""Train the span reader on device.

Run: ``python -m ahrag_tpu.models.reader.train --out checkpoints/reader``

TPU-shaped training loop: the whole featurized training set lives on
device, and ONE jitted program runs ``--scan`` optimizer steps per
dispatch via ``lax.scan`` (each step gathers its minibatch from the
resident arrays with a per-step slice of a pre-shuffled index matrix).
Through the tunneled device a per-step dispatch would spend more wall on
RTT than on compute; scanning amortizes it to one dispatch per
``--scan`` steps. Loss = start/end cross-entropy over evidence
positions.

Artifacts: ``<out>.msgpack`` (flax params), ``<out>_curve.json``
(loss/val-exact trajectory — the training-curve evidence for the round
report).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ahrag_tpu.models.reader.features import Q_LEN


def _loss_fn(params, model, batch, starts, ends):
    import jax.numpy as jnp
    import optax

    s_log, e_log = model.apply(params, batch["word_ids"], batch["stem_ids"],
                               batch["scalars"], batch["segments"],
                               batch["mask"], batch["ev_mask"])
    # gold indices are evidence-relative; logits cover the full sequence
    ls = optax.softmax_cross_entropy_with_integer_labels(s_log, starts + Q_LEN)
    le = optax.softmax_cross_entropy_with_integer_labels(e_log, ends + Q_LEN)
    loss = (ls + le).mean()
    acc = ((jnp.argmax(s_log, -1) == starts + Q_LEN)
           & (jnp.argmax(e_log, -1) == ends + Q_LEN)).mean()
    return loss, acc


def train(n_train: int = 16384, n_val: int = 1024, batch: int = 64,
          steps: int = 4096, scan_len: int = 256, lr: float = 3e-4,
          seed: int = 7, out: str = "checkpoints/reader",
          d_model: int = 128, n_layers: int = 2, d_ff: int = 0,
          n_heads: int = 4) -> dict:
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from ahrag_tpu.models.reader.data import build_training_arrays
    from ahrag_tpu.models.reader.model import SpanReader

    t0 = time.time()
    print(f"[reader] generating {n_train}+{n_val} instances...", flush=True)
    fb, (gs, ge) = build_training_arrays(n_train + n_val, seed=seed)
    gen_s = time.time() - t0
    print(f"[reader] featurized in {gen_s:.1f}s", flush=True)

    def _dev(sl):
        return {"word_ids": jnp.asarray(fb.word_ids[sl]),
                "stem_ids": jnp.asarray(fb.stem_ids[sl]),
                "scalars": jnp.asarray(fb.scalars[sl]),
                "segments": jnp.asarray(fb.segments[sl]),
                "mask": jnp.asarray(fb.mask[sl]),
                "ev_mask": jnp.asarray(fb.ev_mask[sl])}

    train_sl, val_sl = slice(0, n_train), slice(n_train, n_train + n_val)
    data = _dev(train_sl)
    val = _dev(val_sl)
    starts = jnp.asarray(gs[train_sl]);  ends = jnp.asarray(ge[train_sl])
    v_starts = jnp.asarray(gs[val_sl]);  v_ends = jnp.asarray(ge[val_sl])

    d_ff = d_ff or 2 * d_model
    model = SpanReader(d_model=d_model, n_layers=n_layers, d_ff=d_ff,
                       n_heads=n_heads)
    params = model.init(jax.random.PRNGKey(seed), data["word_ids"][:2],
                        data["stem_ids"][:2], data["scalars"][:2],
                        data["segments"][:2], data["mask"][:2],
                        data["ev_mask"][:2])
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[reader] {n_params/1e6:.2f}M params", flush=True)

    warmup = min(200, max(1, steps // 4))
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps,
                                               lr * 0.05)
    tx = optax.adamw(sched, weight_decay=1e-4)
    opt_state = tx.init(params)

    # pre-shuffled minibatch index matrix: [steps, batch]
    rng = np.random.default_rng(seed)
    idx = np.stack([rng.permutation(n_train)[:batch]
                    for _ in range(steps)]).astype(np.int32)
    idx_dev = jnp.asarray(idx)

    def _gather(tree, take):
        return jax.tree_util.tree_map(lambda x: x[take], tree)

    # data/targets are ARGUMENTS, not closures: a jit closing over the
    # resident training set would bake ~300 MB into the program as a
    # constant and ship it through the remote compile (CLAUDE.md r3)
    from ahrag_tpu.models.reader.features import (STEM_VOCAB, WORD_VOCAB)

    @jax.jit
    def run_chunk(params, opt_state, rng_key, idx_chunk, data, starts, ends):
        def step(carry, take):
            params, opt_state, key = carry
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            mb = _gather(data, take)
            # word-identity dropout: at inference the reader reads REAL
            # English it has never seen, so every content word's hash bucket
            # is an untrained random embedding. Randomizing a fraction of
            # train-time identities makes that the TRAINED regime — the
            # model must carry the task on the structural scalar channels
            # and use vocabulary only as a bonus signal.
            wmask = jax.random.bernoulli(k1, 0.3, mb["word_ids"].shape)
            mb["word_ids"] = jnp.where(
                wmask, jax.random.randint(k2, mb["word_ids"].shape, 0,
                                          WORD_VOCAB), mb["word_ids"])
            smask = jax.random.bernoulli(k3, 0.15, mb["stem_ids"].shape)
            mb["stem_ids"] = jnp.where(
                smask, jax.random.randint(k4, mb["stem_ids"].shape, 0,
                                          STEM_VOCAB), mb["stem_ids"])
            (loss, acc), grads = jax.value_and_grad(
                _loss_fn, has_aux=True)(params, model, mb,
                                        starts[take], ends[take])
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), (loss, acc)
        (params, opt_state, _), (losses, accs) = jax.lax.scan(
            step, (params, opt_state, rng_key), idx_chunk)
        return params, opt_state, losses.mean(), accs.mean()

    @jax.jit
    def evaluate(params, val, v_starts, v_ends):
        _, acc = _loss_fn(params, model, val, v_starts, v_ends)
        return acc

    curve = []
    t1 = time.time()
    for c in range(0, steps, scan_len):
        params, opt_state, loss, acc = run_chunk(
            params, opt_state, jax.random.PRNGKey(seed * 100003 + c),
            idx_dev[c:c + scan_len], data, starts, ends)
        val_acc = evaluate(params, val, v_starts, v_ends)
        loss, acc, val_acc = float(loss), float(acc), float(val_acc)
        curve.append({"step": c + scan_len, "loss": round(loss, 4),
                      "train_exact": round(acc, 4),
                      "val_exact": round(val_acc, 4),
                      "wall_s": round(time.time() - t1, 1)})
        print(f"[reader] step {c + scan_len}/{steps} loss {loss:.4f} "
              f"train_exact {acc:.3f} val_exact {val_acc:.3f}", flush=True)

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(params))
    meta = {"d_model": d_model, "n_layers": n_layers, "d_ff": d_ff,
            "n_heads": n_heads, "n_params": n_params,
            "steps": steps, "batch": batch, "lr": lr, "seed": seed,
            "n_train": n_train, "n_val": n_val,
            "final_val_exact": curve[-1]["val_exact"] if curve else None,
            "train_wall_s": round(time.time() - t1, 1),
            "backend": jax.default_backend(), "curve": curve}
    with open(out + "_curve.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[reader] done: val_exact {meta['final_val_exact']} "
          f"({meta['train_wall_s']}s train)", flush=True)
    return meta


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=16384)
    ap.add_argument("--n-val", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4096)
    ap.add_argument("--scan", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--n-layers", type=int, default=2)
    ap.add_argument("--d-ff", type=int, default=0)
    ap.add_argument("--n-heads", type=int, default=4)
    ap.add_argument("--out", default="checkpoints/reader")
    a = ap.parse_args()
    train(n_train=a.n_train, n_val=a.n_val, batch=a.batch, steps=a.steps,
          scan_len=a.scan, lr=a.lr, seed=a.seed, out=a.out,
          d_model=a.d_model, n_layers=a.n_layers, d_ff=a.d_ff,
          n_heads=a.n_heads)


if __name__ == "__main__":
    main()
