"""Deterministic hashed n-gram encoder (default embedding model).

The environment this framework targets has no network egress, so pretrained MiniLM
weights may be unavailable. This encoder is fully self-contained and deterministic:

  text --host--> sparse feature counts over B hash buckets
       --TPU--> dense [batch, B] @ fixed seeded Gaussian projection [B, D]  (MXU)
       --TPU--> L2 normalize

Features: lowercased word unigrams + bigrams + character 3..5-grams, sublinear TF
(1 + log(count)), bucket index via blake2b (stable across processes — never Python's
salted ``hash``). The Gaussian projection approximately preserves cosine geometry of
the high-dimensional hashed space (Johnson-Lindenstrauss), so cosine top-k over these
embeddings behaves like a lexical TF similarity — a strong retriever for the
entity-heavy HotpotQA-style corpora the reference serves (SURVEY §6).

Replaces: sentence-transformers encode calls at semantic_aggregator.py:71 and
hierarchical_graph.py:655,709-712.
"""
from __future__ import annotations

import re
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

_WORD_RE = re.compile(r"[a-z0-9]+")

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def _fnv1a(data: bytes) -> int:
    """FNV-1a 64 — bit-identical to the native hasher (ahrag_native.cpp) so
    graphs featurized by either path interoperate."""
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def _bucket(feature: str, buckets: int) -> int:
    return _fnv1a(feature.encode("utf-8")) % buckets


def _features(text: str) -> List[str]:
    t = text.lower()
    words = _WORD_RE.findall(t)
    feats = list(words)
    feats += [f"{a}_{b}" for a, b in zip(words, words[1:])]
    compact = " ".join(words)
    for n in (3, 4, 5):
        feats += [f"c{n}:{compact[i:i + n]}" for i in range(max(0, len(compact) - n + 1))]
    return feats


@partial(jax.jit, static_argnames=())
def _project_normalize(counts: jnp.ndarray, proj: jnp.ndarray,
                       idf: jnp.ndarray) -> jnp.ndarray:
    # sublinear tf (x idf) then random projection on the MXU, then L2
    # normalize. min(c, 1) ramps fractional counts linearly: weighted
    # featurization emits char-gram occurrences at < 1.0 each, and the plain
    # 1+log(max(c,1)) floor would round any nonzero count up to a full word's
    # weight (for integer counts the factor is exactly 1, so the classic
    # sublinear curve is unchanged)
    tf = jnp.minimum(counts, 1.0) * (1.0 + jnp.log(jnp.maximum(counts, 1.0)))
    tf = tf * idf[None, :]
    emb = jnp.dot(tf, proj, preferred_element_type=jnp.float32)
    norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb / jnp.maximum(norm, 1e-9)


@partial(jax.jit, static_argnames=("n_rows",))
def _project_normalize_sparse(rows: jnp.ndarray, cols: jnp.ndarray,
                              vals: jnp.ndarray, proj: jnp.ndarray,
                              idf: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Sparse-COO variant: scatter the counts on device, then project.

    Host->device transfer is the nonzero triplets only (~150 features/text vs the
    full bucket row) — material when the device sits behind a network tunnel.
    Padding triplets use an extra dump row.
    """
    buckets = proj.shape[0]
    counts = jnp.zeros((n_rows + 1, buckets), jnp.float32).at[rows, cols].add(vals)
    return _project_normalize(counts[:n_rows], proj, idf)


class HashedNGramEncoder:
    def __init__(self, dim: int = 384, buckets: int = 16384, seed: int = 7,
                 cgram_weight: float = 0.3) -> None:
        """``cgram_weight`` scales char 3..5-gram feature occurrences relative
        to word unigrams/bigrams (1.0). At full weight the ~10x more numerous
        char-grams dominate every document norm, so two same-template
        documents differing in one rare word score near-identically (measured
        on the shared-KB eval: four same-template films tied within 0.006
        cosine while only one carried the asked year). A fractional weight
        keeps the char-grams' morphology/typo robustness while word-level
        evidence decides ranking. The weight is part of the encoder identity
        (embedded in ``name``): an index built at one weight must be queried
        at the same weight."""
        tag = "" if cgram_weight == 1.0 else f"-cg{cgram_weight:g}"
        self.name = f"hashed-ngram-b{buckets}-d{dim}-s{seed}{tag}"
        self.dim = dim
        self.buckets = buckets
        self.seed = seed
        self.cgram_weight = float(cgram_weight)
        key = jax.random.PRNGKey(seed)
        self._proj = jax.random.normal(key, (buckets, dim), dtype=jnp.float32) / np.sqrt(dim)

    def _coo_block(self, texts: List[str]):
        """Sparse triplets straight from the threaded C++ featurizer — the
        encode hot path never materializes the dense [chunk, buckets] matrix
        (profiled ~20x faster per doc at corpus scale). None when unbuilt."""
        from ahrag_tpu import native
        return native.hash_features_coo(texts, self.buckets,
                                        cgram_weight=self.cgram_weight)

    def _count_matrix(self, texts: List[str]) -> np.ndarray:
        from ahrag_tpu import native
        counts = native.hash_features_counts(texts, self.buckets,
                                             cgram_weight=self.cgram_weight)
        if counts is not None:  # C++ fast path (identical features + hash)
            return counts
        counts = np.zeros((len(texts), self.buckets), dtype=np.float32)
        for i, text in enumerate(texts):
            for f in _features(text or ""):
                w = self.cgram_weight if f[:1] == "c" and f[2:3] == ":" else 1.0
                if w:
                    counts[i, _bucket(f, self.buckets)] += w
        return counts

    # 8192 rows x 16384 buckets scatter = 537 MB f32 — the corpus-build chunk;
    # through a tunneled device the per-chunk dispatch RTT dominates encode at
    # scale, so fewer/bigger chunks win (1M docs: 1024 -> 128 dispatches)
    _CHUNKS = (16, 64, 256, 1024, 8192)

    def encode_device(self, texts: List[str], chunk: int | None = None,
                      idf: np.ndarray | None = None,
                      assoc=None, basis: np.ndarray | None = None) -> jnp.ndarray:
        """Batch encode in fixed-size chunks; counts ship to the device as sparse
        COO triplets (padded to a static nnz bucket so jit doesn't respecialize),
        scattered and projected on device.

        ``chunk=None`` picks the smallest bucket from ``_CHUNKS`` that fits the
        batch — a serving-path query batch of 16 must not pay the build-path's
        1024-row scatter+matmul (~60x the work). The bucket set keeps the total
        number of compiled shapes bounded (remote compiles through the device
        tunnel cost tens of seconds each).

        ``idf`` ([buckets] f32, optional) weights features before projection —
        corpus-frequency weights computed at index-build time (graph/host.py)
        and applied identically to documents and queries.

        ``basis`` ([buckets, dim] f32, optional) replaces the fixed Gaussian
        projection with a corpus-fitted LSA basis (see ``fit_projection``).
        """
        if not texts:
            return jnp.zeros((0, self.dim), dtype=jnp.float32)
        if chunk is None:
            # smallest bucket covering the batch — unless it would more than
            # double the padded work (e.g. 2k docs must loop 1024-chunks, not
            # pay one 8192-row scatter+matmul), then loop the largest bucket
            # that fits
            up = [c for c in self._CHUNKS if c >= len(texts)]
            if up and (up[0] <= 2 * len(texts) or up[0] == self._CHUNKS[0]):
                chunk = up[0]
            else:
                chunk = max(c for c in self._CHUNKS if c <= len(texts))
        idf_dev = jnp.asarray(np.ones(self.buckets, np.float32) if idf is None
                              else np.asarray(idf, np.float32))
        proj = self._proj if basis is None else jnp.asarray(
            np.asarray(basis, np.float32))
        # rows padded to the full chunk, nnz padded to a fixed per-chunk cap, so
        # every call at a given chunk size reuses ONE compiled shape
        fixed_cap = chunk * 256
        outs = []
        for i in range(0, len(texts), chunk):
            block = texts[i:i + chunk]
            coo = self._coo_block(block)
            if coo is None:
                counts = self._count_matrix(block)
                rows, cols = np.nonzero(counts)
                vals = counts[rows, cols]
            else:
                rows, cols, vals = coo
            if assoc is not None:  # query-side co-occurrence expansion
                rows, cols, vals = self.expand_coo(
                    np.asarray(rows), np.asarray(cols),
                    np.asarray(vals, np.float32), assoc)
            nnz = len(rows)
            cap = fixed_cap if nnz <= fixed_cap else 1 << (nnz - 1).bit_length()
            pad = cap - nnz
            rows = np.concatenate([rows, np.full(pad, chunk)]).astype(np.int32)
            cols = np.concatenate([cols, np.zeros(pad)]).astype(np.int32)
            vals = np.concatenate([vals, np.zeros(pad)]).astype(np.float32)
            out = _project_normalize_sparse(
                jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
                proj, idf_dev, n_rows=chunk)
            outs.append(out[: len(block)])
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def encode(self, texts: List[str], idf: np.ndarray | None = None,
               assoc=None, basis: np.ndarray | None = None) -> np.ndarray:
        return np.asarray(self.encode_device(texts, idf=idf, assoc=assoc,
                                             basis=basis))

    def _tfidf_block(self, block: List[str], idf_v: np.ndarray) -> np.ndarray:
        """Dense sublinear-TF x IDF rows for ``block`` — the exact weighting
        ``_project_normalize`` applies (incl. the fractional-count ramp),
        materialized on host for fitting."""
        counts = self._count_matrix(block)
        tf = (np.minimum(counts, 1.0)
              * (1.0 + np.log(np.maximum(counts, 1.0)))).astype(np.float32)
        return tf * idf_v[None, :]

    def fit_projection(self, texts: List[str], idf: np.ndarray | None = None,
                       sample: int = 20000, oversample: int = 48,
                       chunk: int = 1024) -> np.ndarray | None:
        """Corpus-fitted LSA basis ([buckets, dim] f32) replacing the fixed
        Gaussian projection for this corpus.

        Why: the Johnson-Lindenstrauss projection preserves cosines only to
        ~1/sqrt(dim) ≈ 0.05 — the same order as the true lexical score gaps on
        entity-dense corpora, so random-projection noise can reorder top-k
        (measured: a gold node at exact-cosine rank 0 fell to rank 6 through
        the Gaussian). The fix is the projection the corpus itself prescribes:

        - n_docs <= dim: an orthonormal basis of the corpus row span (economy
          SVD right singular vectors). Every document lies in the span, so
          doc-query inner products through the basis equal the EXACT hashed
          TF-IDF cosine up to the query's (ranking-irrelevant) out-of-span
          component — per-question KGs get exact lexical ranking.
        - n_docs > dim: top-dim LSA via two-pass randomized SVD (chunked so
          the dense [n, buckets] matrix never materializes; rows re-hashed in
          the second pass instead of cached — featurization is cheaper than
          1GB+ of resident TF-IDF). Deterministic (seeded by ``self.seed``).

        This is the capability the reference buys with a pretrained dense
        encoder (hierarchical_graph.py:709-712) rebuilt from corpus statistics:
        LSA additionally smooths synonymy at scale (docs sharing co-occurring
        vocabulary project nearby). Incremental upserts reuse the stored basis
        (out-of-span components of genuinely novel docs are dropped until the
        next full build — same refresh contract as the IDF weights).
        """
        n = len(texts)
        if n < 2:
            return None
        if n > sample:  # deterministic stride sample bounds fitting cost
            step = n / sample
            texts = [texts[int(i * step)] for i in range(sample)]
            n = len(texts)
        idf_v = (np.ones(self.buckets, np.float32) if idf is None
                 else np.asarray(idf, np.float32))
        if n <= self.dim:
            A = np.concatenate([self._tfidf_block(texts[i:i + chunk], idf_v)
                                for i in range(0, n, chunk)], axis=0)
            _, s, vt = np.linalg.svd(A, full_matrices=False)
            r = int((s > (s[0] if s.size else 0.0) * 1e-6).sum())
            if r == 0:
                return None
            basis = np.zeros((self.buckets, self.dim), np.float32)
            basis[:, :r] = vt[:r].T
            return basis
        # two-pass randomized SVD for the top-dim right-singular subspace
        rng = np.random.default_rng(self.seed)
        k = min(self.dim + oversample, n)
        G = rng.standard_normal((self.buckets, k)).astype(np.float32)
        Y = np.empty((n, k), np.float32)
        for i in range(0, n, chunk):
            X = self._tfidf_block(texts[i:i + chunk], idf_v)
            Y[i:i + len(X)] = np.asarray(
                jnp.dot(jnp.asarray(X), jnp.asarray(G),
                        preferred_element_type=jnp.float32))
        Q, _ = np.linalg.qr(Y)
        Bmat = np.zeros((k, self.buckets), np.float32)
        for i in range(0, n, chunk):
            X = self._tfidf_block(texts[i:i + chunk], idf_v)
            Bmat += np.asarray(
                jnp.dot(jnp.asarray(Q[i:i + len(X)].T), jnp.asarray(X),
                        preferred_element_type=jnp.float32))
        _, _, vt = np.linalg.svd(Bmat, full_matrices=False)
        basis = vt[: self.dim].T.astype(np.float32)
        if basis.shape[1] < self.dim:
            basis = np.pad(basis, ((0, 0), (0, self.dim - basis.shape[1])))
        return basis

    def document_frequencies(self, texts: List[str], chunk: int = 1024) -> np.ndarray:
        """Per-bucket document frequencies over ``texts`` ([buckets] int64)."""
        df = np.zeros(self.buckets, np.int64)
        for i in range(0, len(texts), chunk):
            block = texts[i:i + chunk]
            coo = self._coo_block(block)
            if coo is None:
                counts = self._count_matrix(block)
                df += (counts > 0).sum(axis=0)
            else:  # one triplet per (doc, bucket) => bincount(cols) = df
                df += np.bincount(coo[1], minlength=self.buckets)
        return df

    def train_associations(self, texts: List[str], m: int = 4,
                           max_active: int = 8192, beta: float = 0.35,
                           sample: int = 20000, chunk: int = 1024,
                           min_df: int = 2):
        """Corpus-trained bucket associations for query expansion.

        The hashed encoder is purely lexical — "Norwegian" and "Norway" land in
        unrelated buckets, so a question phrased with vocabulary the gold
        paragraph never uses gets no seed signal (the capability MiniLM gives
        the reference for free, hierarchical_graph.py:709-712). This learns a
        corpus co-occurrence structure instead: document-level bucket
        co-occurrence counts ``C = X^T X`` (chunked matmul on the default
        device), PPMI weighting, top-``m`` associations per bucket. Applied to
        QUERIES ONLY (``encode(..., assoc=...)``): each query feature adds
        ``beta``-scaled mass to its associated buckets before projection, so
        the query reaches documents that say the same thing differently.
        Document embeddings are untouched (incremental indexing stays valid).

        Returns ``(assoc_idx [buckets, m] int32 (-1 pad), assoc_w [buckets, m]
        float32)`` or ``None`` when the corpus is too small to train on.
        """
        import jax.numpy as jnp

        if len(texts) < 8:
            return None
        if len(texts) > sample:  # deterministic sample bounds training cost
            step = len(texts) / sample
            texts = [texts[int(i * step)] for i in range(sample)]
        df = self.document_frequencies(texts, chunk=chunk)
        active = np.flatnonzero(df >= min_df)
        if active.size < 2:
            return None
        if active.size > max_active:
            order = np.argsort(-df[active], kind="stable")
            active = np.sort(active[order[:max_active]])
        amap = np.full(self.buckets, -1, np.int32)
        amap[active] = np.arange(active.size, dtype=np.int32)

        a = active.size
        C = jnp.zeros((a, a), jnp.float32)
        n_docs = 0
        for i in range(0, len(texts), chunk):
            block = texts[i:i + chunk]
            coo = self._coo_block(block)
            if coo is None:
                counts = self._count_matrix(block)
                rows, cols = np.nonzero(counts)
            else:
                rows, cols = coo[0], coo[1]
            keep = amap[cols] >= 0
            X = np.zeros((len(block), a), np.float32)
            X[rows[keep], amap[cols[keep]]] = 1.0   # binary incidence
            C = C + jnp.dot(jnp.asarray(X).T, jnp.asarray(X),
                            preferred_element_type=jnp.float32)
            n_docs += len(block)
        C = np.asarray(C)
        occ = np.maximum(np.diag(C), 1.0)
        # PPMI over document-level co-occurrence
        with np.errstate(divide="ignore"):
            pmi = np.log((C * n_docs) / (occ[:, None] * occ[None, :]))
        pmi[~np.isfinite(pmi)] = 0.0
        np.fill_diagonal(pmi, 0.0)
        pmi = np.maximum(pmi, 0.0)
        top = np.argsort(-pmi, axis=1, kind="stable")[:, :m]
        top_w = np.take_along_axis(pmi, top, axis=1)
        row_max = np.maximum(top_w[:, :1], 1e-9)
        w = (beta * top_w / row_max).astype(np.float32)
        w[top_w <= 0.0] = 0.0
        assoc_idx = np.full((self.buckets, m), -1, np.int32)
        assoc_w = np.zeros((self.buckets, m), np.float32)
        assoc_idx[active] = active[top].astype(np.int32)
        assoc_w[active] = w
        assoc_idx[active][assoc_w[active] <= 0] = -1  # no-op guard (copy)
        return assoc_idx, assoc_w

    @staticmethod
    def expand_coo(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                   assoc) -> tuple:
        """Apply trained associations to COO feature triplets (query side):
        each (row, col, val) adds (row, assoc_idx[col, j], val * assoc_w[col, j])."""
        assoc_idx, assoc_w = assoc
        ai = assoc_idx[cols]                       # [nnz, m]
        aw = assoc_w[cols]
        keep = (ai >= 0) & (aw > 0)
        if not keep.any():
            return rows, cols, vals
        r2 = np.broadcast_to(rows[:, None], ai.shape)[keep]
        c2 = ai[keep]
        v2 = (vals[:, None] * aw)[keep]
        return (np.concatenate([rows, r2]), np.concatenate([cols, c2]),
                np.concatenate([vals, v2]).astype(np.float32))
