"""bf16 corpus-storage mode (graph/tensors.py emb_dtype / AHRAG_EMB_DTYPE).

Contract: scores are EXACT with respect to the bf16-rounded corpus — a storage
precision choice, not approximate search. bf16 x bf16 products are exact in
f32 accumulation, so the certified top-k's single default-precision pass over
bf16 storage matches a float64 oracle over the same bf16 values.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ahrag_tpu.ops.topk import refined_masked_topk, refined_masked_topk_cert
from tests.helpers import build_film_graph


def _mk(n=512, d=64, b=4, seed=3):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, d)).astype(np.float32)
    e = rng.normal(size=(n, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    return q, e


def test_bf16_topk_exact_vs_f64_of_bf16():
    q, e = _mk()
    qb = jnp.asarray(q).astype(jnp.bfloat16)
    eb = jnp.asarray(e).astype(jnp.bfloat16)
    vals, idx = refined_masked_topk(jnp.asarray(q), eb, jnp.ones(512, bool), 7)
    # oracle: float64 scores over the SAME bf16-rounded values
    true = (np.asarray(qb, np.float64) @ np.asarray(eb, np.float64).T)
    oidx = np.argsort(-true, axis=1, kind="stable")[:, :7]
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    ovals = np.take_along_axis(true, oidx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), ovals, atol=2e-6)


def test_bf16_cert_passes_on_separated_scores():
    q, e = _mk(seed=9)
    eb = jnp.asarray(e).astype(jnp.bfloat16)
    _, _, cert = refined_masked_topk_cert(jnp.asarray(q), eb,
                                          jnp.ones(512, bool), 5, margin=16)
    assert bool(jnp.all(cert))


def test_bf16_graph_tensors_and_search(monkeypatch):
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    gt32 = hg.tensors()
    monkeypatch.setenv("AHRAG_EMB_DTYPE", "bfloat16")
    hg._tensors = None
    gt16 = hg.tensors()
    monkeypatch.delenv("AHRAG_EMB_DTYPE")
    hg._tensors = None
    assert gt16.emb.dtype == jnp.bfloat16 and gt32.emb.dtype == jnp.float32

    from ahrag_tpu.graph.search import SearchWeights, hybrid_search_batch
    q = jnp.asarray(hg.encode_query(["Who directed Ed Wood?",
                                     "film about quantum computing"]))
    w = SearchWeights.create()
    r32 = hybrid_search_batch(gt32, q, w, top_k=5, member_top_m=5)
    r16 = hybrid_search_batch(gt16, q, w, top_k=5, member_top_m=5)
    # deterministic
    r16b = hybrid_search_batch(gt16, q, w, top_k=5, member_top_m=5)
    np.testing.assert_array_equal(np.asarray(r16.reranked_idx),
                                  np.asarray(r16b.reranked_idx))
    # storage rounding may swap genuine near-ties, but the result sets must
    # agree almost everywhere on a well-separated toy graph
    a = set(np.asarray(r32.reranked_idx).ravel().tolist())
    b = set(np.asarray(r16.reranked_idx).ravel().tolist())
    inter = len(a & b) / max(1, len(a | b))
    assert inter >= 0.8, (a, b)
    # scores agree to bf16 rounding of the inputs (~1e-2 on unit vectors)
    np.testing.assert_allclose(np.asarray(r16.reranked_score),
                               np.asarray(r32.reranked_score), atol=2e-2)
