import numpy as np

from ahrag_tpu.models.encoder import create_encoder
from ahrag_tpu.models.encoder.hashed import HashedNGramEncoder
from ahrag_tpu.models.encoder.minilm import MiniLMConfig, MiniLMEncoder


def test_hashed_deterministic_and_normalized():
    enc = HashedNGramEncoder()
    e1 = enc.encode(["Tim Burton directed Ed Wood."])
    e2 = enc.encode(["Tim Burton directed Ed Wood."])
    # embedding determinism contract (reference test_embeddings.py:8-20)
    assert float(np.dot(e1[0], e2[0])) > 0.999
    assert abs(np.linalg.norm(e1[0]) - 1.0) < 1e-5
    assert e1.shape == (1, 384)


def test_hashed_lexical_similarity_ordering():
    enc = HashedNGramEncoder()
    q = enc.encode(["Who directed the film Ed Wood?"])[0]
    docs = enc.encode([
        "Ed Wood is a 1994 film directed by Tim Burton.",
        "Scott Derrickson is an American director.",
        "Quantum computing uses qubits for processing.",
    ])
    sims = docs @ q
    assert sims[0] > sims[2] and sims[1] > sims[2]
    assert int(np.argmax(sims)) == 0


def test_hashed_empty_and_batch():
    enc = HashedNGramEncoder()
    assert enc.encode([]).shape == (0, 384)
    out = enc.encode(["a", "b", "c"])
    assert out.shape == (3, 384)


def test_minilm_forward_shapes_and_determinism():
    enc = MiniLMEncoder(MiniLMConfig(layers=2, max_len=16), seed=0)
    a = enc.encode(["hello world", "a longer sentence about films"])
    b = enc.encode(["hello world", "a longer sentence about films"])
    assert a.shape == (2, 384)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-4)


def test_factory_default_and_cache():
    e1 = create_encoder({"encoder": {"name": "hashed", "dim": 384, "seed": 7}})
    e2 = create_encoder({"encoder": {"name": "hashed", "dim": 384, "seed": 7}})
    assert e1 is e2
    assert e1.name.startswith("hashed-ngram")


def test_sparse_and_dense_projection_agree():
    from ahrag_tpu.models.encoder import hashed
    import jax.numpy as jnp
    enc = HashedNGramEncoder()
    texts = ["Tim Burton directed Ed Wood", "quantum computing", "a b c d e"]
    sparse = enc.encode(texts)
    dense = np.asarray(hashed._project_normalize(
        jnp.asarray(enc._count_matrix(texts)), enc._proj,
        jnp.ones(enc.buckets)))
    np.testing.assert_allclose(sparse, dense, rtol=1e-5, atol=1e-6)


def test_lsa_basis_exact_ranking_small_corpus():
    """With a corpus-fitted LSA basis (n_docs <= dim), projected cosine must
    reproduce the EXACT hashed TF-IDF bucket-space ranking — the property that
    motivates fit_projection (Gaussian JL noise ~1/sqrt(dim) reorders top-k
    on entity-dense corpora; see hashed.py::fit_projection)."""
    enc = HashedNGramEncoder()
    docs = [
        "The Thundering Colonnade opened to audiences in 1999 as a work of war cinema.",
        "The life of Boris Moreau has been devoted to days spent as a sculptor.",
        "On The Wandering Quarry, the camera answered to Boris Moreau.",
        "Mexican by heritage, Boris Moreau traces family roots to Guadalajara.",
        "The Distant Meridian opened to audiences in 1993 as a romantic comedy.",
        "Farid Rasmussen, a French sculptor, entered the world at Lyon in 1979.",
    ]
    q = "Who has the leading role in the war film of 1999?"
    df = enc.document_frequencies(docs)
    idf = (np.log((1.0 + len(docs)) / (1.0 + df)) + 1.0).astype(np.float32)
    basis = enc.fit_projection(docs, idf=idf)
    assert basis is not None and basis.shape == (enc.buckets, enc.dim)
    # exact bucket-space TF-IDF cosine
    C = enc._count_matrix(docs + [q])
    # mirrors hashed._tfidf_block incl. the fractional-count ramp (cgram_weight)
    TF = (np.minimum(C, 1.0) * (1.0 + np.log(np.maximum(C, 1.0)))) * idf[None, :]
    N = TF / np.maximum(np.linalg.norm(TF, axis=1, keepdims=True), 1e-9)
    exact = N[:-1] @ N[-1]
    # projected through the fitted basis
    D = enc.encode(docs, idf=idf, basis=basis)
    qv = enc.encode([q], idf=idf, basis=basis)[0]
    proj = D @ qv
    assert list(np.argsort(-exact)) == list(np.argsort(-proj))
    # doc-doc inner products are preserved exactly (all docs lie in the span)
    np.testing.assert_allclose(D @ D.T, N[:-1] @ N[:-1].T, atol=2e-4)


def test_lsa_basis_large_corpus_beats_gaussian():
    """Randomized-SVD path (n_docs > dim): on a corpus with latent topical
    structure (the case LSA targets — real corpora share templates/entities,
    so the TF-IDF spectrum decays), the fitted basis approximates exact bucket
    cosine better than the fixed Gaussian projection. (On spectrum-flat random
    text the truncation necessarily loses mass — not the production regime.)"""
    enc = HashedNGramEncoder(dim=64, buckets=4096)
    rng = np.random.default_rng(0)
    topics = [[f"t{t}w{i}" for i in range(30)] for t in range(8)]
    shared = [f"common{i}" for i in range(20)]
    docs = [" ".join(list(rng.choice(topics[int(rng.integers(8))], size=8))
                     + list(rng.choice(shared, size=4)))
            for _ in range(200)]
    basis = enc.fit_projection(docs)  # 200 > 64 -> randomized path
    assert basis is not None and basis.shape == (4096, 64)
    C = enc._count_matrix(docs)
    TF = np.minimum(C, 1.0) * (1.0 + np.log(np.maximum(C, 1.0)))
    N = TF / np.maximum(np.linalg.norm(TF, axis=1, keepdims=True), 1e-9)
    exact = N @ N.T
    E_lsa = enc.encode(docs, basis=basis)
    E_g = enc.encode(docs)
    err_lsa = np.abs(E_lsa @ E_lsa.T - exact).mean()
    err_g = np.abs(E_g @ E_g.T - exact).mean()
    assert err_lsa < err_g
