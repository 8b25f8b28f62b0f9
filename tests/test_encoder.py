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
