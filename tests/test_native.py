import subprocess

import numpy as np
import pytest

from ahrag_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    # build the shared library if the toolchain is present; otherwise the
    # pure-python fallbacks are exercised instead
    import os
    so = os.path.join(os.path.dirname(native.__file__), "libahrag_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.dirname(native.__file__)],
                           check=True, capture_output=True)
            native._tried = False  # force reload
        except Exception:
            pass
    yield


def test_ell_from_edges_order_preserved():
    src = np.array([0, 0, 1, 2, 0, 1], dtype=np.int32)
    dst = np.array([5, 6, 7, 8, 9, 10], dtype=np.int32)
    out = native.ell_from_edges(src, dst, 3, 8, 4)
    np.testing.assert_array_equal(out[0], [5, 6, 9, -1])
    np.testing.assert_array_equal(out[1], [7, 10, -1, -1])
    np.testing.assert_array_equal(out[2], [8, -1, -1, -1])
    assert (out[3:] == -1).all()


def test_ell_truncates_overflow():
    src = np.zeros(10, dtype=np.int32)
    dst = np.arange(10, dtype=np.int32)
    out = native.ell_from_edges(src, dst, 1, 1, 4)
    np.testing.assert_array_equal(out[0], [0, 1, 2, 3])


def test_max_degree():
    src = np.array([0, 0, 0, 1], dtype=np.int32)
    assert native.max_degree(src, 2) == 3
    assert native.max_degree(np.array([], dtype=np.int32), 2) == 0


def test_token_estimate_contract():
    assert native.token_estimate("") == 0
    assert native.token_estimate("hi") >= 1
    short = native.token_estimate("hello world")
    long = native.token_estimate("hello world " * 100)
    assert long > short * 50


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_token_estimate_tracks_tiktoken():
    tiktoken = pytest.importorskip("tiktoken")
    try:
        enc = tiktoken.get_encoding("cl100k_base")  # needs a cached vocab
    except Exception:
        pytest.skip("tiktoken vocab not available offline")
    texts = [
        "The quick brown fox jumps over the lazy dog.",
        "In 1994, Tim Burton directed the film Ed Wood starring Johnny Depp.",
        "Quantum computing leverages superposition and entanglement for speedups.",
    ]
    for t in texts:
        real = len(enc.encode(t))
        est = native.token_estimate(t)
        assert 0.5 * real <= est <= 2.0 * real, (t, real, est)


def test_exact_topk_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(3, 32)).astype(np.float32)
    e = rng.normal(size=(500, 32)).astype(np.float32)
    vals, idx = native.exact_topk(q, e, 7)
    scores = q @ e.T
    ref = np.argsort(-scores, axis=1, kind="stable")[:, :7]
    np.testing.assert_array_equal(idx, ref)
    np.testing.assert_allclose(vals, np.take_along_axis(scores, ref, 1), rtol=1e-5)


def test_exact_topk_tie_break():
    e = np.tile(np.eye(1, 8, dtype=np.float32), (50, 1))  # identical rows
    q = np.eye(1, 8, dtype=np.float32)
    _, idx = native.exact_topk(q, e, 5)
    np.testing.assert_array_equal(idx[0], np.arange(5))


def test_large_graph_ell_path():
    """The >=10k-edge native path in graph compile produces the same table."""
    from ahrag_tpu.graph.tensors import _ell
    rng = np.random.default_rng(0)
    adj = {i: rng.integers(0, 1000, size=12).tolist() for i in range(1000)}
    out = _ell(adj, 1024)
    assert out.shape[0] == 1024
    for i in (0, 500, 999):
        np.testing.assert_array_equal(out[i, :12], adj[i])
