import jax.numpy as jnp
import numpy as np
import pytest

from ahrag_tpu.ops.topk import dense_topk, dense_topk_pallas, dense_topk_xla, masked_topk


def _mk(n=256, d=64, b=3, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, d)).astype(np.float32)
    e = rng.normal(size=(n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(e)


def _numpy_oracle(q, e, n_valid, k):
    scores = np.asarray(q) @ np.asarray(e).T
    scores[:, n_valid:] = -np.inf
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


def test_xla_topk_matches_numpy():
    q, e = _mk()
    vals, idx = dense_topk_xla(q, e, jnp.int32(200), 10)
    ovals, oidx = _numpy_oracle(q, e, 200, 10)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-5)


@pytest.mark.parametrize("n,tile", [(2048, 512), (1024, 1024), (4096, 1024)])
def test_pallas_interpret_matches_xla(n, tile):
    q, e = _mk(n=n, d=128, b=2, seed=1)
    n_valid = n - 37
    k = 8
    xv, xi = dense_topk_xla(q, e, jnp.int32(n_valid), k)
    pv, pi = dense_topk_pallas(q, e, jnp.int32(n_valid), k, tile_n=tile, interpret=True)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-5, atol=1e-5)


def test_pallas_tie_break_lowest_index():
    # duplicate rows -> tied scores; lowest index must win in both paths
    e = np.zeros((1024, 128), dtype=np.float32)
    e[:, 0] = 1.0  # all identical
    q = np.zeros((1, 128), dtype=np.float32)
    q[0, 0] = 1.0
    xv, xi = dense_topk_xla(jnp.asarray(q), jnp.asarray(e), jnp.int32(1024), 5)
    pv, pi = dense_topk_pallas(jnp.asarray(q), jnp.asarray(e), jnp.int32(1024), 5,
                               tile_n=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(xi)[0], np.arange(5))
    np.testing.assert_array_equal(np.asarray(pi)[0], np.arange(5))


def test_dense_topk_dispatch_cpu():
    q, e = _mk()
    vals, idx = dense_topk(q, e, 256, 5)
    assert vals.shape == (3, 5) and idx.shape == (3, 5)


def test_masked_topk():
    scores = jnp.asarray([[1.0, 5.0, 3.0, 4.0]])
    mask = jnp.asarray([[True, False, True, True]])
    vals, idx = masked_topk(scores, mask, 2)
    np.testing.assert_array_equal(np.asarray(idx)[0], [3, 2])


def test_k_larger_than_valid():
    q, e = _mk(n=64, d=32, b=1)
    vals, idx = dense_topk_xla(q, e, jnp.int32(3), 10)
    v = np.asarray(vals)[0]
    assert (v[3:] <= -1e29).all()  # only 3 real hits


def test_pallas_masked_matches_xla_masked():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, 128)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(2048, 128)).astype(np.float32))
    mask = jnp.asarray(rng.random(2048) > 0.3)
    xv, xi = masked_topk(jnp.dot(q, e.T)[None][0], mask[None, :], 7)
    pv, pi = dense_topk_pallas(q, e, jnp.int32(2048), 7, tile_n=512,
                               interpret=True, mask=mask)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-5)


def test_refined_masked_topk_matches_exact():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(500, 64)).astype(np.float32))
    mask = jnp.asarray(rng.random(500) > 0.2)
    from ahrag_tpu.ops.topk import refined_masked_topk
    rv, ri = refined_masked_topk(q, e, mask, 5, margin=16)
    xv, xi = masked_topk(jnp.dot(q, e.T), jnp.broadcast_to(mask[None, :],
                                                           (3, 500)), 5)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(rv), np.asarray(xv), rtol=1e-5)
