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


# ---------------------------------------------------------------------------
# Streaming bin-max kernel + exactness certificate (round 2)
# ---------------------------------------------------------------------------
def test_binmax_kernel_matches_numpy():
    from ahrag_tpu.ops.topk import dense_binmax_pallas
    q, e = _mk(n=1024, d=128, b=2, seed=3)
    mask = np.ones(1024, bool)
    mask[100:140] = False
    out = np.asarray(dense_binmax_pallas(q, e, jnp.int32(1000),
                                         jnp.asarray(mask), tile_n=256,
                                         interpret=True))
    scores = np.asarray(q) @ np.asarray(e).T
    scores[:, ~mask] = -1e30
    scores[:, 1000:] = -1e30
    g = 256 // 128
    # bin j of tile t covers rows {t*256 + j + 128*i}
    expected = np.full((2, 4 * 128), -1e30, np.float32)
    for t in range(4):
        tile = scores[:, t * 256:(t + 1) * 256].reshape(2, g, 128)
        expected[:, t * 128:(t + 1) * 128] = tile.max(axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_binned_refined_topk_exact_and_certified():
    from ahrag_tpu.ops.topk import binned_refined_topk
    q, e = _mk(n=2048, d=64, b=4, seed=4)
    mask = jnp.ones(2048, bool)
    vals, idx, cert = binned_refined_topk(q, e, mask, 5, margin=16,
                                          tile_n=256, interpret=True)
    ovals, oidx = _numpy_oracle(q, e, 2048, 5)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-5, atol=1e-5)
    # CPU default matmul == HIGHEST, eps ~1e-7: random data certifies
    assert bool(jnp.all(cert))


def test_binned_refined_topk_hier_select():
    """Hierarchical (superbin) exact selection: oracle parity + certified on
    random data, with real superbin pruning (S=32 superbins > m=13 kept)."""
    from ahrag_tpu.ops.topk import binned_refined_topk
    q, e = _mk(n=8192, d=64, b=4, seed=11)
    mask = np.ones(8192, bool)
    mask[50:300] = False
    vals, idx, cert = binned_refined_topk(q, e, jnp.asarray(mask), 5, margin=8,
                                          tile_n=256, interpret=True,
                                          select="hier")
    scores = np.asarray(q) @ np.asarray(e).T
    scores[:, ~mask] = -np.inf
    oidx = np.argsort(-scores, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    assert bool(jnp.all(cert))


def test_binned_refined_topk_masked():
    from ahrag_tpu.ops.topk import binned_refined_topk
    q, e = _mk(n=1024, d=64, b=2, seed=5)
    mask = np.zeros(1024, bool)
    mask[::3] = True
    vals, idx, cert = binned_refined_topk(q, e, jnp.asarray(mask), 7,
                                          margin=8, tile_n=256, interpret=True)
    scores = np.asarray(q) @ np.asarray(e).T
    scores[:, ~mask] = -np.inf
    oidx = np.argsort(-scores, axis=1, kind="stable")[:, :7]
    np.testing.assert_array_equal(np.asarray(idx), oidx)


def test_certificate_fails_on_adversarial_clustering():
    """Scores packed inside the precision error band must fail the certificate
    (VERDICT r1 item 6's property test) — and the public refined_masked_topk
    must still return the exact answer via the HIGHEST fallback."""
    from ahrag_tpu.ops.topk import (matmul_eps, refined_masked_topk,
                                    refined_masked_topk_cert)
    import jax
    rng = np.random.default_rng(6)
    d = 64
    base = rng.normal(size=(d,)).astype(np.float32)
    base /= np.linalg.norm(base)
    eps = matmul_eps(jax.default_backend(), d)
    # 512 corpus rows = tiny perturbations of one direction: every score sits
    # within a band much narrower than eps around q.base
    e = base[None, :] + rng.normal(size=(512, d)).astype(np.float32) * (eps * 1e-3)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = jnp.asarray(base[None, :])
    mask = jnp.ones(512, bool)
    _, _, cert = refined_masked_topk_cert(q, jnp.asarray(e), mask, 5, margin=8)
    assert not bool(jnp.all(cert))  # the gap cannot beat eps
    vals, idx = refined_masked_topk(q, jnp.asarray(e), mask, 5, margin=8)
    # Near-ties inside the accumulation-noise band have no canonical order —
    # numpy f32 and XLA HIGHEST may legally disagree at the ulp level. The
    # fallback's contract is: every returned row's TRUE (f64) score is within
    # accumulation noise of the true top-k scores.
    true = np.asarray(base, np.float64) @ np.asarray(e, np.float64).T
    true_topk = np.sort(true)[::-1][:5]
    chosen = np.sort(true[np.asarray(idx)[0]])[::-1]
    np.testing.assert_allclose(chosen, true_topk, atol=1e-6)


def test_certificate_passes_on_separated_scores():
    from ahrag_tpu.ops.topk import refined_masked_topk_cert
    q, e = _mk(n=512, d=64, b=2, seed=7)
    vals, idx, cert = refined_masked_topk_cert(q, e, jnp.ones(512, bool), 5,
                                               margin=16)
    ovals, oidx = _numpy_oracle(q, e, 512, 5)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    assert bool(jnp.all(cert))


def test_certificate_whole_corpus_coarse_set():
    """k + margin >= n: every row is re-scored, certificate is unconditional."""
    from ahrag_tpu.ops.topk import refined_masked_topk_cert
    q, e = _mk(n=64, d=32, b=2, seed=8)
    vals, idx, cert = refined_masked_topk_cert(q, e, jnp.ones(64, bool), 5,
                                               margin=100)
    assert bool(jnp.all(cert))
    ovals, oidx = _numpy_oracle(q, e, 64, 5)
    np.testing.assert_array_equal(np.asarray(idx), oidx)


def test_binned_refined_topk_hier_v2_matches_oracle():
    """The supermax-emitting v2 hier path (engaged at B % 128 == 0): oracle
    parity + certificate, with real superbin pruning and a nontrivial mask."""
    from ahrag_tpu.ops.topk import binned_refined_topk
    q, e = _mk(n=8192, d=64, b=128, seed=12)
    mask = np.ones(8192, bool)
    mask[50:300] = False
    vals, idx, cert = binned_refined_topk(q, e, jnp.asarray(mask), 5, margin=8,
                                          tile_n=256, interpret=True,
                                          select="hier")
    scores = np.asarray(q) @ np.asarray(e).T
    scores[:, ~mask] = -np.inf
    oidx = np.argsort(-scores, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    assert bool(jnp.all(cert))


def test_binned_refined_topk_trivial_mask():
    """mask_trivial=True skips in-kernel masking; with an all-true mask over
    real rows the result must equal the masked kernel's bit for bit."""
    from ahrag_tpu.ops.topk import binned_refined_topk
    q, e = _mk(n=8192, d=64, b=128, seed=13)
    mask = jnp.ones(8192, bool)
    v1, i1, c1 = binned_refined_topk(q, e, mask, 5, margin=8, tile_n=256,
                                     interpret=True, select="hier",
                                     mask_trivial=True)
    v2, i2, c2 = binned_refined_topk(q, e, mask, 5, margin=8, tile_n=256,
                                     interpret=True, select="hier",
                                     mask_trivial=False)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert bool(jnp.all(c1)) and bool(jnp.all(c2))


def test_binmax2_kernel_matches_binmax():
    """v2 kernel's bins match the v1 kernel; supermax is the per-tile max."""
    from ahrag_tpu.ops.topk import dense_binmax_pallas, dense_binmax2_pallas
    q, e = _mk(n=1024, d=128, b=2, seed=14)
    mask = np.ones(1024, bool)
    mask[100:140] = False
    v1 = np.asarray(dense_binmax_pallas(q, e, jnp.int32(1000),
                                        jnp.asarray(mask), tile_n=256,
                                        interpret=True))     # [B, nbins]
    bins, smax = dense_binmax2_pallas(q, e, jnp.int32(1000), jnp.asarray(mask),
                                      tile_n=256, interpret=True)
    bins = np.asarray(bins)    # [T, B, 128]
    smax = np.asarray(smax)    # [B, T]
    flat = bins.transpose(1, 0, 2).reshape(2, -1)
    np.testing.assert_array_equal(flat, v1)
    np.testing.assert_array_equal(smax, bins.max(axis=2).T)


def test_binned_refined_topk_binpack_parity():
    """The bin-contiguous candidate gather (emb_binpack) must reproduce the
    row-gather path bit for bit."""
    from ahrag_tpu.ops.topk import binned_refined_topk
    q, e = _mk(n=8192, d=64, b=128, seed=15)
    mask = jnp.ones(8192, bool)
    binpack = jnp.asarray(np.asarray(e).reshape(8, 8, 128, 64)
                          .transpose(0, 2, 1, 3).reshape(1024, 8, 64))
    v1, i1, c1 = binned_refined_topk(q, e, mask, 5, margin=8, tile_n=1024,
                                     interpret=True, select="hier")
    v2, i2, c2 = binned_refined_topk(q, e, mask, 5, margin=8, tile_n=1024,
                                     interpret=True, select="hier",
                                     emb_binpack=binpack)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
