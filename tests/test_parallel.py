import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ahrag_tpu.agent.featurizer import OBS_DIM
from ahrag_tpu.agent.ppo import (PPOConfig, PPOLearner, compute_gae, gae_device,
                                 make_sharded_train_step)
from ahrag_tpu.graph.search import SearchWeights, hybrid_search
from ahrag_tpu.ops.topk import dense_topk_xla
from ahrag_tpu.parallel.mesh import CORPUS_AXIS, make_mesh
from ahrag_tpu.parallel.sharded import (shard_graph_tensors, shard_queries,
                                        sharded_dense_topk)
from tests.helpers import build_film_graph


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=2)
    assert mesh.shape == {"dp": 2, "corpus": 4}


def test_sharded_topk_matches_flat():
    rng = np.random.default_rng(0)
    n, d, b, k = 1024, 64, 3, 7
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    mesh = make_mesh(dp=1)  # 8 corpus shards
    fv, fi = dense_topk_xla(q, e, jnp.int32(1000), k)
    sv, si = sharded_dense_topk(q, e, 1000, k, mesh)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(fi))
    np.testing.assert_allclose(np.asarray(sv), np.asarray(fv), rtol=1e-5)


def test_sharded_topk_tie_break_across_shards():
    # identical rows across shard boundaries: lowest global index must win
    e = np.zeros((1024, 64), np.float32)
    e[:, 0] = 1.0
    q = np.zeros((1, 64), np.float32)
    q[0, 0] = 1.0
    mesh = make_mesh(dp=1)
    sv, si = sharded_dense_topk(jnp.asarray(q), jnp.asarray(e), 1024, 5, mesh)
    np.testing.assert_array_equal(np.asarray(si)[0], np.arange(5))


def test_sharded_hybrid_search_matches_unsharded():
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    gt = hg.tensors()
    q = jnp.asarray(hg.encode_query(["Who directed Ed Wood?"])[0])
    w = SearchWeights.create()
    base = hybrid_search(gt, q, w)
    mesh = make_mesh(dp=1)
    gt_sharded = shard_graph_tensors(gt, mesh)
    sharded = hybrid_search(gt_sharded, q, w)  # GSPMD partitions the same jit
    np.testing.assert_array_equal(np.asarray(base.reranked_idx),
                                  np.asarray(sharded.reranked_idx))
    np.testing.assert_allclose(np.asarray(base.reranked_score),
                               np.asarray(sharded.reranked_score), rtol=1e-5)


def test_gae_device_matches_host():
    rewards = np.array([[1.0, 0.0, 1.0, 0.0]], np.float32)
    values = np.array([[0.5, 0.5, 0.5, 0.0]], np.float32)
    dones = np.array([[False, False, True, False]])
    mask = np.array([[True, True, True, False]])
    d_adv, d_ret = gae_device(jnp.asarray(rewards), jnp.asarray(values),
                              jnp.asarray(dones), jnp.asarray(mask))
    h_adv, h_ret = compute_gae([1.0, 0.0, 1.0], [0.5, 0.5, 0.5],
                               [False, False, True])
    np.testing.assert_allclose(np.asarray(d_adv)[0, :3], h_adv, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_ret)[0, :3], h_ret, rtol=1e-4, atol=1e-5)
    assert float(d_adv[0, 3]) == 0.0  # masked tail


def test_sharded_train_step_runs_on_mesh():
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    gt = hg.tensors()
    mesh = make_mesh(dp=2)
    gt_sharded = shard_graph_tensors(gt, mesh)
    qs = hg.encode_query(["Who directed Ed Wood?", "American directors",
                               "Doctor Strange", "Tim Burton films"])
    q_sharded = shard_queries(jnp.asarray(qs), mesh)
    learner = PPOLearner(OBS_DIM, 6, PPOConfig(epochs=1))
    step = make_sharded_train_step(learner, SearchWeights.create(), max_steps=3)
    params, opt_state, metrics = step(gt_sharded, q_sharded, learner.params,
                                      learner.opt_state, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["policy_loss"]))
    assert np.isfinite(float(metrics["mean_ep_reward"]))
    # params actually updated
    leaf0 = jax.tree_util.tree_leaves(learner.params)[0]
    leaf1 = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_minilm_tensor_parallel_matches_replicated():
    from ahrag_tpu.models.encoder.minilm import MiniLMConfig, MiniLMEncoder
    from ahrag_tpu.parallel.sharded import shard_minilm_params

    enc = MiniLMEncoder(MiniLMConfig(layers=2, max_len=16), seed=0)
    base = enc.encode(["hello world", "tensor parallel encoders"])
    mesh = make_mesh(dp=1)  # 8-way tp over the ffn/head axis
    sharded_params = shard_minilm_params(enc.params, mesh)
    ids, attn = enc._tokenize(["hello world", "tensor parallel encoders"])
    out = jax.jit(lambda p, i, m: enc.model.apply({"params": p}, i, m))(
        sharded_params, jnp.asarray(ids), jnp.asarray(attn))
    np.testing.assert_allclose(base, np.asarray(out), rtol=2e-4, atol=2e-5)


def test_distributed_initialize_single_process_noop(monkeypatch):
    from ahrag_tpu.parallel import distributed
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert distributed.initialize() is False  # single process: no-op
    info = distributed.process_info()
    assert info["process_count"] == 1 and info["global_devices"] == 8


def test_sharded_refined_topk_matches_flat():
    from ahrag_tpu.parallel.sharded import sharded_refined_topk
    rng = np.random.default_rng(3)
    n, d, b, k = 2048, 64, 4, 7
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    mesh = make_mesh(dp=1)  # 8 corpus shards
    fv, fi = dense_topk_xla(q, e, jnp.int32(2000), k)
    sv, si = sharded_refined_topk(q, e, 2000, k, mesh)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(fi))
    np.testing.assert_allclose(np.asarray(sv), np.asarray(fv), rtol=1e-5)
    # k larger than the per-shard row count pads with NEG_INF
    sv2, si2 = sharded_refined_topk(q, e, 2000, 300, mesh, margin=4)
    assert sv2.shape == (b, 300) and si2.shape == (b, 300)


def test_sharded_topk_2level_parity():
    """{slice:2, corpus:4} hierarchical merge == flat exact ranking."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ahrag_tpu.ops.topk import NEG_INF
    from ahrag_tpu.parallel.mesh import make_mesh
    from ahrag_tpu.parallel.sharded import SLICE_AXIS, sharded_topk_2level

    rng = np.random.default_rng(9)
    n, d, b, k = 1024, 64, 6, 7
    emb = rng.normal(size=(n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.normal(size=(b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    n_valid = n - 100

    mesh = make_mesh(n_devices=8, dp=2, axis_names=(SLICE_AXIS, "corpus"))
    emb_dev = jax.device_put(
        jnp.asarray(emb),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(
            (SLICE_AXIS, "corpus"), None)))
    vals, idx = sharded_topk_2level(jnp.asarray(q), emb_dev, n_valid, k, mesh)

    scores = q @ emb.T
    scores[:, n_valid:] = NEG_INF
    ref = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), ref)
