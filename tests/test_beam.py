import jax.numpy as jnp
import numpy as np
import pytest

from ahrag_tpu.graph.beam import beam_search, beam_search_batch
from ahrag_tpu.graph.search import SearchWeights
from tests.helpers import build_film_graph


@pytest.fixture(scope="module")
def hg():
    g = build_film_graph()
    g.build_vector_index(layers=(0, 1, 2))
    g.tensors()
    return g


def test_beam_reaches_multilevel_evidence(hg):
    gt = hg.tensors()
    q = jnp.asarray(hg.encode_query(["Who directed the film Ed Wood?"])[0])
    res = beam_search(gt, q, SearchWeights.create(), beam_width=4, depth=3, top_k=8)
    ids = [hg.idx_to_id(int(i)) for i, ok in zip(np.asarray(res.evidence_idx),
                                                 np.asarray(res.evidence_valid)) if ok]
    # beam must climb the hierarchy: an L2 summary only reachable via parents
    assert "sum:2" in ids
    # and touch the relevant entity neighborhood
    assert hg.find_entity("Tim Burton") in ids or hg.find_entity("Ed Wood") in ids
    assert int(res.visited_count) >= len(ids)


def test_beam_scores_sorted_and_deterministic(hg):
    gt = hg.tensors()
    q = jnp.asarray(hg.encode_query(["American directors"])[0])
    r1 = beam_search(gt, q, SearchWeights.create())
    r2 = beam_search(gt, q, SearchWeights.create())
    np.testing.assert_array_equal(np.asarray(r1.evidence_idx),
                                  np.asarray(r2.evidence_idx))
    s = np.asarray(r1.evidence_score)[np.asarray(r1.evidence_valid)]
    assert (np.diff(s) <= 1e-6).all()


def test_beam_respects_type_filter(hg):
    gt = hg.tensors()
    q = jnp.asarray(hg.encode_query(["American directors"])[0])
    w = SearchWeights.create(type_filter=["summary"])
    res = beam_search(gt, q, w, beam_width=4, depth=3, top_k=8)
    for i, ok in zip(np.asarray(res.evidence_idx), np.asarray(res.evidence_valid)):
        if ok:
            assert hg.nodes[hg.idx_to_id(int(i))]["node_type"] == "summary"


def test_beam_batch(hg):
    gt = hg.tensors()
    qs = jnp.asarray(hg.encode_query(["Ed Wood film", "Doctor Strange"]))
    res = beam_search_batch(gt, qs, SearchWeights.create(), top_k=5)
    assert res.evidence_idx.shape == (2, 5)
    assert np.asarray(res.evidence_valid).any(axis=1).all()
