"""Cluster-quality validation: labeled-corpus metrics, density refinements.

Covers the round-2 additions to ``aggregate/aggregator.py`` — centroid merge
(adaptive cluster count) and the z-score outlier cut (HDBSCAN-style noise
topic, reference semantic_aggregator.py:136-141) — plus the external metrics
in ``eval/clustering.py`` that justify them.
"""
import numpy as np
import pytest

from ahrag_tpu.aggregate.aggregator import SemanticAggregator
from ahrag_tpu.eval.clustering import (evaluate_clustering,
                                       make_labeled_entities, nmi, noise_prf,
                                       purity)


# ------------------------------------------------------------------ metrics
def test_purity_perfect_and_mixed():
    assert purity([0, 0, 1, 1], [5, 5, 7, 7]) == 1.0
    # one cluster holding two true labels: majority fraction
    assert purity([0, 0, 0, 0], [5, 5, 7, 7]) == 0.5
    # noise predictions excluded from the denominator
    assert purity([-1, 0, 0], [5, 7, 7]) == 1.0
    assert purity([-1, -1], [0, 1]) == 0.0


def test_nmi_extremes():
    assert nmi([0, 0, 1, 1], [9, 9, 3, 3]) == pytest.approx(1.0, abs=1e-6)
    # single predicted cluster carries no information
    assert nmi([0, 0, 0, 0], [0, 0, 1, 1]) == pytest.approx(0.0, abs=1e-6)
    # collapsing everything to noise also scores ~0
    assert nmi([-1, -1, -1, -1], [0, 0, 1, 1]) == pytest.approx(0.0, abs=1e-6)


def test_noise_prf():
    out = noise_prf([-1, -1, 0, 1], [-1, 0, -1, 1])
    assert out["precision"] == 0.5 and out["recall"] == 0.5
    assert out["f1"] == pytest.approx(0.5)
    assert noise_prf([0, 1], [0, 1]) == {"precision": 0.0, "recall": 0.0,
                                         "f1": 0.0}


def test_labeled_generator_deterministic_and_disjoint():
    e1, l1 = make_labeled_entities(60, 4, seed=9, noise_frac=0.1)
    e2, l2 = make_labeled_entities(60, 4, seed=9, noise_frac=0.1)
    assert e1 == e2 and l1 == l2
    assert sum(1 for t in l1 if t == -1) == 6
    # per-topic vocabularies are disjoint: no shared words across topics
    words_by_topic = {}
    for e, t in zip(e1, l1):
        if t != -1:
            words_by_topic.setdefault(t, set()).update(e["description"].split())
    topics = sorted(words_by_topic)
    for i in topics:
        for j in topics:
            if i < j:
                assert not (words_by_topic[i] & words_by_topic[j])


# ------------------------------------------------- merge (adaptive k) ------
def test_merge_clusters_unions_close_centroids():
    cents = np.array([[1.0, 0.0], [0.999, 0.045], [0.0, 1.0]], np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    assign = np.array([0, 0, 1, 1, 2, 2])
    new_assign, new_cents = SemanticAggregator._merge_clusters(
        assign, cents, threshold=0.9)
    # clusters 0 and 1 (cosine ~0.999) merge; cluster 2 survives
    assert new_cents.shape[0] == 2
    assert len(set(new_assign[:4].tolist())) == 1
    assert new_assign[4] != new_assign[0]
    # centroids stay unit-norm
    assert np.allclose(np.linalg.norm(new_cents, axis=1), 1.0, atol=1e-5)


def test_merge_clusters_transitive():
    # a~b and b~c but a!~c still union all three (union-find transitivity)
    th = np.array([0.0, 0.3, 0.6])
    cents = np.stack([np.cos(th), np.sin(th)], axis=1).astype(np.float32)
    assign = np.array([0, 1, 2])
    new_assign, new_cents = SemanticAggregator._merge_clusters(
        assign, cents, threshold=0.9)  # cos(0.3)~0.955 > .9, cos(0.6)~0.825 < .9
    assert new_cents.shape[0] == 1
    assert len(set(new_assign.tolist())) == 1


def test_end_to_end_purity_on_labeled_corpus():
    entities, labels = make_labeled_entities(240, 6, seed=3, noise_frac=0.0)
    out = evaluate_clustering(entities, labels, prob_threshold=0.05)
    # disjoint vocabularies + hashed encoder: near-perfect external quality
    assert out["purity"] >= 0.95
    assert out["nmi"] >= 0.85
    # merge step keeps the topic count near truth despite sqrt(N/2)~11 initial k
    assert out["n_pred_topics"] <= 10


# -------------------------------------------------- outlier (noise) cut ----
def test_outlier_cut_flags_junk_entities():
    entities, labels = make_labeled_entities(300, 5, seed=11, noise_frac=0.08)
    out = evaluate_clustering(entities, labels, prob_threshold=0.05,
                              outlier_sigma=1.5)
    noise = out["noise"]
    assert noise["recall"] >= 0.5  # most junk entities detected
    assert noise["precision"] >= 0.5  # without dragging in real members
    assert out["purity"] >= 0.9


def test_outliers_have_no_parents_and_skip_members(tmp_path):
    from ahrag_tpu.extract.extractor import HypergraphExtractor
    from ahrag_tpu.schema import Entity, HypergraphExtraction

    entities, labels = make_labeled_entities(120, 3, seed=5, noise_frac=0.1)
    extractions = [HypergraphExtraction(
        hyperedge=f"{e['name']} exists", relation_type="Fact",
        entities=[Entity(name=e["name"], type=e["type"],
                         description=e["description"])],
        confidence_score=8.0) for e in entities]
    agg = SemanticAggregator(encoder_name="hashed", artifact_dir=str(tmp_path))
    agg.embed_l0_entities(extractions)
    res = agg.cluster_entities(outlier_sigma=1.5, prob_threshold=0.05)
    member_names = {m for n in res["l1_nodes"] for m in n["members"]}
    n_no_parent = 0
    for name, parents in res["entity_to_parents"].items():
        if not parents:
            n_no_parent += 1
            assert name not in member_names  # noise is not a member anywhere
        else:
            for p in parents:  # every referenced topic has an L1 node
                assert any(n["topic_id"] == p["topic_id"]
                           for n in res["l1_nodes"])
    assert n_no_parent == res["n_outliers"]


def test_outlier_cut_disabled_keeps_everyone():
    entities, labels = make_labeled_entities(120, 3, seed=5, noise_frac=0.1)
    out = evaluate_clustering(entities, labels, prob_threshold=0.05,
                              outlier_sigma=None)
    assert out["noise"]["recall"] == 0.0
    assert all(p != -1 for p in out["pred"])


def test_pinned_n_topics_skips_merge():
    entities, labels = make_labeled_entities(120, 3, seed=7, noise_frac=0.0)
    out = evaluate_clustering(entities, labels, n_topics=8,
                              outlier_sigma=None)
    assert out["n_pred_topics"] == 8
