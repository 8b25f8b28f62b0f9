"""Query-side co-occurrence expansion (paraphrase reach without egress) and
the MicroBatcher drain-timeout release."""
import threading
import time

import numpy as np
import pytest

from ahrag_tpu.models.encoder.hashed import HashedNGramEncoder


def _corpus():
    # document-level co-occurrence is the trained signal: docs that use the
    # country name AND its adjective together (as real corpora do) give the
    # pair positive PPMI, which lets a query phrased one way reach docs
    # phrased the other way
    docs = []
    for city in ["bergen", "tromso", "oslo", "stavanger", "trondheim",
                 "kristiansand"]:
        docs.append(f"norwegian norway {city}")
    for city in ["lyon", "paris", "nice", "lille", "toulouse", "nantes"]:
        docs.append(f"french france {city}")
    for animal in ["otter", "heron", "badger", "marten", "lynx", "stoat"]:
        docs.append(f"the {animal} hunts near rivers and sleeps at dawn")
    return docs


def test_train_associations_shapes_and_determinism():
    enc = HashedNGramEncoder()
    docs = _corpus()
    a1 = enc.train_associations(docs, min_df=2)
    a2 = enc.train_associations(docs, min_df=2)
    assert a1 is not None
    idx, w = a1
    assert idx.shape == (enc.buckets, 4) and w.shape == (enc.buckets, 4)
    assert np.array_equal(idx, a2[0]) and np.array_equal(w, a2[1])
    assert (w >= 0).all() and (w <= 0.35 + 1e-6).all()


def test_train_associations_too_small_returns_none():
    enc = HashedNGramEncoder()
    assert enc.train_associations(["one tiny doc"]) is None


def test_expansion_bridges_paraphrase_vocabulary():
    """A query saying 'norwegian' must score docs that only say 'norway'
    higher WITH expansion than without (the paraphrase axis MiniLM gives the
    reference for free)."""
    enc = HashedNGramEncoder()
    docs = _corpus()
    assoc = enc.train_associations(docs, min_df=2)
    assert assoc is not None
    target = "the institute keeps its seat in norway near the fjords"
    d = np.asarray(enc.encode([target]))[0]
    q_plain = np.asarray(enc.encode(["norwegian glassblower institute"]))[0]
    q_exp = np.asarray(enc.encode(["norwegian glassblower institute"],
                                  assoc=assoc))[0]
    assert float(q_exp @ d) > float(q_plain @ d)


def test_expand_coo_appends_associated_buckets():
    idx = np.full((16, 2), -1, np.int32)
    w = np.zeros((16, 2), np.float32)
    idx[3] = [7, 9]
    w[3] = [0.3, 0.1]
    rows = np.array([0, 0], np.int64)
    cols = np.array([3, 5], np.int64)
    vals = np.array([2.0, 1.0], np.float32)
    r2, c2, v2 = HashedNGramEncoder.expand_coo(rows, cols, vals, (idx, w))
    assert len(r2) == 4  # two original + two expansions of bucket 3
    assert set(zip(r2.tolist(), c2.tolist())) == {(0, 3), (0, 5), (0, 7), (0, 9)}
    exp = dict(zip(c2.tolist(), v2.tolist()))
    assert exp[7] == pytest.approx(0.6) and exp[9] == pytest.approx(0.2)


def test_assoc_persistence_roundtrip(tmp_path):
    from ahrag_tpu.graph import HierarchicalGraph
    hg = HierarchicalGraph(encoder_name="hashed")
    for i, doc in enumerate(_corpus()):
        hg.add_entity(f"Doc {i}", doc, "concept")
    hg.build_vector_index(layers=(0, 1, 2))
    assert hg._assoc is not None
    q1 = hg.encode_query(["norwegian sculptor"])
    hg.save(str(tmp_path))
    hg2 = HierarchicalGraph.load(str(tmp_path))
    assert hg2._assoc is not None
    np.testing.assert_allclose(q1, hg2.encode_query(["norwegian sculptor"]),
                               rtol=1e-6)


def test_microbatcher_drain_timeout_releases_submitters():
    from ahrag_tpu.serve import MicroBatcher
    release = threading.Event()

    def wedge(batch):
        release.wait(10.0)
        return batch

    mb = MicroBatcher(wedge, max_batch=4, max_wait_s=0.001)
    errs = []

    def submitter():
        try:
            mb.submit("x")
        except RuntimeError as e:
            errs.append(e)

    t = threading.Thread(target=submitter)
    t.start()
    time.sleep(0.15)  # batch picked up, wedged inside process()
    mb.close(drain_timeout_s=0.2)
    t.join(timeout=5.0)
    release.set()
    assert not t.is_alive()
    assert len(errs) == 1 and "drain" in str(errs[0])
