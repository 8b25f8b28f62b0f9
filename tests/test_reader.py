"""Learned span reader: features, meta-data generator, model, bridge.

Test strategy mirrors the repo's parity discipline: the generator's gold
spans must be locatable and decodable (the training signal is sound), the
model must be able to fit the task (a tiny overfit run — learnability is
the property, not a benchmark), and the answer-path hook must fire only
between the fact chain and span scoring.
"""
from __future__ import annotations

import random

import numpy as np

from ahrag_tpu.models.reader import data as rdata
from ahrag_tpu.models.reader.features import (E_LEN, N_SCALARS, Q_LEN,
                                              SEQ_LEN, best_span, decode_span,
                                              featurize, tokenize_evidence)


class TestFeatures:
    def test_shapes_and_masks(self):
        fb, ev = featurize("Who organized the charter of Denlin Korsen?",
                           ["Denlin Korsen is a vintner.", "",
                            "Tarver Melmon reviewed a ledger."])
        assert fb.word_ids.shape == (1, SEQ_LEN)
        assert fb.scalars.shape == (1, SEQ_LEN, N_SCALARS)
        # question tokens fill the front, evidence after Q_LEN
        assert fb.mask[0, 0] and not fb.ev_mask[0, 0]
        assert fb.ev_mask[0, Q_LEN]
        assert fb.segments[0, Q_LEN] == 1 and fb.segments[0, 0] == 0
        # paragraph seam produced two paragraph ids
        assert set(ev.para_of_sent) == {0, 1}

    def test_in_question_flag(self):
        fb, ev = featurize("Where is Korsen?", ["Korsen lives in Meldor."])
        j = ev.tokens.index("Korsen")
        assert fb.scalars[0, Q_LEN + j, 4] == 1.0   # in_q_exact
        j2 = ev.tokens.index("Meldor")
        assert fb.scalars[0, Q_LEN + j2, 4] == 0.0

    def test_year_flag(self):
        fb, ev = featurize("When?", ["It happened in 1987 with 12 crates."])
        y = ev.tokens.index("1987")
        n = ev.tokens.index("12")
        assert fb.scalars[0, Q_LEN + y, 1] == 1.0   # is_year
        assert fb.scalars[0, Q_LEN + n, 1] == 0.0
        assert fb.scalars[0, Q_LEN + n, 2] == 1.0   # is_num

    def test_best_span_sentence_bound(self):
        ev = tokenize_evidence(["Alpha beta gamma.", "Delta epsilon."])
        s = np.full(E_LEN, -1e9, np.float32)
        e = np.full(E_LEN, -1e9, np.float32)
        s[2] = 5.0   # "gamma"
        e[3] = 5.0   # "Delta" — different sentence, must not pair
        e[2] = 1.0
        i, j, _ = best_span(s, e, ev)
        assert (i, j) == (2, 2)
        assert decode_span(ev, i, j) == "gamma"


class TestMetaData:
    def test_gold_spans_locate_and_decode(self):
        rng = random.Random(5)
        located = 0
        for _ in range(60):
            inst = rdata.make_instance(rng)
            fb, ev = featurize(inst.question, inst.sentences)
            span = rdata._locate(ev, inst)
            if span is None:      # only the E_LEN truncation may drop items
                assert len(ev.tokens) == E_LEN
                continue
            i, j = span
            assert decode_span(ev, i, j).lower() == inst.answer.lower()
            located += 1
        assert located >= 55

    def test_deterministic(self):
        a = rdata.make_instance(random.Random(42))
        b = rdata.make_instance(random.Random(42))
        assert a == b

    def test_answer_not_in_question(self):
        rng = random.Random(9)
        for _ in range(40):
            inst = rdata.make_instance(rng)
            assert inst.answer.lower() not in inst.question.lower()

    def test_build_training_arrays(self):
        fb, (gs, ge) = rdata.build_training_arrays(8, seed=3)
        assert fb.word_ids.shape[0] == 8
        assert (gs <= ge).all() and (ge < E_LEN).all()


class TestModelLearns:
    def test_tiny_overfit(self, tmp_path):
        from ahrag_tpu.models.reader.train import train
        meta = train(n_train=96, n_val=32, batch=16, steps=192, scan_len=96,
                     lr=1e-3, seed=11, out=str(tmp_path / "reader"),
                     d_model=64, n_layers=1)
        # learnability: the loss is optimizable far above the ~1/300**2
        # random-span floor. (96 items across 11 question families is too few
        # for held-out generalization at toy scale — that property is carried
        # by the full training run, checkpoints/reader_curve.json val_exact.)
        assert meta["curve"][-1]["train_exact"] > 0.5
        assert meta["final_val_exact"] is not None
        # checkpoint round-trips through the bridge
        from ahrag_tpu.answer.reader import ReaderAnswerer
        r = ReaderAnswerer(str(tmp_path / "reader.msgpack"), d_model=64,
                           n_layers=1, min_conf=0.0)
        inst = rdata.make_instance(random.Random(123))
        ans, conf = r.answer(inst.question, inst.sentences)
        assert isinstance(conf, float)
        assert ans is None or isinstance(ans, str)


class TestAnswerPathHook:
    def test_reader_fires_between_facts_and_spans(self):
        from ahrag_tpu.answer.extractive import extract_answer

        class Stub:
            min_conf = 0.5

            def answer(self, query, sentences):
                assert any("Quillfound" in s for s in sentences)
                return "Stub Answer", 0.9

        ctx = ("- [Quillfound Melsen] (entity) :: Quillfound Melsen "
               "chronicled the registry of Barlin Tolver.")
        out = extract_answer("Who is associated with Quillfound Melsen?",
                             ctx, reader=Stub())
        assert out == "Stub Answer"

    def test_low_confidence_falls_through(self):
        from ahrag_tpu.answer.extractive import extract_answer

        class Stub:
            min_conf = 0.5

            def answer(self, query, sentences):
                return "Stub Answer", 0.1

        ctx = ("- [Quillfound Melsen] (entity) :: Quillfound Melsen "
               "chronicled the registry of Barlin Tolver.")
        out = extract_answer("Who is associated with Quillfound Melsen?",
                             ctx, reader=Stub())
        assert out != "Stub Answer"
