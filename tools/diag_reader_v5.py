#!/usr/bin/env python3
"""Print reader-alone predictions on failing v5 TRAIN qtypes (diagnostic).

Tuning discipline: train split only, item-level inspection allowed there.
"""
from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FAIL_QTYPES = {"instrument_of", "spouse_of", "spouse_prof", "namesake_prof",
               "award_holder_prof", "person_by_instrument",
               "mentor_birth_city", "mentor_of"}


def main() -> None:
    from ahrag_tpu.answer.extractive import _clean_sentences
    from ahrag_tpu.answer.reader import ReaderAnswerer, select_evidence
    from ahrag_tpu.eval.answer_eval import squad_f1_em
    from ahrag_tpu.models.reader.features import E_LEN

    ckpt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "checkpoints/reader.msgpack")
    reader = ReaderAnswerer(ckpt, min_conf=0.0)
    with open(os.path.join(REPO, "samples/synth_v5_train.jsonl"),
              encoding="utf-8") as fh:
        items = [json.loads(l) for l in fh if l.strip()]
    by_qt = defaultdict(list)
    for it in items:
        if it.get("qtype") in FAIL_QTYPES:
            by_qt[it["qtype"]].append(it)
    for qt, its in sorted(by_qt.items()):
        print(f"===== {qt} ({len(its)})")
        for it in its[:4]:
            ctx = "\n".join(f"[DETAIL:p{i}] " + " ".join(para)
                            for i, para in
                            enumerate(it["context"]["sentences"]))
            sents = _clean_sentences(ctx)
            win = select_evidence(it["question"], sents, budget=E_LEN)
            ans, conf = reader.answer(it["question"], sents)
            sc = squad_f1_em(ans or "", it["answers"])
            gold_in_win = any(it["answers"][0].lower() in s.lower()
                              for s in win)
            print(f"Q: {it['question']}")
            print(f"  gold={it['answers']} pred={ans!r} conf={conf:.2f} "
                  f"f1={sc['f1']:.0f} gold_in_window={gold_in_win} "
                  f"win_sents={len([s for s in win if s])}")


if __name__ == "__main__":
    main()
