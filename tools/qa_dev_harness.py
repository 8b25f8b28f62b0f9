"""Fast iteration harness for the structural fact-QA layer.

Feeds each synth item's RAW context paragraphs (gold + distractors, shuffled
order as frozen) straight into answer/qa.py + answer/extractive.py, skipping
KG build/retrieval — an upper bound for the answerer given perfect retrieval,
and a per-family diagnosis of which extraction rule is missing. Tuning
discipline: run on train/dev only (synth.py's split contract).

Usage: python tools/qa_dev_harness.py samples/synth_v2_dev.jsonl [--qa-only]
       [--family org_hq] [--show-misses N]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ahrag_tpu.answer.extractive import extract_answer
from ahrag_tpu.answer.qa import answer_from_facts
from ahrag_tpu.eval.answer_eval import squad_f1_em


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("data")
    ap.add_argument("--qa-only", action="store_true",
                    help="fact chain only (no span-scoring fallback)")
    ap.add_argument("--family", default=None)
    ap.add_argument("--show-misses", type=int, default=0)
    args = ap.parse_args()

    per_family = defaultdict(lambda: [0, 0.0, 0])  # n, f1_sum, em_sum
    misses = []
    with open(args.data, encoding="utf-8") as fh:
        items = [json.loads(l) for l in fh if l.strip()]
    for it in items:
        if args.family and it.get("qtype") != args.family:
            continue
        sents = []
        for para in it["context"]["sentences"]:
            sents.extend(para)
        if args.qa_only:
            ans = answer_from_facts(it["question"], sents) or ""
        else:
            # paragraph seams matter: the pipeline's context_text carries
            # block markers that _clean_sentences turns into "" sentinels
            # (subject resets, bridged-pass paragraph rarity). Emulate with
            # one DETAIL block per source paragraph, else the whole context
            # reads as ONE paragraph and cross-paragraph rarity collapses.
            ctx = "\n".join(f"[DETAIL:p{i}] " + " ".join(para)
                            for i, para in enumerate(it["context"]["sentences"]))
            ans = extract_answer(it["question"], ctx) or ""
        golds = it["answers"]
        sc = squad_f1_em(ans, golds)
        f1, em = sc["f1"] / 100.0, int(sc["em"] >= 100)
        fam = it.get("qtype", "?")
        per_family[fam][0] += 1
        per_family[fam][1] += f1
        per_family[fam][2] += em
        if f1 < 0.5:
            misses.append((fam, it["question"], golds, ans))

    tot_n = sum(v[0] for v in per_family.values())
    tot_f1 = sum(v[1] for v in per_family.values())
    tot_em = sum(v[2] for v in per_family.values())
    for fam in sorted(per_family):
        n, f1s, ems = per_family[fam]
        print(f"{fam:28s} n={n:3d} F1={100*f1s/n:6.1f} EM={100*ems/n:6.1f}")
    print(f"{'TOTAL':28s} n={tot_n:3d} F1={100*tot_f1/tot_n:6.1f} "
          f"EM={100*tot_em/tot_n:6.1f}")
    for fam, q, golds, ans in misses[: args.show_misses]:
        print(f"- [{fam}] {q}\n    gold={golds} got={ans!r}")


if __name__ == "__main__":
    main()
