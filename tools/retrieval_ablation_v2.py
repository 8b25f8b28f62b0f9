"""Encoder-level retrieval ablation on the v2 no-gold-name questions.

VERDICT r2 item 4: demonstrate paraphrase-robust retrieval without egress —
lift recall@10 on questions that share no entity name with the gold paragraphs
via corpus-trained structure, and report the ablation against the plain hashed
encoder.

Protocol: pool every unique paragraph of the split's world into ONE corpus
(per-item 10-paragraph contexts make recall@10 trivially 1.0 — ten candidates,
ten slots), index it one node per paragraph (the per-paragraph granularity the
reference's Chroma index gives HotpotQA contexts), then run hybrid search on
each question over the full world and measure gold-title recall@10 among
~85 candidates. Variants:

- ``plain``    — hashed n-gram encoder + IDF, fixed Gaussian projection
                 (round-2 configuration);
- ``expanded`` — + corpus-trained PPMI co-occurrence query expansion
                 (models/encoder/hashed.py::train_associations);
- ``lsa``      — corpus-fitted LSA projection, no expansion
                 (models/encoder/hashed.py::fit_projection);
- ``lsa_expanded`` — LSA projection + query expansion (production default).

Run on CPU: ``python tools/cpu_python.py tools.retrieval_ablation_v2 --out
reports/retrieval_ablation_v2_r3.json``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ahrag_tpu.eval.retrieval import recall_at_k
from ahrag_tpu.eval.synth import NO_NAME_FAMILIES


def _load(path):
    with open(path, encoding="utf-8") as f:
        return [json.loads(l) for l in f if l.strip()]


def _index_world(items, train_expansion, fit_lsa=False, extra_worlds=0):
    """One graph over every unique paragraph appearing in the split.

    ``extra_worlds`` > 0 additionally pools paragraphs from that many
    freshly-generated synthetic worlds (seeds 10_000+i) as distractors —
    the split's own paragraphs are inserted FIRST so name collisions drop
    the foreign twin, never the gold. This pushes the corpus past the
    encoder dim so the LSA fit exercises the randomized-SVD path (the
    production regime for real corpora), and recall@10 is measured against
    thousands of candidates instead of ~85."""
    import random

    from ahrag_tpu.eval.synth import make_world
    from ahrag_tpu.graph import HierarchicalGraph
    paragraphs = {}
    for item in items:
        ctx = item["context"]
        for title, sents in zip(ctx["title"], ctx["sentences"]):
            paragraphs.setdefault(title, " ".join(sents))
    for i in range(extra_worlds):
        w = make_world(random.Random(10_000 + i), version="v2")
        for title, sents in w["paragraphs"].items():
            paragraphs.setdefault(title, " ".join(sents))
    hg = HierarchicalGraph(encoder_name="hashed")
    for title, text in paragraphs.items():
        hg.add_entity(title, text, "concept")
    hg.build_vector_index(layers=(0, 1, 2), train_expansion=train_expansion,
                          fit_lsa=fit_lsa)
    return hg


def run_item(item, hg, k=10):
    res = hg.search(item["question"], top_k=k, return_cluster=False)
    ids = [r["node_id"] for r in (res or [])]
    return recall_at_k(ids, item.get("gold_titles") or [], hg, k=k)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=os.path.join(REPO, "samples",
                                                   "synth_v2_test.jsonl"))
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--worlds", type=int, default=0,
                    help="extra distractor worlds pooled into the corpus")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    items = _load(args.data)
    if args.limit:
        items = items[: args.limit]

    xw = args.worlds
    variants = {
        "plain": _index_world(items, train_expansion=False, extra_worlds=xw),
        "expanded": _index_world(items, train_expansion=True, extra_worlds=xw),
        "lsa": _index_world(items, train_expansion=False, fit_lsa=True,
                            extra_worlds=xw),
        "lsa_expanded": _index_world(items, train_expansion=True,
                                     fit_lsa=True, extra_worlds=xw),
    }
    rows = []
    for item in items:
        row = {"id": item["id"], "qtype": item["qtype"],
               "no_name": item["qtype"] in NO_NAME_FAMILIES}
        for name, hg in variants.items():
            row[f"recall_{name}"] = run_item(item, hg)
        rows.append(row)

    def _mean(sel, key):
        xs = [r[key] for r in rows if sel(r)]
        return round(sum(xs) / len(xs), 4) if xs else None

    names = ["plain", "expanded", "lsa", "lsa_expanded"]
    summary = {
        "n_items": len(rows),
        "no_name": {"n": sum(r["no_name"] for r in rows),
                    **{f"recall_at_10_{v}": _mean(lambda r: r["no_name"],
                                                  f"recall_{v}")
                       for v in names}},
        "named": {"n": sum(not r["no_name"] for r in rows),
                  **{f"recall_at_10_{v}": _mean(lambda r: not r["no_name"],
                                                f"recall_{v}")
                     for v in names}},
        "by_qtype": {},
    }
    for qt in sorted({r["qtype"] for r in rows}):
        summary["by_qtype"][qt] = {
            "n": sum(r["qtype"] == qt for r in rows),
            **{v: _mean(lambda r: r["qtype"] == qt, f"recall_{v}")
               for v in names},
        }
    summary["n_corpus_paragraphs"] = int(
        next(iter(variants.values())).stats()["nodes"].get("entity", 0))
    summary["extra_worlds"] = xw
    report = {"dataset": os.path.basename(args.data), "summary": summary,
              "items": rows}
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
