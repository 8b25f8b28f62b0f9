#!/usr/bin/env python3
"""Real-text micro-eval (VERDICT r4 item 5): the only English prose in this
environment NOT authored by the answerer's author.

Corpus: ``samples/realtext_corpus.txt`` — a verbatim copy of the reference's
``samples/hotpotqa_mini.txt`` (24 HotpotQA wikipedia paragraphs: the Scott
Derrickson / Ed Wood distractor set plus Corliss Archer etc.). Questions:
``samples/realtext_qa.jsonl`` — 22 hand-authored Q/A pairs over that prose,
FROZEN at authoring time (round 5). Discipline: run once per round for the
report; no item-level tracing into the tuning loop.

Usage: python tools/run_realtext_eval.py [--out reports/realtext_r5.json]
Forces the CPU backend (the axon sitecustomize would otherwise grab the
exclusive TPU chip for a job that needs none of it).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "reports",
                                                  "realtext_r5.json"))
    ap.add_argument("--corpus", default=os.path.join(REPO, "samples",
                                                     "realtext_corpus.txt"))
    ap.add_argument("--qa", default=os.path.join(REPO, "samples",
                                                 "realtext_qa.jsonl"))
    args = ap.parse_args()

    from ahrag_tpu.cli.benchmark import evaluate_item, run_system
    from ahrag_tpu.cli.demo import run_pipeline
    from ahrag_tpu.utils.config import load_config

    cfg = load_config()
    cfg.setdefault("llm", {})["enabled"] = False

    with open(args.qa, encoding="utf-8") as fh:
        items = [json.loads(l) for l in fh if l.strip()]

    with tempfile.TemporaryDirectory() as workdir:
        hg = run_pipeline(args.corpus,
                          artifacts_dir=os.path.join(workdir, "artifacts"),
                          graph_dir=os.path.join(workdir, "graph"))
        assert hg is not None, "pipeline produced no graph"
        rows = []
        for it in items:
            ans = run_system("ah_rag", it["question"], cfg, hg)
            rows.append(evaluate_item(it, "ah_rag", ans, hg, cfg,
                                      use_llm_judge=False))

    per_family = defaultdict(lambda: {"n": 0, "f1": 0.0, "em": 0.0,
                                      "recall_at_10": 0.0})
    issues = defaultdict(int)
    for r in rows:
        fam = per_family[r["qtype"]]
        fam["n"] += 1
        fam["f1"] += r["f1"]
        fam["em"] += r["em"]
        fam["recall_at_10"] += r["retrieval_recall_at_10"] or 0.0
        issues[r.get("primary_issue", "?")] += 1
    for fam in per_family.values():
        for k in ("f1", "em", "recall_at_10"):
            fam[k] = round(fam[k] / fam["n"], 3)

    n = len(rows)
    report = {
        "corpus": "samples/realtext_corpus.txt (= reference samples/"
                  "hotpotqa_mini.txt, 24 wiki paragraphs)",
        "n_questions": n,
        "graph_nodes": hg.number_of_nodes(),
        "f1": round(sum(r["f1"] for r in rows) / n, 2),
        "em": round(sum(r["em"] for r in rows) / n, 2),
        "recall_at_10": round(sum(r["retrieval_recall_at_10"] or 0.0
                                  for r in rows) / n, 3),
        "per_family": dict(per_family),
        "diagnosis": dict(issues),
        "items": [{k: r.get(k) for k in ("id", "qtype", "f1", "em",
                                         "retrieval_recall_at_10",
                                         "primary_issue")} for r in rows],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in ("n_questions", "f1", "em",
                                             "recall_at_10", "diagnosis")}))


if __name__ == "__main__":
    main()
