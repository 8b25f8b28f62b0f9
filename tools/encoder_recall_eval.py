#!/usr/bin/env python3
"""Encoder x hints retrieval recall on the v6 vocab-shifted world.

VERDICT r4 item 4's bar: on v6, recall@10 with the LEARNED paraphrase-
contrastive encoder and NO bridge-hint rules must meet or beat the
hashed encoder WITH hints. Four cells so the two axes separate:

  hashed+hints     — the shipped round-4 configuration
  hashed+nohints   — how much of hashed's recall is hint rules
  learned+nohints  — the bar's configuration
  learned+hints    — both levers together

"hints off" = knobs {rescue 0, hops 0}: no constraint-rescue retrieval,
no follow-up/credit hop retrieval — the retrieved set is the anchor
search plus the engine's fixed evidence walk only.

Usage: python tools/encoder_recall_eval.py [--split dev] [--limit N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NOHINT = {"rescue_top_n": 0, "rescue_clause_top_n": 0, "hops": 0}
CELLS = [
    ("hashed_hints", "hashed", {}),
    ("hashed_nohints", "hashed", NOHINT),
    ("learned_nohints", "learned", NOHINT),
    ("learned_hints", "learned", {}),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", default="dev")
    ap.add_argument("--version", default="v6")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ahrag_tpu.agent.agent import AHRAG_Agent
    from ahrag_tpu.agent.environment import GraphEnvironment
    from ahrag_tpu.agent.inference import InferenceEngine
    from ahrag_tpu.cli.benchmark import build_question_graph
    from ahrag_tpu.eval.answer_eval import squad_f1_em
    from ahrag_tpu.eval.retrieval import recall_at_k
    from ahrag_tpu.utils.config import load_config

    cfg = load_config()
    path = os.path.join(REPO, "samples",
                        f"synth_{args.version}_{args.split}.jsonl")
    with open(path, encoding="utf-8") as fh:
        items = [json.loads(l) for l in fh if l.strip()]
    if args.limit:
        items = items[:args.limit]

    rows = []
    for ix, it in enumerate(items):
        row = {"id": it.get("id"), "qtype": it.get("qtype"), "cells": {}}
        for label, enc_name, knobs in CELLS:
            with tempfile.TemporaryDirectory() as workdir:
                hg = build_question_graph(it["context"], workdir,
                                          encoder_name=enc_name)
                env = GraphEnvironment(hg=hg, log_level="off")
                engine = InferenceEngine(env, AHRAG_Agent(env))
                out = engine.run_inference(
                    it["question"],
                    steps=int(cfg.get("inference", {}).get("steps", 4)),
                    knobs=knobs)
                rec = recall_at_k(out.get("retrieved_nodes") or [],
                                  it["gold_titles"], hg, k=10)
                sc = squad_f1_em(out.get("answer", ""), it["answers"])
                row["cells"][label] = {"recall10": round(rec, 3),
                                       "f1": sc["f1"]}
        rows.append(row)
        if (ix + 1) % 10 == 0:
            print(f"[recall] {ix + 1}/{len(items)}", flush=True)

    agg = {}
    for label, _, _ in CELLS:
        rs = [r["cells"][label]["recall10"] for r in rows
              if r["cells"][label]["recall10"] is not None]
        f1s = [r["cells"][label]["f1"] for r in rows]
        agg[label] = {"recall_at_10": round(sum(rs) / max(1, len(rs)), 4),
                      "mean_f1": round(sum(f1s) / len(f1s), 2),
                      "n_recall": len(rs)}
    # per-qtype recall for the two headline cells (descriptor families are
    # where the vocabulary shift bites)
    per_qtype = {}
    for qt in sorted({r["qtype"] for r in rows}):
        sel = [r for r in rows if r["qtype"] == qt]
        per_qtype[qt] = {
            label: round(sum(r["cells"][label]["recall10"] for r in sel
                             if r["cells"][label]["recall10"] is not None)
                         / max(1, len([r for r in sel if
                                       r["cells"][label]["recall10"]
                                       is not None])), 3)
            for label in ("hashed_hints", "learned_nohints")}
    report = {"split": args.split, "version": args.version, "n": len(rows),
              "aggregate": agg, "per_qtype": per_qtype, "items": rows}
    out = args.out or os.path.join(
        REPO, "reports", f"encoder_recall_{args.version}_{args.split}_r5.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"aggregate": agg, "per_qtype": per_qtype}, indent=1))


if __name__ == "__main__":
    main()
