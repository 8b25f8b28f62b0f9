#!/usr/bin/env python3
"""Reward matrix for the retrieval-knob policy (round-5 PPO unfreeze lever).

For every v5 item and every knob configuration, run the FULL inference
pipeline (per-question KG, one build per item reused across configs) and
record F1 plus the retrieved-node set. The environment is deterministic, so
this is the complete bandit feedback: agent/knob_policy.py trains on the
train-split matrix and is measured on dev (test runs once at round end).

The retrieved-set hashes per config double as the "lever verifiably wired"
evidence VERDICT r4 item 6 asks for: configs that cannot change the
retrieved set would all hash identically.

Usage: python tools/knob_sweep.py [--split train|dev|test] [--limit N]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the discrete lever: each config changes the retrieved set through rescue
# width, evidence caps, or hop budget (InferenceEngine.DEFAULT_KNOBS is C0)
CONFIGS = [
    {"name": "default", "knobs": {}},
    {"name": "no_rescue", "knobs": {"rescue_top_n": 0,
                                    "rescue_clause_top_n": 0}},
    {"name": "wide_rescue", "knobs": {"rescue_top_n": 6,
                                      "rescue_clause_top_n": 3}},
    {"name": "wide_evidence", "knobs": {"max_entities": 9,
                                        "max_summaries": 4}},
    {"name": "narrow", "knobs": {"max_entities": 3, "max_summaries": 2,
                                 "hops": 1}},
    {"name": "wide_all", "knobs": {"rescue_top_n": 6,
                                   "rescue_clause_top_n": 3,
                                   "max_entities": 9, "hops": 3}},
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", default="train")
    ap.add_argument("--version", default="v5")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ahrag_tpu.agent.agent import AHRAG_Agent
    from ahrag_tpu.agent.environment import GraphEnvironment
    from ahrag_tpu.agent.inference import InferenceEngine
    from ahrag_tpu.cli.benchmark import build_question_graph
    from ahrag_tpu.eval.answer_eval import squad_f1_em
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
        with tempfile.TemporaryDirectory() as workdir:
            hg = build_question_graph(it["context"], workdir)
            per_cfg = []
            for c in CONFIGS:
                env = GraphEnvironment(hg=hg, log_level="off")
                engine = InferenceEngine(env, AHRAG_Agent(env))
                out = engine.run_inference(
                    it["question"],
                    steps=int(cfg.get("inference", {}).get("steps", 4)),
                    knobs=c["knobs"])
                sc = squad_f1_em(out.get("answer", ""), it["answers"])
                retrieved = sorted(out.get("retrieved_nodes") or [])
                per_cfg.append({
                    "config": c["name"], "f1": sc["f1"], "em": sc["em"],
                    "n_retrieved": len(retrieved),
                    "retrieved_hash": hashlib.sha1(
                        "|".join(retrieved).encode()).hexdigest()[:10]})
            rows.append({"id": it.get("id"), "qtype": it.get("qtype"),
                         "question": it["question"], "configs": per_cfg})
        if (ix + 1) % 20 == 0:
            print(f"[sweep] {ix + 1}/{len(items)}", flush=True)

    # aggregate: per-config mean f1 + how often the retrieved set differs
    agg = {}
    for ci, c in enumerate(CONFIGS):
        f1s = [r["configs"][ci]["f1"] for r in rows]
        differs = [r["configs"][ci]["retrieved_hash"]
                   != r["configs"][0]["retrieved_hash"] for r in rows]
        agg[c["name"]] = {"mean_f1": round(sum(f1s) / len(f1s), 2),
                          "retrieved_differs_vs_default":
                              round(sum(differs) / len(rows), 3)}
    oracle = sum(max(c["f1"] for c in r["configs"]) for r in rows) / len(rows)
    report = {"split": args.split, "n": len(rows),
              "per_config": agg, "oracle_f1": round(oracle, 2),
              "items": rows}
    tag = "" if args.version == "v5" else f"_{args.version}"
    out = args.out or os.path.join(REPO, "reports",
                                   f"knob_rewards{tag}_{args.split}_r5.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"split": args.split, "n": len(rows),
                      "per_config": agg, "oracle_f1": report["oracle_f1"]}))


if __name__ == "__main__":
    main()
