"""RL-transfer evaluation: trained PPO policy vs the rule agent, held-out data.

VERDICT r1 item 8's "done" check: after multi-graph PPO training
(train_ppo --multi over per-question KGs with the terminal retrieval-recall
reward), does the learned traversal policy match/beat the rule agent on data
neither was tuned against? Runs the standard benchmark twice on the held-out
split — once with the rule agent, once with the PPO policy driving the same
InferenceEngine (cli/benchmark.py:118-134 dispatch) — and reports both plus
the deltas.

Usage:
  python -m ahrag_tpu.cli.rl_transfer --data samples/synth_eval_test.jsonl \
      --model artifacts/rl/ppo_multi.msgpack --limit 100 --out reports/...
"""
from __future__ import annotations

import argparse
import copy
import json
import os
from typing import Any, Dict


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True)
    ap.add_argument("--model", default="artifacts/rl/ppo_multi.msgpack")
    ap.add_argument("--limit", type=int, default=100)
    ap.add_argument("--qtypes", default=None,
                    help="comma-separated question families to keep (e.g. the "
                         "v2 no-name families — the honest condition where "
                         "question-named anchors cannot carry retrieval); "
                         "'no_name' expands to eval.synth.NO_NAME_FAMILIES")
    ap.add_argument("--graph", default="graph",
                    help="shared graph dir (used with --strip-context)")
    ap.add_argument("--strip-context", action="store_true",
                    help="drop per-item contexts so every question runs "
                         "against the SHARED --graph corpus — per-question "
                         "10-paragraph KGs are too small for navigation to "
                         "matter (everything reachable is found regardless "
                         "of policy); a shared world KB is the regime where "
                         "traversal decisions can differ")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ahrag_tpu.cli.benchmark import run_benchmark
    from ahrag_tpu.utils.config import load_config

    data_path = args.data
    if args.qtypes or args.strip_context:
        import tempfile
        if args.qtypes and args.qtypes.strip() == "no_name":
            from ahrag_tpu.eval.synth import NO_NAME_FAMILIES
            keep = set(NO_NAME_FAMILIES)
        elif args.qtypes:
            keep = {q.strip() for q in args.qtypes.split(",") if q.strip()}
        else:
            keep = None
        rows = []
        with open(args.data, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                obj = json.loads(line)
                if keep is not None and obj.get("qtype") not in keep:
                    continue
                if args.strip_context:
                    obj.pop("context", None)
                rows.append(json.dumps(obj, ensure_ascii=False) + "\n")
        tmp = tempfile.NamedTemporaryFile("w", suffix=".jsonl", delete=False,
                                          encoding="utf-8")
        tmp.writelines(rows)
        tmp.close()
        data_path = tmp.name
        print(f"filtered {args.data} to {len(rows)} items "
              f"(qtypes={sorted(keep) if keep else 'all'}, "
              f"strip_context={args.strip_context})")

    base = load_config()
    runs: Dict[str, Any] = {}
    for label, use_ppo in (("rule", False), ("ppo", True)):
        cfg = copy.deepcopy(base)
        cfg.setdefault("rl", {}).setdefault("inference", {})
        cfg["rl"]["inference"]["use_ppo"] = use_ppo
        cfg["rl"]["inference"]["ppo_model_path"] = args.model
        rep = run_benchmark("local", system="ah_rag", limit=args.limit,
                            data_path=data_path, graph_dir=args.graph,
                            config=cfg)
        runs[label] = rep["aggregate"][0]

    keys = ("f1", "em", "retrieval_recall_at_10", "contextual_recall",
            "overall_score")
    delta = {k: round(runs["ppo"][k] - runs["rule"][k], 4) for k in keys}
    out = {"model": args.model, "data": args.data,
           "n": runs["rule"]["n"], "rule": runs["rule"], "ppo": runs["ppo"],
           "ppo_minus_rule": delta}
    print(json.dumps({"rule": {k: round(runs["rule"][k], 3) for k in keys},
                      "ppo": {k: round(runs["ppo"][k], 3) for k in keys},
                      "delta": delta}, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w", encoding="utf-8") as fh:
            json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
