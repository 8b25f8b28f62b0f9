"""CI-style quality gate (parity with scripts/eval_gate.py:11-53): run the
benchmark in-process and assert aggregate F1 >= f1-min and faithfulness >=
faith-min; exit 1 on failure."""
from __future__ import annotations

import argparse
import json
import sys

from ahrag_tpu.cli.benchmark import run_benchmark


def main() -> None:
    ap = argparse.ArgumentParser(description="Evaluation quality gate")
    ap.add_argument("--dataset", default="hotpotqa")
    ap.add_argument("--limit", type=int, default=5)
    ap.add_argument("--data", default=None)
    ap.add_argument("--graph", default="graph")
    ap.add_argument("--out", default="reports/rl_gate.json")
    ap.add_argument("--f1-min", type=float, default=0.55)
    ap.add_argument("--faith-min", type=float, default=0.6)
    args = ap.parse_args()

    report = run_benchmark(args.dataset, system="ah_rag", limit=args.limit,
                           data_path=args.data, graph_dir=args.graph,
                           judge_sample=0.5, out=args.out)
    agg = (report.get("aggregate") or [{}])[0]
    f1 = float(agg.get("f1", 0.0))
    faith = float(agg.get("faithfulness", 0.0))
    passed = (f1 >= args.f1_min) and (faith >= args.faith_min)
    print(json.dumps({"f1": f1, "faithfulness": faith, "passed": passed},
                     indent=2))
    if not passed:
        sys.exit(1)


if __name__ == "__main__":
    main()
