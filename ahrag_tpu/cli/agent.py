"""Agent CLI (parity with scripts/agent_cli.py): run one agent episode."""
from __future__ import annotations

import argparse
import json

from ahrag_tpu.agent.agent import AHRAG_Agent, run_agent_once
from ahrag_tpu.agent.environment import GraphEnvironment


def main() -> None:
    ap = argparse.ArgumentParser(description="Run the rule/LLM agent once")
    ap.add_argument("query")
    ap.add_argument("--graph", default="graph")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--llm", action="store_true")
    args = ap.parse_args()
    env = GraphEnvironment(graph_dir=args.graph)
    agent = AHRAG_Agent(env, use_llm=args.llm)
    obs, summary = run_agent_once(env, agent, args.query, steps=args.steps)
    print(json.dumps(summary, ensure_ascii=False, indent=2, default=str))


if __name__ == "__main__":
    main()
