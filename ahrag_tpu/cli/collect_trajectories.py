"""Random-policy trajectory collection (parity with scripts/collect_trajectories.py):
roll the gym with random actions and write JSONL trajectories for BC."""
from __future__ import annotations

import argparse
import json
import os
import random

from ahrag_tpu.agent.gym import AHRAGGymEnv
from ahrag_tpu.cli.benchmark import load_dataset, load_local_jsonl


def main() -> None:
    ap = argparse.ArgumentParser(description="Collect random trajectories")
    ap.add_argument("--dataset", default="hotpotqa")
    ap.add_argument("--data", default=None, help="local JSONL dataset path")
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--graph", default="graph")
    ap.add_argument("--out", default="artifacts/rl/trajectories.jsonl")
    ap.add_argument("--max-steps", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    items = (load_local_jsonl(args.data, limit=args.limit) if args.data
             else load_dataset(args.dataset, limit=args.limit))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    env = AHRAGGymEnv(graph_dir=args.graph, max_steps=args.max_steps)
    rng = random.Random(args.seed)
    with open(args.out, "w", encoding="utf-8") as f:
        for it in items:
            vec, info = env.reset(it["question"])
            traj = {"query": it["question"], "steps": []}
            done = False
            while not done:
                a = rng.randrange(env.action_size)
                nvec, r, done, step_info = env.step(a)
                traj["steps"].append({"action": a, "reward": r,
                                      "obs_vec": [float(v) for v in vec],
                                      "obs_aux": step_info.get("aux", {})})
                vec = nvec
            f.write(json.dumps(traj, ensure_ascii=False) + "\n")
    print(f"Saved trajectories to {args.out}")


if __name__ == "__main__":
    main()
