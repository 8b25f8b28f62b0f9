"""BC training CLI (parity with scripts/train_bc.py)."""
from __future__ import annotations

import argparse
import json

from ahrag_tpu.agent.bc import train_bc


def main() -> None:
    ap = argparse.ArgumentParser(description="Train a BC policy from trajectories")
    ap.add_argument("--traj", default="artifacts/rl/trajectories.jsonl")
    ap.add_argument("--out", default="artifacts/rl/bc_policy.msgpack")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()
    report = train_bc(args.traj, args.out, epochs=args.epochs, lr=args.lr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
