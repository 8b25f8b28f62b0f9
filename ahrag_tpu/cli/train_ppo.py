"""PPO training CLI (parity with scripts/train_ppo.py) with a --device mode that
runs batched on-device rollouts instead of the host gym loop."""
from __future__ import annotations

import argparse

from ahrag_tpu.agent.gym import AHRAGGymEnv
from ahrag_tpu.agent.ppo import PPOConfig, ppo_train, ppo_train_device
from ahrag_tpu.cli.benchmark import load_dataset, load_local_jsonl


def main() -> None:
    ap = argparse.ArgumentParser(description="Train the PPO traversal policy")
    ap.add_argument("--dataset", default="hotpotqa")
    ap.add_argument("--data", default=None, help="local JSONL dataset path")
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument("--max-steps", type=int, default=6)
    ap.add_argument("--envs", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--graph", default="graph")
    ap.add_argument("--out", default="artifacts/rl/ppo_policy.msgpack")
    ap.add_argument("--device", action="store_true",
                    help="batched on-device rollouts (vec_env) instead of host gym")
    ap.add_argument("--updates", type=int, default=10, help="device-mode updates")
    ap.add_argument("--batch", type=int, default=16, help="device-mode batch size")
    ap.add_argument("--curve-out", default=None,
                    help="device-mode: write the per-update learning curve JSON")
    args = ap.parse_args()

    items = (load_local_jsonl(args.data, limit=args.episodes * args.envs)
             if args.data else load_dataset(args.dataset,
                                            limit=args.episodes * args.envs))
    questions = [i["question"] for i in items]
    cfg = PPOConfig(epochs=args.epochs)
    if args.device:
        from ahrag_tpu.graph import HierarchicalGraph
        from ahrag_tpu.graph.search import SearchWeights
        hg = HierarchicalGraph.load(args.graph)
        gt = hg.tensors()
        q_embs = hg.encode_query(questions)
        ppo_train_device(gt, q_embs, SearchWeights.create(), n_updates=args.updates,
                         max_steps=args.max_steps, batch_size=args.batch,
                         ppo_cfg=cfg, save_path=args.out,
                         curve_out=args.curve_out)
    else:
        ppo_train(lambda: AHRAGGymEnv(graph_dir=args.graph,
                                      max_steps=args.max_steps),
                  questions, total_episodes=args.episodes,
                  max_steps=args.max_steps, ppo_cfg=cfg, save_path=args.out,
                  n_envs=args.envs)


if __name__ == "__main__":
    main()
