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
    ap.add_argument("--multi", action="store_true",
                    help="multi-graph fleet: one per-question KG per item, "
                         "vmapped (graph, query) rollouts, terminal "
                         "retrieval-recall reward from gold_titles")
    ap.add_argument("--graphs", type=int, default=32,
                    help="multi-mode fleet size")
    ap.add_argument("--final-reward-weight", type=float, default=4.0)
    ap.add_argument("--updates", type=int, default=10, help="device-mode updates")
    ap.add_argument("--batch", type=int, default=16, help="device-mode batch size")
    ap.add_argument("--curve-out", default=None,
                    help="device-mode: write the per-update learning curve JSON")
    args = ap.parse_args()

    limit = args.graphs if args.multi else args.episodes * args.envs
    items = (load_local_jsonl(args.data, limit=limit)
             if args.data else load_dataset(args.dataset, limit=limit))
    questions = [i["question"] for i in items]
    cfg = PPOConfig(epochs=args.epochs)
    if args.multi:
        from ahrag_tpu.agent.fleet import build_question_fleet
        from ahrag_tpu.agent.ppo import ppo_train_multi
        from ahrag_tpu.graph.search import SearchWeights
        bgts, q_embs, gold_masks, metas = build_question_fleet(items)
        ppo_train_multi(bgts, q_embs, SearchWeights.create(),
                        gold_masks=gold_masks, n_updates=args.updates,
                        max_steps=args.max_steps, ppo_cfg=cfg,
                        save_path=args.out,
                        final_reward_weight=args.final_reward_weight,
                        curve_out=args.curve_out)
    elif args.device:
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
