"""Random-policy trajectory collection (parity with scripts/collect_trajectories.py):
roll the gym with random actions and write JSONL trajectories for BC."""
from __future__ import annotations

import argparse
import json
import os
import random

from ahrag_tpu.agent.gym import AHRAGGymEnv
from ahrag_tpu.cli.benchmark import load_dataset, load_local_jsonl


def collect_device(items, graph_dir: str, out: str, max_steps: int,
                   seed: int) -> None:
    """Batched on-device random-policy collection: all episodes = one XLA program."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ahrag_tpu.agent.vec_env import N_ACTIONS, rollout_batch
    from ahrag_tpu.graph import HierarchicalGraph
    from ahrag_tpu.graph.search import SearchWeights

    hg = HierarchicalGraph.load(graph_dir)
    gt = hg.tensors()
    questions = [it["question"] for it in items]
    q_embs = jnp.asarray(hg.encode_query(questions))

    def random_policy(params, obs):
        logits = jnp.zeros((obs.shape[0], N_ACTIONS))
        value = jnp.zeros(obs.shape[0])
        return logits, value

    traj, _ = rollout_batch(gt, q_embs, None, random_policy,
                            jax.random.PRNGKey(seed), SearchWeights.create(),
                            max_steps=max_steps)
    obs = np.asarray(traj.obs)
    actions = np.asarray(traj.actions)
    rewards = np.asarray(traj.rewards)
    live = np.asarray(traj.mask)
    with open(out, "w", encoding="utf-8") as f:
        for b, q in enumerate(questions):
            steps = [{"action": int(actions[b, t]), "reward": float(rewards[b, t]),
                      "obs_vec": [float(v) for v in obs[b, t]], "obs_aux": {}}
                     for t in range(obs.shape[1]) if live[b, t]]
            f.write(json.dumps({"query": q, "steps": steps},
                               ensure_ascii=False) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser(description="Collect random trajectories")
    ap.add_argument("--dataset", default="hotpotqa")
    ap.add_argument("--data", default=None, help="local JSONL dataset path")
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--graph", default="graph")
    ap.add_argument("--out", default="artifacts/rl/trajectories.jsonl")
    ap.add_argument("--max-steps", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", action="store_true",
                    help="batched on-device collection (vec_env)")
    args = ap.parse_args()

    items = (load_local_jsonl(args.data, limit=args.limit) if args.data
             else load_dataset(args.dataset, limit=args.limit))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    if args.device:
        collect_device(items, args.graph, args.out, args.max_steps, args.seed)
        print(f"Saved trajectories to {args.out}")
        return
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
