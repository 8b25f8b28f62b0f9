"""Observation featurizer: the fixed 84-dim policy input vector.

Layout parity with the reference featurizer (agent/featurizer.py:21-56):
4 globals (step, selection_size, frontier_size, n_seeds) followed by 10 node blocks
of 8 dims (entity/summary/other one-hot, layer, score, semantic, judge, confidence),
zero-padded. Both a host (numpy, dict observation) and a device (pure jnp, EnvState
arrays) implementation share the layout; tests assert they agree.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

K_NODES = 10
NODE_FEATS = 8
OBS_DIM = 4 + K_NODES * NODE_FEATS  # 84


def _node_feats(n: Dict[str, Any]) -> List[float]:
    nt = str(n.get("node_type") or "")
    return [
        1.0 if nt == "entity" else 0.0,
        1.0 if nt == "summary" else 0.0,
        1.0 if nt not in {"entity", "summary"} else 0.0,
        float(n.get("layer") or 0),
        float(n.get("score") or 0.0),
        float(n.get("semantic") or 0.0),
        float(n.get("judge_overall") or 0.0),
        float(n.get("confidence") or 0.0),
    ]


def featurize_observation(obs: Dict[str, Any],
                          k_nodes: int = K_NODES) -> Tuple[np.ndarray, Dict[str, Any]]:
    state = obs.get("state") or {}
    feats: List[float] = [
        float(obs.get("step") or 0),
        float(len(state.get("selection_ids") or [])),
        float(len(state.get("frontier_ids") or [])),
        float(len(obs.get("seeds") or [])),
    ]
    sel = (obs.get("selection") or [])[:k_nodes]
    node_ids = []
    for n in sel:
        feats.extend(_node_feats(n))
        node_ids.append(str(n.get("node_id")))
    feats.extend([0.0] * (NODE_FEATS * (k_nodes - len(sel))))
    return np.asarray(feats, dtype=np.float32), {"top_node_ids": node_ids}


def featurize_device(step: jnp.ndarray, selection_size: jnp.ndarray,
                     frontier_size: jnp.ndarray, n_seeds: jnp.ndarray,
                     top_valid: jnp.ndarray, top_type: jnp.ndarray,
                     top_layer: jnp.ndarray, top_score: jnp.ndarray,
                     top_sem: jnp.ndarray, top_judge: jnp.ndarray,
                     top_conf: jnp.ndarray) -> jnp.ndarray:
    """Device-side featurizer over fixed [K_NODES] per-node arrays (vec_env path).

    ``top_type`` uses GraphTensors ids (0 entity / 1 summary / 2 other); invalid
    slots (``top_valid`` false) contribute all-zero blocks, matching host padding.
    """
    v = top_valid.astype(jnp.float32)
    blocks = jnp.stack([
        v * (top_type == 0), v * (top_type == 1), v * (top_type >= 2),
        v * top_layer.astype(jnp.float32), v * top_score, v * top_sem,
        v * top_judge, v * top_conf,
    ], axis=1)  # [K_NODES, 8]
    head = jnp.stack([step.astype(jnp.float32), selection_size.astype(jnp.float32),
                      frontier_size.astype(jnp.float32), n_seeds.astype(jnp.float32)])
    return jnp.concatenate([head, blocks.reshape(-1)])
