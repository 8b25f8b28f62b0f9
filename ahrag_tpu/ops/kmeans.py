"""Spherical k-means on device — the build-time clustering primitive.

Replaces the reference's UMAP+HDBSCAN/BERTopic stack (semantic_aggregator.py:96-121)
with a JAX-native method: cosine k-means over normalized embeddings, fixed-iteration
``lax.scan`` (compiler-friendly, deterministic), strided-seeded init. The soft
topic-membership probabilities the artifact contract needs come from a temperature
softmax over centroid cosines (aggregate/cluster.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def spherical_kmeans(emb: jnp.ndarray, k: int, iters: int = 25,
                     seed: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster normalized rows of ``emb [N, D]`` into ``k`` cosine clusters.

    Returns (assignments [N] int32, centroids [k, D] normalized). Deterministic:
    k-means++-style greedy farthest-point init from a seeded start.
    """
    n = emb.shape[0]
    emb = _normalize(emb)

    start = jax.random.randint(jax.random.PRNGKey(seed), (), 0, n)
    first = emb[start]

    def init_step(carry, _):
        cents, count, best_sim = carry
        # pick the point least similar to any chosen centroid
        nxt = jnp.argmin(best_sim)
        cents = cents.at[count].set(emb[nxt])
        best_sim = jnp.maximum(best_sim, emb @ emb[nxt])
        return (cents, count + 1, best_sim), None

    cents0 = jnp.zeros((k, emb.shape[1]), emb.dtype).at[0].set(first)
    (cents, _, _), _ = jax.lax.scan(
        init_step, (cents0, 1, emb @ first), None, length=max(k - 1, 0))

    def em_step(cents, _):
        sims = emb @ cents.T                                  # [N, k]
        assign = jnp.argmax(sims, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=emb.dtype)   # [N, k]
        sums = onehot.T @ emb                                 # [k, D]
        counts = onehot.sum(axis=0)[:, None]
        new = jnp.where(counts > 0, _normalize(sums), cents)  # keep empty clusters
        return new, None

    cents, _ = jax.lax.scan(em_step, cents, None, length=iters)
    assign = jnp.argmax(emb @ cents.T, axis=1).astype(jnp.int32)
    return assign, cents
