"""Encoder protocol.

The reference uses sentence-transformers MiniLM for all embedding work
(aggregate/semantic_aggregator.py:47,71; graph/hierarchical_graph.py:655,709-712).
Here encoders are first-party JAX models behind one protocol:

- ``encode(texts) -> np.ndarray [n, dim]`` L2-normalized float32 (host-visible);
- ``encode_device(texts) -> jnp.ndarray`` same, left on device for fusion with search;
- ``dim`` / ``name`` identify the embedding space (persisted in graph meta so a loaded
  snapshot is self-describing, mirroring hierarchical_graph.py:204-217).
"""
from __future__ import annotations

from typing import List, Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class Encoder(Protocol):
    name: str
    dim: int

    def encode(self, texts: List[str]) -> np.ndarray: ...

    def encode_device(self, texts: List[str]): ...
