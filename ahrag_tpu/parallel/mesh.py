"""Device mesh construction and sharding helpers.

The scaling axis of this framework is the **corpus** (SURVEY §5.7: "scaling sequence
length" becomes scaling corpus size): the embedding matrix and per-node arrays shard
along the node axis; queries/episodes shard along the data axis. There is no NCCL/
MPI analogue to port (SURVEY §5.8 — the reference has no distributed backend at
all); collectives are XLA's, over ICI, inserted via shard_map / GSPMD.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
CORPUS_AXIS = "corpus"


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              axis_names: Sequence[str] = (DATA_AXIS, CORPUS_AXIS)) -> Mesh:
    """Build a 2-D (dp, corpus) mesh over the first ``n_devices`` devices.

    ``dp`` defaults to 1 (all devices on the corpus axis — retrieval-dominant
    workloads want corpus bandwidth); pass dp>1 to trade corpus shards for data
    parallelism in RL training.
    """
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devices)
    dp = dp or 1
    assert n % dp == 0, f"{n} devices not divisible by dp={dp}"
    arr = np.asarray(devices).reshape(dp, n // dp)
    return Mesh(arr, axis_names=tuple(axis_names))


def corpus_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (node) axis over the corpus axis; replicate the rest."""
    spec = [CORPUS_AXIS] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))
