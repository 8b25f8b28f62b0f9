"""GraphTensors: the hierarchical graph compiled to padded device arrays.

This is the TPU-native replacement for the reference's NetworkX DiGraph + Chroma
index (graph/hierarchical_graph.py:21-170,602-673). Node set and per-edge-type
adjacency become static-shaped arrays:

- ``emb [N_pad, D]`` row-normalized embeddings (the vector index);
- per-node scalars: ``node_type`` (0 entity / 1 summary / 2 hyperedge), ``level``,
  ``judge``/``has_judge``, ``conf``/``has_conf``, ``indexed`` (in the vector index),
  ``valid``;
- ELL adjacency ``[N_pad, K]`` int32, -1 padded, one table per typed direction:
  ``parents``   belongs_to out-edges  (get_belongs_to, hierarchical_graph.py:456)
  ``children``  belongs_to in-edges   (get_summary_members, :460)
  ``related``   related_to union of both directions (environment.py:448-453)
  ``hyperedges``participates_in out   (get_entity_hyperedges, :468)
  ``members``   participates_in in    (get_hyperedge_participants, :465)

Neighbor order inside each ELL row is edge insertion order — NetworkX iteration
order in the reference — which is load-bearing for "first 2 parents" expansion
parity (hierarchical_graph.py:734).

``N_pad`` rounds up to 128 (MXU lane tile); K widths round up to 8. Null
judge/confidence is a mask, not 0.0 (filter semantics, SURVEY §7.3.4).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NODE_TYPE_IDS = {"entity": 0, "summary": 1, "hyperedge": 2}
NODE_TYPE_NAMES = {v: k for k, v in NODE_TYPE_IDS.items()}

# Query-similar member expansion scans at most this many leading children per
# summary seed (graph/search.py imports and documents it; the packed child
# tables below cap at the same width so both paths see identical candidates).
MEMBER_SIM_CAP = 32


def round_up(x: int, m: int) -> int:
    return ((max(x, 1) + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GraphTensors:
    # device leaves
    emb: jnp.ndarray            # [N_pad, D] f32
    node_type: jnp.ndarray      # [N_pad] i32  (-1 invalid)
    level: jnp.ndarray          # [N_pad] i32
    judge: jnp.ndarray          # [N_pad] f32
    has_judge: jnp.ndarray      # [N_pad] bool
    conf: jnp.ndarray           # [N_pad] f32
    has_conf: jnp.ndarray       # [N_pad] bool
    indexed: jnp.ndarray        # [N_pad] bool
    valid: jnp.ndarray          # [N_pad] bool
    parents: jnp.ndarray        # [N_pad, K_par] i32
    children: jnp.ndarray       # [N_pad, K_child] i32
    related: jnp.ndarray        # [N_pad, K_rel] i32
    hyperedges: jnp.ndarray     # [N_pad, K_hedge] i32
    members: jnp.ndarray        # [N_pad, K_mem] i32
    # Packed member-expansion tables (optional; None on small graphs and on
    # stacked/multi views). Each node with children gets one CONTIGUOUS row of
    # its first PACK_CAP children's embeddings: the query-similar member
    # selection in graph/search.py then gathers B*K rows of ~24 KB instead of
    # B*K*PACK_CAP rows of ~768 B — the scattered small-row gather is
    # descriptor-latency-bound on TPU and was the dominant post-seed cost at
    # 1M nodes (reports/search_profile_r4.json). Values are copies of ``emb``
    # rows in the same storage dtype, so member-similarity scores are
    # bit-identical to the unpacked path.
    child_pack_slot: jnp.ndarray | None = None   # [N_pad] i32 (-1 = no row)
    child_pack_ids: jnp.ndarray | None = None    # [S, cap] i32, -1 padded
    child_pack_emb: jnp.ndarray | None = None    # [S, cap, D] emb dtype
    # bin-contiguous permutation of emb for the binned seed kernel's
    # candidate gather (tile_n=1024 layout; see build_graph_tensors)
    emb_binpack: jnp.ndarray | None = None       # [nbins, 8, D] emb dtype
    # static metadata
    n_nodes: int = field(metadata=dict(static=True), default=0)
    n_edges: int = field(metadata=dict(static=True), default=0)
    # True iff every real node row is indexed & valid: the masked-out set is
    # then exactly the (zero-embedding) pad rows, and the seed kernel may
    # statically skip its in-kernel eligibility masking (ops/topk.py
    # ``dense_binmax2_pallas(trivial=True)`` — see its soundness note).
    mask_trivial: bool = field(metadata=dict(static=True), default=False)

    @property
    def n_pad(self) -> int:
        return int(self.emb.shape[0])

    @property
    def dim(self) -> int:
        return int(self.emb.shape[1])


def _ell(adj, n_pad: int, min_k: int = 8) -> np.ndarray:
    if isinstance(adj, np.ndarray):
        # pre-built ELL rows [N, K] (-1 padded) — the vectorized bulk-build path
        # (bench/synthetic corpora); only row-pad to n_pad and lane-pad K to 8
        kk = max(min_k, round_up(adj.shape[1] if adj.ndim == 2 else 1, 8))
        out = np.full((n_pad, kk), -1, dtype=np.int32)
        if adj.size:
            out[: adj.shape[0], : adj.shape[1]] = adj
        return out
    k = round_up(max([len(v) for v in adj.values()], default=1), 8)
    k = max(k, min_k)
    total = sum(len(v) for v in adj.values())
    if total >= 10_000:  # large graphs: native ELL builder (C++ hot path)
        from ahrag_tpu import native
        src = np.empty(total, dtype=np.int32)
        dst = np.empty(total, dtype=np.int32)
        pos = 0
        for i, nbrs in adj.items():
            m = len(nbrs)
            src[pos:pos + m] = i
            dst[pos:pos + m] = nbrs
            pos += m
        return native.ell_from_edges(src, dst, n_pad, n_pad, k)
    out = np.full((n_pad, k), -1, dtype=np.int32)
    for i, nbrs in adj.items():
        out[i, : len(nbrs)] = nbrs[:k]
    return out


def build_graph_tensors(
    *,
    embeddings: np.ndarray,                 # [N, D] normalized
    node_types: Sequence[int],
    levels: Sequence[int],
    judges: Sequence[float | None],
    confs: Sequence[float | None],
    indexed: Sequence[bool],
    parents: Dict[int, List[int]],
    children: Dict[int, List[int]],
    related: Dict[int, List[int]],
    hyperedges: Dict[int, List[int]],
    members: Dict[int, List[int]],
    n_edges: int = 0,
    emb_dtype: str | None = None,
    pack_children: bool | None = None,
) -> GraphTensors:
    """Assemble device tensors from host-side (already integer-indexed) graph data.

    ``emb_dtype`` ("float32" default, or "bfloat16" — also settable via
    AHRAG_EMB_DTYPE): the embedding matrix's STORAGE dtype. bf16 halves the
    HBM stream of the corpus-scan seed stage (the throughput ceiling at
    >=100k nodes) and, because bf16xbf16 products are exact in f32
    accumulation, a single default-precision MXU pass over bf16 storage is
    already exact — the certified top-k path drops the f32 3-pass penalty too
    (see ops/topk.py). Scores are then exact with respect to the bf16-rounded
    corpus: a storage-precision choice (like any vector store's quantization),
    NOT an approximate search."""
    import os as _os
    emb_dtype = emb_dtype or _os.environ.get("AHRAG_EMB_DTYPE", "float32")
    n = len(node_types)
    assert embeddings.shape[0] == n
    # Padding follows the top-k backend ladder (ops/topk.py routing):
    # - >= 65536 rows: 2048 so the streaming bin-max kernel engages — its
    #   HIGHEST-precision coarse pass keeps the exactness certificate
    #   satisfiable (~1e-6 band); the flat path's bf16-band certificate FAILS
    #   on clustered score distributions and forces the full-HIGHEST fallback
    #   on every batch (measured 131k nodes: 3.5k qps mis-padded vs the binned
    #   path's flat-matching speed)
    # - >= 4096: 1024 for the per-tile Pallas path
    # - below that: the 128 MXU lane tile (flat XLA path, padding overhead
    #   matters more than kernel choice on tiny graphs)
    if n >= 65536:
        n_pad = round_up(n, 2048)
    elif n >= 4096:
        n_pad = round_up(n, 1024)
    else:
        n_pad = round_up(n, 128)
    d = embeddings.shape[1]

    emb = np.zeros((n_pad, d), dtype=np.float32)
    emb[:n] = embeddings
    nt = np.full(n_pad, -1, dtype=np.int32)
    nt[:n] = np.asarray(node_types, dtype=np.int32)
    lv = np.zeros(n_pad, dtype=np.int32)
    lv[:n] = np.asarray(levels, dtype=np.int32)
    jd = np.zeros(n_pad, dtype=np.float32)
    hj = np.zeros(n_pad, dtype=bool)
    cf = np.zeros(n_pad, dtype=np.float32)
    hc = np.zeros(n_pad, dtype=bool)
    if isinstance(judges, np.ndarray) and isinstance(confs, np.ndarray):
        # vectorized path: float arrays with NaN for "no value"
        hj[:n] = ~np.isnan(judges)
        jd[:n] = np.where(hj[:n], np.nan_to_num(judges), 0.0)
        hc[:n] = ~np.isnan(confs)
        cf[:n] = np.where(hc[:n], np.nan_to_num(confs), 0.0)
    else:
        for i in range(n):
            if judges[i] is not None:
                jd[i], hj[i] = float(judges[i]), True
            if confs[i] is not None:
                cf[i], hc[i] = float(confs[i]), True
    ix = np.zeros(n_pad, dtype=bool)
    ix[:n] = np.asarray(indexed, dtype=bool)
    vd = np.zeros(n_pad, dtype=bool)
    vd[:n] = True

    store_dtype = jnp.bfloat16 if emb_dtype == "bfloat16" else jnp.float32
    ch_ell = _ell(children, n_pad)
    # Packed member tables (see GraphTensors field comment): auto-enabled on
    # large graphs where the scattered member-sim gather dominates post-seed
    # cost; explicit ``pack_children=True`` forces it for tests/small graphs.
    if pack_children is None:
        pack_children = (n >= 4096
                         and _os.environ.get("AHRAG_PACK_CHILDREN", "1") != "0")
    pk_slot = pk_ids = pk_emb = None
    pack_meta = None
    if pack_children:
        pack_nodes = np.nonzero(ch_ell[:, 0] >= 0)[0]
        if pack_nodes.size:
            cap = min(ch_ell.shape[1], MEMBER_SIM_CAP)
            slot = np.full(n_pad, -1, np.int32)
            slot[pack_nodes] = np.arange(pack_nodes.size, dtype=np.int32)
            pids = ch_ell[pack_nodes, :cap]                     # [S, cap]
            pk_slot = jnp.asarray(slot)
            pk_ids = jnp.asarray(pids)
            # the [S, cap, D] embedding rows are gathered ON DEVICE from the
            # already-uploaded emb (HBM-to-HBM, milliseconds) — a host-side
            # gather shipped an extra ~460 MB through the device tunnel at
            # 1M nodes, tripling index build time (round-5 measurement)
            pack_meta = pids
    if (jax.default_backend() == "tpu" and n_pad % 1024 == 0
            and n_pad >= 4096):
        # prime the kernel-true certificate calibration EAGERLY (mirrors the
        # ops.topk routing for this corpus): the binned certified path will
        # usually be reached inside a jit trace, where the Pallas calibration
        # cannot run — a warm lru cache is what makes traced callers get the
        # kernel-calibrated eps instead of the XLA-dot fallback band
        from ahrag_tpu.ops.topk import F32_COARSE_PRECISION, binmax_eps
        is_bf16 = store_dtype == jnp.bfloat16
        try:
            # tile_n must mirror ops.topk.refined_masked_topk_cert's routing
            binmax_eps("tpu", d, 1024,
                       "default" if is_bf16 else F32_COARSE_PRECISION,
                       is_bf16, False)
        except Exception:  # pragma: no cover - calibration must never block
            pass           # index builds (falls back to the XLA band)
    emb_dev = jnp.asarray(emb, dtype=store_dtype)
    if pack_meta is not None:
        pids_dev = jnp.asarray(np.clip(pack_meta, 0, n_pad - 1))
        pk_emb = jnp.where(jnp.asarray(pack_meta >= 0)[:, :, None],
                           emb_dev[pids_dev], 0).astype(store_dtype)
    # Bin-packed corpus copy for the binned seed kernel's candidate gather
    # (ops/topk.py): bin (tile, lane) of tile_n=1024 holds rows
    # {tile*1024 + lane + 128*i}; gathering those 8 scattered 768 B rows per
    # selected bin is descriptor-latency-bound (~2 ms of the 1M seed).
    # This PERMUTED copy stores each bin's 8 rows contiguously so the gather
    # is one ~6 KB descriptor per bin. Pure device-side reshuffle of the
    # uploaded emb; only built where the binned kernel engages.
    emb_binpack = None
    if (jax.default_backend() == "tpu" and n_pad % 1024 == 0
            and n >= 65536
            and _os.environ.get("AHRAG_BINPACK", "1") != "0"):
        t = n_pad // 1024
        emb_binpack = (emb_dev.reshape(t, 8, 128, d)
                       .transpose(0, 2, 1, 3).reshape(t * 128, 8, d))
    return GraphTensors(
        emb=emb_dev,
        node_type=jnp.asarray(nt),
        level=jnp.asarray(lv),
        judge=jnp.asarray(jd),
        has_judge=jnp.asarray(hj),
        conf=jnp.asarray(cf),
        has_conf=jnp.asarray(hc),
        indexed=jnp.asarray(ix),
        valid=jnp.asarray(vd),
        parents=jnp.asarray(_ell(parents, n_pad)),
        children=jnp.asarray(ch_ell),
        related=jnp.asarray(_ell(related, n_pad)),
        hyperedges=jnp.asarray(_ell(hyperedges, n_pad)),
        members=jnp.asarray(_ell(members, n_pad)),
        child_pack_slot=pk_slot,
        child_pack_ids=pk_ids,
        child_pack_emb=pk_emb,
        emb_binpack=emb_binpack,
        n_nodes=n,
        n_edges=n_edges,
        mask_trivial=bool(np.all(ix[:n])) if n else False,
    )
