"""Serving layer: device-resident retrieval service with micro-batching.

The reference has no serving story (single-process CLIs only). This module turns a
graph snapshot into a long-lived service suited to the TPU's batching economics:

- ``RetrievalService``: holds GraphTensors on device and answers ``search`` /
  ``beam`` / ``answer`` requests; concurrent ``search`` callers are coalesced by a
  ``MicroBatcher`` into single device batches (the jitted batched search amortizes
  dispatch + compile across requests);
- ``serve_http``: a ThreadingHTTPServer with JSON endpoints
  POST /search {"queries": [...], "top_k"} , POST /answer {"query"},
  GET /healthz, GET /stats (profiling counters).
"""
from __future__ import annotations

import functools
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ahrag_tpu.graph import HierarchicalGraph
from ahrag_tpu.graph.search import hybrid_search_batch
from ahrag_tpu.models.encoder.hashed import _project_normalize_sparse
from ahrag_tpu.utils.profiling import LatencyRecorder, Timers


@functools.partial(jax.jit, static_argnames=("n_rows", "top_k", "member_top_m"))
def _encode_and_search(coo_packed, proj, idf, gt, w, *, n_rows: int,
                       top_k: int, member_top_m: int):
    """Sparse query features -> embeddings -> hybrid search, one device program.

    One dispatch per serving batch instead of two (encode, then search): when the
    device sits behind a network tunnel each dispatch costs a round trip, and
    even locally this saves the embedding HBM round trip between the two calls.

    ``coo_packed`` is ONE f32 array carrying the sparse features — a single
    host->device transfer instead of three (each upload through the tunnel
    pays a round trip). Two layouts, discriminated by the trailing dim:

    - ``[cap, 2]``: (key, val) with ``key = row * buckets + col`` — exact in
      f32 while ``(n_rows + 1) * buckets < 2**24``; 33% less upload than the
      triplet layout, and the dominant serving cost at 1M nodes IS this
      upload (reports/serving_1m_tpu_r4.json: 85 ms dispatch vs 15 ms host
      work at batch 512).
    - ``[cap, 3]``: (row, col, val) fallback when the key would overflow.
    """
    if coo_packed.shape[-1] == 2:
        buckets = proj.shape[0]
        key = coo_packed[:, 0].astype(jnp.int32)
        rows = key // buckets
        cols = key - rows * buckets
        vals = coo_packed[:, 1]
    else:
        rows = coo_packed[:, 0].astype(jnp.int32)
        cols = coo_packed[:, 1].astype(jnp.int32)
        vals = coo_packed[:, 2]
    q = _project_normalize_sparse(rows, cols, vals, proj, idf, n_rows)
    res = hybrid_search_batch(gt, q, w, top_k=top_k, member_top_m=member_top_m)
    # pack the four result planes into ONE [B, k, 4] f32 array: a single D2H
    # transfer instead of four (idx fits f32 exactly below 2^24 nodes)
    return jnp.stack([res.reranked_idx.astype(jnp.float32), res.reranked_score,
                      res.reranked_sem,
                      res.reranked_valid.astype(jnp.float32)], axis=-1)


class _StageQueue:
    """Bounded handoff between pipeline stages; depth 2 keeps at most one
    batch queued while the consumer works (deeper queues add latency, not
    qps). ``put(None)`` is the drain sentinel and bypasses the bound."""

    def __init__(self, depth: int = 2) -> None:
        self._items: List[Any] = []
        self._cv = threading.Condition()
        self._depth = depth

    def put(self, entry: Any) -> None:
        with self._cv:
            while entry is not None and len(self._items) >= self._depth:
                self._cv.wait()
            self._items.append(entry)
            self._cv.notify_all()

    def get(self) -> Any:
        with self._cv:
            while not self._items:
                self._cv.wait()
            entry = self._items.pop(0)
            self._cv.notify_all()
            return entry

    def drain(self) -> List[Any]:
        with self._cv:
            items, self._items = self._items, []
            self._cv.notify_all()
            return [e for e in items if e is not None]


class MicroBatcher:
    """Coalesce concurrent single requests into batched pipelined calls.

    ``submit(item)`` blocks until the batch containing it is processed; batches
    flush when ``max_batch`` items collect or ``max_wait_s`` elapses after the
    first pending item.

    Pipelining: ``stages=[s1, ..., sk]`` splits batch processing into k
    stages; the worker coalesces a batch and runs s1, every further stage
    runs in its own thread fed by a bounded queue, and the LAST stage's
    return value is the per-item results list. Up to k batches are in flight
    at different pipeline positions, so sustained throughput is set by the
    slowest stage, not the sum — with a tunneled device, host featurization,
    the upload+dispatch, and the result round trip each hide behind the
    others (measured 1.6k -> 3k+ qps at 1M nodes for the 2-stage split, and
    the 3-stage split unhides host featurization too). The legacy
    ``process``/``finalize`` pair maps to 1 or 2 stages.

    Wakeup discipline: submitters wait on a per-generation ``Event``, never
    on the shared condition — with hundreds of concurrent callers a shared
    ``notify_all`` per submit/publish is a thundering herd that burns the
    GIL exactly when the dispatch worker needs it.
    """

    def __init__(self, process: Optional[Callable[[List[Any]], List[Any]]] = None,
                 max_batch: int = 64, max_wait_s: float = 0.002,
                 finalize: Optional[Callable[[Any], List[Any]]] = None,
                 stages: Optional[List[Callable[[Any], Any]]] = None,
                 last_stage_workers: int = 1,
                 mid_stage_workers: int = 1,
                 coalesce_quiet_s: float = 0.0,
                 coalesce_cap_s: float = 0.05) -> None:
        # Quiet-window coalescing (opt-in): while submissions KEEP ARRIVING,
        # extend the flush deadline by ``coalesce_quiet_s`` per arrival, up to
        # ``coalesce_cap_s`` total. Rationale: with a tunneled device the
        # round trip is ~flat in batch size (49.5 ms at mean batch 110 == at
        # 512, reports/serving_1m_tpu_r4.json), so throughput is ~linear in
        # batch size — but under high closed-loop concurrency the fixed
        # ``max_wait_s`` deadline fires while woken clients are still
        # re-submitting (observed mean batch 110 of max 512 at 512 threads).
        # Waiting for arrival quiescence fills the batch to ~the offered
        # concurrency; the cap bounds the latency the wait can add.
        self._quiet_s = float(coalesce_quiet_s)
        self._coalesce_cap_s = float(coalesce_cap_s)
        if stages is None:
            if process is None:
                raise ValueError("need process or stages")
            stages = [process] + ([finalize] if finalize is not None else [])
        self._stages: List[Callable[[Any], Any]] = list(stages)
        # >1 runs the LAST stage in that many threads: when it blocks on a
        # device round trip, consecutive batches' round trips overlap (the
        # stage must be thread-safe and per-batch independent; results
        # publish per-generation, so completion order does not matter)
        self._last_workers = max(1, int(last_stage_workers)
                                 if len(self._stages) > 1 else 1)
        # >1 also runs every MIDDLE stage in that many threads. The upload+
        # dispatch stage blocks for a tunnel round trip per batch, so one
        # upload thread caps throughput at max_batch/RTT regardless of how
        # many finalize workers overlap result reads; results publish
        # per-generation, so out-of-order stage completion is already safe.
        self._mid_workers = max(1, int(mid_stage_workers)
                                if len(self._stages) > 2 else 1)
        self._drained = [threading.Event() for _ in self._stages]
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self._lock = threading.Condition()
        self._pending: List[Any] = []
        # generation -> [("ok", results) | ("err", exc), remaining_readers].
        # Keyed per generation: a single shared slot races when a submitter's
        # wakeup is delayed past the next batch's flush (it would read the
        # wrong batch's results); entries are deleted once every submitter of
        # that generation has read its item.
        self._results: Dict[int, List[Any]] = {}
        self._events: Dict[int, threading.Event] = {}  # gen -> submitter wakeup
        self._abandoned: Dict[int, int] = {}   # gen -> timed-out submitters
        self._generation = 0
        self._inflight: Dict[int, int] = {}    # gen -> batch_len, inside pipeline
        self._poisoned: set = set()            # gens error-published by close()
        self._closed = False
        self.n_batches = 0
        self.n_items = 0
        self.max_batch_seen = 0
        self._queues = [_StageQueue() for _ in range(len(self._stages) - 1)]
        self._stage_threads = [
            threading.Thread(target=self._run_stage, args=(i,), daemon=True)
            for i in range(1, len(self._stages))
            for _ in range(self._stage_workers(i))]
        for t in self._stage_threads:
            t.start()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _stage_workers(self, i: int) -> int:
        """Worker-thread count for stage i (stage 0 runs in the coalescing
        worker itself)."""
        if i == 0:
            return 1
        return (self._last_workers if i == len(self._stages) - 1
                else self._mid_workers)

    def _publish(self, gen: int, batch_len: int, payload: tuple) -> None:
        with self._lock:
            self._inflight.pop(gen, None)
            readers = batch_len - self._abandoned.pop(gen, 0)
            ev = self._events.pop(gen, None)
            if (readers > 0 and gen not in self._results
                    and gen not in self._poisoned):
                # (close() may already have error-published this gen after
                # a drain timeout; its submitters are gone — drop ours)
                self._results[gen] = [payload, readers]
            if ev is not None:
                ev.set()
            self._lock.notify()    # a pipeline slot freed — wake the worker

    def _run(self) -> None:
        while True:
            with self._lock:
                while not self._pending and not self._closed:
                    self._lock.wait()
                if self._closed and not self._pending:
                    break
                now = time.monotonic()
                deadline = now + self.max_wait_s
                hard_deadline = now + max(self._coalesce_cap_s,
                                          self.max_wait_s)
                last_n = len(self._pending)
                # coalesce until the wait deadline — and KEEP coalescing while
                # every pipeline stage is busy: flushing then would only park
                # the batch in a stage queue, whereas waiting grows the batch
                # for free (the device round trip costs ~the same for 50 and
                # 500 items; measured 2.0k -> bigger-batch qps at 1M nodes).
                # _publish notifies when a slot frees, so no busy poll.
                capacity = (len(self._stages) + self._last_workers - 1
                            + (len(self._stages) - 2) * (self._mid_workers - 1))
                while (len(self._pending) < self.max_batch
                       and not self._closed
                       and (time.monotonic() < deadline
                            or len(self._inflight) >= capacity)):
                    remaining = deadline - time.monotonic()
                    self._lock.wait(timeout=remaining if remaining > 0
                                    else None)
                    if self._quiet_s > 0.0:
                        n = len(self._pending)
                        if n > last_n:
                            last_n = n
                            deadline = min(hard_deadline,
                                           max(deadline, time.monotonic()
                                               + self._quiet_s))
                batch = self._pending
                gen = self._generation
                self._pending = []
                self._generation += 1
                self._inflight[gen] = len(batch)
                self.n_batches += 1
                self.n_items += len(batch)
                self.max_batch_seen = max(self.max_batch_seen, len(batch))
            try:
                token = self._stages[0](batch)
            except Exception as exc:
                # Publish the failure to this batch's submitters and keep
                # the worker alive: a single malformed request must not
                # wedge every future submit() forever.
                self._publish(gen, len(batch), ("err", exc))
                continue
            if not self._queues:
                self._finish(gen, len(batch), token)
            else:
                self._queues[0].put((gen, len(batch), token))
        if self._queues:
            self._queues[0].put(None)             # drain sentinel

    def _finish(self, gen: int, batch_len: int, results: Any) -> None:
        try:
            n = len(results)
        except TypeError as exc:   # a non-sequence return must not kill the
            self._publish(gen, batch_len, ("err", exc))  # pipeline thread
            return
        if n != batch_len:
            exc = RuntimeError(f"stage returned {n} results for "
                               f"{batch_len} items")
            self._publish(gen, batch_len, ("err", exc))
        else:
            self._publish(gen, batch_len, ("ok", results))

    def _run_stage(self, i: int) -> None:
        q_in = self._queues[i - 1]
        q_out = self._queues[i] if i < len(self._queues) else None
        while True:
            entry = q_in.get()
            if entry is None:
                if self._stage_workers(i) > 1:
                    q_in.put(None)   # rebroadcast so sibling workers exit too
                if q_out is not None and not self._drained[i].is_set():
                    self._drained[i].set()   # forward ONE sentinel downstream
                    q_out.put(None)
                return
            gen, batch_len, token = entry
            try:
                out = self._stages[i](token)
            except Exception as exc:
                self._publish(gen, batch_len, ("err", exc))
                continue
            if q_out is None:
                self._finish(gen, batch_len, out)
            else:
                q_out.put((gen, batch_len, out))

    def submit(self, item: Any, timeout_s: Optional[float] = None) -> Any:
        """Block until the batch containing ``item`` is processed.

        ``timeout_s`` bounds the wait: a wedged device or a pathological batch
        must fail THIS caller with ``TimeoutError`` instead of holding its
        thread (and the HTTP connection behind it) forever. The item itself
        stays in the batch — when processing eventually completes, the
        remaining-reader bookkeeping still runs via the abandoned count.
        """
        with self._lock:
            if self._closed:
                raise RuntimeError("batcher closed")
            gen = self._generation
            index = len(self._pending)
            self._pending.append(item)
            ev = self._events.get(gen)
            if ev is None:
                ev = self._events[gen] = threading.Event()
            self._lock.notify()  # the worker is the only _lock waiter
        got = ev.wait(timeout=timeout_s)
        with self._lock:
            if gen not in self._results:
                if not got:
                    self._abandoned[gen] = self._abandoned.get(gen, 0) + 1
                    raise TimeoutError(
                        f"request timed out after {timeout_s}s awaiting "
                        f"batch {gen}")
                raise RuntimeError("batcher closed before batch completed")
            entry = self._results[gen]
            entry[1] -= 1
            if entry[1] == 0:
                del self._results[gen]
            kind, data = entry[0]
            if kind == "err":
                raise RuntimeError(f"batch processing failed: {data!r}") from data
            return data[index]

    def stats(self) -> Dict[str, float]:
        with self._lock:
            return {"batches": self.n_batches, "items": self.n_items,
                    "mean_batch": self.n_items / max(1, self.n_batches),
                    "max_batch": self.max_batch_seen}

    def close(self, drain_timeout_s: float = 5.0) -> None:
        """Stop accepting submissions and drain: the pipeline keeps flushing
        already-queued batches (blocked submitters get their results), then
        exits; ``drain_timeout_s`` bounds the join so shutdown cannot hang on
        a wedged device. If the drain deadline passes with work still in the
        pipeline, every still-pending submitter is released with an error
        instead of blocking until process exit."""
        with self._lock:
            self._closed = True
            self._lock.notify()
        deadline = time.monotonic() + drain_timeout_s
        self._worker.join(timeout=drain_timeout_s)
        for t in self._stage_threads:
            t.join(timeout=max(0.0, deadline - time.monotonic()))
        wedged = self._worker.is_alive() or any(
            t.is_alive() for t in self._stage_threads)
        if not wedged:
            return
        exc = RuntimeError(
            f"batcher drain exceeded {drain_timeout_s}s; pipeline still busy")
        for q in self._queues:                    # unprocessed inter-stage work
            q.drain()
        with self._lock:
            if self._pending:
                # the worker never picked this batch up — publish the
                # failure under its generation so submitters wake
                gen = self._generation
                readers = len(self._pending) - self._abandoned.pop(gen, 0)
                self._pending = []
                self._generation += 1
                self._poisoned.add(gen)
                if readers > 0:
                    self._results[gen] = [("err", exc), readers]
                ev = self._events.pop(gen, None)
                if ev is not None:
                    ev.set()
            # batches wedged anywhere inside the pipeline: release waiters;
            # _poisoned blocks a late completion from resurrecting the gen
            for gen, size in list(self._inflight.items()):
                readers = size - self._abandoned.pop(gen, 0)
                self._poisoned.add(gen)
                if readers > 0 and gen not in self._results:
                    self._results[gen] = [("err", exc), readers]
                ev = self._events.pop(gen, None)
                if ev is not None:
                    ev.set()
            self._inflight.clear()


class RetrievalService:
    def __init__(self, graph_dir: str = "graph", hg: Optional[HierarchicalGraph] = None,
                 max_batch: int = 64, max_wait_s: float = 0.002,
                 request_timeout_s: Optional[float] = 10.0,
                 coalesce_quiet_s: float = 0.0015,
                 coalesce_cap_s: Optional[float] = None) -> None:
        # Quiet-window coalescing is on by default HERE (the MicroBatcher
        # keeps it opt-in): a retrieval service's throughput is ~linear in
        # batch size while the device round trip is ~flat in it. The cap —
        # the most extra latency coalescing may add — ADAPTS to the measured
        # round trip (EMA over finalize walls, clamped to [max_wait_s, 50 ms])
        # unless given explicitly: a fixed 50 ms cap was a ~25x latency
        # inflation on fast local backends whose round trip is ~2 ms
        # (ADVICE r4). It starts at max_wait_s (harmless everywhere) and
        # grows only as slow round trips are observed.
        self._cap_fixed = coalesce_cap_s is not None
        self._rtt_ema: Optional[float] = None
        self._coalesce = (coalesce_quiet_s,
                          coalesce_cap_s if self._cap_fixed else max_wait_s)
        self.hg = hg or HierarchicalGraph.load(graph_dir)
        if self.hg.dirty or not self.hg._embeddings:
            self.hg.build_vector_index(layers=(0, 1, 2))
        self.gt = self.hg.tensors()
        if int(self.gt.emb.shape[0]) >= 1 << 24:
            # _encode_and_search packs node indices into float32 (exact only
            # below 2^24); beyond that indices would silently corrupt.
            raise ValueError(
                f"graph has {int(self.gt.emb.shape[0])} padded nodes; the packed "
                "f32 result path supports < 2^24 — shard the corpus instead")
        self.timers = Timers()
        self.latency = LatencyRecorder()
        self.request_timeout_s = request_timeout_s
        self._warm_buckets: set = set()  # batch shapes already compiled
        # Per-batch constants staged on device ONCE. The former per-batch
        # jnp.asarray of idf/weights/projection cost one tunnel round trip
        # EACH every batch — measured 133 ms/batch at 1M nodes against a
        # ~15 ms device program (reports/serving_1m_tpu_r4.json, first run).
        # Serving holds search weights/params fixed for the service lifetime.
        self._w_cached = self.hg._resolve_weights()
        self._member_top_m = int(self.hg.search_params.get("member_top_m", 5))
        enc = self.hg._encoder()
        if hasattr(enc, "buckets"):
            idf = getattr(self.hg, "_idf", None)
            idf = (np.ones(enc.buckets, np.float32) if idf is None
                   else np.asarray(idf, np.float32))
            self._idf_dev = jax.device_put(jnp.asarray(idf))
            lsa = getattr(self.hg, "_lsa", None)
            self._proj_dev = (enc._proj if lsa is None
                              else jax.device_put(jnp.asarray(
                                  np.asarray(lsa, np.float32))))
            jax.block_until_ready(self._idf_dev)
        # hashed encoder path pipelines 3 stages: host featurize+pack in the
        # worker, upload+dispatch in a second thread, block-for-results +
        # assembly in a third (see MicroBatcher pipeline docs) — the upload
        # is the serving bottleneck at 1M nodes and now hides the host work
        if hasattr(enc, "buckets"):
            self._batcher = MicroBatcher(max_batch=max_batch,
                                         max_wait_s=max_wait_s,
                                         stages=[self._featurize_batch,
                                                 self._upload_dispatch,
                                                 self._finalize_batch],
                                         # multiple finalize workers overlap
                                         # consecutive batches' device round
                                         # trips, and TWO upload workers keep
                                         # the dispatch stage from serializing
                                         # at one tunnel RTT per batch — the
                                         # serving floor at corpus scale
                                         last_stage_workers=3,
                                         mid_stage_workers=2,
                                         coalesce_quiet_s=self._coalesce[0],
                                         coalesce_cap_s=self._coalesce[1])
        else:
            self._batcher = MicroBatcher(self._process_batch,
                                         max_batch=max_batch,
                                         max_wait_s=max_wait_s,
                                         coalesce_quiet_s=self._coalesce[0],
                                         coalesce_cap_s=self._coalesce[1])
        self._default_top_k = 5

    def _observe_rtt(self, rtt_s: float) -> None:
        """Feed one measured device round trip into the adaptive coalesce cap
        (no-op when an explicit ``coalesce_cap_s`` was given)."""
        if self._cap_fixed:
            return
        self._rtt_ema = (rtt_s if self._rtt_ema is None
                         else 0.7 * self._rtt_ema + 0.3 * rtt_s)
        cap = min(0.05, max(self._batcher.max_wait_s, self._rtt_ema))
        self._batcher._coalesce_cap_s = cap

    # -- batched search ------------------------------------------------------
    @staticmethod
    def _bucket(n: int) -> int:
        """Pad coalesced batches to fixed sizes — every distinct batch shape is a
        separate XLA compile (expensive through a device tunnel)."""
        for b in (1, 4, 16, 64, 256):
            if n <= b:
                return b
        return ((n + 255) // 256) * 256

    def _featurize_batch(self, queries: List[str]):
        """Pipeline stage 1 (hashed encoder): featurize on host and pack the
        sparse features into ONE upload-ready array. Pure host work — it
        overlaps with stage 2's upload of the PREVIOUS batch."""
        n = len(queries)
        bucket = self._bucket(n)
        with self.timers.timed("featurize"):
            padded = queries + [""] * (bucket - n)
            enc = self.hg._encoder()
            coo = enc._coo_block(padded) if hasattr(enc, "_coo_block") else None
            if coo is not None:  # threaded C++ sparse featurizer
                rows, cols, vals = coo
            else:
                counts = enc._count_matrix(padded)
                rows, cols = np.nonzero(counts)
                vals = counts[rows, cols]
            assoc = self.hg.query_assoc()
            if assoc is not None and hasattr(enc, "expand_coo"):
                # query-side co-occurrence expansion — must match
                # hg.encode_query exactly or fused and host paths diverge
                rows, cols, vals = enc.expand_coo(
                    np.asarray(rows), np.asarray(cols),
                    np.asarray(vals, np.float32), assoc)
            nnz = len(rows)
            n_rows = len(padded)
            buckets = int(self._proj_dev.shape[0])
            # cap sizing: 128 features/query covers short queries (the bench
            # query set measures ~117 incl. stems/ngrams); longer queries
            # overflow to the next power of two — each distinct (bucket, cap)
            # pair is one XLA compile, so caps are quantized
            cap = max(4096, 128 * n_rows)
            while cap < nnz:
                cap *= 2
            if (n_rows + 1) * buckets < (1 << 24):
                # key packing exact in f32 -> 33% less upload
                packed_coo = np.zeros((cap, 2), np.float32)
                packed_coo[:nnz, 0] = np.asarray(rows, np.int64) * buckets \
                    + np.asarray(cols, np.int64)
                packed_coo[:nnz, 1] = vals
                packed_coo[nnz:, 0] = n_rows * buckets       # dump row
            else:
                packed_coo = np.zeros((cap, 3), np.float32)
                packed_coo[:nnz, 0] = rows
                packed_coo[:nnz, 1] = cols
                packed_coo[:nnz, 2] = vals
                packed_coo[nnz:, 0] = n_rows                 # dump row
        return (n, n_rows, packed_coo)

    def _upload_dispatch(self, token):
        """Pipeline stage 2: ONE packed upload + fused encode+search dispatch;
        returns the in-flight device array. The jit dispatch returns without
        waiting for execution, so this stage's cost is the upload itself —
        overlapped with stage 1's featurization of the next batch and stage
        3's result round trip for the previous one."""
        n, n_rows, packed_coo = token
        shape_key = (n_rows, packed_coo.shape)
        # first call at a batch shape pays the XLA compile — label it so p99/max
        # in the timer snapshot reflect steady-state serving, not warmup
        # (round-2 artifact carried a 212s compile inside search_batch max)
        timer = ("search_batch" if shape_key in self._warm_buckets
                 else "search_batch_warmup")
        with self.timers.timed(timer):
            dev = _encode_and_search(
                jnp.asarray(packed_coo), self._proj_dev, self._idf_dev,
                self.gt, self._w_cached,
                n_rows=n_rows, top_k=self._default_top_k,
                member_top_m=self._member_top_m)
        self._warm_buckets.add(shape_key)
        return (n, dev)

    def _dispatch_batch(self, queries: List[str]):
        """Featurize + dispatch in one call (the non-pipelined entry used by
        ``search_many``; the serving pipeline runs the two stages in separate
        threads)."""
        return self._upload_dispatch(self._featurize_batch(queries))

    def _finalize_batch(self, token) -> List[List[Dict[str, Any]]]:
        """Stage 2: block for the device result (a full tunnel round trip —
        overlapped with the next batch's dispatch) and assemble entries."""
        n, dev = token
        t0 = time.perf_counter()
        with self.timers.timed("search_finalize"):
            packed = np.asarray(dev)
        self._observe_rtt(time.perf_counter() - t0)
        idx = packed[..., 0].astype(np.int64)
        score, sem = packed[..., 1], packed[..., 2]
        ok = packed[..., 3] > 0.5
        out = []
        for b in range(n):
            out.append([self.hg._result_entry(int(i), float(s), float(m))
                        for i, s, m, o in zip(idx[b], score[b], sem[b], ok[b])
                        if o])
        return out

    def _process_batch(self, queries: List[str]) -> List[List[Dict[str, Any]]]:
        """Single-stage path (non-hashed encoders: host encode, two dispatches)."""
        n = len(queries)
        bucket = self._bucket(n)
        timer = ("search_batch" if bucket in self._warm_buckets
                 else "search_batch_warmup")
        t0 = time.perf_counter()
        with self.timers.timed(timer):
            padded = queries + [""] * (bucket - n)
            q = jnp.asarray(self.hg.encode_query(padded))
            res = hybrid_search_batch(self.gt, q, self._w_cached,
                                      top_k=self._default_top_k,
                                      member_top_m=self._member_top_m)
            idx = np.asarray(res.reranked_idx)
            score = np.asarray(res.reranked_score)
            sem = np.asarray(res.reranked_sem)
            ok = np.asarray(res.reranked_valid)
        if bucket in self._warm_buckets:   # compile walls must not feed the cap
            self._observe_rtt(time.perf_counter() - t0)
        self._warm_buckets.add(bucket)
        out = []
        for b in range(n):
            out.append([self.hg._result_entry(int(i), float(s), float(m))
                        for i, s, m, o in zip(idx[b], score[b], sem[b], ok[b]) if o])
        return out

    def search(self, query: str) -> List[Dict[str, Any]]:
        """Single query; coalesced with concurrent callers into one device
        batch. Raises ``TimeoutError`` after ``request_timeout_s`` (the caller
        maps it to HTTP 503) instead of holding the connection forever."""
        with self.latency.timed("request"):
            return self._batcher.submit(query, timeout_s=self.request_timeout_s)

    def search_many(self, queries: List[str]) -> List[List[Dict[str, Any]]]:
        enc = self.hg._encoder()
        if hasattr(enc, "buckets"):
            return self._finalize_batch(self._dispatch_batch(queries))
        return self._process_batch(queries)

    def beam(self, query: str, beam_width: int = 8, depth: int = 3,
             top_k: int = 10) -> List[Dict[str, Any]]:
        """Multi-level beam-search traversal (graph/beam.py) for one query."""
        from ahrag_tpu.graph.beam import beam_search
        with self.timers.timed("beam"):
            q = jnp.asarray(self.hg.encode_query([query])[0])
            res = beam_search(self.gt, q, self.hg._resolve_weights(),
                              beam_width=beam_width, depth=depth, top_k=top_k)
            idx = np.asarray(res.evidence_idx)
            score = np.asarray(res.evidence_score)
            ok = np.asarray(res.evidence_valid)
        return [self.hg._result_entry(int(i), float(s), 0.0)
                for i, s, o in zip(idx, score, ok) if o]

    # -- full QA -------------------------------------------------------------
    def answer(self, query: str, steps: int = 4) -> Dict[str, Any]:
        from ahrag_tpu.agent.agent import AHRAG_Agent
        from ahrag_tpu.agent.environment import GraphEnvironment
        from ahrag_tpu.agent.inference import InferenceEngine
        with self.timers.timed("answer"):
            env = GraphEnvironment(hg=self.hg, log_level="off")
            out = InferenceEngine(env, AHRAG_Agent(env)).run_inference(query,
                                                                      steps=steps)
        return {k: out[k] for k in ("query", "answer", "rationale", "citations",
                                    "retrieved_nodes", "metrics")}

    def stats(self) -> Dict[str, Any]:
        return {"graph": self.hg.stats(), "timers": self.timers.snapshot(),
                "latency": self.latency.snapshot(),
                "batcher": self._batcher.stats()}

    def close(self) -> None:
        self._batcher.close()


def serve_http(service: RetrievalService, host: str = "127.0.0.1",
               port: int = 8080) -> ThreadingHTTPServer:
    """Start the HTTP front end (returns the server; call serve_forever/shutdown)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code: int, obj: Any) -> None:
            body = json.dumps(obj, ensure_ascii=False, default=str).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "nodes": service.hg.number_of_nodes()})
            elif self.path == "/stats":
                self._json(200, service.stats())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
            except Exception:
                self._json(400, {"error": "bad json"})
                return
            try:
                if self.path == "/search":
                    queries = payload.get("queries") or (
                        [payload["query"]] if payload.get("query") else [])
                    if not queries:
                        self._json(400, {"error": "no queries"})
                        return
                    if len(queries) == 1:
                        self._json(200, {"results": [service.search(queries[0])]})
                    else:
                        self._json(200, {"results": service.search_many(queries)})
                elif self.path == "/beam":
                    query = payload.get("query")
                    if not query:
                        self._json(400, {"error": "no query"})
                        return
                    self._json(200, {"results": service.beam(
                        query, beam_width=int(payload.get("beam_width", 8)),
                        depth=int(payload.get("depth", 3)),
                        top_k=int(payload.get("top_k", 10)))})
                elif self.path == "/answer":
                    query = payload.get("query")
                    if not query:
                        self._json(400, {"error": "no query"})
                        return
                    self._json(200, service.answer(
                        query, steps=int(payload.get("steps", 4))))
                else:
                    self._json(404, {"error": "not found"})
            except TimeoutError as exc:
                # overloaded/wedged device: shed THIS request, keep serving
                self._json(503, {"error": f"timeout: {exc}"})
            except Exception as exc:  # pragma: no cover - defensive
                self._json(500, {"error": str(exc)})

    server = ThreadingHTTPServer((host, port), Handler)
    return server
