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

    ``coo_packed`` is ONE [nnz, 3] f32 array carrying (row, col, val) — a
    single host->device transfer instead of three (each upload through the
    tunnel pays a round trip; row/col indices are exact in f32 far beyond any
    batch or bucket size here).
    """
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


class MicroBatcher:
    """Coalesce concurrent single requests into batched calls.

    ``submit(item)`` blocks until the batch containing it is processed; batches
    flush when ``max_batch`` items collect or ``max_wait_s`` elapses after the
    first pending item.

    Two-stage pipelining (``finalize`` given): ``process(batch)`` should only
    BUILD AND DISPATCH device work (returning a token), and ``finalize(token)``
    blocks for and assembles the results. The worker then starts coalescing
    and dispatching the next batch while a finalizer thread waits out the
    previous batch's device round trip — with a tunneled device the result
    transfer is a full RTT, so overlapping it with the next dispatch nearly
    doubles sustained throughput (measured 1.6k -> 3k+ qps at 1M nodes).
    """

    def __init__(self, process: Callable[[List[Any]], List[Any]],
                 max_batch: int = 64, max_wait_s: float = 0.002,
                 finalize: Optional[Callable[[Any], List[Any]]] = None) -> None:
        self._process = process
        self._finalize = finalize
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
        self._abandoned: Dict[int, int] = {}   # gen -> timed-out submitters
        self._generation = 0
        self._inflight: Optional[tuple] = None  # (gen, batch_len) being processed
        self._closed = False
        self.n_batches = 0
        self.n_items = 0
        self.max_batch_seen = 0
        # finalize pipeline: bounded handoff of (gen, batch, token); depth 2
        # keeps at most one batch in flight on the device while the next one
        # coalesces/dispatches (deeper queues only add latency, not qps)
        self._fin_q: List[tuple] = []
        self._fin_cv = threading.Condition()
        self._finalizer: Optional[threading.Thread] = None
        if finalize is not None:
            self._finalizer = threading.Thread(target=self._run_finalize,
                                               daemon=True)
            self._finalizer.start()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _publish(self, gen: int, batch_len: int, payload: tuple) -> None:
        with self._lock:
            if self._inflight is not None and self._inflight[0] == gen:
                self._inflight = None
            readers = batch_len - self._abandoned.pop(gen, 0)
            if readers > 0 and gen not in self._results:
                # (close() may already have error-published this gen after
                # a drain timeout; its submitters are gone — drop ours)
                self._results[gen] = [payload, readers]
            self._lock.notify_all()

    def _run(self) -> None:
        while True:
            with self._lock:
                while not self._pending and not self._closed:
                    self._lock.wait()
                if self._closed and not self._pending:
                    break
                deadline = time.monotonic() + self.max_wait_s
                while (len(self._pending) < self.max_batch
                       and time.monotonic() < deadline):
                    self._lock.wait(timeout=max(0.0, deadline - time.monotonic()))
                batch = self._pending
                gen = self._generation
                self._pending = []
                self._generation += 1
                self._inflight = (gen, len(batch))
                self.n_batches += 1
                self.n_items += len(batch)
                self.max_batch_seen = max(self.max_batch_seen, len(batch))
            if self._finalize is None:
                try:
                    results = self._process(batch)
                    if len(results) != len(batch):
                        raise RuntimeError(
                            f"process returned {len(results)} results for "
                            f"{len(batch)} items")
                    payload = ("ok", results)
                except Exception as exc:
                    # Publish the failure to this batch's submitters and keep
                    # the worker alive: a single malformed request must not
                    # wedge every future submit() forever.
                    payload = ("err", exc)
                self._publish(gen, len(batch), payload)
                continue
            # pipelined: dispatch here, block-and-assemble in the finalizer
            try:
                token = self._process(batch)
            except Exception as exc:
                self._publish(gen, len(batch), ("err", exc))
                continue
            with self._fin_cv:
                while len(self._fin_q) >= 2:      # bounded in-flight depth
                    self._fin_cv.wait()
                self._fin_q.append((gen, len(batch), token))
                self._fin_cv.notify_all()
        if self._finalizer is not None:
            with self._fin_cv:
                self._fin_q.append(None)          # drain sentinel
                self._fin_cv.notify_all()

    def _run_finalize(self) -> None:
        while True:
            with self._fin_cv:
                while not self._fin_q:
                    self._fin_cv.wait()
                entry = self._fin_q.pop(0)
                self._fin_cv.notify_all()
            if entry is None:
                return
            gen, batch_len, token = entry
            try:
                results = self._finalize(token)
                if len(results) != batch_len:
                    raise RuntimeError(
                        f"finalize returned {len(results)} results for "
                        f"{batch_len} items")
                payload = ("ok", results)
            except Exception as exc:
                payload = ("err", exc)
            self._publish(gen, batch_len, payload)

    def submit(self, item: Any, timeout_s: Optional[float] = None) -> Any:
        """Block until the batch containing ``item`` is processed.

        ``timeout_s`` bounds the wait: a wedged device or a pathological batch
        must fail THIS caller with ``TimeoutError`` instead of holding its
        thread (and the HTTP connection behind it) forever. The item itself
        stays in the batch — when processing eventually completes, the
        remaining-reader bookkeeping still runs via the abandoned count.
        """
        deadline = (time.monotonic() + timeout_s
                    if timeout_s is not None else None)
        with self._lock:
            if self._closed:
                raise RuntimeError("batcher closed")
            gen = self._generation
            index = len(self._pending)
            self._pending.append(item)
            self._lock.notify_all()
            while gen not in self._results:
                if deadline is not None:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        self._abandoned[gen] = self._abandoned.get(gen, 0) + 1
                        raise TimeoutError(
                            f"request timed out after {timeout_s}s awaiting "
                            f"batch {gen}")
                    self._lock.wait(timeout=remaining)
                else:
                    self._lock.wait()
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
        """Stop accepting submissions and drain: the worker keeps flushing
        already-queued batches (blocked submitters get their results), then
        exits; ``drain_timeout_s`` bounds the join so shutdown cannot hang on
        a wedged device. If the drain deadline passes with the worker still
        busy, every still-pending submitter is released with an error instead
        of blocking until process exit."""
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._worker.join(timeout=drain_timeout_s)
        if self._finalizer is not None and not self._worker.is_alive():
            self._finalizer.join(timeout=drain_timeout_s)
        if self._finalizer is not None and self._finalizer.is_alive():
            # wedged finalize: release every batch still queued for results
            exc = RuntimeError(
                f"batcher drain exceeded {drain_timeout_s}s; finalizer busy")
            with self._fin_cv:
                leftover = [e for e in self._fin_q if e is not None]
                self._fin_q = []
                self._fin_cv.notify_all()
            for gen, batch_len, _tok in leftover:
                self._publish(gen, batch_len, ("err", exc))
        if self._worker.is_alive():
            exc = RuntimeError(
                f"batcher drain exceeded {drain_timeout_s}s; worker still busy")
            with self._lock:
                if self._pending:
                    # the worker never picked this batch up — publish the
                    # failure under its generation so submitters wake
                    gen = self._generation
                    readers = len(self._pending) - self._abandoned.pop(gen, 0)
                    self._pending = []
                    self._generation += 1
                    if readers > 0:
                        self._results[gen] = [("err", exc), readers]
                if self._inflight is not None:
                    # a batch is wedged inside process(): release its waiters
                    gen, size = self._inflight
                    readers = size - self._abandoned.pop(gen, 0)
                    if readers > 0 and gen not in self._results:
                        self._results[gen] = [("err", exc), readers]
                self._lock.notify_all()


class RetrievalService:
    def __init__(self, graph_dir: str = "graph", hg: Optional[HierarchicalGraph] = None,
                 max_batch: int = 64, max_wait_s: float = 0.002,
                 request_timeout_s: Optional[float] = 10.0) -> None:
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
        # hashed encoder path pipelines: dispatch in the worker, block for
        # results in a finalizer thread (see MicroBatcher two-stage docs)
        if hasattr(enc, "buckets"):
            self._batcher = MicroBatcher(self._dispatch_batch,
                                         max_batch=max_batch,
                                         max_wait_s=max_wait_s,
                                         finalize=self._finalize_batch)
        else:
            self._batcher = MicroBatcher(self._process_batch,
                                         max_batch=max_batch,
                                         max_wait_s=max_wait_s)
        self._default_top_k = 5

    # -- batched search ------------------------------------------------------
    @staticmethod
    def _bucket(n: int) -> int:
        """Pad coalesced batches to fixed sizes — every distinct batch shape is a
        separate XLA compile (expensive through a device tunnel)."""
        for b in (1, 4, 16, 64, 256):
            if n <= b:
                return b
        return ((n + 255) // 256) * 256

    def _dispatch_batch(self, queries: List[str]):
        """Stage 1 (hashed encoder): featurize on host, ONE packed upload,
        dispatch the fused encode+search program; returns the in-flight device
        array as the pipeline token. The jit dispatch returns without waiting
        for execution, so the worker immediately coalesces the next batch."""
        n = len(queries)
        bucket = self._bucket(n)
        # first call at a batch shape pays the XLA compile — label it so p99/max
        # in the timer snapshot reflect steady-state serving, not warmup
        # (round-2 artifact carried a 212s compile inside search_batch max)
        timer = ("search_batch" if bucket in self._warm_buckets
                 else "search_batch_warmup")
        with self.timers.timed(timer):
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
            cap = len(padded) * 256
            if len(rows) > cap:
                cap = 1 << (len(rows) - 1).bit_length()
            packed_coo = np.zeros((cap, 3), np.float32)  # one packed upload
            nnz = len(rows)
            packed_coo[:nnz, 0] = rows
            packed_coo[:nnz, 1] = cols
            packed_coo[:nnz, 2] = vals
            packed_coo[nnz:, 0] = len(padded)            # dump row
            dev = _encode_and_search(
                jnp.asarray(packed_coo), self._proj_dev, self._idf_dev,
                self.gt, self._w_cached,
                n_rows=len(padded), top_k=self._default_top_k,
                member_top_m=self._member_top_m)
        self._warm_buckets.add(bucket)
        return (n, dev)

    def _finalize_batch(self, token) -> List[List[Dict[str, Any]]]:
        """Stage 2: block for the device result (a full tunnel round trip —
        overlapped with the next batch's dispatch) and assemble entries."""
        n, dev = token
        with self.timers.timed("search_finalize"):
            packed = np.asarray(dev)
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
