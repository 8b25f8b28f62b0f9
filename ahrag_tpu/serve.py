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
def _encode_and_search(rows, cols, vals, proj, idf, gt, w, *, n_rows: int,
                       top_k: int, member_top_m: int):
    """Sparse query features -> embeddings -> hybrid search, one device program.

    One dispatch per serving batch instead of two (encode, then search): when the
    device sits behind a network tunnel each dispatch costs a round trip, and
    even locally this saves the embedding HBM round trip between the two calls.
    """
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
    """

    def __init__(self, process: Callable[[List[Any]], List[Any]],
                 max_batch: int = 64, max_wait_s: float = 0.002) -> None:
        self._process = process
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
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self) -> None:
        while True:
            with self._lock:
                while not self._pending and not self._closed:
                    self._lock.wait()
                if self._closed and not self._pending:
                    return
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
            try:
                results = self._process(batch)
                if len(results) != len(batch):
                    raise RuntimeError(
                        f"process returned {len(results)} results for "
                        f"{len(batch)} items")
                payload = ("ok", results)
            except Exception as exc:
                # Publish the failure to this batch's submitters and keep the
                # worker alive: a single malformed request must not wedge every
                # future submit() forever.
                payload = ("err", exc)
            with self._lock:
                self._inflight = None
                readers = len(batch) - self._abandoned.pop(gen, 0)
                if readers > 0 and gen not in self._results:
                    # (close() may already have error-published this gen after
                    # a drain timeout; its submitters are gone — drop ours)
                    self._results[gen] = [payload, readers]
                self._lock.notify_all()

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
        self._batcher = MicroBatcher(self._process_batch, max_batch=max_batch,
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

    def _process_batch(self, queries: List[str]) -> List[List[Dict[str, Any]]]:
        n = len(queries)
        bucket = self._bucket(n)
        # first call at a batch shape pays the XLA compile — label it so p99/max
        # in the timer snapshot reflect steady-state serving, not warmup
        # (round-2 artifact carried a 212s compile inside search_batch max)
        timer = ("search_batch" if bucket in self._warm_buckets
                 else "search_batch_warmup")
        with self.timers.timed(timer):
            padded = queries + [""] * (bucket - n)
            w = self.hg._resolve_weights()
            member_top_m = int(self.hg.search_params.get("member_top_m", 5))
            enc = self.hg._encoder()
            if hasattr(enc, "_count_matrix"):
                # hashed encoder: hash on host, encode+search in ONE dispatch
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
                pad = cap - len(rows)
                rows = np.concatenate([rows, np.full(pad, len(padded))]).astype(np.int32)
                cols = np.concatenate([cols, np.zeros(pad)]).astype(np.int32)
                vals = np.concatenate([vals, np.zeros(pad)]).astype(np.float32)
                idf = getattr(self.hg, "_idf", None)
                idf = (np.ones(enc.buckets, np.float32) if idf is None
                       else np.asarray(idf, np.float32))
                lsa = getattr(self.hg, "_lsa", None)  # corpus-fitted basis —
                # must match hg.encode_query or fused/host paths diverge
                proj = enc._proj if lsa is None else jnp.asarray(
                    np.asarray(lsa, np.float32))
                packed = np.asarray(_encode_and_search(
                    jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
                    proj, jnp.asarray(idf), self.gt, w,
                    n_rows=len(padded), top_k=self._default_top_k,
                    member_top_m=member_top_m))
                idx = packed[..., 0].astype(np.int64)
                score, sem = packed[..., 1], packed[..., 2]
                ok = packed[..., 3] > 0.5
            else:
                q = jnp.asarray(self.hg.encode_query(padded))
                res = hybrid_search_batch(self.gt, q, w,
                                          top_k=self._default_top_k,
                                          member_top_m=member_top_m)
                idx = np.asarray(res.reranked_idx)
                score = np.asarray(res.reranked_score)
                sem = np.asarray(res.reranked_sem)
                ok = np.asarray(res.reranked_valid)
        self._warm_buckets.add(bucket)
        out = []
        for b in range(len(queries)):
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
