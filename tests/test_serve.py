import json
import threading
import time
import urllib.request

import pytest

from ahrag_tpu.serve import MicroBatcher, RetrievalService, serve_http
from tests.helpers import build_film_graph


@pytest.fixture(scope="module")
def service():
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    svc = RetrievalService(hg=hg, max_wait_s=0.005)
    yield svc
    svc.close()


def test_microbatcher_coalesces():
    batches = []

    def process(items):
        batches.append(list(items))
        return [x * 2 for x in items]

    mb = MicroBatcher(process, max_batch=8, max_wait_s=0.05)
    results = {}

    def call(x):
        results[x] = mb.submit(x)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert results == {i: i * 2 for i in range(6)}
    assert sum(len(b) for b in batches) == 6
    assert max(len(b) for b in batches) > 1  # actually coalesced


def test_microbatcher_quiet_window_grows_batches():
    """Quiet-window coalescing keeps the batch open while arrivals continue:
    submitters staggered PAST the base max_wait_s deadline still land in one
    batch when each arrival extends the deadline (serve.py MicroBatcher
    coalesce_quiet_s), whereas the fixed deadline alone would flush early."""
    batches = []

    def process(items):
        batches.append(list(items))
        return list(items)

    # base window 0.1s, arrivals every ~0.05s: items 2..7 land PAST the base
    # deadline but inside the 1.0s-per-arrival quiet window, so the train
    # coalesces; a fixed deadline would flush at 0.1s with items 0-1 only.
    # quiet_s (1.0s) is set far above any plausible scheduler stall between
    # consecutive 0.05s-staggered arrivals, and a stalled WORKER only
    # concentrates arrivals further — both failure modes push toward FEWER
    # batches, so the <=2 bound is stall-tolerant by construction (ADVICE r4).
    mb = MicroBatcher(process, max_batch=64, max_wait_s=0.1,
                      coalesce_quiet_s=1.0, coalesce_cap_s=30.0)
    n = 8

    def call(mb_, i, stagger):
        time.sleep(stagger * i)
        mb_.submit(i)

    threads = [threading.Thread(target=call, args=(mb, i, 0.05))
               for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert sum(len(b) for b in batches) == n
    # allow 2 batches for a >1s thread-start stall on a loaded 1-core host;
    # the fixed deadline alone would produce >=3
    assert len(batches) <= 2, batches


def test_microbatcher_coalesce_cap_bounds_extension():
    """The cap bounds how long arrivals can extend the window: under a
    continuous arrival train (stagger << quiet_s, so the quiet window alone
    would hold the batch open for the whole train), the cap must flush
    mid-train — some item lands in a second batch. The train (2.4s) is an
    order of magnitude longer than the cap (0.25s) so the split survives
    multi-hundred-ms scheduler stalls before/while the worker coalesces."""
    batches = []

    def process(items):
        batches.append(list(items))
        return list(items)

    mb = MicroBatcher(process, max_batch=64, max_wait_s=0.05,
                      coalesce_quiet_s=0.5, coalesce_cap_s=0.25)
    n, stagger = 24, 0.1

    def call(i):
        time.sleep(stagger * i)
        mb.submit(i)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert sum(len(b) for b in batches) == n
    assert len(batches) >= 2, batches


def test_microbatcher_cross_generation_stress():
    """Regression (ADVICE r1 high): a submitter whose wakeup is delayed past the
    next batch's flush must still read ITS OWN generation's results, not the
    latest batch's. 12 threads × 200 rounds with jittered submits exercised the
    old single-slot race into thousands of failures."""
    import random
    import time as _time

    def process(items):
        _time.sleep(random.random() * 0.002)  # let generations overlap
        return [x * 2 for x in items]

    mb = MicroBatcher(process, max_batch=4, max_wait_s=0.0005)
    errors = []

    def worker(base):
        for i in range(200):
            x = base * 1000 + i
            try:
                got = mb.submit(x)
                if got != x * 2:
                    errors.append((x, got))
            except Exception as exc:  # IndexError etc. under the old race
                errors.append((x, repr(exc)))

    threads = [threading.Thread(target=worker, args=(b,)) for b in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert not errors, errors[:5]


def test_microbatcher_survives_process_exception():
    """Regression (ADVICE r1 medium): a raising process() must fail that batch's
    submitters with an error — and keep the worker alive for future batches."""
    def process(items):
        if any(x is None for x in items):
            raise ValueError("malformed item")
        return [x * 2 for x in items]

    mb = MicroBatcher(process, max_batch=1, max_wait_s=0.0005)
    with pytest.raises(RuntimeError, match="batch processing failed"):
        mb.submit(None)
    assert mb.submit(21) == 42  # worker still alive
    mb.close()


def test_service_search_and_answer(service):
    res = service.search("Who directed Ed Wood?")
    assert res and res[0]["score"] >= res[-1]["score"]
    many = service.search_many(["Tim Burton", "Doctor Strange"])
    assert len(many) == 2
    ans = service.answer("Who directed the film Ed Wood?")
    assert ans["answer"] and "retrieved_nodes" in ans
    stats = service.stats()
    assert stats["graph"]["n_nodes"] == 10
    # first call per batch shape is labeled warmup (compile excluded from the
    # steady-state timer); repeat at a warmed shape lands in search_batch
    assert "search_batch_warmup" in stats["timers"]
    service.search_many(["Tim Burton", "Doctor Strange"])
    assert "search_batch" in service.stats()["timers"]


def test_concurrent_search_consistency(service):
    """Coalesced concurrent calls return each caller's own result."""
    queries = ["Tim Burton", "Doctor Strange", "Adam Collis", "Ed Wood film"]
    expected = {q: [r["node_id"] for r in service.search_many([q])[0]]
                for q in queries}
    results = {}

    def call(q):
        results[q] = [r["node_id"] for r in service.search(q)]

    threads = [threading.Thread(target=call, args=(q,)) for q in queries * 2]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for q in queries:
        assert results[q] == expected[q], q


def test_http_endpoints(service):
    server = serve_http(service, host="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz") as r:
            assert json.loads(r.read())["ok"] is True
        req = urllib.request.Request(
            f"{base}/search", data=json.dumps({"query": "Ed Wood"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
            assert body["results"][0]
        req = urllib.request.Request(
            f"{base}/answer",
            data=json.dumps({"query": "Who directed Ed Wood?"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert json.loads(r.read())["answer"]
        with urllib.request.urlopen(f"{base}/stats") as r:
            assert "timers" in json.loads(r.read())
    finally:
        server.shutdown()


def test_beam_endpoint(service):
    res = service.beam("Who directed Ed Wood?", beam_width=4, depth=2, top_k=5)
    assert res and all("node_id" in r for r in res)


def test_lazy_top_level_exports():
    import ahrag_tpu
    assert ahrag_tpu.HierarchicalGraph.__name__ == "HierarchicalGraph"
    assert ahrag_tpu.RetrievalService.__name__ == "RetrievalService"


def test_batch_bucketing():
    from ahrag_tpu.serve import RetrievalService
    b = RetrievalService._bucket
    assert b(1) == 1 and b(2) == 4 and b(5) == 16 and b(17) == 64
    assert b(64) == 64 and b(65) == 256 and b(300) == 512


def test_latency_percentiles_and_batcher_stats(service):
    from ahrag_tpu.cli.serve_bench import run_load
    report = run_load(service, ["Tim Burton", "Doctor Strange", "Ed Wood"],
                      threads=4, requests_per_thread=3, warmup=1)
    assert report["errors"] == 0 and report["requests"] == 12
    lat = report["latency_ms"]
    assert lat["count"] == 12
    assert 0 < lat["p50_ms"] <= lat["p95_ms"] <= lat["p99_ms"] <= lat["max_ms"]
    st = service.stats()
    assert st["batcher"]["items"] >= 12
    assert st["batcher"]["mean_batch"] >= 1.0
    assert "request" in st["latency"]


def test_fused_serving_path_matches_host_search(service):
    """The one-dispatch encode+search program must rank exactly like hg.search."""
    for q in ["Who directed Ed Wood?", "American film directors", "Doctor Strange"]:
        fused = service.search_many([q])[0]
        host = service.hg.search(q, top_k=5)
        assert [r["node_id"] for r in fused] == [r["node_id"] for r in host], q
        for a, b in zip(fused, host):
            assert abs(a["score"] - b["score"]) < 1e-3


def test_serving_thread_safety_stress(service):
    """Many threads × mixed endpoints: results stay per-caller-correct and no
    deadlocks/exceptions (the reference is single-threaded; our serving layer
    must be safe under ThreadingHTTPServer concurrency)."""
    queries = ["Tim Burton", "Doctor Strange", "Adam Collis", "Ed Wood film",
               "Kathryn Bigelow", "American directors"]
    expected = {q: [r["node_id"] for r in service.search_many([q])[0]]
                for q in queries}
    errors = []

    def worker(i):
        try:
            q = queries[i % len(queries)]
            if i % 7 == 3:
                service.stats()
            got = [r["node_id"] for r in service.search(q)]
            if got != expected[q]:
                errors.append((q, got))
        except Exception as exc:
            errors.append(repr(exc))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(48)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors[:3]
    lat = service.latency.snapshot().get("request", {})
    assert lat.get("count", 0) >= 48


def test_microbatcher_submit_timeout():
    """A wedged process() must fail the caller with TimeoutError, and the
    late-arriving result must not leak into the results table."""
    import threading
    import time as _t

    release = threading.Event()

    def process(batch):
        release.wait(timeout=5.0)
        return [x * 2 for x in batch]

    mb = MicroBatcher(process, max_batch=1, max_wait_s=0.0005)
    try:
        with pytest.raises(TimeoutError):
            mb.submit(21, timeout_s=0.05)
        release.set()
        _t.sleep(0.2)  # worker publishes the abandoned batch
        with mb._lock:
            assert not mb._results  # abandoned entry was dropped, not leaked
        # the batcher still works after the timeout storm
        assert mb.submit(5, timeout_s=2.0) == 10
    finally:
        release.set()
        mb.close()


def test_microbatcher_close_drains_pending():
    """close() lets already-submitted work finish (graceful shutdown) and
    rejects new submissions."""
    import threading

    started = threading.Event()

    def process(batch):
        started.set()
        return [x + 1 for x in batch]

    mb = MicroBatcher(process, max_batch=4, max_wait_s=0.2)
    results = {}

    def worker():
        results["v"] = mb.submit(41)

    t = threading.Thread(target=worker)
    t.start()
    while not mb._pending and "v" not in results:
        pass  # the submission is in flight
    mb.close(drain_timeout_s=5.0)
    t.join(timeout=5.0)
    assert results.get("v") == 42
    with pytest.raises(RuntimeError):
        mb.submit(1)


def test_http_timeout_maps_to_503(service, monkeypatch):
    import urllib.request

    def slow_search(query):
        raise TimeoutError("synthetic deadline")

    monkeypatch.setattr(service, "search", slow_search)
    server = serve_http(service, port=0)
    import threading
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=json.dumps({"query": "x"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=5)
        assert ei.value.code == 503
    finally:
        server.shutdown()


def test_microbatcher_three_stage_pipeline_correctness():
    """The r4 k-stage pipeline: per-item results survive three thread handoffs
    under concurrent submitters, and batches genuinely overlap stages (a later
    batch enters stage 1 while an earlier one is still inside stage 3)."""
    import time as _time

    overlap = {"seen": False}
    in_stage3 = threading.Event()

    def s1(items):
        if in_stage3.is_set():
            overlap["seen"] = True
        return [x + 1 for x in items]

    def s2(items):
        return [x * 10 for x in items]

    def s3(items):
        in_stage3.set()
        _time.sleep(0.005)  # hold stage 3 so the next batch can hit stage 1
        in_stage3.clear()
        return [x - 3 for x in items]

    mb = MicroBatcher(stages=[s1, s2, s3], max_batch=4, max_wait_s=0.0005)
    results = {}

    def worker(base):
        for i in range(40):
            x = base * 1000 + i
            results[x] = mb.submit(x)

    threads = [threading.Thread(target=worker, args=(b,)) for b in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert results == {x: (x + 1) * 10 - 3 for x in results}
    assert len(results) == 240
    assert overlap["seen"]  # pipelining actually overlapped stages


def test_microbatcher_mid_stage_exception_releases_batch():
    """A stage-2 failure must error THAT batch's submitters and keep every
    pipeline thread alive for the batches behind it."""
    def s1(items):
        return items

    def s2(items):
        if any(x is None for x in items):
            raise ValueError("bad batch")
        return [x * 2 for x in items]

    mb = MicroBatcher(stages=[s1, s2], max_batch=1, max_wait_s=0.0005)
    with pytest.raises(RuntimeError, match="batch processing failed"):
        mb.submit(None)
    assert mb.submit(5) == 10
    mb.close()


def test_microbatcher_close_poisons_wedged_pipeline():
    """close() with a batch wedged inside a stage must release its submitter
    with an error after the drain timeout — and a LATE stage completion must
    not resurrect the poisoned generation."""
    import time as _time

    release = threading.Event()

    def s1(items):
        return items

    def s2(items):
        release.wait(5.0)
        return [x * 2 for x in items]

    mb = MicroBatcher(stages=[s1, s2], max_batch=1, max_wait_s=0.0005)
    got = {}

    def caller():
        try:
            got["r"] = mb.submit(7)
        except RuntimeError as exc:
            got["err"] = str(exc)

    t = threading.Thread(target=caller)
    t.start()
    _time.sleep(0.05)  # let the batch reach the wedged stage
    mb.close(drain_timeout_s=0.2)
    t.join(timeout=3.0)
    assert not t.is_alive()
    assert "drain exceeded" in got.get("err", got.get("r", ""))
    release.set()  # late completion publishes into a poisoned generation
    _time.sleep(0.1)
    assert not mb._results  # poisoned gen not resurrected


def test_microbatcher_parallel_last_stage_overlaps_round_trips():
    """last_stage_workers=2: two batches can sit inside the last stage at
    once (overlapped device round trips), and per-generation publishing keeps
    results correct even when batches complete out of order."""
    import time as _time

    active = {"n": 0, "max": 0}
    gate = threading.Lock()

    def s1(items):
        return items

    def s2(items):
        with gate:
            active["n"] += 1
            active["max"] = max(active["max"], active["n"])
        _time.sleep(0.004 if (items and items[0] % 2) else 0.012)
        with gate:
            active["n"] -= 1
        return [x * 3 for x in items]

    mb = MicroBatcher(stages=[s1, s2], max_batch=1, max_wait_s=0.0002,
                      last_stage_workers=2)
    results = {}

    def worker(base):
        for i in range(30):
            x = base * 1000 + i
            results[x] = mb.submit(x)

    threads = [threading.Thread(target=worker, args=(b,)) for b in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert results == {x: x * 3 for x in results}
    assert len(results) == 120
    assert active["max"] == 2  # both workers were concurrently inside stage 2


def test_microbatcher_mid_stage_workers():
    """3-stage pipeline with 2 middle-stage workers: results stay correct
    under concurrent load, both mid workers run concurrently, and close()
    drains cleanly (the sentinel must fan out to siblings yet forward only
    ONCE downstream)."""
    active = {"now": 0, "max": 0}
    lock = threading.Lock()

    def s1(items):
        return items

    def s2(token):
        with lock:
            active["now"] += 1
            active["max"] = max(active["max"], active["now"])
        time.sleep(0.004)
        with lock:
            active["now"] -= 1
        return token

    def s3(token):
        return [x * 7 for x in token]

    mb = MicroBatcher(stages=[s1, s2, s3], max_batch=1, max_wait_s=0.0002,
                      last_stage_workers=2, mid_stage_workers=2)
    results = {}

    def worker(base):
        for i in range(25):
            x = base * 1000 + i
            results[x] = mb.submit(x)

    threads = [threading.Thread(target=worker, args=(b,)) for b in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert results == {x: x * 7 for x in results}
    assert len(results) == 100
    assert active["max"] == 2   # both mid workers ran concurrently
