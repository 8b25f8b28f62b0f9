"""Serving CLI: HTTP retrieval/QA service over a graph snapshot."""
from __future__ import annotations

import argparse

from ahrag_tpu.serve import RetrievalService, serve_http


def main() -> None:
    ap = argparse.ArgumentParser(description="Serve retrieval + QA over HTTP")
    ap.add_argument("--graph", default="graph")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=2.0)
    ap.add_argument("--request-timeout-s", type=float, default=10.0,
                    help="per-request deadline; expired requests get HTTP 503")
    args = ap.parse_args()
    service = RetrievalService(graph_dir=args.graph, max_batch=args.max_batch,
                               max_wait_s=args.max_wait_ms / 1000.0,
                               request_timeout_s=args.request_timeout_s)
    server = serve_http(service, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{args.port} "
          f"({service.hg.number_of_nodes()} nodes)")

    # graceful shutdown under load: SIGTERM/SIGINT stop accepting connections,
    # in-flight batches drain (MicroBatcher.close joins the worker with a
    # bounded timeout), then the process exits
    import signal
    import threading

    def _stop(signum, frame):
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    try:
        server.serve_forever()
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
