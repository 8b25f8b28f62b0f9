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
    args = ap.parse_args()
    service = RetrievalService(graph_dir=args.graph, max_batch=args.max_batch,
                               max_wait_s=args.max_wait_ms / 1000.0)
    server = serve_http(service, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{args.port} "
          f"({service.hg.number_of_nodes()} nodes)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
