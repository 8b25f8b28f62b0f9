"""Build-pipeline entry point: ingest a document, build the hierarchy, search.

Parity with scripts/demo_cli.py:75-143 — 5 phases: extract -> aggregate (embed,
cluster, summaries, relations with the looser demo thresholds overlap>=1/jac>=.05/
cos>=.3, L2 communities) -> unified graph build -> vector index (layers {0,1,2},
reset) -> interactive search REPL.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Optional

from ahrag_tpu.aggregate.aggregator import SemanticAggregator
from ahrag_tpu.extract.chunking import smart_chunks
from ahrag_tpu.extract.extractor import HypergraphExtractor
from ahrag_tpu.graph import HierarchicalGraph


def run_pipeline(input_path: str, artifacts_dir: str = "artifacts",
                 graph_dir: str = "graph",
                 encoder_name: Optional[str] = None,
                 judge: bool = False) -> Optional[HierarchicalGraph]:
    with open(input_path, "r", encoding="utf-8") as f:
        document = f.read()

    print("[1/5] Extracting L0 hyperedges...")
    extractor = HypergraphExtractor()
    all_extractions = []
    for i, chunk in enumerate(smart_chunks(document)):
        ex = extractor.extract(chunk)
        if ex:
            all_extractions.extend(ex)
        else:
            print(f"  [warn] chunk {i} produced no extractions; skipped")
    if not all_extractions:
        print("[fatal] no valid extractions produced; aborting.")
        return None
    os.makedirs(artifacts_dir, exist_ok=True)
    out = []
    for i, e in enumerate(all_extractions):
        d = e.model_dump()
        d["id"] = f"h{i}"
        out.append(d)
    with open(os.path.join(artifacts_dir, "extractions.json"), "w",
              encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False, indent=2)

    print("[2/5] Aggregating to L1 (embeddings, topics, summaries, relations)...")
    agg = SemanticAggregator(encoder_name=encoder_name, artifact_dir=artifacts_dir)
    agg.embed_l0_entities(all_extractions)
    clust = agg.cluster_entities()
    agg.summarize_topics(clust["l1_nodes"])
    edges = agg.generate_l1_relations(clust["l1_nodes"], min_overlap=1,
                                      min_jaccard=0.05, min_cosine=0.3)
    print("[2.5/5] Aggregating to L2 via communities...")
    l2 = agg.aggregate_level2_via_communities(clust["l1_nodes"])
    if judge:
        agg.judge_samples(clust["l1_nodes"], edges)
        agg.judge_level_nodes(l2)
    agg.compute_escalation_metrics(clust["l1_nodes"], l2)

    print("[3/5] Building unified graph...")
    hg = HierarchicalGraph(encoder_name=encoder_name)
    hg.build_from_artifacts(artifacts_dir)
    print("[4/5] Building vector index...")
    hg.build_vector_index(layers=(0, 1, 2), reset=True)
    hg.save(graph_dir, meta={"source": os.path.abspath(input_path)})
    print("[5/5] Ready.", json.dumps(hg.stats()))
    return hg


def interactive_search(hg: HierarchicalGraph) -> None:
    print("Enter your queries (empty line to exit):")
    while True:
        try:
            q = input("query> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            break
        if not q:
            break
        print(json.dumps(hg.search(q, top_k=5), ensure_ascii=False, indent=2))


def main() -> None:
    ap = argparse.ArgumentParser(description="Ingest a document and run hybrid search")
    ap.add_argument("path", help="Path to a UTF-8 text file")
    ap.add_argument("--artifacts", default="artifacts")
    ap.add_argument("--graph", default="graph")
    ap.add_argument("--encoder", default=None, help="hashed|minilm")
    ap.add_argument("--judge", action="store_true", help="run LLM judge sampling")
    ap.add_argument("--no-repl", action="store_true")
    args = ap.parse_args()
    hg = run_pipeline(args.path, artifacts_dir=args.artifacts, graph_dir=args.graph,
                      encoder_name=args.encoder, judge=args.judge)
    if hg is None:
        raise SystemExit(1)
    if not args.no_repl:
        interactive_search(hg)


if __name__ == "__main__":
    main()
