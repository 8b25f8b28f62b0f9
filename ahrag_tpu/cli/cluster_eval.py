"""Hierarchy-quality validation at scale against known topic structure.

VERDICT r1 item 7: build the full L0->L1->L2 hierarchy over a >=10k-entity
synthetic corpus with ground-truth topics (eval/clustering.py generator),
measure external cluster quality (purity/NMI/noise-detection) of L1 and the
escalation metrics (compression/coverage) of L2 vs the known structure.

Usage: python -m ahrag_tpu.cli.cluster_eval --n 10000 --topics 48 --out reports/...
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
import time
from typing import Any, Dict


def run(n: int, n_topics: int, noise_frac: float, seed: int,
        encoder_name: str = "hashed", n_super: int = 0,
        super_frac: float = 0.3) -> Dict[str, Any]:
    from ahrag_tpu.aggregate.aggregator import SemanticAggregator
    from ahrag_tpu.eval.clustering import (make_labeled_entities, nmi,
                                           noise_prf, purity)
    from ahrag_tpu.schema import Entity, HypergraphExtraction

    entities, labels = make_labeled_entities(n, n_topics, seed=seed,
                                             noise_frac=noise_frac,
                                             n_super=n_super,
                                             super_frac=super_frac)
    extractions = [HypergraphExtraction(
        hyperedge=f"{e['name']} exists", relation_type="Fact",
        entities=[Entity(name=e["name"], type=e["type"],
                         description=e["description"])],
        confidence_score=8.0) for e in entities]

    out: Dict[str, Any] = {"n_entities": n, "n_true_topics": n_topics,
                           "n_true_super": n_super, "super_frac": super_frac,
                           "noise_frac": noise_frac, "seed": seed,
                           "encoder": encoder_name}
    with tempfile.TemporaryDirectory() as tmp:
        agg = SemanticAggregator(encoder_name=encoder_name, artifact_dir=tmp)
        t0 = time.perf_counter()
        agg.embed_l0_entities(extractions)
        out["embed_s"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        res = agg.cluster_entities()
        out["cluster_s"] = round(time.perf_counter() - t0, 2)

        name_to_label = {e["name"]: l for e, l in zip(entities, labels)}
        pred_by_name: Dict[str, int] = {}
        for node in res["l1_nodes"]:
            for m in node["members"]:
                pred_by_name[m] = node["topic_id"]
        names = [e["name"] for e in entities]
        pred = [pred_by_name.get(nm, -1) for nm in names]
        true = [name_to_label[nm] for nm in names]
        out["l1"] = {"n_pred_topics": len(res["l1_nodes"]),
                     "n_outliers": res.get("n_outliers", 0),
                     "purity": round(purity(pred, true), 4),
                     "nmi": round(nmi(pred, true), 4),
                     "noise": {k: round(v, 4)
                               for k, v in noise_prf(pred, true).items()}}

        # L2 build + escalation metrics over the real pipeline
        t0 = time.perf_counter()
        agg.summarize_topics(res["l1_nodes"])
        # demo build-pipeline thresholds (cli/demo.py:55-56), not the stricter
        # library defaults — this eval scores the production build path
        edges = agg.generate_l1_relations(res["l1_nodes"], min_overlap=1,
                                          min_jaccard=0.05, min_cosine=0.3)
        l2 = agg.aggregate_level2_via_communities(res["l1_nodes"],
                                                  min_comm_size=2)
        metrics = agg.compute_escalation_metrics(res["l1_nodes"], l2)
        out["l2_s"] = round(time.perf_counter() - t0, 2)
        out["l2"] = {"n_l1_edges": len(edges), "n_l2_nodes": len(l2),
                     "escalation": metrics}

        # super-topic recovery: entity -> predicted L1 topic -> L2 community,
        # scored against the generator's ground-truth super label (label % S)
        if n_super > 0:
            l1_to_l2 = json.loads(
                open(os.path.join(tmp, "l1_to_l2.json")).read() or "{}")
            sup_pred = [-1 if (p == -1 or str(p) not in l1_to_l2)
                        else int(l1_to_l2[str(p)]) for p in pred]
            sup_true = [-1 if t == -1 else t % n_super for t in true]
            scored = [(sp, st) for sp, st in zip(sup_pred, sup_true)
                      if st != -1]
            out["super"] = {
                "purity": round(purity([s for s, _ in scored],
                                       [t for _, t in scored]), 4),
                "nmi": round(nmi([s for s, _ in scored],
                                 [t for _, t in scored]), 4),
                "frac_mapped": round(
                    sum(1 for s, _ in scored if s != -1) / max(len(scored), 1),
                    4),
            }
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--topics", type=int, default=48)
    ap.add_argument("--super", type=int, default=0, dest="n_super")
    ap.add_argument("--super-frac", type=float, default=0.3, dest="super_frac")
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--encoder", default="hashed")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    res = run(args.n, args.topics, args.noise, args.seed, args.encoder,
              n_super=args.n_super, super_frac=args.super_frac)
    print(json.dumps(res, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w", encoding="utf-8") as fh:
            json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
