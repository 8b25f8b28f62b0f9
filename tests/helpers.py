"""Shared test fixtures: a small deterministic film-themed graph."""
from __future__ import annotations

import math
from typing import Any, Dict, List

import numpy as np

from ahrag_tpu.graph import HierarchicalGraph


def build_film_graph() -> HierarchicalGraph:
    """Entities/hyperedges/summaries shaped like a hotpotqa_mini build."""
    hg = HierarchicalGraph(encoder_name="hashed")
    e_burton = hg.add_entity("Tim Burton", "American filmmaker who directed Ed Wood",
                             "person")
    e_wood = hg.add_entity("Ed Wood", "1994 American biographical film directed by "
                                      "Tim Burton", "work")
    e_derrickson = hg.add_entity("Scott Derrickson", "American director of horror films",
                                 "person")
    e_doctor = hg.add_entity("Doctor Strange", "2016 American superhero film directed "
                                               "by Scott Derrickson", "work")
    e_collis = hg.add_entity("Adam Collis", "American filmmaker and actor", "person")

    s_directors = hg.add_summary(0, "American film directors",
                                 "Directors of American films including Tim Burton and "
                                 "Scott Derrickson", confidence=7.0,
                                 top_words=["director", "american", "film"],
                                 members=["Tim Burton", "Scott Derrickson", "Adam Collis"])
    s_films = hg.add_summary(1, "American films",
                             "American films such as Ed Wood and Doctor Strange",
                             confidence=6.5, top_words=["film", "american"],
                             members=["Ed Wood", "Doctor Strange"])
    s_l2 = hg.add_summary(2, "American cinema",
                          "The American film industry: directors and their films",
                          confidence=8.0, top_words=["cinema", "american"],
                          members=["sum:0", "sum:1"], level=2)

    for e in (e_burton, e_derrickson, e_collis):
        hg.add_belongs_to(e, s_directors, prob=0.9)
    for e in (e_wood, e_doctor):
        hg.add_belongs_to(e, s_films, prob=0.9)
    hg.add_belongs_to(s_directors, s_l2, prob=1.0)
    hg.add_belongs_to(s_films, s_l2, prob=1.0)
    hg.add_related(s_directors, s_films, weight=0.6, jaccard=0.2, cosine=0.7, overlap=1)

    h1 = hg.add_hyperedge("h1", "Tim Burton directed Ed Wood", "Directed",
                          confidence_score=9.0)
    h2 = hg.add_hyperedge("h2", "Scott Derrickson directed Doctor Strange", "Directed",
                          confidence_score=8.0)
    hg.add_participation(e_burton, h1)
    hg.add_participation(e_wood, h1)
    hg.add_participation(e_derrickson, h2)
    hg.add_participation(e_doctor, h2)

    hg.nodes[s_directors]["judge_scores"] = {"overall": 8.0}
    return hg


def oracle_search(hg: HierarchicalGraph, query: str, top_k: int = 5,
                  member_top_m: int = 5, alpha=0.6, beta=0.2, gamma=0.1, delta=0.1,
                  judge_min=None, conf_min=None, type_filter=None) -> List[Dict[str, Any]]:
    """Pure-python re-implementation of the reference search semantics
    (hierarchical_graph.py:706-789) against the host graph — the parity oracle."""
    q = hg.encode_query([query])[0]
    indexed = [nid for nid in hg.nodes if nid in hg._embeddings]
    sims = {nid: float(np.dot(hg._embeddings[nid], q)) for nid in indexed}
    # mirror graph/search.py::SEM_FLUSH_EPS: |cosine| < eps is "no relation",
    # flushed to exact 0; ties then break by TENSOR ROW index (lax.top_k's
    # lowest-index-first), which is the device's deterministic order — the
    # reference's hnswlib makes no ordering promise among zero-relation rows
    sims = {nid: (0.0 if abs(s) < 1e-5 else s) for nid, s in sims.items()}
    seeds = sorted(indexed, key=lambda nid: (-sims[nid], hg.id_to_idx(nid)))[:top_k]

    # candidate priorities mirror the device layout (search.py::expand_candidates):
    # seed i at priority i; seed i's parents/members in a per-seed block after
    # ALL seeds. First-seen (lowest priority) wins on re-encounter — since every
    # seed slot precedes every expansion slot, a node that is both a seed and a
    # member keeps its seed value/priority, which is also what the reference's
    # unconditional self-assignment produces value-wise. Priority is the final
    # zero-score tie-break (exact ties exist under the LSA encoder's flushed
    # zero-relation scores; the reference's hnswlib makes no tie promise).
    expanded: Dict[str, float] = {}
    prio: Dict[str, int] = {}
    blk = 2 + member_top_m
    for i, nid in enumerate(seeds):
        nt = hg.nodes[nid].get("node_type")
        expanded[nid] = sims[nid]  # unconditional self-assignment
        prio[nid] = min(prio.get(nid, 1 << 30), i)
        if nt == "entity":
            for j, parent in enumerate(hg.get_belongs_to(nid)[:2]):
                if parent not in expanded:
                    expanded[parent] = sims[nid] * 0.9
                    prio[parent] = top_k + i * blk + j
        elif nt == "summary":
            from ahrag_tpu.graph.search import MEMBER_SIM_CAP
            members = hg.get_summary_members(nid)[:MEMBER_SIM_CAP]
            if len(members) > member_top_m:
                # mirror search.py::expand_candidates' documented deviation:
                # big-fan summaries expand their m most query-similar children
                # (ties by insertion slot; first MEMBER_SIM_CAP children
                # scanned), re-entered in insertion order
                def _msim(c: str) -> float:
                    e = hg._embeddings.get(c)
                    s = float(np.dot(e, q)) if e is not None else 0.0
                    return 0.0 if abs(s) < 1e-5 else s
                picked = sorted(range(len(members)),
                                key=lambda j: (-_msim(members[j]), j)
                                )[:member_top_m]
                members = [members[j] for j in sorted(picked)]
            else:
                members = members[:member_top_m]
            for j, child in enumerate(members):
                if child not in expanded:
                    expanded[child] = sims[nid] * 0.85
                    prio[child] = top_k + i * blk + 2 + j
    results = []
    boost_map = {"entity": 0.0, "summary": 1.0, "hyperedge": 0.0}
    for nid, sem in expanded.items():
        d = hg.nodes[nid]
        nt = d.get("node_type")
        judge = hg.node_judge_overall(nid)
        conf = hg.node_confidence(nid)
        if type_filter and nt not in type_filter:
            continue
        if judge_min is not None and (judge is None or judge < judge_min):
            continue
        if conf_min is not None and (conf is None or conf < conf_min):
            continue
        judge_term = 1.0 / (1.0 + math.exp(-(judge / 10.0))) if judge is not None else 0.0
        conf_term = conf / 10.0 if conf is not None else 0.0
        score = alpha * sem + beta * judge_term + gamma * conf_term + delta * boost_map[nt]
        results.append({"node_id": nid, "score": score, "semantic": sem})
    results.sort(key=lambda x: (-x["score"], prio[x["node_id"]]))
    return results[:top_k]
