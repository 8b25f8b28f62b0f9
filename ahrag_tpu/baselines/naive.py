"""NaiveRAG baseline: flat vector top-k + direct generation.

Parity with baselines/naive_rag.py:7-35 — uses the graph's hybrid search as a flat
top-k, concatenates ``[nid] title :: summary[:200]`` lines into the context, and
shares the AnswerGenerator. This is the CPU-runnable brute-force baseline named in
BASELINE.json config 1.
"""
from __future__ import annotations

from typing import Any, Dict, List


class NaiveRAG:
    def __init__(self, hg: Any, answer_generator: Any) -> None:
        self.hg = hg
        self.answer_generator = answer_generator

    def run(self, query: str, top_k: int = 5,
            gen_cfg: Dict[str, Any] | None = None) -> Dict[str, Any]:
        res = self.hg.search(query, top_k=top_k, return_cluster=False)
        ids: List[str] = [x["node_id"] for x in (res or []) if x.get("node_id")]
        skeleton = []
        for nid in ids:
            d = self.hg.nodes.get(nid, {})
            title = d.get("title") or d.get("name") or ""
            summary = (d.get("summary_text") or d.get("summary")
                       or d.get("description") or "")
            skeleton.append(f"- [{nid}] {title} :: {summary[:200]}")
        context = {"context_text": "\n".join(skeleton), "used_nodes": ids, "stats": {}}
        out = self.answer_generator.generate(query, context, gen_cfg or {})
        out["retrieved_nodes"] = ids
        out["context"] = context
        return out
