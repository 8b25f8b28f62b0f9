"""Token-budgeted document chunking.

Contract parity with the reference ``smart_chunks`` (scripts/demo_cli.py:30-72):
budget = model_ctx - max_output - buffer; split on blank lines first, hard-split
oversized paragraphs by lines.
"""
from __future__ import annotations

from typing import List

from ahrag_tpu.utils.tokens import count_tokens


def smart_chunks(text: str, model_ctx: int = 8000, max_output: int = 1200,
                 buffer: int = 400) -> List[str]:
    limit = model_ctx - max_output - buffer
    if count_tokens(text) <= limit:
        return [text]
    parts = [p.strip() for p in text.split("\n\n") if p.strip()]
    chunks: List[str] = []
    cur: List[str] = []
    cur_tokens = 0
    for p in parts:
        ptok = count_tokens(p)
        if cur_tokens + ptok + 1 <= limit:
            cur.append(p)
            cur_tokens += ptok + 1
            continue
        if cur:
            chunks.append("\n\n".join(cur))
        if ptok > limit:  # hard split by lines
            buf: List[str] = []
            buf_tok = 0
            for ln in p.splitlines():
                lt = count_tokens(ln)
                if buf_tok + lt + 1 <= limit:
                    buf.append(ln)
                    buf_tok += lt + 1
                else:
                    if buf:
                        chunks.append("\n".join(buf))
                    buf = [ln]
                    buf_tok = lt + 1
            if buf:
                chunks.append("\n".join(buf))
            cur, cur_tokens = [], 0
        else:
            cur, cur_tokens = [p], ptok + 1
    if cur:
        chunks.append("\n\n".join(cur))
    return chunks
