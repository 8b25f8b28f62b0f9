"""Token counting for budget-constrained context assembly.

Contract parity with the reference (answer/context_processor.py:12-22 and
scripts/demo_cli.py:22-27): prefer a real BPE count via tiktoken when importable,
otherwise fall back to the ~4-chars-per-token heuristic (minimum 1 for non-empty
text). The native C++ estimator (ahrag_tpu.native) slots in between when built.
"""
from __future__ import annotations

from functools import lru_cache

try:  # pragma: no cover - environment dependent
    import tiktoken
except Exception:  # pragma: no cover
    tiktoken = None  # type: ignore


@lru_cache(maxsize=4)
def _encoding(name: str):
    return tiktoken.get_encoding(name)


def count_tokens(text: str, encoding: str = "cl100k_base") -> int:
    if not text:
        return 0
    if tiktoken is not None:
        try:
            return len(_encoding(encoding).encode(text))
        except Exception:
            pass
    try:  # native C++ estimator (BPE-approximating), then the crude heuristic
        from ahrag_tpu import native
        if native.available():
            return native.token_estimate(text)
    except Exception:
        pass
    return max(1, len(text) // 4)
