"""Encoder factory. Config section: ``encoder`` (name/dim/seed/minilm_weights)."""
from __future__ import annotations

from functools import lru_cache
from typing import Any, Dict, Optional

from ahrag_tpu.models.encoder.base import Encoder
from ahrag_tpu.models.encoder.hashed import HashedNGramEncoder
from ahrag_tpu.models.encoder.minilm import MiniLMConfig, MiniLMEncoder


@lru_cache(maxsize=4)
def _cached(name: str, dim: int, seed: int, weights: Optional[str],
            cgram_weight: float) -> Encoder:
    if name == "minilm":
        return MiniLMEncoder(MiniLMConfig(hidden=dim) if dim != 384 else None,
                             seed=seed, weights_path=weights)
    if name == "learned":
        from ahrag_tpu.models.encoder.contrastive import (ContrastiveEncoder,
                                                          DEFAULT_CKPT)
        return ContrastiveEncoder(weights or DEFAULT_CKPT)
    return HashedNGramEncoder(dim=dim, seed=seed, cgram_weight=cgram_weight)


def create_encoder(cfg: Dict[str, Any] | None = None, name: str | None = None) -> Encoder:
    """Build (or fetch the cached) encoder described by the ``encoder`` config section.

    Caching mirrors the reference's query-embedder cache (hierarchical_graph.py:709-712)
    so repeated searches reuse one model instance.
    """
    enc_cfg = (cfg or {}).get("encoder", {}) if cfg else {}
    resolved = name or enc_cfg.get("name", "hashed")
    return _cached(
        resolved,
        int(enc_cfg.get("dim", 384)),
        int(enc_cfg.get("seed", 7)),
        (enc_cfg.get("learned_weights") if resolved == "learned"
         else enc_cfg.get("minilm_weights")),
        float(enc_cfg.get("cgram_weight", 0.3)),
    )
