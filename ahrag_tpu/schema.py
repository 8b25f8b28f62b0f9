"""Core data contracts shared across the pipeline.

Parity with the reference pydantic schema (extract/hypergraph_schema.py:4-16 plus the
aggregate-side TopicSummary/JudgeScore models, aggregate/semantic_aggregator.py:22-34).
Artifact JSON written by these models is byte-compatible with the reference's layout so
reference-built artifacts compile directly into GraphTensors.
"""
from __future__ import annotations

from typing import List

from pydantic import BaseModel, Field


class Entity(BaseModel):
    name: str = Field(..., description="Entity surface name.")
    type: str = Field(..., description="Entity type (canonical set: person/organization/"
                                       "position/location/event/work/concept/date).")
    description: str = Field("", description="Short description of the entity's role.")


class HypergraphExtraction(BaseModel):
    hyperedge: str = Field(..., description="One-sentence summary of the atomic fact/event.")
    relation_type: str = Field(..., description="CamelCase relation label.")
    entities: List[Entity] = Field(..., description="Entities participating in this hyperedge.")
    confidence_score: float = Field(..., description="Extraction confidence, 1-10.")


class ExtractionResponse(BaseModel):
    extractions: List[HypergraphExtraction]


class TopicSummary(BaseModel):
    topic_id: int
    title: str
    summary: str
    confidence: float


class JudgeScore(BaseModel):
    id: int
    consistency: float
    accuracy: float
    informativeness: float
    overall: float
    comments: str = ""


class AnswerObject(BaseModel):
    """Answer-generation output contract (answer/generator.py:100-124)."""
    answer: str
    rationale: str
    citations: List[str]


CANONICAL_ENTITY_TYPES = (
    "person", "organization", "position", "location", "event", "work", "concept", "date",
)
