"""Learned span reader: the schema-free answering path.

The reference's answer layer generalizes to arbitrary relation schemas
because an LLM reads the evidence (answer/generator.py:100, prompt at
:25-67). This package is the TPU-native counterpart: a small flax
transformer trained ON DEVICE to point at answer spans given (question,
evidence) — no relation vocabulary, no hand rules. Training data is
meta-generated with RANDOMIZED relation surfaces (data.py), so the model
can only learn the relation-agnostic structure of the task (anchor
entity match, answer-type agreement, sentence-level evidence overlap,
fact novelty) — which is exactly what transfers to relation types it has
never seen (eval/synth.py v5).
"""
from ahrag_tpu.models.reader.model import SpanReader, ReaderConfig
from ahrag_tpu.models.reader.features import featurize, decode_span, FeatureBatch
