from ahrag_tpu.answer.context import ContextProcessor, extract_kept_spans
from ahrag_tpu.answer.extractive import extract_answer
from ahrag_tpu.answer.generator import AnswerGenerator
