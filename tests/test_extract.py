from ahrag_tpu.extract.chunking import smart_chunks
from ahrag_tpu.extract.extractor import (HypergraphExtractor, coerce_confidence,
                                         salvage_objects)


def test_smart_chunks_small_passthrough():
    assert smart_chunks("hello world") == ["hello world"]


def test_smart_chunks_splits_on_blank_lines():
    text = "\n\n".join(f"Paragraph {i}. " + "word " * 400 for i in range(10))
    chunks = smart_chunks(text, model_ctx=1000, max_output=200, buffer=100)
    assert len(chunks) > 1
    assert all(chunks)
    # content preserved
    joined = "\n\n".join(chunks)
    for i in range(10):
        assert f"Paragraph {i}." in joined


def test_smart_chunks_hard_splits_giant_paragraph():
    text = "\n".join("line with several words here" for _ in range(2000))
    chunks = smart_chunks(text, model_ctx=1000, max_output=200, buffer=100)
    assert len(chunks) > 1


def test_coerce_confidence():
    assert coerce_confidence(7) == 7.0
    assert coerce_confidence("8.5") == 8.5
    assert coerce_confidence("高") == 9.0
    assert coerce_confidence("中") == 6.0
    assert coerce_confidence("低") == 3.0
    assert coerce_confidence("garbage") == 6.0
    assert coerce_confidence(None) == 6.0


def test_salvage_objects():
    text = 'prefix {"a": 1} middle {"b": {"c": 2}} broken {"d": suffix'
    objs = salvage_objects(text)
    assert objs == [{"a": 1}, {"b": {"c": 2}}]


def test_fallback_extract_deterministic():
    ex = HypergraphExtractor()
    text = ("Tim Burton directed Ed Wood in 1994. "
            "Scott Derrickson is an American director.")
    out1 = ex.fallback_extract(text)
    out2 = ex.fallback_extract(text)
    assert [e.model_dump() for e in out1] == [e.model_dump() for e in out2]
    names = {e.name for x in out1 for e in x.entities}
    assert "Tim Burton" in names and "Scott Derrickson" in names
    assert all(x.relation_type in {"CoOccurrence", "Mention"} for x in out1)


def test_fallback_extract_empty_text_document_stub():
    out = HypergraphExtractor().fallback_extract("no capitalized words here at all.")
    assert len(out) == 1 and out[0].relation_type == "DocumentSummary"


def test_type_normalization():
    ex = HypergraphExtractor()
    assert ex.normalize_entity_type("Person", "X", None, "") == "person"
    assert ex.normalize_entity_type("film", "X", None, "") == "work"
    assert ex.normalize_entity_type(None, "Duke University", "a university", "") == \
        "organization"
    assert ex.normalize_entity_type(None, "1994", None, "") == "date"
    assert ex.normalize_entity_type(None, "Governor Smith",
                                    "the governor of a state", "") == "position"


def test_llm_extract_with_fake_backend(fake_llm):
    fake_llm["responses"].append(
        '{"extractions": [{"hyperedge": "Tim Burton directed Ed Wood", '
        '"relation_type": "Directed", "confidence_score": "高", '
        '"entities": [{"name": "Tim Burton", "type": "director", '
        '"description": "American film director"}]}]}')
    out = HypergraphExtractor().extract("Tim Burton directed Ed Wood.")
    assert len(out) == 1
    assert out[0].confidence_score == 9.0  # zh coercion
    assert out[0].entities[0].type == "person"  # alias normalization


def test_llm_extract_salvage_path(fake_llm):
    # malformed wrapper, but objects recoverable
    fake_llm["responses"].append(
        'Sure! Here are results: {"hyperedge": "A met B", "relation_type": "Met", '
        '"entities": [{"name": "Alice Smith", "type": "person", "description": "a"}], '
        '"confidence_score": 7} trailing garbage')
    out = HypergraphExtractor().extract("Alice Smith met Bob.")
    assert out and out[0].relation_type == "Met"


def test_llm_extract_garbage_falls_back(fake_llm):
    fake_llm["default"] = "completely unusable output"
    out = HypergraphExtractor().extract("Tim Burton directed Ed Wood.")
    assert out  # regex fallback produced extractions
    assert out[0].relation_type in {"CoOccurrence", "Mention", "DocumentSummary"}


def test_max_8_extractions(fake_llm):
    items = ", ".join(
        f'{{"hyperedge": "fact {i}", "relation_type": "R", "confidence_score": 5, '
        f'"entities": [{{"name": "E{i}", "type": "concept", "description": "d"}}]}}'
        for i in range(12))
    fake_llm["responses"].append(f'{{"extractions": [{items}]}}')
    out = HypergraphExtractor().extract("text")
    assert len(out) == 8


def test_junk_sentence_openers_not_entities():
    """Participial/prepositional sentence openers must not become entity
    nodes — they dilute retrieval slots on every per-question KG."""
    ex = HypergraphExtractor()
    text = ("=== Vera Quiroga ===\n"
            "Hailing from Brazil, Vera Quiroga took up the craft of "
            "astronomer. To this day, Vera Quiroga practices as a "
            "astronomer.")
    out = ex.fallback_extract(text)
    names = {e.name for h in out for e in h.entities}
    assert "Hailing" not in names and "To" not in names
    assert "Vera Quiroga" in names
    assert "Brazil" in names


def test_work_section_possessive_anaphora_resolution():
    from ahrag_tpu.extract.extractor import resolve_section_pronouns
    text = ("=== The Emerald Causeway ===\n"
            "Priya Weiss called the shots on The Emerald Causeway, a noir "
            "feature that arrived in cinemas in 1975. Katya Ibanez fronts "
            "the ensemble, and its narrative is anchored in Halifax.")
    resolved = resolve_section_pronouns(text)
    assert "The Emerald Causeway's narrative" in resolved
    # person sections keep their 'its' untouched
    ptext = ("=== Priya Weiss ===\n"
             "Priya Weiss admired the city and its markets.")
    assert "its markets" in resolve_section_pronouns(ptext)
