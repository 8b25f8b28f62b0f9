from ahrag_tpu.answer.extractive import extract_answer

CONTEXT = """# Evidence Skeleton
- [ent:1] (entity) Tim Burton :: Tim Burton is an American director born in 1958. He directed the 1994 biographical film Ed Wood.
- [ent:2] (entity) Adam Collis :: Adam Collis attended Duke University from 1986 to 1990 and later studied cinema.
- [ent:3] (entity) Kathryn Bigelow :: In 2010 Kathryn Bigelow became the first woman to win the Academy Award for Best Director.
- [ent:4] (entity) Doctor Strange :: Doctor Strange is a 2016 Marvel film directed by Scott Derrickson.

# Evidence Details
[DETAIL:ent:1]
Tim Burton directed and produced the film Ed Wood, which starred Johnny Depp.
"""


def test_who_question_extracts_director():
    assert extract_answer("Who directed the 1994 film Ed Wood?", CONTEXT) == \
        "Tim Burton"


def test_who_question_does_not_answer_with_query_entity():
    out = extract_answer("Who directed Ed Wood?", CONTEXT)
    assert out != "Ed Wood"
    assert out == "Tim Burton"


def test_which_university():
    assert extract_answer("Which university did Adam Collis attend from 1986 "
                          "to 1990?", CONTEXT) == "Duke University"


def test_year_question():
    assert extract_answer("In which year did the first woman win the Academy "
                          "Award for Best Director?", CONTEXT) == "2010"


def test_who_first_woman():
    assert extract_answer("Who was the first woman to win the Academy Award for "
                          "Best Director?", CONTEXT) == "Kathryn Bigelow"


def test_which_film():
    out = extract_answer("Which Marvel film was directed by Scott Derrickson?",
                         CONTEXT)
    assert out == "Doctor Strange"


def test_no_answer_on_unrelated():
    assert extract_answer("What is the boiling point of tungsten?", CONTEXT) is None


def test_generator_uses_extractive_path():
    from ahrag_tpu.answer.generator import AnswerGenerator
    ctx = {"context_text": CONTEXT, "used_nodes": ["ent:1", "ent:2"]}
    out = AnswerGenerator().generate("Who directed the 1994 film Ed Wood?", ctx,
                                     {"use_llm": False})
    assert out["answer"] == "Tim Burton"
    assert out["citations"] == ["ent:1", "ent:2"]


def test_clean_sentences_resolves_detail_owner_pronoun():
    from ahrag_tpu.answer.extractive import _clean_sentences
    ctx = """# Evidence Skeleton
- [ent:1] (entity) Kathryn Bigelow :: Kathryn Bigelow is an American director.

# Evidence Details
[DETAIL:ent:1]
She directed The Hurt Locker, which won Best Picture.
"""
    sents = _clean_sentences(ctx)
    assert any(s.startswith("Kathryn Bigelow directed The Hurt Locker")
               for s in sents)


def test_clean_sentences_guard_against_fabrication():
    from ahrag_tpu.answer.extractive import _clean_sentences
    # owner named later in the sentence: the pronoun is someone else
    ctx = """# Evidence Skeleton
- [ent:2] (entity) Johnny Depp :: an actor.

# Evidence Details
[DETAIL:ent:2]
He directed the film Ed Wood, which starred Johnny Depp.
He directed the film Ed Wood, which starred
"""
    sents = _clean_sentences(ctx)
    assert not any(s.startswith("Johnny Depp directed") for s in sents)


def test_clean_sentences_section_header_subject():
    from ahrag_tpu.answer.extractive import _clean_sentences
    ctx = """# Evidence Details
[DETAIL:sum:1]
=== Tim Burton ===
He directed the 1994 film Ed Wood. === Doctor Strange (film) === It was directed by Scott Derrickson.
"""
    sents = _clean_sentences(ctx)
    assert any(s.startswith("Tim Burton directed the 1994 film") for s in sents)
    # 'It' resolves only via extraction-time (parenthetical) logic, not here;
    # header switching must at least stop Tim Burton leaking into the next section
    assert not any("Tim Burton was directed" in s for s in sents)


def test_resolve_section_pronouns():
    from ahrag_tpu.extract.extractor import resolve_section_pronouns
    text = ("=== Tim Burton ===\nTim Burton is a director. He directed Ed Wood. "
            "It received two Academy Awards.\n"
            "=== Doctor Strange (film) ===\nIt was directed by Scott Derrickson. "
            "He also wrote it.")
    out = resolve_section_pronouns(text)
    assert "Tim Burton directed Ed Wood." in out
    # 'It' in a person's section is NOT the person
    assert "Tim Burton received two Academy Awards" not in out
    # 'It' in a parenthetically-qualified section IS the titled work
    assert "Doctor Strange was directed by Scott Derrickson." in out
    assert "Doctor Strange also wrote it." in out


def test_context_brief_sentence_boundary():
    from ahrag_tpu.answer.context import ContextProcessor
    long = ("Scott Derrickson is an American filmmaker born in 1966. "
            "Scott Derrickson directed the 2016 superhero film Doctor Strange "
            "for Marvel Studios and more text to push past the limit easily.")
    brief = ContextProcessor._brief(long, 100)
    assert brief.endswith(".") or not brief.endswith(("Doctor S", "D"))
    assert len(brief) <= 100
    assert "\n" not in ContextProcessor._brief("a\nb " * 60, 100)


def test_which_question_focus_gating():
    ctx = """# Evidence Skeleton
- [ent:1] (entity) Scott Derrickson :: Scott Derrickson directed the horror film Sinister in 2012.
- [ent:2] (entity) Doctor Strange :: Doctor Strange is a 2016 Marvel film.
"""
    assert extract_answer("Which Marvel film was directed by the director of "
                          "Sinister?", ctx) == "Doctor Strange"
