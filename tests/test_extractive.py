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
