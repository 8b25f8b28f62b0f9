"""Conjunctive-verification rescue (answer/qa.py::constraint_coverage and
agent/inference.py::_constraint_rescue helpers).

On a corpus-scale shared KB, description questions ("the <genre> release of
<year>") leave the gold paragraph mid-pool in dense ranking: each term alone
is common, only the conjunction is unique. constraint_coverage re-ranks a
dense candidate pool by rarity-weighted term-conjunction coverage, scoped to
sentence windows so hub nodes (merged many-source descriptions) cannot cover
a conjunction by accumulation. No reference counterpart — the reference's
MiniLM+HNSW seed path (hierarchical_graph.py:706-714) is equally
conjunction-blind (see the qa.py docstring's Deviation note).
"""
from ahrag_tpu.answer.qa import (_query_constraint_terms, _stem_close,
                                 constraint_coverage, extract_facts)


def test_query_constraint_terms_structure():
    terms = dict(_query_constraint_terms(
        "Who helmed the noir picture that premiered in 1996?"))
    # content terms + the year survive; function words drop
    assert "noir" in terms and "1996" in terms
    assert "the" not in terms and "that" not in terms and "in" not in terms
    # multiword capitalized spans are entity names -> excluded
    terms2 = dict(_query_constraint_terms(
        "Who directed The Gilded Causeway in 1996?"))
    assert "Gilded" not in terms2 and "Causeway" not in terms2
    assert "1996" in terms2
    # a single capitalized token (demonym) is kept, flagged capitalized
    terms3 = _query_constraint_terms(
        "In which year was the Spanish sculptor born?")
    assert ("Spanish", True) in terms3 and ("sculptor", False) in terms3


def test_stem_close_inflection_not_compounds():
    assert _stem_close("anim", "animat")        # animated/animation stems
    assert _stem_close("sculptor", "sculptor")
    assert not _stem_close("film", "filmmaker")  # compound: 5 chars deeper
    assert not _stem_close("war", "warden")      # short stems never prefix


def test_conjunction_beats_single_term_matches():
    q = "Who helmed the noir picture that premiered in 1996?"
    texts = [
        "The Silver Gate opened in 1996 as a work of western cinema.",
        "The Dark Alley opened in 2001 as a work of noir cinema.",
        "The Hollow Tide opened in 1996 as a work of noir cinema.",
        "The Bright Field opened in 1996 as a work of musical cinema.",
    ]
    ranked = constraint_coverage(q, texts)
    assert ranked and ranked[0][0] == 2  # the noir AND 1996 candidate


def test_sentence_window_blocks_hub_accumulation():
    q = "Who helmed the noir picture that premiered in 1996?"
    hub = ("Ada Weiss lives here. " * 1
           + "A noir festival ran once. "
           + "Many people were born here. " * 3
           + "The year 1996 saw a parade. ")
    gold = ("The Hollow Tide opened in 1996 as a work of noir cinema. "
            "It was widely praised.")
    # decoys decorrelate the term columns, as a real dense pool does
    decoys = ["A western from 1996.", "A noir piece from 2001.",
              "A musical from 1988."]
    ranked = constraint_coverage(q, [hub, gold] + decoys)
    # hub covers both terms document-wide but never within adjacent sentences
    assert ranked[0][0] == 1
    assert all(i != 0 for i, _, _ in ranked)


def test_requires_two_term_groups():
    # one content term -> no rescue signal at all
    assert constraint_coverage("Who is Ximena?", ["Ximena is here."]) == []
    # candidates covering fewer than two groups are dropped
    q = "Who helmed the noir picture that premiered in 1996?"
    ranked = constraint_coverage(q, ["A western from 2001."])
    assert ranked == []


def test_who_clause_does_not_reorder_known_persons():
    # the star holds a who-clause in an UNRELATED org paragraph; both credit
    # spans are typed persons via their appositives, so the film's own
    # mention order must stand: first credit -> director, second -> star
    sents = [
        "The Burning Quarry opened to audiences in 2002 as a work of noir "
        "cinema.",
        "On The Burning Quarry, the camera answered to Priya Vasquez; "
        "Zofia Jankowski carries the leading role.",
        "Zofia Jankowski, a Nigerian mycologist, entered the world at "
        "Ibadan in 1950.",
        "Priya Vasquez, a Mexican architect, entered the world at "
        "Guadalajara in 1932.",
        "Harbor Collective owes its existence to Zofia Jankowski, who put "
        "the venture in motion in 1979.",
    ]
    f = extract_facts(sents)
    assert f.directed_by.get("The Burning Quarry") == "Priya Vasquez"
    assert f.stars.get("The Burning Quarry") == ["Zofia Jankowski"]
