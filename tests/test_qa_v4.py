"""v4 question intents (answer/qa.py): filmography aggregation (counting,
superlatives), description-only film joins, creator-chain professions, and
abstention on phantom entities.

Evidence uses v1-renderer phrasing (these tests pin INTENT routing, not the
v2-marker extraction, which tests/test_qa.py and the audit cover).
"""
from ahrag_tpu.answer.qa import (answer_from_facts, extract_facts,
                                 missing_entities, related_expansion_targets,
                                 unanswerable)

SENTS = [
    "The Gilded Causeway is a 2002 animated film directed by Ximena Fontaine.",
    "The film stars Ulrich Yamamoto and is set in Sendai.",
    "The Hollow Meridian is a 1988 western film directed by Ximena Fontaine.",
    "The film stars Rosa Petrov and is set in Lyon.",
    "Ximena Fontaine is a Mexican sculptor who was born in Monterrey in 1954.",
    "Ulrich Yamamoto is a Japanese jazz pianist who was born in Nagoya in 1960.",
    "Rosa Petrov is a French glassblower who was born in Lyon in 1948.",
    "Harbor Institute is an organization founded by Ximena Fontaine in 1971.",
]


def test_filmography_count():
    assert answer_from_facts(
        "How many features does Ximena Fontaine have to their credit?",
        SENTS) == "2"
    assert answer_from_facts(
        "What is the total count of movies from Ximena Fontaine?",
        SENTS) == "2"


def test_filmography_superlative_earliest_and_latest():
    assert answer_from_facts(
        "Of the features credited to Ximena Fontaine, which opened first?",
        SENTS) == "The Hollow Meridian"
    assert answer_from_facts(
        "Which of Ximena Fontaine's movies reached audiences earliest?",
        SENTS) == "The Hollow Meridian"
    assert answer_from_facts(
        "Which of Ximena Fontaine's movies is the most recent?",
        SENTS) == "The Gilded Causeway"


def test_superlative_missing_year_reports_film():
    # drop The Hollow Meridian's year sentence: the superlative must not
    # answer from one dated film, and the missing hook names the undated film
    sents = [s for s in SENTS if "1988 western" not in s] + [
        "The Hollow Meridian is a western film directed by Ximena Fontaine."]
    q = "Of the features credited to Ximena Fontaine, which opened first?"
    assert answer_from_facts(q, sents) is None
    assert missing_entities(q, sents) == ["The Hollow Meridian"]


def test_description_only_film_join():
    q = ("Which feature joined the Mexican sculptor behind the camera with "
         "the French glassblower out front?")
    assert answer_from_facts(q, SENTS) == "The Hollow Meridian"
    q2 = ("What movie has the Mexican sculptor at the helm and the Japanese "
          "jazz pianist in the lead?")
    assert answer_from_facts(q2, SENTS) == "The Gilded Causeway"


def test_creator_chain_profession():
    # org -> founder -> (needs exactly one film) -> lead -> profession:
    # Ximena directs two films here, so the chain honestly refuses and asks
    # for expansion; with one film it resolves
    sents_one = [s for s in SENTS if "Hollow Meridian" not in s]
    q = ("What line of work does the lead of the feature made by the person "
         "who brought Harbor Institute into being pursue?")
    assert answer_from_facts(q, sents_one) == "jazz pianist"
    assert answer_from_facts(q, SENTS) is None


def test_related_expansion_targets_aggregation():
    # counting/superlative intents always ask for the person's neighborhood
    assert related_expansion_targets(
        "How many features does Ximena Fontaine have to their credit?",
        SENTS) == ["Ximena Fontaine"]
    # creator chain with an ambiguous filmography asks for the founder's
    assert related_expansion_targets(
        "What is the occupation of the performer fronting the movie from "
        "the creator of Harbor Institute?", SENTS) == ["Ximena Fontaine"]


def test_unanswerable_phantom_entities():
    # full-span absence: a phantom film sharing surface tokens with real ones
    assert unanswerable("Who helmed The Gilded Meridian?", SENTS)
    assert unanswerable("How does Greta Lindqvist earn a living?", SENTS)
    # real entities (or described people) stay in play
    assert not unanswerable("Who helmed The Gilded Causeway?", SENTS)
    assert not unanswerable(
        "In which year was the Mexican sculptor born?", SENTS)


def test_extractive_abstains_before_span_scoring():
    from ahrag_tpu.answer.extractive import extract_answer
    assert extract_answer("Who helmed The Gilded Meridian?",
                          "\n".join(SENTS)) == "unanswerable"
    # and does NOT abstain when the asked entity is present
    assert extract_answer("Who helmed The Gilded Causeway?",
                          "\n".join(SENTS)) == "Ximena Fontaine"
