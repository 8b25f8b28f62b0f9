"""Typed fact-KB QA layer (answer/qa.py): extraction, chaining, comparisons.

Covers the failure families the round-1 span scorer missed on the adversarial
dev split: paraphrased relation vocabulary and one-hop bridge questions.
"""
from ahrag_tpu.answer.qa import Facts, answer_from_facts, extract_facts

SENTS = [
    "The Gilded Causeway is a 2002 animated film directed by Ximena Fontaine.",
    "The film stars Ulrich Yamamoto and is set in Sendai.",
    "The Gilded Causeway was released in 2002 to wide attention.",
    "Ximena Fontaine is a Mexican sculptor who was born in Monterrey in 1954.",
    "Ulrich Yamamoto is a Japanese jazz pianist who was born in Nagoya in 1960.",
    "Harbor Institute is an organization founded by Boris Kovacs in 1971.",
    "The headquarters of Harbor Institute are in Halifax.",
    "Halifax is a city in Canada.",
    "Boris Kovacs is a Hungarian astronomer who was born in Debrecen in 1940.",
]


def test_fact_extraction_tables():
    f = extract_facts(SENTS)
    assert f.directed_by["The Gilded Causeway"] == "Ximena Fontaine"
    # topic continuity: "The film stars ..." inherits the paragraph subject
    assert f.stars["The Gilded Causeway"] == ["Ulrich Yamamoto"]
    assert f.released["The Gilded Causeway"] == "2002"
    assert f.setting["The Gilded Causeway"] == "Sendai"
    assert f.nationality["Ximena Fontaine"] == "Mexican"
    assert f.profession["Ximena Fontaine"] == "sculptor"
    assert f.birth_city["Ximena Fontaine"] == "Monterrey"
    assert f.birth_year["Ximena Fontaine"] == "1954"
    assert f.founded_by["Harbor Institute"] == "Boris Kovacs"
    assert f.founded_year["Harbor Institute"] == "1971"
    assert f.hq["Harbor Institute"] == "Halifax"
    assert f.city_in["Halifax"] == "Canada"


def test_paraphrased_identity_questions():
    assert answer_from_facts("Who helmed The Gilded Causeway?", SENTS) == \
        "Ximena Fontaine"
    assert answer_from_facts("Which filmmaker was behind The Gilded Causeway?",
                             SENTS) == "Ximena Fontaine"
    assert answer_from_facts("What is the occupation of the person who "
                             "established Harbor Institute?", SENTS) == \
        "astronomer"


def test_description_based_film_reference():
    assert answer_from_facts("Who helmed the animated picture from 2002?",
                             SENTS) == "Ximena Fontaine"
    # insufficient descriptor evidence must NOT guess
    assert answer_from_facts("Who directed Nonexistent Film?", SENTS) is None


def test_bridge_chains():
    # film -> star -> nationality
    assert answer_from_facts("Which country does the lead actor of The Gilded "
                             "Causeway come from?", SENTS) == "Japanese"
    # film -> director -> birth city
    assert answer_from_facts("In which city did the filmmaker behind The "
                             "Gilded Causeway grow up?", SENTS) == "Monterrey"
    # org -> hq city -> country
    assert answer_from_facts("What country hosts Harbor Institute?", SENTS) == \
        "Canada"


def test_attribute_questions():
    assert answer_from_facts("Where does Harbor Institute operate from?",
                             SENTS) == "Halifax"
    assert answer_from_facts("What is Ximena Fontaine's line of work?",
                             SENTS) == "sculptor"
    assert answer_from_facts("When did The Gilded Causeway first reach "
                             "theaters?", SENTS) == "2002"


def test_comparison_yes_no():
    assert answer_from_facts("Do Ximena Fontaine and Ulrich Yamamoto share the "
                             "same citizenship?", SENTS) == "no"
    assert answer_from_facts("Are Boris Kovacs and Boris Kovacs from the same "
                             "country?", SENTS) == "yes"
    # unknown entity: no guess
    assert answer_from_facts("Do Ximena Fontaine and Santa Claus share the "
                             "same citizenship?", SENTS) is None


def test_no_relation_words_copied_from_question():
    """Asking about an entity the facts lack must return None, not a guess."""
    assert answer_from_facts("Who helmed The Missing Movie?", SENTS) is None


def test_facts_empty_evidence():
    assert answer_from_facts("Who helmed X?", []) is None
    assert extract_facts([]).films() == set()


def test_reordered_evidence_who_clause_personhood():
    """Evidence assembly can put the seat sentence BEFORE the founder sentence
    (skeleton briefs precede detail blocks), so mention order alone would fill
    the org's person slot with the person-shaped toponym. The '<Name>, who ...'
    relative clause must pin the person slot regardless of sentence order."""
    sents = [
        "Porto Alegre .",
        "The group maintains operations out of Porto Alegre.",
        "Harbor Collective conducts its affairs out of Porto Alegre.",
        "Harbor Collective owes its existence to Tomoko Ustinov, who put the "
        "venture in motion in 1960.",
    ]
    f = extract_facts(sents)
    assert f.founded_by["Harbor Collective"] == "Tomoko Ustinov"
    assert f.hq["Harbor Collective"] == "Porto Alegre"
    assert answer_from_facts(
        "In which city does Harbor Collective have its base of operations?",
        sents) == "Porto Alegre"


# ---------------------------------------------------------------------------
# v3 intents: comparatives, temporal arithmetic, role-pair bridges
# ---------------------------------------------------------------------------

V3_SENTS = [
    "The Crimson Archive opened to audiences in 1971 as a work of noir cinema.",
    "On The Crimson Archive, the camera answered to Rosa Weiss; Luca Kovacs "
    "carries the leading role, and Bergen frames the scenery.",
    "The Hollow Lantern opened to audiences in 1984 as a work of war cinema.",
    "On The Hollow Lantern, the camera answered to Greta Ibanez; Yusuf Barros "
    "carries the leading role, and Lyon frames the scenery.",
    "Rosa Weiss, a Polish sculptor, entered the world at Krakow in 1940.",
    "Luca Kovacs, a Polish astronomer, entered the world at Gdansk in 1951.",
    "Yusuf Barros, a Brazilian architect, entered the world at Recife in 1960.",
]


def test_film_comparative_earlier_and_later():
    q = "Which reached audiences first, The Crimson Archive or The Hollow Lantern?"
    assert answer_from_facts(q, V3_SENTS) == "The Crimson Archive"
    q2 = "Which came out later, The Crimson Archive or The Hollow Lantern?"
    assert answer_from_facts(q2, V3_SENTS) == "The Hollow Lantern"


def test_person_comparative_older():
    q = "Of Rosa Weiss and Luca Kovacs, who is older?"
    assert answer_from_facts(q, V3_SENTS) == "Rosa Weiss"


def test_comparative_missing_year_reports_need():
    from ahrag_tpu.answer.qa import missing_entities
    q = "Of Rosa Weiss and Ingrid Novak, who is older?"
    assert answer_from_facts(q, V3_SENTS) is None
    assert missing_entities(q, V3_SENTS) == ["Ingrid Novak"]


def test_age_at_release_arithmetic():
    q = "How old was the lead performer of The Hollow Lantern when it first " \
        "reached theaters?"
    assert answer_from_facts(q, V3_SENTS) == "24"  # 1984 - 1960


def test_role_pair_same_country():
    q = "Do the filmmaker and the lead performer of The Crimson Archive " \
        "share a citizenship?"
    assert answer_from_facts(q, V3_SENTS) == "yes"   # both Polish
    q2 = "Are the person behind The Hollow Lantern and its lead from the " \
         "same country?"
    # Greta Ibanez has no nationality fact in evidence -> honest None, and
    # the missing entity is reported for the follow-up hop
    from ahrag_tpu.answer.qa import missing_entities
    assert answer_from_facts(q2, V3_SENTS) is None
    assert missing_entities(q2, V3_SENTS) == ["Greta Ibanez"]


def test_possessive_clitic_key_normalization():
    sents = [
        "Nadia Fontaine's early years passed in Bergen, where Nadia Fontaine "
        "came into the world in 1944.",
    ]
    f = extract_facts(sents)
    assert f.birth_year.get("Nadia Fontaine") == "1944"


def test_lead_credit_prior_beats_interleaved_costar():
    """Evidence interleaving can put another film's star sentence (rewritten
    to name this film via possessive anaphora) BEFORE the credit sentence;
    the classifying-appositive sentence must still win the director slot."""
    sents = [
        "Katya Novak fronts the ensemble, and The Burning Tides's narrative "
        "is anchored in Sendai.",
        "Ulrich Weiss called the shots on The Burning Tides, a war feature "
        "that arrived in cinemas in 1966.",
    ]
    f = extract_facts(sents)
    assert f.directed_by["The Burning Tides"] == "Ulrich Weiss"
    assert f.stars["The Burning Tides"] == ["Katya Novak"]
