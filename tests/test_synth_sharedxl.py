"""XL shared-world generator (eval/synth.py *_XL pools, make_world(xl=True)).

The XL configuration exists to keep the shared-KB eval discriminating at
corpus scale: ~1,835 paragraphs per world (1,200 people / 380 films /
220 orgs), with extended vocabulary pools sized so the no-gold-name
description families survive (960 nationality-profession descriptor pairs
keep a few hundred people uniquely describable). Base pools are frozen —
every pre-XL seed must regenerate byte-identically.
"""
import json
import os

from ahrag_tpu.answer.qa import _same_place
from ahrag_tpu.eval.synth import (COUNTRIES_XL, SPLIT_SEEDS_V4,
                                  _unique_people_by_desc, make_shared_dataset)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NO_NAME = ("film_by_attrs", "org_by_founder_desc", "person_year_by_desc",
           "star_by_film_desc", "film_by_people_desc")


def _gen(split):
    return make_shared_dataset(SPLIT_SEEDS_V4[split] + 700000, 150,
                               split=split, version="v4", xl=True,
                               n_people=1200, n_films=380, n_orgs=220)


def test_frozen_xl_splits_match_generator():
    for split in ("train", "dev", "test"):
        path = os.path.join(REPO, "samples",
                            f"synth_v4_sharedxl_{split}.jsonl")
        with open(path, encoding="utf-8") as f:
            on_disk = [json.loads(l) for l in f if l.strip()]
        _world, items = _gen(split)
        assert on_disk == items, split


def test_frozen_xl_corpora_match_generator():
    from ahrag_tpu.eval.synth import write_shared_world
    world, _ = _gen("dev")
    tmp = "/tmp/_xl_corpus_check.txt"
    n = write_shared_world(world, tmp)
    assert n == len(world["paragraphs"])
    with open(tmp, encoding="utf-8") as f, \
         open(os.path.join(REPO, "samples",
                           "synth_v4_sharedxl_corpus_dev.txt"),
              encoding="utf-8") as g:
        assert f.read() == g.read()


def test_xl_world_keeps_no_name_families_alive():
    """Descriptor pairs scale with the population: the description families
    must still find unambiguous candidates in a 1,200-person world."""
    world, items = _gen("train")
    assert len(world["paragraphs"]) > 1800
    assert len(_unique_people_by_desc(world)) > 200
    kinds = {it["qtype"] for it in items}
    for fam in NO_NAME:
        assert fam in kinds, fam


def test_xl_demonyms_resolve():
    """Every XL country's demonym must be recoverable by qa.py::_same_place
    (no gazetteer exists — suffix stems / consonant skeletons only)."""
    for country, demonym in COUNTRIES_XL:
        assert _same_place(country, demonym), (country, demonym)


def test_xl_demonyms_stay_distinct():
    """No XL demonym may collide with a DIFFERENT country (base or XL)."""
    from ahrag_tpu.eval.synth import COUNTRIES
    all_pairs = COUNTRIES + COUNTRIES_XL
    for country, demonym in COUNTRIES_XL:
        for c2, d2 in all_pairs:
            if c2 == country:
                continue
            assert not _same_place(c2, demonym), (demonym, c2)
            assert not _same_place(country, d2), (country, d2)
