"""EntityDatabase TSV loaders (sources/entity_db.py) —
differential-tested against the reference's EntityDatabaseReader
(entity_database_reader.py:16-316) run on the SAME fixture files with
its import graph stubbed (TEST-ONLY oracle; nothing copied)."""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import pytest

FIX = Path(__file__).parent / "fixtures" / "entity_db"
REF = Path("/root/reference/src/elevant/helpers/entity_database_reader.py")


class _Gender:
    FEMALE, MALE, OTHER, NEUTRAL, UNKNOWN = range(5)


@pytest.fixture(scope="module")
def ref_reader():
    if not REF.exists():
        pytest.skip("reference repo not available")
    saved = {}
    names = ["lmdb", "elevant", "elevant.models", "elevant.settings",
             "elevant.models.database", "elevant.models.gender"]
    for name in names:
        saved[name] = sys.modules.get(name)
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    sys.modules["elevant.models.database"].Database = object
    sys.modules["elevant.models.gender"].Gender = _Gender
    # settings attributes are consumed as default-arg values at class
    # definition time; a module-level __getattr__ supplies dummies
    sys.modules["elevant.settings"].__getattr__ = \
        lambda name: f"/nonexistent/{name}"
    spec = importlib.util.spec_from_file_location("_ref_edr", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod.EntityDatabaseReader
    for name, old in saved.items():
        if old is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = old


def test_gender_parity(ray_session, ref_reader):
    from elevant_ray.sources.entity_db import gender_dict, read_gender_tsv
    from elevant_ray.stages.coref import FEMALE, MALE, OTHER

    got = gender_dict(read_gender_tsv(str(FIX / "gender.tsv")))
    want = ref_reader.get_gender_mapping(str(FIX / "gender.tsv"))
    names = {FEMALE: "FEMALE", MALE: "MALE", OTHER: "OTHER"}
    ref_names = {_Gender.FEMALE: "FEMALE", _Gender.MALE: "MALE",
                 _Gender.OTHER: "OTHER"}
    assert {q: names[g] for q, g in got.items()} == \
        {q: ref_names[g] for q, g in want.items()}
    # token semantics: "transgender female" → FEMALE, "male organism"
    # → MALE, "non-binary" → OTHER
    assert got["Q3"] == FEMALE and got["Q4"] == MALE and got["Q5"] == OTHER


def test_coref_types_parity(ray_session, ref_reader):
    from elevant_ray.sources.entity_db import (coref_types_dict,
                                               read_coref_types_tsv)

    got = coref_types_dict(read_coref_types_tsv(str(FIX / "coref_types.tsv")))
    want = ref_reader.get_coreference_types_mapping(
        str(FIX / "coref_types.tsv"))
    assert got == want


def test_languages_inverted_orientation(ray_session, ref_reader):
    from elevant_ray.sources.entity_db import (languages_dict,
                                               read_languages_tsv)

    got = languages_dict(read_languages_tsv(str(FIX / "languages.tsv")))
    # reference get_languages reads from settings; replicate its loop on
    # the fixture directly for the oracle
    want = {}
    for line in open(FIX / "languages.tsv", encoding="utf8"):
        qid, language = line.strip("\n").split("\t")
        want[language] = qid
    assert got == want
    assert got["English"] == "Q1860"   # language → QID, inverted


def test_demonyms_pluralization_and_multimap(ray_session):
    from elevant_ray.sources.entity_db import demonyms_dict, read_demonyms_tsv

    got = demonyms_dict(read_demonyms_tsv(str(FIX / "demonyms.tsv")))
    # the reference's observable (get_demonyms :118-133): bare +s rows,
    # multi-QID demonyms in file order
    assert got["German"] == ["Q183"] and got["Germans"] == ["Q183"]
    assert got["American"] == ["Q30", "Q16"]
    assert got["Americans"] == ["Q30", "Q16"]


def test_set_file_and_qid_filter(ray_session, ref_reader):
    from elevant_ray.sources.entity_db import (item_to_qid_sets_dict,
                                               read_item_to_qid_set_tsv,
                                               read_set_file)

    vals = {r["value"] for r in
            read_set_file(str(FIX / "quantities.txt")).take_all()}
    assert vals == ref_reader.read_into_set(str(FIX / "quantities.txt"))

    got = item_to_qid_sets_dict(
        read_item_to_qid_set_tsv(str(FIX / "instance_of.tsv")))
    want = ref_reader.read_item_to_qid_set_mapping(
        str(FIX / "instance_of.tsv"), None)
    assert got == want
    assert "Q99" not in got            # blank-node value dropped
    assert got["Q10"] == {"Q43229", "Q4830453"}


def test_wikipedia_id_title(ray_session, ref_reader):
    from elevant_ray.sources.entity_db import read_wikipedia_id_to_title_tsv

    got = {r["wikipedia_id"]: r["title"] for r in
           read_wikipedia_id_to_title_tsv(
               str(FIX / "wiki_id_title.tsv")).take_all()}
    # reference signature reads from settings — replicate its loop
    want = {}
    for line in open(FIX / "wiki_id_title.tsv", encoding="utf8"):
        wid, title = line.strip("\n").split("\t")
        want[int(wid)] = title
    assert got == want


def test_whitelist_replace_with_filter(ray_session, ref_reader):
    from elevant_ray.sources.entity_db import read_whitelist_types_tsv

    got = {r["type_qid"]: r["name"] for r in read_whitelist_types_tsv(
        str(FIX / "whitelist.tsv"),
        str(FIX / "whitelist_adjustments.txt")).take_all()}
    want = ref_reader.read_whitelist_types(str(FIX / "whitelist.tsv"))
    # reference with_adjustments path reads the adjustments from
    # settings; apply its filter manually for the oracle
    assert "Q4830453" in want
    del want["Q4830453"]               # REPLACE_WITH left side
    assert got == want
    # without adjustments both sides keep the full list
    got_all = {r["type_qid"]: r["name"] for r in read_whitelist_types_tsv(
        str(FIX / "whitelist.tsv")).take_all()}
    assert got_all == ref_reader.read_whitelist_types(str(FIX / "whitelist.tsv"))


def test_human_names(ray_session, ref_reader):
    from elevant_ray.sources.entity_db import read_human_names_tsv

    # point the reference iterator at the fixture via its settings stub
    sys.modules["elevant.settings"].QID_TO_HUMAN_NAME_FILE = \
        str(FIX / "human_names.tsv")
    want = dict(ref_reader.read_human_names())
    got = {r["qid"]: r["name"] for r in
           read_human_names_tsv(str(FIX / "human_names.tsv")).take_all()}
    assert got == want == {"Q1": "Ada Lovelace", "Q2": "Alan Turing",
                           "Q6": "Grace Hopper"}


def test_dims_query(ray_session):
    import pandas as pd

    import __ray_entry__ as m

    d = m.queries()["entity_dims_load"]("/root/testdata/sf0.001")
    d = d.to_pandas() if not isinstance(d, pd.DataFrame) else d
    assert set(d.columns) == {"dim", "n_rows", "n_keys"}
    assert len(d) >= 7


def test_loaders_feed_coref_stage(ray_session):
    """End-to-end dims integration: the TSV loaders produce exactly the
    dict shapes KBCorefStage consumes (gender_map, coref_types), so a
    user can point the engine at real Wikidata exports instead of the
    synthesized dims."""
    from elevant_ray.sources.entity_db import (coref_types_dict,
                                               gender_dict,
                                               read_coref_types_tsv,
                                               read_gender_tsv)
    from elevant_ray.stages.coref import FEMALE, kb_coref_clusters

    gender_map = gender_dict(read_gender_tsv(str(FIX / "gender.tsv")))
    coref_types = coref_types_dict(
        read_coref_types_tsv(str(FIX / "coref_types.tsv")))
    assert gender_map["Q1"] == FEMALE
    text = "Ada wrote programs . She was brilliant ."
    clusters = kb_coref_clusters(
        text, [{"begin": 0, "end": 3, "entity_id": "Q1"}],
        gender_map=gender_map, coref_types=coref_types)
    spans = {c["entity_id"]: c["mentions"] for c in clusters}
    she = text.index("She")
    assert (she, she + 3) in spans["Q1"]
