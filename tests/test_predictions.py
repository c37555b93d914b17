"""External prediction readers (Ambiverse / Wikifier / WEXEA), each
differential-tested against the reference reader run stand-alone with
stubbed dependencies (prediction_readers/*.py)."""

from __future__ import annotations

import importlib.util
import json
import sys
import types
from pathlib import Path

import pytest

from elevant_ray.sources.predictions import (parse_ambiverse, parse_wexea,
                                             parse_wikifier,
                                             read_predictions,
                                             rebuild_wexea_text)

REF = Path("/root/reference/src/elevant/prediction_readers")

TITLE_TO_QID = {"Berlin": "Q64", "Albert Einstein": "Q937",
                "Paris": "Q90", "Ulm": "Q3012"}


def _load_reference_reader(filename: str, id_to_title=None):
    """Import one reference prediction reader with its import graph
    stubbed (TEST-ONLY oracle; nothing is copied into the engine)."""
    if not (REF / filename).exists():
        pytest.skip("reference repo not available")

    class _Pred:
        def __init__(self, span, entity_id, candidates):
            self.span, self.entity_id, self.candidates = \
                span, entity_id, candidates

    class _Abstract:
        def __init__(self, input_filepath, predictions_iterator_implemented):
            self.input_filepath = input_filepath

    class _UnknownEntity:
        class NIL:
            value = "<NIL>"

        class NO_MAPPING:
            value = "<NO_MAPPING>"

    class _KBName:
        WIKIPEDIA = "wikipedia"

    class _KBMapper:
        @staticmethod
        def get_wikidata_qid(ref_, db, verbose=False, kb_name=None):
            from elevant_ray.functions.normalize import wikidata_qid
            return wikidata_qid(ref_ or "", TITLE_TO_QID)

        @staticmethod
        def is_unknown_entity(x):
            return x in ("<NIL>", "<NO_MAPPING>", None)

    class _EntityDb:
        @staticmethod
        def get_wikipedia_title_by_wikipedia_id(wid):
            return (id_to_title or {}).get(wid)

    modnames = [
        "elevant", "elevant.models", "elevant.models.entity_database",
        "elevant.models.entity_prediction", "elevant.prediction_readers",
        "elevant.prediction_readers.abstract_prediction_reader",
        "elevant.utils", "elevant.utils.knowledge_base_mapper",
    ]
    mods = {n: types.ModuleType(n) for n in modnames}
    mods["elevant.models.entity_database"].EntityDatabase = _EntityDb
    mods["elevant.models.entity_prediction"].EntityPrediction = _Pred
    mods["elevant.prediction_readers.abstract_prediction_reader"] \
        .AbstractPredictionReader = _Abstract
    kbm = mods["elevant.utils.knowledge_base_mapper"]
    kbm.KnowledgeBaseMapper = _KBMapper
    kbm.UnknownEntity = _UnknownEntity
    kbm.KnowledgeBaseName = _KBName
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_" + filename[:-3], REF / filename)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod, _EntityDb()
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


AMBIVERSE = {
    "entities": [
        {"id": "http://www.wikidata.org/entity/Q999999",
         "name": "Albert Einstein"},   # remapped via name (more trustworthy)
        {"id": "null", "name": "ignored"},
    ],
    "matches": [
        {"charOffset": 0, "charLength": 15,
         "entity": {"id": "http://www.wikidata.org/entity/Q999999"}},
        {"charOffset": 28, "charLength": 3,
         "entity": {"id": "http://www.wikidata.org/entity/Q3012"}},
        {"charOffset": 40, "charLength": 2, "entity": None},
        {"charOffset": 50, "charLength": 2, "entity": {"id": ""}},
    ],
}


def test_ambiverse_parse_and_differential(tmp_path):
    content = json.dumps(AMBIVERSE)
    ours = parse_ambiverse(content, TITLE_TO_QID)
    assert [(p["begin"], p["end"], p["entity_id"]) for p in ours] == [
        (0, 15, "Q937"),      # Q999999 remapped through the entity name
        (28, 31, "Q3012"),
        (40, 42, "<NIL>"),    # entity: None
        (50, 52, "<NIL>"),    # empty id string
    ]

    for mod, db in _load_reference_reader("ambiverse_prediction_reader.py"):
        f = tmp_path / "0001.json"
        f.write_text(content)
        reader = mod.AmbiversePredictionReader(str(tmp_path), db)
        ref_preds = reader._get_prediction_from_file(str(f))
        ref_items = sorted((s[0], s[1], p.entity_id)
                           for s, p in ref_preds.items())
        assert ref_items == sorted((p["begin"], p["end"], p["entity_id"])
                                   for p in ours)


WIKIFIER_XML = """<WikifierResponse>
<Entity>
  <EntityTextStart>5</EntityTextStart>
  <EntityTextEnd>11</EntityTextEnd>
  <TopDisambiguation>
    <WikiTitle>Berl?n</WikiTitle>
    <WikiTitleID>777</WikiTitleID>
  </TopDisambiguation>
  <DisambiguationCandidates>
    <Candidate><WikiTitle>Berl?n</WikiTitle></Candidate>
    <Candidate><WikiTitle>Paris</WikiTitle></Candidate>
  </DisambiguationCandidates>
</Entity>
<Entity>
  <EntityTextStart>20</EntityTextStart>
  <EntityTextEnd>24</EntityTextEnd>
  <TopDisambiguation>
    <WikiTitle>Nowhere_Town</WikiTitle>
    <WikiTitleID>3658264</WikiTitleID>
  </TopDisambiguation>
  <DisambiguationCandidates></DisambiguationCandidates>
</Entity>
</WikifierResponse>"""

WIKI_ID_TO_TITLE = {777: "Berlin"}


def test_wikifier_parse_and_differential(tmp_path):
    ours = parse_wikifier(WIKIFIER_XML, TITLE_TO_QID, WIKI_ID_TO_TITLE)
    assert [(p["begin"], p["end"], p["entity_id"]) for p in ours] == [
        (5, 11, "Q64"),            # ?-title corrected via page id
        (20, 24, "<NO_MAPPING>"),  # bad page id 3658264: title kept
    ]
    assert ours[0]["candidates"] == ["Q64", "Q90"]

    for mod, db in _load_reference_reader("wikifier_prediction_reader.py",
                                          id_to_title=WIKI_ID_TO_TITLE):
        f = tmp_path / "a.full.xml"
        f.write_text(WIKIFIER_XML)
        reader = mod.WikifierPredictionReader(str(tmp_path), db)
        ref_preds = reader._get_prediction_from_file(str(f))
        ref_items = sorted((s[0], s[1], p.entity_id, sorted(p.candidates))
                           for s, p in ref_preds.items())
        assert ref_items == sorted((p["begin"], p["end"], p["entity_id"],
                                    p["candidates"]) for p in ours)


WEXEA = ("Albert lived in [[Berlin|the capital|ANNOTATION]] near "
         "[[X|somewhere|DISAMBIGUATION_X]] and [[Paris|Paris|coref_pronoun]].")


def test_wexea_parse_and_differential(tmp_path):
    clean = rebuild_wexea_text(WEXEA)
    assert clean == ("Albert lived in the capital near somewhere and Paris.")
    ours = parse_wexea(WEXEA, TITLE_TO_QID, coref=False)
    assert [(p["begin"], p["end"], p["entity_id"]) for p in ours] == [
        (16, 27, "Q64")]
    assert clean[16:27] == "the capital"
    ours_coref = parse_wexea(WEXEA, TITLE_TO_QID, coref=True)
    assert [(p["begin"], p["end"], p["entity_id"]) for p in ours_coref] == [
        (47, 52, "Q90")]

    for mod, db in _load_reference_reader("wexea_prediction_reader.py"):
        f = tmp_path / "art0.txt"
        f.write_text(WEXEA)
        reader = mod.WexeaPredictionReader(str(tmp_path), db)
        for coref, mine in ((False, ours), (True, ours_coref)):
            ref_preds = reader._get_prediction_from_file(str(f), coref=coref)
            ref_items = sorted((s[0], s[1], p.entity_id)
                               for s, p in ref_preds.items())
            assert ref_items == sorted((p["begin"], p["end"], p["entity_id"])
                                       for p in mine)


def test_read_predictions_dataset(ray_session, tmp_path):
    # Two ambiverse files → doc_idx from sorted file rank.
    (tmp_path / "a.json").write_text(json.dumps(AMBIVERSE))
    (tmp_path / "b.json").write_text(json.dumps(
        {"matches": [{"charOffset": 1, "charLength": 2,
                      "entity": {"id": "http://www.wikidata.org/entity/Q64"}}]}))
    ds = read_predictions(str(tmp_path), "ambiverse",
                          title_to_qid=TITLE_TO_QID)
    rows = sorted(ds.take_all(), key=lambda r: (r["doc_idx"], r["begin"]))
    assert [r["doc_idx"] for r in rows] == [0, 0, 0, 0, 1]
    assert rows[-1]["entity_id"] == "Q64"

    with pytest.raises(ValueError, match="unknown prediction format"):
        read_predictions(str(tmp_path), "nope")
