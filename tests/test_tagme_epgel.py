"""TagMe benchmark reader (tagme_benchmark_reader.py:24-103) and EPGEL
prediction reader (epgel_prediction_reader.py:15-46)."""

from __future__ import annotations

import importlib.util
import json
import sys
import types
from pathlib import Path

import pytest

from elevant_ray.sources.predictions import parse_epgel, read_epgel_predictions
from elevant_ray.sources.tsv import parse_tagme, read_tagme_benchmark

TITLE_TO_QID = {"Berlin": "Q64", "Paris": "Q90"}
ID_TO_TITLE = {10: "Berlin", 20: "Paris"}

SNIPPETS = "\n".join([
    "0\tI saw berlin yesterday",
    "1\tthen paris and berlin",
    "2\tnothing here",
])
ANNOTATIONS = "\n".join([
    "0\tberlin\t10",
    "1\tparis\t20",
    "1\tberlin\t10",
    "1\tmissing mention\t10",
    "1\tthen\t999",
])


def test_parse_tagme():
    arts = parse_tagme(SNIPPETS, ANNOTATIONS, ID_TO_TITLE, TITLE_TO_QID)
    assert len(arts) == 3
    a0, a1, a2 = arts
    assert [(l["begin"], l["end"], l["entity_id"]) for l in a0["labels"]] \
        == [(6, 12, "Q64")]
    # "missing mention" is dropped (not found in text); ghost id 999 has
    # no wikipedia title → <NO_MAPPING>; both mentions located lowercase
    got = [(l["begin"], l["end"], l["entity_id"]) for l in a1["labels"]]
    assert (5, 10, "Q90") in got and (15, 21, "Q64") in got
    assert any(e == "<NO_MAPPING>" for _, _, e in got)
    assert a2["labels"] == []


def test_tagme_differential_vs_reference(tmp_path):
    ref = Path("/root/reference/src/elevant/benchmark_readers/tagme_benchmark_reader.py")
    if not ref.exists():
        pytest.skip("reference repo not available")

    class _Article:
        def __init__(self, id, title, text, labels):
            self.id, self.title, self.text, self.labels = id, title, text, labels

    class _Label:
        def __init__(self, label_id, span, entity_id, name):
            self.id, self.span, self.entity_id, self.name = \
                label_id, span, entity_id, name
            self.parent, self.children = None, []

    class _UnknownEntity:
        class NIL:
            value = "<NIL>"

        class NO_MAPPING:
            value = "<NO_MAPPING>"

    class _KBMapper:
        @staticmethod
        def get_wikidata_qid(ref_, db, verbose=False, kb_name=None):
            from elevant_ray.functions.normalize import wikidata_qid
            return wikidata_qid("https://en.wikipedia.org/wiki/"
                                + ref_.replace(" ", "_"), TITLE_TO_QID)

        @staticmethod
        def is_unknown_entity(x):
            return x in ("<NIL>", "<NO_MAPPING>", None)

    class _Nested:
        @staticmethod
        def assign_parent_and_child_ids(labels):
            pass

    class _EntityDb:
        @staticmethod
        def get_wikipedia_title_by_wikipedia_id(wid):
            return ID_TO_TITLE.get(wid)

    modnames = [
        "elevant", "elevant.benchmark_readers",
        "elevant.benchmark_readers.abstract_benchmark_reader",
        "elevant.evaluation", "elevant.evaluation.groundtruth_label",
        "elevant.models", "elevant.models.article",
        "elevant.models.entity_database",
        "elevant.utils", "elevant.utils.knowledge_base_mapper",
        "elevant.utils.nested_groundtruth_handler",
    ]
    mods = {n: types.ModuleType(n) for n in modnames}
    mods["elevant.benchmark_readers.abstract_benchmark_reader"] \
        .AbstractBenchmarkReader = object
    mods["elevant.evaluation.groundtruth_label"].GroundtruthLabel = _Label
    mods["elevant.models.article"].Article = _Article
    mods["elevant.models.entity_database"].EntityDatabase = _EntityDb
    kbm = mods["elevant.utils.knowledge_base_mapper"]
    kbm.KnowledgeBaseMapper = _KBMapper
    kbm.UnknownEntity = _UnknownEntity
    mods["elevant.utils.nested_groundtruth_handler"] \
        .NestedGroundtruthHandler = _Nested
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("_ref_tagme", ref)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sp = tmp_path / "snips.tsv"
        ap = tmp_path / "anns.tsv"
        sp.write_text(SNIPPETS + "\n")
        ap.write_text(ANNOTATIONS + "\n")
        reader = mod.TagmeBenchmarkReader(_EntityDb(), str(ap), str(sp))
        ref_arts = list(reader.article_iterator())
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    ours = parse_tagme(SNIPPETS, ANNOTATIONS, ID_TO_TITLE, TITLE_TO_QID)
    assert len(ours) == len(ref_arts)
    for mine, theirs in zip(ours, ref_arts):
        assert mine["text"] == theirs.text
        assert [(l["begin"], l["end"], l["entity_id"])
                for l in mine["labels"]] \
            == [(l.span[0], l.span[1], l.entity_id) for l in theirs.labels]


EPGEL_INPUT = "\n".join([
    json.dumps({"article_index": 0, "mention_start": 3, "mention_end": 9}),
    json.dumps({"article_index": 0, "mention_start": 12, "mention_end": 17}),
    json.dumps({"article_index": 2, "mention_start": 0, "mention_end": 4}),
])
EPGEL_OUTPUT = "\n".join([
    json.dumps({"candidates": ["Q64", "Q90"]}),
    json.dumps({"candidates": []}),
    json.dumps({"candidates": ["Q937"]}),
])


def test_parse_epgel():
    per_article = parse_epgel(EPGEL_INPUT, EPGEL_OUTPUT)
    assert len(per_article) == 3           # article 1 exists but is empty
    assert per_article[1] == []
    p0 = per_article[0]
    assert (p0[0]["begin"], p0[0]["end"], p0[0]["entity_id"]) == (3, 9, "Q64")
    assert p0[0]["candidates"] == ["Q64", "Q90"]
    assert p0[1]["entity_id"] is None      # no candidates → unlinked
    assert per_article[2][0]["entity_id"] == "Q937"
    # line-count mismatch → all-empty (reference logs an error and
    # yields empty dicts, epgel_prediction_reader.py:30-33)
    assert parse_epgel(EPGEL_INPUT, EPGEL_OUTPUT + "\n" + "{}") == [[], [], []]


def test_read_epgel_dataset(ray_session, tmp_path):
    (tmp_path / "epgel_input.jsonl").write_text(EPGEL_INPUT)
    (tmp_path / "epgel_output.jsonl").write_text(EPGEL_OUTPUT)
    ds = read_epgel_predictions(str(tmp_path / "epgel_output.jsonl"))
    rows = sorted(ds.take_all(), key=lambda r: (r["doc_idx"], r["begin"]))
    assert [r["doc_idx"] for r in rows] == [0, 0, 2]
    assert rows[-1]["entity_id"] == "Q937"


def test_read_tagme_dataset(ray_session, tmp_path):
    sp = tmp_path / "s.tsv"
    ap = tmp_path / "a.tsv"
    sp.write_text(SNIPPETS)
    ap.write_text(ANNOTATIONS)
    ds = read_tagme_benchmark(str(sp), str(ap), ID_TO_TITLE, TITLE_TO_QID)
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert len(rows) == 3
    assert rows[0]["labels"][0]["entity_id"] == "Q64"
