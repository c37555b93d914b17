"""Simple-JSONL benchmark reader: parsing, QID normalization, nested
parent/child assignment (simple_jsonl_benchmark_reader.py:26-64,
nested_groundtruth_handler.py:20-30 semantics)."""

from __future__ import annotations

import json

import pytest

from elevant_ray.sources.jsonl import (assign_parent_child,
                                       parse_simple_jsonl,
                                       read_simple_jsonl)

TITLE_TO_QID = {"Berlin": "Q64", "Albert Einstein": "Q937"}

LINES = [
    {"title": "Doc A", "text": "Albert Einstein was born in Ulm.",
     "labels": [
         {"start_char": 0, "end_char": 15,
          "entity_reference": "https://en.wikipedia.org/wiki/Albert_Einstein"},
         {"start_char": 7, "end_char": 15,
          "entity_reference": "http://www.wikidata.org/entity/Q937"},
     ]},
    {"text": "He moved to Berlin. It was big.",
     "labels": [
         {"start_char": 12, "end_char": 18, "entity_reference": "Berlin"},
         {"start_char": 20, "end_char": 22,
          "entity_reference": "Berlin", "coref": True},
         {"start_char": 0, "end_char": 2, "entity_reference": "Nowhere Town"},
     ]},
]


def _content() -> str:
    return "\n".join(json.dumps(x) for x in LINES)


def test_parse_basic_fields():
    arts = parse_simple_jsonl(_content(), TITLE_TO_QID)
    assert [a["doc_id"] for a in arts] == [0, 1]
    assert arts[0]["title"] == "Doc A" and arts[1]["title"] == ""
    a0 = arts[0]["labels"]
    # sorted by start_char, ids dense in that order
    assert [l["id"] for l in a0] == [0, 1]
    assert [l["begin"] for l in a0] == [0, 7]
    # wikipedia URI -> QID via title map; wikidata URI -> bare QID
    assert a0[0]["entity_id"] == "Q937"
    assert a0[1]["entity_id"] == "Q937"
    # nested: inner [7,15) contained in outer [0,15)
    assert a0[1]["parent"] == 0 and a0[0]["children"] == [1]
    a1 = arts[1]["labels"]
    # labels re-sorted by start: He(0), Berlin(12), It(20)
    assert [l["begin"] for l in a1] == [0, 12, 20]
    assert a1[1]["entity_id"] == "Q64"
    assert a1[0]["entity_id"] == "<NO_MAPPING>"  # unknown title
    assert a1[2]["coref"] is True


def test_custom_kb_keeps_references():
    arts = parse_simple_jsonl(
        json.dumps({"text": "x y", "labels": [
            {"start_char": 0, "end_char": 1, "entity_reference": "my:ent"},
            {"start_char": 2, "end_char": 3, "entity_reference": ""}]}),
        custom_kb=True)
    labels = arts[0]["labels"]
    assert labels[0]["entity_id"] == "my:ent"
    assert labels[1]["entity_id"] == "<NIL>"


def test_assign_parent_child_matches_reference_quirks():
    """Differential check vs the reference's NestedGroundtruthHandler:
    every contained label is a 'child' (transitive descendants), and a
    grandchild's parent is the LAST containing label in list order."""
    spans = [(0, 20), (2, 10), (4, 8), (12, 18)]
    labels = [{"id": i, "begin": b, "end": e, "parent": None, "children": []}
              for i, (b, e) in enumerate(spans)]
    assign_parent_child(labels)
    assert labels[0]["children"] == [1, 2, 3]
    assert labels[1]["children"] == [2]
    assert labels[2]["parent"] == 1  # label 1 processed after label 0
    assert labels[1]["parent"] == 0
    assert labels[3]["parent"] == 0

    import importlib.util
    import pathlib
    import sys
    import types

    ref_file = pathlib.Path(
        "/root/reference/src/elevant/utils/nested_groundtruth_handler.py")
    if not ref_file.exists():
        pytest.skip("reference not available")
    # load straight from the file (other tests stub the `elevant`
    # package in sys.modules, so find_spec cannot be trusted); its only
    # import is GroundtruthLabel, used for typing — stub it
    gl_mod = types.ModuleType("elevant.evaluation.groundtruth_label")
    gl_mod.GroundtruthLabel = object
    saved = sys.modules.get("elevant.evaluation.groundtruth_label")
    sys.modules["elevant.evaluation.groundtruth_label"] = gl_mod
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_nested_handler", ref_file)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        class L:
            def __init__(self, i, span):
                self.id, self.span = i, span
                self.parent, self.children = None, []

        ref = [L(i, s) for i, s in enumerate(spans)]
        mod.NestedGroundtruthHandler.assign_parent_and_child_ids(ref)
        for ours, theirs in zip(labels, ref):
            assert ours["parent"] == theirs.parent
            assert ours["children"] == theirs.children
    finally:
        if saved is None:
            sys.modules.pop("elevant.evaluation.groundtruth_label", None)
        else:
            sys.modules["elevant.evaluation.groundtruth_label"] = saved


def test_read_simple_jsonl_dataset(ray_session, tmp_path):
    p1 = tmp_path / "a.jsonl"
    p1.write_text(_content(), encoding="utf8")
    p2 = tmp_path / "b.jsonl"
    p2.write_text(json.dumps({"text": "Berlin again.", "labels": [
        {"start_char": 0, "end_char": 6, "entity_reference": "Berlin"}]}),
        encoding="utf8")
    ds = read_simple_jsonl(str(tmp_path), TITLE_TO_QID)
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    # doc ids: file-sorted offsets — a.jsonl has 2 docs, b.jsonl starts at 2
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    assert rows[2]["labels"][0]["entity_id"] == "Q64"
    assert rows[0]["labels"][1]["parent"] == 0
