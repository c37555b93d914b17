"""Inline annotation export/import round-trips (write_articles.py:84,102
format)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from elevant_ray.sources.annotations import (annotate_batch, annotate_text,
                                             ner_annotate_text,
                                             parse_annotated_text,
                                             parse_ner_annotated_text)


def test_annotate_basic():
    text = "Albert Einstein was born in Ulm."
    labels = [{"begin": 0, "end": 15, "entity_id": "Q937",
               "name": "Albert Einstein"},
              {"begin": 28, "end": 31, "entity_id": "Q3012", "name": "Ulm"}]
    annotated = annotate_text(text, labels)
    assert annotated == ("[Q937:Albert Einstein|Albert Einstein] was born "
                         "in [Q3012:Ulm|Ulm].")
    plain, parsed = parse_annotated_text(annotated)
    assert plain == text
    assert parsed == labels


def test_annotate_names_fallback():
    annotated = annotate_text("see X", [{"begin": 4, "end": 5,
                                         "entity_id": "Q1", "name": None}],
                              names={"Q1": "Ixx"})
    assert annotated == "see [Q1:Ixx|X]"


def test_ner_roundtrip():
    text = "Berlin and Paris"
    spans = [{"begin": 0, "end": 6}, {"begin": 11, "end": 16}]
    annotated = ner_annotate_text(text, spans)
    assert annotated == "[[Berlin]] and [[Paris]]"
    plain, parsed = parse_ner_annotated_text(annotated)
    assert plain == text
    assert parsed == [(0, 6), (11, 16)]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.ascii_letters + " .,", min_size=0,
               max_size=60),
       st.lists(st.tuples(st.integers(0, 59), st.integers(1, 8)),
                max_size=4))
def test_annotation_roundtrip_property(text, raw_spans):
    # build non-overlapping in-range spans from the raw (start, len) pairs
    spans = []
    taken = []
    for start, ln in sorted(raw_spans):
        end = min(start + ln, len(text))
        if end <= start:
            continue
        if any(not (end <= b or e <= start) for b, e in taken):
            continue
        taken.append((start, end))
        spans.append({"begin": start, "end": end,
                      "entity_id": f"Q{start}", "name": f"N{start}"})
    annotated = annotate_text(text, spans)
    plain, parsed = parse_annotated_text(annotated)
    assert plain == text
    assert sorted((l["begin"], l["end"], l["entity_id"]) for l in parsed) \
        == sorted((l["begin"], l["end"], l["entity_id"]) for l in spans)


def test_annotate_batch_kernel(ray_session):
    import pyarrow as pa

    import ray.data as rd

    lt = pa.list_(pa.struct([("begin", pa.int32()), ("end", pa.int32()),
                             ("entity_id", pa.string()),
                             ("name", pa.string())]))
    t = pa.table({
        "text": pa.array(["Berlin is big", "no labels here"], pa.string()),
        "labels": pa.array([[{"begin": 0, "end": 6, "entity_id": "Q64",
                              "name": "Berlin"}], []], lt)})
    out = rd.from_arrow(t).map_batches(
        annotate_batch, batch_format="pyarrow").take_all()
    assert out[0]["annotated"] == "[Q64:Berlin|Berlin] is big"
    assert out[1]["annotated"] == "no labels here"


class TestNif:
    ARTICLES = [
        {"title": "Doc One", "text": 'Albert "Einstein" was born.\nIn Ulm.',
         "labels": [
             {"begin": 0, "end": 16, "entity_id": "Q937"},
             {"begin": 8, "end": 16, "entity_id": "Q937"},
             {"begin": 31, "end": 34, "entity_id": "Q3012"}]},
        {"title": "Doc Two", "text": "Nothing to see", "labels": []},
    ]

    def test_roundtrip(self):
        from elevant_ray.sources.nif import articles_to_nif, parse_nif

        ttl = articles_to_nif(self.ARTICLES)
        arts = parse_nif(ttl)
        assert len(arts) == 2
        a0 = arts[0]
        # reference quirk kept: title = uri AFTER THE FIRST '/' unquoted
        # (nif_parser.py:35) — for an http uri that includes '//host'
        assert a0["title"] == "//example.org/Doc One"
        assert a0["text"] == self.ARTICLES[0]["text"]
        got = [(l["begin"], l["end"], l["entity_id"]) for l in a0["labels"]]
        assert got == [(0, 16, "Q937"), (8, 16, "Q937"), (31, 34, "Q3012")]
        # nested containment: [8,16) inside [0,16)
        assert a0["labels"][1]["parent"] == 0
        assert a0["labels"][0]["children"] == [1]
        assert arts[1]["labels"] == []

    def test_nil_labels_skipped_on_write(self):
        from elevant_ray.sources.nif import articles_to_nif, parse_nif

        arts = parse_nif(articles_to_nif([
            {"title": "X", "text": "a b c", "labels": [
                {"begin": 0, "end": 1, "entity_id": "<NIL>"},
                {"begin": 2, "end": 3, "entity_id": "Q5"}]}]))
        assert [(l["begin"], l["entity_id"]) for l in arts[0]["labels"]] \
            == [(2, "Q5")]

    def test_read_nif_dataset(self, ray_session, tmp_path):
        from elevant_ray.sources.nif import articles_to_nif, read_nif

        (tmp_path / "a.ttl").write_text(articles_to_nif(self.ARTICLES[:1]),
                                        encoding="utf8")
        (tmp_path / "b.ttl").write_text(articles_to_nif(self.ARTICLES[1:]),
                                        encoding="utf8")
        rows = sorted(read_nif(str(tmp_path)).take_all(),
                      key=lambda r: r["doc_id"])
        assert [r["doc_id"] for r in rows] == [0, 1]
        assert rows[0]["labels"][0]["entity_id"] == "Q937"
        assert rows[1]["text"] == "Nothing to see"
