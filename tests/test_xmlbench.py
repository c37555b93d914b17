"""XML / ReFinED-JSONL / Newscrawl benchmark readers
(xml_benchmark_reader.py, refined_jsonl_benchmark_reader.py,
newscrawl_dump_reader.py)."""

from __future__ import annotations

import json

from elevant_ray.sources.xmlbench import (parse_newscrawl,
                                          parse_refined_jsonl,
                                          parse_xml_mention_dir_file,
                                          parse_xml_mentions, read_newscrawl,
                                          read_refined_jsonl,
                                          read_xml_benchmark, xml_articles)

TITLE_TO_QID = {"Berlin": "Q64", "Paris": "Q90"}

LABELS_XML = """<benchmark>
<document docName="doc1.txt">
  <annotation><wikiName>Berlin</wikiName><offset>3</offset><length>6</length></annotation>
  <annotation><wikiName>NIL</wikiName><offset>0</offset><length>2</length></annotation>
</document>
<document docName="doc2.txt">
  <annotation><wikiName>Nowhere</wikiName><offset>0</offset><length>5</length></annotation>
</document>
</benchmark>"""


def test_parse_xml_mentions_and_articles():
    md = parse_xml_mentions(LABELS_XML)
    assert md["doc1.txt"] == [((3, 9), "Berlin"), ((0, 2), "NIL")]
    texts = [("doc1.txt", "  in Berlin today"), ("doc2.txt", "Where am I")]
    arts = xml_articles(md, texts, TITLE_TO_QID)
    a1 = arts[0]
    # left-strip shifts spans by 2 (Neural-EL workaround, :33-35)
    assert a1["text"] == "in Berlin today"
    # labels sorted by span start: NIL (0,2) first, then Berlin (3,9)→(1,7)
    assert [(l["begin"], l["end"], l["entity_id"]) for l in a1["labels"]] \
        == [(-2, 0, "<NIL>"), (1, 7, "Q64")]
    assert arts[1]["labels"][0]["entity_id"] == "<NO_MAPPING>"


DIR_XML = """<root>
<ReferenceFileName> doc1.txt </ReferenceFileName>
<mention>
  <Offset>4</Offset>
  <Length>6</Length>
  <Annotation>"http://en.wikipedia.org/wiki/Berlin"</Annotation>
</mention>
<mention>
  <Offset>11</Offset>
  <Length>3</Length>
  <Annotation>none</Annotation>
</mention>
</root>"""


def test_parse_xml_mention_dir_file():
    md = parse_xml_mention_dir_file(DIR_XML)
    assert md["doc1.txt"] == [((4, 10), "Berlin"), ((11, 14), "NIL")]


def test_read_xml_benchmark(ray_session, tmp_path):
    labels = tmp_path / "labels.xml"
    labels.write_text(LABELS_XML)
    tdir = tmp_path / "texts"
    tdir.mkdir()
    (tdir / "doc1.txt").write_text("in Berlin today")
    (tdir / "doc2.txt").write_text("Where am I")
    ds = read_xml_benchmark(str(labels), str(tdir), TITLE_TO_QID)
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert [r["title"] for r in rows] == ["doc1.txt", "doc2.txt"]
    assert rows[0]["labels"][1]["entity_id"] == "Q64"


REFINED = "\n".join([
    json.dumps({"doc_title": "A", "text": "Berlin and Paris",
                "mentions": [
                    {"start": 0, "length": 6, "wiki_name": "Berlin"},
                    {"start": 11, "length": 5, "wiki_name": "Paris"},
                ]}),
    json.dumps({"text": "no title doc",
                "mentions": [{"start": 0, "length": 2, "wiki_name": None}]}),
])


def test_parse_refined_jsonl(ray_session, tmp_path):
    arts = parse_refined_jsonl(REFINED, TITLE_TO_QID)
    assert arts[0]["title"] == "A"
    assert [(l["begin"], l["end"], l["entity_id"])
            for l in arts[0]["labels"]] == [(0, 6, "Q64"), (11, 16, "Q90")]
    assert arts[1]["labels"][0]["entity_id"] == "<NIL>"

    p = tmp_path / "refined.jsonl"
    p.write_text(REFINED)
    rows = sorted(read_refined_jsonl(str(p), TITLE_TO_QID).take_all(),
                  key=lambda r: r["doc_id"])
    assert len(rows) == 2 and rows[0]["labels"][1]["entity_id"] == "Q90"


NEWSCRAWL = "\n".join([
    json.dumps({"id": "2020.01.01.a", "date": "2020-01-01",
                "text": "First para\nstill first\n\nSecond para"}),
    json.dumps({"id": "b.2", "date": "2020-01-02", "text": "only one"}),
])


def test_parse_newscrawl(ray_session, tmp_path):
    arts = parse_newscrawl(NEWSCRAWL)
    # title = date - first \n\n-paragraph, newlines stripped; id dots gone
    assert arts[0]["title"] == "2020-01-01 - First parastill first"
    assert arts[0]["source_id"] == "20200101a"
    assert arts[1]["title"] == "2020-01-02 - only one"

    p = tmp_path / "news.jsonl"
    p.write_text(NEWSCRAWL)
    rows = sorted(read_newscrawl(str(p)).take_all(),
                  key=lambda r: r["doc_id"])
    assert [r["source_id"] for r in rows] == ["20200101a", "b2"]
