"""OKE ttl reader (oke_benchmark_reader.py:19-97) and the Wikipedia
hyperlinks→labels benchmark builder (wikipedia_reader.py:11-36)."""

from __future__ import annotations

import pyarrow as pa

from elevant_ray.sources.nif import parse_oke, parse_same_as, read_oke
from elevant_ray.sources.xmlbench import (expand_span_alpha,
                                          hyperlinks_to_labels)

OKE_TTL = """\
<http://example.org/task-1/sentence-2#char=0,23> a nif:Context ;
    nif:isString "Berlin hosts a big fair." .

<http://example.org/task-1/sentence-1#char=0,20> a nif:Context ;
    nif:isString "Paris is in France." .

<http://example.org/task-1/sentence-2#char=0,6> a nif:Phrase ;
    nif:beginIndex "0"^^xsd:nonNegativeInteger ;
    nif:endIndex "6"^^xsd:nonNegativeInteger ;
    nif:referenceContext <http://example.org/task-1/sentence-2#char=0,23> ;
    itsrdf:taIdentRef <http://example.org/entity/AnonBerlin> .

<http://example.org/task-1/sentence-1#char=0,5> a nif:Phrase ;
    nif:beginIndex "0"^^xsd:nonNegativeInteger ;
    nif:endIndex "5"^^xsd:nonNegativeInteger ;
    nif:referenceContext <http://example.org/task-1/sentence-1#char=0,20> ;
    itsrdf:taIdentRef <http://example.org/entity/Mystery> .

<http://example.org/entity/AnonBerlin> a owl:Individual ;
    owl:sameAs <http://dbpedia.org/resource/Berlin> .
"""

TITLE_TO_QID = {"Berlin": "Q64"}


def test_parse_same_as():
    m = parse_same_as(OKE_TTL)
    assert m == {"http://example.org/entity/AnonBerlin":
                 "http://dbpedia.org/resource/Berlin"}


def test_parse_oke_sameas_and_sorting():
    arts = parse_oke(OKE_TTL, TITLE_TO_QID)
    # contexts sorted by URI: sentence-1 before sentence-2
    assert [a["text"] for a in arts] == ["Paris is in France.",
                                        "Berlin hosts a big fair."]
    # sentence-1's taIdentRef has no sameAs → NIL
    assert arts[0]["labels"][0]["entity_id"] == "<NIL>"
    # sentence-2's resolves through sameAs → dbpedia → QID
    assert arts[1]["labels"][0]["entity_id"] == "Q64"


def test_read_oke(ray_session, tmp_path):
    p = tmp_path / "oke.ttl"
    p.write_text(OKE_TTL)
    rows = sorted(read_oke(str(p), TITLE_TO_QID).take_all(),
                  key=lambda r: r["doc_id"])
    assert len(rows) == 2
    assert rows[1]["labels"][0]["entity_id"] == "Q64"


def test_expand_span_alpha():
    text = "the Berliner spoke"
    # span over "Berlin" inside "Berliner" widens to the full word
    assert expand_span_alpha(text, 4, 10) == (4, 12)
    # reference quirk: begin can never expand TO index 0 (begin-1 > 0)
    assert expand_span_alpha("abc def", 1, 3) == (1, 3)
    # but an interior span does expand leftward to index 1
    assert expand_span_alpha("abc def", 2, 3) == (1, 3)


def test_hyperlinks_to_labels(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "url": ["u1"],
        "text": ["the Berliner spoke"],
        "hyperlinks": pa.array(
            [[{"begin": 4, "end": 10, "target": "Berlin"}]],
            pa.list_(pa.struct([("begin", pa.int32()), ("end", pa.int32()),
                                ("target", pa.string())]))),
    })
    out = hyperlinks_to_labels(rd.from_arrow(tbl), TITLE_TO_QID).take_all()
    lab = out[0]["labels"][0]
    assert (lab["begin"], lab["end"], lab["entity_id"]) == (4, 12, "Q64")
