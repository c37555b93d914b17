"""Abstracts-mapping operator: the abstract-span kernel is
differential-tested against the reference's ``Article.get_abstract_span``
(article.py:118-135, loaded as a TEST-ONLY oracle), and the per-QID
first-with-dupe-count reduction against its dict semantics
(create_abstracts_mapping.py:14-50)."""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import pyarrow as pa
import pytest

from elevant_ray.functions.extract import abstract_span, extract_page

REF = Path("/root/reference/src/elevant/models/article.py")


@pytest.fixture(scope="module")
def reference_article():
    """Load the reference Article class with its import graph stubbed
    (test-only oracle; nothing copied into the engine)."""
    if not REF.exists():
        pytest.skip("reference repo not available")
    saved = {}
    stubs = {
        "elevant": {},
        "elevant.models": {},
        "elevant.evaluation": {},
        "elevant.evaluation.groundtruth_label": {
            "GroundtruthLabel": object,
            "groundtruth_label_from_dict": lambda d: d},
        "elevant.models.entity_mention": {
            "EntityMention": object,
            "entity_mention_from_dict": lambda d: d},
        "elevant.models.entity_prediction": {"EntityPrediction": object},
    }
    for name, attrs in stubs.items():
        saved[name] = sys.modules.get(name)
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location("_ref_article", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    for name, old in saved.items():
        if old is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = old


CRAFTED = [
    # title block then abstract then more (normal shape)
    "Title line\n\nThe abstract paragraph sits here.\nMore text follows.",
    # no blank line at all: find('\n\n') == -1 → abstract starts at 1
    "A single paragraph with no title separator anywhere in it.",
    # leading coordinate line inside the abstract → filtered
    "Place\n\n47°23'N 8°33'E\nReal abstract text starts after coords.",
    # coordinate line too long (>60 chars) → NOT filtered
    "Place\n\n" + ("47° " * 20) + "\nText after a long degree line.",
    # ° but no newline in abstract → NOT filtered
    "Place\n\n47° something with no newline after it",
]


def _sections_for(text: str):
    # one leading section covering the first 2/3 of the text, a second
    # section after it — get_abstract_span only reads sections[0]
    cut = max(1, (2 * len(text)) // 3)
    return [((0, cut), "ABSTRACT"), ((cut, len(text)), "Rest")]


def test_abstract_span_matches_reference_crafted(reference_article):
    for text in CRAFTED:
        secs = _sections_for(text)
        art = reference_article.Article(id=0, title="T", text=text,
                                        sections=secs)
        want = art.get_abstract_span()
        got = abstract_span(text, secs)
        assert got == want, text


def test_abstract_span_matches_reference_on_synth_pages(reference_article):
    from elevant_ray.sources.pages import build_markup

    base = ("the quick brown fox jumps over the lazy dog " * 40).split()
    for doc_id in range(0, 60, 7):
        markup = build_markup(doc_id, " ".join(base))
        text, _links, _syns, secs = extract_page(markup)
        ref_secs = [((b, e), t) for (b, e), t in secs]
        art = reference_article.Article(id=doc_id, title="T", text=text,
                                        sections=ref_secs)
        assert abstract_span(text, ref_secs) == art.get_abstract_span()
        # engine dict-row form agrees with tuple form
        dict_secs = [{"begin": b, "end": e, "title": t}
                     for (b, e), t in secs]
        assert abstract_span(text, dict_secs) == art.get_abstract_span()


def test_abstracts_mapping_stage(ray_session):
    import ray.data as rd

    from elevant_ray.stages.dims import abstracts_mapping

    text = "Ttl\n\nAbstract one.\nTail."
    secs = [{"begin": 0, "end": len(text), "title": "ABSTRACT"}]
    rows = [
        {"title": "Alpha", "text": text, "sections": secs, "url": "b"},
        {"title": "Alpha", "text": "T2\n\nSecond abstract.", "url": "a",
         "sections": [{"begin": 0, "end": 20, "title": "ABSTRACT"}]},
        {"title": "Redir", "text": text, "sections": secs, "url": "c"},
        {"title": "Ghost", "text": text, "sections": secs, "url": "d"},
    ]
    ds = rd.from_items(rows)
    out = {r["qid"]: r for r in abstracts_mapping(
        ds, {"Alpha": "Q1", "Beta": "Q2"},
        redirects={"Redir": "Beta"}).take_all()}
    # first-by-url wins for the duplicated QID; dupe count preserved
    assert out["Q1"]["url" if "url" in out["Q1"] else "title"]  # present
    assert out["Q1"]["title"] == "Alpha"
    assert out["Q1"]["abstract"] == "Second abstract."  # url 'a' < 'b'
    assert out["Q1"]["n_articles"] == 2
    # redirect hop resolves; unmapped title dropped entirely
    assert out["Q2"]["title"] == "Redir"
    assert out["Q2"]["n_articles"] == 1
    assert set(out) == {"Q1", "Q2"}


def test_abstracts_mapping_query(ray_session):
    import pandas as pd

    import __ray_entry__ as m

    d1 = m.queries()["abstracts_mapping"]("/root/testdata/sf0.001")
    d1 = d1.to_pandas() if not isinstance(d1, pd.DataFrame) else d1
    assert len(d1) > 0
    from elevant_ray.sources.pages import NUM_ENTITIES

    ks = {int(q[1:]) for q in d1["qid"]}
    assert all(k % 11 != 5 for k in ks)      # unmapped titles dropped
    assert (d1["n_articles"] > 1).any()       # dupe accounting exercised
