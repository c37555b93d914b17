"""Byte-identity differential tests for the extraction kernel.

North rule (BASELINE.json:15): extracted ``text`` per url must be
byte-identical to the reference (`wikipedia_dump_reader.py:58-167`).
We assert full tuple equality (text, hyperlinks, title_synonyms,
sections) on branch-targeted cases plus randomized markup, against the
reference function loaded as a test-only oracle.
"""

from __future__ import annotations

import random
import string

import pytest

from elevant_ray.functions.extract import extract_page, extract_batch, link_target_of

BRANCH_CASES = [
    "",  # empty article
    "Plain text with no markup at all.",
    'An <a href="Target%20Page">anchored link</a> here.',
    "A <b>bold synonym</b> in the first paragraph.",
    "Para one.\n\nPara two <b>late bold</b>.\n\nPara three <b>too late</b> end.",
    "Header test\nSection::::History.\nBody of history.",
    "Tagged header\nSection::::His<b>tor</b>y.\nBody.",  # tags inside header
    "A pseudo tag < not a tag > stays.",
    "Adjacent<b>x</b>< p >pseudo after tag.",  # k==0 wipe quirk
    "<a href=\"A\">l1</a><a href=\"B\">l2</a> back-to-back links.",
    "Unclosed <b>bold never ends",
    "Unopened bold ends</b> here.",
    "Unopened link ends</a> here.",
    "An <i>italic</i> tag is simply removed.",
    '<a href="Percent%C3%A9">ünïcode</a> über alles — 日本語 °N 47.',
    "Nested <b>bold <a href=\"X\">link</a> inside</b> bold.",
    'Quote "span" test and Albert\'s thing.',
    "< a >",
    "<  >",
    "< >",
    "Multi\nSection::::One.\nmiddle\nSection::::Two.\ntail",
    "\nSection::::Lead.\nno abstract text",
    'Link at end <a href="End">end</a>',
    "Ends with header\nSection::::Tail.",
    'empty target <a href="">x</a> and bare <a>y</a>',
    'weird <a  href="Z">double space</a>',
]


def _ref_extract(ref_cls, markup):
    return ref_cls._process_extractor_text(markup)


@pytest.mark.parametrize("markup", BRANCH_CASES)
def test_branch_cases_match_reference(reference_extractor, markup):
    assert extract_page(markup) == _ref_extract(reference_extractor, markup)


def test_randomized_markup_matches_reference(reference_extractor):
    rng = random.Random(20260817)
    pieces = (
        [lambda: rng.choice(["word", "Word", "woRd42", "ö", "日", "", " ", "\n", "\n\n"])]
        + [lambda: f'<a href="T{rng.randint(0, 30)}%20x">{rng.choice(["a", "link txt", ""])}</a>']
        + [lambda: f"<b>{rng.choice(['b', 'Bold Words', ''])}</b>"]
        + [lambda: rng.choice(["<b>", "</b>", '<a href="Dangl">', "</a>", "<i>", "</i>"])]
        + [lambda: rng.choice(["< not a tag >", "< >", "<  >", "<gt>"])]
        + [lambda: f"\nSection::::{rng.choice(['T', 'Two Words', 'With <b>tag</b>'])}.\n"]
    )
    for _ in range(400):
        n = rng.randint(0, 25)
        markup = "".join(rng.choice(pieces)() for _ in range(n))
        assert extract_page(markup) == _ref_extract(reference_extractor, markup), repr(markup)


def test_link_target_decoding():
    assert link_target_of('<a href="Some%20Page">') == "Some Page"
    assert link_target_of("<a href='x'>") == ""
    assert link_target_of('<a href="A&amp;B">') == "A&amp;B"


def test_extract_batch_arrow_roundtrip():
    import pyarrow as pa

    markup = 'Hello <b>World</b> and <a href="Entity%200">a link</a>\nSection::::S.\ntail'
    batch = pa.table({
        "url": ["u1"],
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": [markup.encode()],
        "lang": ["en"],
    })
    out = extract_batch(batch)
    assert "html" not in out.column_names
    row = out.to_pylist()[0]
    exp_text, exp_links, exp_syn, exp_secs = extract_page(markup)
    assert row["text"] == exp_text
    assert row["hyperlinks"] == [
        {"begin": b, "end": e, "target": t} for (b, e), t in exp_links
    ]
    assert row["title_synonyms"] == [{"begin": b, "end": e} for b, e in exp_syn]
    assert [s["title"] for s in row["sections"]] == [t for _, t in exp_secs]


def test_synth_pages_text_column_is_extractor_output(reference_extractor):
    """The pages generator's `text` column must equal the REFERENCE
    extraction of its own html — ties fixture synthesis to the invariant."""
    import pyarrow as pa

    from elevant_ray.sources.pages import synth_pages_batch

    docs = pa.table({
        "doc_id": list(range(0, 60)),
        "text": [f"Alpha beta {i} gamma delta epsilon zeta eta theta " * 20
                 for i in range(60)],
        "lang": ["en"] * 60,
    })
    pages = synth_pages_batch(docs)
    for row in pages.to_pylist():
        ref_text = _ref_extract(reference_extractor, row["html"].decode())[0]
        assert row["text"] == ref_text


def test_sf001_corpus_byte_identity(reference_extractor):
    """Dataset-scale invariant: every synthesized page at sf0.01 (the
    driver's correctness scale) extracts byte-identically to the
    reference across the full (text, hyperlinks, synonyms, sections)
    tuple — not just the curated branch cases."""
    import os

    import pyarrow.parquet as pq

    from elevant_ray.sources.pages import synth_pages_batch

    src = "/root/testdata/sf0.01/documents.parquet"
    if not os.path.exists(src):
        pytest.skip("driver testdata not available")
    docs = pq.read_table(src, columns=["doc_id", "text", "lang"])
    pages = synth_pages_batch(docs)
    extracted = extract_batch(pages)
    checked = 0
    for html, row in zip(pages.column("html").to_pylist(),
                         extracted.to_pylist()):
        ref_text, ref_links, ref_syn, _ = _ref_extract(
            reference_extractor, html.decode())
        assert row["text"] == ref_text, row["url"]
        assert row["hyperlinks"] == [
            {"begin": b, "end": e, "target": t} for (b, e), t in ref_links
        ], row["url"]
        assert row["title_synonyms"] == [
            {"begin": b, "end": e} for b, e in ref_syn], row["url"]
        checked += 1
    assert checked >= 500


def test_adversarial_fuzz_10k_matches_reference(reference_extractor):
    """10k-case seeded differential on adversarial markup: unclosed /
    nested / dangling tags, pseudo-tags adjacent to real tags and at
    piece boundaries (the k==0 wipe quirk's neighborhood), headers
    with embedded tags, empty and whitespace-only fragments — beyond
    the curated BRANCH_CASES set."""
    rng = random.Random(0xE1E7A)
    atoms = [
        "", " ", "\n", "\n\n", "w", "Word", "two words", "ö日°",
        "<b>", "</b>", "<i>", "</i>", "</a>", '<a href="D%20x">',
        "<b>x</b>", "<i>y</i>", '<a href="T">t</a>',
        '<a href="">e</a>', "<a>bare</a>",
        "< p >", "< >", "<  >", "<gt>", "<", ">", "<<", ">>",
        "Section::::H.", "\nSection::::His<b>t</b>ory.\n",
        "\nSection::::T.",
        '<a href="N%C3%A9">ü</a>',
        "<b><b>deep</b></b>", "<b><i>mix</b></i>",
        '<a href="O"><b>in</b></a>',
    ]
    for case in range(10_000):
        n = rng.randint(0, 14)
        markup = "".join(rng.choice(atoms) for _ in range(n))
        assert extract_page(markup) == \
            _ref_extract(reference_extractor, markup), \
            f"case {case}: {markup!r}"


def test_hypothesis_markup_matches_reference(reference_extractor):
    """Property-based differential: hypothesis composes markup from
    text / tag / pseudo-tag / header fragments and shrinks any
    mismatch to a minimal counterexample."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    text = st.text(
        alphabet="abWö 日\n.:'\"<>/%", min_size=0, max_size=8)
    link = st.builds(
        lambda t, b: f'<a href="{t}">{b}</a>',
        st.sampled_from(["T", "A%20B", "", "X%C3%A9"]),
        st.sampled_from(["x", "two words", "", "<b>in</b>"]))
    frag = st.one_of(
        text, link,
        st.sampled_from([
            "<b>", "</b>", "<i>", "</i>", "</a>", '<a href="D">',
            "<b>bold</b>", "< p >", "< >", "<gt>",
            "\nSection::::H.\n", "\nSection::::Hi<b>s</b>t.\n",
            "\n\n"]))
    markup_s = st.lists(frag, min_size=0, max_size=12).map("".join)

    @settings(max_examples=1000, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(markup=markup_s)
    def check(markup):
        assert extract_page(markup) == \
            _ref_extract(reference_extractor, markup), repr(markup)

    check()
