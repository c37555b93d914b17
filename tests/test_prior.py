"""Prior-linker kernel: sliding windows, link-frequency argmax,
overlap resolution, consecutive-single-token rule
(prior_linker.py:80-196 semantics — see functions/prior.py parity map)."""

from __future__ import annotations

import pytest

from elevant_ray.functions.prior import (prior_link_text,
                                         sentence_start_flags,
                                         tokenize_with_offsets)


def spans_of(preds):
    return [(p["begin"], p["end"], p["entity_id"]) for p in preds]


def test_tokenize_and_sentence_starts():
    text = "Foo bar. Baz\nQux quux"
    toks = tokenize_with_offsets(text)
    assert [text[b:e] for b, e in toks] == ["Foo", "bar.", "Baz", "Qux", "quux"]
    assert sentence_start_flags(text, toks) == [True, False, True, True, False]


def test_longest_window_wins_over_contained():
    # "New York City" (3 tokens) must suppress the contained "New York"
    lf = {"New York City": {"Q60": 5}, "New York": {"Q1384": 50}}
    preds = prior_link_text("I love New York City a lot", lf)
    assert spans_of(preds) == [(7, 20, "Q60")]


def test_equal_length_overlap_higher_frequency_wins():
    # same window length, overlapping spans: higher link frequency
    # replaces the earlier prediction (prior_linker.py:169-178)
    al = {"Q1": {"alpha beta"}, "Q2": {"beta gamma"}}
    lf = {"alpha beta": {"Q1": 1}, "beta gamma": {"Q2": 9}}
    preds = prior_link_text("x alpha beta gamma y", lf, entity_aliases=al)
    assert spans_of(preds) == [(8, 18, "Q2")]
    # and with the frequencies swapped the first one stays
    lf2 = {"alpha beta": {"Q1": 9}, "beta gamma": {"Q2": 1}}
    preds2 = prior_link_text("x alpha beta gamma y", lf2, entity_aliases=al)
    assert spans_of(preds2) == [(2, 12, "Q1")]


def test_consecutive_single_token_mentions_both_dropped():
    # two 1-token mentions separated by one space: both deleted
    # (prior_linker.py:180-190)
    lf = {"Foo": {"Q1": 3}, "Bar": {"Q2": 3}}
    preds = prior_link_text("see Foo Bar here", lf)
    assert preds == []
    # but separated by more than one char they both survive
    preds2 = prior_link_text("see Foo  Bar here", lf)
    assert [p["entity_id"] for p in preds2] == ["Q1", "Q2"]


def test_argmax_deterministic_min_qid_tie():
    lf = {"Paris": {"Q90": 7, "Q167646": 7, "Q830149": 3}}
    preds = prior_link_text("in Paris today", lf)
    assert preds[0]["entity_id"] == "Q167646"  # min QID string among ties


def test_sentence_start_uppercase_gate():
    # uppercase mention at sentence start does NOT link via the
    # uppercase branch; with a matching alias + assume_nouns it does
    lf = {"Berlin": {"Q64": 5}}
    text = "Berlin is big"
    assert prior_link_text(text, lf, assume_nouns=False) == []
    preds = prior_link_text(text, lf, entity_aliases={"Q64": {"Berlin"}},
                            assume_nouns=True)
    assert spans_of(preds) == [(0, 6, "Q64")]
    # mid-sentence uppercase links even without aliases
    preds2 = prior_link_text("visit Berlin now", lf, assume_nouns=False)
    assert spans_of(preds2) == [(6, 12, "Q64")]


def test_sentence_start_lowercase_alias_retry():
    # sentence-start mention whose lowercased form is the alias
    lf = {"Trees": {"Q10884": 4}}
    preds = prior_link_text("Trees are tall", lf,
                            entity_aliases={"Q10884": {"trees"}},
                            assume_nouns=True)
    assert spans_of(preds) == [(0, 5, "Q10884")]


def test_whitelist_type_gate():
    lf = {"Berlin": {"Q64": 5}}
    kw = dict(entity_aliases={"Q64": {"Berlin"}}, assume_nouns=True)
    assert prior_link_text("visit Berlin", lf, whitelist={"LOC"},
                           entity_types={"Q64": {"PER"}}, **kw) == []
    preds = prior_link_text("visit Berlin", lf, whitelist={"LOC"},
                            entity_types={"Q64": {"LOC", "PER"}}, **kw)
    assert preds[0]["entity_id"] == "Q64"


def test_uppercase_flag_skips_lowercase_mentions():
    lf = {"berlin": {"Q64": 5}}
    kw = dict(entity_aliases={"Q64": {"berlin"}}, assume_nouns=True)
    assert prior_link_text("in berlin now", lf, uppercase=True, **kw) == []
    assert len(prior_link_text("in berlin now", lf, uppercase=False, **kw)) == 1


def test_query_runs_and_is_deterministic(ray_session):
    import __ray_entry__ as m

    d1 = m.queries()["prior_linking"]("/root/testdata/sf0.001").to_pandas()
    d2 = m.queries()["prior_linking"]("/root/testdata/sf0.001").to_pandas()
    assert len(d1) > 0
    assert d1.reset_index(drop=True).equals(d2.reset_index(drop=True))
    # predictions point at entity titles the synthesized hyperlinks use
    assert d1["pred_qid"].str.len().gt(0).all()
