"""Popular-entities linker: word trie, sitelink-argmax selection,
named + lowercase passes (popular_entities_linker.py:38-262 semantics —
see stages/popular.py parity map)."""

from __future__ import annotations

import pytest

from elevant_ray.stages.popular import (WordTrie, build_lowercase_trie,
                                        popular_link_text, select_entity)


class TestWordTrie:
    def test_contains_get_subtrie(self):
        t = WordTrie()
        t.insert("rock", "Q1")
        t.insert("rock music", "Q2")
        t.insert("rock music festival", "Q3")
        assert "rock" in t and t.get("rock") == "Q1"
        assert "rock music" in t and t.get("rock music") == "Q2"
        assert "rock band" not in t and t.get("rock band") is None
        assert t.has_subtrie("rock")          # proper descendants exist
        assert t.has_subtrie("rock music")
        assert not t.has_subtrie("rock music festival")  # leaf
        assert not t.has_subtrie("jazz")
        assert len(t) == 3

    def test_build_filters_and_argmax(self):
        trie = build_lowercase_trie(
            {"rock music": {"Q2", "Q9"}, "Berlin": {"Q64"}, "jazz": {"Q5"}},
            {"Q2": 10, "Q9": 50})
        assert "Berlin" not in trie            # not lowercase
        assert trie.get("rock music") == "Q9"  # sitelink argmax
        assert trie.get("jazz") == "Q5"        # unambiguous


def test_select_entity_prefers_names_on_ties_and_min_score():
    sl = {"Q1": 20, "Q2": 20, "Q3": 5}
    # name candidate Q2 iterates before alias Q1 at equal count: strictly-
    # greater comparison keeps Q2 (names/demonyms preferred on ties)
    assert select_entity({"Q2"}, {"Q1"}, sl, min_score=15) == "Q2"
    # below min_score -> None
    assert select_entity(set(), {"Q3"}, sl, min_score=15) is None
    # higher alias count beats lower name count
    assert select_entity({"Q3"}, {"Q1"}, {"Q1": 20, "Q3": 16}, 15) == "Q1"


DB = dict(
    ner_aliases={"Berlin", "Einstein", "Paris"},
    name_to_qids={"Berlin": {"Q64"}, "rock music": {"Q2"}, "trees": {"Q10"}},
    alias_to_qids={"Berlin": {"Q64", "Q821244"}, "Einstein": {"Q937"}},
    sitelinks={"Q64": 100, "Q821244": 4, "Q937": 90, "Q2": 40, "Q10": 30},
)


def _link(text, **kw):
    trie = build_lowercase_trie(DB["name_to_qids"], DB["sitelinks"])
    args = dict(DB)
    args.pop("ner_aliases")
    return popular_link_text(text, DB["ner_aliases"], trie=trie,
                             **{k: v for k, v in args.items()}, **kw)


def test_named_pass_sitelink_argmax():
    preds = _link("I visited Berlin with Einstein .")
    named = {p["mention"]: p["entity_id"] for p in preds if p["by"] == "named"}
    assert named == {"Berlin": "Q64", "Einstein": "Q937"}


def test_unknown_named_mention_gets_nil():
    preds = _link("Paris wins")  # alias known to NER but no candidates
    assert preds[0]["entity_id"] == "<NIL>"


def test_lowercase_trie_longest_match_and_singular():
    preds = _link("they played rock music loudly")
    low = [p for p in preds if p["by"] == "lowercase"]
    assert [(p["mention"], p["entity_id"]) for p in low] == [("rock music", "Q2")]
    # singular-form fallback: "tree" not in trie, "trees" is; probe of
    # snippet "tree" + "s" hits
    preds2 = _link("tall trees grow")
    assert [(p["mention"], p["entity_id"]) for p in preds2] == [("trees", "Q10")]


def test_lowercase_min_score_gate():
    trie = build_lowercase_trie({"rock music": {"Q2"}}, {"Q2": 40})
    preds = popular_link_text("some rock music here", set(), {}, {},
                              {"Q2": 10}, trie, min_score=15)
    assert preds == []  # sitelinks 10 < min_score 15


def test_lowercase_overlap_with_named_rejected():
    # named span covering the lowercase candidate suppresses it
    trie = build_lowercase_trie({"rock music": {"Q2"}}, {"Q2": 40})
    preds = popular_link_text(
        "THE rock music SHOW", {"rock music SHOW"},
        {"rock music SHOW": {"Q5"}}, {}, {"Q5": 99, "Q2": 40}, trie,
        min_score=2)
    bys = {p["by"] for p in preds}
    assert bys == {"named"}


def test_stopword_cannot_start_lowercase_mention():
    trie = build_lowercase_trie({"the end": {"Q9"}}, {"Q9": 99})
    preds = popular_link_text("near the end now", set(), {}, {},
                              {"Q9": 99}, trie, min_score=2)
    assert preds == []


def test_query_runs_and_is_deterministic(ray_session):
    import __ray_entry__ as m

    d1 = m.queries()["popular_linking"]("/root/testdata/sf0.001").to_pandas()
    d2 = m.queries()["popular_linking"]("/root/testdata/sf0.001").to_pandas()
    assert len(d1) > 0
    assert d1.reset_index(drop=True).equals(d2.reset_index(drop=True))
    assert set(d1["recognized_by"].unique()) <= {"named", "lowercase"}


def test_alias_first_token_index_equivalence():
    """The first-token pruning must be invisible: filtered and
    unfiltered alias_mentions agree on randomized texts/dicts,
    including multi-token aliases and punctuation separators."""
    import random

    from elevant_ray.functions.ner import (alias_first_token_index,
                                           alias_mentions)

    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta", "x1", "Big", "Apple"]
    for _ in range(300):
        n_alias = rng.randint(0, 6)
        aliases = set()
        for _ in range(n_alias):
            k = rng.randint(1, 3)
            sep = rng.choice([" ", "-", ". "])
            aliases.add(sep.join(rng.choice(words) for _ in range(k)))
        text = " ".join(rng.choice(words + ["zzz", ".", "Big Apple"])
                        for _ in range(rng.randint(0, 25)))
        idx = alias_first_token_index(aliases)
        assert alias_mentions(text, aliases) == \
            alias_mentions(text, aliases, first_token_index=idx), \
            (text, sorted(aliases))


def test_alias_first_token_index_unindexable():
    from elevant_ray.functions.ner import alias_first_token_index

    assert alias_first_token_index({"ok", " leading"}) is None
    assert alias_first_token_index({""}) is None
    assert alias_first_token_index({"a b", "a-c d"}) == {"a": 3}


def test_alias_index_never_widens_max_tokens():
    """An alias longer than max_tokens must stay unmatchable when the
    index is active (the index caps, never widens, the search)."""
    from elevant_ray.functions.ner import (alias_first_token_index,
                                           alias_mentions)

    long_alias = " ".join(["tok"] * 25)      # 25 tokens > the 20 cap
    aliases = {long_alias, "tok"}
    idx = alias_first_token_index(aliases)
    text = long_alias
    assert alias_mentions(text, aliases) == \
        alias_mentions(text, aliases, first_token_index=idx)
