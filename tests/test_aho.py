"""Aho-Corasick decontamination automaton (functions/aho.py).

Differential vs brute-force substring membership, the per-worker
memoized build, and the forced-automaton path of the two
decontamination queries against their usual oracles.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from elevant_ray.functions.aho import AhoCorasick, decon_ac_min

SF_DIR = "/root/testdata/sf0.001"


def test_ac_differential_vs_bruteforce():
    rng = random.Random(7)
    for trial in range(200):
        alpha = "ab" if trial % 2 else "abc"
        pats = ["".join(rng.choice(alpha)
                        for _ in range(rng.randint(1, 5)))
                for _ in range(rng.randint(0, 12))]
        ac = AhoCorasick(pats)
        for _ in range(5):
            text = "".join(rng.choice(alpha)
                           for _ in range(rng.randint(0, 40)))
            want = len({p for p in set(pats) if p and p in text})
            assert ac.count_distinct(text) == want
            assert ac.contains_any(text) == (want > 0)


def test_ac_edge_patterns():
    ac = AhoCorasick(["a", "ab", "ab", "bab", "", "abab"])
    assert ac.n_patterns == 4            # dupes + empty collapse
    assert ac.count_distinct("abab") == 4
    assert ac.count_distinct("zzz") == 0
    assert not ac.contains_any("")
    assert AhoCorasick([]).count_distinct("anything") == 0


def test_ac_10k_snippets():
    """The scale case the per-snippet kernel loop would crawl on: 10k
    40-char patterns, one linear scan finds exactly the planted ones."""
    rng = random.Random(0)
    pats = ["".join(rng.choice("abcdefghij") for _ in range(40))
            for _ in range(10_000)]
    ac = AhoCorasick(pats)
    text = ("".join(rng.choice("abcdefghij") for _ in range(50_000))
            + pats[777] + "xx" + pats[42] + pats[42])
    # brute force on the same doc (10k `in` checks — fine for ONE doc,
    # catastrophic per batch, which is why the automaton exists)
    want = sum(1 for p in set(pats) if p in text)
    assert ac.count_distinct(text) == want >= 2
    assert ac.contains_any(text)


def test_automaton_for_memoizes(ray_session):
    import ray

    from elevant_ray.functions import aho

    ref = ray.put(["abc", "def"])
    a1 = aho.automaton_for(ref)
    a2 = aho.automaton_for(ref)
    assert a1 is a2                      # one build per process per set
    ref2 = ray.put(["xyz"])
    assert aho.automaton_for(ref2) is not a1
    assert aho.automaton_for(ref2).contains_any("__xyz__")


def test_decon_ac_min_env(monkeypatch):
    assert decon_ac_min() == 48   # measured crossover ~40 (see docstring)
    monkeypatch.setenv("ELEVANT_RAY_DECON_AC_MIN", "0")
    assert decon_ac_min() == 0


@pytest.mark.parametrize("name", ["docs_decontaminate",
                                  "curation_pipeline"])
def test_forced_automaton_path_matches_oracle(name, ray_session,
                                              monkeypatch):
    """ELEVANT_RAY_DECON_AC_MIN=0 forces the automaton path on the
    bench-scale snippet set; output must equal the DuckDB oracle (and
    therefore the kernel-loop path the sweep already pins)."""
    import duckdb

    import __ray_entry__ as m

    monkeypatch.setenv("ELEVANT_RAY_DECON_AC_MIN", "0")
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    got = m.queries()[name](SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns), kind="stable") \
            .reset_index(drop=True)

    want = con.execute(m.oracle_sql()[name]).fetchdf()
    pd.testing.assert_frame_equal(norm(got), norm(want),
                                  check_dtype=False, check_exact=True)


def test_automaton_for_plain_list_uncached():
    """Non-ObjectRef inputs build UNCACHED: id() keys can alias after
    GC and return another snippet set's automaton (review finding)."""
    from elevant_ray.functions import aho

    a1 = aho.automaton_for(["abc"])
    a2 = aho.automaton_for(["abc"])
    assert a1 is not a2                # correct but never cached
    assert a1.contains_any("xxabcxx")


def test_automaton_cache_fifo_bound(ray_session):
    import ray

    from elevant_ray.functions import aho

    aho._AC_CACHE.clear()
    refs = [ray.put([f"pat{i}"]) for i in range(10)]
    for r in refs:
        aho.automaton_for(r)
    assert len(aho._AC_CACHE) <= 8     # FIFO bound holds
    # evicted sets rebuild correctly on re-request
    assert aho.automaton_for(refs[0]).contains_any("xx pat0 yy")
