"""Scoring kernels: vectorized Levenshtein vs a trusted slow DP,
Jaro-Winkler spot values, scorer tie-break parity."""

from __future__ import annotations

import random

from elevant_ray.stages.scoring import jaro_winkler, token_lev_similarity


def slow_lev(a, b):
    n, m = len(a), len(b)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[m]


def test_token_lev_matches_slow_dp():
    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(12)]
    for _ in range(300):
        a = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        b = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        want = 1.0 - slow_lev(a, b) / max(len(a), len(b)) \
            if (a or b) else 1.0
        assert abs(token_lev_similarity(a, b) - want) < 1e-12, (a, b)


def test_token_lev_edges():
    assert token_lev_similarity([], []) == 1.0
    assert token_lev_similarity(["a"], []) == 0.0
    assert token_lev_similarity(["a", "b"], ["a", "b"]) == 1.0
    assert token_lev_similarity(["a", "b", "c", "d"], ["a", "x", "c", "d"]) == 0.75


def test_jaro_winkler_known_values():
    assert jaro_winkler("martha", "marhta") == 0.9611111111111111
    assert jaro_winkler("dixon", "dicksonx") == 0.8133333333333332
    assert jaro_winkler("", "abc") == 0.0
    assert jaro_winkler("same", "same") == 1.0


def test_entity_scorer_tie_breaks(ray_session):
    import ray

    from elevant_ray.stages.scoring import EntityScorer

    alias = {"x": ["Q5", "Q10", "Q2"]}
    pop = {"Q5": 7, "Q10": 7, "Q2": 3}
    a_ref, p_ref = ray.put(alias), ray.put(pop)

    # wikidata strategy: max (score, qid) — ties → larger QID string
    # (baseline_linker.py:43-50): "Q5" > "Q10" lexicographically
    s = EntityScorer(a_ref, p_ref, strategy="wikidata", drop_dates=False)
    assert s._select({"Q5", "Q10", "Q2"}) == "Q5"

    # wikipedia strategy: min among most-popular (baseline_linker.py:77-80)
    s2 = EntityScorer(a_ref, p_ref, strategy="wikipedia", drop_dates=False)
    assert s2._select({"Q5", "Q10", "Q2"}) == "Q10"


def test_levenshtein_and_charset_jaccard_match_duckdb():
    """The oracle-facing char-level metrics must be semantics-identical
    to DuckDB's levenshtein / jaccard (part_name_similarity relies on
    it)."""
    import itertools
    import random

    import duckdb

    from elevant_ray.stages.scoring import charset_jaccard, levenshtein

    con = duckdb.connect()
    rng = random.Random(31072020)
    words = ["cold widget", "small widget", "large bolt", "blue rod", "",
             "a", "aa b"] + [
        "".join(rng.choices("abcdef ", k=rng.randint(1, 12)))
        for _ in range(25)]
    for a, b in itertools.combinations(words, 2):
        lev = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == lev, (a, b)
        if a and b:  # DuckDB jaccard rejects empty strings
            jac = con.execute("SELECT jaccard(?, ?)", [a, b]).fetchone()[0]
            assert abs(charset_jaccard(a, b) - jac) < 1e-15, (a, b)


def test_damerau_levenshtein_matches_duckdb():
    """The transposition-aware metric must be the TRUE (unrestricted)
    Damerau-Levenshtein — DuckDB's variant, where dl('CA','ABC') == 2,
    not the optimal-string-alignment 3 (part_name_damerau relies on
    it)."""
    import random

    import duckdb
    import numpy as np

    from elevant_ray.stages.scoring import damerau_levenshtein, damerau_pairs

    con = duckdb.connect()
    assert damerau_levenshtein("CA", "ABC") == 2
    assert damerau_levenshtein("ab", "ba") == 1
    assert damerau_levenshtein("", "abc") == 3
    rng = random.Random(19082026)
    pairs = [("".join(rng.choices("abcd", k=rng.randint(0, 12))),
              "".join(rng.choices("abcd", k=rng.randint(0, 12))))
             for _ in range(200)]
    for a, b in pairs:
        ref = con.execute("SELECT damerau_levenshtein(?, ?)",
                          [a, b]).fetchone()[0]
        assert damerau_levenshtein(a, b) == ref, (a, b)
    # the memoized batch wrapper must agree elementwise
    n1 = np.array([a for a, _ in pairs], dtype=object)
    n2 = np.array([b for _, b in pairs], dtype=object)
    got = damerau_pairs(n1, n2)
    for i, (a, b) in enumerate(pairs):
        assert got[i] == damerau_levenshtein(a, b)


def test_guarded_pair_slabs_matches_bruteforce():
    """Slab enumeration must generate EXACTLY the triu pair set (with
    an optional length band) regardless of slab size — randomized
    differential vs the quadratic loop."""
    import numpy as np

    from elevant_ray.stages.scoring import guarded_pair_slabs

    rng = np.random.default_rng(0)
    for trial in range(200):
        n = int(rng.integers(0, 40))
        slab = int(rng.integers(1, 50))
        lens = np.sort(rng.integers(0, 15, n))
        md = int(rng.integers(0, 6)) if rng.random() < 0.7 else None
        pairs = []
        for ii, jj in guarded_pair_slabs(n, lens=lens, max_diff=md,
                                         slab_pairs=slab):
            assert len(ii) == len(jj) and (ii < jj).all()
            # slabs are bounded except when one row's band alone
            # exceeds the budget (then it's O(n), never O(n^2))
            assert len(ii) <= slab + n
            pairs += list(zip(ii.tolist(), jj.tolist()))
        want = [(i, j) for i in range(n) for j in range(i + 1, n)
                if md is None or lens[j] - lens[i] <= md]
        assert pairs == want, (trial, n, slab, md)


def test_guarded_pair_slabs_env_knob(monkeypatch):
    import numpy as np

    from elevant_ray.stages.scoring import guarded_pair_slabs

    monkeypatch.setenv("ELEVANT_RAY_PAIR_SLAB", "2")
    slabs = list(guarded_pair_slabs(6))
    assert len(slabs) > 1                      # forced fragmentation
    got = [p for ii, jj in slabs for p in zip(ii.tolist(), jj.tolist())]
    assert got == [(i, j) for i in range(6) for j in range(i + 1, 6)]


def test_hodges_lehmann_histogram_matches_bruteforce():
    """The slabbed Walsh-sum histogram median must equal sorting all
    pairwise sums — randomized shapes incl. duplicates, negatives,
    singletons (review rewrite of nation_acctbal_hodges_lehmann)."""
    import numpy as np

    from elevant_ray.stages.scoring import guarded_pair_slabs

    rng = np.random.default_rng(3)
    for trial in range(120):
        n = int(rng.integers(1, 25))
        c = np.sort(rng.integers(-500, 500, n).astype(np.int64))
        # brute force: all i <= j sums, sorted, interpolated median
        i, j = np.triu_indices(n, k=0)
        w = np.sort(c[i] + c[j])
        h = (len(w) - 1) * 0.5
        f = int(np.floor(h))
        frac = h - f
        want = float(w[f]) if frac == 0.0 \
            else w[f] + (w[f + 1] - w[f]) * frac
        # histogram path (the query kernel, tiny slabs)
        base = 2 * int(c[0])
        nbins = 2 * int(c[-1]) - base + 1
        hist = np.zeros(nbins, np.int64)
        np.add.at(hist, 2 * c - base, 1)
        for ii, jj in guarded_pair_slabs(n, slab_pairs=3):
            hist += np.bincount(c[ii] + c[jj] - base, minlength=nbins)
        csum = np.cumsum(hist)
        wf = base + int(np.searchsorted(csum, f + 1))
        got = float(wf) if frac == 0.0 \
            else wf + ((base + int(np.searchsorted(csum, f + 2))) - wf) * frac
        assert got == want, (trial, n, c.tolist(), got, want)


def test_score_name_pairs_memo_consistency():
    """memo-threaded calls must return identical results to memo-less
    calls, and the memo must actually stop re-computation."""
    import numpy as np

    from elevant_ray.stages import scoring

    a = np.array(["kettle", "kettel", "pot", "kettle"], dtype=object)
    b = np.array(["kettel", "kettle", "pan", "kettel"], dtype=object)
    l0, j0 = scoring.score_name_pairs(a, b)
    memo: dict = {}
    l1, j1 = scoring.score_name_pairs(a, b, memo=memo)
    assert (l0 == l1).all() and (j0 == j1).all()
    assert memo  # populated
    # poison the underlying kernel: a second memo call must not invoke it
    real = scoring.levenshtein
    try:
        scoring.levenshtein = lambda *args: (_ for _ in ()).throw(
            AssertionError("memo miss"))
        l2, j2 = scoring.score_name_pairs(a, b, memo=memo)
    finally:
        scoring.levenshtein = real
    assert (l2 == l0).all()
    d0 = scoring.damerau_pairs(a, b)
    dm: dict = {}
    d1 = scoring.damerau_pairs(a, b, memo=dm)
    assert (d0 == d1).all() and dm


def test_lru_automaton_cache_hit_refreshes(ray_session):
    """LRU, not FIFO: a hit must refresh recency so the hottest set is
    never the eviction victim (second-review finding)."""
    import ray

    from elevant_ray.functions import aho

    aho._AC_CACHE.clear()
    hot = ray.put(["hotpattern"])
    aho.automaton_for(hot)
    for i in range(7):
        aho.automaton_for(ray.put([f"cold{i}"]))
    aho.automaton_for(hot)                    # refresh recency
    aho.automaton_for(ray.put(["newest"]))    # evicts a COLD set
    assert hot.hex() in aho._AC_CACHE


def test_pair_memo_insertion_cap(monkeypatch):
    """Beyond PAIR_MEMO_CAP the memo stops growing (lookups still hit)
    — a mostly-distinct vocabulary must not reintroduce O(pairs)
    resident memory."""
    import numpy as np

    from elevant_ray.stages import scoring

    monkeypatch.setattr(scoring, "PAIR_MEMO_CAP", 3)
    a = np.array([f"n{i}" for i in range(10)], dtype=object)
    b = np.array([f"m{i}" for i in range(10)], dtype=object)
    memo: dict = {}
    l1, j1 = scoring.score_name_pairs(a, b, memo=memo)
    assert len(memo) == 3                     # capped
    l2, j2 = scoring.score_name_pairs(a, b, memo=memo)
    assert (l1 == l2).all() and (j1 == j2).all()
    dmemo: dict = {}    # one memo per KERNEL — value shapes differ
    d = scoring.damerau_pairs(a, b, memo=dmemo)
    assert len(dmemo) == 3
    assert (d == scoring.damerau_pairs(a, b)).all()
