"""Unit tests for pure kernels: spans, mention types, tokens, minhash,
NER, URL/QID normalization."""

from __future__ import annotations

import numpy as np

from elevant_ray.functions import mention_types as mt
from elevant_ray.functions.minhash import (
    band_keys, hamming64, jaccard, minhash_signature, shingle_hashes, simhash64,
)
from elevant_ray.functions.ner import alias_mentions, capitalized_run_mentions
from elevant_ray.functions.normalize import canonical_url, wikidata_qid
from elevant_ray.functions.spans import word_boundary
from elevant_ray.functions.tokens import (
    lang_guess, md5_fingerprint, quality_features, token_count, unigrams,
)


# ---- word_boundary: reference doctests (case_generator.py:18-25) ----
def test_word_boundary_reference_doctests():
    assert word_boundary((0, 6), "Albert's birthplace is Ulm.") == (0, 8)
    assert word_boundary((1, 19), '"Hearts and Flowers" is a song.') == (0, 20)
    assert word_boundary((0, 6), "Soviet-backed government.") == (0, 6)


def test_word_boundary_never_absorbs_last_char():
    # reference quirk: right expansion stops at len(text)-1
    assert word_boundary((0, 2), "abcd") == (0, 3)


# ---- mention types (mention_type.py / pronoun_finder.py parity) ----
def test_pronouns():
    assert mt.is_pronoun("I")
    assert mt.is_pronoun("she")
    assert not mt.is_pronoun("US")   # acronym guard
    assert not mt.is_pronoun("IT")
    assert mt.is_pronoun("It")


def test_nominal():
    assert mt.is_nominal("the city")
    assert mt.is_nominal("her dog")
    assert not mt.is_nominal("the United States")  # uppercase continuation
    assert not mt.is_nominal("the ")
    assert not mt.is_nominal("Theory")


def test_mention_type_matrix():
    assert mt.mention_type("he", None, None, None, None, None) == mt.COREF_PRONOMINAL
    assert mt.mention_type("the song", None, "song", "Q1", None, None) == mt.COREF_NOMINAL
    assert mt.mention_type("Berlin", None, "Berlin", "Q64", None, None) == mt.ENTITY_NAMED
    assert mt.mention_type("jazz", None, "jazz", "Q8", None, None) == mt.ENTITY_NON_NAMED
    assert mt.mention_type("x", None, "x", "<NIL>", None, None) == mt.ENTITY_UNKNOWN
    # explicit gt coref flag wins
    assert mt.mention_type("Berlin", True, "Berlin", "Q64", None, None) == mt.COREF_NOMINAL
    assert mt.mention_type("he", False, "He", "Q1", None, None) == mt.ENTITY_NAMED


# ---- tokens / quality / langid / fingerprints ----
def test_token_count():
    assert token_count("  a  bb\tccc\n") == 3
    assert token_count("") == 0


def test_unigrams():
    assert unigrams("Hello, World_2!") == ["hello", "world_2"]


def test_quality_features():
    q = quality_features("The cat and the dog. 42!")
    assert q["n_tokens"] == 6
    assert q["n_digit"] == 2
    assert q["stopword_count"] == 3  # the, and, the


def test_lang_guess():
    assert lang_guess("the cat is in the house and it was fine") == "en"
    assert lang_guess("der Hund und die Katze ist nicht da") == "de"
    assert lang_guess("xyzzy plugh 12345") == "other"


def test_md5_fingerprint_normalization():
    assert md5_fingerprint("Hello   World") == md5_fingerprint("  hello world\n")
    assert md5_fingerprint("a") != md5_fingerprint("b")


# ---- minhash / simhash ----
def test_minhash_similarity_ordering():
    a = " ".join(f"word{i}" for i in range(200))
    b = " ".join(f"word{i}" if i != 100 else "changed" for i in range(200))
    c = " ".join(f"other{i}" for i in range(200))
    sa = minhash_signature(shingle_hashes(a))
    sb = minhash_signature(shingle_hashes(b))
    sc = minhash_signature(shingle_hashes(c))
    sim_ab = float(np.mean(sa == sb))
    sim_ac = float(np.mean(sa == sc))
    assert sim_ab > 0.5 > sim_ac


def test_minhash_deterministic():
    s1 = minhash_signature(shingle_hashes("some stable text here"))
    s2 = minhash_signature(shingle_hashes("some stable text here"))
    assert np.array_equal(s1, s2)


def test_band_keys_shared_for_near_dups():
    a = "alpha beta gamma delta epsilon zeta eta theta " * 30
    b = a + "tail"
    ka = set(band_keys(minhash_signature(shingle_hashes(a))))
    kb = set(band_keys(minhash_signature(shingle_hashes(b))))
    assert ka & kb


def test_simhash():
    a = simhash64("the quick brown fox " * 20)
    b = simhash64("the quick brown fox " * 20 + "tail")
    c = simhash64("orthogonal topic entirely different words " * 20)
    assert hamming64(a, b) < hamming64(a, c)


# ---- greedy longest-alias NER (maximum_matching_ner.py:107-123 parity) ----
def test_alias_mentions_longest_match():
    aliases = {"New York", "New York City", "York"}
    text = "Visit New York City today."
    assert alias_mentions(text, aliases) == [(6, 19)]


def test_alias_mentions_greedy_skip():
    aliases = {"AB", "CD"}
    assert alias_mentions("AB CD", aliases) == [(0, 2), (3, 5)]


def test_capitalized_runs():
    assert capitalized_run_mentions("Meet John Smith in Paris.") == [(0, 15), (19, 24)]


# ---- URL canonicalization ----
def test_canonical_url():
    assert canonical_url("https://www.Example.com/a/b/") == "example.com/a/b"
    assert canonical_url("http://example.com/a?utm_source=x&id=3#f") == "example.com/a?id=3"
    assert canonical_url("example.com//a///b") == "example.com/a/b"
    assert canonical_url("HTTPS://WWW.EXAMPLE25.com/articles/3") == "example25.com/articles/3"
    assert canonical_url("https://example.com/") == "example.com"
    assert canonical_url("https://example.com/?utm_campaign=z") == "example.com"


def test_canonical_url_matches_synth_closed_form():
    from elevant_ray.sources.pages import canonical_expected, page_url

    for doc_id in range(200):
        assert canonical_url(page_url(doc_id)) == canonical_expected(doc_id)


# ---- QID normalization (knowledge_base_mapper.py:56-117 parity) ----
def test_wikidata_qid():
    t2q = {"Berlin": "Q64", "ulm": "Q3012"}
    red = {"Berlin, Germany": "Berlin"}
    assert wikidata_qid("http://www.wikidata.org/entity/Q64", t2q) == "Q64"
    assert wikidata_qid("https://en.wikipedia.org/wiki/Berlin", t2q) == "Q64"
    assert wikidata_qid("http://dbpedia.org/resource/Berlin%2C_Germany", t2q, red) == "Q64"
    assert wikidata_qid("Q123", t2q) == "Q123"          # bare QID
    assert wikidata_qid("Ulm", t2q) == "Q3012"           # lowercase-first retry
    assert wikidata_qid("NIL", t2q) == "<NIL>"
    assert wikidata_qid("", t2q) == "<NIL>"
    assert wikidata_qid("http://ex.org/notInWiki/xyz", t2q) == "<NIL>"
    assert wikidata_qid("https://en.wikipedia.org/wiki/Nowhere", t2q) == "<NO_MAPPING>"


# ---- one-permutation hashing specifics ----
def test_oph_requires_power_of_two():
    import pytest as _pytest

    from elevant_ray.functions.minhash import minhash_signatures_batch

    with _pytest.raises(ValueError):
        minhash_signatures_batch([np.arange(5, dtype=np.uint64)], num_perm=48)


def test_oph_densifies_sparse_docs_deterministically():
    from elevant_ray.functions.minhash import minhash_signatures_batch

    one = np.array([12345], dtype=np.uint64)  # single shingle → 63 empty bins
    s1 = minhash_signatures_batch([one], num_perm=64)[0]
    s2 = minhash_signatures_batch([one], num_perm=64)[0]
    assert np.array_equal(s1, s2)
    assert (s1 != np.uint64(0xFFFFFFFFFFFFFFFF)).all()  # no EMPTY leaks
    # densified bins must NOT all collide with another sparse doc's
    # densified bins (the bin-indexed remix breaks plain-copy collisions)
    other = np.array([99999], dtype=np.uint64)
    s3 = minhash_signatures_batch([other], num_perm=64)[0]
    assert np.mean(s1 == s3) < 0.2


def test_oph_bin_match_rate_tracks_jaccard():
    from elevant_ray.functions.minhash import minhash_signatures_batch

    from elevant_ray.functions.minhash import _avalanche

    # full-range avalanched hashes, as shingle_hashes emits — raw ints
    # with fixed top bits would leave systematic empty bins
    rng = np.random.default_rng(3)
    base = _avalanche(rng.integers(0, 1 << 63, size=2000, dtype=np.int64)
                      .astype(np.uint64))
    a = base
    b = np.concatenate([base[:1000],
                        _avalanche(rng.integers(1, 1 << 63, size=1000,
                                                dtype=np.int64)
                                   .astype(np.uint64))])
    j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    sa, sb = minhash_signatures_batch([a, b], num_perm=128)
    est = float(np.mean(sa == sb))
    assert abs(est - j) < 0.15, (est, j)


# ---- dense co-occurrence count gram vs pair enumeration ----

def test_dense_cooccurrence_counts_matches_enumeration():
    from elevant_ray.stages.graph import (
        PAIR_BITS, dense_cooccurrence_counts, group_starts_sizes,
    )
    from elevant_ray.stages.util import within_group_pairs

    rng = np.random.default_rng(7)
    groups = rng.integers(0, 40, size=600, dtype=np.int64)
    nodes_raw = rng.integers(0, 25, size=600, dtype=np.int64)
    comp = np.unique((groups << PAIR_BITS) + nodes_raw)

    dense = dense_cooccurrence_counts(comp)
    assert dense is not None
    nodes, G = dense
    assert (G == G.T).all() and (np.diag(G) == 0).all()

    # enumeration oracle: within_group_pairs + unique pair counts
    mask = np.int64((1 << PAIR_BITS) - 1)
    starts, sizes = group_starts_sizes(comp >> PAIR_BITS)
    i, j = within_group_pairs(starts, sizes)
    pair = ((comp[i] & mask) << PAIR_BITS) + (comp[j] & mask)
    up, c = np.unique(pair, return_counts=True)

    iu, ju = np.nonzero(np.triu(G, k=1))
    got = dict(zip(((nodes[iu] << PAIR_BITS) + nodes[ju]).tolist(),
                   G[iu, ju].tolist()))
    assert got == dict(zip(up.tolist(), c.tolist()))


def test_dense_cooccurrence_counts_respects_bounds():
    from elevant_ray.stages.graph import PAIR_BITS, dense_cooccurrence_counts

    comp = np.array([(1 << PAIR_BITS) + 5, (1 << PAIR_BITS) + 9],
                    dtype=np.int64)
    assert dense_cooccurrence_counts(comp, max_nodes=1) is None
    assert dense_cooccurrence_counts(comp, max_groups=0) is None


def test_convert_to_filename_reference_parity():
    """utils.py:4-9 — lowercase, keep alnum and '-', everything else
    becomes '_' (differential vs the reference function with its
    import graph stubbed)."""
    import importlib.util
    import sys
    import types
    from pathlib import Path

    from elevant_ray.functions.tokens import convert_to_filename

    assert convert_to_filename("My Experiment v2!") == "my_experiment_v2_"
    assert convert_to_filename("UPPER-lower_123") == "upper-lower_123"
    ref_path = Path("/root/reference/src/elevant/utils/utils.py")
    if not ref_path.exists():
        return
    saved = {}
    for n, attrs in {
            "elevant": {}, "elevant.evaluation": {},
            "elevant.evaluation.mention_type": {
                "is_non_named_entity": lambda s: False}}.items():
        saved[n] = sys.modules.get(n)
        m = types.ModuleType(n)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[n] = m
    try:
        spec = importlib.util.spec_from_file_location("_ref_utils", ref_path)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        for c in ["My Experiment v2!", "Ünïcode-Tëst Name", "a.b/c\\d:e",
                  "UPPER-lower_123", "", "  spaces  ", "emoji 🙂 x",
                  "straße"]:
            assert convert_to_filename(c) == ref.convert_to_filename(c), c
    finally:
        for n, old in saved.items():
            if old is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = old


def test_offset_converter_parity():
    """spans.offset_to_token_idx / tokens_in_span vs the reference
    OffsetConverter run on a fake spaCy doc (offset_converter.py:8-60).
    Covers in-token hits, inter-token gaps (reference → None, engine →
    -1), and span-edge containment."""
    import importlib.util
    from pathlib import Path

    from elevant_ray.functions.prior import tokenize_with_offsets
    from elevant_ray.functions.spans import (offset_to_token_idx,
                                             tokens_in_span)

    text = "The quick  brown fox, jumps over the lazy dog."
    spans = tokenize_with_offsets(text)
    ref_path = Path("/root/reference/src/elevant/utils/offset_converter.py")
    if ref_path.exists():
        import sys
        import types

        saved = sys.modules.get("spacy.tokens"), sys.modules.get("spacy")
        spacy_mod = types.ModuleType("spacy")
        tok_mod = types.ModuleType("spacy.tokens")

        class _Tok:
            def __init__(self, idx, text):
                self.idx, self.text = idx, text

        class _Doc:
            def __init__(self, text, spans):
                self._toks = [_Tok(b, text[b:e]) for b, e in spans]

            def __len__(self):
                return len(self._toks)

            def __getitem__(self, i):
                return (self._toks[i] if isinstance(i, int)
                        else self._toks[i])

        tok_mod.Doc = object
        tok_mod.Token = object
        tok_mod.Span = object
        sys.modules["spacy"] = spacy_mod
        sys.modules["spacy.tokens"] = tok_mod
        try:
            spec = importlib.util.spec_from_file_location("_ref_oc", ref_path)
            ref = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(ref)
            doc = _Doc(text, spans)
            offs = list(range(len(text)))
            got = offset_to_token_idx(offs, spans)
            for o, g in zip(offs, got):
                want = ref.OffsetConverter.get_token_idx(o, doc)
                assert (want if want is not None else -1) == g, o
            for sp in [(0, 9), (4, 9), (4, 10), (0, len(text)),
                       (10, 20), (22, 33)]:
                lo, hi = tokens_in_span(sp, spans)
                want_toks = ref.OffsetConverter.get_tokens_in_span(sp, doc)
                want_idx = [spans.index((t.idx, t.idx + len(t.text)))
                            for t in want_toks]
                assert list(range(lo, hi)) == want_idx, sp
        finally:
            for name, old in zip(("spacy.tokens", "spacy"), saved[::-1]):
                if old is None:
                    sys.modules.pop(name, None)
                else:
                    sys.modules[name] = old
    # engine-only invariants: gap offsets bind to the FOLLOWING token
    # (the reference quirk), past-the-end → -1
    assert offset_to_token_idx([0, 3, 4, 9, 10, len(text)],
                               spans).tolist() == [0, 1, 1, 2, 2, -1]
