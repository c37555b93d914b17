"""Text-analysis kernels: tokenization, unigram counting, quality scores,
language ID, document fingerprints.

The token/unigram definitions mirror the reference's word-count utilities
(``src/elevant/utils/utils.py:12-33`` — spaCy-free variant — and
``scripts/count_unigrams.py:12-31`` which splits on ``\\W+``), but are
pinned to explicit ASCII-safe regexes so the DuckDB oracle SQL in
``__ray_entry__.py`` can reproduce them exactly (same byte semantics in
Python ``re`` and DuckDB RE2).

All functions are vectorized over pandas Series / pyarrow arrays where
possible and are used inside ``map_batches`` stages (stages/text_stats.py).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, Iterable, List

# Tokens = maximal runs of non-whitespace (word count parity with
# `len(text.split())`); unigrams = maximal runs of [a-z0-9_] over the
# lowercased text (count_unigrams.py:14 splits on \W+ — on ASCII input the
# two definitions coincide; we pin ASCII so SQL matches).
TOKEN_RE = re.compile(r"\S+")
UNIGRAM_RE = re.compile(r"[a-z0-9_]+")
ALPHA_RE = re.compile(r"[A-Za-z]")
DIGIT_RE = re.compile(r"[0-9]")

# Tiny fixed stopword inventories for the n-gram-free language heuristic
# and the quality score.  Deliberately small and frozen: they are mirrored
# verbatim in oracle SQL.
EN_STOP = ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for")
DE_STOP = ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu")


def tokens(text: str) -> List[str]:
    return TOKEN_RE.findall(text)


def unigrams(text: str) -> List[str]:
    return UNIGRAM_RE.findall(text.lower())


def token_count(text: str) -> int:
    return len(TOKEN_RE.findall(text))


def quality_features(text: str) -> Dict[str, float]:
    """Length/charset/stopword quality features for one document."""
    n_chars = len(text)
    toks = TOKEN_RE.findall(text)
    n_tokens = len(toks)
    n_alpha = len(ALPHA_RE.findall(text))
    n_digit = len(DIGIT_RE.findall(text))
    words = UNIGRAM_RE.findall(text.lower())
    n_stop = sum(1 for w in words if w in EN_STOP)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_alpha": n_alpha,
        "n_digit": n_digit,
        "stopword_count": n_stop,
        "mean_token_len": (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0,
    }


def lang_guess(text: str) -> str:
    """Stopword-vote language ID: 'en' / 'de' / 'other'.

    en wins ties (>=), any language needs at least one vote.
    """
    words = UNIGRAM_RE.findall(text.lower())
    en = sum(1 for w in words if w in EN_STOP)
    de = sum(1 for w in words if w in DE_STOP)
    if en == 0 and de == 0:
        return "other"
    return "en" if en >= de else "de"


def normalized_text(text: str) -> str:
    """Lowercase + collapse all whitespace runs to single spaces + strip —
    the canonical form used for exact-dup fingerprints."""
    return re.sub(r"\s+", " ", text.lower()).strip()


def md5_fingerprint(text: str) -> str:
    """Hex md5 of the normalized text (DuckDB: md5(...) — exact parity)."""
    return hashlib.md5(normalized_text(text).encode("utf-8")).hexdigest()


def rolling_fingerprints(text: str, window: int = 8, base: int = 1_000_003,
                         mod: int = (1 << 61) - 1) -> List[int]:
    """Rabin-Karp rolling hashes over unigram windows — the document
    fingerprinting primitive for content-defined near-dup sketches."""
    ws = unigrams(text)
    if len(ws) < window:
        ws = ws + [""] * (window - len(ws))
    hs: List[int] = []
    # hash each token once, then roll over windows
    th = [int(hashlib.blake2b(w.encode(), digest_size=8).hexdigest(), 16) for w in ws]
    power = pow(base, window - 1, mod)
    acc = 0
    for i, h in enumerate(th):
        if i >= window:
            acc = (acc - th[i - window] * power) % mod
        acc = (acc * base + h) % mod
        if i >= window - 1:
            hs.append(acc)
    return hs


def convert_to_filename(string: str) -> str:
    """Lowercased string with every non-alphanumeric character except
    "-" replaced by "_" — the experiment/prediction name sanitizer used
    for output paths (``src/elevant/utils/utils.py:4-9``,
    ``link_benchmark.py:53-56``)."""
    return "".join(c if c.isalnum() or c == "-" else "_"
                   for c in string.lower())
