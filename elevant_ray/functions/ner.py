"""Greedy longest-alias-match NER — the spaCy-free mention detector.

Parity target: ``src/elevant/ner/maximum_matching_ner.py:107-123``
(``entity_mentions``: split text at non-alphanumeric characters, greedily
match the longest known alias of ≤ 20 tokens starting at each split
point).  The alias-frequency *filter* that builds the dictionary is a
dataflow job in the engine (stages/dims.py) rather than a per-worker
loop; this module only holds the per-document matcher, which runs inside
the scorer actor pool with the alias dict loaded once per actor.
"""

from __future__ import annotations

from typing import Collection, List, Tuple

MAX_MENTION_TOKENS = 20


def split_points(text: str) -> List[int]:
    """Indices of non-alphanumeric chars, fenced by -1 and len(text)
    (maximum_matching_ner.py:15-16)."""
    return [-1] + [i for i, c in enumerate(text) if not c.isalnum()] + [len(text)]


def alias_first_token_index(aliases: Collection[str]):
    """first token → max token count over the aliases starting with
    it, or ``None`` when the dictionary contains an alias that cannot
    be first-token-indexed (empty / leading separator) — callers then
    run unfiltered.  A candidate span can only equal an alias whose
    first token matches the span's first token, so the matcher skips
    positions (and bound lengths) the index rules out — one dict probe
    per position instead of up-to-max_tokens substring probes.  Build
    once per dictionary (stage ``__init__``)."""
    idx = {}
    for a in aliases:
        if not a or not a[0].isalnum():
            return None
        ft = a
        seps = 0
        for i, c in enumerate(a):
            if not c.isalnum():
                if seps == 0:
                    ft = a[:i]
                seps += 1
        ln = seps + 1
        if ln > idx.get(ft, 0):
            idx[ft] = ln
    return idx


def alias_mentions(text: str, aliases: Collection[str],
                   max_tokens: int = MAX_MENTION_TOKENS,
                   first_token_index=None) -> List[Tuple[int, int]]:
    """Greedy left-to-right longest-match spans of known aliases."""
    points = split_points(text)
    n = len(points)
    spans: List[Tuple[int, int]] = []
    i = 0
    while i < n - 1:
        start = points[i] + 1
        cap = max_tokens
        if first_token_index is not None:
            ft_end = points[i + 1]
            if ft_end > start:   # empty first token → no filter here
                # min() with max_tokens: the index may know LONGER
                # aliases than the matcher is allowed to match — the
                # filter must never widen the search space
                cap = min(max_tokens,
                          first_token_index.get(text[start:ft_end], 0))
                if cap == 0:
                    i += 1
                    continue
        for length in range(min(cap, n - 1 - i), 0, -1):
            end = points[i + length]
            if end > start and text[start:end] in aliases:
                spans.append((start, end))
                i += length - 1
                break
        i += 1
    return spans


def capitalized_run_mentions(text: str) -> List[Tuple[int, int]]:
    """Dictionary-free fallback detector: maximal runs of capitalized
    words (``[A-Z][a-z]+(\\s[A-Z][a-z]+)*``) — used for blocking-key
    emission on pages with no alias dictionary loaded.  Kept equivalent
    to the MENTION_RE in stages/blocking.py (which is the vectorized
    form used in production)."""
    import re

    return [m.span() for m in re.finditer(r"[A-Z][a-z]+(?: [A-Z][a-z]+)*", text)]
