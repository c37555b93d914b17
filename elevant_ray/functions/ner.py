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


def alias_mentions(text: str, aliases: Collection[str],
                   max_tokens: int = MAX_MENTION_TOKENS) -> List[Tuple[int, int]]:
    """Greedy left-to-right longest-match spans of known aliases."""
    points = split_points(text)
    n = len(points)
    spans: List[Tuple[int, int]] = []
    i = 0
    while i < n - 1:
        start = points[i] + 1
        for length in range(min(max_tokens, n - 1 - i), 0, -1):
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
