"""Span arithmetic kernels (pure, per-document).

``word_boundary`` reproduces the reference's span expansion exactly
(``src/elevant/evaluation/case_generator.py:13-37``), including its two
quirks: the right expansion stops at ``len(text) - 1`` (the final
character is never absorbed), and a leading quote is re-dropped when the
span contains no closing quote.

>>> word_boundary((0, 6), "Albert's birthplace is Ulm.")
(0, 8)
>>> word_boundary((1, 19), '"Hearts and Flowers" is a song.')
(0, 20)
>>> word_boundary((0, 6), "Soviet-backed government.")
(0, 6)
"""

from __future__ import annotations

from typing import Tuple

Span = Tuple[int, int]

_WORD_EXTRAS = "'\"_"


def _is_wordish(ch: str) -> bool:
    return ch.isalnum() or ch in _WORD_EXTRAS


def word_boundary(span: Span, text: str) -> Span:
    """Expand ``span`` to word boundaries in ``text`` (reference parity)."""
    lo, hi = span
    while lo > 0 and _is_wordish(text[lo - 1]):
        lo -= 1
    # NB: `len(text) - 1` (not len(text)) mirrors case_generator.py:30 —
    # the last character of the document is never absorbed.
    while hi < len(text) - 1 and _is_wordish(text[hi]):
        hi += 1
    if text[lo] == '"' and '"' not in text[lo + 1:hi]:
        lo += 1
    return lo, hi


def spans_overlap(a: Span, b: Span) -> bool:
    return a[0] < b[1] and b[0] < a[1]


def span_contains(outer: Span, inner: Span) -> bool:
    return outer[0] <= inner[0] and inner[1] <= outer[1]


def offset_to_token_idx(offsets, token_spans):
    """Vectorized OffsetConverter.get_token_idx
    (``src/elevant/utils/offset_converter.py:8-32``): for each char
    offset, the first token whose last character sits at or after the
    offset — which is the containing token for in-token offsets and,
    by the reference's own binary-search fallthrough, the FOLLOWING
    token for offsets inside inter-token whitespace; -1 (the
    reference's None) only past the last token.  One ``searchsorted``
    over the sorted token ends for the whole batch of offsets — the
    engine's per-batch replacement for the per-call binary search."""
    import numpy as np

    offs = np.asarray(offsets, dtype=np.int64)
    if len(token_spans) == 0:
        return np.full(len(offs), -1, np.int64)
    ends = np.asarray([e for _, e in token_spans], np.int64)
    idx = np.searchsorted(ends, offs, side="right")
    return np.where(idx < len(ends), idx, -1).astype(np.int64)


def tokens_in_span(span, token_spans):
    """Vectorized OffsetConverter.get_tokens_in_span
    (``offset_converter.py:43-60``): indices of tokens FULLY contained
    in ``span`` (tokens straddling either edge excluded), as a
    (start, stop) index range into ``token_spans``."""
    import numpy as np

    if not token_spans:
        return (0, 0)
    begins = np.asarray([b for b, _ in token_spans], np.int64)
    ends = np.asarray([e for _, e in token_spans], np.int64)
    lo = int(np.searchsorted(begins, span[0], side="left"))
    hi = int(np.searchsorted(ends, span[1], side="right"))
    return (lo, hi) if hi > lo else (lo, lo)
