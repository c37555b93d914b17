"""Prior (link-frequency) linker kernel — the ELEVANT PriorLinker's
algorithmic core (src/elevant/linkers/prior_linker.py:80-196) as a pure,
spaCy-free function.

What is ported verbatim:
- longest-first sliding mention windows: ``for n_tokens in
  range(max_tokens, 0, -1)`` over token offsets (prior_linker.py:80-107);
- link-frequency argmax per mention text (:110-121), with a
  DETERMINISTIC tie-break (min QID among max-frequency candidates —
  the reference's ``max(d, key=d.get)`` inherits dict insertion order,
  which is load-order-dependent; min-QID mirrors the baseline linker's
  documented convention, baseline_linker.py:77-80);
- synonym gate incl. the sentence-start lowercase retry (:123-130);
- whitelist-type gate (:132-137);
- the char-occupancy overlap resolution with the ``span[0] + 1``
  marker trick, longer-span-wins / equal-length-higher-frequency-wins
  replacement, and the consecutive-single-token-mention deletion rule
  (:155-196).

What differs (no POS tagger in this engine):
- tokenization is ``\\S+`` runs instead of spaCy tokens;
- ``fix_capitalization`` (ALL-CAPS re-casing via a lowercased re-parse,
  :39-74) is a no-op — it needs POS tags;
- the reference's ``use_pos`` PROPN-adjacency skip is absent, and
  ``contains_noun`` is a parameter: ``assume_nouns=True`` treats every
  window as noun-bearing (the useful default without a tagger);
  ``assume_nouns=False`` reproduces the reference's ``use_pos=False``
  behavior exactly (only non-sentence-start uppercase mentions link);
- sentence starts are offset 0 or any token preceded by '.', '!', '?'
  or a newline (approximates the spaCy sentencizer).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

_TOKEN_RE = re.compile(r"\S+")
_SENT_END = ".!?\n"


def tokenize_with_offsets(text: str) -> List[Tuple[int, int]]:
    """Whitespace-token spans (begin, end)."""
    return [(m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def sentence_start_flags(text: str, tokens: List[Tuple[int, int]]) -> List[bool]:
    """Token i starts a sentence iff it is the first token or the text
    between the previous token's end and its begin contains a sentence
    terminator, or the previous token ends with one."""
    flags = []
    for i, (b, _e) in enumerate(tokens):
        if i == 0:
            flags.append(True)
            continue
        prev_b, prev_e = tokens[i - 1]
        gap = text[prev_e:b]
        prev_last = text[prev_e - 1] if prev_e > prev_b else ""
        flags.append(any(c in _SENT_END for c in gap) or prev_last in _SENT_END)
    return flags


def _argmax_qid(freqs: Dict[str, int]) -> str:
    """max frequency, ties broken by min QID (deterministic)."""
    best = max(freqs.values())
    return min(q for q, f in freqs.items() if f == best)


def build_first_token_index(
        link_frequencies: Dict[str, Dict[str, int]]) -> Dict[str, int]:
    """first token → max token count over the known mentions starting
    with it.  A candidate window can only hit ``link_frequencies`` if
    its text EQUALS a key, which requires the key to start with the
    window's first token and have the window's token count — so the
    sliding-window scan can skip (start, n_tokens) pairs the index
    rules out without building the substring or probing the dict.
    Keys not starting at a \\S character can never equal a window
    (windows begin at token starts) and are omitted.  Build once per
    dict (stage ``__init__``), pass as ``first_token_index``."""
    idx: Dict[str, int] = {}
    for key in link_frequencies:
        toks = _TOKEN_RE.findall(key)
        if not toks or not key.startswith(toks[0]):
            continue
        idx[toks[0]] = max(idx.get(toks[0], 0), len(toks))
    return idx


def prior_link_text(
    text: str,
    link_frequencies: Dict[str, Dict[str, int]],
    entity_aliases: Optional[Dict[str, Set[str]]] = None,
    entity_types: Optional[Dict[str, Set[str]]] = None,
    whitelist: Optional[Set[str]] = None,
    max_tokens: int = 15,
    uppercase: bool = False,
    assume_nouns: bool = True,
    first_token_index: Optional[Dict[str, int]] = None,
    argmax_cache: Optional[Dict[str, str]] = None,
) -> List[dict]:
    """text → non-overlapping mention predictions
    ``[{begin, end, mention, entity_id, n_tokens}]``, sorted by begin.

    See module docstring for the parity map to prior_linker.py."""
    entity_aliases = entity_aliases or {}
    tokens = tokenize_with_offsets(text)
    if not tokens:
        return []
    sent_start = sentence_start_flags(text, tokens)
    sent_start_at = {tokens[i][0]: sent_start[i] for i in range(len(tokens))}

    def has_whitelist_type(qid: str) -> bool:
        if not whitelist:
            return True
        return bool((entity_types or {}).get(qid, set()) & whitelist)

    def has_synonym(qid: str, mention: str, is_sent_start: bool) -> bool:
        aliases = entity_aliases.get(qid, set())
        lower = mention[:1].lower() + mention[1:]
        return mention in aliases or (is_sent_start and lower in aliases)

    def matching_entity_id(mention: str, is_sent_start: bool,
                           contains_noun: bool) -> Optional[str]:
        freqs = link_frequencies.get(mention)
        if not freqs:
            return None
        # the argmax is a pure function of the static dict — callers
        # that scan many pages pass a precomputed cache (stage
        # __init__) so it isn't recomputed per occurrence
        qid = (argmax_cache[mention] if argmax_cache is not None
               else _argmax_qid(freqs))
        is_upper = mention[:1].isupper()
        if has_whitelist_type(qid) and (
                (is_upper and not is_sent_start)
                or (has_synonym(qid, mention, is_sent_start) and contains_noun)):
            return qid
        return None

    predictions: Dict[Tuple[int, int], str] = {}
    annotated = np.zeros(len(text), dtype=np.int64)
    spans: Dict[int, Tuple[Tuple[int, int], int]] = {}

    # pruning index (see build_first_token_index): a window whose first
    # token caps out below n_tokens cannot hit link_frequencies — skip
    # it before substring construction and the dict probe.  One lookup
    # per TOKEN here replaces one per (token × window length) below.
    if first_token_index is not None:
        ft_cap = np.fromiter(
            (first_token_index.get(text[b:e], 0) for b, e in tokens),
            np.int64, len(tokens))
    else:
        ft_cap = None

    for n_tokens in range(max_tokens, 0, -1):
        limit = len(tokens) - n_tokens + 1
        if limit <= 0:
            continue
        if ft_cap is not None:
            # vectorized start selection: the Python loop only visits
            # windows the index can't rule out (ascending order kept)
            starts = np.nonzero(ft_cap[:limit] >= n_tokens)[0].tolist()
        else:
            starts = range(limit)
        for start in starts:
            span = (tokens[start][0], tokens[start + n_tokens - 1][1])
            mention = text[span[0]:span[1]]
            if len(mention) <= 1:
                continue
            if uppercase and mention.islower():
                continue
            qid = matching_entity_id(mention, sent_start_at[span[0]],
                                     assume_nouns)
            if not qid:
                continue
            if annotated[span[0]:span[1]].sum() != 0:
                # overlap: longer span wins; equal length → higher link
                # frequency wins (prior_linker.py:158-178)
                overlap_idx = np.nonzero(annotated[span[0]:span[1]])[0]
                marker = int(annotated[span[0]:span[1]][overlap_idx[0]])
                o_span, o_n_tokens = spans[marker]
                o_qid = predictions[o_span]
                o_mention = text[o_span[0]:o_span[1]]
                o_freq = link_frequencies[o_mention][o_qid]
                freq = link_frequencies[mention][qid]
                if o_n_tokens == n_tokens and o_freq < freq:
                    del predictions[o_span]
                    del spans[o_span[0] + 1]
                    annotated[o_span[0]:o_span[1]] = 0
                else:
                    continue
            elif (n_tokens == 1 and span[0] >= 2
                    and annotated[span[0] - 2] != 0):
                # two single-token mentions separated by one char: a
                # bigger mention probably failed — drop both
                # (prior_linker.py:180-190)
                p_span, p_n_tokens = spans[int(annotated[span[0] - 2])]
                if p_n_tokens == 1:
                    annotated[p_span[0]:p_span[1]] = 0
                    del predictions[p_span]
                    del spans[p_span[0] + 1]
                    continue
            annotated[span[0]:span[1]] = span[0] + 1
            predictions[span] = qid
            spans[span[0] + 1] = (span, n_tokens)

    return [{"begin": s[0], "end": s[1], "mention": text[s[0]:s[1]],
             "entity_id": qid, "n_tokens": spans[s[0] + 1][1]}
            for s, qid in sorted(predictions.items())]
