"""Pairwise scoring stages.

Two scorers:

1. ``verify_pairs`` — record-linkage pair verification over candidate
   pairs: token-sequence Levenshtein similarity + shingle Jaccard +
   canonical-url equality, vectorized per batch after two hash-joins to
   attach both sides' texts.  Emits match edges for clustering.

2. ``EntityScorer`` — the ELEVANT popularity scorer as a stateful actor
   pool: alias → candidate QIDs → argmax by popularity, with the
   reference's deterministic tie-breaks
   (``baseline_linker.py:43-50``: ``max((score, qid))`` i.e. larger QID
   string on score ties for the wikidata strategy;
   ``baseline_linker.py:77-80``: ``min(candidates)`` among the
   most-popular set for the wikipedia strategy).  Dicts are loaded once
   per actor from the object store (``ray.put`` broadcast — the Ray
   analog of the reference's forkserver preload, ``link_text.py:83-84``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

import numpy as np
import pyarrow as pa

from elevant_ray.functions.dates import is_date
from elevant_ray.functions.minhash import jaccard, shingle_hashes
from elevant_ray.functions.tokens import unigrams

NIL = "<NIL>"


def token_lev_similarity(a: List[str], b: List[str]) -> float:
    """1 - levenshtein(a, b) / max(len) over token sequences.

    Fully vectorized DP row update: with unit costs the left-to-right
    dependency ``cur[j] = min(best[j], cur[j-1] + 1)`` unrolls to a
    prefix minimum — ``cur[j] = j + min(i, min_{k<=j}(best[k] - k))`` —
    so each row is O(m) numpy ops instead of an interpreted loop.
    """
    return _lev_sim_hashed(np.array([hash(t) for t in a], dtype=np.int64),
                           np.array([hash(t) for t in b], dtype=np.int64))


def _lev_dist(ai: np.ndarray, bi: np.ndarray) -> int:
    """Unit-cost edit distance over two integer code arrays (same
    vectorized prefix-min DP row update as documented on
    token_lev_similarity)."""
    n, m = len(ai), len(bi)
    if n < m:  # fewer rows over the longer side
        ai, bi, n, m = bi, ai, m, n
    if m == 0:
        return n
    ks = np.arange(1, m + 1)
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        best = np.minimum(prev[:-1] + (bi != ai[i - 1]), prev[1:] + 1)
        acc = np.minimum.accumulate(best - ks)
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = ks + np.minimum(acc, i)
        prev = cur
    return int(prev[m])


def _lev_sim_hashed(ai: np.ndarray, bi: np.ndarray) -> float:
    """token_lev_similarity over pre-hashed token arrays (the per-pair
    hot path — hashing is hoisted out and memoized by the caller)."""
    n, m = len(ai), len(bi)
    if n == 0 and m == 0:
        return 1.0
    if n == 0 or m == 0:
        return 0.0
    return 1.0 - _lev_dist(ai, bi) / max(n, m)


def levenshtein(s1: str, s2: str) -> int:
    """Character-level unit-cost edit distance, semantics-identical to
    DuckDB/Postgres ``levenshtein`` (differentially tested) — the
    north-star's pairwise-scorer edit metric over codepoint arrays."""
    if s1 == s2:
        return 0
    a = np.frombuffer(s1.encode("utf-32-le"), np.uint32).astype(np.int64)
    b = np.frombuffer(s2.encode("utf-32-le"), np.uint32).astype(np.int64)
    return _lev_dist(a, b)


def charset_jaccard(s1: str, s2: str) -> float:
    """Jaccard similarity of the two strings' character sets —
    semantics-identical to DuckDB ``jaccard`` (differentially
    tested)."""
    a, b = set(s1), set(s2)
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# cross-slab score memo insertion cap (entries): bounds the memo at
# ~100-200 MB worst case instead of O(scored pairs); lookups still hit
PAIR_MEMO_CAP = 1 << 20


def score_name_pairs(names1, names2, memo: Optional[dict] = None):
    """Batched (levenshtein, charset_jaccard) over paired name arrays,
    deduplicated by distinct pair: within-blocking-key scoring hits the
    same bounded name vocabulary over and over, so the interpreted DP
    runs O(distinct pairs) times while the per-pair plumbing (factorize,
    unique, gather) stays vectorized — no Python work per input pair.

    ``memo``: optional cross-CALL cache {(a, b): (lev, jac)} — slab
    enumeration (guarded_pair_slabs) splits one group's pairs over many
    calls, and without a shared memo a name pair recurring in k slabs
    would run the DP k times; threading one dict per group keeps the
    O(vocab²) bound across the whole group.  Insertion stops at
    PAIR_MEMO_CAP entries (lookups still hit): on a mostly-distinct
    vocabulary the memo would otherwise grow one entry per scored
    pair — O(pairs) resident memory, the exact blowup the slab
    enumeration removes — while a bounded memo still collapses the
    duplicate-heavy case it exists for.  One memo dict per KERNEL:
    damerau_pairs uses the same (a, b) keys with a different value
    shape, so sharing a dict across the two corrupts both."""
    import pandas as pd

    if len(names1) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.float64))
    codes, uniques = pd.factorize(np.concatenate([names1, names2]))
    k = len(uniques)
    pair = codes[:len(names1)].astype(np.int64) * k + codes[len(names1):]
    upair, inv = np.unique(pair, return_inverse=True)
    ulev = np.empty(len(upair), np.int64)
    ujac = np.empty(len(upair), np.float64)
    for idx, code in enumerate(upair.tolist()):
        a, b = uniques[code // k], uniques[code % k]
        if memo is not None:
            hit = memo.get((a, b))
            if hit is None:
                hit = (levenshtein(a, b), charset_jaccard(a, b))
                if len(memo) < PAIR_MEMO_CAP:
                    memo[(a, b)] = hit
            ulev[idx], ujac[idx] = hit
        else:
            ulev[idx] = levenshtein(a, b)
            ujac[idx] = charset_jaccard(a, b)
    return ulev[inv], ujac[inv]


def damerau_levenshtein(s1: str, s2: str) -> int:
    """Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner: a
    transposition's two characters may be bridged by later edits) —
    semantics-identical to DuckDB ``damerau_levenshtein``
    (differentially tested).  Note this is the TRUE DL metric, not the
    cheaper optimal-string-alignment: dl('CA','ABC') == 2."""
    if s1 == s2:
        return 0
    a = np.frombuffer(s1.encode("utf-32-le"), np.uint32).astype(np.int64)
    b = np.frombuffer(s2.encode("utf-32-le"), np.uint32).astype(np.int64)
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    inf = n + m
    # M[i+1][j+1] == d[i][j] of the classic recurrence; row/col 0 are
    # the d[-1][*] sentinel band that makes the transposition term safe
    M = np.empty((n + 2, m + 2), np.int64)
    M[0, :] = inf
    M[:, 0] = inf
    M[1, 1:] = np.arange(m + 1)
    M[1:, 1] = np.arange(n + 1)
    da: dict = {}
    for i in range(1, n + 1):
        db = 0
        ai = a[i - 1]
        row = M[i + 1]
        prev = M[i]
        for j in range(1, m + 1):
            k = da.get(b[j - 1], 0)
            lj = db
            if ai == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            row[j + 1] = min(prev[j] + cost,
                             row[j] + 1,
                             prev[j + 1] + 1,
                             M[k, lj] + (i - k - 1) + 1 + (j - lj - 1))
        da[ai] = i
    return int(M[n + 1, m + 1])


def damerau_pairs(names1, names2,
                  memo: Optional[dict] = None) -> np.ndarray:
    """Batched unrestricted Damerau-Levenshtein over paired name
    arrays, memoized by distinct pair (same factorize/unique
    scaffolding as score_name_pairs — the DP runs O(distinct pairs)
    times regardless of input pair count; ``memo`` extends the dedup
    across slab calls, see score_name_pairs)."""
    import pandas as pd

    if len(names1) == 0:
        return np.empty(0, np.int64)
    codes, uniques = pd.factorize(np.concatenate([names1, names2]))
    k = len(uniques)
    pair = codes[:len(names1)].astype(np.int64) * k + codes[len(names1):]
    upair, inv = np.unique(pair, return_inverse=True)
    ud = np.empty(len(upair), np.int64)
    for idx, code in enumerate(upair.tolist()):
        a, b = uniques[code // k], uniques[code % k]
        if memo is not None:
            hit = memo.get((a, b))
            if hit is None:
                hit = damerau_levenshtein(a, b)
                if len(memo) < PAIR_MEMO_CAP:
                    memo[(a, b)] = hit
            ud[idx] = hit
        else:
            ud[idx] = damerau_levenshtein(a, b)
    return ud[inv]


def guarded_pair_slabs(n: int, lens=None, max_diff: Optional[int] = None,
                       slab_pairs: Optional[int] = None):
    """Bounded-memory within-group pair enumeration: yields (i, j)
    int64 index arrays with i < j in slabs of ≤ `slab_pairs` pairs
    (env ``ELEVANT_RAY_PAIR_SLAB``, default 2^20 ≈ 16 MB/slab) — the
    skew guard for the inherently-pairwise contract queries
    (part_name_similarity / _damerau / _monge_elkan).  A full
    ``np.triu_indices(g)`` materializes O(g²) indices per group, which
    at 100× the part table is ~10⁴× the memory of the measured scale;
    slabs keep the peak at O(group + slab) while enumerating the exact
    same pair set, so the quadratic COST that remains is exactly the
    pair semantics the oracle's self-join defines (output-bound), never
    a resident O(g²) buffer.

    When the pair metric admits a length lower bound (Levenshtein and
    unrestricted Damerau-Levenshtein are both ≥ |len(a) − len(b)|:
    ins/del change length by 1 at cost 1, substitution/transposition
    keep it), pass `lens` (sorted ascending, caller sorts the group by
    length) and `max_diff`: rows pair only within the length band, so
    thresholded queries (lev ≤ 4) skip provably-failing pairs without
    changing the answer.  A slab containing a single oversized row
    stays O(n) — linear, never quadratic."""
    import os

    if slab_pairs is None:
        slab_pairs = int(os.environ.get(
            "ELEVANT_RAY_PAIR_SLAB", "") or (1 << 20))
    slab_pairs = max(1, slab_pairs)
    if n < 2:
        return
    lo = np.arange(1, n + 1, dtype=np.int64)
    if max_diff is None:
        hi = np.full(n, n, np.int64)
    else:
        lens = np.asarray(lens, np.int64)
        hi = np.searchsorted(lens, lens + max_diff,
                             side="right").astype(np.int64)
    cnt = np.maximum(hi - lo, 0)
    total = np.cumsum(cnt)
    start = 0
    while start < n:
        budget = (total[start - 1] if start else 0) + slab_pairs
        end = int(np.searchsorted(total, budget, side="right"))
        end = min(max(end, start + 1), n)
        c = cnt[start:end]
        tot = int(c.sum())
        if tot:
            ii = np.repeat(np.arange(start, end, dtype=np.int64), c)
            run = np.concatenate([[0], np.cumsum(c)[:-1]])
            jj = (np.arange(tot, dtype=np.int64)
                  - np.repeat(run, c) + np.repeat(lo[start:end], c))
            yield ii, jj
        start = end


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler string similarity (standard public formulation)."""
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if not n1 or not n2:
        return 0.0
    window = max(n1, n2) // 2 - 1
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    jaro = (matches / n1 + matches / n2 + (matches - t / 2) / matches) / 3
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix == 4:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1 - jaro)


def score_pair_batch(batch: pa.Table, threshold: float = 0.75) -> pa.Table:
    """Batch kernel: expects columns left, right, text_l, text_r,
    canon_l, canon_r → appends lev_sim, shingle_jaccard, url_equal,
    is_match.

    Tokenization and shingle sketches are memoized PER BATCH keyed on
    the text object: a page in k candidate pairs is tokenized once, not
    k times — on dup-heavy web corpora this is the scoring stage's
    dominant cost.  Identical texts short-circuit to similarity 1."""
    tl = batch.column("text_l").to_pylist()
    tr = batch.column("text_r").to_pylist()
    cl = batch.column("canon_l").to_pylist()
    cr = batch.column("canon_r").to_pylist()

    tok_cache: dict = {}
    sh_cache: dict = {}

    def toks(t):
        v = tok_cache.get(t)
        if v is None:
            arr = np.array([hash(w) for w in unigrams(t)], dtype=np.int64)
            uniq, counts = np.unique(arr, return_counts=True)
            v = tok_cache[t] = (arr, uniq, counts)
        return v

    def sh(t):
        v = sh_cache.get(t)
        if v is None:
            v = sh_cache[t] = shingle_hashes(t)
        return v

    lev, jac, ueq, match = [], [], [], []
    for a, b, ca, cb in zip(tl, tr, cl, cr):
        ue = ca == cb
        if ue or a == b:
            lv, jc = 1.0, 1.0
        else:
            arr_a, ua, ca_cnt = toks(a)
            arr_b, ub, cb_cnt = toks(b)
            # sound upper bound: lev matches ≤ multiset token overlap, so
            # lev_sim ≤ |A ∩ B| / max(|A|,|B|).  One vectorized
            # intersect1d (~50µs) skips the O(n·m) DP (~2ms) for the
            # band-collision junk pairs that dominate candidate sets.
            denom = max(len(arr_a), len(arr_b), 1)
            _, ia, ib = np.intersect1d(ua, ub, assume_unique=True,
                                       return_indices=True)
            inter = int(np.minimum(ca_cnt[ia], cb_cnt[ib]).sum())
            bound = inter / denom
            if bound < threshold:
                lv, jc = bound, 0.0
            else:
                lv = _lev_sim_hashed(arr_a, arr_b)
                jc = jaccard(sh(a), sh(b)) if lv >= threshold else 0.0
        lev.append(lv)
        jac.append(jc)
        ueq.append(ue)
        match.append(ue or lv >= threshold)
    out = batch.append_column("lev_sim", pa.array(lev, pa.float64()))
    out = out.append_column("shingle_jaccard", pa.array(jac, pa.float64()))
    out = out.append_column("url_equal", pa.array(ueq, pa.bool_()))
    out = out.append_column("is_match", pa.array(match, pa.bool_()))
    return out


def verify_pairs(pairs, pages, id_col: str = "url",
                 threshold: float = 0.75, num_partitions: int = 16,
                 score_parallelism: int = None, side_mode: str = "auto"):
    """Attach both sides' (text, canonical url), then score.  `pages`
    must carry columns (id_col, text, canon).  Returns the scored pair
    Dataset; filter on `is_match` for edges.

    ``side_mode``: "broadcast" ships the page table once via ray.put and
    attaches texts by dict lookup inside the scoring map — ZERO extra
    shuffles.  The auto cutoff is conservative (64 MB): a Python-dict
    broadcast is deserialized once per WORKER, so a GB-sized side costs
    every worker a multi-second unpickle + heap copy.
    "join" attaches each side via a hash-partitioned co-group join — the
    beyond-broadcast scale path.  "auto" picks by `pages.size_bytes()`
    (pass a materialized `pages` so the size probe doesn't re-execute
    the upstream plan — every current caller does).

    `score_parallelism`: the scorer fuses with the join output, so it
    inherits `num_partitions` tasks; when the cluster has more slots
    than partitions, a split-repartition (no shuffle) between join and
    scorer restores full CPU usage for the pair-scoring hot loop."""
    import ray

    from elevant_ray.stages.util import cogroup_join

    side = pages.select_columns([id_col, "text", "canon"])

    if side_mode == "auto":
        from elevant_ray.stages.util import scale_cutoff

        side_mode = ("broadcast" if pages.size_bytes() <= scale_cutoff(64 << 20)
                     else "join")

    if side_mode == "join":
        # endpoint semi-join prefilter: the side table only needs rows
        # whose id is a pair endpoint (≤ 2·|pairs| rows, usually a small
        # fraction of the corpus after blocking) — without it both
        # co-group joins exchange the FULL page text twice.  Endpoint
        # set collected under the broadcast cutoff; beyond it the
        # unfiltered join path below stands.  The shrunken side often
        # falls under the broadcast cutoff entirely, collapsing the two
        # exchanges into a map-side dict attach.
        from elevant_ray.stages.util import scale_cutoff

        pairs = pairs.materialize()
        if pairs.size_bytes() <= scale_cutoff(64 << 20):
            eps: set = set()
            for b in pairs.iter_batches(batch_format="pyarrow"):
                eps.update(b.column("left").to_pylist())
                eps.update(b.column("right").to_pylist())
            eps_ref = ray.put(eps)

            def only_endpoints(b: pa.Table) -> pa.Table:
                from elevant_ray.stages.util import cached_get

                s = cached_get(eps_ref)
                mask = [u in s for u in b.column(id_col).to_pylist()]
                return b.filter(pa.array(mask, pa.bool_()))

            side = side.map_batches(only_endpoints,
                                    batch_format="pyarrow").materialize()
            # the shrunken side is bounded by 2·|pairs| rows and ships
            # as a ZERO-COPY Arrow broadcast (plasma-backed table, no
            # per-worker dict unpickle), so the affordable cutoff is
            # far higher than the Python-dict one — and taking it
            # skips BOTH text-shipping co-group exchanges (measured
            # 30-45 s of the flagship's verify at 570k pages)
            if side.size_bytes() <= scale_cutoff(2 << 30):
                side_mode = "broadcast"

    if side_mode == "broadcast":
        # sorted-by-id Arrow table broadcast: ray.get is zero-copy, the
        # per-worker derived id index is memoized, and the per-batch
        # attach is one searchsorted + two Arrow takes — no Python dict
        side_tab = pa.concat_tables(
            list(side.iter_batches(batch_format="pyarrow")))
        import pyarrow.compute as _pc

        order = _pc.sort_indices(side_tab.column(id_col))
        side_tab = side_tab.take(order).combine_chunks()
        side_ref = ray.put(side_tab)

        def _side_index(ref):
            from elevant_ray.stages.util import _BCAST_CACHE, cached_get

            key = "sideidx:" + ref.hex()
            v = _BCAST_CACHE.get(key)
            if v is None:
                tab = cached_get(ref)
                # hash index, not a fixed-width numpy array: U/S dtype
                # sizes every element to the LONGEST id, so one long
                # outlier url multiplies the cached index by orders of
                # magnitude; pd.Index.get_indexer probes a C hash
                # table at object dtype with no width tax
                import pandas as pd

                ids = pd.Index(tab.column(id_col).to_pylist())
                v = _BCAST_CACHE[key] = (tab, ids)
            return v

        def attach_and_score(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return score_pair_batch(pa.table({
                    "left": pa.array([], pa.string()),
                    "right": pa.array([], pa.string()),
                    "text_l": pa.array([], pa.string()),
                    "canon_l": pa.array([], pa.string()),
                    "text_r": pa.array([], pa.string()),
                    "canon_r": pa.array([], pa.string())}),
                    threshold=threshold)
            tab, ids = _side_index(side_ref)
            li = pa.array(ids.get_indexer(
                b.column("left").to_pylist()).astype(np.int64))
            ri = pa.array(ids.get_indexer(
                b.column("right").to_pylist()).astype(np.int64))
            t = pa.table({
                "left": b.column("left"), "right": b.column("right"),
                "text_l": tab.column("text").take(li),
                "canon_l": tab.column("canon").take(li),
                "text_r": tab.column("text").take(ri),
                "canon_r": tab.column("canon").take(ri),
            })
            return score_pair_batch(t, threshold=threshold)

        src = (pairs.repartition(score_parallelism)
               if score_parallelism and score_parallelism > num_partitions
               else pairs)
        return src.map_batches(attach_and_score, batch_format="pyarrow")

    left_side = side.rename_columns({id_col: "left", "text": "text_l", "canon": "canon_l"})
    right_side = side.rename_columns({id_col: "right", "text": "text_r", "canon": "canon_r"})
    # co-group joins, not Dataset.join: the pairs side legitimately has
    # empty blocks (sparse candidates at small scale), which Ray's
    # distributed join handles non-deterministically (util.cogroup_join)
    pair_schema = pa.schema([("left", pa.string()), ("right", pa.string())])
    side_schema_l = pa.schema([("left", pa.string()), ("text_l", pa.string()),
                               ("canon_l", pa.string())])
    side_schema_r = pa.schema([("right", pa.string()), ("text_r", pa.string()),
                               ("canon_r", pa.string())])
    withl_schema = pa.schema(list(pair_schema) + list(side_schema_l)[1:])
    joined = cogroup_join(pairs, left_side, on="left",
                          num_partitions=num_partitions,
                          left_schema=pair_schema,
                          right_schema=side_schema_l)
    joined = cogroup_join(joined, right_side, on="right",
                          num_partitions=num_partitions,
                          left_schema=withl_schema,
                          right_schema=side_schema_r)
    if score_parallelism and score_parallelism > num_partitions:
        joined = joined.repartition(score_parallelism)
    return joined.map_batches(
        lambda b: score_pair_batch(b, threshold=threshold), batch_format="pyarrow")


class EntityScorer:
    """Actor-pool stage: mention batches → predicted QID.

    State (loaded once per actor in ``__init__`` from object-store refs):
    - alias→candidate QID list (dimension table);
    - QID→popularity (sitelinks / global link frequency);
    Strategies mirror the reference:
    - "wikidata": argmax popularity, ties → max QID string
      (baseline_linker.py:43-50);
    - "wikipedia": among max-link-frequency candidates take min QID
      (baseline_linker.py:77-80 + create_databases.py:107-126 argmax).
    """

    def __init__(self, alias_to_qids_ref, popularity_ref,
                 strategy: str = "wikidata", drop_dates: bool = True,
                 uppercase_only: bool = False):
        import ray

        self.alias_to_qids: Dict[str, List[str]] = ray.get(alias_to_qids_ref)
        self.popularity: Dict[str, int] = ray.get(popularity_ref)
        self.strategy = strategy
        self.drop_dates = drop_dates
        self.uppercase_only = uppercase_only

    def _select(self, candidates: Set[str]) -> Optional[str]:
        if not candidates:
            return None
        if self.strategy == "wikipedia":
            best = max(self.popularity.get(c, 0) for c in candidates)
            top = [c for c in candidates if self.popularity.get(c, 0) == best]
            return min(top)
        scored = [(self.popularity.get(c, 0), c) for c in candidates]
        return max(scored)[1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions = batch.column("mention").to_pylist()
        preds: List[Optional[str]] = []
        cand_col: List[List[str]] = []
        keep = []
        for text in mentions:
            if (self.uppercase_only and text.islower()) or \
                    (self.drop_dates and is_date(text)):
                keep.append(False)
                preds.append(None)
                cand_col.append([])
                continue
            keep.append(True)
            cands = set(self.alias_to_qids.get(text, ()))
            chosen = self._select(cands)
            preds.append(chosen if chosen is not None else NIL)
            cand_col.append(sorted(cands))
        out = batch.append_column("pred_qid", pa.array(preds, pa.string()))
        out = out.append_column("candidates", pa.array(cand_col, pa.list_(pa.string())))
        out = out.filter(pa.array(keep, pa.bool_()))
        return out


class PriorLinkerStage:
    """Actor-pool stage: page batches → prior-linker mention predictions
    (functions/prior.py kernel — the PriorLinker sliding-window +
    link-frequency-argmax + overlap-resolution semantics,
    prior_linker.py:80-196).  Dicts loaded once per actor from
    object-store refs, mirroring the forkserver preload
    (link_text.py:83-84)."""

    def __init__(self, link_freq_ref, aliases_ref=None,
                 id_col: str = "url", text_col: str = "text",
                 uppercase: bool = False, assume_nouns: bool = True):
        import ray

        from elevant_ray.functions.prior import build_first_token_index

        self.link_freq: Dict[str, Dict[str, int]] = ray.get(link_freq_ref)
        self.aliases: Dict[str, Set[str]] = (
            ray.get(aliases_ref) if aliases_ref is not None else {})
        self.id_col = id_col
        self.text_col = text_col
        self.uppercase = uppercase
        self.assume_nouns = assume_nouns
        # once per actor: prunes the sliding-window scan to windows
        # whose first token can actually start a known mention, and
        # pins the per-mention frequency argmax (static dict)
        from elevant_ray.functions.prior import _argmax_qid

        self.ft_index = build_first_token_index(self.link_freq)
        self.argmax_cache = {m: _argmax_qid(f)
                             for m, f in self.link_freq.items() if f}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from elevant_ray.functions.prior import prior_link_text

        ids, begins, ends, mentions, qids, ntoks = [], [], [], [], [], []
        for rid, text in zip(batch.column(self.id_col).to_pylist(),
                             batch.column(self.text_col).to_pylist()):
            for p in prior_link_text(text, self.link_freq,
                                     entity_aliases=self.aliases,
                                     uppercase=self.uppercase,
                                     assume_nouns=self.assume_nouns,
                                     first_token_index=self.ft_index,
                                     argmax_cache=self.argmax_cache):
                ids.append(rid)
                begins.append(p["begin"])
                ends.append(p["end"])
                mentions.append(p["mention"])
                qids.append(p["entity_id"])
                ntoks.append(p["n_tokens"])
        return pa.table({
            self.id_col: pa.array(ids, batch.column(self.id_col).type),
            "begin": pa.array(begins, pa.int32()),
            "end": pa.array(ends, pa.int32()),
            "mention": pa.array(mentions, pa.string()),
            "pred_qid": pa.array(qids, pa.string()),
            "n_tokens": pa.array(ntoks, pa.int32()),
        })
