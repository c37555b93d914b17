"""Deduplication stages: exact (url / content-hash) and near-dup
(MinHash-LSH, SimHash).

Exact dedup follows the engine's web-page requirement (SURVEY §2.7
"corpus-level exact dedup (same-url pages) = GB(url).first"), keeping the
row with the smallest ``warc_ts`` (first crawl wins) and deterministic
further tie-break on the remaining sort key.

Near-dup emits LSH candidate pairs; verification happens in
stages/scoring.py.  All sketches are computed per batch (vectorized,
stateless tasks); the only shuffles are groupbys on content keys.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from elevant_ray.functions.minhash import (
    band_keys, shingle_hashes, simhash64,
)
from elevant_ray.functions.tokens import md5_fingerprint


from elevant_ray.stages.util import scale_cutoff as _scale_cutoff


def dedup_first_by(ds, key: str, order_col: str, schema: pa.Schema = None,
                   prefilter: bool = True):
    """Exact dedup: keep, per `key` group, the row with the smallest
    (`order_col`, then serialized-row lexicographic) — deterministic
    under any partitioning.

    Implemented as ONE vectorized hash aggregate: each row is packed
    into a sortable string ``zero-padded(order) + NUL + pickle(row)`` and
    reduced with the built-in ``Min`` — no per-group Python, no join-back
    (the packed min IS the winning row).  Scales as a plain combiner
    aggregate at 10^12 rows.

    ``prefilter`` (the 8→32 scaling fix): packing + shuffling EVERY row
    is O(total payload bytes) exchange volume, but only rows whose key
    actually collides need the aggregate — on web corpora that's a few
    percent.  A slim first pass counts key HASHES (8 bytes/row instead
    of the full payload), the duplicated-hash set broadcasts once, and
    non-colliding rows stream through untouched; only colliding rows
    (hash collisions route a few extra — harmless superset) pay the
    packed-min exchange.  Hash counting itself is driver-combined under
    the broadcast cutoff and falls back to a distributed groupby
    beyond it.

    The duplicated-key SET is broadcastable only while it stays small
    (a few percent of keys on web corpora).  That assumption is now
    checked, not trusted: beyond the cutoff the counted dup-key set's
    byte size is measured first, and when it exceeds
    ``ELEVANT_RAY_DUPKEY_CUTOFF`` (default 256 MB — a dedicated knob so
    the forced-distributed conformance runs under
    ``ELEVANT_RAY_BROADCAST_CUTOFF=0`` still exercise the routed
    broadcast path) the stage automatically falls back to the plain
    packed-min groupby over every row (``prefilter=False`` semantics,
    identical output) instead of broadcasting an oversized array."""
    import base64
    import pickle

    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    if schema is None:
        # ds.schema() triggers a sampling execution of the upstream
        # lineage — callers that know their schema statically should
        # pass it to avoid the extra pass
        s = ds.schema()
        if s is None:  # empty schema-less input: nothing to dedup
            return ds
        schema = pa.schema(
            [pa.field(n, t) for n, t in zip(s.names, s.types)])
    names = list(schema.names)
    arrow_schema = schema

    def pack(batch: pa.Table) -> pa.Table:
        order = batch.column(order_col)
        if pa.types.is_timestamp(order.type):
            order = pc.cast(order, pa.int64())
        if pa.types.is_floating(order.type):
            # monotone float64 → sortable signed int64: flip all bits
            # of negatives, the sign bit of non-negatives (standard IEEE
            # total-order trick), then recenter unsigned → signed
            import numpy as np

            u = order.to_numpy(zero_copy_only=False) \
                .astype(np.float64).view(np.uint64)
            flip = np.where(u >> np.uint64(63),
                            np.uint64(0xFFFFFFFFFFFFFFFF),
                            np.uint64(1 << 63))
            order = pa.array(((u ^ flip) ^ np.uint64(1 << 63))
                             .view(np.int64), pa.int64())
        if order.null_count:
            raise ValueError(
                f"dedup_first_by: order column {order_col!r} contains "
                "nulls — drop or fill them upstream (null has no "
                "position in the keep-first order)")
        order_vals = order.to_pylist()
        rows = batch.to_pylist()
        packed = [
            # +2^63 keeps the zero-padded key non-negative (sortable as
            # text) for the full signed-int64 order range
            f"{v + (1 << 63):020d}\x00" + base64.b64encode(
                pickle.dumps([r[n] for n in names], protocol=4)).decode()
            for v, r in zip(order_vals, rows)
        ]
        return pa.table({key: batch.column(key),
                         "_packed": pa.array(packed, pa.string())})

    def unpack(batch: pa.Table) -> pa.Table:
        if "_packed" not in batch.column_names:
            return arrow_schema.empty_table()
        rows = []
        for s in batch.column("_packed").to_pylist():
            payload = s.split("\x00", 1)[1]
            vals = pickle.loads(base64.b64decode(payload))
            rows.append(dict(zip(names, vals)))
        return pa.Table.from_pylist(rows, schema=arrow_schema)

    def packed_min_route(d):
        winners = d.map_batches(pack, batch_format="pyarrow") \
            .groupby(key).aggregate(Min("_packed", alias_name="_packed"))
        return winners.map_batches(unpack, batch_format="pyarrow")

    if not prefilter:
        return packed_min_route(ds)

    # ---- slim duplicate-key discovery + routed dedup ------------------
    import zlib

    import numpy as np
    import ray

    ds = ds.materialize()   # two consumers: hash counter + row router
    n_rows = ds.count()
    if n_rows == 0:
        return ds

    if ds.size_bytes() <= _scale_cutoff(32 << 20):
        # sub-cutoff table: one in-process pack → groupby-min → unpack
        # with the SAME kernels (pandas str min == Arrow byte min on
        # this pure-ASCII packing), saving the hash-count pass, the
        # routing maps and the packed-min exchange; the conformance
        # suite forces the routed distributed path via
        # ELEVANT_RAY_BROADCAST_CUTOFF=0
        import ray.data as rd

        tabs = list(ds.iter_batches(batch_format="pyarrow"))
        whole = (pa.concat_tables(tabs) if tabs
                 else arrow_schema.empty_table())
        dfp = pack(whole).to_pandas()
        # dropna=False: the distributed Min-aggregate path keeps
        # null-key groups, so the twin must too (path parity; mirrors
        # partial_group_agg's driver combine)
        win = dfp.groupby(key, as_index=False, dropna=False)["_packed"] \
            .min()
        return rd.from_arrow(unpack(pa.table({
            "_packed": pa.array(win["_packed"].tolist(), pa.string())})))

    def key_hashes(batch: pa.Table) -> "np.ndarray":
        col = batch.column(key).to_pylist()
        return np.fromiter(
            (zlib.crc32(str(s).encode("utf-8")) for s in col),
            np.uint64, batch.num_rows)

    def count_partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(key_hashes(batch), return_counts=True)
        return pa.table({"h": pa.array(u, pa.uint64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    counts = ds.map_batches(count_partial, batch_format="pyarrow")
    if n_rows * 16 <= _scale_cutoff(256 << 20):
        hs, ns = [], []
        for b in counts.iter_batches(batch_format="pyarrow"):
            hs.append(b.column("h").to_numpy(zero_copy_only=False))
            ns.append(b.column("n").to_numpy(zero_copy_only=False))
        h_all = np.concatenate(hs)
        n_all = np.concatenate(ns)
        uniq, inv = np.unique(h_all, return_inverse=True)
        totals = np.bincount(inv, weights=n_all)
        dup_hashes = uniq[totals >= 2]
    else:
        import os

        from ray.data.aggregate import Sum

        agg = counts.groupby("h").aggregate(Sum("n", alias_name="n"))
        dup = agg.filter(lambda r: r["n"] >= 2).materialize()
        # broadcastability is MEASURED, not assumed: a pathological
        # corpus where most keys collide would make the dup-key set
        # itself corpus-scale — fall back to the plain packed-min
        # groupby (prefilter=False semantics, identical output) instead
        # of broadcasting it
        dup_cutoff = int(os.environ.get(
            "ELEVANT_RAY_DUPKEY_CUTOFF", "") or (256 << 20))
        if dup.count() * 8 > dup_cutoff:
            return packed_min_route(ds)
        # stream Arrow batches into one ndarray: take_all() would
        # materialize the set as Python row-dicts at ~25x the 8 B/key
        # the cutoff just measured.  Left unsorted here — the ray.put
        # below sorts once for the searchsorted routing
        hs = [b.column("h").to_numpy(zero_copy_only=False)
              for b in dup.iter_batches(batch_format="pyarrow")]
        dup_hashes = (np.concatenate(hs).astype(np.uint64, copy=False)
                      if hs else np.array([], np.uint64))
    dup_ref = ray.put(np.sort(dup_hashes))

    def route(batch: pa.Table, want_dup: bool) -> pa.Table:
        dups = ray.get(dup_ref)   # numpy → plasma zero-copy
        h = key_hashes(batch)
        if len(dups) == 0:
            found = np.zeros(len(h), np.bool_)
        else:
            idx = np.minimum(np.searchsorted(dups, h), len(dups) - 1)
            found = dups[idx] == h
        return batch.filter(pa.array(found if want_dup else ~found))

    clean = ds.map_batches(lambda b: route(b, False),
                           batch_format="pyarrow")
    winners = ds.map_batches(lambda b: route(b, True),
                             batch_format="pyarrow") \
        .map_batches(pack, batch_format="pyarrow") \
        .groupby(key).aggregate(Min("_packed", alias_name="_packed"))
    deduped = winners.map_batches(unpack, batch_format="pyarrow")

    def align(b: pa.Table) -> pa.Table:
        return b.select(arrow_schema.names).cast(arrow_schema)

    return clean.map_batches(align, batch_format="pyarrow") \
        .union(deduped)


def dedup_exact_text(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Content-exact dedup by normalized-text md5; keeps min id per group
    (hash-partition + per-group first — SURVEY §2.7).  One vectorized
    hash aggregate (packed-min, see dedup_first_by)."""
    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [md5_fingerprint(t) for t in batch.column(text_col).to_pylist()]
        return batch.append_column("fingerprint", pa.array(fps, pa.string()))

    with_fp = ds.map_batches(add_fp, batch_format="pyarrow")
    return dedup_first_by(with_fp, key="fingerprint", order_col=id_col)


def add_minhash_columns(batch: pa.Table, text_col: str = "text",
                        num_perm: int = 64, bands: int = 16,
                        shingle_k: int = 5,
                        short_doc_tokens: int = 60) -> pa.Table:
    """Append `band_key` list column (LSH keys) per row.

    Two candidate channels (recall math in the comments):
    - primary banding (num_perm=64, 16 bands × 4 rows): at shingle
      Jaccard 0.75 a band matches with p = 0.75^4 ≈ 0.32, so
      P(miss) = (1-0.32)^16 ≈ 2e-3 — catches long-doc near-dups;
    - for SHORT documents (< `short_doc_tokens` unigrams) banding
      probability degrades badly (a token-lev-0.75 pair of 50-token
      docs can sit at shingle Jaccard < 0.3), so every raw shingle hash
      is emitted as its own key — any single shared 5-shingle makes the
      pair a candidate.  Bounded extra keys (≤ tokens per doc), and the
      blocking groupby is a vectorized hash aggregate, so the extra
      (mostly singleton) keys cost O(rows), not O(groups × python-call).
    """
    from elevant_ray.functions.tokens import unigrams

    from elevant_ray.functions.minhash import minhash_signatures_batch

    texts = batch.column(text_col).to_pylist()
    tok_lists = [unigrams(t) for t in texts]
    shingle_sets = [shingle_hashes(t, k=shingle_k, tokens=toks)
                    for t, toks in zip(texts, tok_lists)]
    sigs = minhash_signatures_batch(shingle_sets, num_perm=num_perm)
    keys_col: List[List[str]] = []
    for toks, sh, sig in zip(tok_lists, shingle_sets, sigs):
        keys = band_keys(sig, bands=bands)
        if len(toks) < short_doc_tokens:
            keys += [f"s:{int(h):016x}" for h in sh]
        keys_col.append(keys)
    return batch.append_column("band_key", pa.array(keys_col, pa.list_(pa.string())))


def blocking_keys(ds, id_col: str, text_col: str = "text",
                  canon_col: str = None, **minhash_kwargs):
    """pages → exploded blocking-key rows (band_key, id).

    Channels, all from ONE map:
    - MinHash-LSH band keys over text shingles ("<band>:<hash>");
    - optionally, a canonical-url key ("c:<canon>") when `canon_col` is
      given — pages sharing a canonical url become candidates without
      any content similarity.

    Deterministic per page, so an incremental batch emits exactly the
    keys the full-batch run would (state/linkage_state.py probes a
    persisted key index with these)."""
    return ds.map_batches(
        lambda b: explode_keys_table(
            add_minhash_columns(b, text_col=text_col, **minhash_kwargs),
            id_col, canon_col=canon_col),
        batch_format="pyarrow")


def explode_keys_table(batch: pa.Table, id_col: str,
                       canon_col: str = None) -> pa.Table:
    """Table-level kernel behind `blocking_keys`: one row per
    (band_key, id) — also called in-process by the incremental
    delta fast path (state/linkage_state.py)."""
    ids, keys = [], []
    canon = (batch.column(canon_col).to_pylist()
             if canon_col else [None] * batch.num_rows)
    for rid, ks, cn in zip(batch.column(id_col).to_pylist(),
                           batch.column("band_key").to_pylist(),
                           canon):
        for k in ks:
            ids.append(rid)
            keys.append(k)
        if cn is not None:
            ids.append(rid)
            keys.append(f"c:{cn}")
    return pa.table({"band_key": pa.array(keys, pa.string()),
                     id_col: pa.array(ids, batch.column(id_col).type)})


def lsh_candidate_pairs(ds, id_col: str, text_col: str = "text",
                        max_block: int = 64, canon_col: str = None,
                        num_partitions: int = 16, **minhash_kwargs):
    """pages → distinct candidate pairs (left < right) from shared
    blocking keys (see `blocking_keys` for the key channels; one map +
    one groupby total — each extra all-to-all costs a full exchange).

    Blocks larger than `max_block` are broken into a star + adjacent
    chain (skew guard — connectivity preserved for CC, quadratic blowup
    avoided).  Final distinct-pair dedup is one groupby on (left, right).
    """
    exploded = blocking_keys(ds, id_col, text_col=text_col,
                             canon_col=canon_col, **minhash_kwargs)
    return pairs_from_keys(exploded, id_col, max_block=max_block,
                           num_partitions=num_partitions)


def pairs_from_keys(exploded, id_col: str, max_block: int = 64,
                    num_partitions: int = 16):
    """Exploded (band_key, id) rows → distinct candidate pairs
    (left < right)."""
    # ---- ONE bucketed shuffle: in-bucket vectorized pair expansion -----
    # Every row of a band key hashes to one bucket, so each bucket holds
    # WHOLE key groups and can expand pairs locally with exact per-key
    # counts: sorted runs + within_group_pairs for normal keys, hub-star
    # + adjacent chain for keys larger than `max_block` (component
    # diameter stays 2, so hash-min CC converges in O(1) rounds; the
    # chain covers hub-pair verification failures).  This replaces the
    # round-1 design (sampled hot-key detection + a two-sided co-group
    # self-join): the join shipped every exploded row TWICE and its
    # sampler merged ~1M keys serially on the driver — together ~10 s of
    # the flagship's blocking phase and pure Amdahl tax at 8→32 cpus.
    # Exact counts also remove the sampler's miss probability entirely.
    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    pairs = as_arrow(bucketed_group_apply(
        exploded, "band_key",
        lambda df: expand_pairs_frame(df, id_col, max_block=max_block),
        buckets=max(64, num_partitions * 4)))
    return distinct_pairs(pairs)


def expand_pairs_frame(df, id_col: str, max_block: int = 64):
    """Frame-level pair expansion over WHOLE key groups (the in-bucket
    kernel of `pairs_from_keys`; also called in-process on sub-cutoff
    incremental deltas).  Requires every row of a band key to be
    present in `df` — bucketing guarantees it distributed; the delta
    fast path passes the full probed key set."""
    import pandas as pd

    from elevant_ray.stages.util import within_group_pairs

    out_empty = pd.DataFrame({"left": pd.Series([], dtype=object),
                              "right": pd.Series([], dtype=object)})
    if not len(df):
        return out_empty
    k = df["band_key"].to_numpy()
    ids = df[id_col].astype(str).to_numpy()
    order = np.lexsort((ids, k))
    k = k[order]
    ids = ids[order]
    starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    sizes = np.diff(np.append(starts, len(k)))
    small = sizes <= max_block
    i, j = within_group_pairs(starts[small], sizes[small])
    lefts = [ids[i]]
    rights = [ids[j]]
    for st, sz in zip(starts[~small].tolist(), sizes[~small].tolist()):
        ms = np.unique(ids[st:st + sz])
        if len(ms) < 2:
            continue
        if len(ms) <= max_block:   # duplicate ids inflated the run
            ii, jj = within_group_pairs(np.array([0]),
                                        np.array([len(ms)]))
            lefts.append(ms[ii])
            rights.append(ms[jj])
        else:
            lefts.append(np.full(len(ms) - 1, ms[0], dtype=object))
            rights.append(ms[1:])
            lefts.append(ms[1:-1])
            rights.append(ms[2:])
    left = np.concatenate(lefts)
    right = np.concatenate(rights)
    if not len(left):
        return out_empty
    keep = left != right
    res = pd.DataFrame({"left": left[keep], "right": right[keep]})
    # ids are sorted within runs so left < right already; local
    # dedup shrinks the global distinct shuffle
    return res.drop_duplicates(ignore_index=True)


def simhash_candidate_pairs(ds, id_col: str, text_col: str = "text",
                            max_hamming: int = 3, num_partitions: int = 16):
    """SimHash near-dup pairs with hamming distance ≤ `max_hamming`.

    The 64-bit simhash is split into ``max_hamming + 1`` bands of
    ``64 // (max_hamming + 1)`` bits; by pigeonhole any pair within the
    hamming budget agrees EXACTLY on at least one band → recall is 1.0
    (deterministic, unlike MinHash banding).  Band keys are self-joined
    (vectorized hash join); both sides' full hashes ride along in the
    join rows, so verification is a numpy XOR-popcount — no extra join.
    Returns distinct pairs (left, right, hamming)."""
    import pyarrow.compute as pc

    nbands = max_hamming + 1
    width = 64 // nbands

    def keys(batch: pa.Table) -> pa.Table:
        ids, band_keys_, hashes = [], [], []
        for rid, text in zip(batch.column(id_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            h = simhash64(text)
            for b in range(nbands):
                chunk = (h >> (b * width)) & ((1 << width) - 1)
                ids.append(rid)
                band_keys_.append(f"{b}:{chunk:x}")
                hashes.append(h - (1 << 63))        # signed int64 view
        return pa.table({"band_key": pa.array(band_keys_, pa.string()),
                         id_col: pa.array(ids, batch.column(id_col).type),
                         "_h": pa.array(hashes, pa.int64())})

    # materialize once (both join sides read it) and self-join via the
    # empty-block-safe cogroup, not Dataset.join (scheduling-order flaky
    # when any upstream block is empty)
    from elevant_ray.stages.util import cogroup_join

    exploded = ds.map_batches(keys, batch_format="pyarrow").materialize()
    esch = exploded.schema()
    id_type = dict(zip(esch.names, esch.types))[id_col]
    rhs = exploded.rename_columns({id_col: "_rid", "_h": "_rh"})
    joined = cogroup_join(
        exploded, rhs, on="band_key", num_partitions=num_partitions,
        left_schema=pa.schema([("band_key", pa.string()),
                               (id_col, id_type), ("_h", pa.int64())]),
        right_schema=pa.schema([("band_key", pa.string()),
                                ("_rid", id_type),
                                ("_rh", pa.int64())]))

    def verify(batch: pa.Table) -> pa.Table:
        l = batch.column(id_col).cast(pa.string())
        r = batch.column("_rid").cast(pa.string())
        mask = pc.less(l, r)
        batch = pa.table({"left": l, "right": r,
                          "_h": batch.column("_h"),
                          "_rh": batch.column("_rh")}).filter(mask)
        a = batch.column("_h").to_numpy().astype(np.uint64)
        b = batch.column("_rh").to_numpy().astype(np.uint64)
        x = a ^ b
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):                      # vectorized popcount
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
            if not x.any():
                break
        keep = ham <= max_hamming
        return pa.table({
            "left": batch.column("left").filter(pa.array(keep)),
            "right": batch.column("right").filter(pa.array(keep)),
            "hamming": pa.array(ham[keep], pa.int64()),
        })

    verified = joined.map_batches(verify, batch_format="pyarrow")
    # distinct over (left, right), min hamming kept (same value each way)
    from ray.data.aggregate import Min

    from elevant_ray.stages.util import as_arrow

    return as_arrow(verified.groupby(["left", "right"]).aggregate(
        Min("hamming", alias_name="hamming")))


def _ngram_jaccard_inprocess(ds, id_col: str, text_col: str,
                             n: int, threshold: float):
    """In-process twin of the distributed Jaccard join, fully
    vectorized via the shared co-occurrence counter
    (``_pair_intersections`` — see the containment twin): exact |∩|
    per co-occurring pair, Jaccard on true sizes.  The distributed
    path's prefix + PPJoin filters are recall-preserving, so both
    paths emit the identical final pair set (conformance-forced)."""
    import ray.data as rd

    ids, grams = [], []
    for b in ds.iter_batches(batch_format="pyarrow"):
        for rid, text in zip(b.column(id_col).to_pylist(),
                             b.column(text_col).to_pylist()):
            ids.append(str(rid))
            grams.append(_gram_hashes(text, n))
    out_schema = pa.schema([("left", pa.string()),
                            ("right", pa.string()),
                            ("jac", pa.float64())])
    if not ids:
        return rd.from_arrow(out_schema.empty_table())
    try:
        inter_keys, inter_cnt, sizes = _pair_intersections(grams)
    except _CooccurrenceVolume:
        return None                   # caller takes the distributed path
    lefts, rights, js = [], [], []
    if len(inter_keys):
        n_docs = len(ids)
        i_idx = (inter_keys // n_docs).astype(np.int64)
        j_idx = (inter_keys % n_docs).astype(np.int64)
        denom = sizes[i_idx] + sizes[j_idx] - inter_cnt
        ok = (denom > 0) & (inter_cnt / np.maximum(denom, 1)
                            >= threshold)
        rows = []
        for i, j, jv in zip(i_idx[ok], j_idx[ok],
                            (inter_cnt[ok] / denom[ok])):
            a, b_ = ids[i], ids[j]
            if b_ < a:
                a, b_ = b_, a
            rows.append((a, b_, round(float(jv), 6)))
        rows.sort()
        lefts = [r[0] for r in rows]
        rights = [r[1] for r in rows]
        js = [r[2] for r in rows]
    return rd.from_arrow(pa.table({
        "left": pa.array(lefts, pa.string()),
        "right": pa.array(rights, pa.string()),
        "jac": pa.array(js, pa.float64())}))


def _ngram_containment_inprocess(ds, id_col: str, text_col: str,
                                 n: int, threshold: float):
    """In-process twin of the distributed containment join, fully
    vectorized: |∩(i,j)| for every co-occurring doc pair comes from
    one sort + within-group pair expansion + ``np.unique`` multiplicity
    count over the (gram → docs) incidence — no per-candidate Python
    verify loop (the old per-pair ``intersect1d`` walk cost ~1.6 s on
    ~400k candidates at sf0.1).  Exactness: a singleton gram can never
    be shared, so counting over df≥2 grams IS the true intersection,
    and the distributed prefix filter has recall 1.0 — both paths emit
    the identical final pair set (conformance-forced in
    tests/test_scale_paths.py)."""
    import ray.data as rd

    batches = list(ds.iter_batches(batch_format="pyarrow"))
    ids, grams = [], []
    for b in batches:
        for rid, text in zip(b.column(id_col).to_pylist(),
                             b.column(text_col).to_pylist()):
            ids.append(str(rid))
            grams.append(_gram_hashes(text, n))
    out_schema = pa.schema([("left", pa.string()),
                            ("right", pa.string()),
                            ("cont", pa.float64())])
    if not ids:
        return rd.from_arrow(out_schema.empty_table())
    try:
        inter_keys, inter_cnt, sizes = _pair_intersections(grams)
    except _CooccurrenceVolume:
        return None                   # caller takes the distributed path
    if not len(inter_keys):
        return rd.from_arrow(out_schema.empty_table())
    n_docs = len(ids)
    i_idx = (inter_keys // n_docs).astype(np.int64)
    j_idx = (inter_keys % n_docs).astype(np.int64)
    mn = np.minimum(sizes[i_idx], sizes[j_idx])
    ok = (mn > 0) & (inter_cnt / np.maximum(mn, 1) >= threshold)
    rows = []
    for i, j, cv in zip(i_idx[ok], j_idx[ok],
                        (inter_cnt[ok] / mn[ok])):
        a, b_ = ids[i], ids[j]
        if b_ < a:
            a, b_ = b_, a
        rows.append((a, b_, round(float(cv), 6)))
    rows.sort()
    return rd.from_arrow(pa.table({
        "left": pa.array([r[0] for r in rows], pa.string()),
        "right": pa.array([r[1] for r in rows], pa.string()),
        "cont": pa.array([r[2] for r in rows], pa.float64())}))


class _CooccurrenceVolume(Exception):
    """Projected in-process co-occurrence volume too large — use the
    distributed prefix-filtered path instead."""


def _pair_intersections(grams, max_volume: int = 30_000_000):
    """Shared-gram counts for every doc pair with ≥1 shared df≥2 gram.

    Input: per-doc arrays of DISTINCT gram hashes.  Returns
    ``(pair_keys, counts, sizes)`` where ``pair_keys = i * n_docs + j``
    (doc indices, i < j by index), ``counts[k]`` = exact ``|∩|`` of the
    pair, and ``sizes`` = per-doc distinct-gram counts.  One sort of
    the (gram, doc) incidence + within-group pair expansion +
    ``np.unique`` multiplicity — O(E log E) for E incidence entries
    plus the co-occurrence volume, all in C."""
    from elevant_ray.stages.util import within_group_pairs

    sizes = np.array([len(g) for g in grams], dtype=np.int64)
    if not len(grams):
        return np.array([], np.int64), np.array([], np.int64), sizes
    allg = np.concatenate(grams) if len(grams) else np.array([], np.int64)
    doc_of = np.repeat(np.arange(len(grams), dtype=np.int64), sizes)
    u, inv, cnt = np.unique(allg, return_inverse=True,
                            return_counts=True)
    kept = cnt[cnt >= 2].astype(np.int64)
    if int((kept * (kept - 1) // 2).sum()) > max_volume:
        raise _CooccurrenceVolume()
    keep = cnt[inv] >= 2              # singleton grams can't be shared
    g_k, d_k = inv[keep], doc_of[keep]
    order = np.argsort(g_k, kind="stable")
    g_k, d_k = g_k[order], d_k[order]
    bounds = np.nonzero(np.diff(g_k))[0] + 1
    starts = np.concatenate([[0], bounds]).astype(np.int64)
    gsizes = np.diff(np.concatenate([starts, [len(g_k)]])).astype(np.int64)
    li, ri = within_group_pairs(starts, gsizes)
    if not len(li):
        return np.array([], np.int64), np.array([], np.int64), sizes
    a = d_k[li]
    b = d_k[ri]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    keys = lo * np.int64(len(grams)) + hi
    pair_keys, counts = np.unique(keys, return_counts=True)
    return pair_keys, counts.astype(np.int64), sizes


def _gram_hashes(text: str, n: int) -> np.ndarray:
    """Sorted distinct signed-int64 hashes of the doc's token n-grams —
    the vectorized shingle mix (functions/minhash.py), not per-gram
    string building + blake2b.  64-bit: hashed intersection == string
    intersection in practice, and int64 join keys shuffle cheaper than
    gram strings."""
    from elevant_ray.functions.minhash import shingle_hashes

    return np.unique(
        shingle_hashes(text, k=n).astype(np.int64))  # uint64 → signed view


def ngram_jaccard_pairs(ds, id_col: str, text_col: str = "text",
                        n: int = 3, threshold: float = 0.5,
                        num_partitions: int = 16, verify: str = "auto"):
    """EXACT n-gram Jaccard pairs ≥ threshold via the AllPairs/PPJoin
    prefix filter (Bayardo et al., WWW'07 — public algorithm).

    A naive per-gram self-join is quadratic in gram frequency (a gram
    shared by k docs yields k² rows — hot template grams are the
    all-to-all death at corpus scale).  The prefix filter keeps recall
    exactly 1.0 while joining only each doc's
    ``|G| - ceil(t·|G|) + 1`` RAREST grams (global (count, gram) order):
    if J(A,B) ≥ t, the rarest shared gram provably lies in both
    prefixes.  Rare-first selection simultaneously prunes the hot keys.

    Stages: per-batch gram-set map → gram doc-frequency (per-batch
    partial Counters combined on the driver — the freq dict is
    driver-materialized for the ray.put broadcast anyway, so a shuffle
    groupby before it only adds an exchange; count ≥ 2 only, singletons
    can never match) → prefix emission → self-join on prefix grams →
    exact verification (sorted-hash intersection) against both docs'
    full gram-hash sets.  Verification is broadcast-side when the doc
    gram-set table fits the object store comfortably (one ray.put dict,
    zero extra shuffles) and join-side otherwise (two co-group joins
    attaching each side's hash blob) — ``verify`` picks
    "auto"/"broadcast"/"join".

    At corpora where the non-singleton gram vocabulary outgrows a
    broadcast (~10⁸+), replace the ray.put dict with a join-based count
    attach + per-doc regroup; same semantics, two more shuffles.

    Sub-cutoff inputs run the identical exact algorithm in process
    (same df floor, both-side prefixes, PPJoin length filter, same
    verify) — pair set is path-independent; the conformance suite
    forces the distributed path via ELEVANT_RAY_BROADCAST_CUTOFF=0."""
    import math
    from collections import Counter

    import numpy as np
    import ray

    from elevant_ray.stages.util import pin_schema

    ds = ds.materialize()
    # explicit verify modes ("broadcast"/"join") are path selectors —
    # tests use them to pin a distributed strategy — so only "auto"
    # may take the in-process shortcut.  8 MB gate + volume bail-out:
    # see ngram_containment_pairs for the rationale.
    if verify == "auto" and ds.size_bytes() <= _scale_cutoff(8 << 20):
        out = _ngram_jaccard_inprocess(ds, id_col, text_col, n,
                                       threshold)
        if out is not None:
            return out

    def gram_partials(batch: pa.Table) -> pa.Table:
        parts = [_gram_hashes(text, n) for text
                 in batch.column(text_col).to_pylist()]
        allg = (np.concatenate(parts) if parts
                else np.array([], np.int64))
        u, c = np.unique(allg, return_counts=True)
        return pa.table({"gram": pa.array(u, pa.int64()),
                         "partial": pa.array(c.astype(np.int64),
                                             pa.int64())})

    # vectorized driver merge (concat + unique + bincount), NOT a
    # per-gram Python Counter — the Counter form cost seconds of
    # serial driver time on ~1M gram partials (the same Amdahl tax the
    # LSH sampler paid before round 2)
    _gs, _cs = [], []
    for b in ds.map_batches(gram_partials, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        _gs.append(b.column("gram").to_numpy(zero_copy_only=False))
        _cs.append(b.column("partial").to_numpy(zero_copy_only=False))
    if _gs:
        _g_all = np.concatenate(_gs)
        _uniq, _inv = np.unique(_g_all, return_inverse=True)
        _tot = np.bincount(_inv, weights=np.concatenate(_cs)) \
            .astype(np.int64)
        _keep = _tot >= 2
        freq = dict(zip(_uniq[_keep].tolist(), _tot[_keep].tolist()))
    else:
        freq = {}
    freq_ref = ray.put(freq)

    # one fused per-doc pass: prefix grams (exploded rows) + full
    # gram-hash blob — materialized once, consumed by BOTH self-join
    # sides and BOTH verify joins (without the pin, each consumer
    # re-executes the read + gram computation)
    def doc_pass(batch: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get
        fr = cached_get(freq_ref)
        ids, blobs, pgrams, sizes = [], [], [], []
        for rid, text in zip(batch.column(id_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            ghs = _gram_hashes(text, n)          # sorted distinct int64
            gset = sorted(ghs.tolist(), key=lambda g: (fr.get(g, 1), g))
            k = len(gset) - math.ceil(threshold * len(gset)) + 1
            # singletons can't match — skip their join rows
            pgrams.append([g for g in gset[:k] if g in fr])
            sizes.append(len(gset))
            ids.append(str(rid))
            # binary blob, not list<int64> — Acero joins reject nested
            # payload columns
            blobs.append(ghs.tobytes())
        return pa.table({"_vid": pa.array(ids, pa.string()),
                         "_hs": pa.array(blobs, pa.binary()),
                         "_pg": pa.array(pgrams, pa.list_(pa.int64())),
                         "_sz": pa.array(sizes, pa.int64())})

    doc_table = ds.map_batches(doc_pass, batch_format="pyarrow").materialize()

    def explode_prefix(b: pa.Table) -> pa.Table:
        ids, gs, szs = [], [], []
        for rid, grams_, sz in zip(b.column("_vid").to_pylist(),
                                   b.column("_pg").to_pylist(),
                                   b.column("_sz").to_pylist()):
            for g in grams_:
                ids.append(rid)
                gs.append(g)
                szs.append(sz)
        return pa.table({"gram": pa.array(gs, pa.int64()),
                         "left": pa.array(ids, pa.string()),
                         "lsz": pa.array(szs, pa.int64())})

    pref = doc_table.map_batches(explode_prefix, batch_format="pyarrow")
    rhs = pref.rename_columns({"left": "right", "lsz": "rsz"})
    # co-group self-join: prefix rows can leave whole blocks empty on
    # small corpora (all-singleton prefixes) — see util.cogroup_join
    from elevant_ray.stages.util import cogroup_join

    cand = cogroup_join(
        pref, rhs, on="gram", num_partitions=num_partitions,
        left_schema=pa.schema([("gram", pa.int64()), ("left", pa.string()),
                               ("lsz", pa.int64())]),
        right_schema=pa.schema([("gram", pa.int64()), ("right", pa.string()),
                                ("rsz", pa.int64())]))

    def orient(b: pa.Table) -> pa.Table:
        # PPJoin length filter: J ≥ t ⇒ |∩| ≥ t·max(|A|,|B|) and
        # |∩| ≤ min ⇒ min/max ≥ t — prunes size-mismatched candidates
        # before the distinct shuffle; then local per-batch dedupe
        keep = pc.and_(
            pc.less(b.column("left"), b.column("right")),
            pc.greater_equal(
                pc.min_element_wise(b.column("lsz"), b.column("rsz")),
                pc.multiply(pc.max_element_wise(b.column("lsz"),
                                                b.column("rsz")),
                            pa.scalar(float(threshold)))))
        t = b.filter(keep).select(["left", "right"])
        return t.group_by(["left", "right"]).aggregate([])

    cand = cand.map_batches(orient, batch_format="pyarrow")

    if verify == "auto":
        # broadcast verification needs every doc's gram-hash blob in one
        # object-store dict: fine into the GBs, join-side beyond
        verify = ("broadcast"
                  if doc_table.size_bytes() <= _scale_cutoff(64 << 20)
                  else "join")

    if verify == "broadcast":
        # candidate pairs keep only ids; both hash blobs come from the
        # broadcast dict inside the verify map — no distinct shuffle
        # (duplicate candidates from multi-gram prefixes re-verify in
        # ~10µs; the global dedupe runs on the tiny ≥threshold output)
        blob_rows = doc_table.select_columns(["_vid", "_hs"]).take_all()
        blobs_ref = ray.put({r["_vid"]: r["_hs"] for r in blob_rows})

        def verify_b(batch: pa.Table) -> pa.Table:
            from elevant_ray.stages.util import cached_get
            blobs = cached_get(blobs_ref)
            lefts, rights, js = [], [], []
            for left, right in zip(batch.column("left").to_pylist(),
                                   batch.column("right").to_pylist()):
                hl = np.frombuffer(blobs[left], dtype=np.int64)
                hr = np.frombuffer(blobs[right], dtype=np.int64)
                inter = len(np.intersect1d(hl, hr, assume_unique=True))
                j = inter / (len(hl) + len(hr) - inter)
                if j >= threshold:
                    lefts.append(left)
                    rights.append(right)
                    js.append(round(j, 6))
            return pa.table({"left": pa.array(lefts, pa.string()),
                             "right": pa.array(rights, pa.string()),
                             "jac": pa.array(js, pa.float64())})

        verified = cand.map_batches(verify_b, batch_format="pyarrow")
        from ray.data.aggregate import Max

        out = verified.groupby(["left", "right"]).aggregate(
            Max("jac", alias_name="jac"))
        return pin_schema(out, pa.schema([
            ("left", pa.string()), ("right", pa.string()),
            ("jac", pa.float64())]))

    cand = distinct_pairs(cand)

    # verify joins as co-groups (Ray's Dataset.join flakes on sparse
    # inputs — see util.cogroup_join)
    from elevant_ray.stages.util import as_arrow, cogroup_join

    doc_sets = doc_table.select_columns(["_vid", "_hs"])
    lhs_sets = doc_sets.rename_columns({"_vid": "left", "_hs": "hs_l"})
    rhs_sets = doc_sets.rename_columns({"_vid": "right", "_hs": "hs_r"})
    pair_schema = pa.schema([("left", pa.string()),
                             ("right", pa.string())])
    sets_schema_l = pa.schema([("left", pa.string()), ("hs_l", pa.binary())])
    sets_schema_r = pa.schema([("right", pa.string()), ("hs_r", pa.binary())])
    withl_schema = pa.schema([("left", pa.string()), ("right", pa.string()),
                              ("hs_l", pa.binary())])
    withl = as_arrow(cogroup_join(cand, lhs_sets, on="left",
                                  num_partitions=num_partitions,
                                  left_schema=pair_schema,
                                  right_schema=sets_schema_l))
    withb = as_arrow(cogroup_join(withl, rhs_sets, on="right",
                                  num_partitions=num_partitions,
                                  left_schema=withl_schema,
                                  right_schema=sets_schema_r))

    def jac(batch: pa.Table) -> pa.Table:
        lefts, rights, js = [], [], []
        for left, right, hb_l, hb_r in zip(batch.column("left").to_pylist(),
                                           batch.column("right").to_pylist(),
                                           batch.column("hs_l").to_pylist(),
                                           batch.column("hs_r").to_pylist()):
            hl = np.frombuffer(hb_l, dtype=np.int64)
            hr = np.frombuffer(hb_r, dtype=np.int64)
            inter = len(np.intersect1d(hl, hr, assume_unique=True))
            j = inter / (len(hl) + len(hr) - inter)
            if j >= threshold:
                lefts.append(left)
                rights.append(right)
                js.append(round(j, 6))
        return pa.table({"left": pa.array(lefts, pa.string()),
                         "right": pa.array(rights, pa.string()),
                         "jac": pa.array(js, pa.float64())})

    return pin_schema(withb, pa.schema([
        ("left", pa.string()), ("right", pa.string()),
        ("hs_l", pa.binary()), ("hs_r", pa.binary()),
    ])).map_batches(jac, batch_format="pyarrow")


def distinct_pairs(pairs):
    """Distinct (left, right) via hash aggregate — vectorized shuffle,
    no per-group Python (a pair hit by 32 LSH bands arrives 32×).
    Output schema is pinned: this feeds the verify joins."""
    from ray.data.aggregate import Count

    from elevant_ray.stages.util import pin_schema

    out = pairs.groupby(["left", "right"]).aggregate(
        Count(alias_name="_n"))
    return pin_schema(out, pa.schema([("left", pa.string()),
                                      ("right", pa.string())]))


def ngram_containment_pairs(ds, id_col: str, text_col: str = "text",
                            n: int = 3, threshold: float = 0.6,
                            num_partitions: int = 16):
    """EXACT max-containment pairs: C(A,B) = |∩| / min(|A|,|B|) ≥ t —
    the asymmetric near-dup predicate that catches subset duplication
    (a quote or boilerplate block inside a larger page) which Jaccard's
    union denominator dilutes below any usable threshold.

    One-sided prefix filter (asymmetric AllPairs bound): |∩| ≥ t·min
    implies the SMALLER doc shares a gram inside its rarest-first
    prefix of |G| − ceil(t·|G|) + 1 grams, so probing PREFIX ×
    ALL-GRAMS keeps recall exactly 1.0.  Unlike the Jaccard join there
    is no size-ratio prune (containment admits any size gap), and the
    index side carries every non-singleton gram — hot grams are only
    pruned on the probe side, so corpora with heavy boilerplate should
    pre-strip it (or df-cap the index) before this join; the candidate
    count is Σ_g prefix_g · df_g.

    Verification is broadcast-side (one ray.put of the gram-hash blob
    dict, candidates re-verified in-place); beyond the broadcast cutoff
    use the same two co-group joins as ngram_jaccard_pairs — semantics
    identical.

    Sub-cutoff inputs run the identical exact algorithm in process
    (same doc-frequency floor, same rarest-first prefix, same
    intersect verify) — the pair set is path-independent because the
    algorithm is exact, and the conformance suite forces the
    distributed path via ELEVANT_RAY_BROADCAST_CUTOFF=0."""
    import math
    from collections import Counter

    import ray

    from elevant_ray.stages.util import cogroup_join, pin_schema, scale_cutoff

    ds = ds.materialize()
    # 8 MB gate (was 512 KB when the twin verified candidates with a
    # per-pair Python loop): the twin's sort+unique co-occurrence count
    # is all-C, so it now beats the ~6-execution distributed DAG well
    # past sf0.1.  The twin bails out (None) when the co-occurrence
    # volume explodes (df-heavy boilerplate) — the distributed path's
    # probe-side prefix prune handles that regime.
    if ds.size_bytes() <= scale_cutoff(8 << 20):
        out = _ngram_containment_inprocess(ds, id_col, text_col, n,
                                           threshold)
        if out is not None:
            return out

    def gram_partials(batch: pa.Table) -> pa.Table:
        parts = [_gram_hashes(text, n) for text
                 in batch.column(text_col).to_pylist()]
        allg = (np.concatenate(parts) if parts
                else np.array([], np.int64))
        u, c = np.unique(allg, return_counts=True)
        return pa.table({"gram": pa.array(u, pa.int64()),
                         "partial": pa.array(c.astype(np.int64),
                                             pa.int64())})

    # vectorized driver merge (concat + unique + bincount), NOT a
    # per-gram Python Counter — the Counter form cost seconds of
    # serial driver time on ~1M gram partials (the same Amdahl tax the
    # LSH sampler paid before round 2)
    _gs, _cs = [], []
    for b in ds.map_batches(gram_partials, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        _gs.append(b.column("gram").to_numpy(zero_copy_only=False))
        _cs.append(b.column("partial").to_numpy(zero_copy_only=False))
    if _gs:
        _g_all = np.concatenate(_gs)
        _uniq, _inv = np.unique(_g_all, return_inverse=True)
        _tot = np.bincount(_inv, weights=np.concatenate(_cs)) \
            .astype(np.int64)
        _keep = _tot >= 2
        freq = dict(zip(_uniq[_keep].tolist(), _tot[_keep].tolist()))
    else:
        freq = {}
    freq_ref = ray.put(freq)

    def doc_pass(batch: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get
        fr = cached_get(freq_ref)
        ids, blobs, pgrams, agrams, sizes = [], [], [], [], []
        for rid, text in zip(batch.column(id_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            ghs = _gram_hashes(text, n)
            shared = [g for g in ghs.tolist() if g in fr]
            gset = sorted(shared, key=lambda g: (fr[g], g))
            k = len(ghs) - math.ceil(threshold * len(ghs)) + 1
            pgrams.append(gset[:k])
            agrams.append(shared)
            sizes.append(len(ghs))
            ids.append(str(rid))
            blobs.append(ghs.tobytes())
        return pa.table({"_vid": pa.array(ids, pa.string()),
                         "_hs": pa.array(blobs, pa.binary()),
                         "_pg": pa.array(pgrams, pa.list_(pa.int64())),
                         "_ag": pa.array(agrams, pa.list_(pa.int64())),
                         "_sz": pa.array(sizes, pa.int64())})

    doc_table = ds.map_batches(doc_pass, batch_format="pyarrow").materialize()

    def explode(col_list, col_id):
        def f(b: pa.Table) -> pa.Table:
            ids, gs = [], []
            for rid, grams_ in zip(b.column("_vid").to_pylist(),
                                   b.column(col_list).to_pylist()):
                for g in grams_:
                    ids.append(rid)
                    gs.append(g)
            return pa.table({"gram": pa.array(gs, pa.int64()),
                             col_id: pa.array(ids, pa.string())})
        return f

    probe = doc_table.map_batches(explode("_pg", "left"),
                                  batch_format="pyarrow")
    index = doc_table.map_batches(explode("_ag", "right"),
                                  batch_format="pyarrow")
    cand = cogroup_join(
        probe, index, on="gram", num_partitions=num_partitions,
        left_schema=pa.schema([("gram", pa.int64()),
                               ("left", pa.string())]),
        right_schema=pa.schema([("gram", pa.int64()),
                                ("right", pa.string())]))

    def orient(b: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(b.column("left"), b.column("right"))
        hi = pc.max_element_wise(b.column("left"), b.column("right"))
        t = pa.table({"left": lo, "right": hi}) \
            .filter(pc.not_equal(lo, hi))
        return t.group_by(["left", "right"]).aggregate([])

    cand = distinct_pairs(cand.map_batches(orient, batch_format="pyarrow"))

    blob_rows = doc_table.select_columns(["_vid", "_hs"]).take_all()
    blobs_ref = ray.put({r["_vid"]: r["_hs"] for r in blob_rows})

    def verify_b(batch: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get
        blobs = cached_get(blobs_ref)
        lefts, rights, cs = [], [], []
        for left, right in zip(batch.column("left").to_pylist(),
                               batch.column("right").to_pylist()):
            hl = np.frombuffer(blobs[left], dtype=np.int64)
            hr = np.frombuffer(blobs[right], dtype=np.int64)
            mn = min(len(hl), len(hr))
            if mn == 0:
                continue
            inter = len(np.intersect1d(hl, hr, assume_unique=True))
            c = inter / mn
            if c >= threshold:
                lefts.append(left)
                rights.append(right)
                cs.append(round(c, 6))
        return pa.table({"left": pa.array(lefts, pa.string()),
                         "right": pa.array(rights, pa.string()),
                         "cont": pa.array(cs, pa.float64())})

    out = cand.map_batches(verify_b, batch_format="pyarrow")
    return pin_schema(out, pa.schema([
        ("left", pa.string()), ("right", pa.string()),
        ("cont", pa.float64())]))


def canopy_blocks(ds, id_col: str, text_col: str,
                  t1: float = 0.3, t2: float = 0.6,
                  buckets: int = 64):
    """Canopy clustering (McCallum/Nigam/Ungar, KDD 2000): cheap
    token-Jaccard canopies as an ER blocking stage — the loose
    threshold ``t1`` admits points into a canopy (possibly several),
    the tight threshold ``t2`` removes them from the candidate pool
    so they can never found another canopy.

    Distributed form: each doc is keyed by its MINIMUM token hash (a
    1-band minhash — two docs at token-Jaccard j share the key with
    probability j, so the near-identical pairs canopy blocking exists
    for almost always co-locate), then ONE hash exchange groups the
    keys into ``buckets`` partitions and canopies form per partition.
    The canonical per-partition invariants hold exactly; key-splitting
    losses are the standard MapReduce-canopy approximation and are
    left to the downstream pairwise scorer.  Within a partition the
    scan is deterministic: points are visited in ascending ``id_col``
    order, candidate overlap comes from a token inverted index (only
    points sharing ≥1 token are ever compared — Jaccard < t1 pairs
    with zero shared tokens are skipped for free).

    Reference parity: ELEVANT blocks candidates by exact alias keys
    (src/elevant/models/entity_database.py:264-274); canopies are the
    fuzzy-key generalization used when no exact key exists.

    Returns Dataset(center, member, jac) — one row per canopy
    membership (members may repeat across canopies, per the
    algorithm; every point appears as its own canopy's first member
    when it becomes a center)."""
    import zlib

    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, pin_schema

    def add_key(b: pa.Table) -> pa.Table:
        keys = []
        for t in b.column(text_col).to_pylist():
            toks = set(str(t).lower().split()) if t is not None else set()
            keys.append(min((zlib.crc32(w.encode("utf-8"))
                             for w in toks), default=0))
        return pa.table({id_col: b.column(id_col),
                         text_col: b.column(text_col),
                         "ckey": pa.array(keys, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        toksets = [frozenset(str(t).lower().split())
                   for t in g[text_col].tolist()]
        inv: dict = {}
        for i, ts in enumerate(toksets):
            for t in ts:
                inv.setdefault(t, []).append(i)
        alive = [True] * len(ids)
        rows = []
        for i in range(len(ids)):
            if not alive[i]:
                continue
            alive[i] = False
            rows.append((ids[i], ids[i], 1.0))
            seen = set()
            for t in toksets[i]:
                for j in inv[t]:
                    if j <= i or not alive[j] or j in seen:
                        continue
                    seen.add(j)
                    a, b = toksets[i], toksets[j]
                    inter = len(a & b)
                    jac = inter / (len(a) + len(b) - inter)
                    if jac >= t1:
                        rows.append((ids[i], ids[j], round(jac, 6)))
                        if jac >= t2:
                            alive[j] = False
        return pd.DataFrame(rows, columns=["center", "member", "jac"])

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    out = bucketed_group_apply(keyed, "ckey", per_bucket, buckets=buckets)
    return pin_schema(out, pa.schema([
        ("center", pa.int64()), ("member", pa.int64()),
        ("jac", pa.float64())]))
