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

import pandas as pd
import pyarrow as pa

from elevant_ray.functions.minhash import (
    band_keys, minhash_signature, shingle_hashes, simhash64,
)
from elevant_ray.functions.tokens import md5_fingerprint


def dedup_first_by(ds, key: str, order_col: str):
    """Exact dedup: keep, per `key` group, the row with the smallest
    (`order_col`, then serialized-row lexicographic) — deterministic
    under any partitioning.

    Implemented as ONE vectorized hash aggregate: each row is packed
    into a sortable string ``zero-padded(order) + NUL + pickle(row)`` and
    reduced with the built-in ``Min`` — no per-group Python, no join-back
    (the packed min IS the winning row).  Scales as a plain combiner
    aggregate at 10^12 rows."""
    import base64
    import pickle

    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    schema = ds.schema()
    names = list(schema.names)
    arrow_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(schema.names, schema.types)])

    def pack(batch: pa.Table) -> pa.Table:
        order = batch.column(order_col)
        if pa.types.is_timestamp(order.type):
            order = pc.cast(order, pa.int64())
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

    winners = ds.map_batches(pack, batch_format="pyarrow") \
        .groupby(key).aggregate(Min("_packed", alias_name="_packed"))

    def unpack(batch: pa.Table) -> pa.Table:
        rows = []
        for s in batch.column("_packed").to_pylist():
            payload = s.split("\x00", 1)[1]
            vals = pickle.loads(base64.b64decode(payload))
            rows.append(dict(zip(names, vals)))
        return pa.Table.from_pylist(rows, schema=arrow_schema)

    return winners.map_batches(unpack, batch_format="pyarrow")


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

    keys_col: List[List[str]] = []
    for text in batch.column(text_col).to_pylist():
        sh = shingle_hashes(text, k=shingle_k)
        sig = minhash_signature(sh, num_perm=num_perm)
        keys = band_keys(sig, bands=bands)
        if len(unigrams(text)) < short_doc_tokens:
            keys += [f"s:{int(h):016x}" for h in sh]
        keys_col.append(keys)
    return batch.append_column("band_key", pa.array(keys_col, pa.list_(pa.string())))


def add_simhash_column(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column(
        "simhash", pa.array([h - (1 << 63) for h in hs], pa.int64()))  # signed view


def lsh_candidate_pairs(ds, id_col: str, text_col: str = "text",
                        max_block: int = 64, canon_col: str = None,
                        **minhash_kwargs):
    """pages → distinct candidate pairs (left < right) from shared
    blocking keys.

    Channels, all emitted by ONE map + ONE groupby (minimizing the
    shuffle count — each extra all-to-all costs a full exchange):
    - MinHash-LSH band keys over text shingles ("<band>:<hash>");
    - optionally, a canonical-url key ("c:<canon>") when `canon_col` is
      given — pages sharing a canonical url become candidates without
      any content similarity.

    Blocks larger than `max_block` are broken into a star + adjacent
    chain (skew guard — connectivity preserved for CC, quadratic blowup
    avoided).  Final distinct-pair dedup is one groupby on (left, right).
    """
    with_keys = ds.map_batches(
        lambda b: add_minhash_columns(b, text_col=text_col, **minhash_kwargs),
        batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
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

    exploded = with_keys.map_batches(explode, batch_format="pyarrow")

    # vectorized group-collect (hash aggregate) — NOT map_groups, whose
    # per-group pandas calls dominate when most LSH keys are singletons
    from ray.data.aggregate import Unique

    blocks = exploded.groupby("band_key").aggregate(
        Unique(on=id_col, alias_name="members"))

    def expand_blocks(batch: pa.Table) -> pa.Table:
        left, right = [], []
        for members in batch.column("members").to_pylist():
            ms = sorted(set(members))
            if len(ms) < 2:
                continue
            if len(ms) <= max_block:
                for i in range(len(ms)):
                    for j in range(i + 1, len(ms)):
                        left.append(ms[i])
                        right.append(ms[j])
            else:
                # skew guard for hot keys: star-to-min + adjacent chain.
                # The star keeps the (verified) component diameter at 2
                # so hash-min CC converges in O(1) rounds even for huge
                # dup groups; the chain is a fallback path when the hub
                # pair fails verification but neighbors match.
                hub = ms[0]
                for b in ms[1:]:
                    left.append(hub)
                    right.append(b)
                for a, b in zip(ms[1:], ms[2:]):
                    left.append(a)
                    right.append(b)
        return pa.table({"left": pa.array(left, pa.string()),
                         "right": pa.array(right, pa.string())})

    pairs = blocks.map_batches(expand_blocks, batch_format="pyarrow")
    return distinct_pairs(pairs)


def distinct_pairs(pairs):
    """Distinct (left, right) via hash aggregate — vectorized shuffle,
    no per-group Python (a pair hit by 32 LSH bands arrives 32×)."""
    from ray.data.aggregate import Count

    from elevant_ray.stages.util import as_arrow

    out = as_arrow(pairs.groupby(["left", "right"]).aggregate(
        Count(alias_name="_n")))
    return out.select_columns(["left", "right"])
