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
    (`order_col`, then all-column lexicographic) — deterministic under
    any partitioning.  One shuffle on `key`."""
    def first(group: pd.DataFrame) -> pd.DataFrame:
        # secondary sort on scalar columns only (list columns are
        # unhashable); kind="stable" keeps determinism
        scalar_cols = [c for c in group.columns
                       if c != order_col and group[c].dtype != object]
        return group.sort_values([order_col] + scalar_cols,
                                 kind="stable").head(1)

    from elevant_ray.stages.util import as_arrow

    return as_arrow(ds.groupby(key).map_groups(first, batch_format="pandas"))


def dedup_exact_text(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Content-exact dedup by normalized-text md5; keeps min id per group
    (hash-partition + per-group first — SURVEY §2.7)."""
    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [md5_fingerprint(t) for t in batch.column(text_col).to_pylist()]
        return batch.append_column("fingerprint", pa.array(fps, pa.string()))

    with_fp = ds.map_batches(add_fp, batch_format="pyarrow")

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1)

    return with_fp.groupby("fingerprint").map_groups(first, batch_format="pandas")


def add_minhash_columns(batch: pa.Table, text_col: str = "text",
                        num_perm: int = 128, bands: int = 32,
                        shingle_k: int = 5,
                        short_doc_tokens: int = 60) -> pa.Table:
    """Append `band_key` list column (LSH keys) per row.

    Two candidate channels (see tests/test_dedup.py for the recall math):
    - minhash band keys (num_perm=128, 32 bands × 4 rows): catches
      near-dups of long documents (shingle-Jaccard ≳ 0.6);
    - for SHORT documents (< `short_doc_tokens` unigrams) band
      probability degrades, so every raw shingle hash is emitted as its
      own key — bounded extra keys, restores recall for 1-token edits on
      10-token docs.
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
                        max_block: int = 64, **minhash_kwargs):
    """pages → distinct candidate pairs (left < right) from shared LSH keys.

    Explodes (band_key, id), groups by key, emits all pairs per block.
    Blocks larger than `max_block` are broken into a sorted-adjacent
    chain (skew guard — connectivity preserved for CC, quadratic blowup
    avoided; the cap is logged via the `capped` column).  Final
    distinct-pair dedup is one groupby on (left, right).
    """
    with_keys = ds.map_batches(
        lambda b: add_minhash_columns(b, text_col=text_col, **minhash_kwargs),
        batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        ids, keys = [], []
        for rid, ks in zip(batch.column(id_col).to_pylist(),
                           batch.column("band_key").to_pylist()):
            for k in ks:
                ids.append(rid)
                keys.append(k)
        return pa.table({"band_key": pa.array(keys, pa.string()),
                         id_col: pa.array(ids, batch.column(id_col).type)})

    exploded = with_keys.map_batches(explode, batch_format="pyarrow")

    def pairs_of_block(group: pd.DataFrame) -> pd.DataFrame:
        members = sorted(group[id_col].unique())
        left, right = [], []
        if len(members) <= max_block:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    left.append(members[i])
                    right.append(members[j])
        else:
            # skew guard for hot keys: star-to-min + adjacent chain.
            # The star keeps the (verified) component diameter at 2 so
            # hash-min CC converges in O(1) rounds even for huge dup
            # groups; the chain is a fallback path when the hub pair
            # fails verification but neighbors match.
            hub = members[0]
            for b in members[1:]:
                left.append(hub)
                right.append(b)
            for a, b in zip(members[1:], members[2:]):
                left.append(a)
                right.append(b)
        return pd.DataFrame({"left": left, "right": right})

    pairs = exploded.groupby("band_key").map_groups(
        pairs_of_block, batch_format="pandas")

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    from elevant_ray.stages.util import as_arrow

    return as_arrow(pairs.groupby(["left", "right"]).map_groups(
        dedup_pairs, batch_format="pandas"))
