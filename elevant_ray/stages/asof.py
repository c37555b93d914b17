"""Distributed as-of join (most-recent-match per key).

Ray Data has no as-of join; the engine composes one from primitives the
way SURVEY.md §2 prescribes for missing operators: align the two sides
to a common schema with a side tag, union them, hash-partition by
``crc-bucket(key) % buckets`` via ``groupby("bkt")`` — NOT by the raw
key, which would pay a Python ``map_groups`` call per key — and merge
each bucket (many keys at once) with a single vectorized
``pandas.merge_asof(by=key)``.  One shuffle total, no driver-side data.

Partitioning assumption: one bucket (all left+right rows whose key
hashes to it) fits in a worker's heap; raise ``buckets`` to shrink
them.  For a single skewed key, pre-split it by time range and re-join
the boundary row — not needed for the test corpora.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa


from elevant_ray.stages.util import hash_bucket_array as _bucket_of


def asof_join(left, right, key: str, left_ts: str, right_ts: str,
              left_cols: List[str], right_cols: List[str],
              num_partitions: int = 8, buckets: int = 64):
    """For every left row, attach the columns of the right row with the
    largest ``right_ts`` <= ``left_ts`` within the same ``key`` group
    (left join semantics: unmatched left rows keep nulls).

    ``left_cols`` / ``right_cols``: payload columns to carry through
    (disjoint names; rename upstream if needed).  Returns a Dataset with
    columns ``[key] + left_cols + right_cols`` (key deduplicated).
    """
    lc = [c for c in left_cols if c != key]
    rc = [c for c in right_cols if c != key]
    ls, rs = left.schema(), right.schema()
    if ls is None or rs is None:
        # empty input left schema-less blocks: nothing to join
        import pyarrow as _pa
        import ray.data as rd

        return rd.from_arrow(_pa.table({}))
    left_schema = ls.base_schema
    right_schema = rs.base_schema

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {key: b.column(key), "__ts": b.column(left_ts),
                "bkt": _bucket_of(b.column(key), buckets),
                "__side": pa.array([1] * b.num_rows, pa.int8())}
        for c in lc:
            cols[c] = b.column(c)
        for c in rc:
            cols[c] = pa.nulls(b.num_rows, right_schema.field(c).type)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {key: b.column(key), "__ts": b.column(right_ts),
                "bkt": _bucket_of(b.column(key), buckets),
                "__side": pa.array([0] * b.num_rows, pa.int8())}
        for c in lc:
            cols[c] = pa.nulls(b.num_rows, left_schema.field(c).type)
        for c in rc:
            cols[c] = b.column(c)
        return pa.table(cols)

    tagged = (left.map_batches(tag_left, batch_format="pyarrow")
              .union(right.map_batches(tag_right, batch_format="pyarrow")))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket = many keys; a single C-level merge_asof handles
        # them all via by=key (vs. one Python call per key group)
        l = g[g["__side"] == 1]
        r = g[g["__side"] == 0]
        if len(r) == 0:
            out = l[[key] + lc].copy().reset_index(drop=True)
            for c in rc:
                out[c] = _all_null_series(len(l), g[c].dtype)
            return out
        l = l.sort_values("__ts", kind="stable")
        r = r.sort_values("__ts", kind="stable")
        merged = pd.merge_asof(
            l[[key, "__ts"] + lc], r[[key, "__ts"] + rc],
            on="__ts", by=key, direction="backward")
        out = merged[[key] + lc].copy()
        for c in rc:
            s = merged[c]
            if s.dtype.kind in "iu" or (
                    s.dtype.kind == "f"
                    and r[c].dtype.kind in "iu"):
                # nullable int so misses become NA, not a silent float cast
                s = s.astype("Int64")
            out[c] = s
        return out.reset_index(drop=True)

    return tagged.groupby("bkt").map_groups(merge, batch_format="pandas")


def _all_null_series(n: int, dtype) -> pd.Series:
    if getattr(dtype, "kind", None) in "iu":
        return pd.Series([pd.NA] * n, dtype="Int64")
    return pd.Series([None] * n, dtype=dtype)
