"""Distributed as-of join (most-recent-match per key).

Ray Data has no as-of join; the engine composes one from primitives the
way SURVEY.md §2 prescribes for missing operators: align the two sides
to a common schema with a side tag, union them, hash-partition by the
equi-key via ``groupby(key)``, and merge within each group with a
vectorized ``searchsorted`` — one shuffle total, no driver-side data.

Partitioning assumption: one key group (all left+right rows of one key)
fits in a worker's heap.  For skewed keys, pre-split hot keys by time
range and re-join the boundary row — not needed for the test corpora.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(left, right, key: str, left_ts: str, right_ts: str,
              left_cols: List[str], right_cols: List[str],
              num_partitions: int = 8):
    """For every left row, attach the columns of the right row with the
    largest ``right_ts`` <= ``left_ts`` within the same ``key`` group
    (left join semantics: unmatched left rows keep nulls).

    ``left_cols`` / ``right_cols``: payload columns to carry through
    (disjoint names; rename upstream if needed).  Returns a Dataset with
    columns ``[key] + left_cols + right_cols`` (key deduplicated).
    """
    lc = [c for c in left_cols if c != key]
    rc = [c for c in right_cols if c != key]
    left_schema = left.schema().base_schema
    right_schema = right.schema().base_schema

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {key: b.column(key), "__ts": b.column(left_ts),
                "__side": pa.array([1] * b.num_rows, pa.int8())}
        for c in lc:
            cols[c] = b.column(c)
        for c in rc:
            cols[c] = pa.nulls(b.num_rows, right_schema.field(c).type)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {key: b.column(key), "__ts": b.column(right_ts),
                "__side": pa.array([0] * b.num_rows, pa.int8())}
        for c in lc:
            cols[c] = pa.nulls(b.num_rows, left_schema.field(c).type)
        for c in rc:
            cols[c] = b.column(c)
        return pa.table(cols)

    tagged = (left.map_batches(tag_left, batch_format="pyarrow")
              .union(right.map_batches(tag_right, batch_format="pyarrow")))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 1].sort_values("__ts", kind="stable")
        r = g[g["__side"] == 0].sort_values("__ts", kind="stable")
        out = l[[key] + lc].copy().reset_index(drop=True)
        if len(r) == 0:
            for c in rc:
                out[c] = _all_null_series(len(l), g[c].dtype)
            return out
        idx = np.searchsorted(r["__ts"].values, l["__ts"].values,
                              side="right") - 1
        safe = np.clip(idx, 0, None)
        miss = idx < 0
        for c in rc:
            s = pd.Series(r[c].values[safe]).reset_index(drop=True)
            if s.dtype.kind in "iu":
                # nullable int so misses become NA, not a silent float cast
                s = s.astype("Int64")
            s[miss] = None
            out[c] = s
        return out

    return tagged.groupby(key).map_groups(merge, batch_format="pandas")


def _all_null_series(n: int, dtype) -> pd.Series:
    if getattr(dtype, "kind", None) in "iu":
        return pd.Series([pd.NA] * n, dtype="Int64")
    return pd.Series([None] * n, dtype=dtype)
