"""Prediction ↔ article alignment without ordering assumptions.

The reference pairs external-linker output with benchmark articles
either by stream position (order-zip, ``evaluate.py:72-77`` /
``abstract_prediction_reader.py:141-144``) or by the first 100 chars of
the article text (``abstract_prediction_reader.py:90-130``,
``api_linker.py:26-36``).  Order-zip is meaningless under distributed
execution, so the engine's primary alignment is an equi-join on
``doc_id``; this module provides the TEXT-PREFIX fallback for prediction
files that carry no ids — as a hash-bucketed co-group (tagged union +
one ``groupby`` shuffle + vectorized in-bucket pandas merge; no
``Dataset.join``, which loses block schemas on empty shuffle
partitions).

Collisions (two articles sharing a prefix — the reference only warns,
``api_linker.py:106-108``) are resolved deterministically: the article
with the smallest ``doc_id`` wins, and the output carries a
``prefix_collisions`` count per row so callers can gate on it.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

PREFIX_LEN = 100
_BUCKETS = 64


def _bucket_of(keys) -> pa.Array:
    return pa.array([zlib.crc32(k.encode("utf-8")) % _BUCKETS for k in keys],
                    pa.int32())


def align_predictions_by_text(articles, predictions,
                              prefix_len: int = PREFIX_LEN,
                              num_partitions: int = 8,
                              pred_schema: pa.Schema = None):
    """articles(doc_id, text, …) ⟕ predictions(text, …payload) on
    ``text[:prefix_len]`` → Dataset(doc_id, prefix_collisions,
    …prediction payload) — one row per matched prediction.

    Pass ``pred_schema`` when it is statically known: ``ds.schema()``
    on a lazy lineage triggers a sampling execution, and on a fully
    empty input it returns None (schema-less empty blocks)."""
    if pred_schema is None:
        s = predictions.schema()
        if s is None:
            import ray.data as rd

            return rd.from_arrow(pa.table({
                "doc_id": pa.array([], pa.int64()),
                "prefix_collisions": pa.array([], pa.int64())}))
        pred_schema = s.base_schema
    payload = [c for c in pred_schema.names if c != "text"]

    def tag_article(b: pa.Table) -> pa.Table:
        prefixes = [t[:prefix_len] for t in b.column("text").to_pylist()]
        cols = {"bkt": _bucket_of(prefixes),
                "prefix": pa.array(prefixes, pa.string()),
                "side": pa.array([0] * b.num_rows, pa.int8()),
                "doc_id": b.column("doc_id")}
        for c in payload:
            cols[c] = pa.nulls(b.num_rows, pred_schema.field(c).type)
        return pa.table(cols)

    def tag_prediction(b: pa.Table) -> pa.Table:
        prefixes = [t[:prefix_len] for t in b.column("text").to_pylist()]
        cols = {"bkt": _bucket_of(prefixes),
                "prefix": pa.array(prefixes, pa.string()),
                "side": pa.array([1] * b.num_rows, pa.int8()),
                "doc_id": pa.nulls(b.num_rows, pa.int64())}
        for c in payload:
            cols[c] = b.column(c)
        return pa.table(cols)

    combined = (articles.map_batches(tag_article, batch_format="pyarrow")
                .union(predictions.map_batches(tag_prediction,
                                               batch_format="pyarrow")))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        art = g[g["side"] == 0]
        pred = g[g["side"] == 1]
        out_cols = ["doc_id", "prefix_collisions"] + payload
        if art.empty or pred.empty:
            return pd.DataFrame({c: [] for c in out_cols})
        # deterministic collision resolution: min doc_id per prefix
        counts = art.groupby("prefix")["doc_id"].agg(["min", "count"])
        counts.columns = ["doc_id", "prefix_collisions"]
        m = pred[["prefix"] + payload].merge(
            counts.reset_index(), on="prefix", how="inner")
        return m[out_cols].reset_index(drop=True)

    return combined.groupby("bkt", num_partitions=num_partitions) \
        .map_groups(merge, batch_format="pandas")
