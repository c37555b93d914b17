"""JSONL benchmark/article source + sink.

The reference's interchange format is one JSON article per line with
optional nested label structs (`OurJsonlBenchmarkReader`,
src/elevant/benchmark_readers/our_jsonl_benchmark_reader.py:10-23;
writer at add_benchmark.py:50-68).  The engine keeps Parquet as the
production format but supports the same JSONL shape for interop:
``write_articles_jsonl`` emits one JSON object per row via the
distributed ``write_json`` sink, and ``read_articles_jsonl`` parses it
back with an explicit Arrow schema so optional/absent nested fields
(sparse JSON, article.py:40-59) land as typed nulls instead of
inference-dependent types.
"""

from __future__ import annotations

import pyarrow as pa

# the benchmark-article schema: spans are int32 offsets into `text`
# (SURVEY.md §1.3); labels mirror GroundtruthLabel's core fields
LABEL_TYPE = pa.struct([
    ("id", pa.int32()),
    ("begin", pa.int32()),
    ("end", pa.int32()),
    ("entity_id", pa.string()),
    ("name", pa.string()),
    ("parent", pa.int32()),
    ("optional", pa.bool_()),
    ("type", pa.string()),
])

ARTICLE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("title", pa.string()),
    ("text", pa.string()),
    ("labels", pa.list_(LABEL_TYPE)),
])


def write_articles_jsonl(ds, path: str) -> None:
    """Distributed JSONL sink: one file per block, one article per line."""
    ds.write_json(path)


def read_articles_jsonl(path: str):
    """JSONL → articles Dataset with the canonical schema.  Missing
    optional fields default like the reference reader
    (article.py:144-162): absent labels → empty list, absent title →
    null."""
    import ray.data as rd

    ds = rd.read_json(path)

    def normalize(batch: pa.Table) -> pa.Table:
        cols = {}
        n = batch.num_rows
        names = set(batch.column_names)
        for field in ARTICLE_SCHEMA:
            if field.name not in names:
                if field.name == "labels":
                    cols[field.name] = pa.array([[]] * n, field.type)
                else:
                    cols[field.name] = pa.nulls(n, field.type)
                continue
            cols[field.name] = batch.column(field.name).cast(field.type)
        return pa.table(cols)

    return ds.map_batches(normalize, batch_format="pyarrow")
