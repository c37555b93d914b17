"""Small shared stage helpers."""

from __future__ import annotations


def as_arrow(ds):
    """Coerce a Dataset's blocks to Arrow format.

    ``map_groups(batch_format="pandas")`` leaves pandas blocks behind;
    several downstream ops (rename_columns, hash joins) expect Arrow
    blocks.  An identity map_batches with batch_format="pyarrow" converts
    once, streaming."""
    return ds.map_batches(lambda b: b, batch_format="pyarrow")


def pin_schema(ds, schema):
    """Pin every block (empty included) to `schema`.

    Hash-shuffle groupby/aggregate operators emit SCHEMA-LESS empty
    blocks for empty shuffle partitions; a downstream ``Dataset.join``
    then fails resolving its key fields ("No match or multiple matches
    for key field reference").  Any groupby output that feeds a join
    must pass through here."""
    import pyarrow as pa

    def f(b: "pa.Table") -> "pa.Table":
        if b.num_columns == 0:
            return schema.empty_table()
        return b.select(schema.names).cast(schema)

    return ds.map_batches(f, batch_format="pyarrow")
