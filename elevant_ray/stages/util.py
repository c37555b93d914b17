"""Small shared stage helpers."""

from __future__ import annotations


def as_arrow(ds):
    """Coerce a Dataset's blocks to Arrow format.

    ``map_groups(batch_format="pandas")`` leaves pandas blocks behind;
    several downstream ops (rename_columns, hash joins) expect Arrow
    blocks.  An identity map_batches with batch_format="pyarrow" converts
    once, streaming."""
    return ds.map_batches(lambda b: b, batch_format="pyarrow")
