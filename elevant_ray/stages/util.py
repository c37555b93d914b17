"""Small shared stage helpers."""

from __future__ import annotations


def as_arrow(ds):
    """Coerce a Dataset's blocks to Arrow format.

    ``map_groups(batch_format="pandas")`` leaves pandas blocks behind;
    several downstream ops (rename_columns, hash joins) expect Arrow
    blocks.  An identity map_batches with batch_format="pyarrow" converts
    once, streaming."""
    return ds.map_batches(lambda b: b, batch_format="pyarrow")


def partial_group_agg(ds, keys, sum_cols=(), count_alias=None,
                      max_cols=(), min_cols=(), num_partitions=None,
                      combine: str = "dataset"):
    """Two-phase grouped aggregation: per-batch Arrow ``group_by``
    partials (C++-vectorized, no shuffle) + a tiny global groupby over
    ≤ batches × groups partial rows.

    This is the canonical low-cardinality-aggregate pattern (SURVEY.md
    §2.6 "per-batch partial counts → tree-reduce"): the full-table hash
    shuffle is replaced by one that only moves the partials.  Use when
    group count ≪ row count; for high-cardinality keys a plain
    ``groupby().aggregate()`` moves less data.

    Output columns: keys + sum_cols (same names) + `count_alias` +
    max/min cols (same names).  Means: sum + count here, divide after.
    ``combine="driver"`` returns a pandas DataFrame combined on the
    driver (use ONLY for hard-bounded group counts); ``"dataset"``
    keeps the combine distributed and returns a Dataset.
    """
    import pyarrow as pa

    from ray.data.aggregate import Max, Min, Sum

    keys = list(keys)
    aggs = [(c, "sum") for c in sum_cols] + \
        [(c, "max") for c in max_cols] + [(c, "min") for c in min_cols]
    if count_alias:
        aggs.append(([*keys][0], "count"))

    def partial(b: pa.Table) -> pa.Table:
        t = b.group_by(keys).aggregate(aggs)
        renames = {f"{c}_sum": c for c in sum_cols}
        renames.update({f"{c}_max": c for c in max_cols})
        renames.update({f"{c}_min": c for c in min_cols})
        if count_alias:
            renames[f"{keys[0]}_count"] = count_alias
        return t.rename_columns(
            [renames.get(n, n) for n in t.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if combine == "driver":
        # hard-bounded group count ⇒ the partial table is tiny
        # (≤ batches × groups rows): stream it to the driver and combine
        # with one pandas groupby — skips a whole Ray all-to-all op whose
        # fixed latency (~2.5s) dwarfs the data.  This is the evaluation
        # counters' tree-reduce shape (SURVEY.md §2.6), not a driver loop
        # over the input.
        import pandas as pd

        parts = [b.to_pandas() for b in
                 partials.iter_batches(batch_format="pyarrow")]
        allp = pd.concat(parts, ignore_index=True) if parts else None
        if allp is None or allp.empty:
            return allp
        spec = {c: "sum" for c in sum_cols}
        spec.update({c: "max" for c in max_cols})
        spec.update({c: "min" for c in min_cols})
        if count_alias:
            spec[count_alias] = "sum"
        return (allp.groupby(keys, as_index=False).agg(spec)
                .sort_values(keys).reset_index(drop=True))
    final_aggs = [Sum(c, alias_name=c) for c in sum_cols]
    final_aggs += [Max(c, alias_name=c) for c in max_cols]
    final_aggs += [Min(c, alias_name=c) for c in min_cols]
    if count_alias:
        final_aggs.append(Sum(count_alias, alias_name=count_alias))
    gb = (partials.groupby(keys, num_partitions=num_partitions)
          if num_partitions else partials.groupby(keys))
    return gb.aggregate(*final_aggs)


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
