"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship record-linkage pipeline (blocking +
pairwise scoring + transitive clustering) on sf0.001 pages synthesized
from the documents table.  ``queries()`` exposes one callable per
implemented operator family (SURVEY.md §2); ``oracle_sql()`` provides
DuckDB-equivalent SQL for everything SQL-expressible (same column names,
same rounding).  Non-SQL-expressible pipelines (markup extraction,
MinHash blocking, clustering, ELEVANT evaluation) are registered without
oracle SQL → rows-only checks; their semantics are covered by the pytest
differential suite instead (tests/).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from elevant_ray.functions.tokens import DE_STOP, EN_STOP

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _read(sf_dir: str, table: str, columns=None):
    import os

    import ray.data as rd

    # ELEVANT_RAY_READ_BLOCKS forces multi-block reads on tiny test
    # inputs so per-batch-local assumptions (e.g. in-batch dedup that
    # must actually be global) can't hide behind a single-block read —
    # the scale-path conformance suite sets it alongside the
    # broadcast-cutoff override.
    blocks = os.environ.get("ELEVANT_RAY_READ_BLOCKS")
    kw = {"override_num_blocks": int(blocks)} if blocks else {}
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns,
                           **kw)


def _round_cols(ds, spec: dict):
    def f(batch: pa.Table) -> pa.Table:
        for col, nd in spec.items():
            idx = batch.column_names.index(col)
            batch = batch.set_column(
                idx, col, pc.round(batch.column(col), ndigits=nd))
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _distinct_int(ds, col: str, cutoff: int = None):
    """Distinct over one int column.  A Dataset ``groupby`` exists only
    to dedupe keys, at a fixed ~2.5 s exchange cost locally — under the
    cutoff the keys stream to the driver and dedupe with one np.unique
    (the result side of a set-op query is dimension-bounded); above it
    the distributed groupby runs."""
    from elevant_ray.stages.util import scale_cutoff

    m = ds.materialize()
    if m.size_bytes() > (cutoff if cutoff is not None
                         else scale_cutoff(256 << 20)):
        from ray.data.aggregate import Count

        return (m.groupby(col).aggregate(Count(alias_name="_c"))
                .select_columns([col]).materialize())
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import np_columns

    return pd.DataFrame({col: np.unique(np_columns(m, [col])[col])})


def _ts_us(obj, cols):
    """Realign timestamp columns to timestamp[us].

    Ray's hash-shuffle groupby (and pandas map_groups block conversion)
    downcasts timestamp[us] key columns to timestamp[s]; the parquet
    inputs and the DuckDB oracle are microsecond-resolution, and the
    driver's value-hash is unit-sensitive, so query outputs must put the
    unit back."""
    import ray.data

    cols = [cols] if isinstance(cols, str) else list(cols)
    if isinstance(obj, ray.data.Dataset):
        def f(b: pa.Table) -> pa.Table:
            for c in cols:
                if c in b.column_names:
                    b = b.set_column(b.column_names.index(c), c,
                                     pc.cast(b.column(c),
                                             pa.timestamp("us")))
            return b

        return obj.map_batches(f, batch_format="pyarrow")
    if isinstance(obj, pa.Table):
        for c in cols:
            if c in obj.column_names:
                obj = obj.set_column(obj.column_names.index(c), c,
                                     pc.cast(obj.column(c),
                                             pa.timestamp("us")))
        return obj
    for c in cols:
        if c in obj.columns:
            obj[c] = obj[c].astype("datetime64[us]")
    return obj


def _det_sort(ds, by, descending=False, cutoff=None):
    """Deterministic result ordering for the driver contract.

    The trailing global sort on a query result exists only so results
    compare stably against the SQL oracle; it carries no pipeline
    semantics.  A ``Dataset.sort`` is a full range-partitioned exchange
    whose fixed latency (~2-3 s locally) dwarfs the typical result
    size, so under the cutoff the materialized result is sorted on the
    driver instead; corpus-sized results beyond the cutoff keep the
    distributed sort."""
    import ray.data

    by = [by] if isinstance(by, str) else list(by)
    if not isinstance(ds, ray.data.Dataset):
        df = ds
    else:
        from elevant_ray.stages.util import scale_cutoff

        if cutoff is None:
            cutoff = scale_cutoff(256 << 20)
        m = ds.materialize()
        if m.count() == 0:
            # empty inputs (or fully-filtered pipelines) can leave
            # schema-less blocks behind; rebuild the empty frame from
            # the dataset schema so column names survive the sort
            schema = m.schema(fetch_if_missing=False)
            arrow = getattr(schema, "base_schema", None) or pa.schema([])
            df = arrow.empty_table().to_pandas()
            if not set(by).issubset(df.columns):
                return pa.Table.from_pandas(df, preserve_index=False)
        elif m.size_bytes() > cutoff:
            return m.sort(by, descending=descending)
        else:
            df = m.to_pandas()
    asc = ([not d for d in descending] if isinstance(descending, list)
           else not descending)
    df = df.sort_values(by, ascending=asc,
                        kind="stable").reset_index(drop=True)
    # pyarrow Table, not DataFrame: callers (tests, downstream stages)
    # uniformly use .to_pandas(), and the driver accepts pa.Table
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# relational core (TPC-H-ish; exact DuckDB oracles)
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """Low-cardinality aggregate (6 groups) → per-batch Arrow group_by
    partials + tiny global combine; means derived from sum/count at the
    end (partial_group_agg, SURVEY.md §2.6 pattern)."""
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    def derive(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(
            b.column("l_shipdate"), pa.scalar(__import__("datetime").datetime(1998, 9, 2))))
        disc = pc.multiply(b.column("l_extendedprice"),
                           pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        return b.append_column("disc_price", disc) \
            .select(["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "disc_price"])

    ds = ds.map_batches(derive, batch_format="pyarrow")
    agg = partial_group_agg(
        ds, ["l_returnflag", "l_linestatus"],
        sum_cols=["l_quantity", "l_extendedprice", "disc_price"],
        count_alias="count_order", combine="driver")
    n = agg["count_order"].astype(float)
    out = agg[["l_returnflag", "l_linestatus"]].copy()
    out["sum_qty"] = agg["l_quantity"].round(2)
    out["sum_base_price"] = agg["l_extendedprice"].round(2)
    out["sum_disc_price"] = agg["disc_price"].round(2)
    out["avg_qty"] = (agg["l_quantity"] / n).round(6)
    out["avg_price"] = (agg["l_extendedprice"] / n).round(4)
    out["count_order"] = agg["count_order"]
    return out


def q3_top_orders(sf_dir: str):
    """Broadcast semi-join on the small side (customer segment), then
    the filtered orders side folded into the lineitem scan under the
    64 MB broadcast cutoff (IntKeyMap: plasma-shared numpy +
    searchsorted — doubles as the inner-join filter since unmatched
    orderkeys probe as missing); hash Dataset.join beyond the cutoff
    (the 100 TB path).  Grouped revenue + per-batch top-k either way."""
    import datetime

    from elevant_ray.stages.util import IntKeyMap, np_columns

    cutoff = datetime.datetime(1998, 1, 1)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    bset = IntKeyMap(np_columns(
        cust.filter(expr="c_mktsegment == 'BUILDING'"),
        ["c_custkey"])["c_custkey"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def sel_orders(b: pa.Table) -> pa.Table:
        keep = bset.contains(
            b.column("o_custkey").to_numpy(zero_copy_only=False))
        b = b.filter(pa.array(keep))
        return b.filter(pc.less(b.column("o_orderdate"), pa.scalar(cutoff)))

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def sel_line(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("l_shipdate"), pa.scalar(cutoff)))
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        return b.append_column("rev", rev).select(["l_orderkey", "rev"])

    from elevant_ray.stages.util import scale_cutoff

    if orders.size_bytes() <= scale_cutoff(64 << 20):
        o = np_columns(orders.map_batches(sel_orders, batch_format="pyarrow"),
                       ["o_orderkey", "o_orderdate"])
        odate = IntKeyMap(o["o_orderkey"], o["o_orderdate"])

        def attach(b: pa.Table) -> pa.Table:
            b = sel_line(b)
            dates, found = odate.take(
                b.column("l_orderkey").to_numpy(zero_copy_only=False))
            b = b.filter(pa.array(found))
            return b.append_column("o_orderdate", pa.array(dates[found]))

        from elevant_ray.stages.util import partial_group_agg

        agg = partial_group_agg(
            line.map_batches(attach, batch_format="pyarrow"),
            ["l_orderkey", "o_orderdate"], sum_cols=["rev"])
        out = agg.map_batches(
            lambda b: b.rename_columns(
                ["revenue" if c == "rev" else c for c in b.column_names]),
            batch_format="pyarrow")
    else:
        # coalesce after the selective filter: empty blocks reaching the
        # join trip Ray's scheduling-order-sensitive schema broadcast
        # (see util.cogroup_join docstring); 8 merged blocks are never
        # empty
        orders = orders.map_batches(sel_orders, batch_format="pyarrow") \
            .repartition(8)
        joined = line.map_batches(sel_line, batch_format="pyarrow").join(
            orders, "inner", 8, on=("l_orderkey",),
            right_on=("o_orderkey",))
        from ray.data.aggregate import Sum

        out = joined.groupby(["l_orderkey", "o_orderdate"]).aggregate(
            Sum("rev", alias_name="revenue"))

    # top-k without a global sort: after the aggregate every batch holds
    # complete groups, so the global top-10 is contained in the union of
    # per-batch top-10s; emit ≤10 rows per batch, merge on the driver
    import pandas as pd

    def topk(b: pa.Table) -> pa.Table:
        import numpy as np

        df = b.to_pandas()
        if df.empty:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "o_orderdate": pa.array([], pa.timestamp("us")),
                             "revenue": pa.array([], pa.float64())})
        # half-away-from-zero to match SQL ROUND (revenues positive)
        df["revenue"] = np.floor(
            df["revenue"].to_numpy(dtype=np.float64) * 100 + 0.5) / 100
        df = df.sort_values(["revenue", "o_orderdate", "l_orderkey"],
                            ascending=[False, True, True]).head(10)
        return pa.Table.from_pandas(
            df[["l_orderkey", "o_orderdate", "revenue"]],
            preserve_index=False)

    parts = [b.to_pandas() for b in out.map_batches(
        topk, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    if not parts:
        parts = [pd.DataFrame({
            "l_orderkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "revenue": pd.Series([], dtype="float64")})]
    allp = pd.concat(parts, ignore_index=True)
    return _ts_us(allp.sort_values(["revenue", "o_orderdate", "l_orderkey"],
                                   ascending=[False, True, True]).head(10)
                  .reset_index(drop=True), "o_orderdate")


def region_revenue(sf_dir: str):
    """Star join via broadcast dims (region→nation→customer) — no
    shuffle until the final tiny groupby.  Broadcast probes go through
    util.IntKeyMap (plasma-shared numpy, searchsorted per batch): a
    ray.put Python dict re-unpickles on every batch and probes per row,
    which dominated this stage's wall time."""
    import numpy as np

    from elevant_ray.stages.util import IntKeyMap, np_columns

    region = {r["r_regionkey"]: r["r_name"]
              for r in _read(sf_dir, "region").take_all()}
    nation = {r["n_nationkey"]: region[r["n_regionkey"]]
              for r in _read(sf_dir, "nation").take_all()}
    c = np_columns(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
                   ["c_custkey", "c_nationkey"])
    cust_region = np.array([nation[k] for k in c["c_nationkey"].tolist()],
                           dtype=object)
    cmap = IntKeyMap(c["c_custkey"], cust_region)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    from elevant_ray.stages.util import partial_group_agg

    # orderkey→region is the only thing lineitem needs from the orders
    # side; when the whole orders table fits the broadcast cutoff (same
    # 64 MB rule as verify_pairs), ship it once and fold the join into
    # the lineitem scan — zero shuffles before the tiny final groupby.
    # Beyond the cutoff, fall back to the hash-partitioned Dataset.join
    # (the 100 TB path).
    from elevant_ray.stages.util import scale_cutoff

    if orders.size_bytes() <= scale_cutoff(64 << 20):
        o = np_columns(orders, ["o_orderkey", "o_custkey"])
        omap = IntKeyMap(o["o_orderkey"],
                         cmap.take_checked(o["o_custkey"]))

        def rev_region(b: pa.Table) -> pa.Table:
            r = pc.multiply(b.column("l_extendedprice"),
                            pc.subtract(pa.scalar(1.0), b.column("l_discount")))
            regions = omap.take_checked(
                b.column("l_orderkey").to_numpy(zero_copy_only=False))
            return pa.table({"r_name": pa.array(regions, pa.string()),
                             "rev": r})

        joined = line.map_batches(rev_region, batch_format="pyarrow")
    else:
        def o_region(b: pa.Table) -> pa.Table:
            regions = cmap.take_checked(
                b.column("o_custkey").to_numpy(zero_copy_only=False))
            return b.append_column(
                "r_name", pa.array(regions, pa.string())) \
                .select(["o_orderkey", "r_name"])

        orders = orders.map_batches(o_region, batch_format="pyarrow")

        def rev(b: pa.Table) -> pa.Table:
            r = pc.multiply(b.column("l_extendedprice"),
                            pc.subtract(pa.scalar(1.0), b.column("l_discount")))
            return b.append_column("rev", r).select(["l_orderkey", "rev"])

        joined = line.map_batches(rev, batch_format="pyarrow").join(
            orders, "inner", 8, on=("l_orderkey",), right_on=("o_orderkey",))

    agg = partial_group_agg(joined, ["r_name"], sum_cols=["rev"],
                            combine="driver")
    out = agg[["r_name"]].copy()
    out["revenue"] = agg["rev"].round(2)
    return out


def order_priority_counts(sf_dir: str):
    import datetime

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate"])

    def sel(b: pa.Table) -> pa.Table:
        lo = pa.scalar(datetime.datetime(1996, 1, 1))
        hi = pa.scalar(datetime.datetime(1997, 1, 1))
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        return b.filter(m)

    ds = ds.map_batches(sel, batch_format="pyarrow")
    from elevant_ray.stages.util import partial_group_agg

    return partial_group_agg(ds, ["o_orderpriority"],
                             count_alias="order_count", combine="driver")


def top_customer_order(sf_dir: str):
    """Per-customer argmax order by totalprice, tie-break min orderkey —
    the reference's most-popular-candidate argmax pattern
    (create_databases.py:107-126) on relational data."""
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # argmax per key, vectorized across every key in the bucket
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True], kind="stable")
        g = g.drop_duplicates("o_custkey")
        return g[["o_custkey", "o_orderkey", "o_totalprice"]]

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    return _det_sort(as_arrow(bucketed_group_apply(
        ds, "o_custkey", per_bucket)), "o_custkey")


def customer_first_order(sf_dir: str):
    """First order per customer (argmin by date, tie min orderkey) — the
    per-group-first pattern of the reference's abstracts mapping
    (create_abstracts_mapping.py:14-50: GB(qid).first)."""
    import pandas as pd

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_orderdate"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="stable")
        return g.groupby("o_custkey", as_index=False).agg(
            first_orderkey=("o_orderkey", "first"),
            first_orderdate=("o_orderdate", "first"),
            n_orders=("o_orderkey", "size"))

    from elevant_ray.stages.util import bucketed_group_apply

    return _det_sort(bucketed_group_apply(
        orders, "o_custkey", per_bucket), "o_custkey")


def customer_running_spend(sf_dir: str):
    """Per-key prefix scan (cumulative window aggregate, the §2.10
    "ordered within key" family): running total of each customer's
    order spend in date order.  One keyed shuffle co-locates a
    customer's orders, then a vectorized groupby-cumsum per bucket.
    Totals are carried as integer cents so the sum is associative and
    bit-exact under any plan (float window sums are not: DuckDB's
    segment-tree window association differs from sequential cumsum)."""
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey",
                                  "o_orderdate", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), pa.scalar(100.0))), pa.int64())
        return b.drop_columns(["o_totalprice"]).append_column(
            "spend_cents", cents)

    ds = ds.map_batches(to_cents, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="stable")
        g = g.assign(
            running_spend_cents=g.groupby("o_custkey")["spend_cents"].cumsum())
        return g[["o_custkey", "o_orderkey", "running_spend_cents"]]

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    return _det_sort(as_arrow(bucketed_group_apply(
        ds, "o_custkey", per_bucket)), ["o_custkey", "o_orderkey"])


def customer_top3_orders(sf_dir: str):
    """Grouped top-k (k=3) with a per-batch partial top-k combiner: each
    input batch is pruned to its own per-key top 3 BEFORE the shuffle
    (the global per-key top 3 is a subset of the union of per-batch
    top 3s), so the keyed exchange moves at most 3×keys×batches rows
    instead of the whole table — the §2.7 top-k pattern at scale."""
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="stable")
        return g.groupby("o_custkey", as_index=False, sort=False).head(3)

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(topk(b.to_pandas()),
                                    preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = topk(g)
        g = g.assign(rnk=g.groupby("o_custkey").cumcount() + 1)
        return g[["o_custkey", "rnk", "o_orderkey", "o_totalprice"]]

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    return _det_sort(as_arrow(bucketed_group_apply(
        pruned, "o_custkey", per_bucket)), ["o_custkey", "rnk"])


def part_type_stats(sf_dir: str):
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "part", ["p_type", "p_retailprice", "p_size"])
    agg = partial_group_agg(ds, ["p_type"], sum_cols=["p_retailprice"],
                            count_alias="n_parts", max_cols=["p_size"],
                            combine="driver")
    out = agg[["p_type", "n_parts"]].copy()
    out["avg_price"] = (agg["p_retailprice"] / agg["n_parts"]).round(4)
    out["max_size"] = agg["p_size"]
    return out[["p_type", "n_parts", "avg_price", "max_size"]]


def supplier_nation_balance(sf_dir: str):
    """supplier⋈nation broadcast join + grouped sum."""
    import ray

    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}
    nref = ray.put(nation)
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def add_nation(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get
        nm = cached_get(nref)
        return b.append_column("n_name", pa.array(
            [nm[k] for k in b.column("s_nationkey").to_pylist()], pa.string()))

    ds = ds.map_batches(add_nation, batch_format="pyarrow")
    from elevant_ray.stages.util import partial_group_agg

    agg = partial_group_agg(ds, ["n_name"], sum_cols=["s_acctbal"],
                            count_alias="n_suppliers", combine="driver")
    out = agg[["n_name"]].copy()
    out["total_balance"] = agg["s_acctbal"].round(2)
    out["n_suppliers"] = agg["n_suppliers"]
    return out


def nation_region_rollup(sf_dir: str):
    """Multi-level aggregate (ROLLUP): customer count + balance by
    (region, nation), with per-region subtotals and a grand total — ONE
    scan: the fine-grained (region, nation) partial aggregate is tiny,
    so coarser levels are derived from it on the driver instead of
    re-scanning (the scale-right rollup: never aggregate the fact table
    twice).  Balances carried as integer cents for associative exactness."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import IntKeyMap, partial_group_agg

    region = {r["r_regionkey"]: r["r_name"]
              for r in _read(sf_dir, "region").take_all()}
    nat = _read(sf_dir, "nation").take_all()
    nname = {r["n_nationkey"]: r["n_name"] for r in nat}
    nregion = {r["n_nationkey"]: region[r["n_regionkey"]] for r in nat}
    keys = np.fromiter(nname.keys(), dtype=np.int64, count=len(nname))
    rmap = IntKeyMap(keys, np.array([nregion[k] for k in keys.tolist()],
                                    dtype=object))
    nmap = IntKeyMap(keys, np.array([nname[k] for k in keys.tolist()],
                                    dtype=object))

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def tag(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.round(pc.multiply(
            b.column("c_acctbal"), pa.scalar(100.0))), pa.int64())
        return pa.table({
            "r_name": pa.array(rmap.take_checked(nk), pa.string()),
            "n_name": pa.array(nmap.take_checked(nk), pa.string()),
            "cents": cents,
        })

    fine = partial_group_agg(ds.map_batches(tag, batch_format="pyarrow"),
                             ["r_name", "n_name"], sum_cols=["cents"],
                             count_alias="n_customers", combine="driver")
    fine = fine.rename(columns={"cents": "total_acctbal_cents"})
    sub = fine.groupby("r_name", as_index=False).agg(
        n_customers=("n_customers", "sum"),
        total_acctbal_cents=("total_acctbal_cents", "sum"))
    sub["n_name"] = "ALL"
    total = pd.DataFrame({
        "r_name": ["ALL"], "n_name": ["ALL"],
        "n_customers": [fine["n_customers"].sum()],
        "total_acctbal_cents": [fine["total_acctbal_cents"].sum()]})
    out = pd.concat([fine, sub, total], ignore_index=True)
    out["n_customers"] = out["n_customers"].astype("int64")
    out["total_acctbal_cents"] = out["total_acctbal_cents"].astype("int64")
    return out[["r_name", "n_name", "n_customers", "total_acctbal_cents"]] \
        .sort_values(["r_name", "n_name"]).reset_index(drop=True)


def orders_priority_pivot(sf_dir: str):
    """Pivot / conditional aggregation: order counts per year, one
    column per priority class.  One pass — per-batch partials on
    (year, priority), tiny combine, driver-side pivot (the pivot
    target is years × 5 columns; never wider than the group count)."""
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_year": pc.cast(pc.year(b.column("o_orderdate")), pa.int64()),
            "prio": b.column("o_orderpriority"),
        })

    agg = partial_group_agg(ds.map_batches(tag, batch_format="pyarrow"),
                            ["o_year", "prio"], count_alias="n",
                            combine="driver")
    cols = {"1-URGENT": "urgent", "2-HIGH": "high", "3-MEDIUM": "medium",
            "4-NOT SPECIFIED": "not_specified", "5-LOW": "low"}
    pv = agg.pivot_table(index="o_year", columns="prio", values="n",
                         fill_value=0, aggfunc="sum")
    pv = pv.rename(columns=cols).reset_index()
    for c in cols.values():
        if c not in pv.columns:
            pv[c] = 0
        pv[c] = pv[c].astype("int64")
    pv.columns.name = None
    return pv[["o_year", "urgent", "high", "medium", "not_specified",
               "low"]].sort_values("o_year").reset_index(drop=True)


def part_brand_sets(sf_dir: str):
    """Group collect-set aggregation (the reference's title-synonym /
    akronym set-union groupby, extract_title_synonyms.py:12-33): sorted
    distinct brands per part type, serialized for order-stable compare."""
    import pandas as pd

    ds = _read(sf_dir, "part", ["p_type", "p_brand"])

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        brands = sorted(set(g["p_brand"]))
        return pd.DataFrame({"p_type": [g["p_type"].iloc[0]],
                             "brands": [",".join(brands)],
                             "n_brands": [len(brands)]})

    from elevant_ray.stages.util import as_arrow

    return _det_sort(as_arrow(ds.groupby("p_type").map_groups(
        collect, batch_format="pandas")), "p_type")


def customer_except(sf_dir: str):
    """Set difference: customers who ordered in 1996 but not in 1997.
    Distinct via groupby; the small exclusion side is broadcast
    (ray.put) instead of an anti-join shuffle."""
    import datetime

    import ray

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    y96 = datetime.datetime(1996, 1, 1)
    y97 = datetime.datetime(1997, 1, 1)
    y98 = datetime.datetime(1998, 1, 1)

    def in_range(lo, hi):
        def f(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
                        pc.less(b.column("o_orderdate"), pa.scalar(hi)))
            return b.filter(m).select(["o_custkey"])
        return f

    import numpy as np

    from elevant_ray.stages.util import IntKeyMap, np_columns

    # exclusion side: stream the filtered keys to the driver, dedupe
    # with np.unique (skips a whole unique() exchange), broadcast as a
    # sorted numpy membership probe (plasma zero-copy, vectorized)
    cust97 = IntKeyMap(np.unique(np_columns(
        ds.map_batches(in_range(y97, y98), batch_format="pyarrow"),
        ["o_custkey"])["o_custkey"]))

    def anti(b: pa.Table) -> pa.Table:
        keep = ~cust97.contains(
            b.column("o_custkey").to_numpy(zero_copy_only=False))
        return b.filter(pa.array(keep))

    kept = (ds.map_batches(in_range(y96, y97), batch_format="pyarrow")
            .map_batches(anti, batch_format="pyarrow"))
    return _det_sort(_distinct_int(kept, "o_custkey"), "o_custkey")


def type_closure(sf_dir: str):
    """Distributed transitive closure with min-depth (the reference's
    type-hierarchy closure, create_all_types_mapping.py:15-49) over a
    deterministic DAG derived from part keys: k → k//7 and k → k//3."""
    from elevant_ray.stages.graph import transitive_closure

    ds = _read(sf_dir, "part", ["p_partkey"])

    def edges(b: pa.Table) -> pa.Table:
        src, dst = [], []
        for k in b.column("p_partkey").to_pylist():
            if k > 0:
                src.extend((k, k))
                dst.extend((k // 7, k // 3))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    closure = transitive_closure(
        ds.map_batches(edges, batch_format="pyarrow"),
        num_partitions=_shuffle_parts())
    return _det_sort(closure, ["src", "dst"])


# ---------------------------------------------------------------------------
# events: windowed aggregation + sessionization
# ---------------------------------------------------------------------------


def events_hourly(sf_dir: str):
    """Hourly rollup — group count is tiny (types × hours), so the
    full-table groupby shuffle is replaced by per-batch Arrow partials
    + a small combine (partial_group_agg, §2.6)."""
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def trunc(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b.column("ts"), unit="hour")
        return pa.table({"event_type": b.column("event_type"),
                         "hour": hour, "value": b.column("value")})

    ds = ds.map_batches(trunc, batch_format="pyarrow")
    agg = partial_group_agg(ds, ["event_type", "hour"],
                            sum_cols=["value"], count_alias="n_events")

    def finish(b: pa.Table) -> pa.Table:
        # cents-form rounding: round(x·100)/100 reproduces the exact
        # double SQL ROUND(x, 2) yields, where pc.round(x, ndigits=2)
        # can land one ULP away (pow-of-ten scaling differs)
        cents = pc.round(pc.multiply(b.column("value"), pa.scalar(100.0)),
                         round_mode="half_towards_infinity")
        return pa.table({"event_type": b.column("event_type"),
                         "hour": pc.cast(b.column("hour"),
                                         pa.timestamp("us")),
                         "n_events": b.column("n_events"),
                         "sum_value": pc.divide(cents, pa.scalar(100.0))})

    return _det_sort(agg.map_batches(finish, batch_format="pyarrow") \
        , ["event_type", "hour"])


def events_distinct_users(sf_dir: str):
    """Exact count-distinct per group at shuffle-minimal cost: each batch
    first collapses to its DISTINCT (event_type, user_id) pairs (Arrow
    group_by, C++), so the all-to-all moves ≤ |distinct pairs| rows, not
    |events|; the global distinct + count is then one small groupby.
    (SURVEY §2.6: reference keeps all counts exact — this is the exact
    scale path; a sketch variant would swap stage 2 for HLL merge.)"""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def batch_distinct(b: pa.Table) -> pa.Table:
        return b.group_by(["event_type", "user_id"]).aggregate([])

    pairs = ds.map_batches(batch_distinct, batch_format="pyarrow")
    distinct = pairs.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_n")).select_columns(["event_type", "user_id"])
    out = distinct.groupby("event_type").aggregate(
        Count(alias_name="n_users"))
    return _det_sort(out, "event_type")


def events_distinct_users_approx(sf_dir: str):
    """HyperLogLog per-group approximate distinct (stages/sketches.py) —
    the sketch scale path for events_distinct_users: the shuffle moves
    O(groups × batches × 4 KB) register blobs regardless of user
    cardinality.  Rows-only (approximate ⇒ no value-hash oracle); the
    pytest suite asserts ≤5% error vs the exact path."""
    from elevant_ray.stages.sketches import grouped_approx_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    out = grouped_approx_distinct(ds, "event_type", "user_id",
                                  alias="n_users_approx")
    from elevant_ray.stages.util import as_arrow

    return _det_sort(as_arrow(out), "event_type")


def events_sessions(sf_dir: str):
    """Sessionization (30-min inactivity gap) per user: sort-within-group
    + gap scan — ordering assumption: (ts, event_id) within user."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gaps = g.groupby("user_id")["ts"].diff().dt.total_seconds()
        g = g.assign(_new=(gaps.isna() | (gaps > 1800)).astype("int64"))
        return g.groupby("user_id", as_index=False).agg(
            n_sessions=("_new", "sum"), n_events=("_new", "size"))

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    return _det_sort(as_arrow(bucketed_group_apply(
        ds, "user_id", per_bucket)), "user_id")


def events_funnel(sf_dir: str):
    """Conversion funnel (ordered-sequence match per user): purchases
    within 1 hour of the user's FIRST view.  One keyed shuffle on
    user_id, then fully vectorized per bucket — first-view via groupby
    min over the view rows, purchase rows joined back by key and masked
    by the time window.  No per-user Python loop, no pairwise blowup."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        views = g[g["event_type"] == "view"]
        first = views.groupby("user_id", as_index=False)["ts"].min() \
            .rename(columns={"ts": "first_view"})
        pur = g[g["event_type"] == "purchase"].merge(first, on="user_id")
        within = pur[(pur["ts"] >= pur["first_view"]) &
                     (pur["ts"] < pur["first_view"] + pd.Timedelta(hours=1))]
        counts = within.groupby("user_id").size()
        first["purchases_1h"] = first["user_id"].map(counts) \
            .fillna(0).astype("int64")
        return first[["user_id", "purchases_1h"]]

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    return _det_sort(as_arrow(bucketed_group_apply(
        ds, "user_id", per_bucket)), "user_id")


def orders_nearby_counts(sf_dir: str):
    """Range join (per-key interval self-join): for each order, the
    count/total of the SAME customer's other orders within ±30 days.
    One keyed shuffle (groupby custkey) + per-group sort + vectorized
    searchsorted interval lookup — no pairwise expansion, so a
    customer with k orders costs O(k log k), not O(k²)."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                  "o_orderdate", "o_totalprice"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # Composite-key searchsorted: key-code × band + day keeps each
        # customer's rows in a disjoint integer band wide enough that
        # day±30 never crosses into a neighboring key, so ONE global
        # searchsorted answers every per-key interval query in the
        # bucket — no per-key Python at all.
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="stable").reset_index(drop=True)
        if not len(g):
            return pd.DataFrame({"o_orderkey": [], "n_nearby": [],
                                 "nearby_total": []})
        codes = pd.factorize(g["o_custkey"])[0].astype(np.int64)
        day = g["o_orderdate"].to_numpy().astype(
            "datetime64[D]").astype(np.int64)
        rel = day - day.min() + 31
        band = int(rel.max()) + 32
        comp = codes * band + rel
        lo = np.searchsorted(comp, comp - 30, side="left")
        hi = np.searchsorted(comp, comp + 30, side="right")
        price = g["o_totalprice"].to_numpy()
        cs = np.concatenate([[0.0], np.cumsum(price)])
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"],
            "n_nearby": (hi - lo - 1).astype("int64"),  # minus self
            "nearby_total": np.round(cs[hi] - cs[lo] - price, 2),
        })

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    return _det_sort(as_arrow(bucketed_group_apply(
        ds, "o_custkey", per_bucket)), "o_orderkey")


def events_window_counts(sf_dir: str):
    """Sliding-window aggregate (RANGE 1 hour preceding): per event, the
    count/sum of the same user's events in [ts-1h, ts].  One keyed
    shuffle (groupby user) + per-group sort + vectorized two-pointer
    (searchsorted over cumsum) — the engine's windowed-aggregate shape;
    ordering assumption: ts unique per user (holds for the testdata)."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    WIN_US = 3_600_000_000  # 1h in microseconds

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # same composite-key trick as orders_nearby_counts: per-key
        # bands in µs wide enough that ts−1h never leaves the band
        g = g.sort_values(["user_id", "ts"],
                          kind="stable").reset_index(drop=True)
        if not len(g):
            return pd.DataFrame({"event_id": [], "user_id": [], "ts": [],
                                 "n_events_1h": [], "sum_value_1h": []})
        codes = pd.factorize(g["user_id"])[0].astype(np.int64)
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        rel = us - us.min() + WIN_US + 1
        band = int(rel.max()) + WIN_US + 2
        comp = codes * band + rel
        lo = np.searchsorted(comp, comp - WIN_US, side="left")
        idx = np.arange(len(g))
        cs = np.concatenate([[0.0], np.cumsum(g["value"].to_numpy())])
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "ts": g["ts"],
            "n_events_1h": (idx - lo + 1).astype("int64"),
            "sum_value_1h": np.round(cs[idx + 1] - cs[lo], 2),
        })

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    return _det_sort(as_arrow(bucketed_group_apply(
        ds, "user_id", per_bucket)), "event_id")


def events_attribution(sf_dir: str):
    """As-of join: attribute each purchase to the user's most recent
    view at-or-before it (stages/asof.py — union + one keyed shuffle +
    in-group searchsorted merge)."""
    from elevant_ray.stages.asof import asof_join

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    purchases = (ev.filter(expr="event_type == 'purchase'")
                 .select_columns(["user_id", "event_id", "ts"]))

    def as_src(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "src_event_id": b.column("event_id"),
                         "src_ts": b.column("ts")})

    views = (ev.filter(expr="event_type == 'view'")
             .map_batches(as_src, batch_format="pyarrow"))
    out = asof_join(purchases, views, key="user_id",
                    left_ts="ts", right_ts="src_ts",
                    left_cols=["event_id", "ts"],
                    right_cols=["src_event_id", "src_ts"],
                    num_partitions=_shuffle_parts())
    res = _ts_us(_det_sort(out, "event_id"), ["ts", "src_ts"])

    # the left-outer pandas merge upcasts the (never-null) purchase id
    # to float64; the oracle keeps it int64
    def fix_id(b: pa.Table) -> pa.Table:
        if "event_id" in b.column_names:
            b = b.set_column(b.column_names.index("event_id"), "event_id",
                             pc.cast(b.column("event_id"), pa.int64()))
        return b

    if isinstance(res, pa.Table):
        return fix_id(res)
    return res.map_batches(fix_id, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# documents: text analysis / dedup / fingerprints
# ---------------------------------------------------------------------------


def doc_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import token_count

        n = [token_count(t) for t in b.column("text").to_pylist()]
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def doc_token_quantiles(sf_dir: str):
    """Exact per-language token-count percentiles (p50/p90/p99) via the
    two-phase histogram — no sort, no per-row shuffle
    (stages/quantiles.py)."""
    from elevant_ray.stages.quantiles import grouped_quantiles

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def f(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import token_count

        n = [token_count(t) for t in b.column("text").to_pylist()]
        return pa.table({"lang": b.column("lang"),
                         "n_tokens": pa.array(n, pa.int64())})

    counts = ds.map_batches(f, batch_format="pyarrow")
    return grouped_quantiles(counts, "n_tokens", (0.5, 0.9, 0.99),
                             group_cols=["lang"])


def unigram_counts(sf_dir: str):
    from elevant_ray.stages.text_stats import unigram_counts as uc

    return uc(_read(sf_dir, "documents", ["text"]))


def doc_quality(sf_dir: str):
    from elevant_ray.stages.text_stats import doc_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(doc_stats_batch, batch_format="pyarrow")
    out = out.select_columns(["doc_id", "n_chars", "n_tokens", "n_alpha",
                              "n_digit", "stopword_count"])
    return _det_sort(out, "doc_id")


def doc_repetition_stats(sf_dir: str):
    """Per-document lexical-repetition quality signals (the Gopher-rule
    family a pretraining curation pass computes): type-token ratio and
    the fraction of duplicated trigrams, for docs with ≥3 tokens.
    Embarrassingly parallel — one pass, no exchange.  Per batch, tokens
    factorize once to int codes; per doc, distinct unigrams/trigrams are
    np.unique over the code slice (trigrams as shift-packed composite
    ints when codes fit, a void-view unique beyond — no silent cap on
    per-batch vocabulary).  Ratios divide the same exact integers the
    oracle divides, so round-6 agrees bit-for-bit.  Reference analog:
    the per-doc text statistics family (utils.py:12-33,
    benchmark_statistics.py:19-150)."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "ttr": pa.array([], pa.float64()),
                          "dup3": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        toks = [t.split(" ") for t in b.column("text").to_pylist()]
        lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
        keep = lens >= 3
        if not keep.any():
            return empty
        kept = [t for t, k in zip(toks, keep) if k]
        codes, _ = pd.factorize(np.concatenate(
            [np.asarray(t, object) for t in kept]))
        codes = codes.astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens[keep])))
        bits = int(codes.max()).bit_length() if codes.size else 1
        packable = 3 * bits <= 63
        n_arr = lens[keep].astype(np.float64)
        d1 = np.empty(len(kept), np.int64)
        d3 = np.empty(len(kept), np.int64)
        for j in range(len(kept)):
            c = codes[offs[j]:offs[j + 1]]
            d1[j] = np.unique(c).size
            if packable:
                tri = (c[:-2] << (2 * bits)) | (c[1:-1] << bits) | c[2:]
                d3[j] = np.unique(tri).size
            else:
                stack = np.ascontiguousarray(
                    np.stack([c[:-2], c[1:-1], c[2:]], axis=1))
                d3[j] = np.unique(
                    stack.view([("", np.int64)] * 3).ravel()).size
        ttr = d1 / n_arr
        dup3 = 1.0 - d3 / (n_arr - 2.0)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_tokens": pa.array(lens[keep], pa.int64()),
            "ttr": pa.array(np.floor(ttr * 1e6 + 0.5) / 1e6, pa.float64()),
            "dup3": pa.array(np.floor(dup3 * 1e6 + 0.5) / 1e6 + 0.0,
                             pa.float64())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def nation_metrics_unpivot(sf_dir: str):
    """UNPIVOT (wide → long) reshape: the per-nation customer aggregate
    (count, balance cents) melted into (nationkey, metric, value) rows.
    The wide aggregate is dimension-bounded, so the melt runs on the
    driver over the combined partials — the scan itself stays one pass
    with no exchange.  Exact integer values on both sides."""
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
            "bal_cents": pc.cast(pc.round(pc.multiply(
                b.column("c_acctbal"), pa.scalar(100.0))), pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["nationkey"], sum_cols=["bal_cents"],
                            count_alias="n_cust", combine="driver")
    if agg.empty:
        return pd.DataFrame({"nationkey": pd.Series([], dtype="int64"),
                             "metric": pd.Series([], dtype="object"),
                             "value": pd.Series([], dtype="int64")})
    long = agg.melt(id_vars=["nationkey"],
                    value_vars=["bal_cents", "n_cust"],
                    var_name="metric", value_name="value")
    long["nationkey"] = long["nationkey"].astype("int64")
    long["value"] = long["value"].astype("int64")
    return (long.sort_values(["nationkey", "metric"])
            .reset_index(drop=True))


def lang_id(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import lang_guess

        return pa.table({"doc_id": b.column("doc_id"),
                         "lang_pred": pa.array(
                             [lang_guess(t) for t in b.column("text").to_pylist()],
                             pa.string())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def doc_fingerprint(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import md5_fingerprint

        return pa.table({"doc_id": b.column("doc_id"),
                         "fingerprint": pa.array(
                             [md5_fingerprint(t) for t in b.column("text").to_pylist()],
                             pa.string())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def split_assign(sf_dir: str):
    """Deterministic train/dev/test split by content-independent hash
    bucket (engine replacement for the reference's seeded-shuffle split,
    split_dataset.py:17-140: hash split needs no global shuffle, is
    stable under repartitioning, and doubles as seeded sampling —
    filter bucket < k)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id"])

    def f(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        buckets = [int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 100
                   for i in ids]
        split = ["test" if x < 10 else "dev" if x < 20 else "train"
                 for x in buckets]
        return pa.table({"doc_id": b.column("doc_id"),
                         "bucket": pa.array(buckets, pa.int64()),
                         "split": pa.array(split, pa.string())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def dedup_exact(sf_dir: str):
    """Exact content dedup: min doc_id per normalized-text fingerprint."""
    from elevant_ray.stages.dedup import dedup_exact_text

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = dedup_exact_text(ds)
    return _det_sort(kept.select_columns(["doc_id"]), "doc_id")


def dedup_minhash(sf_dir: str):
    """Near-dup clustering over documents: LSH candidates → verify →
    hash-min CC; returns (doc_id, cluster) — NOT SQL-expressible."""
    import pyarrow as _pa

    from elevant_ray.stages.clustering import connected_components
    from elevant_ray.stages.dedup import lsh_candidate_pairs
    from elevant_ray.stages.scoring import verify_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: _pa.Table) -> _pa.Table:
        ids = [f"{i:012d}" for i in b.column("doc_id").to_pylist()]
        return _pa.table({"id": _pa.array(ids, _pa.string()),
                          "text": b.column("text"),
                          "canon": _pa.array(ids, _pa.string())})

    # pinned once: three consumers (blocking + both verify-join sides)
    docs = ds.map_batches(prep, batch_format="pyarrow").materialize()
    if docs.count() == 0:
        return _pa.table({"doc_id": _pa.array([], _pa.int64()),
                          "cluster": _pa.array([], _pa.int64())})
    pairs = lsh_candidate_pairs(docs, id_col="id",
                                num_partitions=_shuffle_parts())
    scored = verify_pairs(pairs, docs, id_col="id",
                          num_partitions=_shuffle_parts())
    edges = scored.map_batches(
        lambda b: b.filter(b.column("is_match")).select(["left", "right"]),
        batch_format="pyarrow")
    labels = connected_components(edges, num_partitions=_shuffle_parts())

    def fmt(b: _pa.Table) -> _pa.Table:
        return _pa.table({
            "doc_id": _pa.array([int(x) for x in b.column("node").to_pylist()], _pa.int64()),
            "cluster": _pa.array([int(x) for x in b.column("label").to_pylist()], _pa.int64()),
        })

    return _det_sort(labels.map_batches(fmt, batch_format="pyarrow"), "doc_id")


def knn_cosine(sf_dir: str):
    from elevant_ray.stages.knn import knn_brute_force

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_brute_force(ds, query_ids=list(range(10)), k=5)
    from elevant_ray.stages.util import as_arrow

    return _det_sort(as_arrow(out), ["query_id", "rank"])


def knn_ivf(sf_dir: str):
    """IVF-bucketed approximate ANN (scale path): coarse k-means cells,
    probe nprobe nearest — rows-only (approximate by construction);
    recall vs the brute-force oracle is asserted in tests."""
    from elevant_ray.stages.knn import ivf_topk
    from elevant_ray.stages.util import as_arrow

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ivf_topk(ds, query_ids=list(range(10)), k=5,
                   n_cells=8, nprobe=4)
    return _det_sort(as_arrow(out), ["query_id", "rank"])


def neardup_embedding(sf_dir: str):
    """Embedding-cosine near-dup pairs (threshold 0.4 — the synthetic
    embeddings are near-orthogonal; production near-dup would use
    ~0.95).  Exact, with a closed-form SQL oracle."""
    import pyarrow.compute as _pc

    from elevant_ray.stages.knn import cosine_neardup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = cosine_neardup_pairs(ds, threshold=0.35)

    def fmt(b: pa.Table) -> pa.Table:
        sim = _pc.round(b.column("sim"), ndigits=4)
        out = pa.table({"left": b.column("left"),
                        "right": b.column("right"), "sim": sim})
        return out.filter(_pc.greater_equal(out.column("sim"),
                                            pa.scalar(0.4)))

    return _det_sort(pairs.map_batches(fmt, batch_format="pyarrow") \
        , ["left", "right"])


def dedup_simhash(sf_dir: str):
    """SimHash near-dup clustering: banded simhash self-join (recall 1.0
    for hamming ≤ 3 by pigeonhole) → hash-min CC → every doc labeled
    (singletons keep their own id via a left-outer join)."""
    from elevant_ray.stages.clustering import connected_components
    from elevant_ray.stages.dedup import simhash_candidate_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        ids = [f"{i:012d}" for i in b.column("doc_id").to_pylist()]
        return pa.table({"id": pa.array(ids, pa.string()),
                         "text": b.column("text")})

    import ray as _ray

    docs = ds.map_batches(prep, batch_format="pyarrow").materialize()
    if docs.count() == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    pairs = simhash_candidate_pairs(docs, id_col="id",
                                    num_partitions=_shuffle_parts())
    edges = pairs.select_columns(["left", "right"])
    labels = connected_components(edges, num_partitions=_shuffle_parts())

    from elevant_ray.stages.util import scale_cutoff as _sc

    if labels.size_bytes() <= _sc(1 << 30):
        # near-dup label table ≪ corpus: broadcast it and label every doc
        # in one map (singletons keep their own id) — no outer-join
        # exchange.  Falls back to the join when labels outgrow a
        # broadcast (massively dup-heavy corpora).
        lab_ref = _ray.put({r["node"]: r["label"] for r in labels.take_all()})

        def fmt_b(b: pa.Table) -> pa.Table:
            from elevant_ray.stages.util import cached_get
            lab = cached_get(lab_ref)
            ids = b.column("id").to_pylist()
            return pa.table({
                "doc_id": pa.array([int(x) for x in ids], pa.int64()),
                "cluster": pa.array([int(lab.get(x, x)) for x in ids],
                                    pa.int64()),
            })

        return _det_sort(docs.select_columns(["id"]).map_batches(
            fmt_b, batch_format="pyarrow"), "doc_id")

    joined = docs.select_columns(["id"]).join(
        labels, "left_outer", _shuffle_parts(), on=("id",),
        right_on=("node",))

    def fmt(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        lab = _pc.coalesce(b.column("label"), b.column("id"))
        return pa.table({
            "doc_id": pa.array([int(x) for x in b.column("id").to_pylist()],
                               pa.int64()),
            "cluster": pa.array([int(x) for x in lab.to_pylist()],
                                pa.int64()),
        })

    return _det_sort(joined.map_batches(fmt, batch_format="pyarrow"), "doc_id")


def dedup_ngram_jaccard(sf_dir: str):
    """Exact token-3-gram Jaccard pairs ≥ 0.5 via prefix-filtered
    self-join (AllPairs; recall exactly 1.0, hot grams pruned by
    rare-first prefix selection — see stages/dedup.ngram_jaccard_pairs)."""
    import pandas as pd

    from elevant_ray.stages.dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        ids = [f"{i:012d}" for i in b.column("doc_id").to_pylist()]
        return pa.table({"id": pa.array(ids, pa.string()),
                         "text": b.column("text")})

    # pinned: consumed by the gram-frequency pass AND the per-doc pass
    docs = ds.map_batches(prep, batch_format="pyarrow").materialize()
    pairs = ngram_jaccard_pairs(docs, id_col="id", n=3, threshold=0.5,
                                num_partitions=_shuffle_parts())

    # tiny result → sort on the driver (a Dataset sort is an exchange)
    parts = [b.to_pandas()
             for b in pairs.iter_batches(batch_format="pyarrow")]
    out = (pd.concat(parts, ignore_index=True) if parts
           else pd.DataFrame({"left": [], "right": [], "jac": []}))
    out["left"] = out["left"].astype("int64")
    out["right"] = out["right"].astype("int64")
    return out.sort_values(["left", "right"]).reset_index(drop=True)


def multimodal_features(sf_dir: str):
    """Multimodal actor-pool plumbing: documents → synthetic media
    (binary payload + typed metadata) → image-feature actor stage →
    per-doc stats.  Decode is a deterministic stub (no image libs in
    this container) — the Ray-side schema/actors/batching are real."""
    import pyarrow.compute as _pc

    from elevant_ray.stages.multimodal import ImageFeatureStage, synth_media_batch

    ds = _read(sf_dir, "documents", ["doc_id"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow")
    feats = media.map_batches(ImageFeatureStage, concurrency=2,
                              batch_size=64, batch_format="pyarrow")

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "px_mean": _pc.round(b.column("px_mean"), ndigits=4),
            "px_std": _pc.round(b.column("px_std"), ndigits=4),
            "dim": pa.array(
                [len(v) for v in b.column("feature").to_pylist()],
                pa.int64()),
        })

    return _det_sort(feats.map_batches(fmt, batch_format="pyarrow"), "doc_id")


# ---------------------------------------------------------------------------
# pages / ELEVANT pipelines (markup-derived; rows-only checks except the
# closed-form URL canonicalization)
# ---------------------------------------------------------------------------


def url_canonicalize(sf_dir: str):
    """Canonical blocking key per document URL — closed-form SQL oracle."""
    from elevant_ray.functions.normalize import canonical_url
    from elevant_ray.sources.pages import page_url

    ds = _read(sf_dir, "documents", ["doc_id"])

    def f(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": b.column("doc_id"),
            "canon": pa.array([canonical_url(page_url(i)) for i in ids], pa.string()),
        })

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def extract_pages(sf_dir: str):
    """pages → extracted text + annotation counts (byte-identical text
    invariant covered by tests/test_extract.py)."""
    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages

    pages = synth_pages(sf_dir).map_batches(extract_batch, batch_format="pyarrow")

    def counts(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": b.column("url"),
            "n_chars": pc.utf8_length(b.column("text")),
            "n_links": pc.list_value_length(b.column("hyperlinks")),
            "n_synonyms": pc.list_value_length(b.column("title_synonyms")),
            "n_sections": pc.list_value_length(b.column("sections")),
        })

    return _det_sort(pages.map_batches(counts, batch_format="pyarrow"), "url")


def benchmark_stats(sf_dir: str):
    """Benchmark-statistics aggregate (benchmark_statistics.py analog)
    over the synthesized corpus: hyperlink anchors play the gold-label
    role.  Long-format (stat, key, value) — rows-only (labels derive
    from extraction, not SQL-expressible); exactness covered by
    tests/test_ops2.py."""
    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.benchmark_stats import benchmark_statistics

    pages = synth_pages(sf_dir).map_batches(extract_batch,
                                            batch_format="pyarrow")

    def as_articles(b: pa.Table) -> pa.Table:
        labels = [[{"begin": h["begin"], "end": h["end"],
                    "entity_id": h["target"], "name": h["target"],
                    "coref": None, "type": None}
                   for h in links]
                  for links in b.column("hyperlinks").to_pylist()]
        lt = pa.list_(pa.struct([
            ("begin", pa.int32()), ("end", pa.int32()),
            ("entity_id", pa.string()), ("name", pa.string()),
            ("coref", pa.bool_()), ("type", pa.string())]))
        return pa.table({"text": b.column("text"),
                         "labels": pa.array(labels, lt)})

    return benchmark_statistics(
        pages.map_batches(as_articles, batch_format="pyarrow"),
        num_partitions=_shuffle_parts())


def link_frequencies(sf_dir: str):
    """The reference's get_link_frequencies dataflow over synthesized
    pages: (anchor alias, target) → count."""
    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.dims import link_frequencies as lf

    pages = synth_pages(sf_dir).map_batches(extract_batch, batch_format="pyarrow")
    return _det_sort(lf(pages), ["alias", "target"])


def most_popular_candidates(sf_dir: str):
    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.dims import link_frequencies as lf
    from elevant_ray.stages.dims import most_popular_candidates as mpc
    from elevant_ray.stages.util import as_arrow

    pages = synth_pages(sf_dir).map_batches(extract_batch, batch_format="pyarrow")
    out = as_arrow(mpc(lf(pages))).select_columns(
        ["alias", "top_candidate", "freq"])
    return _det_sort(out, "alias")


def entity_popularity(sf_dir: str):
    """Entity → summed incoming-link frequency over synthesized pages
    (entity_database.py:379-384 semantics as a GB(target).sum)."""
    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.dims import entity_popularity as ep
    from elevant_ray.stages.dims import link_frequencies as lf

    pages = synth_pages(sf_dir).map_batches(extract_batch, batch_format="pyarrow")
    return _det_sort(ep(lf(pages)), "target")


def alias_candidates(sf_dir: str):
    """Alias → sorted distinct candidate set (entity_database.py:264-274),
    list column joined to a string for stable hashing."""
    import pyarrow.compute as _pc2

    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.dims import alias_candidates as ac
    from elevant_ray.stages.dims import link_frequencies as lf

    pages = synth_pages(sf_dir).map_batches(extract_batch, batch_format="pyarrow")

    def fmt(b: pa.Table) -> pa.Table:
        qids = [",".join(x) for x in b.column("qids").to_pylist()]
        return pa.table({
            "alias": b.column("alias"),
            "qids": pa.array(qids, pa.string()),
            "n_candidates": _pc2.list_value_length(b.column("qids")).cast(pa.int64()),
        })

    return _det_sort(ac(lf(pages)).map_batches(fmt, batch_format="pyarrow"), "alias")


def title_synonyms(sf_dir: str):
    """Bold-span title synonym → distinct page-url set over synthesized
    pages (extract_title_synonyms.py group set-union), list joined to a
    string for stable hashing."""
    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.dims import title_synonym_sets

    pages = synth_pages(sf_dir).map_batches(extract_batch, batch_format="pyarrow")
    return _det_sort(title_synonym_sets(pages), "synonym")


def docs_longest(sf_dir: str):
    """Global top-20 documents by token count (§2.7 sort/limit):
    per-batch partial top-20 (the global top-k is contained in the
    union of per-batch top-ks) + driver merge — no global sort
    exchange, and only ≤ 20 rows leave each batch.  Deterministic
    tie-break on doc_id."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import token_count
        texts = b.column("text").to_pylist()
        t = pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array([token_count(t) for t in texts], pa.int64()),
        })
        df = t.to_pandas().sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True],
            kind="stable").head(20)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = [b.to_pandas() for b in ds.map_batches(
        f, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    if not parts:
        parts = [pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                               "n_tokens": pd.Series([], dtype="int64")})]
    allp = pd.concat(parts, ignore_index=True)
    return allp.sort_values(["n_tokens", "doc_id"],
                            ascending=[False, True], kind="stable") \
        .head(20).reset_index(drop=True)


def prior_linking(sf_dir: str):
    """PriorLinker semantics over synthesized pages: link-frequency dims
    built from hyperlinks, then the sliding-window prior kernel in an
    actor-pool stage (stages/scoring.PriorLinkerStage; NOT
    SQL-expressible)."""
    import ray

    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.dims import link_frequencies as lf
    from elevant_ray.stages.dims import to_prior_dicts
    from elevant_ray.stages.scoring import PriorLinkerStage

    pages = synth_pages(sf_dir).map_batches(
        extract_batch, batch_format="pyarrow").materialize()
    dicts = to_prior_dicts(lf(pages))
    lf_ref = ray.put(dicts["link_frequencies"])
    al_ref = ray.put(dicts["entity_aliases"])
    out = pages.select_columns(["url", "text"]).map_batches(
        PriorLinkerStage,
        fn_constructor_kwargs={"link_freq_ref": lf_ref, "aliases_ref": al_ref},
        batch_format="pyarrow", concurrency=(1, 8), batch_size=64)
    return _det_sort(out, ["url", "begin"])


def popular_linking(sf_dir: str):
    """PopularEntitiesLinker semantics over synthesized pages: longest-
    alias NER + lowercase-name trie scan + sitelink argmax (stages/
    popular.py; NOT SQL-expressible).  The synthetic KB: hyperlink
    anchors are both names and aliases of their targets; popularity =
    summed link frequency; min_score lowered to 2 for the small synthetic
    popularity scale."""
    import ray

    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.dims import link_frequencies as lf
    from elevant_ray.stages.dims import to_broadcast_dicts
    from elevant_ray.stages.popular import PopularEntitiesStage

    pages = synth_pages(sf_dir).map_batches(
        extract_batch, batch_format="pyarrow").materialize()
    d = to_broadcast_dicts(lf(pages))
    alias_to_qids = {a: set(qs) for a, qs in d["alias_to_qids"].items()}
    dims_ref = ray.put({
        "name_to_qids": alias_to_qids,
        "alias_to_qids": alias_to_qids,
        "sitelinks": d["popularity"],
    })
    out = pages.select_columns(["url", "text"]).map_batches(
        PopularEntitiesStage,
        fn_constructor_kwargs={"dims_ref": dims_ref, "min_score": 2},
        batch_format="pyarrow", concurrency=(1, 8), batch_size=64)
    return _det_sort(out, ["url", "begin"])


def coref_clusters(sf_dir: str):
    """KB-coref semantics over synthesized pages: hyperlink mentions are
    the linked entities; clusters grow by "the <type>" references (the
    synthetic KB maps each entity to one type whose alias is a corpus
    word).  Exploded cluster-mention rows (stages/coref.py; NOT
    SQL-expressible)."""
    import ray

    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.coref import FEMALE, MALE, NEUTRAL, KBCorefStage

    type_words = ["table", "key", "row", "join", "data"]
    genders = [MALE, FEMALE, NEUTRAL]
    n_entities = 40  # sources/pages.NUM_ENTITIES
    dims_ref = ray.put({
        "gender_map": {f"Entity {k}": genders[k % 3]
                       for k in range(n_entities)},
        "coref_types": {f"Entity {k}": [f"T{k % 5}"]
                        for k in range(n_entities)},
        "type_qid_aliases": {f"T{i}": {w} for i, w in enumerate(type_words)},
    })

    pages = synth_pages(sf_dir).map_batches(extract_batch,
                                            batch_format="pyarrow")

    def as_mentions(b: pa.Table) -> pa.Table:
        ment_type = pa.list_(pa.struct([("begin", pa.int32()),
                                        ("end", pa.int32()),
                                        ("entity_id", pa.string())]))
        ments = [[{"begin": h["begin"], "end": h["end"],
                   "entity_id": h["target"]} for h in hls or ()]
                 for hls in b.column("hyperlinks").to_pylist()]
        return pa.table({"url": b.column("url"), "text": b.column("text"),
                         "mentions": pa.array(ments, ment_type)})

    out = pages.map_batches(as_mentions, batch_format="pyarrow").map_batches(
        KBCorefStage, fn_constructor_kwargs={"dims_ref": dims_ref},
        batch_format="pyarrow", concurrency=(1, 8), batch_size=64)
    return _det_sort(out, ["url", "begin", "end"])


def _shuffle_parts() -> int:
    """Shuffle partition count: half the CPUs, capped.

    Hash-shuffle partitions are backed by aggregator ACTORS that reserve
    CPU slots for the whole execution; partitions ≈ CPUs starves the map
    stages feeding the shuffle (measured 2-4× slowdowns).  Partition
    count should track data volume, not cores — at bench scale a
    handful of partitions already saturates the exchange."""
    import ray

    return min(16, max(8, int(ray.cluster_resources().get("CPU", 8)) // 2))


def linkage_clusters(sf_dir: str):
    """Flagship: blocking + scoring + CC cluster label per url."""
    from elevant_ray.pipelines.record_linkage import cluster_pages, prepare_pages
    from elevant_ray.sources.pages import synth_pages

    # metadata-only emptiness guard (a count() on the raw parquet read
    # is free; materializing the synthesized corpus here would add a
    # full extra pass before the flagship's own pinning)
    if _read(sf_dir, "documents", ["doc_id"]).count() == 0:
        return pa.table({"url": pa.array([], pa.string()),
                         "cluster": pa.array([], pa.string())})
    pages = prepare_pages(synth_pages(sf_dir))
    labels, _ = cluster_pages(pages, num_partitions=_shuffle_parts())
    return _det_sort(labels.rename_columns({"node": "url", "label": "cluster"}), "url")


def entity_linking(sf_dir: str):
    """ELEVANT baseline-linker semantics over synthesized pages:
    hyperlink-anchor mentions → alias candidates → popularity argmax
    (min-QID tie-break).  Gold = the hyperlink target itself, so
    oracle-style accuracy is computable downstream."""
    import ray

    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.dims import link_frequencies as lf
    from elevant_ray.stages.dims import to_broadcast_dicts
    from elevant_ray.stages.scoring import EntityScorer

    # materialize once: the extracted pages feed BOTH the dim build and
    # the mention explode — without the pin the synth+extract lineage
    # executes twice
    pages = (synth_pages(sf_dir)
             .map_batches(extract_batch, batch_format="pyarrow")
             .materialize())
    dims = to_broadcast_dicts(lf(pages))
    a_ref = ray.put(dims["alias_to_qids"])
    p_ref = ray.put(dims["popularity"])

    def mentions(b: pa.Table) -> pa.Table:
        urls, ments, golds = [], [], []
        for url, text, links in zip(b.column("url").to_pylist(),
                                    b.column("text").to_pylist(),
                                    b.column("hyperlinks").to_pylist()):
            for hl in links or ():
                urls.append(url)
                ments.append(text[hl["begin"]:hl["end"]])
                golds.append(hl["target"])
        return pa.table({"url": pa.array(urls, pa.string()),
                         "mention": pa.array(ments, pa.string()),
                         "gold": pa.array(golds, pa.string())})

    ments = pages.map_batches(mentions, batch_format="pyarrow")
    scored = ments.map_batches(
        EntityScorer, fn_constructor_kwargs={
            "alias_to_qids_ref": a_ref, "popularity_ref": p_ref,
            "strategy": "wikipedia", "drop_dates": False},
        batch_format="pyarrow", concurrency=(2, 8), batch_size=1024)
    return _det_sort(scored, ["url", "mention", "gold"])


def linking_eval_counts(sf_dir: str):
    """ELEVANT evaluation aggregate over the linking pipeline: gold =
    hyperlink targets, predictions = popularity-linked mentions →
    (mode, category, kind, value) counts table."""
    import pandas as pd

    from elevant_ray.stages.evaluation import count_cases, evaluate_document

    linked = entity_linking(sf_dir)
    import ray.data

    # entity_linking returns its driver-sorted pa.Table result form;
    # re-wrap as a Dataset for the distributed counting pass
    if not isinstance(linked, ray.data.Dataset):
        linked = ray.data.from_arrow(linked)

    def per_batch(b: pa.Table) -> pa.Table:
        from collections import Counter

        counts = Counter()
        df = b.to_pandas()
        for (url,), g in df.groupby(["url"]):
            labels, preds = [], []
            for i, row in enumerate(g.itertuples(index=False)):
                labels.append({"id": i, "begin": i * 10, "end": i * 10 + 5,
                               "entity_id": row.gold, "name": row.gold,
                               "parent": None, "children": [],
                               "optional": False, "type": "OTHER",
                               "coref": None, "desc": False})
                preds.append({"begin": i * 10, "end": i * 10 + 5,
                              "entity_id": row.pred_qid,
                              "candidates": list(row.candidates),
                              "linked_by": "popularity"})
            text = " " * ((len(labels)) * 10 + 6)
            cases = evaluate_document(text, labels, preds)
            from elevant_ray.functions.errors import label_errors

            for mode in ("IGNORED", "REQUIRED"):
                label_errors(cases, mode=mode)
            counts.update(count_cases(cases))
        keys = sorted(counts)
        return pa.table({
            "mode": pa.array([k[0] for k in keys], pa.string()),
            "category": pa.array([k[1] for k in keys], pa.string()),
            "kind": pa.array([k[2] for k in keys], pa.string()),
            "partial": pa.array([counts[k] for k in keys], pa.int64()),
        })

    from ray.data.aggregate import Sum

    # one url never spans batches after the sort in entity_linking; to be
    # safe the partial counters are still summed by key afterwards
    agg = (linked.map_batches(per_batch, batch_format="pyarrow")
           .groupby(["mode", "category", "kind"])
           .aggregate(Sum("partial", alias_name="value")))
    return _det_sort(agg, ["mode", "category", "kind"])


# ---------------------------------------------------------------------------
# relational extensions: multi-way join, windows, anti-join, histogram
# ---------------------------------------------------------------------------


def local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape: revenue where customer and supplier share a
    nation — a 5-way star join folded into ONE lineitem scan.  All four
    dimension sides (nation, supplier, customer, orders→nation) ship as
    IntKeyMap broadcasts; the cross-dimension equality filter
    (c_nationkey = s_nationkey) is a vectorized mask per batch.  At
    100 TB only the orders side can outgrow the broadcast cutoff — the
    fallback is the same hash-partitioned join used by
    region_revenue."""
    import numpy as np

    from elevant_ray.stages.util import IntKeyMap, np_columns, partial_group_agg

    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}
    nat_names = np.empty((max(nation) + 1) if nation else 0, dtype=object)
    for k, v in nation.items():
        nat_names[k] = v

    s = np_columns(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
                   ["s_suppkey", "s_nationkey"])
    smap = IntKeyMap(s["s_suppkey"], s["s_nationkey"].astype(np.int64))
    c = np_columns(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
                   ["c_custkey", "c_nationkey"])
    cmap = IntKeyMap(c["c_custkey"], c["c_nationkey"].astype(np.int64))
    o = np_columns(_read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
                   ["o_orderkey", "o_custkey"])
    omap = IntKeyMap(o["o_orderkey"], cmap.take_checked(o["o_custkey"]))

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def f(b: pa.Table) -> pa.Table:
        c_nat = omap.take_checked(
            b.column("l_orderkey").to_numpy(zero_copy_only=False))
        s_nat = smap.take_checked(
            b.column("l_suppkey").to_numpy(zero_copy_only=False))
        m = c_nat == s_nat
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)[m]
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)[m]
        return pa.table({
            "n_name": pa.array(nat_names[s_nat[m]], pa.string()),
            "rev": pa.array(price * (1.0 - disc), pa.float64())})

    agg = partial_group_agg(line.map_batches(f, batch_format="pyarrow"),
                            ["n_name"], sum_cols=["rev"], combine="driver")
    out = agg[["n_name"]].copy()
    out["revenue"] = agg["rev"].round(2)
    return out


def events_user_gaps(sf_dir: str):
    """Per-user lag() window: inter-event gap statistics.  One hash
    shuffle on user_id buckets (util.bucketed_group_apply), then a
    single vectorized pandas groupby-diff per bucket — the engine's
    standard per-key window pattern (no per-key map_groups)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gaps = g.groupby("user_id")["ts"].diff().dt.total_seconds()
        out = g.assign(gap=gaps).groupby("user_id", as_index=False).agg(
            n_events=("ts", "size"),
            avg_gap_sec=("gap", "mean"),
            max_gap_sec=("gap", "max"))
        out = out[out["n_events"] >= 2]
        # gaps are exact multiples of 1e-6 s (µs timestamps), so .xxx5
        # boundaries DO occur: round half-away-from-zero like SQL ROUND,
        # not banker's (numpy .round flipped one row at sf0.01)
        import numpy as np

        for c in ("avg_gap_sec", "max_gap_sec"):
            out[c] = np.floor(out[c] * 1e3 + 0.5) / 1e3
        return out

    from elevant_ray.stages.util import bucketed_group_apply

    return _det_sort(bucketed_group_apply(ds, "user_id", per_bucket),
                     "user_id")


def orders_rank_in_customer(sf_dir: str):
    """row_number() OVER (PARTITION BY custkey ORDER BY totalprice DESC,
    orderkey) — per-key rank via one bucket shuffle + vectorized
    sort/cumcount per bucket."""
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="stable")
        g["rnk"] = g.groupby("o_custkey").cumcount() + 1
        return g[["o_custkey", "o_orderkey", "o_totalprice", "rnk"]]

    from elevant_ray.stages.util import bucketed_group_apply

    return _det_sort(bucketed_group_apply(ds, "o_custkey", per_bucket),
                     ["o_custkey", "rnk"])


def customers_inactive(sf_dir: str):
    """Anti-join (NOT EXISTS): customers with no order in 1997H1,
    aggregated per market segment.  The probe side (distinct active
    custkeys in the window) is bounded by customer cardinality, so it
    ships as a broadcast IntKeyMap membership mask; beyond the
    broadcast cutoff the scale path is a hash-partitioned cogroup
    anti-join (util.cogroup_join with an anti merge)."""
    import datetime

    import numpy as np

    from elevant_ray.stages.util import IntKeyMap, np_columns, partial_group_agg

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def window(b: pa.Table) -> pa.Table:
        lo = pa.scalar(datetime.datetime(1997, 1, 1))
        hi = pa.scalar(datetime.datetime(1997, 7, 1))
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        return b.filter(m).select(["o_custkey"])

    active = np.unique(np_columns(
        orders.map_batches(window, batch_format="pyarrow"), ["o_custkey"])
        ["o_custkey"])
    amap = IntKeyMap(active)

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_acctbal"])

    def anti(b: pa.Table) -> pa.Table:
        hit = amap.contains(
            b.column("c_custkey").to_numpy(zero_copy_only=False))
        return b.filter(pa.array(~hit)).select(["c_mktsegment", "c_acctbal"])

    agg = partial_group_agg(cust.map_batches(anti, batch_format="pyarrow"),
                            ["c_mktsegment"], sum_cols=["c_acctbal"],
                            count_alias="n_customers", combine="driver")
    out = agg[["c_mktsegment", "n_customers"]].copy()
    out["total_acctbal"] = agg["c_acctbal"].round(2)
    return out


def orders_price_histogram(sf_dir: str):
    """Fixed-width histogram over o_totalprice (bin = floor(price/25k))
    — binning is a per-batch vectorized map, counting the standard
    two-phase partial aggregate."""
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def binify(b: pa.Table) -> pa.Table:
        price = b.column("o_totalprice")
        bins = pc.cast(pc.floor(pc.divide(price, pa.scalar(25000.0))),
                       pa.int64())
        return pa.table({"bin": bins, "total": price})

    agg = partial_group_agg(ds.map_batches(binify, batch_format="pyarrow"),
                            ["bin"], sum_cols=["total"],
                            count_alias="n_orders", combine="driver")
    out = agg[["bin", "n_orders"]].copy()
    out["total"] = agg["total"].round(2)
    return out


# ---------------------------------------------------------------------------
# text / vector / sketch extensions
# ---------------------------------------------------------------------------


def doc_tfidf_top3(sf_dir: str):
    """Per-document top-3 unigrams by tf·idf — the canonical
    training-data relevance score.  Two scans of documents, one tiny
    aggregate: (1) per-batch document-frequency partials (Counter over
    each doc's unique unigrams) combined into the df table, broadcast
    as an idf dict via ray.put + util.cached_get (vocab-bounded; at
    open-web vocab sizes the scale path is a hashed-vocab cogroup
    join); (2) per-doc scores tf·ln(N/df), top-3 by (score desc, token
    asc)."""
    import math
    from collections import Counter

    import ray

    from elevant_ray.functions.tokens import UNIGRAM_RE
    from elevant_ray.stages.util import cached_get, partial_group_agg

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def df_partial(b: pa.Table) -> pa.Table:
        c = Counter()
        for t in b.column("text").to_pylist():
            c.update(set(UNIGRAM_RE.findall(t.lower())))
        toks = sorted(c)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "df_p": pa.array([c[t] for t in toks], pa.int64())})

    df = partial_group_agg(docs.map_batches(df_partial, batch_format="pyarrow"),
                           ["token"], sum_cols=["df_p"], combine="driver")
    idf_ref = ray.put({t: math.log(n_docs / d) for t, d in
                       zip(df["token"], df["df_p"])})

    def top3(b: pa.Table) -> pa.Table:
        idf = cached_get(idf_ref)
        out_id, out_tok, out_score = [], [], []
        for did, t in zip(b.column("doc_id").to_pylist(),
                          b.column("text").to_pylist()):
            c = Counter(UNIGRAM_RE.findall(t.lower()))
            best = sorted(((tf * idf[tok], tok) for tok, tf in c.items()),
                          key=lambda x: (-x[0], x[1]))[:3]
            for sc, tok in best:
                out_id.append(did)
                out_tok.append(tok)
                out_score.append(round(sc, 6))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "token": pa.array(out_tok, pa.string()),
                         "score": pa.array(out_score, pa.float64())})

    return _det_sort(docs.map_batches(top3, batch_format="pyarrow"),
                     ["doc_id", "token"])


def embedding_centroids(sf_dir: str):
    """Per-label centroid of the embedding column — grouped vector mean
    in long form (label, dim, centroid).  Per batch: one np.add.at
    scatter into a labels×dim float64 accumulator (zero Python loops
    over rows), then the partial sums/counts combine through the
    standard two-phase aggregate."""
    import numpy as np

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        labels = b.column("label").to_numpy(zero_copy_only=False)
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = len(col[0])
        vecs = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(len(b), dim)
        uniq, inv = np.unique(labels, return_inverse=True)
        acc = np.zeros((len(uniq), dim), dtype=np.float64)
        np.add.at(acc, inv, vecs)
        cnt = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "label": pa.array(np.repeat(uniq.astype(np.int64), dim)),
            "dim": pa.array(np.tile(np.arange(1, dim + 1), len(uniq)),
                            pa.int64()),
            "s": pa.array(acc.ravel(), pa.float64()),
            "n": pa.array(np.repeat(cnt, dim).astype(np.int64))})

    agg = partial_group_agg(ds.map_batches(partial, batch_format="pyarrow"),
                            ["label", "dim"], sum_cols=["s", "n"],
                            combine="driver")
    out = agg[["label", "dim"]].copy()
    out["centroid"] = (agg["s"] / agg["n"]).round(6)
    return out


def small_quantity_revenue(sf_dir: str):
    """Correlated aggregate (TPC-H Q17 shape): revenue from lineitems
    whose quantity is below 20% of their part's average, per brand.
    The per-part average ships as broadcast (sum, count) maps so the
    correlated predicate becomes a vectorized mask — compared in exact
    integer-valued-double arithmetic (qty·cnt·5 < tot) so Ray and the
    SQL oracle agree bit-for-bit at the boundary."""
    import numpy as np

    from elevant_ray.stages.util import IntKeyMap, np_columns, partial_group_agg

    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partial(b: pa.Table) -> pa.Table:
        return pa.table({"pk": b.column("l_partkey"),
                         "tot": b.column("l_quantity"),
                         "one": pa.array(np.ones(b.num_rows, np.int64))})

    pagg = partial_group_agg(
        line.map_batches(qty_partial, batch_format="pyarrow"),
        ["pk"], sum_cols=["tot", "one"], combine="driver")
    tot_map = IntKeyMap(pagg["pk"].to_numpy(), pagg["tot"].to_numpy())
    cnt_map = IntKeyMap(pagg["pk"].to_numpy(),
                        pagg["one"].to_numpy().astype(np.int64))

    p = np_columns(_read(sf_dir, "part", ["p_partkey", "p_brand"]),
                   ["p_partkey", "p_brand"])
    brand_map = IntKeyMap(p["p_partkey"], p["p_brand"])

    def sel(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        tot = tot_map.take_checked(pk)
        cnt = cnt_map.take_checked(pk)
        m = qty * cnt * 5 < tot
        return pa.table({
            "p_brand": pa.array(brand_map.take_checked(pk[m]), pa.string()),
            "price": pa.array(
                b.column("l_extendedprice").to_numpy(zero_copy_only=False)[m],
                pa.float64())})

    agg = partial_group_agg(line.map_batches(sel, batch_format="pyarrow"),
                            ["p_brand"], sum_cols=["price"],
                            count_alias="n_items", combine="driver")
    out = agg[["p_brand"]].copy()
    out["avg_yearly"] = (agg["price"] / 7.0).round(2)
    out["n_items"] = agg["n_items"].astype("int64")
    return out


def events_prop_buckets(sf_dir: str):
    """Semi-structured extraction: parse the JSON ``props`` column,
    bucket the extracted integer field, aggregate per bucket — the
    web-payload metadata-parsing shape (per-batch Python json.loads is
    the honest kernel; the SQL oracle reproduces it with a regex
    extract so no DuckDB JSON extension is needed offline)."""
    import json as _json

    import numpy as np

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["props", "value"])

    def extract(b: pa.Table) -> pa.Table:
        ks = np.fromiter((_json.loads(s)["k"]
                          for s in b.column("props").to_pylist()),
                         dtype=np.int64, count=b.num_rows)
        return pa.table({"k_bucket": pa.array(ks // 10, pa.int64()),
                         "value": b.column("value")})

    agg = partial_group_agg(ds.map_batches(extract, batch_format="pyarrow"),
                            ["k_bucket"], sum_cols=["value"],
                            count_alias="n", combine="driver")
    out = agg[["k_bucket", "n"]].copy()
    out["total_value"] = agg["value"].round(2)
    return out


def docs_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: per-language rates (en 10%,
    de 50%, other 20%) by salted md5 bucket — content-stable under
    repartitioning, no shuffle, and reproducible in SQL (the engine's
    seeded-sampling replacement, like split_assign for splits)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def f(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        langs = b.column("lang").to_pylist()
        keep = []
        for i, lg in zip(ids, langs):
            bucket = int(hashlib.md5(f"{lg}|{i}".encode()).hexdigest()[:6],
                         16) % 100
            rate = 10 if lg == "en" else 50 if lg == "de" else 20
            keep.append(bucket < rate)
        return b.filter(pa.array(keep, pa.bool_()))

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def doc_chunks(sf_dir: str):
    """Fixed-size token chunking with overlap (window 100, stride 80) —
    the training-data chunk/pack step.  Chunk boundaries computed
    vectorized per batch (np.repeat + arange over per-doc chunk counts);
    chunks exist while begin < n_tokens, so every non-empty doc gets
    ceil(n/stride) chunks."""
    import numpy as np

    WINDOW, STRIDE = 100, 80
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import token_count

        n = np.array([token_count(t) for t in b.column("text").to_pylist()],
                     dtype=np.int64)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        counts = -(-n // STRIDE)  # ceil(n/stride); 0 chunks for empty docs
        tot = int(counts.sum())
        rep_id = np.repeat(ids, counts)
        rep_n = np.repeat(n, counts)
        chunk_id = np.arange(tot) - np.repeat(
            np.cumsum(counts) - counts, counts)
        begin = chunk_id * STRIDE
        end = np.minimum(begin + WINDOW, rep_n)
        return pa.table({"doc_id": pa.array(rep_id, pa.int64()),
                         "chunk_id": pa.array(chunk_id, pa.int64()),
                         "begin_tok": pa.array(begin, pa.int64()),
                         "end_tok": pa.array(end, pa.int64())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"),
                     ["doc_id", "chunk_id"])


def customer_order_counts(sf_dir: str):
    """LEFT OUTER join: every customer with their 1996 order count,
    zero-filled for customers with none.  The aggregate side collapses
    to a per-key count BEFORE the join (partial_group_agg), so the
    outer join itself is a broadcast take with a 0 default — no outer
    shuffle join at any scale where the grouped side fits; beyond that
    the cogroup join carries a null-fill merge."""
    import datetime

    import numpy as np

    from elevant_ray.stages.util import IntKeyMap, partial_group_agg

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def window(b: pa.Table) -> pa.Table:
        lo = pa.scalar(datetime.datetime(1996, 1, 1))
        hi = pa.scalar(datetime.datetime(1997, 1, 1))
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        return b.filter(m).select(["o_custkey"])

    cnt = partial_group_agg(
        orders.map_batches(window, batch_format="pyarrow"),
        ["o_custkey"], count_alias="n", combine="driver")
    if cnt is None or len(cnt) == 0:
        cmap = IntKeyMap(np.array([], np.int64), np.array([], np.int64))
    else:
        cmap = IntKeyMap(cnt["o_custkey"].to_numpy(),
                         cnt["n"].to_numpy().astype(np.int64))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def fill(b: pa.Table) -> pa.Table:
        vals, found = cmap.take(
            b.column("c_custkey").to_numpy(zero_copy_only=False))
        n = np.where(found, vals, 0)
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "c_mktsegment": b.column("c_mktsegment"),
                         "n_orders": pa.array(n, pa.int64())})

    return _det_sort(cust.map_batches(fill, batch_format="pyarrow"),
                     "c_custkey")


def repeat_customers(sf_dir: str):
    """Set intersection (INTERSECT): customers active in both 1996 and
    1997 — customer_except's broadcast-membership pattern with the
    mask flipped."""
    import datetime

    import numpy as np

    from elevant_ray.stages.util import IntKeyMap, np_columns

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def in_range(lo, hi):
        def f(b: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
                pc.less(b.column("o_orderdate"), pa.scalar(hi)))
            return b.filter(m).select(["o_custkey"])
        return f

    y96 = datetime.datetime(1996, 1, 1)
    y97 = datetime.datetime(1997, 1, 1)
    y98 = datetime.datetime(1998, 1, 1)
    cust97 = IntKeyMap(np.unique(np_columns(
        ds.map_batches(in_range(y97, y98), batch_format="pyarrow"),
        ["o_custkey"])["o_custkey"]))

    def semi(b: pa.Table) -> pa.Table:
        keep = cust97.contains(
            b.column("o_custkey").to_numpy(zero_copy_only=False))
        return b.filter(pa.array(keep))

    kept = (ds.map_batches(in_range(y96, y97), batch_format="pyarrow")
            .map_batches(semi, batch_format="pyarrow"))
    return _det_sort(_distinct_int(kept, "o_custkey"), "o_custkey")


def doc_token_quantiles_approx(sf_dir: str):
    """Approximate per-language token-count quantiles via the
    rank-stratified mergeable summary (stages/sketches.approx_quantiles)
    — rows-only; the ≤5%-of-exact gate lives in tests/test_sketches.py."""
    from elevant_ray.stages.sketches import approx_quantiles

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def f(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import token_count

        n = [token_count(t) for t in b.column("text").to_pylist()]
        return pa.table({"lang": b.column("lang"),
                         "n_tokens": pa.array(n, pa.int64())})

    counts = ds.map_batches(f, batch_format="pyarrow")
    return approx_quantiles(counts, "n_tokens", (0.5, 0.9, 0.99),
                            group_cols=["lang"])


def user_top_event(sf_dir: str):
    """Grouped mode: each user's most frequent event type (ties → the
    lexicographically smallest type, the reference's deterministic
    tie-break discipline).  One two-phase count on the bounded
    (user, type) key, argmax on the driver."""
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    cnt = partial_group_agg(ds, ["user_id", "event_type"],
                            count_alias="n", combine="driver")
    cnt = cnt.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="stable")
    top = cnt.drop_duplicates("user_id").reset_index(drop=True)
    top["n"] = top["n"].astype("int64")
    return top[["user_id", "event_type", "n"]]


def events_moving_avg(sf_dir: str):
    """Window frame (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW): 3-event
    moving average of value per user, ordered by (ts, event_id) — one
    bucket shuffle, vectorized pandas rolling per bucket."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ma = (g.groupby("user_id")["value"]
              .rolling(3, min_periods=1).mean().reset_index(drop=True))
        out = g[["user_id", "event_id"]].copy()
        out["moving_avg"] = np.floor(ma.to_numpy() * 1e4 + 0.5) / 1e4
        return out

    from elevant_ray.stages.util import bucketed_group_apply

    return _det_sort(bucketed_group_apply(ds, "user_id", per_bucket),
                     ["user_id", "event_id"])


def events_heavy_hitters(sf_dir: str):
    """Approximate top-10 users by event count via a Misra-Gries
    mergeable summary + exact recount of survivors
    (stages/sketches.heavy_hitters).  Rows-only contract entry; the
    ≥-guarantee (every user with freq > N/capacity present, counts
    exact) is gated in tests/test_sketches.py."""
    from elevant_ray.stages.sketches import heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    return heavy_hitters(ds, "user_id", k=10, capacity=64)


def bigram_counts(sf_dir: str):
    """Order-2 n-gram counts (language-model build step): per-batch
    partial Counters → small (w1, w2) shuffle (stages/text_stats);
    result ordering via _det_sort (driver-side under the cutoff)."""
    from elevant_ray.stages.text_stats import bigram_counts as bc

    return _det_sort(bc(_read(sf_dir, "documents", ["text"]), sort=False),
                     ["w1", "w2"])


def customer_ntile(sf_dir: str):
    """NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal,
    c_custkey): equal-depth quartile assignment per segment.  One bucket
    shuffle co-locates each segment, then the exact NTILE split (first
    n%4 tiles get one extra row) is computed vectorized from per-segment
    rank and size — no per-row Python."""
    import pandas as pd

    ds = _read(sf_dir, "customer",
               ["c_custkey", "c_mktsegment", "c_acctbal"])

    from elevant_ray.stages.util import bucketed_group_apply, ntile_assign

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_mktsegment", "c_acctbal", "c_custkey"],
                          kind="stable")
        grp = g.groupby("c_mktsegment")
        out = g[["c_custkey", "c_mktsegment", "c_acctbal"]].copy()
        out["tile"] = ntile_assign(
            grp["c_custkey"].transform("size").to_numpy(),
            grp.cumcount().to_numpy(), 4)
        return out

    return _det_sort(bucketed_group_apply(ds, "c_mktsegment", per_bucket),
                     ["c_mktsegment", "tile", "c_custkey"])


def lineitem_price_corr(sf_dir: str):
    """Grouped Pearson correlation of quantity vs extended price per
    return flag — the canonical mergeable-moments aggregate: one scan
    emits per-batch partial (n, Σx, Σy, Σxy, Σx², Σy²), the driver
    combines the ≤ groups × blocks partial rows and closes the corr
    formula.  Exactly associative; no second pass over the fact table."""
    import numpy as np

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column("l_quantity"), pa.float64())
        y = pc.cast(b.column("l_extendedprice"), pa.float64())
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "sx": x, "sy": y,
            "sxy": pc.multiply(x, y),
            "sx2": pc.multiply(x, x),
            "sy2": pc.multiply(y, y),
        })

    agg = partial_group_agg(ds.map_batches(moments, batch_format="pyarrow"),
                            ["l_returnflag"],
                            sum_cols=["sx", "sy", "sxy", "sx2", "sy2"],
                            count_alias="n_rows", combine="driver")
    from elevant_ray.stages.util import pearson_from_moments

    corr = pearson_from_moments(agg["n_rows"], agg["sx"], agg["sy"],
                                agg["sxy"], agg["sx2"], agg["sy2"])
    out = agg[["l_returnflag"]].copy()
    # half-away-from-zero to match SQL ROUND; sign-aware since corr < 0
    out["price_qty_corr"] = (
        np.sign(corr) * np.floor(np.abs(corr) * 1e6 + 0.5) / 1e6)
    out["n_rows"] = agg["n_rows"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def orders_yearly_growth(sf_dir: str):
    """Window over an aggregate: yearly revenue with year-over-year
    delta.  The fact scan reduces to one tiny per-year partial table
    (integer cents for associative exactness); the lag() runs on the
    driver over ≤ a few dozen year rows."""
    import numpy as np

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "year": pc.cast(pc.year(b.column("o_orderdate")), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"), pa.scalar(100.0))), pa.int64()),
        })

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["year"], sum_cols=["cents"],
                            count_alias="n_orders", combine="driver")
    agg = agg.sort_values("year").reset_index(drop=True)
    rev = agg["cents"].to_numpy(dtype=np.int64)
    delta = np.concatenate(([0], np.diff(rev))) if len(rev) else rev
    out = agg[["year"]].copy()
    out["revenue"] = rev / 100.0
    out["n_orders"] = agg["n_orders"].astype("int64")
    # first year has no predecessor: COALESCE(..., 0) in the oracle too
    out["yoy_delta"] = delta / 100.0
    out["year"] = out["year"].astype("int64")
    return out


def q22_sales_opportunity(sf_dir: str):
    """TPC-H Q22 shape: customers whose balance exceeds the global
    positive-balance average and who placed no order since 1998,
    counted per segment.  The scalar subquery is one mergeable
    (Σcents, n) partial reduce broadcast back into the scan; the
    NOT-EXISTS side is a distinct custkey membership mask (bounded by
    customer cardinality — IntKeyMap broadcast, same discipline as
    customers_inactive).  The threshold compare runs in exact integer
    arithmetic (cents · n > Σcents) so no float boundary can flip a
    row."""
    import datetime

    import numpy as np

    from elevant_ray.stages.util import (
        IntKeyMap, np_columns, partial_group_agg,
    )

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_acctbal"])

    def pos_partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b.column("c_acctbal"), pa.scalar(100.0))), pa.int64())
        keep = pc.greater(cents, pa.scalar(0, pa.int64()))
        cents = pc.filter(cents, keep)
        return pa.table({"k": pa.array([0] * len(cents), pa.int8()),
                         "cents": cents})

    pos = partial_group_agg(cust.map_batches(pos_partial,
                                             batch_format="pyarrow"),
                            ["k"], sum_cols=["cents"], count_alias="n",
                            combine="driver")
    if len(pos) == 0:
        scents, n_pos = 0, 0
    else:
        scents = int(pos["cents"].iloc[0])
        n_pos = int(pos["n"].iloc[0])

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b.column("o_orderdate"),
                                pa.scalar(datetime.datetime(1998, 1, 1)))
        return b.filter(keep).select(["o_custkey"])

    active = np.unique(np_columns(
        orders.map_batches(recent, batch_format="pyarrow"),
        ["o_custkey"])["o_custkey"])
    amap = IntKeyMap(active)

    def pick(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b.column("c_acctbal"), pa.scalar(100.0))), pa.int64())
        above = pc.greater(pc.multiply(cents, pa.scalar(n_pos, pa.int64())),
                           pa.scalar(scents, pa.int64()))
        no_orders = ~amap.contains(
            b.column("c_custkey").to_numpy(zero_copy_only=False))
        m = pc.and_(above, pa.array(no_orders))
        return pa.table({
            "c_mktsegment": pc.filter(b.column("c_mktsegment"), m),
            "cents": pc.filter(cents, m),
        })

    agg = partial_group_agg(cust.map_batches(pick, batch_format="pyarrow"),
                            ["c_mktsegment"], sum_cols=["cents"],
                            count_alias="n_cust", combine="driver")
    out = agg[["c_mktsegment"]].copy()
    out["n_cust"] = agg["n_cust"].astype("int64")
    out["total_bal"] = agg["cents"] / 100.0
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def part_min_cost_supplier(sf_dir: str):
    """Per-part argmin join (TPC-H Q2 shape on lineitem): for every part,
    the cheapest extended price seen and the smallest supplier key
    achieving it, joined to the supplier name.  Two-phase argmin: each
    batch reduces to one candidate row per part (lexicographic
    (price, suppkey) min via vectorized sort + drop_duplicates), then one
    bucket shuffle finishes the reduction per part; the supplier
    dimension broadcasts as an IntKeyMap."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (
        IntKeyMap, bucketed_group_apply, partial_group_agg,
    )

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).take_all()
    skeys = np.fromiter((r["s_suppkey"] for r in sup), dtype=np.int64,
                        count=len(sup))
    smap = IntKeyMap(skeys, np.array([r["s_name"] for r in sup],
                                     dtype=object))

    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])

    def reduce_frame(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_partkey", "l_extendedprice", "l_suppkey"],
                          kind="stable")
        return g.drop_duplicates("l_partkey")

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(reduce_frame(b.to_pandas()),
                                    preserve_index=False)

    reduced = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        "l_partkey", reduce_frame)

    def finish(b: pa.Table) -> pa.Table:
        names = smap.take_checked(
            b.column("l_suppkey").to_numpy(zero_copy_only=False))
        return pa.table({
            "p_partkey": b.column("l_partkey"),
            "min_price": b.column("l_extendedprice"),
            "supplier_name": pa.array(names, pa.string()),
        })

    return _det_sort(reduced.map_batches(finish, batch_format="pyarrow"),
                     ["p_partkey"])


def nation_segment_cube(sf_dir: str):
    """CUBE(nationkey, segment) over customers: all four grouping sets
    (fine, two marginals, grand total) derived from ONE scan — the fine
    (nation, segment) partial aggregate is dimension-bounded, so the
    coarser levels re-aggregate it on the driver instead of re-scanning
    the fact table (same discipline as nation_region_rollup).  Sentinels:
    nationkey −1 / segment 'ALL'."""
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment",
                                    "c_acctbal"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
            "segment": b.column("c_mktsegment"),
            "cents": pc.cast(pc.round(pc.multiply(
                b.column("c_acctbal"), pa.scalar(100.0))), pa.int64()),
        })

    fine = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                             ["nationkey", "segment"], sum_cols=["cents"],
                             count_alias="n_cust", combine="driver")
    if fine.empty:
        # SQL CUBE over an empty table still yields the () grouping set
        return pd.DataFrame({"nationkey": pd.array([-1], dtype="int64"),
                             "segment": ["ALL"],
                             "n_cust": pd.array([0], dtype="int64"),
                             "bal_cents": pd.array([0], dtype="int64")})
    by_nation = fine.groupby("nationkey", as_index=False).agg(
        n_cust=("n_cust", "sum"), cents=("cents", "sum"))
    by_nation["segment"] = "ALL"
    by_seg = fine.groupby("segment", as_index=False).agg(
        n_cust=("n_cust", "sum"), cents=("cents", "sum"))
    by_seg["nationkey"] = -1
    total = pd.DataFrame({"nationkey": [-1], "segment": ["ALL"],
                          "n_cust": [fine["n_cust"].sum()],
                          "cents": [fine["cents"].sum()]})
    out = pd.concat([fine, by_nation, by_seg, total], ignore_index=True)
    out["nationkey"] = out["nationkey"].astype("int64")
    out["n_cust"] = out["n_cust"].astype("int64")
    out["bal_cents"] = out["cents"].astype("int64")
    return (out[["nationkey", "segment", "n_cust", "bal_cents"]]
            .sort_values(["nationkey", "segment"]).reset_index(drop=True))


def party_nations_union(sf_dir: str):
    """UNION (distinct) set-op: every nation key appearing on either the
    customer or the supplier side.  ``Dataset.union`` concatenates the
    two projected scans lazily (no shuffle); the distinct is one bounded
    key dedup (_distinct_int — driver np.unique under the cutoff, the
    distributed groupby above it)."""
    def proj(table: str, col: str):
        ds = _read(sf_dir, table, [col])

        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {"nationkey": pc.cast(b.column(col), pa.int64())})

        return ds.map_batches(f, batch_format="pyarrow")

    u = proj("customer", "c_nationkey").union(proj("supplier", "s_nationkey"))
    return _det_sort(_distinct_int(u, "nationkey"), ["nationkey"])


def brand_names_concat(sf_dir: str):
    """Ordered grouped string concatenation (string_agg ... ORDER BY):
    per brand, all part names joined '|' in part-key order.  One bucket
    shuffle co-locates each brand; the concat is a vectorized pandas
    sort + groupby-join per bucket, never a per-row Python loop."""
    import pandas as pd

    ds = _read(sf_dir, "part", ["p_brand", "p_partkey", "p_name"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_brand", "p_partkey"], kind="stable")
        out = g.groupby("p_brand", as_index=False).agg(
            names=("p_name", "|".join),
            n_parts=("p_name", "size"))
        out["n_parts"] = out["n_parts"].astype("int64")
        return out

    from elevant_ray.stages.util import bucketed_group_apply

    return _det_sort(bucketed_group_apply(ds, "p_brand", per_bucket),
                     ["p_brand"])


def orders_weekly_gapfill(sf_dir: str):
    """Time-spine gap fill: weekly order counts INCLUDING zero weeks —
    the resample step of a time-series pipeline.  The fact scan reduces
    to per-week partials (week = date_trunc); the spine (bounded:
    weeks between global min and max) is generated on the driver and
    left-joined against the tiny aggregate there."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def pre(b: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(b.column("o_orderdate"), unit="week")
        return pa.table({"week": pc.cast(wk, pa.timestamp("us"))})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["week"], count_alias="n_orders",
                            combine="driver")
    if agg.empty:
        return pd.DataFrame({"week": pd.Series([], dtype="datetime64[us]"),
                             "n_orders": pd.Series([], dtype="int64")})
    agg["week"] = pd.to_datetime(agg["week"])
    spine = pd.DataFrame({"week": pd.date_range(
        agg["week"].min(), agg["week"].max(), freq="7D")})
    out = spine.merge(agg, on="week", how="left")
    out["n_orders"] = np.nan_to_num(
        out["n_orders"].to_numpy(dtype=np.float64)).astype("int64")
    out["week"] = out["week"].astype("datetime64[us]")
    return out.sort_values("week").reset_index(drop=True)


def user_event_entropy(sf_dir: str):
    """Shannon entropy of each user's event-type distribution — the
    information-theoretic grouped aggregate (a behavioral-diversity /
    bot-detection feature at corpus scale).  One two-phase count on the
    bounded (user, type) key; the entropy closes vectorized on the
    driver from the count partials (−Σ p·log₂p per user via one
    np.add.at scatter, no per-user Python loop)."""
    import numpy as np

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    cnt = partial_group_agg(ds, ["user_id", "event_type"],
                            count_alias="n", combine="driver")
    if cnt.empty:
        import pandas as pd

        return pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "entropy": pd.Series([], dtype="float64"),
            "n_events": pd.Series([], dtype="int64")})
    users, inv = np.unique(cnt["user_id"].to_numpy(), return_inverse=True)
    n = cnt["n"].to_numpy(dtype=np.float64)
    tot = np.zeros(len(users))
    np.add.at(tot, inv, n)
    p = n / tot[inv]
    h = np.zeros(len(users))
    np.add.at(h, inv, -p * np.log2(p))
    # +0.0 normalizes IEEE −0.0 (single-type users) to +0.0, matching
    # the oracle's `+ 0`; half-away rounding is moot for h ≥ 0
    h = np.floor(h * 1e6 + 0.5) / 1e6 + 0.0
    import pandas as pd

    return pd.DataFrame({"user_id": users.astype("int64"), "entropy": h,
                         "n_events": tot.astype("int64")})


def doc_token_quartiles_cont(sf_dir: str):
    """Interpolated (continuous) per-language token-count quartiles —
    quantile_cont, the linear-interpolation counterpart of the exact
    percentile_disc stage.  Quartile fractions are dyadic (k/4), so the
    interpolated values are exactly representable doubles and the
    oracle compares bit-exact.  Long-format result, one bucket shuffle
    per language."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def f(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import token_count

        n = [token_count(t) for t in b.column("text").to_pylist()]
        return pa.table({"lang": b.column("lang"),
                         "n_tokens": pa.array(n, pa.int64())})

    counts = ds.map_batches(f, batch_format="pyarrow")

    QS = (0.25, 0.5, 0.75)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, sub in g.groupby("lang"):
            v = np.sort(sub["n_tokens"].to_numpy(dtype=np.float64))
            qv = np.quantile(v, QS, method="linear")
            rows.append(pd.DataFrame(
                {"lang": lang, "q": QS, "n_tokens": qv}))
        return (pd.concat(rows, ignore_index=True) if rows
                else pd.DataFrame({"lang": pd.Series([], dtype="object"),
                                   "q": pd.Series([], dtype="float64"),
                                   "n_tokens": pd.Series([], dtype="float64")}))

    from elevant_ray.stages.util import bucketed_group_apply

    return _det_sort(bucketed_group_apply(counts, "lang", per_bucket),
                     ["lang", "q"])


def orders_priority_dense_rank(sf_dir: str):
    """dense_rank() OVER (PARTITION BY custkey ORDER BY priority): tied
    rows share a rank and ranks stay contiguous (contrast
    orders_rank_in_customer's row_number).  One bucket shuffle, pandas
    C-level dense rank per bucket."""
    import pandas as pd

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderpriority"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["rnk"] = (g.groupby("o_custkey")["o_orderpriority"]
                    .rank(method="dense").astype("int64"))
        return g[["o_custkey", "o_orderkey", "o_orderpriority", "rnk"]]

    from elevant_ray.stages.util import bucketed_group_apply

    return _det_sort(bucketed_group_apply(ds, "o_custkey", per_bucket),
                     ["o_custkey", "o_orderkey"])


def nation_balance_stddev(sf_dir: str):
    """Grouped sample standard deviation from mergeable moments
    (n, Σx, Σx²) — one scan, driver close (same discipline as
    lineitem_price_corr)."""
    import numpy as np

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def pre(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column("s_acctbal"), pa.float64())
        return pa.table({
            "nationkey": pc.cast(b.column("s_nationkey"), pa.int64()),
            "sx": x, "sx2": pc.multiply(x, x)})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["nationkey"], sum_cols=["sx", "sx2"],
                            count_alias="n", combine="driver")
    n = agg["n"].to_numpy(dtype=np.float64)
    vx = n * agg["sx2"].to_numpy() - agg["sx"].to_numpy() ** 2
    with np.errstate(invalid="ignore", divide="ignore"):
        sd = np.sqrt(np.maximum(vx, 0.0) / (n * (n - 1)))
    sd = np.where(n > 1, sd, np.nan)
    out = agg[["nationkey"]].copy()
    out["nationkey"] = out["nationkey"].astype("int64")
    out["stddev_bal"] = np.floor(sd * 1e6 + 0.5) / 1e6
    out["n_suppliers"] = agg["n"].astype("int64")
    return out.sort_values("nationkey").reset_index(drop=True)


def returnflag_weighted_avg(sf_dir: str):
    """Ratio-of-sums aggregate: quantity-weighted average extended price
    per return flag — two mergeable sums closed on the driver (never a
    per-row division)."""
    import numpy as np

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def pre(b: pa.Table) -> pa.Table:
        q = pc.cast(b.column("l_quantity"), pa.float64())
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "wsum": pc.multiply(b.column("l_extendedprice"), q),
            "w": q})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["l_returnflag"], sum_cols=["wsum", "w"],
                            combine="driver")
    out = agg[["l_returnflag"]].copy()
    wavg = agg["wsum"].to_numpy() / agg["w"].to_numpy()
    out["wavg_price"] = np.floor(wavg * 1e6 + 0.5) / 1e6
    return out.sort_values("l_returnflag").reset_index(drop=True)


def customer_running_max(sf_dir: str):
    """Cumulative window max: each order's running maximum total price
    within its customer history (ordered by date, then key).  One
    bucket shuffle + vectorized per-key cummax; raw prices pass through
    untouched so the oracle compares bit-exact."""
    import pandas as pd

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="stable")
        g["running_max"] = g.groupby("o_custkey")["o_totalprice"].cummax()
        return g[["o_custkey", "o_orderkey", "o_orderdate", "running_max"]]

    from elevant_ray.stages.util import bucketed_group_apply

    return _ts_us(_det_sort(bucketed_group_apply(ds, "o_custkey",
                                                 per_bucket),
                            ["o_custkey", "o_orderkey"]), "o_orderdate")


def _rev_cents(b: pa.Table):
    """``l_extendedprice·(1−l_discount)`` in exact 1e-4-dollar integer
    units.  Revenue data is 2-decimal price × 2-decimal discount: the
    product has 4 exact decimal digits, so group sums land exactly on
    .xx5 rounding boundaries all the time and double summation order
    decides the side — integer arithmetic makes Ray and the SQL oracle
    agree bit-for-bit (same discipline as small_quantity_revenue /
    q22_sales_opportunity).  int64 headroom: ≤1e9 per item."""
    import numpy as np

    p = np.rint(b.column("l_extendedprice")
                .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
    d = np.rint(b.column("l_discount")
                .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
    return p * (100 - d)


def _cents_to_dollars(s):
    """Half-up 2-decimal dollars from an exact 1e-4-unit integer sum
    (scalar or ndarray) — the integer analog of SQL ROUND(x, 2)."""
    import numpy as np

    q, r = np.divmod(s, 100)
    return (q + (r >= 50)) / 100.0


# SQL mirror of _rev_cents / _cents_to_dollars (oracle side)
_REV_C_SQL = ("CAST(round(l_extendedprice*100) AS BIGINT)"
              " * (100 - CAST(round(l_discount*100) AS BIGINT))")


def _c2d_sql(expr: str) -> str:
    # floor-division + non-negative-remainder form: DuckDB's // and %
    # truncate toward zero for negative dividends, while the engine's
    # np.divmod floors — the ((x % 100) + 100) % 100 remainder makes
    # the SQL side floor-consistent, so negative sums (q9 profit) round
    # identically on both sides; identical to the plain form for x ≥ 0
    m = f"((({expr}) % 100) + 100) % 100"
    return (f"((({expr}) - {m}) // 100"
            f" + CASE WHEN {m} >= 50 THEN 1 ELSE 0 END) / 100.0")


def q7_trade_volume(sf_dir: str):
    """Cross-nation trade volume (TPC-H Q7 shape): revenue between
    (supplier nation, customer nation) pairs per ship year, excluding
    domestic trade.  Under the broadcast cutoff all four dims fold into
    the single lineitem scan as IntKeyMaps; beyond it the orders side
    goes through the hash-partitioned co-group join (the 100 TB path).
    One 3-key driver-combined aggregate either way (25×25×years groups,
    hard-bounded)."""
    import numpy as np

    from elevant_ray.stages.util import (IntKeyMap, cogroup_join, np_columns,
                                         partial_group_agg, scale_cutoff)

    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}
    s = np_columns(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
                   ["s_suppkey", "s_nationkey"])
    smap = IntKeyMap(s["s_suppkey"],
                     np.array([nation[k] for k in s["s_nationkey"].tolist()],
                              dtype=object))
    c = np_columns(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
                   ["c_custkey", "c_nationkey"])
    cmap = IntKeyMap(c["c_custkey"],
                     np.array([nation[k] for k in c["c_nationkey"].tolist()],
                              dtype=object))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                  "l_shipdate"])

    def line_pre(b: pa.Table) -> pa.Table:
        rev_c = _rev_cents(b)
        sup = smap.take_checked(
            b.column("l_suppkey").to_numpy(zero_copy_only=False))
        yr = pc.cast(pc.year(b.column("l_shipdate")), pa.int64())
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "supp_nation": pa.array(sup, pa.string()),
                         "l_year": yr,
                         "rev_c": pa.array(rev_c, pa.int64())})

    if orders.size_bytes() <= scale_cutoff(64 << 20):
        o = np_columns(orders, ["o_orderkey", "o_custkey"])
        omap = IntKeyMap(o["o_orderkey"], cmap.take_checked(o["o_custkey"]))

        def fold(b: pa.Table) -> pa.Table:
            b = line_pre(b)
            cus = omap.take_checked(
                b.column("l_orderkey").to_numpy(zero_copy_only=False))
            return b.append_column("cust_nation", pa.array(cus, pa.string()))

        joined = line.map_batches(fold, batch_format="pyarrow")
    else:
        def o_pre(b: pa.Table) -> pa.Table:
            cus = cmap.take_checked(
                b.column("o_custkey").to_numpy(zero_copy_only=False))
            return pa.table({"l_orderkey": b.column("o_orderkey"),
                             "cust_nation": pa.array(cus, pa.string())})

        joined = cogroup_join(
            line.map_batches(line_pre, batch_format="pyarrow"),
            orders.map_batches(o_pre, batch_format="pyarrow"),
            on="l_orderkey",
            left_schema=pa.schema([("l_orderkey", pa.int64()),
                                   ("supp_nation", pa.string()),
                                   ("l_year", pa.int64()),
                                   ("rev_c", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("cust_nation", pa.string())]))

    def cross_only(b: pa.Table) -> pa.Table:
        m = pc.invert(pc.equal(b.column("supp_nation"),
                               b.column("cust_nation")))
        return b.filter(m).select(["supp_nation", "cust_nation", "l_year",
                                   "rev_c"])

    agg = partial_group_agg(joined.map_batches(cross_only,
                                               batch_format="pyarrow"),
                            ["supp_nation", "cust_nation", "l_year"],
                            sum_cols=["rev_c"], combine="driver")
    out = agg[["supp_nation", "cust_nation", "l_year"]].copy()
    out["l_year"] = out["l_year"].astype("int64")
    out["revenue"] = _cents_to_dollars(agg["rev_c"].to_numpy())
    return out


def q10_returned_revenue(sf_dir: str):
    """Returned-item reporting (TPC-H Q10 shape): top 20 customers by
    revenue on returned lineitems, enriched with name + nation.  The
    heavy side is one filtered lineitem scan; the top-k closes with
    per-block partial top-20s so only 20×blocks candidate rows ever
    reach the driver."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (IntKeyMap, cogroup_join, np_columns,
                                         partial_group_agg, scale_cutoff)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_returnflag", "l_extendedprice",
                  "l_discount"])

    def returned(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), pa.scalar("R")))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "rev_c": pa.array(_rev_cents(b), pa.int64())})

    flt = line.map_batches(returned, batch_format="pyarrow")
    small = orders.size_bytes() <= scale_cutoff(64 << 20)
    if small:
        o = np_columns(orders, ["o_orderkey", "o_custkey"])
        omap = IntKeyMap(o["o_orderkey"], o["o_custkey"])

        def to_cust(b: pa.Table) -> pa.Table:
            ck = omap.take_checked(
                b.column("l_orderkey").to_numpy(zero_copy_only=False))
            return pa.table({"o_custkey": pa.array(ck, pa.int64()),
                             "rev_c": b.column("rev_c")})

        by_cust = flt.map_batches(to_cust, batch_format="pyarrow")
    else:
        def o_pre(b: pa.Table) -> pa.Table:
            return pa.table({"l_orderkey": b.column("o_orderkey"),
                             "o_custkey": b.column("o_custkey")})

        by_cust = cogroup_join(
            flt, orders.map_batches(o_pre, batch_format="pyarrow"),
            on="l_orderkey",
            left_schema=pa.schema([("l_orderkey", pa.int64()),
                                   ("rev_c", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("o_custkey", pa.int64())])) \
            .map_batches(lambda b: b.select(["o_custkey", "rev_c"]),
                         batch_format="pyarrow")

    agg = partial_group_agg(by_cust, ["o_custkey"], sum_cols=["rev_c"],
                            combine="driver" if small else "dataset")
    if not isinstance(agg, pd.DataFrame):
        def local_topk(b: pa.Table) -> pa.Table:
            df = b.to_pandas().sort_values(
                ["rev_c", "o_custkey"], ascending=[False, True]).head(20)
            return pa.Table.from_pandas(df, preserve_index=False)

        agg = agg.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    top = (agg.sort_values(["rev_c", "o_custkey"], ascending=[False, True])
           .head(20).reset_index(drop=True))
    keys = pa.array(top["o_custkey"].to_numpy(), pa.int64())

    def cust_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("c_custkey"), value_set=keys))

    cust = pd.DataFrame(
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
        .map_batches(cust_rows, batch_format="pyarrow").take_all())
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}
    if cust.empty:
        return pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                             "c_name": pd.Series([], dtype="object"),
                             "n_name": pd.Series([], dtype="object"),
                             "revenue": pd.Series([], dtype="float64")})
    cust["n_name"] = cust["c_nationkey"].map(nation)
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["revenue"] = _cents_to_dollars(out["rev_c"].to_numpy())
    return (out.sort_values(["rev_c", "o_custkey"], ascending=[False, True])
            [["c_custkey", "c_name", "n_name", "revenue"]]
            .reset_index(drop=True))


def q14_promo_revenue(sf_dir: str):
    """Promotion-revenue share (TPC-H Q14 shape): percent of H1-1997
    revenue from PROMO-type parts — a correlated conditional aggregate
    folded into one lineitem scan via a broadcast partkey→is-promo
    bitmap; the ratio closes on the driver from two mergeable sums."""
    import datetime

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import IntKeyMap, np_columns, partial_group_agg

    p = np_columns(_read(sf_dir, "part", ["p_partkey", "p_type"]),
                   ["p_partkey", "p_type"])
    promo = np.array([t.startswith("PROMO") for t in p["p_type"].tolist()],
                     dtype=np.int64)
    pmap = IntKeyMap(p["p_partkey"], promo)
    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def pre(b: pa.Table) -> pa.Table:
        lo = pa.scalar(datetime.datetime(1997, 1, 1))
        hi = pa.scalar(datetime.datetime(1997, 7, 1))
        b = b.filter(pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                             pc.less(b.column("l_shipdate"), hi)))
        rev_c = _rev_cents(b)
        is_promo = pmap.take_checked(
            b.column("l_partkey").to_numpy(zero_copy_only=False))
        return pa.table({"g": pa.array(np.zeros(len(rev_c), np.int64)),
                         "promo_c": pa.array(rev_c * is_promo, pa.int64()),
                         "rev_c": pa.array(rev_c, pa.int64())})

    agg = partial_group_agg(line.map_batches(pre, batch_format="pyarrow"),
                            ["g"], sum_cols=["promo_c", "rev_c"],
                            count_alias="n_items", combine="driver")
    if agg.empty:
        # SQL grand-total semantics: aggregating zero rows still yields
        # one row (NULL ratio, zero count) — same rule as ROLLUP/CUBE
        return pd.DataFrame({"promo_pct": [float("nan")],
                             "n_items": pd.array([0], dtype="int64")})
    # exact integer sums; one double division, identical operands on
    # the oracle side ⇒ identical double ⇒ identical round-6
    pct = (100.0 * float(agg["promo_c"].iloc[0])) / float(agg["rev_c"].iloc[0])
    return pd.DataFrame({
        "promo_pct": [np.floor(pct * 1e6 + 0.5) / 1e6],
        "n_items": agg["n_items"].astype("int64").iloc[:1].to_numpy()})


def q6_forecast_revenue(sf_dir: str):
    """Forecast-revenue change (TPC-H Q6 shape): one filtered lineitem
    scan, zero joins — discounted revenue that would be recovered by
    dropping 5-7% discounts on small-quantity 1996 shipments.  Revenue
    is summed in exact 1e-4-dollar integers (price cents × discount
    cents) so the grand total is bit-identical to the SQL oracle; the
    discount-band predicate is evaluated in the cents domain too (a
    0.05 ≤ x ≤ 0.07 double compare would straddle representation
    error on both sides)."""
    import datetime

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    line = _read(sf_dir, "lineitem",
                 ["l_extendedprice", "l_discount", "l_quantity",
                  "l_shipdate"])

    def pre(b: pa.Table) -> pa.Table:
        lo = pa.scalar(datetime.datetime(1996, 1, 1))
        hi = pa.scalar(datetime.datetime(1997, 1, 1))
        b = b.filter(pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                             pc.less(b.column("l_shipdate"), hi)))
        p_c = np.rint(b.column("l_extendedprice")
                      .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        d_c = np.rint(b.column("l_discount")
                      .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = (d_c >= 5) & (d_c <= 7) & (qty < 24)
        rev = p_c[keep] * d_c[keep]
        return pa.table({"g": pa.array(np.zeros(len(rev), np.int64)),
                         "rev_c": pa.array(rev, pa.int64())})

    agg = partial_group_agg(line.map_batches(pre, batch_format="pyarrow"),
                            ["g"], sum_cols=["rev_c"],
                            count_alias="n_items", combine="driver")
    if agg.empty:
        # SQL grand-total semantics: SUM over zero rows is NULL
        return pd.DataFrame({"revenue": [float("nan")],
                             "n_items": pd.array([0], dtype="int64")})
    return pd.DataFrame({
        "revenue": [float(_cents_to_dollars(int(agg["rev_c"].iloc[0])))],
        "n_items": agg["n_items"].astype("int64").iloc[:1].to_numpy()})


def q8_market_share(sf_dir: str):
    """National market share (TPC-H Q8 shape): NATION_2 suppliers' share
    of ECONOMY-part revenue sold to ASIA customers, per order year
    1996-1997.  The part and supplier dims fold into the lineitem scan
    as broadcast int-key bitmaps; the orders side (year + customer
    region membership) broadcasts under the cutoff and goes through the
    hash-partitioned co-group join beyond it (the 100 TB path).  Both
    share operands are exact integer sums; the one double division uses
    identical operands on the oracle side, so round-6 agrees
    bit-for-bit (same discipline as q14)."""
    import datetime

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (IntKeyMap, cogroup_join, np_columns,
                                         partial_group_agg, scale_cutoff)

    region = {r["r_regionkey"]: r["r_name"]
              for r in _read(sf_dir, "region").take_all()}
    nation = {r["n_nationkey"]: (r["n_name"], region[r["n_regionkey"]])
              for r in _read(sf_dir, "nation").take_all()}

    p = np_columns(_read(sf_dir, "part", ["p_partkey", "p_type"]),
                   ["p_partkey", "p_type"])
    is_econ = np.array([t == "ECONOMY" for t in p["p_type"].tolist()],
                       dtype=np.int64)
    pmap = IntKeyMap(p["p_partkey"], is_econ)

    s = np_columns(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
                   ["s_suppkey", "s_nationkey"])
    is_target = np.array([nation[k][0] == "NATION_2"
                          for k in s["s_nationkey"].tolist()], dtype=np.int64)
    smap = IntKeyMap(s["s_suppkey"], is_target)

    c = np_columns(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
                   ["c_custkey", "c_nationkey"])
    in_asia = np.array([nation[k][1] == "ASIA"
                        for k in c["c_nationkey"].tolist()], dtype=np.int64)
    cmap = IntKeyMap(c["c_custkey"], in_asia)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                  "l_discount"])

    def line_pre(b: pa.Table) -> pa.Table:
        econ = pmap.take_checked(
            b.column("l_partkey").to_numpy(zero_copy_only=False))
        b = b.filter(pa.array(econ.astype(bool)))
        rev_c = _rev_cents(b)
        tgt = smap.take_checked(
            b.column("l_suppkey").to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "num_c": pa.array(rev_c * tgt, pa.int64()),
                         "rev_c": pa.array(rev_c, pa.int64())})

    def o_year_asia(b: pa.Table):
        lo = pa.scalar(datetime.datetime(1996, 1, 1))
        hi = pa.scalar(datetime.datetime(1998, 1, 1))
        b = b.filter(pc.and_(
            pc.greater_equal(b.column("o_orderdate"), lo),
            pc.less(b.column("o_orderdate"), hi)))
        asia = cmap.take_checked(
            b.column("o_custkey").to_numpy(zero_copy_only=False))
        b = b.filter(pa.array(asia.astype(bool)))
        yr = pc.cast(pc.year(b.column("o_orderdate")), pa.int64())
        return b.column("o_orderkey"), yr

    if orders.size_bytes() <= scale_cutoff(64 << 20):
        keys, yrs = [], []
        for b in orders.iter_batches(batch_format="pyarrow"):
            k, y = o_year_asia(b)
            keys.append(k.to_numpy(zero_copy_only=False))
            yrs.append(y.to_numpy(zero_copy_only=False))
        omap = IntKeyMap(np.concatenate(keys) if keys else
                         np.array([], np.int64),
                         np.concatenate(yrs) if yrs else
                         np.array([], np.int64))

        def fold(b: pa.Table) -> pa.Table:
            b = line_pre(b)
            ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
            yr, found = omap.take(ok)
            b = b.append_column(
                "o_year", pa.array(np.asarray(yr, np.int64), pa.int64()))
            return b.filter(pa.array(found))

        joined = line.map_batches(fold, batch_format="pyarrow")
    else:
        def o_pre(b: pa.Table) -> pa.Table:
            k, y = o_year_asia(b)
            return pa.table({"l_orderkey": k, "o_year": y})

        joined = cogroup_join(
            line.map_batches(line_pre, batch_format="pyarrow"),
            orders.map_batches(o_pre, batch_format="pyarrow"),
            on="l_orderkey",
            left_schema=pa.schema([("l_orderkey", pa.int64()),
                                   ("num_c", pa.int64()),
                                   ("rev_c", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("o_year", pa.int64())]))

    agg = partial_group_agg(
        joined.map_batches(
            lambda b: b.select(["o_year", "num_c", "rev_c"]),
            batch_format="pyarrow"),
        ["o_year"], sum_cols=["num_c", "rev_c"], combine="driver")
    if agg.empty:
        return pd.DataFrame({"o_year": pd.Series([], dtype="int64"),
                             "mkt_share": pd.Series([], dtype="float64")})
    agg = agg.sort_values("o_year").reset_index(drop=True)
    share = agg["num_c"].to_numpy(np.float64) / agg["rev_c"].to_numpy(
        np.float64)
    return pd.DataFrame({
        "o_year": agg["o_year"].astype("int64"),
        "mkt_share": np.floor(share * 1e6 + 0.5) / 1e6})


def q15_top_supplier(sf_dir: str):
    """Top supplier(s) (TPC-H Q15 shape): suppliers whose Q1-1996
    shipment revenue equals the global maximum, ties kept.  The
    per-supplier aggregate shrinks inside the scan (supplier count ≪
    lineitem count) and the global max + equality selection close over
    exact integer revenue, so ties are exact, not
    float-sum-order-dependent."""
    import datetime

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    line = _read(sf_dir, "lineitem",
                 ["l_suppkey", "l_extendedprice", "l_discount",
                  "l_shipdate"])

    def pre(b: pa.Table) -> pa.Table:
        lo = pa.scalar(datetime.datetime(1996, 1, 1))
        hi = pa.scalar(datetime.datetime(1996, 4, 1))
        b = b.filter(pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                             pc.less(b.column("l_shipdate"), hi)))
        return pa.table({"l_suppkey": b.column("l_suppkey"),
                         "rev_c": pa.array(_rev_cents(b), pa.int64())})

    agg = partial_group_agg(line.map_batches(pre, batch_format="pyarrow"),
                            ["l_suppkey"], sum_cols=["rev_c"],
                            combine="dataset")

    def local_max(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table({"m": pa.array(
            [pc.max(b.column("rev_c")).as_py()], pa.int64())})

    mx = agg.map_batches(local_max, batch_format="pyarrow").max("m")
    if mx is None:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object"),
                             "total_revenue": pd.Series([], dtype="float64")})

    winners = pd.DataFrame(agg.map_batches(
        lambda b: b.filter(pc.equal(b.column("rev_c"),
                                    pa.scalar(int(mx), pa.int64()))),
        batch_format="pyarrow").take_all())
    keys = pa.array(winners["l_suppkey"].to_numpy(), pa.int64())
    sup = pd.DataFrame(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
            lambda b: b.filter(pc.is_in(b.column("s_suppkey"),
                                        value_set=keys)),
            batch_format="pyarrow").take_all())
    out = sup.merge(winners, left_on="s_suppkey", right_on="l_suppkey")
    out["total_revenue"] = _cents_to_dollars(out["rev_c"].to_numpy())
    return (out.sort_values("s_suppkey")
            [["s_suppkey", "s_name", "total_revenue"]]
            .reset_index(drop=True))


def q9_product_profit(sf_dir: str):
    """Product-type profit rollup (TPC-H Q9 shape, adapted: the testdata
    has no partsupp, so per-unit cost is the part's retail price):
    profit per (supplier nation, order year) over parts whose name
    contains 'bolt'.  Profit per line = revenue − retail_cost·quantity
    in exact 1e-4-dollar integers, so group sums match the oracle
    bit-for-bit.  Part and supplier dims fold into the lineitem scan as
    broadcast IntKeyMaps (retail cents with a −1 not-a-bolt sentinel;
    supplier → nationkey); the orders year lookup broadcasts under the
    cutoff and co-group-joins beyond it (the 100 TB path), mirroring
    q8_market_share.  Group count is nations × years, so the final
    combine is a driver fold over per-batch partials — no exchange.
    Reference analog: the profit rollup is ELEVANT's nested results-dict
    aggregation shape (evaluator.py:206-352) over a 3-dim key."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (IntKeyMap, cogroup_join, np_columns,
                                         partial_group_agg, scale_cutoff)

    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}

    p = np_columns(_read(sf_dir, "part",
                         ["p_partkey", "p_name", "p_retailprice"]),
                   ["p_partkey", "p_name", "p_retailprice"])
    retail_c = np.rint(p["p_retailprice"].astype(np.float64) * 100
                       ).astype(np.int64)
    is_bolt = np.array(["bolt" in n for n in p["p_name"].tolist()])
    pmap = IntKeyMap(p["p_partkey"], np.where(is_bolt, retail_c, -1))

    s = np_columns(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
                   ["s_suppkey", "s_nationkey"])
    smap = IntKeyMap(s["s_suppkey"], s["s_nationkey"].astype(np.int64))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                  "l_extendedprice", "l_discount"])

    def line_pre(b: pa.Table) -> pa.Table:
        rc = pmap.take_checked(
            b.column("l_partkey").to_numpy(zero_copy_only=False))
        keep = rc >= 0
        b = b.filter(pa.array(keep))
        rc = rc[keep]
        qty = np.rint(b.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        profit_c = _rev_cents(b) - rc * 100 * qty
        nk = smap.take_checked(
            b.column("l_suppkey").to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "nationkey": pa.array(nk, pa.int64()),
                         "profit_c": pa.array(profit_c, pa.int64())})

    if orders.size_bytes() <= scale_cutoff(64 << 20):
        o = np_columns(orders, ["o_orderkey", "o_orderdate"])
        years = o["o_orderdate"].astype("datetime64[Y]").astype(
            np.int64) + 1970
        omap = IntKeyMap(o["o_orderkey"], years)

        def fold(b: pa.Table) -> pa.Table:
            b = line_pre(b)
            yr, found = omap.take(
                b.column("l_orderkey").to_numpy(zero_copy_only=False))
            b = b.append_column(
                "o_year", pa.array(np.asarray(yr, np.int64), pa.int64()))
            return b.filter(pa.array(found))

        joined = line.map_batches(fold, batch_format="pyarrow")
    else:
        def o_pre(b: pa.Table) -> pa.Table:
            return pa.table({
                "l_orderkey": b.column("o_orderkey"),
                "o_year": pc.cast(pc.year(b.column("o_orderdate")),
                                  pa.int64())})

        joined = cogroup_join(
            line.map_batches(line_pre, batch_format="pyarrow"),
            orders.map_batches(o_pre, batch_format="pyarrow"),
            on="l_orderkey",
            left_schema=pa.schema([("l_orderkey", pa.int64()),
                                   ("nationkey", pa.int64()),
                                   ("profit_c", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("o_year", pa.int64())]))

    agg = partial_group_agg(
        joined.map_batches(
            lambda b: b.select(["nationkey", "o_year", "profit_c"]),
            batch_format="pyarrow"),
        ["nationkey", "o_year"], sum_cols=["profit_c"], combine="driver")
    if agg.empty:
        return pd.DataFrame({"nation": pd.Series([], dtype="object"),
                             "o_year": pd.Series([], dtype="int64"),
                             "sum_profit": pd.Series([], dtype="float64")})
    agg["nation"] = agg["nationkey"].map(nation)
    agg = agg.sort_values(["nation", "o_year"],
                          ascending=[True, False]).reset_index(drop=True)
    return pd.DataFrame({
        "nation": agg["nation"],
        "o_year": agg["o_year"].astype("int64"),
        "sum_profit": _cents_to_dollars(agg["profit_c"].to_numpy())})


def q11_important_parts(sf_dir: str):
    """Important-stock identification (TPC-H Q11 shape, adapted to the
    shipped-revenue fact): parts whose total lineitem revenue exceeds
    1/2000 of the global total.  One scan: the per-part partial
    aggregate (bounded by the part dimension) also yields the global
    scalar as the sum of its values, so the HAVING-against-a-scalar-
    subquery needs no second pass.  The strict comparison runs in exact
    integers — value_c > total_c // 2000 is equivalent to
    value_c·2000 > total_c for positive integers (avoids the ×2000
    overflow at 100 TB totals)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_discount"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "value_c": pa.array(_rev_cents(b), pa.int64())})

    agg = partial_group_agg(line.map_batches(pre, batch_format="pyarrow"),
                            ["l_partkey"], sum_cols=["value_c"],
                            combine="driver")
    empty = pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                          "value": pd.Series([], dtype="float64")})
    if agg.empty:
        return empty
    total = int(agg["value_c"].sum())
    keep = agg[agg["value_c"].to_numpy(np.int64) > total // 2000]
    if keep.empty:
        return empty
    keep = keep.sort_values(["value_c", "l_partkey"],
                            ascending=[False, True]).reset_index(drop=True)
    return pd.DataFrame({
        "p_partkey": keep["l_partkey"].astype("int64"),
        "value": _cents_to_dollars(keep["value_c"].to_numpy())})


def q20_promotion_suppliers(sf_dir: str):
    """Potential part promotion (TPC-H Q20 shape, adapted: availability
    becomes shipped quantity): suppliers who shipped, during 1996, more
    than half of some 'blue' part's total 1996 quantity.  The part
    filter folds into the scan as a broadcast bitmap; one exchange
    builds per-(part, supplier) quantity sums; the per-part totals are
    a re-aggregation of those partials (driver-side — bounded by the
    part dimension); the >half test is exact integer (q·2 > t), and the
    surviving supplier keys semi-join the supplier dim as an isin
    filter.  This is the reference's candidate-generation-then-
    threshold shape (maximum_matching_ner.py:39-123's alias-frequency ≥
    unigram-count filter) as dataflow."""
    import datetime

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import IntKeyMap, np_columns, partial_group_agg

    p = np_columns(_read(sf_dir, "part", ["p_partkey", "p_name"]),
                   ["p_partkey", "p_name"])
    is_blue = np.array([n.startswith("blue") for n in p["p_name"].tolist()],
                       dtype=np.int64)
    pmap = IntKeyMap(p["p_partkey"], is_blue)

    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def pre(b: pa.Table) -> pa.Table:
        lo = pa.scalar(datetime.datetime(1996, 1, 1))
        hi = pa.scalar(datetime.datetime(1997, 1, 1))
        b = b.filter(pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                             pc.less(b.column("l_shipdate"), hi)))
        blue = pmap.take_checked(
            b.column("l_partkey").to_numpy(zero_copy_only=False))
        b = b.filter(pa.array(blue.astype(bool)))
        qty = np.rint(b.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "qty": pa.array(qty, pa.int64())})

    from elevant_ray.stages.util import (as_arrow, bucketed_group_apply,
                                         scale_cutoff)

    # (part, supplier) is a fact-scaled key set — the combined partials
    # only stream to the driver under the cutoff; beyond it the >half
    # test runs inside part-keyed buckets and only the winning supplier
    # keys (dimension-bounded) reach the driver
    ps_ds = partial_group_agg(
        line.map_batches(pre, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], sum_cols=["qty"],
        combine="dataset").materialize()
    empty = pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                          "s_name": pd.Series([], dtype="object")})
    if ps_ds.size_bytes() <= scale_cutoff(256 << 20):
        ps = ps_ds.to_pandas()
        if ps.empty:
            return empty
        totals = ps.groupby("l_partkey")["qty"].transform("sum")
        win_rows = ps.loc[ps["qty"].to_numpy(np.int64) * 2
                          > totals.to_numpy(np.int64), "l_suppkey"]
        winners = np.unique(win_rows.to_numpy(np.int64))
    else:
        def bucket_winners(df: pd.DataFrame) -> pd.DataFrame:
            t = df.groupby("l_partkey")["qty"].transform("sum")
            w = df.loc[df["qty"].to_numpy(np.int64) * 2
                       > t.to_numpy(np.int64), "l_suppkey"]
            return pd.DataFrame(
                {"l_suppkey": np.unique(w.to_numpy(np.int64))})

        wds = as_arrow(bucketed_group_apply(ps_ds, "l_partkey",
                                            bucket_winners))
        chunks = [b.column("l_suppkey").to_numpy(zero_copy_only=False)
                  for b in wds.iter_batches(batch_format="pyarrow")
                  if b.num_rows > 0 and "l_suppkey" in b.column_names]
        winners = np.unique(np.concatenate(
            chunks or [np.array([], np.int64)]).astype(np.int64))
    if winners.size == 0:
        return empty
    keys = pa.array(winners, pa.int64())
    sup = pd.DataFrame(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
            lambda b: b.filter(pc.is_in(b.column("s_suppkey"),
                                        value_set=keys)),
            batch_format="pyarrow").take_all())
    return (sup.sort_values("s_suppkey")[["s_suppkey", "s_name"]]
            .reset_index(drop=True))


def q18_large_volume(sf_dir: str):
    """Large-volume orders (TPC-H Q18 shape): orders whose total line
    quantity exceeds 250, with customer names.  The per-order HAVING
    aggregate is a high-cardinality hash groupby (partials would not
    shrink it); the survivors are few, so the enrichment joins run as
    broadcast isin-filters against the qualifying key set."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    empty = pd.DataFrame({
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_custkey": pd.Series([], dtype="int64"),
        "c_name": pd.Series([], dtype="object"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_totalprice": pd.Series([], dtype="float64"),
        "sum_qty": pd.Series([], dtype="int64")})
    if line.count() == 0:
        return empty

    # pre-shrink before the unavoidable per-order exchange: an order's
    # lines are adjacent in the generated parquet, so per-batch Arrow
    # partials collapse most orders to one row before the shuffle
    def partial(b: pa.Table) -> pa.Table:
        return (b.group_by("l_orderkey")
                .aggregate([("l_quantity", "sum")])
                .rename_columns(["l_orderkey", "sum_qty"]))

    per_order = (line.map_batches(partial, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Sum("sum_qty", alias_name="sum_qty")))

    def having(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("sum_qty"), pa.scalar(250.0)))

    big = pd.DataFrame(
        per_order.map_batches(having, batch_format="pyarrow").take_all())
    if big.empty:
        return empty
    okeys = pa.array(big["l_orderkey"].to_numpy(), pa.int64())

    def order_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("o_orderkey"), value_set=okeys))

    orders = pd.DataFrame(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                 "o_totalprice"])
        .map_batches(order_rows, batch_format="pyarrow").take_all())
    ckeys = pa.array(np.unique(orders["o_custkey"].to_numpy()), pa.int64())

    def cust_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("c_custkey"), value_set=ckeys))

    cust = pd.DataFrame(
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(cust_rows, batch_format="pyarrow").take_all())
    out = (big.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey"))
    out["sum_qty"] = np.floor(out["sum_qty"].to_numpy() + 0.5).astype("int64")
    out = out[["o_orderkey", "o_custkey", "c_name", "o_orderdate",
               "o_totalprice", "sum_qty"]]
    return _ts_us(out.sort_values("o_orderkey").reset_index(drop=True),
                  "o_orderdate")


def q19_disjunctive_revenue(sf_dir: str):
    """Disjunctive-predicate revenue (TPC-H Q19 shape): three
    brand/size/quantity conjunctions OR-ed together, evaluated as one
    vectorized mask over the lineitem scan with broadcast partkey→
    (brand, size) maps — the shape that exercises predicate pushdown
    without a join."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import IntKeyMap, np_columns, partial_group_agg

    p = np_columns(_read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]),
                   ["p_partkey", "p_brand", "p_size"])
    bnum = np.array([int(b.split("#", 1)[1]) for b in p["p_brand"].tolist()],
                    dtype=np.int64)
    bmap = IntKeyMap(p["p_partkey"], bnum)
    szmap = IntKeyMap(p["p_partkey"], p["p_size"].astype(np.int64))
    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def pre(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        bn = bmap.take_checked(pk)
        sz = szmap.take_checked(pk)
        m = (((bn == 12) & (sz >= 1) & (sz <= 5) & (qty >= 1) & (qty <= 11))
             | ((bn == 23) & (sz >= 1) & (sz <= 10) & (qty >= 10) & (qty <= 20))
             | ((bn == 34) & (sz >= 1) & (sz <= 15) & (qty >= 20) & (qty <= 30)))
        rev_c = _rev_cents(b)
        return pa.table({"g": pa.array(np.zeros(int(m.sum()), np.int64)),
                         "rev_c": pa.array(rev_c[m], pa.int64())})

    agg = partial_group_agg(line.map_batches(pre, batch_format="pyarrow"),
                            ["g"], sum_cols=["rev_c"], count_alias="n_items",
                            combine="driver")
    if agg.empty:
        # SQL grand-total semantics (see q14_promo_revenue)
        return pd.DataFrame({"revenue": [float("nan")],
                             "n_items": pd.array([0], dtype="int64")})
    return pd.DataFrame({
        "revenue": [float(_cents_to_dollars(int(agg["rev_c"].iloc[0])))],
        "n_items": agg["n_items"].astype("int64").iloc[:1].to_numpy()})


def events_retention(sf_dir: str):
    """Week-over-week retention: per week, how many active users are
    also active the following week.  The distinct (user, week) set is a
    partial-aggregated groupby; the retained check is a self-merge of
    that (already small) pair set shifted by 7 days — the canonical
    cohort metric over append-only event logs."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(b.column("ts"), unit="week")
        return pa.table({"user_id": b.column("user_id"), "week": wk})

    pairs = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                              ["user_id", "week"], count_alias="n",
                              combine="driver")
    if pairs.empty:
        return pd.DataFrame({
            "week": pd.Series([], dtype="datetime64[us]"),
            "active": pd.Series([], dtype="int64"),
            "retained": pd.Series([], dtype="int64"),
            "retention": pd.Series([], dtype="float64")})
    df = pairs[["user_id", "week"]].copy()
    df["week"] = df["week"].astype("datetime64[us]")
    future = df.copy()
    future["week"] = future["week"] - pd.Timedelta(days=7)
    future["hit"] = 1
    m = df.merge(future, on=["user_id", "week"], how="left")
    m["hit"] = m["hit"].fillna(0).astype("int64")
    per = m.groupby("week", as_index=False).agg(
        active=("user_id", "size"), retained=("hit", "sum"))
    per["active"] = per["active"].astype("int64")
    ret = (per["retained"].to_numpy(dtype=np.float64)
           / per["active"].to_numpy())
    per["retention"] = np.floor(ret * 1e6 + 0.5) / 1e6
    return per.sort_values("week").reset_index(drop=True)


def event_type_transitions(sf_dir: str):
    """First-order Markov transition counts over per-user event
    sequences: lead() within (user ORDER BY ts, event_id), then a global
    (from, to) count.  One bucket shuffle; the per-bucket lead is a
    vectorized groupby-shift; per-bucket partial counts keep the final
    combine at (types² × buckets) rows."""
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    if ds.count() == 0:
        return pd.DataFrame({"from_type": pd.Series([], dtype="object"),
                             "to_type": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        nxt = g.groupby("user_id")["event_type"].shift(-1)
        m = nxt.notna()
        out = pd.DataFrame({"from_type": g.loc[m, "event_type"],
                            "to_type": nxt[m]})
        return (out.groupby(["from_type", "to_type"], as_index=False)
                .size().rename(columns={"size": "n"}))

    agg = partial_group_agg(bucketed_group_apply(ds, "user_id", per_bucket),
                            ["from_type", "to_type"], sum_cols=["n"],
                            combine="driver")
    out = agg.copy()
    out["n"] = out["n"].astype("int64")
    return out


def user_first_last_event(sf_dir: str):
    """Per-user first_value/last_value over the time-ordered event
    stream (ORDER BY ts, event_id) plus the count — one bucket shuffle,
    vectorized groupby first/last per bucket."""
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    if ds.count() == 0:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "first_type": pd.Series([], dtype="object"),
                             "last_type": pd.Series([], dtype="object"),
                             "n_events": pd.Series([], dtype="int64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gb = g.groupby("user_id")
        sz = gb.size()
        return pd.DataFrame({
            "user_id": sz.index.to_numpy(),
            "first_type": gb["event_type"].first().to_numpy(),
            "last_type": gb["event_type"].last().to_numpy(),
            "n_events": sz.to_numpy().astype("int64")})

    return _det_sort(bucketed_group_apply(ds, "user_id", per_bucket),
                     ["user_id"])


def supplier_pctile(sf_dir: str):
    """percent_rank() and cume_dist() within nation over account
    balance — rank-normalization windows (the feature-scaling step of a
    training pipeline).  min/max tie ranks reproduce SQL semantics
    exactly; one bucket shuffle, C-level ranks per bucket."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    if ds.count() == 0:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "nationkey": pd.Series([], dtype="int64"),
                             "s_acctbal": pd.Series([], dtype="float64"),
                             "pct_rank": pd.Series([], dtype="float64"),
                             "cume": pd.Series([], dtype="float64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("s_nationkey")["s_acctbal"]
        rmin = gb.rank(method="min").to_numpy()
        rmax = gb.rank(method="max").to_numpy()
        n = gb.transform("size").to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            pr = np.where(n > 1, (rmin - 1) / (n - 1), 0.0)
        cd = rmax / n
        out = pd.DataFrame({
            "s_suppkey": g["s_suppkey"].to_numpy(),
            "nationkey": g["s_nationkey"].to_numpy().astype("int64"),
            "s_acctbal": g["s_acctbal"].to_numpy(),
            "pct_rank": np.floor(pr * 1e6 + 0.5) / 1e6,
            "cume": np.floor(cd * 1e6 + 0.5) / 1e6})
        return out

    return _det_sort(bucketed_group_apply(ds, "s_nationkey", per_bucket),
                     ["s_suppkey"])


def lineitem_regr(sf_dir: str):
    """Grouped simple linear regression (regr_slope / regr_intercept of
    extended price on quantity per return flag) from mergeable moments —
    a two-pass centered form: pass 1 gets per-group means, pass 2 sums
    centered cross-moments, so no catastrophic cancellation at any group
    scale (the one-pass raw-moment form loses ~7 digits here)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def m1(b: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "sx": pc.cast(b.column("l_quantity"), pa.float64()),
                         "sy": b.column("l_extendedprice")})

    a1 = partial_group_agg(ds.map_batches(m1, batch_format="pyarrow"),
                           ["l_returnflag"], sum_cols=["sx", "sy"],
                           count_alias="n", combine="driver")
    if a1.empty:
        return pd.DataFrame({"l_returnflag": pd.Series([], dtype="object"),
                             "slope": pd.Series([], dtype="float64"),
                             "intercept": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    flags = a1["l_returnflag"].to_numpy(dtype=object)
    nv = a1["n"].to_numpy(dtype=np.float64)
    mux = a1["sx"].to_numpy() / nv
    muy = a1["sy"].to_numpy() / nv

    def m2(b: pa.Table) -> pa.Table:
        f = b.column("l_returnflag").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(flags, f)
        x = b.column("l_quantity").to_numpy(zero_copy_only=False)
        y = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dx = x - mux[idx]
        dy = y - muy[idx]
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "sxx": pa.array(dx * dx), "sxy": pa.array(dx * dy)})

    a2 = partial_group_agg(ds.map_batches(m2, batch_format="pyarrow"),
                           ["l_returnflag"], sum_cols=["sxx", "sxy"],
                           combine="driver")
    sxx = a2["sxx"].to_numpy()
    sxy = a2["sxy"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        slope = np.where(sxx > 0, sxy / sxx, np.nan)
    intercept = muy - slope * mux

    def r6(v):
        return np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6

    out = a1[["l_returnflag"]].copy()
    out["slope"] = r6(slope)
    out["intercept"] = r6(intercept)
    out["n"] = a1["n"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def events_value_skewness(sf_dir: str):
    """Grouped sample skewness (bias-corrected G1, DuckDB's definition)
    from mergeable centered moments — the same two-pass discipline as
    lineitem_regr extended to third order."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def m1(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b.column("event_type"),
                         "sx": b.column("value")})

    a1 = partial_group_agg(ds.map_batches(m1, batch_format="pyarrow"),
                           ["event_type"], sum_cols=["sx"],
                           count_alias="n", combine="driver")
    if a1.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             "skew": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    types = a1["event_type"].to_numpy(dtype=object)
    nv = a1["n"].to_numpy(dtype=np.float64)
    mu = a1["sx"].to_numpy() / nv

    def m2(b: pa.Table) -> pa.Table:
        t = b.column("event_type").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(types, t)
        d = b.column("value").to_numpy(zero_copy_only=False) - mu[idx]
        return pa.table({"event_type": b.column("event_type"),
                         "s2": pa.array(d * d), "s3": pa.array(d * d * d)})

    a2 = partial_group_agg(ds.map_batches(m2, batch_format="pyarrow"),
                           ["event_type"], sum_cols=["s2", "s3"],
                           combine="driver")
    m2_ = a2["s2"].to_numpy() / nv
    m3_ = a2["s3"].to_numpy() / nv
    with np.errstate(invalid="ignore", divide="ignore"):
        g1 = m3_ / np.power(m2_, 1.5)
        skew = g1 * np.sqrt(nv * (nv - 1)) / (nv - 2)
    skew = np.where((nv > 2) & (m2_ > 0), skew, np.nan)
    out = a1[["event_type"]].copy()
    out["skew"] = np.sign(skew) * np.floor(np.abs(skew) * 1e6 + 0.5) / 1e6
    out["n"] = a1["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def nation_acctbal_geomean(sf_dir: str):
    """Grouped geometric mean of positive balances — a log-domain
    mergeable aggregate (sum of ln, closed with exp on the driver)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("s_acctbal"), pa.scalar(0.0)))
        x = b.column("s_acctbal").to_numpy(zero_copy_only=False)
        return pa.table({"nationkey": pc.cast(b.column("s_nationkey"),
                                              pa.int64()),
                         "lnx": pa.array(np.log(x))})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["nationkey"], sum_cols=["lnx"],
                            count_alias="n_pos", combine="driver")
    if agg.empty:
        return pd.DataFrame({"nationkey": pd.Series([], dtype="int64"),
                             "geomean_bal": pd.Series([], dtype="float64"),
                             "n_pos": pd.Series([], dtype="int64")})
    n = agg["n_pos"].to_numpy(dtype=np.float64)
    geo = np.exp(agg["lnx"].to_numpy() / n)
    out = agg[["nationkey"]].copy()
    out["nationkey"] = out["nationkey"].astype("int64")
    out["geomean_bal"] = np.floor(geo * 1e6 + 0.5) / 1e6
    out["n_pos"] = agg["n_pos"].astype("int64")
    return out.sort_values("nationkey").reset_index(drop=True)


def orders_month_seasonality(sf_dir: str):
    """Calendar seasonality: order count and average price by
    month-of-year (EXTRACT month) — a date-part rollup closed from
    sum+count partials."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"month": pc.cast(pc.month(b.column("o_orderdate")),
                                          pa.int64()),
                         "s": b.column("o_totalprice")})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["month"], sum_cols=["s"],
                            count_alias="n_orders", combine="driver")
    if agg.empty:
        return pd.DataFrame({"month": pd.Series([], dtype="int64"),
                             "n_orders": pd.Series([], dtype="int64"),
                             "avg_price": pd.Series([], dtype="float64")})
    avg = agg["s"].to_numpy() / agg["n_orders"].to_numpy(dtype=np.float64)
    out = agg[["month"]].copy()
    out["month"] = out["month"].astype("int64")
    out["n_orders"] = agg["n_orders"].astype("int64")
    out["avg_price"] = np.floor(avg * 100 + 0.5) / 100
    return out.sort_values("month").reset_index(drop=True)


def token_zipf(sf_dir: str):
    """Rank-frequency head of the corpus vocabulary: top-100 tokens by
    global count with their Zipf rank — ranked top-k over the word-count
    aggregate (corpus-statistics step of an LM data pipeline)."""
    import numpy as np

    import ray.data

    from elevant_ray.stages.text_stats import unigram_counts as uc

    import pandas as pd

    t = uc(_read(sf_dir, "documents", ["text"]))
    res = _det_sort(t, ["count", "token"], descending=[True, False])
    if isinstance(res, ray.data.Dataset):
        df = res.limit(100).to_pandas()
    else:
        df = res.to_pandas().head(100)
    if not {"token", "count"}.issubset(df.columns):
        # empty corpus: the aggregate's schema-less empty block dropped
        # the column names — rebuild the typed empty frame
        df = pd.DataFrame({"token": pd.Series([], dtype="object"),
                           "count": pd.Series([], dtype="int64")})
    df = df.reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["rank", "token", "count"]]


def part_name_similarity(sf_dir: str):
    """Within-blocking-key pairwise string scoring — the flagship
    verify stage's exact shape (north-star "batched Jaro-Winkler/
    Levenshtein + token-Jaccard scorer") on an oracle-checkable metric
    pair: all part pairs sharing a brand, scored with unit-cost edit
    distance and char-set Jaccard, kept at lev ≤ 4.  Brand groups
    co-locate with one bucket shuffle; scoring memoizes over distinct
    name pairs (bounded vocabulary ⇒ O(vocab²) DP work regardless of
    pair count)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.scoring import score_name_pairs
    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_name"])
    empty = pd.DataFrame({"p_brand": pd.Series([], dtype="object"),
                          "pk1": pd.Series([], dtype="int64"),
                          "pk2": pd.Series([], dtype="int64"),
                          "name1": pd.Series([], dtype="object"),
                          "name2": pd.Series([], dtype="object"),
                          "lev": pd.Series([], dtype="int64"),
                          "char_jac": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for brand, gg in g.groupby("p_brand"):
            gg = gg.sort_values("p_partkey")
            pk = gg["p_partkey"].to_numpy()
            nm = gg["p_name"].to_numpy(dtype=object)
            i, j = np.triu_indices(len(pk), k=1)
            lev, jac = score_name_pairs(nm[i], nm[j])
            m = lev <= 4
            outs.append(pd.DataFrame({
                "p_brand": brand, "pk1": pk[i][m], "pk2": pk[j][m],
                "name1": nm[i][m], "name2": nm[j][m],
                "lev": lev[m], "char_jac": jac[m]}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    return _det_sort(bucketed_group_apply(ds, "p_brand", per_bucket),
                     ["p_brand", "pk1", "pk2"])


def nation_balance_full_join(sf_dir: str):
    """FULL OUTER join of two filtered per-nation aggregates (rich
    customers vs rich suppliers, acctbal > 4500): nations present on
    only one side keep a NULL on the other.  Both sides shrink to
    dimension-bounded aggregates first, so the outer join closes on the
    driver under the cutoff; beyond it the hash-partitioned co-group
    join runs with how='full_outer' (the 100 TB path, knob-tested)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (cogroup_join, partial_group_agg,
                                         scale_cutoff)

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def pre(key, col):
        def f(b: pa.Table) -> pa.Table:
            b = b.filter(pc.greater(b.column(col), pa.scalar(4500.0)))
            return pa.table({"nationkey": pc.cast(b.column(key), pa.int64()),
                             "bal": b.column(col),
                             "one": pa.array(
                                 np.ones(b.num_rows, np.int64))})
        return f

    # the per-nation aggregate is dimension-bounded, so the driver
    # combine (zero exchanges) is the right plan at every input size;
    # the knob still forces the dataset-groupby + co-group path
    small = (cust.size_bytes() + supp.size_bytes()) <= scale_cutoff(
        16 << 30)
    if small:
        def side_pd(ds, key, col, side):
            agg = partial_group_agg(
                ds.map_batches(pre(key, col), batch_format="pyarrow"),
                ["nationkey"], sum_cols=["bal", "one"], combine="driver")
            agg.columns = ["nationkey", f"{side}_bal_raw", f"{side}_n_raw"]
            return agg

        df = side_pd(cust, "c_nationkey", "c_acctbal", "cust").merge(
            side_pd(supp, "s_nationkey", "s_acctbal", "supp"),
            on="nationkey", how="outer")
    else:
        def rn(side):
            def f(b: pa.Table) -> pa.Table:
                return b.rename_columns(
                    ["nationkey", f"{side}_bal_raw", f"{side}_n_raw"])
            return f

        c_agg = partial_group_agg(
            cust.map_batches(pre("c_nationkey", "c_acctbal"),
                             batch_format="pyarrow"),
            ["nationkey"], sum_cols=["bal", "one"], combine="dataset") \
            .map_batches(rn("cust"), batch_format="pyarrow")
        s_agg = partial_group_agg(
            supp.map_batches(pre("s_nationkey", "s_acctbal"),
                             batch_format="pyarrow"),
            ["nationkey"], sum_cols=["bal", "one"], combine="dataset") \
            .map_batches(rn("supp"), batch_format="pyarrow")
        schema = lambda side: pa.schema([  # noqa: E731
            ("nationkey", pa.int64()), (f"{side}_bal_raw", pa.float64()),
            (f"{side}_n_raw", pa.int64())])
        df = cogroup_join(c_agg, s_agg, on="nationkey",
                          left_schema=schema("cust"),
                          right_schema=schema("supp"),
                          how="full_outer").to_pandas()
    if df.empty:
        return pd.DataFrame({"nationkey": pd.Series([], dtype="int64"),
                             "cust_bal": pd.Series([], dtype="float64"),
                             "supp_bal": pd.Series([], dtype="float64"),
                             "n_cust": pd.Series([], dtype="int64"),
                             "n_supp": pd.Series([], dtype="int64")})
    out = pd.DataFrame({
        "nationkey": df["nationkey"].astype("int64"),
        "cust_bal": np.floor(df["cust_bal_raw"].to_numpy(np.float64)
                             * 100 + 0.5) / 100,
        "supp_bal": np.floor(df["supp_bal_raw"].to_numpy(np.float64)
                             * 100 + 0.5) / 100,
        "n_cust": df["cust_n_raw"].fillna(0).astype("int64"),
        "n_supp": df["supp_n_raw"].fillna(0).astype("int64")})
    return out.sort_values("nationkey").reset_index(drop=True)


def doc_token_mad(sf_dir: str):
    """Grouped robust dispersion: exact median absolute deviation of
    per-doc token counts per language.  Token counts are small ints, so
    each language reduces to a (count → weight) histogram via one
    partial aggregate; both interpolated medians (the center and the
    deviation median) close on the driver from the histogram — exact
    at any corpus size without a distributed sort."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import token_count

        n = [token_count(t) for t in b.column("text").to_pylist()]
        return pa.table({"lang": b.column("lang"),
                         "n": pa.array(n, pa.int64())})

    hist = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                             ["lang", "n"], count_alias="w",
                             combine="driver")
    if hist.empty:
        return pd.DataFrame({"lang": pd.Series([], dtype="object"),
                             "mad": pd.Series([], dtype="float64"),
                             "med": pd.Series([], dtype="float64"),
                             "n_docs": pd.Series([], dtype="int64")})

    def wq50(vals: np.ndarray, w: np.ndarray) -> float:
        # interpolated median of the weighted multiset (quantile_cont
        # semantics: v[lo] + (h-lo)·(v[hi]-v[lo]) at h=(N-1)/2)
        order = np.argsort(vals, kind="stable")
        vals, w = vals[order], w[order]
        n = int(w.sum())
        h = (n - 1) * 0.5
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        cw = np.cumsum(w)
        a = vals[np.searchsorted(cw, lo + 1)]
        b = vals[np.searchsorted(cw, hi + 1)]
        return float(a + (h - lo) * (b - a))

    rows = []
    for lang, g in hist.groupby("lang"):
        v = g["n"].to_numpy(np.float64)
        w = g["w"].to_numpy(np.int64)
        med = wq50(v, w)
        mad = wq50(np.abs(v - med), w)
        rows.append((lang, mad, med, int(w.sum())))
    out = pd.DataFrame(rows, columns=["lang", "mad", "med", "n_docs"])
    return out.sort_values("lang").reset_index(drop=True)


def events_value_zscore(sf_dir: str):
    """Per-type feature standardization: z-score of each event's value
    against its event type's mean/stddev — the training-data
    normalization step.  Group stats come from one partial-aggregated
    pass (mean) plus one centered pass (variance, same two-pass
    discipline as lineitem_regr); the normalization itself is a
    stateless broadcast map, no shuffle touches the event rows."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def m1(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b.column("event_type"),
                         "sx": b.column("value")})

    a1 = partial_group_agg(ds.map_batches(m1, batch_format="pyarrow"),
                           ["event_type"], sum_cols=["sx"],
                           count_alias="n", combine="driver")
    if a1.empty:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "event_type": pd.Series([], dtype="object"),
                             "z": pd.Series([], dtype="float64")})
    types = a1["event_type"].to_numpy(dtype=object)
    nv = a1["n"].to_numpy(dtype=np.float64)
    mu = a1["sx"].to_numpy() / nv

    def m2(b: pa.Table) -> pa.Table:
        t = b.column("event_type").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(types, t)
        d = b.column("value").to_numpy(zero_copy_only=False) - mu[idx]
        return pa.table({"event_type": b.column("event_type"),
                         "s2": pa.array(d * d)})

    a2 = partial_group_agg(ds.map_batches(m2, batch_format="pyarrow"),
                           ["event_type"], sum_cols=["s2"],
                           combine="driver")
    with np.errstate(invalid="ignore", divide="ignore"):
        sd = np.sqrt(a2["s2"].to_numpy() / (nv - 1))
    sd = np.where((nv > 1) & (sd > 0), sd, np.nan)

    def norm(b: pa.Table) -> pa.Table:
        t = b.column("event_type").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(types, t)
        z = (b.column("value").to_numpy(zero_copy_only=False)
             - mu[idx]) / sd[idx]
        # round 4, not 6: mu/sd differ from the oracle's accumulators
        # by ~1e-12 relative, and at 1e-6 boundary spacing the flip
        # probability across 10^4+ rows is no longer negligible
        z = np.sign(z) * np.floor(np.abs(z) * 1e4 + 0.5) / 1e4 + 0.0
        return pa.table({"event_id": b.column("event_id"),
                         "event_type": b.column("event_type"),
                         "z": pa.array(z, pa.float64())})

    return _det_sort(ds.map_batches(norm, batch_format="pyarrow"),
                     ["event_id"])


def docs_hash_sample(sf_dir: str):
    """Deterministic fixed-size uniform sample: the k documents with
    the smallest multiplicative-hash rank — a distributed bottom-k
    (per-block partial bottom-k, tiny driver close), reproducible
    across runs and cluster sizes, unlike random_shuffle().limit()."""
    import numpy as np
    import pandas as pd

    K = 100
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def ranked(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h = (ids * 2654435761) % 4294967296
        t = pa.table({"doc_id": b.column("doc_id"),
                      "lang": b.column("lang"),
                      "h": pa.array(h, pa.int64())})
        df = t.to_pandas().sort_values(["h", "doc_id"]).head(K)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(ranked, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "lang": pd.Series([], dtype="object"),
                             "h": pd.Series([], dtype="int64")})
    return (parts.sort_values(["h", "doc_id"]).head(K)
            .reset_index(drop=True))


def events_purchaser_events(sf_dir: str):
    """Semi-join with a Bloom prefilter: every event of a user who made
    a high-value purchase (value > 200).  The build side folds into one OR-merged
    bitset (fixed bytes per block — it never shuffles); the probe side
    prefilters map-side with zero false negatives, and the small
    surviving fraction verifies exactly — broadcast key set under the
    cutoff, hash-partitioned co-group join beyond (the 100 TB path:
    bloom cuts the join's shuffle volume to ~the true match rate)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.sketches import bloom_contains, bloom_from_dataset
    from elevant_ray.stages.util import cogroup_join, np_columns, scale_cutoff

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "event_type", "value"])
    if ev.count() == 0:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "user_id": pd.Series([], dtype="int64"),
                             "event_type": pd.Series([], dtype="object")})

    def build_pre(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b.column("event_type"), pa.scalar("purchase")),
                    pc.greater(b.column("value"), pa.scalar(200.0)))
        return b.filter(m).select(["user_id"])

    build = ev.map_batches(build_pre, batch_format="pyarrow").materialize()
    words = bloom_from_dataset(build, "user_id")

    def pref(b: pa.Table) -> pa.Table:
        mask = bloom_contains(
            words,
            b.column("user_id").to_numpy(zero_copy_only=False)
            .astype(np.int64))
        return b.filter(pa.array(mask)).select(
            ["event_id", "user_id", "event_type"])

    cand = ev.map_batches(pref, batch_format="pyarrow")
    if build.size_bytes() <= scale_cutoff(64 << 20):
        keys = np.unique(np_columns(build, ["user_id"])["user_id"]) \
            if build.count() else np.empty(0, np.int64)

        def verify(b: pa.Table) -> pa.Table:
            u = b.column("user_id").to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                return b.slice(0, 0)
            i = np.clip(np.searchsorted(keys, u), 0, len(keys) - 1)
            return b.filter(pa.array(keys[i] == u))

        out = cand.map_batches(verify, batch_format="pyarrow")
    else:
        dk = _distinct_int(build, "user_id")
        if not hasattr(dk, "map_batches"):  # driver frame → Dataset
            import ray.data as rd

            dk = rd.from_pandas(dk)
        out = cogroup_join(
            cand, dk, on="user_id",
            left_schema=pa.schema([("event_id", pa.int64()),
                                   ("user_id", pa.int64()),
                                   ("event_type", pa.string())]),
            right_schema=pa.schema([("user_id", pa.int64())])) \
            .map_batches(lambda b: b.select(
                ["event_id", "user_id", "event_type"]),
                batch_format="pyarrow")
    return _det_sort(out, ["event_id"])


def part_pagerank(sf_dir: str):
    """Iterative PageRank (3 damped iterations, simplified semantics —
    sink mass leaks, mirrored by the oracle) over the deterministic part
    DAG (k → k//7 and k → k//3 for k > 0, the type_closure graph).
    Driver numpy scatter-add iteration under the edge cutoff; co-group
    join + dst-sum exchange per iteration beyond it (knob-tested).  The
    oracle unrolls the same three iterations as chained CTEs."""
    import numpy as np

    from elevant_ray.stages.graph import pagerank

    ds = _read(sf_dir, "part", ["p_partkey"])

    def edges(b: pa.Table) -> pa.Table:
        src, dst = [], []
        for k in b.column("p_partkey").to_pylist():
            if k > 0:
                src.extend((k, k))
                dst.extend((k // 7, k // 3))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    pr = pagerank(ds.map_batches(edges, batch_format="pyarrow"),
                  num_iters=3, damping=0.85,
                  num_partitions=_shuffle_parts())

    def rnd(b: pa.Table) -> pa.Table:
        r = b.column("rank").to_numpy(zero_copy_only=False)
        return pa.table({"node": b.column("node"),
                         "rank": pa.array(np.floor(r * 1e8 + 0.5) / 1e8)})

    if isinstance(pr, pa.Table):
        return _det_sort(rnd(pr).to_pandas(), ["node"])
    return _det_sort(pr.map_batches(rnd, batch_format="pyarrow"), ["node"])


def supplier_ship_except_all(sf_dir: str):
    """EXCEPT ALL (bag difference with multiplicity): per supplier, how
    many more lineitems they shipped in 1996 than in 1997 — two partial
    count aggregates diffed on the driver, surviving multiplicities
    only.  The multiset semantics (max(c96 − c97, 0)) distinguish this
    from the distinct EXCEPT already covered by customer_except."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    line = _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate"])

    def year_counts(b: pa.Table) -> pa.Table:
        yr = pc.year(b.column("l_shipdate"))
        m96 = pc.equal(yr, pa.scalar(1996, pa.int64()))
        m97 = pc.equal(yr, pa.scalar(1997, pa.int64()))
        return pa.table({
            "l_suppkey": b.column("l_suppkey"),
            "c96": pc.cast(m96, pa.int64()),
            "c97": pc.cast(m97, pa.int64())})

    agg = partial_group_agg(
        line.map_batches(year_counts, batch_format="pyarrow"),
        ["l_suppkey"], sum_cols=["c96", "c97"], combine="driver")
    if agg.empty:
        return pd.DataFrame({"l_suppkey": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64")})
    n = np.maximum(agg["c96"].to_numpy(np.int64)
                   - agg["c97"].to_numpy(np.int64), 0)
    out = pd.DataFrame({"l_suppkey": agg["l_suppkey"].astype("int64"),
                        "n": n})
    return (out[out["n"] > 0].sort_values("l_suppkey")
            .reset_index(drop=True))


def returnflag_harmonic_qty(sf_dir: str):
    """Grouped harmonic mean of quantities (n / Σ(1/x)) — the
    reciprocal-domain mergeable aggregate, complementing the log-domain
    geometric mean."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def pre(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "inv": pa.array(1.0 / q)})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["l_returnflag"], sum_cols=["inv"],
                            count_alias="n", combine="driver")
    if agg.empty:
        return pd.DataFrame({"l_returnflag": pd.Series([], dtype="object"),
                             "hmean_qty": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    h = agg["n"].to_numpy(np.float64) / agg["inv"].to_numpy()
    out = agg[["l_returnflag"]].copy()
    out["hmean_qty"] = np.floor(h * 1e6 + 0.5) / 1e6
    out["n"] = agg["n"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def unigram_counts_incremental(sf_dir: str):
    """Incremental refresh of unigram_counts: the corpus arrives as two
    append-only increments (doc_id parity) folded into persisted
    bucketed state (state/incremental.py — per-bucket merges, untouched
    buckets carry over, exactly-once per increment id).  The final
    state equals the one-shot aggregate bit-for-bit, so it shares the
    unigram oracle."""
    import shutil
    import tempfile

    import numpy as np

    from elevant_ray.stages.text_stats import _partial_unigram_counts
    from elevant_ray.state.incremental import incremental_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    root = tempfile.mkdtemp(prefix="elevant_inc_")
    state = root + "/state"
    try:
        out = None
        for part in (0, 1):
            def half(b: pa.Table, part=part) -> pa.Table:
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                return b.filter(pa.array(ids % 2 == part))

            tok = (ds.map_batches(half, batch_format="pyarrow")
                   .map_batches(lambda b: _partial_unigram_counts(b, "text"),
                                batch_format="pyarrow"))
            out = incremental_group_sum(state, tok, ["token"], ["partial"],
                                        increment_id=f"half-{part}")
        df = out.rename(columns={"partial": "count"})
        df["count"] = df["count"].astype("int64")
        return df.sort_values("token").reset_index(drop=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def embedding_stats(sf_dir: str):
    """Nested-list kernels over the Arrow ``list<float>`` column without
    per-row Python: the flat values buffer is taken zero-copy and
    segment-reduced with ``np.maximum.reduceat`` / ``np.add.reduceat``
    over the list offsets — per-vector max component and L1 norm,
    variable-length safe."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    if ds.count() == 0:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "label": pd.Series([], dtype="int32"),
                             "vmax": pd.Series([], dtype="float64"),
                             "l1": pd.Series([], dtype="float64")})

    def stats(b: pa.Table) -> pa.Table:
        col = b.column("embedding")
        flat = col.combine_chunks()
        vals = flat.values.to_numpy(zero_copy_only=False).astype(np.float64)
        offs = flat.offsets.to_numpy()
        starts = offs[:-1]
        vmax = np.maximum.reduceat(vals, starts)
        l1 = np.add.reduceat(np.abs(vals), starts)
        return pa.table({
            "vec_id": b.column("vec_id"),
            "label": b.column("label"),
            "vmax": pa.array(np.sign(vmax)
                             * np.floor(np.abs(vmax) * 1e6 + 0.5) / 1e6),
            "l1": pa.array(np.floor(l1 * 1e6 + 0.5) / 1e6)})

    return _det_sort(ds.map_batches(stats, batch_format="pyarrow"),
                     ["vec_id"])


def q4_order_priority(sf_dir: str):
    """Order-priority checking (TPC-H Q4 shape): per priority, the
    number of 1996H1 orders with at least one line shipped ≥ 90 days
    after the order date — an EXISTS semi-join.  The order window ships
    as a broadcast IntKeyMap (orderkey → orderdate µs); the lineitem
    side never shuffles: each batch probes the map, applies the
    lateness predicate, and collapses to its distinct qualifying
    orderkeys, so only ≤ |window orders| keys reach the combine.  The
    window is corpus-proportional, so past the broadcast cutoff the
    same semi-join runs as a hash-partitioned cogroup (packed
    orderdate≪8|priority-code value column), the distinct shrinks to a
    composite-int dedup (_distinct_int), and the ≤|priorities| counts
    decode the survivors."""
    import datetime

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (IntKeyMap, cogroup_join,
                                         np_columns, partial_group_agg,
                                         scale_cutoff)

    empty = pd.DataFrame({"o_orderpriority": pd.Series([], dtype="object"),
                          "n_orders": pd.Series([], dtype="int64")})
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def window(b: pa.Table) -> pa.Table:
        lo = pa.scalar(datetime.datetime(1996, 1, 1))
        hi = pa.scalar(datetime.datetime(1996, 7, 1))
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        b = b.filter(m)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "odate_us": pc.cast(b.column("o_orderdate"), pa.int64()),
            "o_orderpriority": b.column("o_orderpriority")})

    wds = orders.map_batches(window, batch_format="pyarrow").materialize()
    if wds.count() == 0:
        return empty
    ninety = np.int64(90 * 86400 * 1_000_000)
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    if wds.size_bytes() <= scale_cutoff(64 << 20):
        win = np_columns(wds, ["o_orderkey", "odate_us",
                               "o_orderpriority"])
        omap = IntKeyMap(win["o_orderkey"],
                         win["odate_us"].astype(np.int64))

        def late_keys(b: pa.Table) -> pa.Table:
            ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
            odate, found = omap.take(ok)
            ship = pc.cast(b.column("l_shipdate"), pa.int64()).to_numpy(
                zero_copy_only=False)
            m = found & (ship >= odate + ninety)
            return pa.table({"o_orderkey": pa.array(np.unique(ok[m]),
                                                    pa.int64())})

        late = np.unique(np_columns(
            line.map_batches(late_keys, batch_format="pyarrow"),
            ["o_orderkey"])["o_orderkey"])
        hit = np.isin(win["o_orderkey"], late)
        if not hit.any():
            return empty
        out = (pd.DataFrame(
            {"o_orderpriority": win["o_orderpriority"][hit]})
            .groupby("o_orderpriority", as_index=False).size()
            .rename(columns={"size": "n_orders"}))
        out["n_orders"] = out["n_orders"].astype("int64")
        return out.sort_values("o_orderpriority").reset_index(drop=True)

    # scale path: the window stays distributed — cogroup the lineitem
    # side against it on orderkey, dedup qualifying orders as composite
    # ints, decode to the tiny per-priority count
    pr = partial_group_agg(wds, ["o_orderpriority"], count_alias="_n",
                           combine="driver")
    vocab = np.array(sorted(pr["o_orderpriority"]), dtype=object)

    def w_pre(b: pa.Table) -> pa.Table:
        code = np.searchsorted(
            vocab, b.column("o_orderpriority").to_numpy(
                zero_copy_only=False))
        packed = (b.column("odate_us").to_numpy(zero_copy_only=False)
                  << 8) + code
        return pa.table({"l_orderkey": b.column("o_orderkey"),
                         "packed": pa.array(packed, pa.int64())})

    def l_pre(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "ship_us": pc.cast(b.column("l_shipdate"),
                                            pa.int64())})

    joined = cogroup_join(
        line.map_batches(l_pre, batch_format="pyarrow"),
        wds.map_batches(w_pre, batch_format="pyarrow"),
        on="l_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("ship_us", pa.int64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("packed", pa.int64())]))

    def qualify(b: pa.Table) -> pa.Table:
        ship = b.column("ship_us").to_numpy(zero_copy_only=False)
        packed = b.column("packed").to_numpy(zero_copy_only=False)
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        m = ship >= (packed >> 8) + ninety
        comp = (ok[m] << 8) + (packed[m] & 255)
        return pa.table({"comp": pa.array(np.unique(comp), pa.int64())})

    distinct = _distinct_int(
        joined.map_batches(qualify, batch_format="pyarrow"), "comp")
    if isinstance(distinct, pd.DataFrame):
        codes = distinct["comp"].to_numpy(np.int64) & 255
        cnt = np.bincount(codes, minlength=len(vocab))
    else:
        def decode(b: pa.Table) -> pa.Table:
            return pa.table({"code": pa.array(
                b.column("comp").to_numpy(zero_copy_only=False) & 255,
                pa.int64())})

        cagg = partial_group_agg(
            distinct.map_batches(decode, batch_format="pyarrow"),
            ["code"], count_alias="n", combine="driver")
        cnt = np.zeros(len(vocab), np.int64)
        cnt[cagg["code"].to_numpy(np.int64)] = cagg["n"].to_numpy(
            np.int64)
    keep = cnt > 0
    if not keep.any():
        return empty
    return pd.DataFrame({"o_orderpriority": vocab[keep],
                         "n_orders": cnt[keep].astype("int64")})


def q12_late_lines(sf_dir: str):
    """Late-line priority split (TPC-H Q12 shape): per ship year, the
    number of lines belonging to high-priority orders (1-URGENT /
    2-HIGH) vs others, among lines shipped ≥ 60 days after their order
    date.  Under the cutoff the orders side folds into the lineitem
    scan as one broadcast IntKeyMap whose int64 value packs
    (orderdate µs << 1 | priority-class bit); beyond it the
    hash-partitioned co-group join carries the same two columns.
    Either way the counting is a two-phase conditional aggregate
    (per-batch Arrow partials over ≤ |years| groups)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (IntKeyMap, cogroup_join, np_columns,
                                         partial_group_agg, scale_cutoff)

    empty = pd.DataFrame({"l_year": pd.Series([], dtype="int64"),
                          "high_lines": pd.Series([], dtype="int64"),
                          "low_lines": pd.Series([], dtype="int64")})
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    if line.count() == 0 or orders.count() == 0:
        return empty
    sixty = np.int64(60 * 86400 * 1_000_000)
    prio = pa.array(["1-URGENT", "2-HIGH"])

    def o_pre(b: pa.Table) -> pa.Table:
        high = pc.cast(pc.is_in(b.column("o_orderpriority"),
                                value_set=prio), pa.int64())
        packed = pc.add(
            pc.shift_left(pc.cast(b.column("o_orderdate"), pa.int64()),
                          pa.scalar(1, pa.int64())), high)
        return pa.table({"l_orderkey": b.column("o_orderkey"),
                         "packed": packed})

    def unpack(yr, ship, packed):
        m = ship >= (packed >> 1) + sixty
        high = (packed & 1)[m]
        return pa.table({"l_year": pa.array(yr[m], pa.int64()),
                         "high": pa.array(high, pa.int64()),
                         "low": pa.array(1 - high, pa.int64())})

    if orders.size_bytes() <= scale_cutoff(64 << 20):
        o = np_columns(orders.map_batches(o_pre, batch_format="pyarrow"),
                       ["l_orderkey", "packed"])
        omap = IntKeyMap(o["l_orderkey"], o["packed"].astype(np.int64))

        def fold(b: pa.Table) -> pa.Table:
            ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
            packed = omap.take_checked(ok)
            ship = pc.cast(b.column("l_shipdate"), pa.int64()).to_numpy(
                zero_copy_only=False)
            yr = pc.year(b.column("l_shipdate")).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return unpack(yr, ship, packed)

        pre = line.map_batches(fold, batch_format="pyarrow")
    else:
        def l_pre(b: pa.Table) -> pa.Table:
            return pa.table({
                "l_orderkey": b.column("l_orderkey"),
                "ship_us": pc.cast(b.column("l_shipdate"), pa.int64()),
                "l_year": pc.cast(pc.year(b.column("l_shipdate")),
                                  pa.int64())})

        joined = cogroup_join(
            line.map_batches(l_pre, batch_format="pyarrow"),
            orders.map_batches(o_pre, batch_format="pyarrow"),
            on="l_orderkey",
            left_schema=pa.schema([("l_orderkey", pa.int64()),
                                   ("ship_us", pa.int64()),
                                   ("l_year", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("packed", pa.int64())]))

        def fold2(b: pa.Table) -> pa.Table:
            return unpack(
                b.column("l_year").to_numpy(zero_copy_only=False),
                b.column("ship_us").to_numpy(zero_copy_only=False),
                b.column("packed").to_numpy(zero_copy_only=False))

        pre = joined.map_batches(fold2, batch_format="pyarrow")

    agg = partial_group_agg(pre, ["l_year"], sum_cols=["high", "low"],
                            combine="driver")
    if agg is None or len(agg) == 0:
        return empty
    out = agg[["l_year"]].copy()
    out["l_year"] = out["l_year"].astype("int64")
    out["high_lines"] = agg["high"].astype("int64")
    out["low_lines"] = agg["low"].astype("int64")
    return out.sort_values("l_year").reset_index(drop=True)


def q13_order_count_distribution(sf_dir: str):
    """Customer order-count distribution (TPC-H Q13 shape): how many
    customers placed exactly n orders, including the zero bucket — the
    LEFT JOIN folded into arithmetic.  Per-customer counts come from
    one high-cardinality groupby over orders (per-batch partials
    pre-shrink the exchange), the histogram over counts is a tiny
    two-phase aggregate, and the 0-order customers are total customers
    minus matched actives (one subtraction instead of an outer join;
    relies on the generator's FK integrity o_custkey ⊆ c_custkey,
    asserted in tests)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from elevant_ray.stages.util import partial_group_agg

    empty = pd.DataFrame({"c_count": pd.Series([], dtype="int64"),
                          "custdist": pd.Series([], dtype="int64")})
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    if n_cust == 0:
        return empty
    orders = _read(sf_dir, "orders", ["o_custkey"])
    if orders.count() == 0:
        return pd.DataFrame({"c_count": pd.Series([0], dtype="int64"),
                             "custdist": pd.Series([n_cust],
                                                   dtype="int64")})

    def partial(b: pa.Table) -> pa.Table:
        return (b.group_by("o_custkey")
                .aggregate([("o_custkey", "count")])
                .rename_columns(["o_custkey", "n"]))

    per_cust = (orders.map_batches(partial, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("n", alias_name="c_count")))
    hist = partial_group_agg(
        per_cust.map_batches(lambda b: b.select(["c_count"]),
                             batch_format="pyarrow"),
        ["c_count"], count_alias="custdist", combine="driver")
    out = hist[["c_count", "custdist"]].copy()
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    zero = n_cust - int(out["custdist"].sum())
    if zero > 0:
        out = pd.concat(
            [out, pd.DataFrame({"c_count": pd.Series([0], dtype="int64"),
                                "custdist": pd.Series([zero],
                                                      dtype="int64")})],
            ignore_index=True)
    return (out.sort_values(["custdist", "c_count"], ascending=False)
            .reset_index(drop=True))


def q16_supplier_variety(sf_dir: str):
    """Supplier-variety count (TPC-H Q16 shape): per (brand, size), the
    number of DISTINCT suppliers shipping that part class, excluding
    one brand and a supplier blacklist (NOT IN).  Part attributes fold
    into the lineitem scan as broadcast IntKeyMaps; each batch encodes
    its distinct (brand, size, suppkey) triples into ONE int64
    composite key (brand code ≪56 | size ≪40 | suppkey), so the global
    distinct is a single-int dedup (driver np.unique under the cutoff,
    int-key groupby beyond) instead of a 3-column string exchange; the
    final per-(brand,size) count decodes the survivors."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (IntKeyMap, np_columns,
                                         partial_group_agg)

    empty = pd.DataFrame({"p_brand": pd.Series([], dtype="object"),
                          "p_size": pd.Series([], dtype="int64"),
                          "supplier_cnt": pd.Series([], dtype="int64")})
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    if line.count() == 0 or part.count() == 0:
        return empty
    p = np_columns(part, ["p_partkey", "p_brand", "p_size"])
    brands, bcodes = np.unique(p["p_brand"], return_inverse=True)
    excl = np.searchsorted(brands, "Brand#1") \
        if "Brand#1" in brands.tolist() else -1
    cmap = IntKeyMap(p["p_partkey"], bcodes.astype(np.int64))
    szmap = IntKeyMap(p["p_partkey"], p["p_size"].astype(np.int64))
    s = np_columns(_read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]),
                   ["s_suppkey", "s_acctbal"])
    bad = s["s_suppkey"][s["s_acctbal"] < 0] if len(s["s_suppkey"]) else []
    badmap = IntKeyMap(np.asarray(bad, np.int64)) if len(bad) else None

    def triples(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        code = cmap.take_checked(pk)
        size = szmap.take_checked(pk)
        keep = code != excl
        if badmap is not None:
            keep &= ~badmap.contains(sk)
        comp = (code[keep] << 56) + (size[keep] << 40) + sk[keep]
        return pa.table({"comp": pa.array(np.unique(comp), pa.int64())})

    distinct = _distinct_int(
        line.map_batches(triples, batch_format="pyarrow"), "comp")
    if isinstance(distinct, pd.DataFrame):
        comp = distinct["comp"].to_numpy(np.int64)
        out = (pd.DataFrame({
            "p_brand": brands[(comp >> 56)],
            "p_size": (comp >> 40) & ((1 << 16) - 1)})
            .groupby(["p_brand", "p_size"], as_index=False).size()
            .rename(columns={"size": "supplier_cnt"}))
    else:
        def decode(b: pa.Table) -> pa.Table:
            comp = b.column("comp").to_numpy(zero_copy_only=False)
            return pa.table({
                "p_brand": pa.array(brands[(comp >> 56)], pa.string()),
                "p_size": pa.array((comp >> 40) & ((1 << 16) - 1),
                                   pa.int64())})

        out = partial_group_agg(
            distinct.map_batches(decode, batch_format="pyarrow"),
            ["p_brand", "p_size"], count_alias="supplier_cnt",
            combine="driver")
    if out is None or len(out) == 0:
        return empty
    out = out[["p_brand", "p_size", "supplier_cnt"]].copy()
    out["p_size"] = out["p_size"].astype("int64")
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return (out.sort_values(["supplier_cnt", "p_brand", "p_size"],
                            ascending=[False, True, True])
            .reset_index(drop=True))


def q21_sole_late_shipper(sf_dir: str):
    """Suppliers who alone shipped last (TPC-H Q21 shape): in orders
    with lines from ≥ 2 suppliers, find the supplier whose latest line
    is the order's unique latest ship date (every other supplier
    shipped strictly earlier), and count such orders per supplier.
    ONE shuffle end to end: per-batch Arrow partials collapse lineitem
    to per-(order, supplier) max ship dates, the orderkey hash-bucket
    co-group (util.bucketed_group_apply) then sees every surviving row
    of an order together — so the final (order, supplier) max AND the
    argmax-uniqueness resolve inside the same bucket with vectorized
    pandas transforms, no separate 2-key groupby exchange.  Stage 3 is
    a tiny per-supplier count with a broadcast name lookup."""
    import pandas as pd

    from elevant_ray.stages.util import (IntKeyMap, bucketed_group_apply,
                                         np_columns, partial_group_agg)

    empty = pd.DataFrame({"s_name": pd.Series([], dtype="object"),
                          "numwait": pd.Series([], dtype="int64")})
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_shipdate"])
    if line.count() == 0:
        return empty

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "l_suppkey": b.column("l_suppkey"),
                      "ship_us": pc.cast(b.column("l_shipdate"),
                                         pa.int64())})
        return (t.group_by(["l_orderkey", "l_suppkey"])
                .aggregate([("ship_us", "max")])
                .rename_columns(["l_orderkey", "l_suppkey", "ship_us"]))

    per_os = line.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # finish the (order, supplier) max that the per-batch partials
        # started — all rows of an order are co-located in this bucket
        df = (df.groupby(["l_orderkey", "l_suppkey"], as_index=False)
              ["ship_us"].max())
        g = df.groupby("l_orderkey")["ship_us"]
        mx = g.transform("max").to_numpy()
        nsupp = g.transform("size").to_numpy()
        at_max = df["ship_us"].to_numpy() == mx
        n_at_max = (df.assign(_am=at_max).groupby("l_orderkey")["_am"]
                    .transform("sum").to_numpy())
        keep = (nsupp > 1) & at_max & (n_at_max == 1)
        return df.loc[keep, ["l_suppkey"]]

    waiters = bucketed_group_apply(per_os, "l_orderkey",
                                   per_bucket).materialize()
    if waiters.count() == 0:
        return empty
    s = np_columns(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
                   ["s_suppkey", "s_name"])
    nmap = IntKeyMap(s["s_suppkey"], s["s_name"])

    def name(b: pa.Table) -> pa.Table:
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table({"s_name": pa.array(nmap.take_checked(sk),
                                            pa.string())})

    agg = partial_group_agg(waiters.map_batches(name,
                                                batch_format="pyarrow"),
                            ["s_name"], count_alias="numwait",
                            combine="driver")
    out = agg[["s_name", "numwait"]].copy()
    out["numwait"] = out["numwait"].astype("int64")
    return (out.sort_values(["numwait", "s_name"],
                            ascending=[False, True])
            .reset_index(drop=True))


def docs_pack_shards(sf_dir: str):
    """Token-budget shard packing (the training-data "pack documents
    into fixed-size shards" step): assign each document to the shard
    its cumulative character count falls in, walking the corpus in
    doc_id order with a 100k-char capacity.  The cumulative position is
    an exact GLOBAL prefix sum — computed by the distributed
    prefix-scan primitive (util.global_ordered_cumsum: key-range bucket
    partials, a driver-side exclusive scan over ≤256 bucket totals, one
    co-locating shuffle) — no global sort, no driver-side row loop."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import global_ordered_cumsum

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "cum_chars": pd.Series([], dtype="int64"),
                          "shard": pd.Series([], dtype="int64")})
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    cum = global_ordered_cumsum(ds, "doc_id", "n_chars")
    if cum is None:
        return empty
    cap = np.int64(100_000)

    def assign(b: pa.Table) -> pa.Table:
        c = b.column("cum").to_numpy(zero_copy_only=False)
        n = b.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": b.column("doc_id"),
                         "cum_chars": pa.array(c, pa.int64()),
                         "shard": pa.array((c - n) // cap, pa.int64())})

    return _det_sort(cum.map_batches(assign, batch_format="pyarrow"),
                     "doc_id")


def doc_bpe_token_counts(sf_dir: str):
    """BPE-style pre-tokenizer counts: tokens are maximal runs of
    letters, runs of digits, or single non-alnum-non-space chars — the
    GPT-2-ish splitting rule.  One vectorized RE2 kernel per batch
    (pc.count_substring_regex), zero Python per row; the DuckDB oracle
    runs the same RE2 pattern via regexp_extract_all (differentially
    verified byte-identical)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

    def f(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b.column("text"), pat)
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_bpe_tokens": pc.cast(n, pa.int64())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def docs_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag corpus documents containing any
    of a benchmark snippet set (here derived deterministically: the
    40-char substring at offset 20 of every 97th document).  The
    snippet set is bounded (benchmark-sized, not corpus-sized), so it
    broadcasts once via ray.put and each batch runs one vectorized
    substring-match kernel per snippet (pc.match_substring — C++ over
    the whole batch; a production variant would compile the snippets
    into one Aho-Corasick automaton per actor).  Output: contaminated
    doc_id + how many distinct snippets it contains."""
    import numpy as np
    import pandas as pd
    import ray

    from elevant_ray.stages.util import cached_get

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "n_matches": pd.Series([], dtype="int64")})
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def snips(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        b = b.filter(pa.array((did % 97 == 0) & (nch >= 60)))
        return pa.table({"snip": pc.utf8_slice_codeunits(
            b.column("text"), 20, 60)})

    snippets = sorted(set(
        s for batch in ds.map_batches(snips, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        for s in batch.column("snip").to_pylist()))
    if not snippets:
        return empty
    ref = ray.put(snippets)

    def match(b: pa.Table) -> pa.Table:
        sn = cached_get(ref)
        hits = np.zeros(b.num_rows, dtype=np.int64)
        text = b.column("text")
        for s in sn:
            hits += pc.match_substring(text, s).to_numpy(
                zero_copy_only=False)
        keep = hits > 0
        return pa.table({
            "doc_id": pa.array(
                b.column("doc_id").to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "n_matches": pa.array(hits[keep], pa.int64())})

    return _det_sort(ds.map_batches(match, batch_format="pyarrow"),
                     "doc_id")


def priority_intersect_all(sf_dir: str):
    """INTERSECT ALL bag semantics (complement of the EXCEPT ALL
    query): the multiset intersection of 1996 vs 1997 order
    priorities — each value appears min(count96, count97) times.  One
    scan produces both conditional per-priority counts (two-phase
    partial aggregate); the min + row replication happens on the
    ≤5-row result."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    empty = pd.DataFrame({"o_orderpriority": pd.Series([], dtype="object")})
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate"])
    if orders.count() == 0:
        return empty

    def years(b: pa.Table) -> pa.Table:
        yr = pc.year(b.column("o_orderdate"))
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "c96": pc.cast(pc.equal(yr, pa.scalar(1996, pa.int32())),
                           pa.int64()),
            "c97": pc.cast(pc.equal(yr, pa.scalar(1997, pa.int32())),
                           pa.int64())})

    agg = partial_group_agg(orders.map_batches(years,
                                               batch_format="pyarrow"),
                            ["o_orderpriority"], sum_cols=["c96", "c97"],
                            combine="driver")
    mult = np.minimum(agg["c96"].to_numpy(np.int64),
                      agg["c97"].to_numpy(np.int64))
    vals = np.repeat(agg["o_orderpriority"].to_numpy(), mult)
    if len(vals) == 0:
        return empty
    return (pd.DataFrame({"o_orderpriority": vals})
            .sort_values("o_orderpriority").reset_index(drop=True))


def events_value_kurtosis(sf_dir: str):
    """Grouped excess kurtosis (bias-corrected G2, DuckDB's
    definition) from mergeable centered moments — the two-pass
    discipline of events_value_skewness extended to fourth order
    (one-pass raw fourth moments lose ~10 digits at price scale)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def m1(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b.column("event_type"),
                         "sx": b.column("value")})

    a1 = partial_group_agg(ds.map_batches(m1, batch_format="pyarrow"),
                           ["event_type"], sum_cols=["sx"],
                           count_alias="n", combine="driver")
    if a1.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             "kurt": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    types = a1["event_type"].to_numpy(dtype=object)
    nv = a1["n"].to_numpy(dtype=np.float64)
    mu = a1["sx"].to_numpy() / nv

    def m2(b: pa.Table) -> pa.Table:
        t = b.column("event_type").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(types, t)
        d = b.column("value").to_numpy(zero_copy_only=False) - mu[idx]
        d2 = d * d
        return pa.table({"event_type": b.column("event_type"),
                         "s2": pa.array(d2), "s4": pa.array(d2 * d2)})

    a2 = partial_group_agg(ds.map_batches(m2, batch_format="pyarrow"),
                           ["event_type"], sum_cols=["s2", "s4"],
                           combine="driver")
    s2 = a2["s2"].to_numpy()
    s4 = a2["s4"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        g2 = nv * s4 / (s2 * s2) - 3.0
        kurt = ((nv - 1) / ((nv - 2) * (nv - 3))) * ((nv + 1) * g2 + 6.0)
    kurt = np.where((nv > 3) & (s2 > 0), kurt, np.nan)
    out = a1[["event_type"]].copy()
    out["kurt"] = np.sign(kurt) * np.floor(np.abs(kurt) * 1e6 + 0.5) / 1e6
    out["n"] = a1["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def purchase_id_gaps(sf_dir: str):
    """Islands-and-gaps over a filtered key space: the missing
    event_id ranges between consecutive purchase events.  The classic
    lag()-over-global-order formulation needs neighbor visibility
    across partition boundaries — here solved scale-correctly: keys
    hash into contiguous range buckets, each bucket finds its internal
    gaps after one co-locating shuffle (vectorized np.diff), and the
    cross-bucket seams are stitched on the driver from the ≤256
    per-bucket (min, max) summaries that fall out of the pass-1
    partials.  No global sort, no windowed self-join."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import key_range_buckets, np_columns

    empty = pd.DataFrame({"gap_start": pd.Series([], dtype="int64"),
                          "gap_end": pd.Series([], dtype="int64")})
    ev = _read(sf_dir, "events", ["event_id", "event_type"])

    def keys_only(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), pa.scalar("purchase"))
        return pa.table({"k": b.filter(m).column("event_id")})

    # three consumers (range pass, summaries, internal gaps) — pin the
    # filtered keys once instead of re-scanning events each time
    ks = ev.map_batches(keys_only, batch_format="pyarrow").materialize()
    rng = key_range_buckets(ks, "k", 256)
    if rng is None:
        return empty
    lo, width = rng

    def summarize(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        bk = (k - lo) // width
        t = pa.table({"rbkt": pa.array(bk, pa.int64()),
                      "mn": pa.array(k, pa.int64()),
                      "mx": pa.array(k, pa.int64())})
        return (t.group_by("rbkt")
                .aggregate([("mn", "min"), ("mx", "max")])
                .rename_columns(["rbkt", "mn", "mx"]))

    summ = pd.DataFrame(np_columns(
        ks.map_batches(summarize, batch_format="pyarrow"),
        ["rbkt", "mn", "mx"]))
    summ = (summ.groupby("rbkt").agg(mn=("mn", "min"), mx=("mx", "max"))
            .sort_index())
    prev_mx = summ["mx"].to_numpy()[:-1]
    next_mn = summ["mn"].to_numpy()[1:]
    seam = next_mn - prev_mx > 1
    boundary = pd.DataFrame({
        "gap_start": (prev_mx[seam] + 1).astype("int64"),
        "gap_end": (next_mn[seam] - 1).astype("int64")})

    def add_bkt(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        return b.append_column("rbkt",
                               pa.array((k - lo) // width, pa.int64()))

    def internal(g: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(g["k"].to_numpy(np.int64))
        i = np.nonzero(np.diff(k) > 1)[0]
        return pd.DataFrame({"gap_start": (k[i] + 1).astype("int64"),
                             "gap_end": (k[i + 1] - 1).astype("int64")})

    inner = (ks.map_batches(add_bkt, batch_format="pyarrow")
             .groupby("rbkt").map_groups(internal, batch_format="pandas")
             .to_pandas())
    out = pd.concat([inner, boundary], ignore_index=True)
    if out.empty:
        return empty
    out["gap_start"] = out["gap_start"].astype("int64")
    out["gap_end"] = out["gap_end"].astype("int64")
    return out.sort_values("gap_start").reset_index(drop=True)


def events_trimmed_mean(sf_dir: str):
    """Quantile-clipped (trimmed) aggregate: per event type, the mean
    of values between the exact p05 and p95 percentile_disc thresholds.
    The thresholds come from the exact distributed quantile primitive
    (stages/quantiles.py — two-phase histogram over the discrete cents
    domain, no sort); the clipped mean is then one filtered two-phase
    aggregate.  The cents trick keeps the histogram cardinality bounded
    by the value range, independent of row count."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.quantiles import grouped_quantiles
    from elevant_ray.stages.util import partial_group_agg

    empty = pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                          "lo": pd.Series([], dtype="float64"),
                          "hi": pd.Series([], dtype="float64"),
                          "trimmed_mean": pd.Series([], dtype="float64"),
                          "n_kept": pd.Series([], dtype="int64")})
    ds = _read(sf_dir, "events", ["event_type", "value"])
    if ds.count() == 0:
        return empty

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({"event_type": b.column("event_type"),
                         "value": b.column("value"),
                         "c": pa.array(np.floor(v * 100 + 0.5)
                                       .astype(np.int64))})

    cds = ds.map_batches(cents, batch_format="pyarrow")
    q = grouped_quantiles(cds, "c", (0.05, 0.95),
                          group_cols=["event_type"]).to_pandas()
    lo = {r["event_type"]: int(r["c"]) for _, r in q.iterrows()
          if r["q"] == 0.05}
    hi = {r["event_type"]: int(r["c"]) for _, r in q.iterrows()
          if r["q"] == 0.95}

    def clip(b: pa.Table) -> pa.Table:
        t = b.column("event_type").to_numpy(zero_copy_only=False)
        c = b.column("c").to_numpy(zero_copy_only=False)
        lov = np.array([lo[x] for x in t.tolist()], np.int64)
        hiv = np.array([hi[x] for x in t.tolist()], np.int64)
        m = (c >= lov) & (c <= hiv)
        return pa.table({
            "event_type": b.column("event_type").filter(pa.array(m)),
            "c": pa.array(c[m])})

    agg = partial_group_agg(cds.map_batches(clip, batch_format="pyarrow"),
                            ["event_type"], sum_cols=["c"],
                            count_alias="n_kept", combine="driver")
    out = agg[["event_type"]].copy()
    out["lo"] = np.array([lo[x] for x in out["event_type"]],
                         np.float64) / 100.0
    out["hi"] = np.array([hi[x] for x in out["event_type"]],
                         np.float64) / 100.0
    # exact integer cents sum → one double division: no dependence on
    # distributed float-summation order at the 1e-6 rounding boundary
    mean = agg["c"].to_numpy() / 100.0 / agg["n_kept"].to_numpy()
    out["trimmed_mean"] = (np.sign(mean)
                           * np.floor(np.abs(mean) * 1e6 + 0.5) / 1e6)
    out["n_kept"] = agg["n_kept"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def embedding_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means (k=8, 4 iterations) over the
    embedding column — semantic clustering for training-data curation
    (stages/knn.py lloyd_kmeans: broadcast centroids, per-batch
    count/sum partials, driver mean recompute; no shuffle).
    Deterministic (seeded by the k smallest vec_ids, lowest-centroid
    tie-break); exactness is gated by the numpy-differential test in
    tests/test_kmeans.py (rows-only for the driver — the per-dimension
    float reduction order is not reproducible in SQL)."""
    import pandas as pd

    from elevant_ray.stages.knn import lloyd_kmeans

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = lloyd_kmeans(ds, k=8, iters=4)
    if out is None:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "cluster": pd.Series([], dtype="int64")})
    return _det_sort(out, "vec_id")


def nation_revenue_share(sf_dir: str):
    """Ratio-to-report window (share of total): each customer nation's
    slice of global order revenue.  One broadcast-probed scan + a tiny
    two-phase aggregate; the total is the sum of the ≤25 per-nation
    cents sums, so the 'window over the whole table' costs nothing
    extra — exact integer cents until the final division."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import IntKeyMap, np_columns, partial_group_agg

    empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                          "revenue": pd.Series([], dtype="float64"),
                          "share": pd.Series([], dtype="float64")})
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}
    if not nation:
        return empty
    c = np_columns(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
                   ["c_custkey", "c_nationkey"])
    if len(c["c_custkey"]) == 0:
        return empty
    cmap = IntKeyMap(c["c_custkey"],
                     np.array([nation[k] for k in c["c_nationkey"].tolist()],
                              dtype=object))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    if orders.count() == 0:
        return empty

    def fold(b: pa.Table) -> pa.Table:
        nat = cmap.take_checked(
            b.column("o_custkey").to_numpy(zero_copy_only=False))
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({"n_name": pa.array(nat, pa.string()),
                         "rev_c": pa.array(
                             np.floor(v * 100 + 0.5).astype(np.int64))})

    agg = partial_group_agg(orders.map_batches(fold,
                                               batch_format="pyarrow"),
                            ["n_name"], sum_cols=["rev_c"],
                            combine="driver")
    cents = agg["rev_c"].to_numpy(np.int64)
    total = cents.sum()
    out = agg[["n_name"]].copy()
    # plain 1e-2 cents, NOT the 1e-4 revenue units _cents_to_dollars
    # expects — one exact double division converts
    out["revenue"] = cents / 100.0
    share = cents / np.float64(total)
    out["share"] = np.floor(share * 1e6 + 0.5) / 1e6
    return out.sort_values("n_name").reset_index(drop=True)


def region_priority_grid(sf_dir: str):
    """CROSS JOIN grid with zero-fill: every (region, order priority)
    cell and its order count, including empty cells.  Both dimensions
    are tiny, so the grid materializes on the driver; the counts come
    from one broadcast-probed scan + two-phase aggregate — the classic
    'dense report over a sparse fact' shape."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import IntKeyMap, np_columns, partial_group_agg

    empty = pd.DataFrame({"r_name": pd.Series([], dtype="object"),
                          "o_orderpriority": pd.Series([], dtype="object"),
                          "n_orders": pd.Series([], dtype="int64")})
    nation = pd.DataFrame(_read(sf_dir, "nation").take_all())
    region = pd.DataFrame(_read(sf_dir, "region").take_all())
    if nation.empty or region.empty:
        return empty
    n2r = dict(zip(
        nation["n_nationkey"],
        region.set_index("r_regionkey")["r_name"]
        .reindex(nation["n_regionkey"]).to_numpy()))
    c = np_columns(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
                   ["c_custkey", "c_nationkey"])
    cmap = IntKeyMap(c["c_custkey"],
                     np.array([n2r[k] for k in c["c_nationkey"].tolist()],
                              dtype=object)) if len(c["c_custkey"]) else None

    prios = {"1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"}

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    if cmap is None or orders.count() == 0:
        agg = None
    else:
        def fold(b: pa.Table) -> pa.Table:
            reg = cmap.take_checked(
                b.column("o_custkey").to_numpy(zero_copy_only=False))
            return pa.table({
                "r_name": pa.array(reg, pa.string()),
                "o_orderpriority": b.column("o_orderpriority")})

        agg = partial_group_agg(
            orders.map_batches(fold, batch_format="pyarrow"),
            ["r_name", "o_orderpriority"], count_alias="n_orders",
            combine="driver")
        # the grid spans observed priorities too, mirroring the
        # oracle's DISTINCT ∪ literals — unknown values are kept, not
        # silently dropped
        prios |= set(agg["o_orderpriority"])
    grid = pd.MultiIndex.from_product(
        [sorted(region["r_name"]), sorted(prios)],
        names=["r_name", "o_orderpriority"])
    if agg is None:
        counts = pd.Series(0, index=grid, dtype="int64")
    else:
        counts = (agg.set_index(["r_name", "o_orderpriority"])["n_orders"]
                  .reindex(grid, fill_value=0).astype("int64"))
    out = counts.rename("n_orders").reset_index()
    return out.sort_values(["r_name", "o_orderpriority"]) \
        .reset_index(drop=True)


def events_dedup_consecutive(sf_dir: str):
    """Consecutive-duplicate compression per key (the 'collapse repeated
    states' stream op): keep each event whose type differs from the
    user's previous event.  One hash-bucketed co-group
    (util.bucketed_group_apply) sorts whole user histories and applies
    a vectorized shift-compare — the lag() filter without a windowed
    shuffle per row."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events",
               ["user_id", "event_id", "event_type", "ts"])
    if ds.count() == 0:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "event_id": pd.Series([], dtype="int64"),
                             "event_type": pd.Series([], dtype="object"),
                             "ts": pd.Series([], dtype="datetime64[us]")})

    from elevant_ray.stages.util import bucketed_group_apply

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = df["user_id"].to_numpy()
        t = df["event_type"].to_numpy()
        keep = np.ones(len(df), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (t[1:] != t[:-1])
        return df.loc[keep,
                      ["user_id", "event_id", "event_type", "ts"]]

    out = bucketed_group_apply(ds, "user_id", per_bucket)
    return _ts_us(_det_sort(out, ["user_id", "ts", "event_id"]), "ts")


def nation_balance_band_join(sf_dir: str):
    """Cross-table band join (theta join on an inequality): per nation,
    the number of (customer, supplier) pairs whose account balances lie
    within ±10.00 of each other — in exact integer cents, so the band
    boundary never floats.  The supplier side is dimension-bounded: its
    per-nation sorted cents arrays broadcast once, and every customer
    batch resolves its band counts with two vectorized searchsorted
    probes — no pair materialization, no shuffle.  Past the broadcast
    cutoff the scale path is a nation-keyed co-group with the same
    sorted-probe kernel per group."""
    import numpy as np
    import pandas as pd
    import ray

    from elevant_ray.stages.util import cached_get, np_columns, partial_group_agg

    empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                          "n_pairs": pd.Series([], dtype="int64")})
    s = np_columns(_read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"]),
                   ["s_nationkey", "s_acctbal"])
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    if len(s["s_nationkey"]) == 0 or cust.count() == 0:
        return empty
    nk = s["s_nationkey"].astype(np.int64)
    sc = np.floor(s["s_acctbal"] * 100 + 0.5).astype(np.int64)
    order = np.lexsort((sc, nk))
    nk, sc = nk[order], sc[order]
    uniq, starts = np.unique(nk, return_index=True)
    ends = np.append(starts[1:], len(nk))
    ref = ray.put({"uniq": uniq, "starts": starts, "ends": ends, "sc": sc})
    band = np.int64(1000)

    def count_pairs(b: pa.Table) -> pa.Table:
        st = cached_get(ref)
        cn = b.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cc = np.floor(b.column("c_acctbal").to_numpy(zero_copy_only=False)
                      * 100 + 0.5).astype(np.int64)
        pos = np.searchsorted(st["uniq"], cn)
        pos_c = np.minimum(pos, len(st["uniq"]) - 1)
        found = st["uniq"][pos_c] == cn
        total = np.zeros(len(cn), dtype=np.int64)
        for i in np.unique(pos_c[found]):
            m = found & (pos_c == i)
            seg = st["sc"][st["starts"][i]:st["ends"][i]]
            total[m] = (np.searchsorted(seg, cc[m] + band, side="right")
                        - np.searchsorted(seg, cc[m] - band, side="left"))
        keep = total > 0
        return pa.table({"c_nationkey": pa.array(cn[keep], pa.int64()),
                         "n_pairs": pa.array(total[keep], pa.int64())})

    agg = partial_group_agg(
        cust.map_batches(count_pairs, batch_format="pyarrow"),
        ["c_nationkey"], sum_cols=["n_pairs"], combine="driver")
    if agg is None or len(agg) == 0:
        return empty
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}
    out = pd.DataFrame({
        "n_name": [nation[k] for k in
                   agg["c_nationkey"].astype(int).tolist()],
        "n_pairs": agg["n_pairs"].astype("int64")})
    return out.sort_values("n_name").reset_index(drop=True)


def embedding_component_stats(sf_dir: str):
    """Positional UNNEST (explode with ordinality): per embedding
    dimension index, the mean and max component value across all
    vectors.  No explode ever materializes — each batch reshapes the
    list column's flat values buffer to (rows × dim) and emits one
    64-row columnwise partial (sum, count, max); the combine is a tiny
    driver reduction.  The SQL oracle pays the real 64× row explosion
    (unnest + generate_subscripts)."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame({"dim": pd.Series([], dtype="int64"),
                          "mean_val": pd.Series([], dtype="float64"),
                          "max_val": pd.Series([], dtype="float64")})
    ds = _read(sf_dir, "embeddings", ["embedding"])
    if ds.count() == 0:
        return empty

    def partial(b: pa.Table) -> pa.Table:
        arr = b.column("embedding").combine_chunks()
        n = len(arr)
        v = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(v) // n
        X = v.reshape(n, d)
        return pa.table({"dim": pa.array(np.arange(d), pa.int64()),
                         "s": pa.array(X.sum(axis=0)),
                         "n": pa.array(np.full(d, n, np.int64)),
                         "mx": pa.array(X.max(axis=0))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("dim", sort=True).agg(
        s=("s", "sum"), n=("n", "sum"), mx=("mx", "max"))
    mean = g["s"].to_numpy() / g["n"].to_numpy()
    out = pd.DataFrame({"dim": g.index.to_numpy(np.int64)})
    out["mean_val"] = (np.sign(mean)
                       * np.floor(np.abs(mean) * 1e6 + 0.5) / 1e6)
    mx = g["mx"].to_numpy()
    out["max_val"] = np.sign(mx) * np.floor(np.abs(mx) * 1e6 + 0.5) / 1e6
    return out.reset_index(drop=True)


def orders_top_price_rank(sf_dir: str):
    """Top-k with RANK ties (keep every row tied into the top 3): per
    order priority, all orders whose total price ranks ≤ 3 — unlike the
    row_number top-k, ties at the boundary survive.  Batch-local rank
    can only be ≤ the global rank, so each batch's rank-≤3 rows (ties
    included) are a superset-safe partial; the driver re-ranks the
    ≤ batches × groups × ~3 survivors exactly."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame({
        "o_orderpriority": pd.Series([], dtype="object"),
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_totalprice": pd.Series([], dtype="float64"),
        "price_rank": pd.Series([], dtype="int64")})
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    if ds.count() == 0:
        return empty

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "o_orderkey": b.column("o_orderkey"),
            "o_totalprice": b.column("o_totalprice")}).to_pandas()
        r = (df.groupby("o_orderpriority")["o_totalprice"]
             .rank(method="min", ascending=False))
        return pa.Table.from_pandas(df[r <= 3], preserve_index=False)

    surv = (ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas())
    r = (surv.groupby("o_orderpriority")["o_totalprice"]
         .rank(method="min", ascending=False))
    out = surv[r <= 3].copy()
    out["price_rank"] = r[r <= 3].astype("int64").to_numpy()
    return (out.sort_values(["o_orderpriority", "price_rank",
                             "o_orderkey"])
            [["o_orderpriority", "o_orderkey", "o_totalprice",
              "price_rank"]]
            .reset_index(drop=True))


def discount_nullaware_stats(sf_dir: str):
    """Null-aware aggregation semantics: with zero discounts treated as
    NULL (NULLIF), per return flag — total rows, non-null count,
    null-skipping average, and null-aware distinct count (NULLs never
    join the distinct set).  The whole thing is one scan of two-phase
    partials in exact integer cents; the ≤11-value discount domain
    makes the distinct set a per-batch bitmask-sized partial."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    empty = pd.DataFrame({"l_returnflag": pd.Series([], dtype="object"),
                          "n_rows": pd.Series([], dtype="int64"),
                          "n_discounted": pd.Series([], dtype="int64"),
                          "avg_discount": pd.Series([], dtype="float64"),
                          "n_distinct": pd.Series([], dtype="int64")})
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_discount"])
    if ds.count() == 0:
        return empty

    def fold(b: pa.Table) -> pa.Table:
        d = b.column("l_discount").to_numpy(zero_copy_only=False)
        c = np.floor(d * 100 + 0.5).astype(np.int64)
        nz = c != 0
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "one": pa.array(np.ones(len(c), np.int64)),
            "nz": pa.array(nz.astype(np.int64)),
            "c_sum": pa.array(np.where(nz, c, 0))})

    agg = partial_group_agg(ds.map_batches(fold, batch_format="pyarrow"),
                            ["l_returnflag"], sum_cols=["one", "nz",
                                                        "c_sum"],
                            combine="driver")

    def pairs(b: pa.Table) -> pa.Table:
        d = b.column("l_discount").to_numpy(zero_copy_only=False)
        c = np.floor(d * 100 + 0.5).astype(np.int64)
        t = pa.table({"l_returnflag": b.column("l_returnflag"),
                      "c": pa.array(c)}).filter(pa.array(c != 0))
        return t.group_by(["l_returnflag", "c"]).aggregate([])

    dist = (ds.map_batches(pairs, batch_format="pyarrow").to_pandas()
            .drop_duplicates().groupby("l_returnflag").size())
    out = agg[["l_returnflag"]].copy()
    out["n_rows"] = agg["one"].astype("int64")
    out["n_discounted"] = agg["nz"].astype("int64")
    mean = agg["c_sum"].to_numpy() / 100.0 / agg["nz"].to_numpy()
    out["avg_discount"] = (np.sign(mean)
                           * np.floor(np.abs(mean) * 1e6 + 0.5) / 1e6)
    out["n_distinct"] = (dist.reindex(out["l_returnflag"])
                         .fillna(0).astype("int64").to_numpy())
    return out.sort_values("l_returnflag").reset_index(drop=True)


def docs_length_pctile(sf_dir: str):
    """percent_rank over a corpus-sized table without a sort: each
    document's length percentile within its source.  The window
    collapses to a per-(source, n_chars) cumulative histogram — domain-
    bounded, not row-bounded — built by one two-phase count and scanned
    on the driver; every batch then probes the broadcast
    (source, n_chars) → rank map.  min-rank tie semantics match SQL
    percent_rank exactly; the ratio (rank-1)/(n-1) divides the same
    integers on both sides."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import IntKeyMap, partial_group_agg

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "source": pd.Series([], dtype="object"),
                          "pct_rank": pd.Series([], dtype="float64")})
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    if ds.count() == 0:
        return empty
    hist = partial_group_agg(ds, ["source", "n_chars"],
                             count_alias="cnt", combine="driver")
    hist = hist.sort_values(["source", "n_chars"])
    src_codes, src_uniques = pd.factorize(hist["source"], sort=True)
    cnt = hist["cnt"].to_numpy(np.int64)
    # per-source exclusive cumulative count = (rank - 1) of each value
    cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    starts = np.searchsorted(src_codes, np.arange(len(src_uniques)))
    cum = cum - cum[starts][src_codes]
    n_per = np.bincount(src_codes, weights=cnt).astype(np.int64)
    # composite int64 key: source code in the high bits, n_chars low
    key = (src_codes.astype(np.int64) << 40) \
        + hist["n_chars"].to_numpy(np.int64)
    rmap = IntKeyMap(key, cum)
    scode = {s: i for i, s in enumerate(src_uniques)}

    def probe(b: pa.Table) -> pa.Table:
        src = b.column("source").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        sc = np.array([scode[s] for s in src.tolist()], np.int64)
        r = rmap.take_checked((sc << 40) + nch)
        denom = np.maximum(n_per[sc] - 1, 1)
        pr = np.where(n_per[sc] > 1, r / denom, 0.0)
        return pa.table({"doc_id": b.column("doc_id"),
                         "source": b.column("source"),
                         "pct_rank": pa.array(
                             np.floor(pr * 1e6 + 0.5) / 1e6)})

    return _det_sort(ds.map_batches(probe, batch_format="pyarrow"),
                     "doc_id")


def orders_above_customer_avg(sf_dir: str):
    """Correlated scalar subquery folded into a join-back: orders
    whose price exceeds their own customer's average order price,
    counted per priority.  The per-customer aggregate (one
    high-cardinality groupby, pre-shrunk by per-batch partials)
    broadcasts back onto the fact scan as an IntKeyMap; the comparison
    is exact-integer cross-multiplication (price·n > Σprices in cents)
    so the correlated boundary never floats — the Q17/Q22 discipline
    applied to the 'above own average' shape.  Past the broadcast
    cutoff the aggregate stays distributed and cogroups back onto the
    fact by custkey."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (IntKeyMap, cogroup_join,
                                         partial_group_agg, scale_cutoff)

    empty = pd.DataFrame({"o_orderpriority": pd.Series([], dtype="object"),
                          "n_above": pd.Series([], dtype="int64")})
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_totalprice", "o_orderpriority"])
    if orders.count() == 0:
        return empty

    def cents_cols(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": b.column("o_custkey"),
                         "c_sum": pa.array(np.floor(v * 100 + 0.5)
                                           .astype(np.int64))})

    if orders.size_bytes() <= scale_cutoff(64 << 20):
        # per-key aggregate combined on the driver (one row per
        # customer) and broadcast back — no exchange at all
        per_cust = partial_group_agg(
            orders.map_batches(cents_cols, batch_format="pyarrow"),
            ["o_custkey"], sum_cols=["c_sum"], count_alias="n",
            combine="driver")
        smap = IntKeyMap(per_cust["o_custkey"].to_numpy(np.int64),
                         per_cust["c_sum"].to_numpy(np.int64))
        nmap = IntKeyMap(per_cust["o_custkey"].to_numpy(np.int64),
                         per_cust["n"].to_numpy(np.int64))

        def above(b: pa.Table) -> pa.Table:
            ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
            v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
            cents = np.floor(v * 100 + 0.5).astype(np.int64)
            tot = smap.take_checked(ck)
            n = nmap.take_checked(ck)
            keep = cents * n > tot
            return pa.table({"o_orderpriority":
                             b.column("o_orderpriority").filter(
                                 pa.array(keep))})

        pre = orders.map_batches(above, batch_format="pyarrow")
    else:
        # scale path: keep the per-customer aggregate distributed and
        # cogroup the fact back onto it by custkey
        from ray.data.aggregate import Sum

        def partial(b: pa.Table) -> pa.Table:
            t = cents_cols(b).append_column(
                "n", pa.array(np.ones(b.num_rows, np.int64)))
            return (t.group_by("o_custkey")
                    .aggregate([("c_sum", "sum"), ("n", "sum")])
                    .rename_columns(["o_custkey", "c_sum", "n"]))

        per_cust = (orders.map_batches(partial, batch_format="pyarrow")
                    .groupby("o_custkey")
                    .aggregate(Sum("c_sum", alias_name="c_sum"),
                               Sum("n", alias_name="n")))

        def o_pre(b: pa.Table) -> pa.Table:
            v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
            return pa.table({
                "o_custkey": b.column("o_custkey"),
                "cents": pa.array(np.floor(v * 100 + 0.5)
                                  .astype(np.int64)),
                "o_orderpriority": b.column("o_orderpriority")})

        joined = cogroup_join(
            orders.map_batches(o_pre, batch_format="pyarrow"),
            per_cust,
            on="o_custkey",
            left_schema=pa.schema([("o_custkey", pa.int64()),
                                   ("cents", pa.int64()),
                                   ("o_orderpriority", pa.string())]),
            right_schema=pa.schema([("o_custkey", pa.int64()),
                                    ("c_sum", pa.int64()),
                                    ("n", pa.int64())]))

        def above2(b: pa.Table) -> pa.Table:
            keep = (b.column("cents").to_numpy(zero_copy_only=False)
                    * b.column("n").to_numpy(zero_copy_only=False)
                    > b.column("c_sum").to_numpy(zero_copy_only=False))
            return pa.table({"o_orderpriority":
                             b.column("o_orderpriority").filter(
                                 pa.array(keep))})

        pre = joined.map_batches(above2, batch_format="pyarrow")

    agg = partial_group_agg(pre, ["o_orderpriority"],
                            count_alias="n_above", combine="driver")
    if agg is None or len(agg) == 0:
        return empty
    out = agg[["o_orderpriority"]].copy()
    out["n_above"] = agg["n_above"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def orders_price_date_skyline(sf_dir: str):
    """Pareto skyline (preference/dominance query): orders not strictly
    dominated by any other — no order both pricier AND earlier.  Each
    batch keeps only its local skyline (sort by date, prefix-max price
    over strictly-earlier dates — vectorized); dominance is transitive,
    so every globally dominated row is dominated by some local
    survivor, making the survivor union a superset-safe partial that
    the driver finishes with the same kernel.  Random data leaves
    O(log n) survivors per batch, so almost nothing moves."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                          "o_orderdate": pd.Series(
                              [], dtype="datetime64[us]"),
                          "o_totalprice": pd.Series([], dtype="float64")})
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_totalprice"])
    if ds.count() == 0:
        return empty

    def local_skyline(date_us, price):
        order = np.lexsort((-price, date_us))
        d_s, p_s = date_us[order], price[order]
        cm = np.maximum.accumulate(p_s)
        last_earlier = np.searchsorted(d_s, d_s, side="left") - 1
        dom = np.where(last_earlier >= 0,
                       cm[np.maximum(last_earlier, 0)] > p_s, False)
        return order[~dom]

    def partial(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False)
        p = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        keep = local_skyline(d, p)
        return b.take(pa.array(np.sort(keep)))

    surv = (ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas())
    d = surv["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
    p = surv["o_totalprice"].to_numpy()
    out = surv.iloc[np.sort(local_skyline(d, p))]
    return _ts_us(out.sort_values("o_orderkey").reset_index(drop=True),
                  "o_orderdate")


def doc_unigram_logprob(sf_dir: str):
    """Language-model quality scoring (the KenLM-style filter of a
    training-data pipeline, reduced to unigrams): each document's
    log-probability under the corpus's own unigram distribution.  The
    vocabulary histogram is one two-phase count; it broadcasts as a
    sorted token array + aligned log-prob vector, and every batch
    scores all its tokens with ONE searchsorted + reduceat — no
    per-token Python in the scoring pass (the regex tokenizer itself
    stays per-doc, as in every text query here)."""
    import numpy as np
    import pandas as pd
    import ray

    from elevant_ray.stages.text_stats import unigram_counts as uc
    from elevant_ray.stages.util import cached_get, np_columns

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "n_tokens": pd.Series([], dtype="int64"),
                          "logprob": pd.Series([], dtype="float64")})
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    vc = np_columns(uc(docs.select_columns(["text"])),
                    ["token", "count"])
    if len(vc["token"]) == 0:
        return empty
    order = np.argsort(vc["token"], kind="stable")
    vocab = vc["token"][order]
    cnt = vc["count"][order].astype(np.float64)
    logp = np.log(cnt / cnt.sum())
    ref = ray.put({"vocab": np.asarray(vocab, dtype=object),
                   "logp": logp})

    def score(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import unigrams

        st = cached_get(ref)
        toks = [unigrams(t) for t in b.column("text").to_pylist()]
        lens = np.array([len(t) for t in toks], np.int64)
        keep = lens > 0
        if not keep.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "logprob": pa.array([], pa.float64())})
        flat = np.array([t for ts in toks for t in ts], dtype=object)
        lp = st["logp"][np.searchsorted(st["vocab"], flat)]
        offsets = np.concatenate([[0], np.cumsum(lens[keep])[:-1]])
        sums = np.add.reduceat(lp, offsets)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "n_tokens": pa.array(lens[keep], pa.int64()),
            "logprob": pa.array(
                np.sign(sums) * np.floor(np.abs(sums) * 1e4 + 0.5)
                / 1e4)})

    return _det_sort(docs.map_batches(score, batch_format="pyarrow"),
                     "doc_id")


def docs_redact_numbers(sf_dir: str):
    """PII-style redaction (the scrub step of a training-data
    pipeline): every digit run replaced with a sentinel, plus the
    per-document replacement count.  Two vectorized RE2 kernels per
    batch (pc.replace_substring_regex / count_substring_regex), zero
    Python per row; DuckDB's regexp_replace(..., 'g') is RE2 too, so
    the redacted text matches byte-for-byte."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "redacted": pc.replace_substring_regex(
                b.column("text"), "[0-9]+", "<NUM>"),
            "n_redacted": pc.cast(pc.count_substring_regex(
                b.column("text"), "[0-9]+"), pa.int64())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"),
                     "doc_id")


def curation_pipeline(sf_dir: str):
    """End-to-end training-data curation, composed from the engine's
    own stages and checked by ONE SQL oracle: exact dedup (min doc_id
    per normalized-text md5) → quality gate (≥20 tokens, ≥1 English
    stopword) → benchmark decontamination (drop docs containing any
    broadcast snippet) → token-budget shard packing of the survivors
    via the distributed prefix scan.  Every stage streams over the same
    rows — dedup keeps whole rows, so the quality and contamination
    masks are per-batch filters, never membership joins — and the only
    exchanges are dedup's packed-min aggregate and the prefix scan's
    one co-locating shuffle."""
    import numpy as np
    import pandas as pd
    import ray

    from elevant_ray.stages.dedup import dedup_exact_text
    from elevant_ray.stages.util import cached_get, global_ordered_cumsum

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "cum_chars": pd.Series([], dtype="int64"),
                          "shard": pd.Series([], dtype="int64")})
    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    if docs.count() == 0:
        return empty

    def snips(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        b = b.filter(pa.array((did % 97 == 0) & (nch >= 60)))
        return pa.table({"snip": pc.utf8_slice_codeunits(
            b.column("text"), 20, 60)})

    snippets = sorted(set(
        s for batch in docs.map_batches(snips, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        for s in batch.column("snip").to_pylist()))
    sref = ray.put(snippets)

    kept = dedup_exact_text(docs)

    def gate(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import (EN_STOP, token_count,
                                                  unigrams)

        texts = b.column("text").to_pylist()
        en = frozenset(EN_STOP)
        ok = np.array(
            [token_count(t) >= 20
             and sum(u in en for u in unigrams(t)) >= 1
             for t in texts])
        if ok.any():
            sn = cached_get(sref)
            text_col = b.column("text")
            clean = np.ones(b.num_rows, dtype=bool)
            for s in sn:
                clean &= ~pc.match_substring(text_col, s).to_numpy(
                    zero_copy_only=False)
            ok &= clean
        b = b.filter(pa.array(ok))
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_chars": b.column("n_chars")})

    surv = kept.map_batches(gate, batch_format="pyarrow")
    cum = global_ordered_cumsum(surv, "doc_id", "n_chars")
    if cum is None:
        return empty
    cap = np.int64(100_000)

    def assign(b: pa.Table) -> pa.Table:
        c = b.column("cum").to_numpy(zero_copy_only=False)
        n = b.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": b.column("doc_id"),
                         "cum_chars": pa.array(c, pa.int64()),
                         "shard": pa.array((c - n) // cap, pa.int64())})

    return _det_sort(cum.map_batches(assign, batch_format="pyarrow"),
                     "doc_id")


def events_anomaly_mad(sf_dir: str):
    """Robust outlier detection (3×MAD rule): per event type, how many
    events deviate from the type median by more than three median
    absolute deviations.  The 2-decimal value domain is bounded, so ONE
    two-phase (type, value)→weight histogram feeds everything — both
    interpolated medians AND the outlier count close on the driver from
    the histogram weights; the corpus is scanned exactly once and
    nothing re-shuffles."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    empty = pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                          "med": pd.Series([], dtype="float64"),
                          "mad": pd.Series([], dtype="float64"),
                          "n_outliers": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64")})
    ds = _read(sf_dir, "events", ["event_type", "value"])
    if ds.count() == 0:
        return empty
    hist = partial_group_agg(ds, ["event_type", "value"],
                             count_alias="w", combine="driver")

    def wq50(vals: np.ndarray, w: np.ndarray) -> float:
        order = np.argsort(vals, kind="stable")
        vals, w = vals[order], w[order]
        n = int(w.sum())
        h = (n - 1) * 0.5
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        cw = np.cumsum(w)
        a = vals[np.searchsorted(cw, lo + 1)]
        b = vals[np.searchsorted(cw, hi + 1)]
        return float(a + (h - lo) * (b - a))

    rows = []
    for et, g in hist.groupby("event_type"):
        v = g["value"].to_numpy(np.float64)
        w = g["w"].to_numpy(np.int64)
        med = wq50(v, w)
        mad = wq50(np.abs(v - med), w)
        n_out = int(w[np.abs(v - med) > 3 * mad].sum())
        rows.append((et,
                     np.sign(med) * np.floor(abs(med) * 1e6 + 0.5) / 1e6,
                     np.floor(mad * 1e6 + 0.5) / 1e6,
                     n_out, int(w.sum())))
    out = pd.DataFrame(rows, columns=["event_type", "med", "mad",
                                      "n_outliers", "n"])
    out["n_outliers"] = out["n_outliers"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def parts_cosupply_top_pairs(sf_dir: str):
    """Co-occurrence mining (market-basket shape): the 100 supplier
    pairs sharing the most distinct parts.  Distinct (part, supplier)
    edges dedupe as composite ints; pair generation is the vectorized
    per-group triu kernel (util.within_group_pairs — Python cost scales
    with distinct group sizes, not pairs); pair counts aggregate by
    composite pair code and the top-k closes with a deterministic
    (count desc, s1, s2) rank.  Under the cutoff the edge list streams
    to the driver for one vectorized pair pass (measured 3-4× faster
    locally than shuffling the 10×-bigger pair set); beyond it each
    part-keyed bucket dedupes its own edges and generates pairs in
    parallel, with only (pair, count) partials moving.  Assumes
    suppkey < 2^21 and partkey < 2^42 (composite-key layout)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (bucketed_group_apply,
                                         partial_group_agg,
                                         within_group_pairs)

    empty = pd.DataFrame({"s1": pd.Series([], dtype="int64"),
                          "s2": pd.Series([], dtype="int64"),
                          "common_parts": pd.Series([], dtype="int64")})
    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    if line.count() == 0:
        return empty

    mask = np.int64((1 << 21) - 1)

    def edges(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        comp = np.unique((pk << 21) + sk)
        return pa.table({"part": pa.array(comp >> 21, pa.int64()),
                         "comp": pa.array(comp, pa.int64())})

    eds = line.map_batches(edges, batch_format="pyarrow").materialize()

    def pair_counts(comp: np.ndarray) -> pd.DataFrame:
        # callers pass whole-part slices (driver: everything; bucketed:
        # a part-keyed bucket), so a local dedupe is a global dedupe
        comp = np.unique(comp)
        part = comp >> 21
        starts = np.flatnonzero(
            np.concatenate([[True], part[1:] != part[:-1]]))
        sizes = np.diff(np.append(starts, len(part)))
        i, j = within_group_pairs(starts, sizes)
        # comp sorted ⇒ within a part suppliers ascend ⇒ s1 < s2
        pair = ((comp[i] & mask) << 21) + (comp[j] & mask)
        up, c = np.unique(pair, return_counts=True)
        return pd.DataFrame({"pair": up, "c": c.astype(np.int64)})

    from elevant_ray.stages.util import np_columns, scale_cutoff

    if eds.size_bytes() <= scale_cutoff(256 << 20):
        # pair work is Θ(pairs) wherever it runs; under the cutoff the
        # measured winner is one driver pass over the edge list (the
        # bucketed variant pays a bucket shuffle AND a 10×-bigger pair
        # exchange for the same arithmetic).  For dimension-bounded
        # supplier sets the per-part np.ix_ scatter into the dense
        # count gram skips the Θ(pairs) i/j arrays entirely
        # (measured ~10 s → ~1 s at sf0.1, where the pair graph is
        # complete); the enumeration path remains for open node sets.
        from elevant_ray.stages.graph import dense_cooccurrence_counts

        comp_all = np_columns(eds, ["comp"])["comp"].astype(np.int64)
        dense = dense_cooccurrence_counts(comp_all)
        if dense is not None:
            nodes, G = dense
            iu, ju = np.nonzero(np.triu(G, k=1))
            agg = pd.DataFrame({
                "pair": (nodes[iu] << 21) + nodes[ju],
                "c": G[iu, ju]})
        else:
            agg = pair_counts(comp_all)
    else:
        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return pair_counts(df["comp"].to_numpy(np.int64))

        partials = bucketed_group_apply(eds, "part", per_bucket)
        # pair cardinality is suppliers², not hard-bounded → keep the
        # count combine distributed, then per-batch top-100 partials
        # of the FINAL counts (each pair is one row post-groupby, so
        # the batch-local top-k is superset-safe) close on the driver
        counts = partial_group_agg(partials, ["pair"], sum_cols=["c"],
                                   combine="dataset")

        def topk(b: pa.Table) -> pa.Table:
            df = pa.table({"pair": b.column("pair"),
                           "c": b.column("c")}).to_pandas()
            return pa.Table.from_pandas(
                df.sort_values(["c", "pair"],
                               ascending=[False, True]).head(100),
                preserve_index=False)

        agg = counts.map_batches(topk,
                                 batch_format="pyarrow").to_pandas()
    if agg is None or len(agg) == 0:
        return empty
    top = agg.sort_values(["c", "pair"],
                          ascending=[False, True]).head(100)
    pairs = top["pair"].to_numpy(np.int64)
    return pd.DataFrame({
        "s1": (pairs >> 21).astype("int64"),
        "s2": (pairs & mask).astype("int64"),
        "common_parts": top["c"].astype("int64").to_numpy()}) \
        .reset_index(drop=True)


def cosupply_triangles(sf_dir: str):
    """Distributed triangle counting on the supplier co-supply graph
    (edge ⇔ two suppliers share ≥1 part).  Degree-ordering: each node
    only generates wedges over its GREATER neighbors, so a hub of
    degree d costs O(d²/4) wedges once, not per orientation.  Under
    the cutoff one driver pass counts wedge-closures with a sorted
    searchsorted membership test; beyond it wedges are generated per
    lower-endpoint bucket (a node's edges are co-located by
    construction) and closed with a hash co-group join against the
    edge set — the canonical wedge-check MapReduce plan.  Assumes
    suppkey < 2^21 (composite pair codes)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.graph import (bipartite_codes_batch,
                                          cooccurrence_pairs,
                                          dense_cooccurrence_adjacency)
    from elevant_ray.stages.util import (as_arrow, bucketed_group_apply,
                                         cogroup_join, np_columns,
                                         partial_group_agg, scale_cutoff,
                                         within_group_pairs)

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    if line.count() == 0:
        return pd.DataFrame({"n_triangles": pd.array([0], dtype="int64")})

    mask = np.int64((1 << 21) - 1)

    def ps_edges(b: pa.Table) -> pa.Table:
        return bipartite_codes_batch(b, "l_partkey", "l_suppkey")

    eds = line.map_batches(ps_edges, batch_format="pyarrow").materialize()

    supplier_pairs = cooccurrence_pairs

    def wedge_codes(pairs: np.ndarray):
        # pairs sorted unique (x<<21|y), x<y ⇒ grouped by x with y
        # ascending; wedges (y_i<<21|y_j), y_i < y_j, per common x,
        # with multiplicity = number of common lower endpoints
        x = pairs >> 21
        starts = np.flatnonzero(np.concatenate([[True], x[1:] != x[:-1]]))
        sizes = np.diff(np.append(starts, len(x)))
        i, j = within_group_pairs(starts, sizes)
        return ((pairs[i] & mask) << 21) + (pairs[j] & mask)

    if eds.size_bytes() <= scale_cutoff(256 << 20):
        comp = np.unique(np_columns(eds, ["comp"])["comp"].astype(np.int64))
        dense = dense_cooccurrence_adjacency(comp)
        if dense is not None:
            # dense-graph shortcut: near-complete co-supply graphs make
            # the wedge list Θ(n³) (150 s at 1000 nodes) and even the
            # flat pair list costs seconds of memory bandwidth — mark
            # the adjacency directly per part (no pair materialization)
            # and count triangles as Σ(A²∘A)/6 via one BLAS matmul,
            # exact in float64 (counts ≤ n < 2^53)
            _, A = dense
            A = A.astype(np.float64)
            tri = int(round(((A @ A) * A).sum() / 6.0))
        else:
            pairs = supplier_pairs(comp)
            wedges = wedge_codes(pairs)
            if len(wedges) == 0:
                tri = 0
            else:
                idx = np.minimum(np.searchsorted(pairs, wedges),
                                 len(pairs) - 1)
                tri = int(np.count_nonzero(pairs[idx] == wedges))
        return pd.DataFrame({"n_triangles": pd.array([tri], dtype="int64")})

    # scale path: per-part pair partials → distributed distinct pair
    # set → per-x wedge partials → co-group closure join
    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"pair": supplier_pairs(df["comp"].to_numpy(np.int64))})

    pair_ds = as_arrow(_distinct_int(
        as_arrow(bucketed_group_apply(eds, "part", bucket_pairs)),
        "pair", cutoff=0))

    def add_x(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        p = b.column("pair").to_numpy(zero_copy_only=False)
        return pa.table({"pair": b.column("pair"),
                         "x": pa.array(p >> 21, pa.int64())})

    keyed = as_arrow(pair_ds).map_batches(add_x, batch_format="pyarrow") \
        .materialize()

    def bucket_wedges(df: pd.DataFrame) -> pd.DataFrame:
        w = wedge_codes(np.sort(df["pair"].to_numpy(np.int64)))
        uw, c = np.unique(w, return_counts=True)
        return pd.DataFrame({"pair": uw, "w": c.astype(np.int64)})

    wedge_ds = as_arrow(bucketed_group_apply(keyed, "x", bucket_wedges))
    closed = cogroup_join(
        wedge_ds,
        keyed.map_batches(
            lambda b: b.select(["pair"]).append_column(
                "_e", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow"),
        on="pair",
        left_schema=pa.schema([("pair", pa.int64()), ("w", pa.int64())]),
        right_schema=pa.schema([("pair", pa.int64()), ("_e", pa.int64())]))
    agg = partial_group_agg(
        closed.map_batches(
            lambda b: pa.table({"g": pa.array(np.zeros(b.num_rows, np.int64)),
                                "w": b.column("w")}),
            batch_format="pyarrow"),
        ["g"], sum_cols=["w"], combine="driver")
    tri = 0 if agg.empty else int(agg["w"].iloc[0])
    return pd.DataFrame({"n_triangles": pd.array([tri], dtype="int64")})


def supplier_bfs_hops(sf_dir: str):
    """BFS hop distance (≤ 20 hops) from the lowest supplier key over
    the supplier co-supply graph (edge ⇔ two suppliers share ≥1 part).
    The distance map lives on the driver — nodes are a DIMENSION
    (suppliers), so it is O(dim) like every broadcast side here — while
    the edge set scales with the fact table: under the cutoff one
    driver pass runs array BFS over the sorted symmetric adjacency;
    beyond it each level is one distributed pass over the distinct-pair
    dataset filtering edges incident to the broadcast frontier (hops =
    graph diameter passes, the textbook frontier-expansion plan; same
    gating as graph.pagerank).  Oracle: recursive CTE with the same
    20-hop cap.  Reference analog: the frontier-expansion loop of the
    type transitive closure (create_all_types_mapping.py:15-49)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.graph import (bipartite_codes_batch,
                                          cooccurrence_pairs)
    from elevant_ray.stages.util import (as_arrow, bucketed_group_apply,
                                         np_columns, scale_cutoff)

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    empty = pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                          "hops": pd.Series([], dtype="int64")})
    if line.count() == 0:
        return empty

    mask = np.int64((1 << 21) - 1)

    def ps_edges(b: pa.Table) -> pa.Table:
        return bipartite_codes_batch(b, "l_partkey", "l_suppkey")

    eds = line.map_batches(ps_edges, batch_format="pyarrow").materialize()
    seed = int(eds.map_batches(
        lambda b: pa.table({"s": pc.bit_wise_and(b.column("comp"),
                                                 pa.scalar(int(mask)))}),
        batch_format="pyarrow").min("s"))

    supplier_pairs = cooccurrence_pairs

    def finish(dist: dict) -> pd.DataFrame:
        out = pd.DataFrame({"s_suppkey": sorted(dist),
                            "hops": [dist[k] for k in sorted(dist)]})
        return out.astype({"s_suppkey": "int64", "hops": "int64"})

    if eds.size_bytes() <= scale_cutoff(256 << 20):
        comp_all = np_columns(eds, ["comp"])["comp"].astype(np.int64)
        from elevant_ray.stages.graph import dense_cooccurrence_adjacency

        dense = dense_cooccurrence_adjacency(comp_all)
        if dense is not None:
            # dimension-bounded node set: boolean-matrix BFS, no pair
            # list (Θ(pairs) i/j arrays dominate on near-complete
            # graphs; each level is one masked row-OR here)
            nodes, A = dense
            si = int(np.searchsorted(nodes, seed))
            hops = np.full(len(nodes), -1, np.int64)
            hops[si] = 0
            frontier = np.zeros(len(nodes), bool)
            frontier[si] = True
            for level in range(1, 21):
                nxt = A[frontier].any(axis=0) & (hops < 0)
                if not nxt.any():
                    break
                hops[nxt] = level
                frontier = nxt
            keep = hops >= 0
            return pd.DataFrame({
                "s_suppkey": nodes[keep].astype("int64"),
                "hops": hops[keep]})
        pairs = supplier_pairs(comp_all)
        u = np.concatenate([pairs >> 21, pairs & mask])
        v = np.concatenate([pairs & mask, pairs >> 21])
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        dist = {seed: 0}
        frontier = np.array([seed], np.int64)
        for level in range(1, 21):
            lo = np.searchsorted(u, frontier, side="left")
            hi = np.searchsorted(u, frontier, side="right")
            nbrs = np.unique(np.concatenate(
                [v[a:b] for a, b in zip(lo, hi)] or [v[:0]]))
            fresh = np.array([n for n in nbrs.tolist() if n not in dist],
                             np.int64)
            if not len(fresh):
                break
            for n in fresh.tolist():
                dist[n] = level
            frontier = fresh
        return finish(dist)

    # scale path: distributed distinct pair set; each BFS level is one
    # pass filtering edges incident to the broadcast frontier
    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"pair": supplier_pairs(df["comp"].to_numpy(np.int64))})

    pair_ds = as_arrow(_distinct_int(
        as_arrow(bucketed_group_apply(eds, "part", bucket_pairs)),
        "pair", cutoff=0)).materialize()

    dist = {seed: 0}
    frontier = {seed}
    for level in range(1, 21):
        fkeys = pa.array(sorted(frontier), pa.int64())

        def touch(b: pa.Table, fkeys=fkeys) -> pa.Table:
            if b.num_rows == 0 or b.num_columns == 0:
                return pa.table({"n": pa.array([], pa.int64())})
            p = b.column("pair").to_numpy(zero_copy_only=False)
            x, y = p >> 21, p & mask
            hit_x = pc.is_in(pa.array(x), value_set=fkeys).to_numpy(
                zero_copy_only=False)
            hit_y = pc.is_in(pa.array(y), value_set=fkeys).to_numpy(
                zero_copy_only=False)
            return pa.table({"n": pa.array(np.unique(np.concatenate(
                [y[hit_x], x[hit_y]])), pa.int64())})

        touched = pair_ds.map_batches(touch, batch_format="pyarrow")
        nbrs = {r["n"] for r in touched.take_all()}
        fresh = nbrs - dist.keys()
        if not fresh:
            break
        for n in fresh:
            dist[n] = level
        frontier = fresh
    return finish(dist)


def events_rolling_dau_7d(sf_dir: str):
    """Rolling 7-day distinct active users per observed event day — the
    windowed COUNT(DISTINCT) no engine computes directly at scale.
    Plan: distinct (user, day) pairs (one exchange); per user, the
    covered-day set [day, day+6] union-merges into intervals emitting
    ±1 boundary deltas (bucketed per-user kernel, vectorized); the
    day-domain prefix sum over delta partials runs on the driver (days
    are calendar-bounded).  Exact — no sketch, no approximation — and
    no per-day re-scan of the fact table."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({"user_id": b.column("user_id"),
                         "day": pa.array(days, pa.int64())})

    empty = pd.DataFrame({
        "day": pd.Series([], dtype="datetime64[us]"),
        "dau_7d": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty
    # per-batch dedup only — duplicate (user, day) rows across batches
    # are harmless to the interval union, so no distinct exchange needed
    dd = ds.map_batches(pre, batch_format="pyarrow").map_batches(
        lambda b: b.group_by(["user_id", "day"]).aggregate([]),
        batch_format="pyarrow")

    def per_user_deltas(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a user co-locate in this bucket; duplicate days
        # merge into the same interval (gap 0 ≤ 6), so no dedup needed
        df = df.sort_values(["user_id", "day"], kind="stable")
        d = df["day"].to_numpy(np.int64)
        uid = df["user_id"].to_numpy()
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[True], (d[1:] - d[:-1]) > 6])
        s = new_user | gap
        starts = d[s]
        # an interval's last member sits just before the next start
        # (rows are (user, day)-sorted) — no accumulator, no sign
        # assumption on day ordinals (pre-1970 days are negative)
        last = d[np.append(s[1:], True)]
        ends = last + 7
        obs = np.unique(d)  # marker rows: observed days in this bucket
        return pd.DataFrame({
            "day": np.concatenate([starts, ends, obs]),
            "delta": np.concatenate([np.ones(len(starts), np.int64),
                                     -np.ones(len(ends), np.int64),
                                     np.zeros(len(obs), np.int64)]),
            "obs": np.concatenate([np.zeros(len(starts) + len(ends),
                                            np.int64),
                                   np.ones(len(obs), np.int64)])})

    agg = partial_group_agg(
        bucketed_group_apply(dd, "user_id", per_user_deltas),
        ["day"], sum_cols=["delta", "obs"], combine="driver")
    if agg.empty:
        return empty
    lo = int(agg["day"].min())
    hi = int(agg["day"].max())
    cover = np.zeros(hi - lo + 1, np.int64)
    np.add.at(cover, agg["day"].to_numpy(np.int64) - lo,
              agg["delta"].to_numpy(np.int64))
    running = np.cumsum(cover)
    obs_days = np.sort(
        agg.loc[agg["obs"] > 0, "day"].to_numpy(np.int64))
    return pd.DataFrame({
        "day": obs_days.astype("datetime64[D]").astype("datetime64[us]"),
        "dau_7d": running[obs_days - lo]})


def events_cohort_matrix(sf_dir: str):
    """Weekly cohort-retention matrix: users grouped by their first
    active week; n_users active per (cohort_week, week_offset) cell.
    Distinct (user, week) pairs shrink in one exchange; the per-user
    first-week join happens inside the same user-keyed buckets (no
    second shuffle); the cell counts are calendar²-bounded, so the
    final combine is a driver fold.  Week starts are Monday
    (integer-day arithmetic == DuckDB date_trunc 'week')."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        week = days - (days + 3) % 7  # 1970-01-01 is a Thursday
        return pa.table({"user_id": b.column("user_id"),
                         "week": pa.array(week, pa.int64())})

    empty = pd.DataFrame({
        "cohort_week": pd.Series([], dtype="datetime64[us]"),
        "week_offset": pd.Series([], dtype="int64"),
        "n_users": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty
    # per-batch dedup only; the authoritative distinct runs inside the
    # user-keyed bucket (a user's rows all co-locate), saving a shuffle
    pairs = ds.map_batches(pre, batch_format="pyarrow").map_batches(
        lambda b: b.group_by(["user_id", "week"]).aggregate([]),
        batch_format="pyarrow")

    def per_user_cells(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "week"])
        cw = df.groupby("user_id")["week"].transform("min").to_numpy(
            np.int64)
        w = df["week"].to_numpy(np.int64)
        return pd.DataFrame({"cohort_days": cw,
                             "week_offset": (w - cw) // 7})

    cells = partial_group_agg(
        bucketed_group_apply(pairs, "user_id", per_user_cells),
        ["cohort_days", "week_offset"], count_alias="n_users",
        combine="driver")
    if cells.empty:
        return empty
    cells = cells.sort_values(["cohort_days", "week_offset"]).reset_index(
        drop=True)
    return pd.DataFrame({
        "cohort_week": cells["cohort_days"].to_numpy(np.int64).astype(
            "datetime64[D]").astype("datetime64[us]"),
        "week_offset": cells["week_offset"].astype("int64"),
        "n_users": cells["n_users"].astype("int64")})


def data_quality_audit(sf_dir: str):
    """Constraint audit over the warehouse (the Deequ / dbt-test shape a
    production pipeline runs before publishing a snapshot): FK integrity
    against dimension tables, domain-range checks, null checks, and a
    primary-key uniqueness check — each as a violation count.  One scan
    per fact table computes ALL of that table's checks at once (the
    dimension key sets fold in as broadcast membership probes); the PK
    check reuses the gated distinct primitive.  Output: one row per
    check.  Reference analog: the schema-default/validation behavior the
    reference leaves implicit (SURVEY.md §1.1 'no schema validation
    layer') made an explicit operator."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import np_columns

    ckeys = pa.array(np_columns(
        _read(sf_dir, "customer", ["c_custkey"]), ["c_custkey"])
        ["c_custkey"].astype(np.int64), pa.int64())
    pkeys = pa.array(np_columns(
        _read(sf_dir, "part", ["p_partkey"]), ["p_partkey"])
        ["p_partkey"].astype(np.int64), pa.int64())
    skeys = pa.array(np_columns(
        _read(sf_dir, "supplier", ["s_suppkey"]), ["s_suppkey"])
        ["s_suppkey"].astype(np.int64), pa.int64())

    def scan_sum(ds, fn, names):
        tot = dict.fromkeys(names, 0)
        parts = ds.map_batches(fn, batch_format="pyarrow")
        for b in parts.iter_batches(batch_format="pyarrow"):
            for n in names:
                tot[n] += int(pc.sum(b.column(n)).as_py() or 0)
        return tot

    def o_checks(b: pa.Table) -> pa.Table:
        bad_fk = pc.sum(pc.cast(pc.invert(pc.is_in(
            b.column("o_custkey"), value_set=ckeys)), pa.int64())).as_py()
        bad_price = pc.sum(pc.cast(pc.less_equal(
            b.column("o_totalprice"), pa.scalar(0.0)),
            pa.int64())).as_py()
        return pa.table({"orders_fk_customer": pa.array(
            [bad_fk or 0], pa.int64()),
            "orders_nonpositive_price": pa.array([bad_price or 0],
                                                 pa.int64())})

    def l_checks(b: pa.Table) -> pa.Table:
        bad_p = pc.sum(pc.cast(pc.invert(pc.is_in(
            b.column("l_partkey"), value_set=pkeys)), pa.int64())).as_py()
        bad_s = pc.sum(pc.cast(pc.invert(pc.is_in(
            b.column("l_suppkey"), value_set=skeys)), pa.int64())).as_py()
        d = b.column("l_discount")
        bad_d = pc.sum(pc.cast(pc.or_(
            pc.less(d, pa.scalar(0.0)), pc.greater(d, pa.scalar(1.0))),
            pa.int64())).as_py()
        return pa.table({
            "lineitem_fk_part": pa.array([bad_p or 0], pa.int64()),
            "lineitem_fk_supplier": pa.array([bad_s or 0], pa.int64()),
            "lineitem_discount_range": pa.array([bad_d or 0], pa.int64())})

    def e_checks(b: pa.Table) -> pa.Table:
        nulls = b.column("user_id").null_count
        bad_v = pc.sum(pc.cast(pc.less(b.column("value"),
                                       pa.scalar(0.0)), pa.int64())).as_py()
        return pa.table({
            "events_null_user": pa.array([nulls], pa.int64()),
            "events_negative_value": pa.array([bad_v or 0], pa.int64())})

    counts = {}
    counts.update(scan_sum(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]), o_checks,
        ["orders_fk_customer", "orders_nonpositive_price"]))
    counts.update(scan_sum(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_discount"]),
        l_checks,
        ["lineitem_fk_part", "lineitem_fk_supplier",
         "lineitem_discount_range"]))
    counts.update(scan_sum(
        _read(sf_dir, "events", ["user_id", "value"]), e_checks,
        ["events_null_user", "events_negative_value"]))

    docs = _read(sf_dir, "documents", ["doc_id"])
    n_docs = docs.count()
    dd = docs.map_batches(
        lambda b: b.group_by(["doc_id"]).aggregate([]),
        batch_format="pyarrow")
    distinct = _distinct_int(dd, "doc_id")
    n_distinct = (len(distinct) if isinstance(distinct, pd.DataFrame)
                  else distinct.count())
    counts["documents_dup_id"] = n_docs - n_distinct

    out = pd.DataFrame({"check_name": sorted(counts),
                        "n_violations": [counts[k] for k in sorted(counts)]})
    out["n_violations"] = out["n_violations"].astype("int64")
    return out


def events_snapshot_diff(sf_dir: str):
    """Snapshot diff / CDC classification: per-user value totals for the
    first half of the month (snapshot A, ts < Jan 16) vs the second
    (snapshot B), each user labeled added / removed / changed /
    unchanged.  One scan — the two snapshots are conditional partial
    sums over the same pass (the FULL OUTER JOIN the definition implies
    never materializes); totals are exact cents.  Classification is a
    vectorized per-row map over the per-user aggregate."""
    import datetime

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "status": pd.Series([], dtype="object"),
                          "a_cents": pd.Series([], dtype="int64"),
                          "b_cents": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    cut = np.datetime64("2024-01-16T00:00:00", "us")

    def pre(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        in_a = ts < cut
        return pa.table({
            "user_id": b.column("user_id"),
            "a_cents": pa.array(np.where(in_a, cents, 0), pa.int64()),
            "b_cents": pa.array(np.where(in_a, 0, cents), pa.int64()),
            "a_n": pa.array(in_a.astype(np.int64), pa.int64()),
            "b_n": pa.array((~in_a).astype(np.int64), pa.int64())})

    per_user = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"), ["user_id"],
        sum_cols=["a_cents", "b_cents", "a_n", "b_n"])

    def classify(b: pa.Table) -> pa.Table:
        a_n = b.column("a_n").to_numpy(zero_copy_only=False)
        b_n = b.column("b_n").to_numpy(zero_copy_only=False)
        a_c = b.column("a_cents").to_numpy(zero_copy_only=False)
        b_c = b.column("b_cents").to_numpy(zero_copy_only=False)
        status = np.where(
            a_n == 0, "added",
            np.where(b_n == 0, "removed",
                     np.where(a_c != b_c, "changed", "unchanged")))
        return pa.table({
            "user_id": pc.cast(b.column("user_id"), pa.int64()),
            "status": pa.array(status, pa.string()),
            "a_cents": pc.cast(b.column("a_cents"), pa.int64()),
            "b_cents": pc.cast(b.column("b_cents"), pa.int64())})

    return _det_sort(per_user.map_batches(classify, batch_format="pyarrow"),
                     ["user_id"])


def docs_lang_source_chi2(sf_dir: str):
    """Contingency-table independence analysis (lang × source): observed
    count, expected count under independence, and the chi-square
    contribution per cell.  The grid is dimension²-bounded, so one
    partial-aggregate scan feeds a driver fold; marginals come from the
    same partials.  Expected/contribution are per-cell arithmetic over
    identical integer operands on both sides (no cross-cell float
    summation), so round-6 matches the oracle bit-for-bit."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "source"])
    cells = partial_group_agg(
        ds.map_batches(lambda b: b.select(["lang", "source"]),
                       batch_format="pyarrow"),
        ["lang", "source"], count_alias="observed", combine="driver")
    if cells.empty:
        return pd.DataFrame({"lang": pd.Series([], dtype="object"),
                             "source": pd.Series([], dtype="object"),
                             "observed": pd.Series([], dtype="int64"),
                             "expected": pd.Series([], dtype="float64"),
                             "contrib": pd.Series([], dtype="float64")})
    n = int(cells["observed"].sum())
    row_tot = cells.groupby("lang")["observed"].transform("sum").to_numpy(
        np.int64)
    col_tot = cells.groupby("source")["observed"].transform("sum").to_numpy(
        np.int64)
    o = cells["observed"].to_numpy(np.int64)
    # double-first product: rt·ct overflows int64 at 100 TB marginals
    expected = row_tot.astype(np.float64) * col_tot / n
    contrib = (o - expected) ** 2 / expected
    out = pd.DataFrame({
        "lang": cells["lang"], "source": cells["source"],
        "observed": o,
        "expected": np.floor(expected * 1e6 + 0.5) / 1e6,
        "contrib": np.floor(contrib * 1e6 + 0.5) / 1e6})
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


def token_postings(sf_dir: str):
    """Inverted-index build with posting-list capping: token → full
    document frequency + the first 10 doc_ids (sorted) — the
    alias→candidate-docs dictionary shape of the reference's
    EntityDatabase (entity_database.py:264-274) as dataflow, with the
    truncation a real index applies to the Zipf head so no posting
    string is ever unbounded.  Per-batch partials pre-cap too (a
    batch's 10 smallest ids are a superset of the global 10 smallest
    present in that batch), so the token-keyed exchange moves ≤10 ids
    + one count per (batch, token), not the raw postings.  Postings
    serialize comma-joined (order-stable compare, same convention as
    part_brand_sets)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    empty = pd.DataFrame({"token": pd.Series([], dtype="object"),
                          "df_docs": pd.Series([], dtype="int64"),
                          "postings": pd.Series([], dtype="object")})
    if ds.count() == 0:
        return empty

    def explode(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        toks, out_ids = [], []
        for i, t in enumerate(b.column("text").to_pylist()):
            uniq = set(t.split(" "))
            toks.extend(uniq)
            out_ids.extend([ids[i]] * len(uniq))
        df = pd.DataFrame({"token": toks, "doc_id": out_ids})
        # batch-level cap: distinct count partial + 10 smallest ids.
        # Duplicate doc_id ROWS within the batch dedup here; cross-batch
        # duplicates are a documents-PK violation (doc_id uniqueness is
        # what data_quality_audit's documents_dup_id check asserts)
        df = df.drop_duplicates().sort_values(["token", "doc_id"])
        cnt = df.groupby("token")["doc_id"].transform("size")
        rn = df.groupby("token").cumcount()
        head = df[rn < 10]
        part = pd.concat([head.assign(df_docs=0),
                          df[rn == 0].assign(doc_id=-1, df_docs=cnt[rn == 0])])
        return pa.Table.from_pandas(part, preserve_index=False)

    def per_token(df: pd.DataFrame) -> pd.DataFrame:
        counts = (df[df["doc_id"] < 0].groupby("token")["df_docs"].sum()
                  .astype(np.int64))
        ids = df[df["doc_id"] >= 0].sort_values(["token", "doc_id"])
        rn = ids.groupby("token").cumcount()
        ids = ids[rn < 10]
        posting = ids.groupby("token")["doc_id"].agg(
            lambda s: ",".join(map(str, s)))
        out = pd.DataFrame({"token": counts.index,
                            "df_docs": counts.to_numpy(np.int64),
                            "postings": posting.reindex(
                                counts.index).to_numpy(object)})
        return out

    return _det_sort(as_arrow(bucketed_group_apply(
        ds.map_batches(explode, batch_format="pyarrow"),
        "token", per_token)), ["token"])


def events_value_winsorized(sf_dir: str):
    """Winsorization (quantile capping): every event's value clipped to
    its type's exact [p05, p95] percentile_disc band — the row-level
    transform-by-quantile companion to events_trimmed_mean.  Thresholds
    come from the exact two-phase cents-domain histogram quantile
    (stages/quantiles.py, no sort); the clip itself is a broadcast map.
    Cents arithmetic end-to-end, so the oracle matches bit-for-bit."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.quantiles import grouped_quantiles

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                          "event_type": pd.Series([], dtype="object"),
                          "value_w": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({"event_id": b.column("event_id"),
                         "event_type": b.column("event_type"),
                         "c": pa.array(np.floor(v * 100 + 0.5)
                                       .astype(np.int64))})

    cds = ds.map_batches(cents, batch_format="pyarrow")
    q = grouped_quantiles(cds, "c", (0.05, 0.95),
                          group_cols=["event_type"]).to_pandas()
    lo = {r["event_type"]: int(r["c"]) for _, r in q.iterrows()
          if r["q"] == 0.05}
    hi = {r["event_type"]: int(r["c"]) for _, r in q.iterrows()
          if r["q"] == 0.95}

    def clip(b: pa.Table) -> pa.Table:
        t = b.column("event_type").to_numpy(zero_copy_only=False)
        c = b.column("c").to_numpy(zero_copy_only=False)
        lov = np.array([lo[x] for x in t.tolist()], np.int64)
        hiv = np.array([hi[x] for x in t.tolist()], np.int64)
        w = np.minimum(np.maximum(c, lov), hiv)
        return pa.table({
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "value_w": pa.array(w / 100.0, pa.float64())})

    return _det_sort(cds.map_batches(clip, batch_format="pyarrow"),
                     ["event_id"])


def embedding_pca_top(sf_dir: str):
    """Distributed PCA, first principal component: mergeable
    second-moment partials (n, Σx, XᵀX per batch — one BLAS matmul
    each, d²-bounded) fold on the driver into the population covariance;
    the d×d eigensolve runs on the driver (np.linalg.eigh, fixed sign
    convention) — the distributed work is building the matrix.
    The d² accumulator is the only state — rows stream through once.
    Output: per-dimension mean and component loading (sign convention:
    largest-|loading| coordinate positive).  Rows-only for the driver
    (float reduction order is not SQL-reproducible); the numpy
    differential gate lives in tests/test_pca.py."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.knn import covariance_moments, top_eigenpair

    ds = _read(sf_dir, "embeddings", ["embedding"])
    n, s, ss = covariance_moments(ds, "embedding")
    if n == 0:
        return pd.DataFrame({"dim": pd.Series([], dtype="int64"),
                             "mean": pd.Series([], dtype="float64"),
                             "pc1": pd.Series([], dtype="float64"),
                             "eigenvalue": pd.Series([], dtype="float64")})
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    val, vec = top_eigenpair(cov)
    return pd.DataFrame({
        "dim": np.arange(1, len(mean) + 1, dtype=np.int64),
        "mean": np.round(mean, 6),
        "pc1": np.round(vec, 6),
        "eigenvalue": np.full(len(mean), round(float(val), 6))})


def lang_top_tokens(sf_dir: str):
    """Top-3 tokens per language by occurrence count — the two-level
    plan (high-cardinality count aggregate, then per-group ranked head)
    every corpus-vocabulary report runs.  The (lang, token) counts
    combine distributed; per-batch top-3-per-lang partials are
    superset-safe (a batch rank can only understate the global rank —
    same argument as orders_top_price_rank), so only ≤ 3·langs rows per
    block reach the driver for the exact final rank.  Deterministic tie
    break: count desc, token asc."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])
    empty = pd.DataFrame({"lang": pd.Series([], dtype="object"),
                          "token": pd.Series([], dtype="object"),
                          "cnt": pd.Series([], dtype="int64"),
                          "rnk": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def explode(b: pa.Table) -> pa.Table:
        langs, toks = [], []
        lcol = b.column("lang").to_pylist()
        for i, t in enumerate(b.column("text").to_pylist()):
            parts = t.split(" ")
            toks.extend(parts)
            langs.extend([lcol[i]] * len(parts))
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "token": pa.array(toks, pa.string())})

    counts = partial_group_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["lang", "token"], count_alias="cnt")

    def top3_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        df = b.to_pandas()
        df = df.sort_values(["lang", "cnt", "token"],
                            ascending=[True, False, True], kind="stable")
        return pa.Table.from_pandas(
            df[df.groupby("lang").cumcount() < 3], preserve_index=False)

    head = pd.concat(
        [b.to_pandas() for b in counts
         .map_batches(top3_partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")],
        ignore_index=True)
    if head.empty:
        return empty
    head = head.sort_values(["lang", "cnt", "token"],
                            ascending=[True, False, True], kind="stable")
    head["rnk"] = head.groupby("lang").cumcount() + 1
    out = head[head["rnk"] <= 3].reset_index(drop=True)
    out["cnt"] = out["cnt"].astype("int64")
    out["rnk"] = out["rnk"].astype("int64")
    return out[["lang", "token", "cnt", "rnk"]]


def activity_feed_daily(sf_dir: str):
    """Heterogeneous activity feed: events and orders harmonized to one
    (ts, kind, amount) schema with ``Dataset.union`` (lazy concat, no
    shuffle), then a daily per-kind count/sum rollup.  The reference
    loops benchmarks one at a time (link_benchmark.py:48-50); the
    engine's union makes multi-source processing one dataflow.  Amounts
    are exact cents."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])
    od = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def ev_pre(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        kinds = ["event_" + t for t in b.column("event_type").to_pylist()]
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({"day": pa.array(days, pa.int64()),
                         "kind": pa.array(kinds, pa.string()),
                         "amt": pa.array(cents, pa.int64())})

    def od_pre(b: pa.Table) -> pa.Table:
        days = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        cents = np.rint(b.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(
            np.int64)
        return pa.table({"day": pa.array(days, pa.int64()),
                         "kind": pa.array(["order"] * len(days),
                                          pa.string()),
                         "amt": pa.array(cents, pa.int64())})

    feed = ev.map_batches(ev_pre, batch_format="pyarrow").union(
        od.map_batches(od_pre, batch_format="pyarrow"))
    agg = partial_group_agg(feed, ["day", "kind"], sum_cols=["amt"],
                            count_alias="n", combine="driver")
    if agg.empty:
        return pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                             "kind": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "amt_cents": pd.Series([], dtype="int64")})
    agg = agg.sort_values(["day", "kind"]).reset_index(drop=True)
    return pd.DataFrame({
        "day": agg["day"].to_numpy(np.int64).astype(
            "datetime64[D]").astype("datetime64[us]"),
        "kind": agg["kind"],
        "n": agg["n"].astype("int64"),
        "amt_cents": agg["amt"].astype("int64")})


def user_type_breadth_histogram(sf_dir: str):
    """Distribution of per-user engagement breadth: how many users have
    exactly k distinct event types — a COUNT(DISTINCT) nested inside a
    distribution-of-counts (the Q13 shape over a distinct aggregate).
    One user-keyed exchange; each bucket dedups its co-located
    (user, type) pairs and emits its own (k, n_users) histogram
    partial, so the driver fold sees ≤ types·buckets rows."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    empty = pd.DataFrame({"n_types": pd.Series([], dtype="int64"),
                          "n_users": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    dd = ds.map_batches(
        lambda b: b.group_by(["user_id", "event_type"]).aggregate([]),
        batch_format="pyarrow")

    def per_bucket_hist(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "event_type"])
        k = df.groupby("user_id")["event_type"].size()
        vc = k.value_counts().sort_index()
        return pd.DataFrame({"n_types": vc.index.to_numpy(np.int64),
                             "n_users": vc.to_numpy(np.int64)})

    agg = partial_group_agg(
        bucketed_group_apply(dd, "user_id", per_bucket_hist),
        ["n_types"], sum_cols=["n_users"], combine="driver")
    if agg.empty:
        return empty
    agg = agg.sort_values("n_types").reset_index(drop=True)
    return pd.DataFrame({"n_types": agg["n_types"].astype("int64"),
                         "n_users": agg["n_users"].astype("int64")})


def supplier_degree_histogram(sf_dir: str):
    """Degree distribution of the supplier co-supply graph: how many
    suppliers have exactly k distinct co-suppliers.  Completes the
    graph-statistics family (triangles, PageRank, CC, BFS) with the
    standard first diagnostic.  Driver path under the cutoff: per-part
    adjacency marking into the dimension-bounded dense matrix (same
    trick as cosupply_triangles — no pair materialization), degrees =
    row sums; beyond it the distinct-pair dataset feeds per-bucket
    degree partials.  Oracle: distinct-pair CTE + two GROUP BYs."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.graph import (bipartite_codes_batch,
                                          cooccurrence_pairs,
                                          dense_cooccurrence_adjacency)
    from elevant_ray.stages.util import (as_arrow, bucketed_group_apply,
                                         np_columns, scale_cutoff)

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    empty = pd.DataFrame({"degree": pd.Series([], dtype="int64"),
                          "n_suppliers": pd.Series([], dtype="int64")})
    if line.count() == 0:
        return empty

    mask = np.int64((1 << 21) - 1)

    def ps_edges(b: pa.Table) -> pa.Table:
        return bipartite_codes_batch(b, "l_partkey", "l_suppkey")

    eds = line.map_batches(ps_edges, batch_format="pyarrow").materialize()

    def hist_frame(degrees: np.ndarray) -> pd.DataFrame:
        vals, cnts = np.unique(degrees, return_counts=True)
        return pd.DataFrame({"degree": vals.astype("int64"),
                             "n_suppliers": cnts.astype("int64")})

    if eds.size_bytes() <= scale_cutoff(256 << 20):
        comp = np.unique(np_columns(eds, ["comp"])["comp"].astype(np.int64))
        dense = dense_cooccurrence_adjacency(comp)
        if dense is not None:
            _, A = dense
            deg = A.sum(axis=1).astype(np.int64)
            deg = deg[deg > 0]  # isolated suppliers have no edge rows
        else:
            pairs = cooccurrence_pairs(comp)
            both = np.concatenate([pairs >> 21, pairs & mask])
            _, deg = np.unique(both, return_counts=True)
            deg = deg.astype(np.int64)
        return hist_frame(deg)

    # scale path: distinct pair set, per-bucket degree partials on the
    # lower endpoint + mirrored upper endpoint, histogram driver fold
    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"pair": cooccurrence_pairs(df["comp"].to_numpy(np.int64))})

    pair_ds = as_arrow(_distinct_int(
        as_arrow(bucketed_group_apply(eds, "part", bucket_pairs)),
        "pair", cutoff=0))

    def explode_ends(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table({"node": pa.array([], pa.int64())})
        p = b.column("pair").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.concatenate([p >> 21, p & mask]), pa.int64())})

    def bucket_deg(df: pd.DataFrame) -> pd.DataFrame:
        _, deg = np.unique(df["node"].to_numpy(np.int64),
                           return_counts=True)
        return hist_frame(deg.astype(np.int64))

    from elevant_ray.stages.util import partial_group_agg

    agg = partial_group_agg(
        bucketed_group_apply(
            pair_ds.map_batches(explode_ends, batch_format="pyarrow"),
            "node", bucket_deg),
        ["degree"], sum_cols=["n_suppliers"], combine="driver")
    if agg.empty:
        return empty
    agg = agg.sort_values("degree").reset_index(drop=True)
    return pd.DataFrame({"degree": agg["degree"].astype("int64"),
                         "n_suppliers": agg["n_suppliers"].astype("int64")})


def events_time_rollup(sf_dir: str):
    """Multi-granular time rollup: event counts and exact cents sums at
    hour, day, and week grain in long form — ONE scan.  The hour-grain
    partial aggregate is calendar-bounded, so the day and week levels
    re-aggregate it on the driver instead of re-scanning the fact table
    (the nation_region_rollup discipline applied to the time
    dimension).  Week starts Monday (integer-day arithmetic ==
    date_trunc 'week')."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["ts", "value"])
    empty = pd.DataFrame({"grain": pd.Series([], dtype="object"),
                          "bucket": pd.Series([], dtype="datetime64[us]"),
                          "n": pd.Series([], dtype="int64"),
                          "amt_cents": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        hour = us // 3_600_000_000
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({"hour": pa.array(hour, pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    fine = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                             ["hour"], sum_cols=["cents"],
                             count_alias="n", combine="driver")
    if fine.empty:
        return empty
    h = fine["hour"].to_numpy(np.int64)
    day = h // 24
    week = day - (day + 3) % 7  # 1970-01-01 is a Thursday

    def level(keys: np.ndarray, grain: str, to_us):
        df = pd.DataFrame({"k": keys, "n": fine["n"].to_numpy(np.int64),
                           "c": fine["cents"].to_numpy(np.int64)})
        g = df.groupby("k", as_index=False).sum().sort_values("k")
        return pd.DataFrame({
            "grain": grain,
            "bucket": to_us(g["k"].to_numpy(np.int64)),
            "n": g["n"].astype("int64"),
            "amt_cents": g["c"].astype("int64")})

    out = pd.concat([
        level(h, "hour", lambda k: (k * 3_600_000_000).astype(
            "datetime64[us]")),
        level(day, "day", lambda k: k.astype("datetime64[D]").astype(
            "datetime64[us]")),
        level(week, "week", lambda k: k.astype("datetime64[D]").astype(
            "datetime64[us]")),
    ], ignore_index=True)
    return out.sort_values(["grain", "bucket"]).reset_index(drop=True)


def user_time_weighted_value(sf_dir: str):
    """Time-weighted average value per user (each event's value held
    until the next event): Σ value·duration / Σ duration over
    consecutive-event intervals — the sensor/price-feed aggregate
    row-at-a-time engines do with window lag.  One user-keyed exchange;
    inside each bucket the lead/duration arithmetic is a vectorized
    shift over (user, ts, id)-sorted rows.  Numerator and denominator
    are exact int64 (cents × milliseconds), so the one double division
    matches the oracle bit-for-bit.  Users with a single event (no
    interval) are excluded, as in the SQL."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "twa_value": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        # a user's rows are complete within this bucket, so the kernel
        # reduces straight to per-user sums — no second exchange
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy()
        us = df["us"].to_numpy(np.int64)
        c = df["cents"].to_numpy(np.int64)
        same = np.concatenate([uid[1:] == uid[:-1], [False]])
        dur_ms = np.where(
            same, np.concatenate([(us[1:] - us[:-1]), [0]]) // 1000, 0)
        out = pd.DataFrame({"user_id": uid,
                            "num": c * dur_ms, "den": dur_ms})
        return out.groupby("user_id", as_index=False).sum()

    agg = bucketed_group_apply(
        ds.map_batches(pre, batch_format="pyarrow"), "user_id", per_user)
    from elevant_ray.stages.util import as_arrow
    agg = as_arrow(agg)

    def finish(b: pa.Table) -> pa.Table:
        den = b.column("den").to_numpy(zero_copy_only=False)
        keep = den > 0
        num = b.column("num").to_numpy(zero_copy_only=False)[keep]
        den = den[keep]
        uid = pc.cast(b.column("user_id"), pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        twa = num.astype(np.float64) / den.astype(np.float64) / 100.0
        return pa.table({"user_id": pa.array(uid, pa.int64()),
                         "twa_value": pa.array(
                             np.floor(twa * 1e6 + 0.5) / 1e6,
                             pa.float64())})

    return _det_sort(agg.map_batches(finish, batch_format="pyarrow"),
                     ["user_id"])


def orders_peer_avg_diff(sf_dir: str):
    """Leave-one-out peer comparison: each order's price minus the
    average of the SAME customer's other orders (n ≥ 2) — the window
    frame EXCLUDE CURRENT ROW shape, computed as x − (S−x)/(n−1) from
    one per-customer aggregate instead of a window sort.  Customer sums
    are dimension-bounded, so they broadcast as IntKeyMaps into a
    second scan; both sides run the identical float expression over
    exact cents, and the sign-aware half-up round matches SQL ROUND
    for negative diffs (the _c2d_sql lesson, applied at round-4)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import IntKeyMap, partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                  "o_totalprice"])
    empty = pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                          "o_custkey": pd.Series([], dtype="int64"),
                          "peer_diff": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_custkey": pc.cast(b.column("o_custkey"),
                                              pa.int64()),
                         "c": pa.array(c, pa.int64())})

    cds = ds.map_batches(pre, batch_format="pyarrow")
    per_cust = partial_group_agg(cds, ["o_custkey"], sum_cols=["c"],
                                 count_alias="n", combine="driver")
    keys = per_cust["o_custkey"].to_numpy(np.int64)
    smap = IntKeyMap(keys, per_cust["c"].to_numpy(np.int64))
    nmap = IntKeyMap(keys, per_cust["n"].to_numpy(np.int64))

    def diff(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        c = b.column("c").to_numpy(zero_copy_only=False)
        S = smap.take_checked(ck)
        n = nmap.take_checked(ck)
        keep = n >= 2
        c, S, n = c[keep], S[keep], n[keep]
        d = (c - (S - c) / (n - 1)) / 100.0
        d4 = np.sign(d) * np.floor(np.abs(d) * 1e4 + 0.5) / 1e4 + 0.0
        return pa.table({
            "o_orderkey": b.column("o_orderkey").filter(pa.array(keep)),
            "o_custkey": b.column("o_custkey").filter(pa.array(keep)),
            "peer_diff": pa.array(d4, pa.float64())})

    return _det_sort(cds.map_batches(diff, batch_format="pyarrow"),
                     ["o_orderkey"])


def priority_ship_delay(sf_dir: str):
    """Ship-delay statistics per order priority: average, exact median
    (percentile_disc over the bounded integer day domain), and max of
    l_shipdate − o_orderdate — a fact-to-fact join (lineitem × orders)
    folded into the scan as a broadcast packed (days, priority) lookup
    under the cutoff, with the co-group join beyond (the q8/q9 gating).
    The delay domain is calendar-bounded, so the median reuses the
    two-phase histogram quantile with no sort."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.quantiles import grouped_quantiles
    from elevant_ray.stages.util import (IntKeyMap, cogroup_join,
                                         np_columns, partial_group_agg,
                                         scale_cutoff)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    empty = pd.DataFrame({
        "o_orderpriority": pd.Series([], dtype="object"),
        "avg_delay": pd.Series([], dtype="float64"),
        "p50_delay": pd.Series([], dtype="int64"),
        "max_delay": pd.Series([], dtype="int64"),
        "n_lines": pd.Series([], dtype="int64")})
    if line.count() == 0 or orders.count() == 0:
        return empty

    # distinct priorities via per-batch unique partials (≤ values ×
    # batches rows reach the driver — never the full orders column)
    prios = sorted({r["o_orderpriority"] for r in _read(
        sf_dir, "orders", ["o_orderpriority"]).map_batches(
        lambda b: pa.table({"o_orderpriority":
                            pc.unique(b.column("o_orderpriority"))}),
        batch_format="pyarrow").take_all()})
    pcode = {p: i for i, p in enumerate(prios)}

    def joined():
        # the packed (days·8 + code) broadcast assumes ≤8 priorities;
        # wider enums take the co-group path
        if orders.size_bytes() <= scale_cutoff(64 << 20) \
                and len(prios) <= 8:
            o = np_columns(orders, ["o_orderkey", "o_orderdate",
                                    "o_orderpriority"])
            days = o["o_orderdate"].astype("datetime64[D]").astype(
                np.int64)
            codes = np.array([pcode[p] for p in
                              o["o_orderpriority"].tolist()], np.int64)
            omap = IntKeyMap(o["o_orderkey"], days * 8 + codes)

            def fold(b: pa.Table) -> pa.Table:
                sd = b.column("l_shipdate").to_numpy(
                    zero_copy_only=False).astype("datetime64[D]").astype(
                    np.int64)
                packed, found = omap.take(
                    b.column("l_orderkey").to_numpy(zero_copy_only=False))
                packed = np.asarray(packed, np.int64)
                delay = sd - (packed >> 3)
                return pa.table({
                    "prio": pa.array(packed % 8, pa.int64()),
                    "delay": pa.array(delay, pa.int64())}).filter(
                    pa.array(found))

            return line.map_batches(fold, batch_format="pyarrow")

        def l_pre(b: pa.Table) -> pa.Table:
            sd = b.column("l_shipdate").to_numpy(
                zero_copy_only=False).astype("datetime64[D]").astype(
                np.int64)
            return pa.table({"l_orderkey": b.column("l_orderkey"),
                             "sd": pa.array(sd, pa.int64())})

        def o_pre(b: pa.Table) -> pa.Table:
            days = b.column("o_orderdate").to_numpy(
                zero_copy_only=False).astype("datetime64[D]").astype(
                np.int64)
            codes = np.array([pcode[p] for p in
                              b.column("o_orderpriority").to_pylist()],
                             np.int64)
            return pa.table({"l_orderkey": b.column("o_orderkey"),
                             "od": pa.array(days, pa.int64()),
                             "prio": pa.array(codes, pa.int64())})

        j = cogroup_join(
            line.map_batches(l_pre, batch_format="pyarrow"),
            orders.map_batches(o_pre, batch_format="pyarrow"),
            on="l_orderkey",
            left_schema=pa.schema([("l_orderkey", pa.int64()),
                                   ("sd", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("od", pa.int64()),
                                    ("prio", pa.int64())]))

        def fin(b: pa.Table) -> pa.Table:
            sd = b.column("sd").to_numpy(zero_copy_only=False)
            od = b.column("od").to_numpy(zero_copy_only=False)
            return pa.table({"prio": b.column("prio"),
                             "delay": pa.array(sd - od, pa.int64())})

        return j.map_batches(fin, batch_format="pyarrow")

    # two passes over the same folded scan: moments + exact median
    stats = partial_group_agg(
        joined().map_batches(
            lambda b: b.append_column(
                "dmax", b.column("delay")),
            batch_format="pyarrow"),
        ["prio"], sum_cols=["delay"], max_cols=["dmax"],
        count_alias="n_lines", combine="driver")
    med = grouped_quantiles(joined(), "delay", (0.5,),
                            group_cols=["prio"]).to_pandas()
    if stats.empty:
        return empty
    m50 = {int(r["prio"]): int(r["delay"]) for _, r in med.iterrows()
           if r["q"] == 0.5}
    stats = stats.sort_values("prio").reset_index(drop=True)
    avg = stats["delay"].to_numpy(np.float64) / stats["n_lines"].to_numpy(
        np.float64)
    return pd.DataFrame({
        "o_orderpriority": [prios[int(p)] for p in stats["prio"]],
        "avg_delay": np.floor(avg * 1e6 + 0.5) / 1e6,
        "p50_delay": np.array([m50[int(p)] for p in stats["prio"]],
                              np.int64),
        "max_delay": stats["dmax"].astype("int64"),
        "n_lines": stats["n_lines"].astype("int64")})


def events_value_pct_change(sf_dir: str):
    """Percent change between a user's consecutive event values (the
    pct_change / lag-ratio window): (v − v_prev)/v_prev per event,
    ordered by (ts, event_id) within user.  One user-keyed bucket
    exchange; the shift-compare kernel is vectorized over the sorted
    bucket.  The ratio divides the same exact cents integers the oracle
    divides (zero previous value → NULL, as SQL division by zero would
    poison the hash)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                          "user_id": pd.Series([], dtype="int64"),
                          "pct_change": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(np.int64)
        c = df["cents"].to_numpy(np.int64)
        prev_same = np.concatenate([[False], uid[1:] == uid[:-1]])
        prev = np.concatenate([[0], c[:-1]])
        keep = prev_same & (prev != 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            pct = (c - prev) / prev
        pct = np.sign(pct) * np.floor(np.abs(pct) * 1e6 + 0.5) / 1e6 + 0.0
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64)[keep],
            "user_id": uid[keep],
            "pct_change": pct[keep]})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_user)
    from elevant_ray.stages.util import as_arrow
    return _det_sort(as_arrow(out), ["event_id"])


def region_acctbal_boxplot(sf_dir: str):
    """Box-plot five-number summary (min, q1, median, q3, max) of
    customer balances per region — the grouped multi-quantile report,
    exact over the cents domain via the two-phase histogram primitive
    (no sort), with min/max folded into the same partial-aggregate
    scan.  The nation→region dimension broadcasts into the scan."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.quantiles import grouped_quantiles
    from elevant_ray.stages.util import partial_group_agg

    region = {r["r_regionkey"]: r["r_name"]
              for r in _read(sf_dir, "region").take_all()}
    nat2reg = {r["n_nationkey"]: region[r["n_regionkey"]]
               for r in _read(sf_dir, "nation").take_all()}

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    empty = pd.DataFrame({
        "r_name": pd.Series([], dtype="object"),
        "bal_min": pd.Series([], dtype="float64"),
        "bal_q1": pd.Series([], dtype="float64"),
        "bal_median": pd.Series([], dtype="float64"),
        "bal_q3": pd.Series([], dtype="float64"),
        "bal_max": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        regs = [nat2reg[k] for k in b.column("c_nationkey").to_pylist()]
        cents = np.rint(b.column("c_acctbal")
                        .to_numpy(zero_copy_only=False) * 100).astype(
            np.int64)
        return pa.table({"r_name": pa.array(regs, pa.string()),
                         "c": pa.array(cents, pa.int64())})

    cds = ds.map_batches(pre, batch_format="pyarrow")
    q = grouped_quantiles(cds, "c", (0.25, 0.5, 0.75),
                          group_cols=["r_name"]).to_pandas()
    mm = partial_group_agg(
        cds.map_batches(lambda b: b.append_column("c2", b.column("c")),
                        batch_format="pyarrow"),
        ["r_name"], max_cols=["c"], min_cols=["c2"], combine="driver")
    if mm.empty:
        return empty
    qq = {(r["r_name"], r["q"]): int(r["c"]) for _, r in q.iterrows()}
    mm = mm.sort_values("r_name").reset_index(drop=True)
    names = mm["r_name"].tolist()
    return pd.DataFrame({
        "r_name": names,
        "bal_min": [mm["c2"][i] / 100.0 for i in range(len(names))],
        "bal_q1": [qq[(n, 0.25)] / 100.0 for n in names],
        "bal_median": [qq[(n, 0.5)] / 100.0 for n in names],
        "bal_q3": [qq[(n, 0.75)] / 100.0 for n in names],
        "bal_max": [mm["c"][i] / 100.0 for i in range(len(names))]})


def docs_source_dedup_rate(sf_dir: str):
    """Per-source duplication rate: documents, distinct texts (by full
    md5), and the duplicate fraction — the corpus-hygiene report a
    curation pass emits.  Per-batch (source, md5) dedup partials, then
    ONE md5-keyed bucket exchange (a hash's rows co-locate, so
    per-bucket distinct counts per source are exact partials) and a
    driver fold over sources × buckets rows.  The dup ratio divides
    the same exact integers the oracle divides."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, partial_group_agg

    ds = _read(sf_dir, "documents", ["source", "text"])
    empty = pd.DataFrame({"source": pd.Series([], dtype="object"),
                          "n_docs": pd.Series([], dtype="int64"),
                          "n_distinct": pd.Series([], dtype="int64"),
                          "dup_rate": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        import hashlib

        h = [hashlib.md5(t.encode()).hexdigest()
             for t in b.column("text").to_pylist()]
        t = pa.table({"source": b.column("source"),
                      "h": pa.array(h, pa.string())})
        return t.group_by(["source", "h"]).aggregate(
            [("source", "count")]).rename_columns(["source", "h", "n"])

    totals = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["source"], sum_cols=["n"], combine="driver")

    def per_hash_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["source", "h"])
        g = d.groupby("source").size()
        return pd.DataFrame({"source": g.index,
                             "nd": g.to_numpy(np.int64)})

    distinct = partial_group_agg(
        bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                             "h", per_hash_bucket),
        ["source"], sum_cols=["nd"], combine="driver")
    if totals.empty:
        return empty
    out = totals.merge(distinct, on="source", how="left").fillna(0)
    out = out.sort_values("source").reset_index(drop=True)
    n = out["n"].to_numpy(np.int64)
    nd = out["nd"].to_numpy(np.int64)
    rate = 1.0 - nd / n
    return pd.DataFrame({
        "source": out["source"],
        "n_docs": n,
        "n_distinct": nd,
        "dup_rate": np.floor(rate * 1e6 + 0.5) / 1e6 + 0.0})


def user_value_locf(sf_dir: str):
    """Last-observation-carried-forward gap fill (the IGNORE NULLS
    window): treat 'click' events as missing and fill each event's
    value with the user's most recent non-missing value, ordered by
    (ts, event_id).  One user-keyed bucket exchange; the forward fill
    is a vectorized grouped ffill over the sorted bucket.  Rows before
    a user's first observation stay missing and are dropped, mirroring
    the oracle's IS NOT NULL filter."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])
    empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                          "user_id": pd.Series([], dtype="int64"),
                          "locf_value": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100)
        miss = pc.equal(b.column("event_type"),
                        pa.scalar("click")).to_numpy(zero_copy_only=False)
        # cents ≤ 1e6 so float64 carries them exactly; NaN marks missing
        c = np.where(miss, np.nan, cents)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "c": pa.array(c, pa.float64())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        filled = df.groupby("user_id", sort=False)["c"].ffill()
        keep = filled.notna().to_numpy()
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64)[keep],
            "user_id": df["user_id"].to_numpy(np.int64)[keep],
            "locf_value": filled.to_numpy(np.float64)[keep] / 100.0})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_user)
    return _det_sort(as_arrow(out), ["event_id"])


def lineitem_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlation matrix over three measures
    (quantity, extended price, discount) from ONE scan: per-batch
    partial raw moments (n, Σ per var, Σ of each product) combine on
    the driver and close all three correlations at once — the
    multi-column generalization of the mergeable-moments corr
    aggregate, still a single pass with no shuffle."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg, pearson_from_moments

    ds = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount"])
    names = ["l_discount", "l_extendedprice", "l_quantity"]
    empty = pd.DataFrame({"var_x": pd.Series([], dtype="object"),
                          "var_y": pd.Series([], dtype="object"),
                          "r": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def moments(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("l_discount"), pa.float64())
        e = pc.cast(b.column("l_extendedprice"), pa.float64())
        q = pc.cast(b.column("l_quantity"), pa.float64())
        return pa.table({
            "g": pa.array(np.zeros(len(b), np.int64)),
            "sd": d, "se": e, "sq": q,
            "sd2": pc.multiply(d, d), "se2": pc.multiply(e, e),
            "sq2": pc.multiply(q, q),
            "sde": pc.multiply(d, e), "sdq": pc.multiply(d, q),
            "seq": pc.multiply(e, q)})

    agg = partial_group_agg(
        ds.map_batches(moments, batch_format="pyarrow"), ["g"],
        sum_cols=["sd", "se", "sq", "sd2", "se2", "sq2",
                  "sde", "sdq", "seq"],
        count_alias="n", combine="driver")
    n = agg["n"]
    pairs = [("l_discount", "l_extendedprice", "sd", "se", "sde",
              "sd2", "se2"),
             ("l_discount", "l_quantity", "sd", "sq", "sdq",
              "sd2", "sq2"),
             ("l_extendedprice", "l_quantity", "se", "sq", "seq",
              "se2", "sq2")]
    rows = []
    for vx, vy, sx, sy, sxy, sx2, sy2 in pairs:
        r = pearson_from_moments(n, agg[sx], agg[sy], agg[sxy],
                                 agg[sx2], agg[sy2])[0]
        rows.append((vx, vy,
                     float(np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5)
                           / 1e6) + 0.0))
    return pd.DataFrame(rows, columns=["var_x", "var_y", "r"])


def user_event_type_bitmask(sf_dir: str):
    """Bitwise-OR aggregate: each (user, week)'s event-type repertoire
    encoded as a bitmask (bit i = alphabetically i-th type), then the
    distribution of masks.  OR is idempotent and associative, so
    per-batch (user, week, mask) partials pre-shrink the exchange; ONE
    user-keyed bucket pass closes per-group masks and emits per-mask
    count partials; a tiny sum combine finishes."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    empty = pd.DataFrame({"mask": pd.Series([], dtype="int64"),
                          "n_groups": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    types = sorted({r["event_type"] for r in _read(
        sf_dir, "events", ["event_type"]).map_batches(
        lambda b: pa.table({"event_type":
                            pc.unique(b.column("event_type"))}),
        batch_format="pyarrow").take_all()})
    bit = {t: 1 << i for i, t in enumerate(types)}

    def or_by_key(uid: np.ndarray, wk: np.ndarray, m: np.ndarray):
        order = np.lexsort((wk, uid))
        uid, wk, m = uid[order], wk[order], m[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], (uid[1:] != uid[:-1]) | (wk[1:] != wk[:-1])]))
        return uid[starts], wk[starts], np.bitwise_or.reduceat(m, starts)

    def pre(b: pa.Table) -> pa.Table:
        uid = pc.cast(b.column("user_id"), pa.int64()).to_numpy(
            zero_copy_only=False)
        # floor_temporal(week) == DuckDB date_trunc('week'): Monday start
        wk = pc.floor_temporal(b.column("ts"), unit="week").to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        m = np.array([bit[t] for t in b.column("event_type").to_pylist()],
                     np.int64)
        u, w, pm = or_by_key(uid, wk, m)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "wk": pa.array(w, pa.int64()),
                         "m": pa.array(pm, pa.int64())})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u, w, pm = or_by_key(df["user_id"].to_numpy(np.int64),
                             df["wk"].to_numpy(np.int64),
                             df["m"].to_numpy(np.int64))
        masks, counts = np.unique(pm, return_counts=True)
        return pd.DataFrame({"mask": masks,
                             "nu": counts.astype(np.int64)})

    out = partial_group_agg(
        bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                             "user_id", per_bucket),
        ["mask"], sum_cols=["nu"], combine="driver")
    out = out.sort_values("mask").reset_index(drop=True)
    return pd.DataFrame({"mask": out["mask"].astype("int64"),
                         "n_groups": out["nu"].astype("int64")})


def returnflag_weighted_median(sf_dir: str):
    """Weighted median (quantity-weighted extended price) per return
    flag — the weighted-quantile operator: smallest price whose
    cumulative quantity reaches half the flag's total, exact in
    integers via the (group, value) → Σweight histogram (see
    stages/quantiles.grouped_weighted_median; no sort, one tiny
    combine exchange)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.quantiles import grouped_weighted_median

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])
    empty = pd.DataFrame({
        "l_returnflag": pd.Series([], dtype="object"),
        "wmedian_price": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        v = np.rint(b.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        w = np.rint(b.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "v": pa.array(v, pa.int64()),
                         "w": pa.array(w, pa.int64())})

    med = grouped_weighted_median(
        ds.map_batches(pre, batch_format="pyarrow"), "v", "w",
        group_cols=["l_returnflag"]).to_pandas()
    med = med.sort_values("l_returnflag").reset_index(drop=True)
    return pd.DataFrame({
        "l_returnflag": med["l_returnflag"],
        "wmedian_price": med["v"].to_numpy(np.float64) / 100.0})


def nation_balance_gini(sf_dir: str):
    """Gini concentration index of customer balances per nation — the
    rank-weighted aggregate G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    ascending-sorted values.  Equal values commute under the rank sum,
    so the statistic is order-stable; ONE nation-keyed bucket exchange
    sorts locally and emits exact integer partials (Σi·x, Σx, n), the
    driver closes the formula in the identical float expression the
    oracle evaluates."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                          "gini": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        x = np.rint(b.column("c_acctbal")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"k": pc.cast(b.column("c_nationkey"), pa.int64()),
                         "x": pa.array(x, pa.int64())})

    def per_nation(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["k", "x"], kind="stable")
        k = df["k"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        sizes = np.diff(np.append(starts, len(k)))
        i = np.arange(len(k), dtype=np.int64) - np.repeat(starts, sizes) + 1
        six = np.add.reduceat(i * x, starts)
        sx = np.add.reduceat(x, starts)
        return pd.DataFrame({"k": k[starts], "six": six, "sx": sx,
                             "n": sizes.astype(np.int64)})

    agg = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "k", per_nation).to_pandas()
    six = agg["six"].to_numpy(np.int64)
    sx = agg["sx"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    g = (2.0 * six) / (n * sx) - (1.0 * (n + 1)) / n
    g6 = np.sign(g) * np.floor(np.abs(g) * 1e6 + 0.5) / 1e6 + 0.0
    out = pd.DataFrame({"n_name": [nation[k] for k in agg["k"]],
                        "gini": g6})
    return out.sort_values("n_name").reset_index(drop=True)


def user_activity_streaks(sf_dir: str):
    """Per-user longest consecutive-day activity streak — the
    gaps-and-islands window applied per key (distinct from the
    key-space islands of purchase_id_gaps): distinct active days per
    user, runs split where day deltas exceed 1.  Per-batch composite
    (user, day) dedup partials shrink the ONE user-keyed bucket
    exchange; runs close inside the bucket (a user's days co-locate)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "n_active_days": pd.Series([], dtype="int64"),
                          "max_streak": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    # composite (user << 20) | day-ordinal; day ordinals stay < 2^20
    # until year 4840, users < 2^43
    def pre(b: pa.Table) -> pa.Table:
        uid = pc.cast(b.column("user_id"), pa.int64()).to_numpy(
            zero_copy_only=False)
        day = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        comp = np.unique((uid << 20) + day)
        return pa.table({"user_id": pa.array(comp >> 20, pa.int64()),
                         "comp": pa.array(comp, pa.int64())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        comp = np.unique(df["comp"].to_numpy(np.int64))
        uid = comp >> 20
        day = comp & np.int64((1 << 20) - 1)
        # a run breaks at a user change or a day gap > 1
        brk = np.concatenate([[True], (uid[1:] != uid[:-1]) |
                              (day[1:] != day[:-1] + 1)])
        run_starts = np.flatnonzero(brk)
        run_lens = np.diff(np.append(run_starts, len(comp)))
        ustarts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]]))
        # per-user reduction over its runs: runs are user-contiguous
        run_uid = uid[run_starts]
        rstarts = np.flatnonzero(
            np.concatenate([[True], run_uid[1:] != run_uid[:-1]]))
        return pd.DataFrame({
            "user_id": run_uid[rstarts],
            "n_active_days": np.diff(np.append(ustarts, len(comp)))
            .astype(np.int64),
            "max_streak": np.maximum.reduceat(run_lens, rstarts)
            .astype(np.int64)})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_user)
    return _det_sort(as_arrow(out), ["user_id"])


def order_basket_rules(sf_dir: str):
    """Association-rule mining over order baskets: for every part pair
    co-purchased in ≥ 2 orders, support, both confidences, and lift —
    the market-basket rules report built from three exact counts
    (pair support, per-item order counts, basket total) that all fall
    out of ONE distinct-edge pass.  Under the cutoff the deduped edge
    list closes on the driver (the measured winner for pair kernels);
    beyond it order-keyed buckets generate pair/item/basket partials
    in long form and one distributed sum combines them.  Assumes
    partkey < 2^25 and orderkey < 2^38 (composite layout)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (bucketed_group_apply, np_columns,
                                         partial_group_agg, scale_cutoff,
                                         within_group_pairs)

    empty = pd.DataFrame({
        "part_a": pd.Series([], dtype="int64"),
        "part_b": pd.Series([], dtype="int64"),
        "support": pd.Series([], dtype="int64"),
        "conf_a_to_b": pd.Series([], dtype="float64"),
        "conf_b_to_a": pd.Series([], dtype="float64"),
        "lift": pd.Series([], dtype="float64")})
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    if line.count() == 0:
        return empty

    PBITS = 25
    pmask = np.int64((1 << PBITS) - 1)

    def edges(b: pa.Table) -> pa.Table:
        o = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = b.column("l_partkey").to_numpy(zero_copy_only=False)
        comp = np.unique((o << PBITS) + p)
        return pa.table({"order": pa.array(comp >> PBITS, pa.int64()),
                         "comp": pa.array(comp, pa.int64())})

    eds = line.map_batches(edges, batch_format="pyarrow").materialize()

    def basket_partials(comp: np.ndarray):
        """(pair→sup, part→orders, n_orders) from a whole-order slice."""
        comp = np.unique(comp)
        order = comp >> PBITS
        part = comp & pmask
        starts = np.flatnonzero(
            np.concatenate([[True], order[1:] != order[:-1]]))
        sizes = np.diff(np.append(starts, len(order)))
        i, j = within_group_pairs(starts, sizes)
        # comp sorted ⇒ parts ascend within an order ⇒ part_a < part_b
        pair = (part[i] << PBITS) + part[j]
        up, sup = np.unique(pair, return_counts=True)
        pt, pc_ = np.unique(part, return_counts=True)
        return up, sup.astype(np.int64), pt, pc_.astype(np.int64), \
            np.int64(len(starts))

    if eds.size_bytes() <= scale_cutoff(256 << 20):
        up, sup, pt, pcnt, n_orders = basket_partials(
            np_columns(eds, ["comp"])["comp"].astype(np.int64))
        pairs = pd.DataFrame({"pair": up, "sup": sup})
        items = pd.DataFrame({"part": pt, "c": pcnt})
    else:
        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            u, s, t, c, n = basket_partials(df["comp"].to_numpy(np.int64))
            # long form: kind 0 = pair partial, 1 = item partial,
            # 2 = basket-count partial
            return pd.DataFrame({
                "kind": np.concatenate([np.zeros(len(u), np.int64),
                                        np.ones(len(t), np.int64),
                                        [2]]),
                "key": np.concatenate([u, t, [0]]),
                "c": np.concatenate([s, c, [n]])})

        partials = bucketed_group_apply(eds, "order", per_bucket)
        comb = partial_group_agg(partials, ["kind", "key"],
                                 sum_cols=["c"], combine="dataset")
        comb = comb.filter(
            lambda r: r["kind"] != 0 or r["c"] >= 2).to_pandas()
        pairs = comb[comb["kind"] == 0].rename(
            columns={"key": "pair", "c": "sup"})[["pair", "sup"]]
        items = comb[comb["kind"] == 1].rename(
            columns={"key": "part"})[["part", "c"]]
        n_orders = np.int64(comb.loc[comb["kind"] == 2, "c"].sum())

    pairs = pairs[pairs["sup"] >= 2]
    if len(pairs) == 0:
        return empty
    cmap = dict(zip(items["part"].to_numpy(np.int64),
                    items["c"].to_numpy(np.int64)))
    pa_ = (pairs["pair"].to_numpy(np.int64) >> PBITS)
    pb_ = (pairs["pair"].to_numpy(np.int64) & pmask)
    sup = pairs["sup"].to_numpy(np.int64)
    ca = np.array([cmap[p] for p in pa_], np.int64)
    cb = np.array([cmap[p] for p in pb_], np.int64)

    def r6(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6 + 0.0

    out = pd.DataFrame({
        "part_a": pa_, "part_b": pb_, "support": sup,
        "conf_a_to_b": r6((1.0 * sup) / ca),
        "conf_b_to_a": r6((1.0 * sup) / cb),
        "lift": r6((1.0 * n_orders * sup) / (ca * cb))})
    return out.sort_values(["part_a", "part_b"]).reset_index(drop=True)


def events_value_benford(sf_dir: str):
    """First-significant-digit (Benford) distribution of event values:
    digit counts and shares over positive amounts — the data-forensics
    scan.  Leading digits extract vectorized from exact cents (a
    bounded divide-down loop, ≤ 7 iterations for any int64 cents); the
    distribution is a 9-row partial-count combine, shares divide the
    same exact integers the oracle divides."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["value"])
    empty = pd.DataFrame({"digit": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "share": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                    * 100).astype(np.int64)
        c = c[c > 0]
        while (c >= 10).any():
            big = c >= 10
            c[big] //= 10
        return pa.table({"digit": pa.array(c, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["digit"], count_alias="n", combine="driver")
    if agg.empty:
        return empty
    agg = agg.sort_values("digit").reset_index(drop=True)
    n = agg["n"].to_numpy(np.int64)
    share = (1.0 * n) / n.sum()
    return pd.DataFrame({
        "digit": agg["digit"].astype("int64"),
        "n": n,
        "share": np.floor(share * 1e6 + 0.5) / 1e6 + 0.0})


def user_value_autocorr(sf_dir: str):
    """Lag-1 serial (auto)correlation of each user's event values in
    (ts, event_id) order — the time-series diagnostics window: per-user
    consecutive (previous, current) pairs feed the mergeable-moments
    Pearson closure; users with fewer than 2 pairs drop (corr
    undefined).  ONE user-keyed bucket exchange; pairs and moments
    vectorize over the sorted bucket."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (as_arrow, bucketed_group_apply,
                                         pearson_from_moments)

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "n_pairs": pd.Series([], dtype="int64"),
                          "autocorr": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "c": pa.array(cents, pa.int64())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.float64)
        same = np.concatenate([[False], uid[1:] == uid[:-1]])
        x = np.concatenate([[0.0], c[:-1]])[same]   # prev
        y = c[same]                                  # cur
        u = uid[same]
        starts = np.flatnonzero(
            np.concatenate([[True], u[1:] != u[:-1]]))
        if len(u) == 0:
            return pd.DataFrame({"user_id": [], "n_pairs": [],
                                 "autocorr": []})
        n = np.diff(np.append(starts, len(u)))
        r = pearson_from_moments(
            n,
            np.add.reduceat(y, starts), np.add.reduceat(x, starts),
            np.add.reduceat(y * x, starts),
            np.add.reduceat(y * y, starts),
            np.add.reduceat(x * x, starts))
        keep = n >= 2
        r6 = np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5) / 1e6 + 0.0
        return pd.DataFrame({"user_id": u[starts][keep],
                             "n_pairs": n[keep].astype(np.int64),
                             "autocorr": r6[keep]})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_user)
    return _det_sort(as_arrow(out), ["user_id"])


def customer_rfm_segments(sf_dir: str):
    """RFM segmentation: per-customer recency (last order date),
    frequency (order count), monetary (exact cents total) each cut
    into quintiles (SQL NTILE with deterministic (metric, custkey)
    order), then the 5×5×5 segment census.  The fact scan reduces to
    per-customer partials; the three quintile assignments run on the
    dimension-bounded customer aggregate with the exact-NTILE kernel
    (util.ntile_assign)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import ntile_assign, partial_group_agg

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"r_score": pd.Series([], dtype="int64"),
                          "f_score": pd.Series([], dtype="int64"),
                          "m_score": pd.Series([], dtype="int64"),
                          "n_customers": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"o_custkey": pc.cast(b.column("o_custkey"),
                                              pa.int64()),
                         "r": pa.array(d, pa.int64()),
                         "m": pa.array(c, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["o_custkey"], sum_cols=["m"], max_cols=["r"],
                            count_alias="f", combine="driver")
    ck = agg["o_custkey"].to_numpy(np.int64)
    n = len(agg)
    sizes = np.full(n, n, np.int64)

    def score(metric: np.ndarray) -> np.ndarray:
        order = np.lexsort((ck, metric))
        ranks = np.empty(n, np.int64)
        ranks[order] = np.arange(n)
        return ntile_assign(sizes, ranks, 5)

    seg = pd.DataFrame({
        "r_score": score(agg["r"].to_numpy(np.int64)),
        "f_score": score(agg["f"].to_numpy(np.int64)),
        "m_score": score(agg["m"].to_numpy(np.int64))})
    out = seg.groupby(["r_score", "f_score", "m_score"]).size() \
        .rename("n_customers").reset_index()
    out = out.sort_values(["r_score", "f_score", "m_score"]) \
        .reset_index(drop=True)
    return out.astype({"r_score": "int64", "f_score": "int64",
                       "m_score": "int64", "n_customers": "int64"})


def events_purchase_context(sf_dir: str):
    """Nearest-neighbor temporal self-join: for every purchase, the
    user's closest non-purchase event in time (earlier wins ties) —
    the bidirectional-LOCF nearest join, distinct from the one-sided
    as-of join.  Per-user forward and backward index fills vectorize
    over the sorted bucket; the nearest pick compares exact µs deltas
    exactly as the oracle's CASE does."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"])
    empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                          "user_id": pd.Series([], dtype="int64"),
                          "ctx_event_id": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        purch = pc.equal(b.column("event_type"), pa.scalar("purchase")) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "purch": pa.array(purch, pa.bool_())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        purch = df["purch"].to_numpy(bool)
        n = len(df)
        if n == 0:
            return pd.DataFrame({"event_id": [], "user_id": [],
                                 "ctx_event_id": []})
        idx = np.arange(n)
        ustarts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]]))
        usizes = np.diff(np.append(ustarts, n))
        ustart_of = np.repeat(ustarts, usizes)
        uend_of = np.repeat(ustarts + usizes - 1, usizes)
        # forward fill of the last non-purchase index; a fill from an
        # earlier user lands below the row's user start → invalid
        prev = np.maximum.accumulate(np.where(~purch, idx, -1))
        prev_ok = prev >= ustart_of
        # backward fill of the next non-purchase index, symmetric
        nxt = np.minimum.accumulate(
            np.where(~purch, idx, n)[::-1])[::-1]
        nxt_ok = nxt <= uend_of
        keep = purch & (prev_ok | nxt_ok)
        pi = np.clip(prev[keep], 0, n - 1)
        ni = np.clip(nxt[keep], 0, n - 1)
        p_ok, n_ok = prev_ok[keep], nxt_ok[keep]
        t = us[keep]
        use_prev = p_ok & (~n_ok | (t - us[pi] <= us[ni] - t))
        ctx = np.where(use_prev, eid[pi], eid[ni])
        return pd.DataFrame({"event_id": eid[keep],
                             "user_id": uid[keep],
                             "ctx_event_id": ctx})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_user)
    return _det_sort(as_arrow(out), ["event_id"])


def events_since_purchase_rank(sf_dir: str):
    """Windowed rank with a reset marker: each event's 1-based position
    since the user's most recent purchase (a purchase starts its own
    segment at rank 1) — the count-since-flag window, computed as
    row_number within (user, running purchase count).  One user-keyed
    bucket exchange; the segment cumsum and in-segment ranks vectorize
    over the sorted bucket."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"])
    empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                          "user_id": pd.Series([], dtype="int64"),
                          "n_since": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        purch = pc.equal(b.column("event_type"), pa.scalar("purchase")) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "purch": pa.array(purch, pa.bool_())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(np.int64)
        flag = df["purch"].to_numpy(bool).astype(np.int64)
        n = len(df)
        idx = np.arange(n)
        ustarts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]]))
        usizes = np.diff(np.append(ustarts, n))
        cum = np.cumsum(flag)
        # running purchase count reset per user: subtract the count
        # accumulated before each user's first row
        offset = np.repeat(cum[ustarts] - flag[ustarts], usizes)
        grp = cum - offset
        # rank within (user, grp): segment starts where user or grp flips
        seg = np.concatenate([[True], (uid[1:] != uid[:-1]) |
                              (grp[1:] != grp[:-1])])
        sstarts = np.flatnonzero(seg)
        ssizes = np.diff(np.append(sstarts, n))
        rn = idx - np.repeat(sstarts, ssizes) + 1
        return pd.DataFrame({"event_id": df["event_id"]
                             .to_numpy(np.int64),
                             "user_id": uid,
                             "n_since": rn.astype(np.int64)})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_user)
    return _det_sort(as_arrow(out), ["event_id"])


def part_name_split_counts(sf_dir: str):
    """Multi-column string split (SPLIT_PART projection): part names
    decompose into (adjective, noun); the census counts parts and sums
    exact retail cents per pair.  The split is one vectorized Arrow
    split_pattern; the aggregate is a bounded partial combine."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "part", ["p_name", "p_retailprice"])
    empty = pd.DataFrame({"adjective": pd.Series([], dtype="object"),
                          "noun": pd.Series([], dtype="object"),
                          "n_parts": pd.Series([], dtype="int64"),
                          "avg_price": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("p_name"), " ")
        cents = np.rint(b.column("p_retailprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(
            np.int64)
        return pa.table({
            "adjective": pc.list_element(parts, 0),
            "noun": pc.list_element(parts, 1),
            "c": pa.array(cents, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["adjective", "noun"], sum_cols=["c"],
                            count_alias="n_parts", combine="driver")
    agg = agg.sort_values(["adjective", "noun"]).reset_index(drop=True)
    c = agg["c"].to_numpy(np.int64)
    n = agg["n_parts"].to_numpy(np.int64)
    avg = (1.0 * c) / (100 * n)
    return pd.DataFrame({
        "adjective": agg["adjective"], "noun": agg["noun"],
        "n_parts": n,
        "avg_price": np.floor(avg * 1e6 + 0.5) / 1e6 + 0.0})


def orders_systematic_sample(sf_dir: str):
    """Systematic (every k-th) sampling by global order: rank every
    order by (date, key) WITHOUT a global sort — the distributed
    prefix-scan primitive over all-ones values yields each row's
    1-based global rank — and keep every 97th.  Deterministic,
    reproducible, and one-pass; the composite (days<<32 | orderkey)
    key makes ranks unique and oracle-identical."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import global_ordered_cumsum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    empty = pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                          "sample_rank": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        k = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array((d << 32) + k, pa.int64()),
                         "one": pa.array(np.ones(len(b), np.int64))})

    ranked = global_ordered_cumsum(
        ds.map_batches(pre, batch_format="pyarrow"), "key", "one")
    if ranked is None:
        return empty

    def pick(b: pa.Table) -> pa.Table:
        cum = b.column("cum").to_numpy(zero_copy_only=False)
        key = b.column("key").to_numpy(zero_copy_only=False)
        keep = (cum - 1) % 97 == 0
        return pa.table({
            "o_orderkey": pa.array(key[keep] & np.int64((1 << 32) - 1),
                                   pa.int64()),
            "sample_rank": pa.array(cum[keep], pa.int64())})

    return _det_sort(ranked.map_batches(pick, batch_format="pyarrow"),
                     ["o_orderkey"])


def nation_share_of_parent(sf_dir: str):
    """Ratio-to-parent hierarchical report: each nation's order revenue
    as a share of its region, and each region's share of the world —
    the multi-level percent-of-parent BI op from ONE fact scan (exact
    cents partials per nation; both share levels close on the driver
    over the dimension-bounded aggregate with the oracle's exact
    integer operands)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import IntKeyMap, partial_group_agg

    region = {r["r_regionkey"]: r["r_name"]
              for r in _read(sf_dir, "region").take_all()}
    nations = _read(sf_dir, "nation").take_all()
    nat2name = {r["n_nationkey"]: r["n_name"] for r in nations}
    nat2reg = {r["n_nationkey"]: region[r["n_regionkey"]] for r in nations}
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    empty = pd.DataFrame({
        "r_name": pd.Series([], dtype="object"),
        "n_name": pd.Series([], dtype="object"),
        "revenue": pd.Series([], dtype="float64"),
        "share_of_region": pd.Series([], dtype="float64"),
        "region_share_of_total": pd.Series([], dtype="float64")})
    if orders.count() == 0 or cust.count() == 0:
        return empty

    from elevant_ray.stages.util import np_columns

    c = np_columns(cust, ["c_custkey", "c_nationkey"])
    cmap = IntKeyMap(c["c_custkey"].astype(np.int64),
                     c["c_nationkey"].astype(np.int64))

    def pre(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = np.rint(b.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(
            np.int64)
        nk = cmap.take_checked(ck)
        return pa.table({"nk": pa.array(nk, pa.int64()),
                         "c": pa.array(cents, pa.int64())})

    agg = partial_group_agg(orders.map_batches(pre, batch_format="pyarrow"),
                            ["nk"], sum_cols=["c"], combine="driver")
    agg["r_name"] = [nat2reg[k] for k in agg["nk"]]
    agg["n_name"] = [nat2name[k] for k in agg["nk"]]
    reg_tot = agg.groupby("r_name")["c"].transform("sum")
    total = np.int64(agg["c"].sum())
    c = agg["c"].to_numpy(np.int64)

    def r6(x):
        return np.floor(np.abs(x) * 1e6 + 0.5) / 1e6 * np.sign(x) + 0.0

    out = pd.DataFrame({
        "r_name": agg["r_name"], "n_name": agg["n_name"],
        # cents sums stay < 2^53, so the /100 division is exact-operand
        # float arithmetic identical to the oracle's BIGINT/100.0
        "revenue": c / 100.0,
        "share_of_region": r6((1.0 * c) / reg_tot.to_numpy(np.int64)),
        "region_share_of_total": r6(
            (1.0 * reg_tot.to_numpy(np.int64)) / total)})
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


def signup_purchase_conversion(sf_dir: str):
    """Attribution-window conversion: users whose first purchase lands
    within 7 days of their first signup, bucketed by whole-day offset —
    the time-bounded funnel.  Per-user firsts close inside ONE
    user-keyed bucket exchange (min-reductions over the sorted bucket);
    the day-offset histogram is an 8-row combine."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    empty = pd.DataFrame({"day_offset": pd.Series([], dtype="int64"),
                          "n_users": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    DAY_US = 86_400_000_000

    def pre(b: pa.Table) -> pa.Table:
        t = b.column("event_type")
        keep = pc.or_(pc.equal(t, pa.scalar("signup")),
                      pc.equal(t, pa.scalar("purchase")))
        b = b.filter(keep)
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "us": pa.array(us, pa.int64()),
                         "is_signup": pc.equal(b.column("event_type"),
                                               pa.scalar("signup"))})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        sign = df[df["is_signup"]].groupby("user_id")["us"].min()
        pur = df[~df["is_signup"]]
        j = pur.merge(sign.rename("st"), left_on="user_id",
                      right_index=True)
        j = j[j["us"] >= j["st"]]
        if len(j) == 0:
            return pd.DataFrame({"day_offset": pd.Series([], "int64"),
                                 "nu": pd.Series([], "int64")})
        first = j.groupby("user_id").agg(pt=("us", "min"),
                                         st=("st", "first"))
        off = (first["pt"].to_numpy(np.int64)
               - first["st"].to_numpy(np.int64)) // DAY_US
        off = off[off <= 7]
        d, c = np.unique(off, return_counts=True)
        return pd.DataFrame({"day_offset": d, "nu": c.astype(np.int64)})

    agg = partial_group_agg(
        bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                             "user_id", per_user),
        ["day_offset"], sum_cols=["nu"], combine="driver")
    if agg.empty:
        return empty
    agg = agg.sort_values("day_offset").reset_index(drop=True)
    return pd.DataFrame({"day_offset": agg["day_offset"].astype("int64"),
                         "n_users": agg["nu"].astype("int64")})


def events_rolling_median5(sf_dir: str):
    """Rolling order statistic: the median of each user's last ≤5
    event values in (ts, event_id) order — the windowed-median frame
    (ROWS 4 PRECEDING), an aggregate-as-window shape the plain moving
    average can't express.  Per-user grouped rolling medians vectorize
    inside ONE bucket exchange; integer cents make the interpolated
    midpoints (x.0 / x.5) exact on both sides."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                          "user_id": pd.Series([], dtype="int64"),
                          "med5": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "c": pa.array(cents, pa.int64())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        med = df.groupby("user_id", sort=False)["c"] \
            .rolling(5, min_periods=1).median() \
            .reset_index(level=0, drop=True)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "med5": med.to_numpy(np.float64) / 100.0})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_user)
    return _det_sort(as_arrow(out), ["event_id"])


def nation_segment_welch_t(sf_dir: str):
    """Two-sample Welch's t statistic per nation between BUILDING and
    MACHINERY customer balances — the distributed hypothesis-test shape:
    per-(nation, segment) exact integer moment partials (n, Σc, Σc²)
    from one scan, the t closure on the driver in the identical float
    expression the oracle evaluates (Σc² stays < 2^53 through sf1;
    beyond that the cents domain would need a scale-down)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "customer",
               ["c_nationkey", "c_mktsegment", "c_acctbal"])
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}
    empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                          "n_a": pd.Series([], dtype="int64"),
                          "n_b": pd.Series([], dtype="int64"),
                          "welch_t": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        seg = b.column("c_mktsegment")
        keep = pc.or_(pc.equal(seg, pa.scalar("BUILDING")),
                      pc.equal(seg, pa.scalar("MACHINERY")))
        b = b.filter(keep)
        c = np.rint(b.column("c_acctbal")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"nk": pc.cast(b.column("c_nationkey"), pa.int64()),
                         "seg": b.column("c_mktsegment"),
                         "sc": pa.array(c, pa.int64()),
                         "scc": pa.array(c * c, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["nk", "seg"], sum_cols=["sc", "scc"],
                            count_alias="n", combine="driver")
    if agg.empty:
        return empty
    piv = agg.pivot(index="nk", columns="seg",
                    values=["n", "sc", "scc"])
    rows = []
    for nk, r in piv.iterrows():
        na = r.get(("n", "BUILDING"), np.nan)
        nb = r.get(("n", "MACHINERY"), np.nan)
        if not (na >= 2 and nb >= 2):
            continue
        na, nb = int(na), int(nb)
        sa, sb = int(r[("sc", "BUILDING")]), int(r[("sc", "MACHINERY")])
        qa, qb = int(r[("scc", "BUILDING")]), int(r[("scc", "MACHINERY")])
        # identical float expression as the oracle, from exact ints
        ma, mb = (1.0 * sa) / na, (1.0 * sb) / nb
        va = (qa - (1.0 * sa / na) * sa) / (na - 1)
        vb = (qb - (1.0 * sb / nb) * sb) / (nb - 1)
        t = (ma - mb) / np.sqrt(va / na + vb / nb)
        t6 = float(np.sign(t) * np.floor(np.abs(t) * 1e6 + 0.5) / 1e6) + 0.0
        rows.append((nation[int(nk)], na, nb, t6))
    out = pd.DataFrame(rows, columns=["n_name", "n_a", "n_b", "welch_t"])
    return out.sort_values("n_name").reset_index(drop=True)


def user_value_ewma(sf_dir: str):
    """Exponentially weighted moving average (α = 0.2) of each user's
    event values, final smoothed level per user — the sequential
    recurrence sₜ = 0.8·sₜ₋₁ + 0.2·xₜ seeded at the first value.  The
    recurrence is order-dependent by definition, so the kernel applies
    it sequentially per user (users vectorize across the bucket; the
    oracle's list_reduce evaluates the identical float chain)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "n_events": pd.Series([], dtype="int64"),
                          "ewma": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "c": pa.array(cents, pa.int64())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(np.int64)
        v = df["c"].to_numpy(np.int64) / 100.0
        starts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]]))
        ends = np.append(starts[1:], len(uid))
        out_u, out_n, out_e = [], [], []
        for s, e in zip(starts, ends):
            acc = v[s]
            for x in v[s + 1:e]:
                acc = 0.8 * acc + 0.2 * x
            out_u.append(uid[s])
            out_n.append(e - s)
            out_e.append(
                float(np.sign(acc) * np.floor(abs(acc) * 1e6 + 0.5) / 1e6)
                + 0.0)
        return pd.DataFrame({"user_id": np.array(out_u, np.int64),
                             "n_events": np.array(out_n, np.int64),
                             "ewma": np.array(out_e, np.float64)})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_user)
    return _det_sort(as_arrow(out), ["user_id"])


def customer_decile_concentration(sf_dir: str):
    """Revenue concentration by customer decile: customers ranked into
    NTILE(10) by lifetime spend (deterministic (spend, custkey) order),
    each decile's headcount, exact revenue, and share of total — the
    concentration-curve BI report over a dimension-bounded aggregate."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import ntile_assign, partial_group_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    empty = pd.DataFrame({"decile": pd.Series([], dtype="int64"),
                          "n_customers": pd.Series([], dtype="int64"),
                          "revenue": pd.Series([], dtype="float64"),
                          "share": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"o_custkey": pc.cast(b.column("o_custkey"),
                                              pa.int64()),
                         "c": pa.array(c, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["o_custkey"], sum_cols=["c"],
                            combine="driver")
    ck = agg["o_custkey"].to_numpy(np.int64)
    m = agg["c"].to_numpy(np.int64)
    n = len(agg)
    order = np.lexsort((ck, m))
    ranks = np.empty(n, np.int64)
    ranks[order] = np.arange(n)
    dec = ntile_assign(np.full(n, n, np.int64), ranks, 10)
    df = pd.DataFrame({"decile": dec, "c": m})
    g = df.groupby("decile").agg(n_customers=("c", "size"),
                                 cc=("c", "sum")).reset_index()
    tot = np.int64(m.sum())
    cc = g["cc"].to_numpy(np.int64)
    share = (1.0 * cc) / tot
    return pd.DataFrame({
        "decile": g["decile"].astype("int64"),
        "n_customers": g["n_customers"].astype("int64"),
        "revenue": cc / 100.0,
        "share": np.floor(share * 1e6 + 0.5) / 1e6 + 0.0}) \
        .sort_values("decile").reset_index(drop=True)


def purchase_followup_counts(sf_dir: str):
    """Keyed interval join between two event streams: for each
    'purchase' event, how many events (any type) the same user emitted
    in the hour after it (strictly after, so the purchase itself and
    same-microsecond ties are excluded on both the engine and oracle
    side).  One user-keyed shuffle; inside a bucket the composite-key
    band trick (cf. orders_nearby_counts) answers every per-user window
    with two global searchsorteds — no per-user Python."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    WIN_US = 3_600_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        if not len(g):
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_follow": pd.Series([], dtype="int64")})
        codes = pd.factorize(g["user_id"])[0].astype(np.int64)
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        rel = us - us.min() + WIN_US + 1
        band = int(rel.max()) + WIN_US + 2
        comp = codes * band + rel
        purch = (g["event_type"] == "purchase").to_numpy()
        lo = np.searchsorted(comp, comp[purch], side="right")
        hi = np.searchsorted(comp, comp[purch] + WIN_US, side="right")
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[purch],
            "n_follow": (hi - lo).astype("int64")})

    return _det_sort(as_arrow(bucketed_group_apply(
        ds, "user_id", per_bucket)), "event_id")


def users_new_cumulative(sf_dir: str):
    """Cumulative distinct users by day: each user counts once, on the
    day of their FIRST event — per-batch (user, min-ts) partials keep
    the shuffle at user cardinality, the per-day counts are
    calendar-bounded, and the running total closes on the driver.
    Timestamps aggregate as int64 µs (a Ray timestamp groupby key
    downcasts µs→s)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Min

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "ts_us": pc.cast(b.column("ts"), pa.int64())})

    first = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                              ["user_id"], min_cols=["ts_us"],
                              combine="dataset")

    DAY_US = 86_400_000_000

    def to_day(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return pa.table({"day_us": pa.array([], pa.int64())})
        us = b.column("ts_us").to_numpy(zero_copy_only=False)
        return pa.table(
            {"day_us": pa.array((us // DAY_US) * DAY_US, pa.int64())})

    per_day = partial_group_agg(first.map_batches(to_day,
                                                  batch_format="pyarrow"),
                                ["day_us"], count_alias="new_users",
                                combine="driver")
    if per_day.empty:
        return pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[us]"),
            "new_users": pd.Series([], dtype="int64"),
            "cum_users": pd.Series([], dtype="int64")})
    per_day = per_day.sort_values("day_us").reset_index(drop=True)
    new = per_day["new_users"].astype("int64").to_numpy()
    return pd.DataFrame({
        "day": per_day["day_us"].astype("int64").astype("datetime64[us]"),
        "new_users": new,
        "cum_users": np.cumsum(new)})


def _event_type_histogram(sf_dir: str, type_a: str, type_b: str):
    """Shared kernel for the two-sample tests: the (cents-value →
    per-type count) histogram of two event types, combined on the
    driver in value order.  One scan, per-batch Arrow group_by
    partials; the driver holds only distinct-value rows (the
    histogram-reduction shape of doc_token_mad).  Returns a pandas
    frame (c, a, b) sorted by c, or None when either sample is empty."""
    import numpy as np

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def pre(b: pa.Table) -> pa.Table:
        t = b.column("event_type")
        keep = pc.or_(pc.equal(t, pa.scalar(type_a)),
                      pc.equal(t, pa.scalar(type_b)))
        b = b.filter(keep)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        is_a = pc.equal(b.column("event_type"), pa.scalar(type_a))
        a = is_a.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"c": pa.array(c, pa.int64()),
                         "a": pa.array(a, pa.int64()),
                         "b": pa.array(1 - a, pa.int64())})

    h = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["c"], sum_cols=["a", "b"], combine="driver")
    if h.empty or h["a"].sum() == 0 or h["b"].sum() == 0:
        return None
    return h.sort_values("c").reset_index(drop=True)


def events_value_ks(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov statistic between the value
    distributions of 'click' and 'purchase' events.  D =
    max |F₁(x) − F₂(x)| over the pooled support, computed EXACTLY as a
    rational: max |ca·n₂ − cb·n₁| / (n₁·n₂) from cumulative histogram
    counts — the float division happens once, on integers both sides
    agree on.  Distribution-shift detection for training-data streams."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame({"n_click": pd.Series([], dtype="int64"),
                          "n_purchase": pd.Series([], dtype="int64"),
                          "ks_num": pd.Series([], dtype="int64"),
                          "ks_stat": pd.Series([], dtype="float64")})
    h = _event_type_histogram(sf_dir, "click", "purchase")
    if h is None:
        return empty
    ca = h["a"].to_numpy(np.int64).cumsum()
    cb = h["b"].to_numpy(np.int64).cumsum()
    n1, n2 = int(ca[-1]), int(cb[-1])
    num = int(np.abs(ca * n2 - cb * n1).max())
    stat = np.floor((1.0 * num) / (n1 * n2) * 1e6 + 0.5) / 1e6 + 0.0
    return pd.DataFrame({"n_click": [n1], "n_purchase": [n2],
                         "ks_num": [num], "ks_stat": [stat]})


def events_mannwhitney_u(sf_dir: str):
    """Mann–Whitney U (rank-sum) test statistic between 'click' and
    'purchase' event values, with midrank tie handling — from the same
    one-scan value histogram as the KS test.  2·R₁ stays integer
    (2·avg-rank of a tied value = 2·count-before + tie-size + 1), so
    U = (2R₁ − n₁(n₁+1))/2 is exact to the half — no float rank sums."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame({"n_click": pd.Series([], dtype="int64"),
                          "n_purchase": pd.Series([], dtype="int64"),
                          "u2": pd.Series([], dtype="int64"),
                          "u": pd.Series([], dtype="float64")})
    h = _event_type_histogram(sf_dir, "click", "purchase")
    if h is None:
        return empty
    a = h["a"].to_numpy(np.int64)
    b = h["b"].to_numpy(np.int64)
    cnt = a + b
    before = np.concatenate([[0], cnt.cumsum()[:-1]])
    n1, n2 = int(a.sum()), int(b.sum())
    r2 = int((a * (2 * before + cnt + 1)).sum())  # 2·R1, exact
    u2 = r2 - n1 * (n1 + 1)
    return pd.DataFrame({"n_click": [n1], "n_purchase": [n2],
                         "u2": [np.int64(u2)], "u": [u2 / 2.0]})


def user_modal_hour(sf_dir: str):
    """Each user's modal hour-of-day (most events; ties → smallest
    hour) — the grouped-mode operator.  Two partial-pushed exchanges,
    both at bounded cardinality: (user, hour) counts, then a per-user
    max over the composite count·64 + (63 − hour) — the argmax rides
    the aggregate, no per-user sort or row_number pass."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "modal_hour": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    HOUR_US = 3_600_000_000

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "hr": pa.array((us // HOUR_US) % 24, pa.int64())})

    counts = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                               ["user_id", "hr"], count_alias="n",
                               combine="dataset")

    def to_comp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "comp": pa.array([], pa.int64())})
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        hr = b.column("hr").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": b.column("user_id"),
                         "comp": pa.array(n * 64 + (63 - hr), pa.int64())})

    best = partial_group_agg(counts.map_batches(to_comp,
                                                batch_format="pyarrow"),
                             ["user_id"], max_cols=["comp"],
                             combine="driver")
    comp = best["comp"].to_numpy(np.int64)
    return pd.DataFrame({"user_id": best["user_id"].astype("int64"),
                         "modal_hour": 63 - comp % 64,
                         "n": comp // 64}) \
        .sort_values("user_id").reset_index(drop=True)


def user_value_cusum(sf_dir: str):
    """Per-user CUSUM change detection: Sₜ = max(0, Sₜ₋₁ + (xₜ − μ))
    over the user's event values in time order, counting alarms where
    Sₜ exceeds $250.  The recurrence closes WITHOUT sequential state via
    the prefix identity Sₜ = Cₜ − min(0, min_{j≤t} Cⱼ); scaling by the
    user's n keeps everything integer (n·(x−μ) = n·c − Σc in cents), so
    the alarm predicate is exact: S'ₜ > n·25000.  One user-keyed
    shuffle; cumsum/cummin are vectorized pandas group scans."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    THRESH_C = 25_000  # $250 in cents

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "n_alarms": pd.Series([], dtype="int64")})
        if not len(g):
            return out_empty
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable")
        grp = g.groupby("user_id", sort=False)["c"]
        n = grp.transform("size").to_numpy(np.int64)
        sc = grp.transform("sum").to_numpy(np.int64)
        d = pd.Series(n * g["c"].to_numpy(np.int64) - sc,
                      index=g.index)
        cum = d.groupby(g["user_id"], sort=False).cumsum()
        runmin = cum.groupby(g["user_id"], sort=False).cummin() \
            .clip(upper=0)
        alarm = (cum - runmin) > n * THRESH_C
        res = pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64),
                            "alarm": alarm.to_numpy()})
        agg = res.groupby("user_id", sort=False).agg(
            n_events=("alarm", "size"), n_alarms=("alarm", "sum"))
        return agg.reset_index().astype({"n_events": "int64",
                                         "n_alarms": "int64"})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_bucket)
    return _det_sort(as_arrow(out), "user_id")


def docs_weighted_sample(sf_dir: str):
    """Weighted systematic sampling of the corpus (k = 50 draws,
    weight = token count) — the deterministic mixture-sampling
    primitive of training-data curation.  Each doc owns the cumulative
    token interval [cum−w, cum) in doc_id order; draw i lands at
    position (2i+1)·W/(2k), and a doc's multiplicity is f(cum) −
    f(cum−w) with f(x) = clamp(⌈(2k·x − W)/(2W)⌉, 0, k) — all integer
    arithmetic, both sides identical.  The global prefix sum is the
    distributed scan (util.global_ordered_cumsum), not a sort."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import global_ordered_cumsum

    K2 = 100  # 2k, k = 50 draws

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "weight": pd.Series([], dtype="int64"),
                          "times_selected": pd.Series([], dtype="int64")})

    def tok(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import token_count

        n = [token_count(t) for t in b.column("text").to_pylist()]
        return pa.table({"doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                         "w": pa.array(n, pa.int64())})

    # token counts feed two passes (total weight + prefix scan):
    # materialize the tiny two-int-column projection once
    tokds = ds.map_batches(tok, batch_format="pyarrow").materialize()
    cum = global_ordered_cumsum(tokds, "doc_id", "w")
    if cum is None:
        return empty
    from elevant_ray.stages.util import np_columns

    wparts = np_columns(tokds.map_batches(
        lambda b: pa.table({"s": pa.array(
            [int(pc.sum(b.column("w")).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow"), ["s"])["s"]
    W = int(wparts.sum())
    if W == 0:
        return empty

    def pick(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.int64()),
                             "times_selected": pa.array([], pa.int64())})
        c = np.asarray(b.column("cum").to_numpy(zero_copy_only=False),
                       np.int64)
        w = np.asarray(b.column("w").to_numpy(zero_copy_only=False),
                       np.int64)

        def f(x):
            return np.clip((K2 * x + W - 1) // (2 * W), 0, K2 // 2)

        times = f(c) - f(c - w)
        t = pa.table({"doc_id": b.column("doc_id"),
                      "weight": pa.array(w, pa.int64()),
                      "times_selected": pa.array(times, pa.int64())})
        return t.filter(pc.greater_equal(t.column("times_selected"),
                                         pa.scalar(1)))

    from elevant_ray.stages.util import as_arrow

    return _det_sort(as_arrow(cum).map_batches(pick,
                                               batch_format="pyarrow"),
                     "doc_id")


def events_type_anova(sf_dir: str):
    """One-way ANOVA F statistic of event value across ALL event types
    (the k-group generalization of the Welch shape): per-type exact
    integer moment partials (n, Σc, Σc²) from one scan, the
    between/within sum-of-squares closure on the driver in the
    identical float expression the oracle evaluates.  Σc² stays below
    2^53 through sf10 at this value scale."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])
    empty = pd.DataFrame({"k_groups": pd.Series([], dtype="int64"),
                          "n_total": pd.Series([], dtype="int64"),
                          "f_stat": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"event_type": b.column("event_type"),
                         "s": pa.array(c, pa.int64()),
                         "q": pa.array(c * c, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["event_type"], sum_cols=["s", "q"],
                          count_alias="n", combine="driver")
    if g.empty:
        return empty
    g = g.sort_values("event_type").reset_index(drop=True)
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    q = g["q"].to_numpy(np.int64)
    k, nn, gg = len(g), int(n.sum()), int(s.sum())
    if k < 2 or nn <= k:
        return empty
    # identical float expression as the oracle ((1.0·s)·s avoids the
    # int64 s² overflow both sides)
    ssb = float(((1.0 * s) * s / n).sum()) - ((1.0 * gg) * gg) / nn
    ssw = float((1.0 * q - ((1.0 * s) * s) / n).sum())
    if not ssw > 0:
        return empty
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    f6 = float(np.sign(f) * np.floor(np.abs(f) * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"k_groups": [np.int64(k)],
                         "n_total": [np.int64(nn)], "f_stat": [f6]})


def orders_ship_busdays(sf_dir: str):
    """Business days (Mon–Fri) between order date and ship date,
    aggregated per return flag — calendar arithmetic over a fact-fact
    join.  busdays(a, b) = f(b) − f(a) with f(d) = 5·⌊(d+3)/7⌋ +
    min((d+3) mod 7, 5) on epoch days (the +3 aligns Monday to 0), an
    all-integer closed form both sides evaluate identically — no
    per-row calendar walk.  The orders side folds into the lineitem
    scan as a broadcast key→day lookup under the cutoff, co-group join
    beyond (the q8/q9 gating)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (IntKeyMap, cogroup_join,
                                         np_columns, partial_group_agg,
                                         scale_cutoff)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_shipdate", "l_returnflag"])
    empty = pd.DataFrame({"l_returnflag": pd.Series([], dtype="object"),
                          "n_lines": pd.Series([], dtype="int64"),
                          "total_busdays": pd.Series([], dtype="int64"),
                          "avg_busdays": pd.Series([], dtype="float64")})
    if line.count() == 0 or orders.count() == 0:
        return empty

    def wdays(d):
        # weekdays strictly before epoch-day d (1970-01-01 is Thursday)
        return 5 * ((d + 3) // 7) + np.minimum((d + 3) % 7, 5)

    if orders.size_bytes() <= scale_cutoff(64 << 20):
        o = np_columns(orders, ["o_orderkey", "o_orderdate"])
        od = o["o_orderdate"].astype("datetime64[D]").astype(np.int64)
        omap = IntKeyMap(o["o_orderkey"], od)

        def fold(b: pa.Table) -> pa.Table:
            sd = b.column("l_shipdate").to_numpy(
                zero_copy_only=False).astype("datetime64[D]").astype(
                np.int64)
            odv, found = omap.take(
                b.column("l_orderkey").to_numpy(zero_copy_only=False))
            bus = wdays(sd) - wdays(np.asarray(odv, np.int64))
            return pa.table({"l_returnflag": b.column("l_returnflag"),
                             "busdays": pa.array(bus, pa.int64())}) \
                .filter(pa.array(found))

        bd = line.map_batches(fold, batch_format="pyarrow")
    else:
        def l_pre(b: pa.Table) -> pa.Table:
            sd = b.column("l_shipdate").to_numpy(
                zero_copy_only=False).astype("datetime64[D]").astype(
                np.int64)
            return pa.table({"l_orderkey": b.column("l_orderkey"),
                             "sd": pa.array(sd, pa.int64()),
                             "l_returnflag": b.column("l_returnflag")})

        def o_pre(b: pa.Table) -> pa.Table:
            od = b.column("o_orderdate").to_numpy(
                zero_copy_only=False).astype("datetime64[D]").astype(
                np.int64)
            return pa.table({"l_orderkey": b.column("o_orderkey"),
                             "od": pa.array(od, pa.int64())})

        j = cogroup_join(
            line.map_batches(l_pre, batch_format="pyarrow"),
            orders.map_batches(o_pre, batch_format="pyarrow"),
            on="l_orderkey",
            left_schema=pa.schema([("l_orderkey", pa.int64()),
                                   ("sd", pa.int64()),
                                   ("l_returnflag", pa.string())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("od", pa.int64())]))

        def fin(b: pa.Table) -> pa.Table:
            sd = b.column("sd").to_numpy(zero_copy_only=False)
            od = b.column("od").to_numpy(zero_copy_only=False)
            return pa.table({"l_returnflag": b.column("l_returnflag"),
                             "busdays": pa.array(wdays(sd) - wdays(od),
                                                 pa.int64())})

        bd = j.map_batches(fin, batch_format="pyarrow")

    agg = partial_group_agg(bd, ["l_returnflag"], sum_cols=["busdays"],
                            count_alias="n_lines", combine="driver")
    if agg.empty:
        return empty
    agg = agg.sort_values("l_returnflag").reset_index(drop=True)
    tot = agg["busdays"].to_numpy(np.int64)
    nl = agg["n_lines"].to_numpy(np.int64)
    avg = (1.0 * tot) / nl
    return pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "n_lines": nl,
        "total_busdays": tot,
        "avg_busdays": np.sign(avg) * np.floor(np.abs(avg) * 1e6 + 0.5)
        / 1e6 + 0.0})


def lang_token_js_divergence(sf_dir: str):
    """Jensen–Shannon divergence between the unigram token
    distributions of the English and German sub-corpora — the
    corpus-mixture distance used to compare training-data sources.
    One scan emits per-batch (token, per-lang count) partials; the
    driver holds only the vocabulary.  Per-token contributions use the
    same guarded log2 expression as the oracle; the final sum rounds
    to 6 (the term set is identical both sides, so only last-ULP sum
    order differs)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    LA, LB = "en", "de"

    ds = _read(sf_dir, "documents", ["lang", "text"])
    empty = pd.DataFrame({"n_en": pd.Series([], dtype="int64"),
                          "n_de": pd.Series([], dtype="int64"),
                          "n_tokens": pd.Series([], dtype="int64"),
                          "jsd": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import unigrams

        toks, isa = [], []
        for lang, text in zip(b.column("lang").to_pylist(),
                              b.column("text").to_pylist()):
            if lang not in (LA, LB):
                continue
            ts = unigrams(text)
            toks.extend(ts)
            isa.extend([1 if lang == LA else 0] * len(ts))
        a = np.asarray(isa, np.int64)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "a": pa.array(a, pa.int64()),
                         "b": pa.array(1 - a, pa.int64())})

    h = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["token"], sum_cols=["a", "b"],
                          combine="driver")
    if h.empty:
        return empty
    h = h.sort_values("token").reset_index(drop=True)
    a = h["a"].to_numpy(np.int64)
    b = h["b"].to_numpy(np.int64)
    A, B = int(a.sum()), int(b.sum())
    if A == 0 or B == 0:
        return empty
    pa_ = (1.0 * a) / A
    pb_ = (1.0 * b) / B
    with np.errstate(divide="ignore", invalid="ignore"):
        ta = np.where(a > 0, 0.5 * pa_ * np.log2(2.0 * pa_ / (pa_ + pb_)),
                      0.0)
        tb = np.where(b > 0, 0.5 * pb_ * np.log2(2.0 * pb_ / (pa_ + pb_)),
                      0.0)
    jsd = float((ta + tb).sum())
    return pd.DataFrame({
        "n_en": [np.int64(A)], "n_de": [np.int64(B)],
        "n_tokens": [np.int64(len(h))],
        "jsd": [float(np.floor(jsd * 1e6 + 0.5) / 1e6) + 0.0]})


def user_runs_test(sf_dir: str):
    """Wald–Wolfowitz runs count per user: each event is above or
    below the user's own mean value, and a run is a maximal same-side
    block in time order.  The above/below predicate is exact integer
    (n·c > Σc — no float mean), the transition count is a vectorized
    shift-compare inside one user-keyed shuffle."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "n_above": pd.Series([], dtype="int64"),
            "n_below": pd.Series([], dtype="int64"),
            "runs": pd.Series([], dtype="int64")})
        if not len(g):
            return out_empty
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        grp = g.groupby("user_id", sort=False)["c"]
        n = grp.transform("size").to_numpy(np.int64)
        sc = grp.transform("sum").to_numpy(np.int64)
        ab = n * c > sc
        same_user = np.concatenate([[False], uid[1:] == uid[:-1]])
        trans = same_user & np.concatenate([[False], ab[1:] != ab[:-1]])
        res = pd.DataFrame({"user_id": uid, "ab": ab, "trans": trans})
        agg = res.groupby("user_id", sort=False).agg(
            n_above=("ab", "sum"), n=("ab", "size"),
            transitions=("trans", "sum")).reset_index()
        return pd.DataFrame({
            "user_id": agg["user_id"].astype("int64"),
            "n_above": agg["n_above"].astype("int64"),
            "n_below": (agg["n"] - agg["n_above"]).astype("int64"),
            "runs": (1 + agg["transitions"]).astype("int64")})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_bucket)
    return _det_sort(as_arrow(out), "user_id")


def nation_supply_hhi(sf_dir: str):
    """Herfindahl–Hirschman concentration of supplier revenue within
    each nation: HHI = Σ(share²) over suppliers, shares of exact
    1e-4-unit revenue.  Squares of per-supplier revenue outgrow int64
    (~sf1), so the driver closure uses arbitrary-precision Python ints
    (the oracle mirrors with HUGEINT) and converts to float exactly
    once for the division.  Per-supplier sums are dimension-bounded —
    one partial-pushed exchange."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    line = _read(sf_dir, "lineitem",
                 ["l_suppkey", "l_extendedprice", "l_discount"])
    empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                          "n_suppliers": pd.Series([], dtype="int64"),
                          "hhi": pd.Series([], dtype="float64")})
    if line.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"l_suppkey": pc.cast(b.column("l_suppkey"),
                                              pa.int64()),
                         "rev": pa.array(_rev_cents(b), pa.int64())})

    per_supp = partial_group_agg(
        line.map_batches(pre, batch_format="pyarrow"),
        ["l_suppkey"], sum_cols=["rev"], combine="driver")
    if per_supp.empty:
        return empty
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}
    j = per_supp.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    rows = []
    for nk, grp in j.groupby("s_nationkey"):
        revs = [int(r) for r in grp["rev"]]
        tot = sum(revs)
        if tot <= 0:
            continue
        ssq = sum(r * r for r in revs)
        hhi = (1.0 * ssq) / ((1.0 * tot) * (1.0 * tot))
        rows.append((nation[int(nk)], len(revs),
                     float(np.floor(hhi * 1e6 + 0.5) / 1e6) + 0.0))
    out = pd.DataFrame(rows, columns=["n_name", "n_suppliers", "hhi"])
    return out.astype({"n_suppliers": "int64"}) \
        .sort_values("n_name").reset_index(drop=True)


def user_value_interp_hourly(sf_dir: str):
    """Time-series resampling with LINEAR interpolation: each user's
    event values resampled onto an hourly grid between their first and
    last event.  Events deduped per (user, µs) by lowest event_id, then
    each grid point t in [t₁, t₂) interpolates c₁ + (c₂−c₁)·(t−t₁)/
    (t₂−t₁) — the identical float expression the oracle's interval
    join evaluates, from integer µs/cents inputs.  One user-keyed
    shuffle; grid points resolve with two searchsorteds per bucket, no
    per-user Python.  Headroom: the composite key is users-per-bucket
    × span-µs, safe while that product stays under 2^63 (≈42k users
    per bucket on a 7-year corpus — raise `buckets` beyond sf1000)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    HOUR_US = 3_600_000_000

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "t_us": pd.Series([], dtype="int64"),
            "value_interp": pd.Series([], dtype="float64")})
        if not len(g):
            return out_empty
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable") \
            .drop_duplicates(["user_id", "us"], keep="first")
        uid = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        starts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]]))
        ends = np.append(starts[1:], len(uid))
        # per-user grid bounds: ceil(first/H)·H .. floor(last/H)·H
        lo = -(-us[starts] // HOUR_US) * HOUR_US
        hi = (us[ends - 1] // HOUR_US) * HOUR_US
        counts = np.maximum((hi - lo) // HOUR_US + 1, 0)
        if counts.sum() == 0:
            return out_empty
        guser = np.repeat(np.arange(len(starts)), counts)
        offs = np.arange(int(counts.sum())) - np.repeat(
            np.concatenate([[0], counts.cumsum()[:-1]]), counts)
        t = lo[guser] + offs * HOUR_US
        # composite-key searchsorted: interval owning each grid point
        BAND = int(us.max() - us.min()) + HOUR_US + 2
        rel = us - us.min() + 1
        codes = np.int64(pd.factorize(uid)[0])
        comp = codes * BAND + rel
        trel = t - us.min() + 1
        tcomp = codes[starts][guser] * BAND + trel
        idx = np.searchsorted(comp, tcomp, side="right") - 1
        t1, t2 = us[idx], us[np.minimum(idx + 1, len(us) - 1)]
        c1, c2 = c[idx], c[np.minimum(idx + 1, len(us) - 1)]
        # points at exactly the last event: t == t1, formula yields c1;
        # guard the t2 == t1 division by treating those as exact hits
        exact = t == t1
        denom = np.where(t2 > t1, (t2 - t1).astype(np.float64), 1.0)
        v = np.where(
            exact, c1.astype(np.float64),
            c1 + (1.0 * (c2 - c1)) * (1.0 * (t - t1)) / denom)
        vi = v / 100.0
        vi = np.sign(vi) * np.floor(np.abs(vi) * 1e4 + 0.5) / 1e4 + 0.0
        return pd.DataFrame({"user_id": uid[starts][guser],
                             "t_us": t, "value_interp": vi})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_bucket)
    return _det_sort(as_arrow(out), ["user_id", "t_us"])


def lineitem_qty_chisq_uniform(sf_dir: str):
    """Chi-square goodness-of-fit of l_quantity against the uniform
    1..50 generator: χ² = Σ₅₀(50·obs_b − n)² / (50·n), the numerator an
    exact integer over ALL 50 bins (absent bins count, obs = 0), the
    single float division rounded at 6.  One scan, a 50-row bincount
    partial per batch."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "lineitem", ["l_quantity"])
    empty = pd.DataFrame({"n": pd.Series([], dtype="int64"),
                          "df": pd.Series([], dtype="int64"),
                          "chi2_num": pd.Series([], dtype="int64"),
                          "chi2": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        q = np.rint(b.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"bin": pa.array(q, pa.int64())})

    h = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["bin"], count_alias="obs", combine="driver")
    obs = np.zeros(51, np.int64)
    b = h["bin"].to_numpy(np.int64)
    keep = (b >= 1) & (b <= 50)
    obs[b[keep]] = h["obs"].to_numpy(np.int64)[keep]
    n = int(obs.sum())
    if n == 0:
        return empty
    num = int(((50 * obs[1:] - n) ** 2).sum())
    chi2 = (1.0 * num) / (50.0 * n)
    return pd.DataFrame({
        "n": [np.int64(n)], "df": [np.int64(49)],
        "chi2_num": [np.int64(num)],
        "chi2": [float(np.floor(chi2 * 1e6 + 0.5) / 1e6) + 0.0]})


def orders_iso_week(sf_dir: str):
    """Order counts and revenue per ISO week — the ISO-8601 week-date
    rollup (a week belongs to the year of its Thursday).  The engine
    derives (iso_year, iso_week) in closed form on epoch days: t =
    Thursday of the row's Mon-aligned week, iso_year = t's calendar
    year, week = (t − Jan 1 of that year)//7 + 1 — vectorized, no
    per-row calendar library.  Oracle: isoyear()/weekofyear()."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"iso_year": pd.Series([], dtype="int64"),
                          "iso_week": pd.Series([], dtype="int64"),
                          "n_orders": pd.Series([], dtype="int64"),
                          "revenue": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        t = d - (d + 3) % 7 + 3  # the ISO week's Thursday
        td = t.astype("datetime64[D]")
        ty = td.astype("datetime64[Y]")
        jan1 = ty.astype("datetime64[D]").astype(np.int64)
        iso_year = ty.astype(np.int64) + 1970
        iso_week = (t - jan1) // 7 + 1
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"iso_year": pa.array(iso_year, pa.int64()),
                         "iso_week": pa.array(iso_week, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["iso_year", "iso_week"], sum_cols=["c"],
                            count_alias="n_orders", combine="driver")
    agg = agg.sort_values(["iso_year", "iso_week"]).reset_index(drop=True)
    return pd.DataFrame({
        "iso_year": agg["iso_year"].astype("int64"),
        "iso_week": agg["iso_week"].astype("int64"),
        "n_orders": agg["n_orders"].astype("int64"),
        "revenue": agg["c"].to_numpy(np.int64) / 100.0})


def customer_mahalanobis(sf_dir: str):
    """Top-20 multivariate outliers by 2-D Mahalanobis distance over
    (account balance, lifetime spend) in whole dollars: sample
    covariance from exact integer moment partials (whole-dollar units
    keep Σy² in int64 through sf10), the 2×2 inverse folded into the
    closed form d² = (Syy·dx² − 2·Sxy·dx·dy + Sxx·dy²)/det — every
    float step mirrored in the oracle.  Customers without orders spend
    0 (left join)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    empty = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                          "bal": pd.Series([], dtype="int64"),
                          "spend": pd.Series([], dtype="int64"),
                          "d2": pd.Series([], dtype="float64")})
    if cust.count() == 0:
        return empty

    def o_pre(b: pa.Table) -> pa.Table:
        # whole-dollar rounding must be half-AWAY (SQL ROUND), not
        # np.rint's half-even — X.50 totals are common
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        y = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        return pa.table({"o_custkey": pc.cast(b.column("o_custkey"),
                                              pa.int64()),
                         "y": pa.array(y, pa.int64())})

    spend = partial_group_agg(
        orders.map_batches(o_pre, batch_format="pyarrow"),
        ["o_custkey"], sum_cols=["y"], combine="driver")

    def c_pre(b: pa.Table) -> pa.Table:
        v = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        x = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        return pa.table({"c_custkey": pc.cast(b.column("c_custkey"),
                                              pa.int64()),
                         "x": pa.array(x, pa.int64())})

    bal = pd.concat(
        [t.to_pandas() for t in cust.map_batches(
            c_pre, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")],
        ignore_index=True)
    df = bal.merge(spend, left_on="c_custkey", right_on="o_custkey",
                   how="left")
    x = df["x"].to_numpy(np.int64)
    y = np.nan_to_num(df["y"].to_numpy(np.float64)).astype(np.int64)
    n = len(df)
    if n < 3:
        return empty
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    sxy = int((x * y).sum())
    # identical float closure as the oracle
    vxx = (sxx - (1.0 * sx) * sx / n) / (n - 1)
    vyy = (syy - (1.0 * sy) * sy / n) / (n - 1)
    vxy = (sxy - (1.0 * sx) * sy / n) / (n - 1)
    det = vxx * vyy - vxy * vxy
    if not det > 0:
        return empty
    mx, my = (1.0 * sx) / n, (1.0 * sy) / n
    dx, dy = x - mx, y - my
    d2 = (vyy * dx * dx - 2.0 * vxy * dx * dy + vxx * dy * dy) / det
    d2 = np.floor(d2 * 1e6 + 0.5) / 1e6 + 0.0
    out = pd.DataFrame({"c_custkey": df["c_custkey"].astype("int64"),
                        "bal": x, "spend": y, "d2": d2})
    out = out.sort_values(["d2", "c_custkey"],
                          ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


def doc_sentence_stats(sf_dir: str):
    """Sentence segmentation stats per document: split on terminal
    punctuation runs followed by whitespace ('[.!?]+\\s+'), count
    non-empty segments and their mean character length — the
    readability-feature extraction stage (same RE2-compatible pattern
    class as docs_redact_numbers, so Python re and DuckDB
    regexp_split_to_array agree byte-for-byte on ASCII)."""
    import re

    import numpy as np

    SPLIT = re.compile(r"[.!?]+\s+")

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        ids, ns, mean = [], [], []
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            segs = [s for s in SPLIT.split(text) if s != ""]
            ids.append(doc_id)
            ns.append(len(segs))
            if segs:
                tot = sum(len(s) for s in segs)
                m = (1.0 * tot) / len(segs)
                mean.append(float(np.floor(m * 1e4 + 0.5) / 1e4) + 0.0)
            else:
                mean.append(None)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_sentences": pa.array(ns, pa.int64()),
                         "mean_sentence_chars": pa.array(mean,
                                                         pa.float64())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def events_value_rolling_std5(sf_dir: str):
    """Rolling sample standard deviation over each user's trailing
    5-event window (current + 4 preceding, time order) — the windowed
    second-moment operator.  Window sums of c and c² come from two
    prefix sums and a lagged subtraction (exact int64; n·Σc² and (Σc)²
    stay under 2^53 at this value scale), so the float closure is the
    identical expression the oracle's windowed sums feed."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "n_win": pd.Series([], dtype="int64"),
            "std5": pd.Series([], dtype="float64")})
        if not len(g):
            return out_empty
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        m = len(uid)
        starts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]]))
        ustart = np.repeat(starts, np.diff(np.append(starts, m)))
        i = np.arange(m)
        lo = np.maximum(i - 4, ustart)
        cs = np.cumsum(c)
        qs = np.cumsum(c * c)
        s = cs - np.where(lo > 0, cs[lo - 1], 0)
        q = qs - np.where(lo > 0, qs[lo - 1], 0)
        n = i - lo + 1
        with np.errstate(invalid="ignore", divide="ignore"):
            var = ((1.0 * n) * q - (1.0 * s) * s) / ((1.0 * n) * (n - 1))
            std = np.sqrt(var) / 100.0
        std = np.floor(std * 1e6 + 0.5) / 1e6 + 0.0
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "n_win": n.astype(np.int64),
            "std5": np.where(n >= 2, std, np.nan)})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_bucket)
    return _det_sort(as_arrow(out), "event_id")


def lang_confusion_matrix(sf_dir: str):
    """Confusion matrix of the stopword-vote language classifier
    against the labeled lang column: count and within-actual-language
    share per (actual, predicted) cell — the classifier-evaluation
    rollup.  One scan; cells are |langs|×3-bounded partials."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])
    empty = pd.DataFrame({"lang": pd.Series([], dtype="object"),
                          "lang_pred": pd.Series([], dtype="object"),
                          "n": pd.Series([], dtype="int64"),
                          "share": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import lang_guess

        return pa.table({
            "lang": b.column("lang"),
            "lang_pred": pa.array(
                [lang_guess(t) for t in b.column("text").to_pylist()],
                pa.string())})

    cells = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                              ["lang", "lang_pred"], count_alias="n",
                              combine="driver")
    tot = cells.groupby("lang")["n"].transform("sum").to_numpy(np.int64)
    n = cells["n"].to_numpy(np.int64)
    share = (1.0 * n) / tot
    out = pd.DataFrame({"lang": cells["lang"],
                        "lang_pred": cells["lang_pred"],
                        "n": n,
                        "share": np.floor(share * 1e6 + 0.5) / 1e6 + 0.0})
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def vocab_coverage_90(sf_dir: str):
    """Vocabulary coverage curve threshold: the smallest k such that
    the k most frequent unigrams cover ≥ 90% of all token occurrences
    (integer predicate 10·cum ≥ 9·total — no float quantile), plus the
    covered count — the tokenizer-vocabulary sizing question.  Per-batch
    token-count partials; the driver holds only the vocabulary."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["text"])
    empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "covered": pd.Series([], dtype="int64"),
                          "total": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import unigrams

        toks = []
        for t in b.column("text").to_pylist():
            toks.extend(unigrams(t))
        return pa.table({"token": pa.array(toks, pa.string())})

    h = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["token"], count_alias="c", combine="driver")
    if h.empty:
        return empty
    h = h.sort_values(["c", "token"], ascending=[False, True]) \
        .reset_index(drop=True)
    c = h["c"].to_numpy(np.int64)
    cum = np.cumsum(c)
    total = int(cum[-1])
    k = int(np.argmax(10 * cum >= 9 * total)) + 1
    return pd.DataFrame({"k": [np.int64(k)],
                         "covered": [np.int64(cum[k - 1])],
                         "total": [np.int64(total)]})


def part_supplier_kcore(sf_dir: str):
    """Bipartite k-core peeling of the part↔supplier graph: iteratively
    drop parts supplied by < 15 suppliers and suppliers carrying < 400
    parts until a fixpoint — the recommender-style "dense interaction
    core" cleaning pass.  Every node reports its in_core flag and
    fixpoint degree (0 if peeled), so the result is total.  Distinct
    edges dedupe as composite ints; under the cutoff the peel runs
    vectorized on the driver, beyond it each round is two degree
    partials + a broadcast-filtered semi-join (bounded rounds: each
    round removes ≥1 node or stops)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import np_columns, scale_cutoff

    K_PART, K_SUPP = 15, 400

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    empty = pd.DataFrame({"side": pd.Series([], dtype="object"),
                          "key": pd.Series([], dtype="int64"),
                          "in_core": pd.Series([], dtype="bool"),
                          "core_degree": pd.Series([], dtype="int64")})
    if line.count() == 0:
        return empty

    def edges(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        comp = np.unique((pk << 21) + sk)
        return pa.table({"comp": pa.array(comp, pa.int64())})

    eds = line.map_batches(edges, batch_format="pyarrow").materialize()

    def peel(comp: np.ndarray):
        comp = np.unique(comp)
        all_p = np.unique(comp >> 21)
        all_s = np.unique(comp & np.int64((1 << 21) - 1))
        while True:
            p = comp >> 21
            s = comp & np.int64((1 << 21) - 1)
            pu, pinv, pdeg = np.unique(p, return_inverse=True,
                                       return_counts=True)
            su, sinv, sdeg = np.unique(s, return_inverse=True,
                                       return_counts=True)
            keep = (pdeg[pinv] >= K_PART) & (sdeg[sinv] >= K_SUPP)
            if keep.all():
                return comp, all_p, all_s, pu, pdeg, su, sdeg
            comp = comp[keep]
            if not len(comp):
                return comp, all_p, all_s, \
                    np.array([], np.int64), np.array([], np.int64), \
                    np.array([], np.int64), np.array([], np.int64)

    if eds.size_bytes() <= scale_cutoff(256 << 20):
        comp = np_columns(eds, ["comp"])["comp"].astype(np.int64)
        comp, all_p, all_s, pu, pdeg, su, sdeg = peel(comp)
    else:
        # distributed peel: per-round degree partials + broadcast
        # survivor filters; node sets are dimension-bounded, only the
        # edge list stays distributed.  Per-batch np.unique in edges()
        # dedupes only locally — the degree counts need GLOBAL distinct
        # edges, so one shuffle dedupe comes first.
        import ray

        from elevant_ray.stages.util import partial_group_agg

        deduped = _distinct_int(eds, "comp", cutoff=0)
        import ray.data as rd

        if not hasattr(deduped, "map_batches"):
            deduped = rd.from_pandas(deduped)
        deduped = deduped.materialize()

        def node_partials(b: pa.Table) -> pa.Table:
            cv = b.column("comp").to_numpy(zero_copy_only=False)
            p = np.unique(cv >> 21)
            s = np.unique(cv & np.int64((1 << 21) - 1))
            n = max(len(p), len(s))
            return pa.table({
                "p": pa.array(np.concatenate(
                    [p, np.full(n - len(p), -1, np.int64)]), pa.int64()),
                "s": pa.array(np.concatenate(
                    [s, np.full(n - len(s), -1, np.int64)]), pa.int64())})

        uni = np_columns(deduped.map_batches(node_partials,
                                             batch_format="pyarrow"),
                         ["p", "s"])
        all_p = np.unique(uni["p"][uni["p"] >= 0])
        all_s = np.unique(uni["s"][uni["s"] >= 0])
        cur = deduped
        for _ in range(100):
            def split(b: pa.Table) -> pa.Table:
                cv = b.column("comp").to_numpy(zero_copy_only=False)
                return pa.table({
                    "comp": b.column("comp"),
                    "p": pa.array(cv >> 21, pa.int64()),
                    "s": pa.array(cv & ((1 << 21) - 1), pa.int64())})

            sp = cur.map_batches(split, batch_format="pyarrow") \
                .materialize()
            pdeg_df = partial_group_agg(sp, ["p"], count_alias="d",
                                        combine="driver")
            sdeg_df = partial_group_agg(sp, ["s"], count_alias="d",
                                        combine="driver")
            bad_p = pdeg_df[pdeg_df["d"] < K_PART]["p"].to_numpy(np.int64)
            bad_s = sdeg_df[sdeg_df["d"] < K_SUPP]["s"].to_numpy(np.int64)
            if not len(bad_p) and not len(bad_s):
                pu = pdeg_df["p"].to_numpy(np.int64)
                pdeg = pdeg_df["d"].to_numpy(np.int64)
                su = sdeg_df["s"].to_numpy(np.int64)
                sdeg = sdeg_df["d"].to_numpy(np.int64)
                order_p, order_s = np.argsort(pu), np.argsort(su)
                pu, pdeg = pu[order_p], pdeg[order_p]
                su, sdeg = su[order_s], sdeg[order_s]
                break
            bp = ray.put(np.sort(bad_p))
            bs = ray.put(np.sort(bad_s))

            def drop(b: pa.Table) -> pa.Table:
                import ray as _ray
                bpv, bsv = _ray.get(bp), _ray.get(bs)
                pv = b.column("p").to_numpy(zero_copy_only=False)
                sv = b.column("s").to_numpy(zero_copy_only=False)
                ok = ~(np.isin(pv, bpv) | np.isin(sv, bsv))
                return b.filter(pa.array(ok)).select(["comp", "p", "s"])

            cur = sp.map_batches(drop, batch_format="pyarrow")
        else:
            # a slow cascade can exceed the round cap; an empty-core
            # answer here would be silently WRONG, so fail loudly
            raise RuntimeError(
                "part_supplier_kcore: peel did not reach a fixpoint "
                "within 100 rounds; raise the cap for this graph")

    pmap = dict(zip(pu.tolist(), pdeg.tolist()))
    smap = dict(zip(su.tolist(), sdeg.tolist()))
    rows = []
    for k in all_p.tolist():
        d = pmap.get(k, 0)
        rows.append(("part", k, d > 0, d))
    for k in all_s.tolist():
        d = smap.get(k, 0)
        rows.append(("supplier", k, d > 0, d))
    out = pd.DataFrame(rows, columns=["side", "key", "in_core",
                                      "core_degree"])
    return out.astype({"key": "int64", "core_degree": "int64"}) \
        .sort_values(["side", "key"]).reset_index(drop=True)


def blocking_quality(sf_dir: str):
    """Blocking-stage quality metrics of the record-linkage flagship:
    pair completeness (candidate recall of the synthetic gold
    same-entity pairs) and reduction ratio (1 − candidates / all
    possible pairs) — the standard ER blocking evaluation
    (elevant's evaluation counters shape).  Candidate∩gold resolves
    through the same distributed full-outer pair join as pairwise_f1;
    sketch-derived, so rows-only for the driver (pytest covers the
    metric arithmetic)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.pipelines.record_linkage import (
        gold_pairs_from_doc_ids, prepare_pages)
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.dedup import lsh_candidate_pairs
    from elevant_ray.stages.evaluation import pairwise_f1

    if _read(sf_dir, "documents", ["doc_id"]).count() == 0:
        return pd.DataFrame({
            "n_pages": pd.Series([], dtype="int64"),
            "n_candidates": pd.Series([], dtype="int64"),
            "n_gold": pd.Series([], dtype="int64"),
            "n_hit": pd.Series([], dtype="int64"),
            "pair_completeness": pd.Series([], dtype="float64"),
            "reduction_ratio": pd.Series([], dtype="float64")})
    pages = prepare_pages(synth_pages(sf_dir, include_doc_id=True)) \
        .materialize()
    n_pages = pages.count()
    cand = lsh_candidate_pairs(pages, id_col="url", canon_col="canon",
                               num_partitions=_shuffle_parts())
    gold = gold_pairs_from_doc_ids(pages)
    m = pairwise_f1(cand, gold, num_partitions=_shuffle_parts())
    tp = m["true_positives"]
    fp = m["false_positives"]
    fn = m["false_negatives"]
    n_cand, n_gold = tp + fp, tp + fn
    all_pairs = n_pages * (n_pages - 1) // 2
    pc_ = (1.0 * tp) / n_gold if n_gold else 0.0
    rr = 1.0 - (1.0 * n_cand) / all_pairs if all_pairs else 0.0
    return pd.DataFrame({
        "n_pages": [np.int64(n_pages)],
        "n_candidates": [np.int64(n_cand)],
        "n_gold": [np.int64(n_gold)],
        "n_hit": [np.int64(tp)],
        "pair_completeness": [
            float(np.floor(pc_ * 1e6 + 0.5) / 1e6) + 0.0],
        "reduction_ratio": [
            float(np.floor(rr * 1e6 + 0.5) / 1e6) + 0.0]})


def nation_kendall_tau(sf_dir: str):
    """Kendall's τ-b rank correlation between customer account balance
    and lifetime spend, per nation — computed in O(n log n) via
    Knight's identity C−D = n₀−n₁−n₂+n₃−2·I (I = inversions of y after
    a lexicographic (x, y) sort, counted by bottom-up merge with
    vectorized searchsorted), NOT the O(n²) pair scan the oracle runs.
    All pair counts are exact integers; only the final τ division is
    float (identical expression both sides).  Property-tested against
    the brute-force pair count in tests/test_window_kernels.py."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import np_columns, partial_group_agg

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                          "n_pairs": pd.Series([], dtype="int64"),
                          "c_minus_d": pd.Series([], dtype="int64"),
                          "tau_b": pd.Series([], dtype="float64")})
    if cust.count() == 0:
        return empty

    def o_pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"o_custkey": pc.cast(b.column("o_custkey"),
                                              pa.int64()),
                         "y": pa.array(c, pa.int64())})

    spend = partial_group_agg(
        orders.map_batches(o_pre, batch_format="pyarrow"),
        ["o_custkey"], sum_cols=["y"], combine="driver")

    def c_pre(b: pa.Table) -> pa.Table:
        x = np.rint(b.column("c_acctbal")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"c_custkey": pc.cast(b.column("c_custkey"),
                                              pa.int64()),
                         "nk": pc.cast(b.column("c_nationkey"),
                                       pa.int64()),
                         "x": pa.array(x, pa.int64())})

    cols = np_columns(cust.map_batches(c_pre, batch_format="pyarrow"),
                      ["c_custkey", "nk", "x"])
    df = pd.DataFrame(cols).merge(spend, left_on="c_custkey",
                                  right_on="o_custkey", how="left")
    df["y"] = np.nan_to_num(df["y"].to_numpy(np.float64)).astype(np.int64)
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}

    from elevant_ray.stages.util import merge_inversions, tie_pair_count

    rows = []
    for nk, grp in df.groupby("nk"):
        x = grp["x"].to_numpy(np.int64)
        y = grp["y"].to_numpy(np.int64)
        n = len(x)
        if n < 2:
            continue
        order = np.lexsort((y, x))
        xs, ys = x[order], y[order]
        n0 = n * (n - 1) // 2
        n1 = tie_pair_count(xs, assume_sorted=True)
        n2 = tie_pair_count(ys)
        # ties in both: run lengths of consecutive equal (x, y) pairs
        # in the lexicographic order
        new = np.concatenate(
            [[True], (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])])
        sizes = np.diff(np.append(np.flatnonzero(new), n))
        n3 = int((sizes * (sizes - 1) // 2).sum())
        inv = merge_inversions(ys)
        cmd = n0 - n1 - n2 + n3 - 2 * inv
        den = (1.0 * (n0 - n1)) * (n0 - n2)
        if not den > 0:
            continue
        tau = (1.0 * cmd) / np.sqrt(den)
        rows.append((nation[int(nk)], n0, cmd,
                     float(np.sign(tau) * np.floor(np.abs(tau) * 1e6
                                                   + 0.5) / 1e6) + 0.0))
    out = pd.DataFrame(rows, columns=["n_name", "n_pairs", "c_minus_d",
                                      "tau_b"])
    return out.astype({"n_pairs": "int64", "c_minus_d": "int64"}) \
        .sort_values("n_name").reset_index(drop=True)


def daily_user_overlap(sf_dir: str):
    """Day-over-day active-user overlap: for each observed day, the
    Jaccard similarity between that day's distinct user set and the
    previous calendar day's — the churn/stability pulse.  Distinct
    (day, user) pairs reduce through per-batch partials; the driver
    holds only the user-day incidence (days × users bounded), and
    consecutive-day intersections are sorted-array intersects."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    DAY_US = 86_400_000_000

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    empty = pd.DataFrame({"day": pd.Series([], dtype="int64"),
                          "n_prev": pd.Series([], dtype="int64"),
                          "n_cur": pd.Series([], dtype="int64"),
                          "n_both": pd.Series([], dtype="int64"),
                          "jaccard": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"day": pa.array(us // DAY_US, pa.int64()),
                         "user_id": pc.cast(b.column("user_id"),
                                            pa.int64())})

    du = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                           ["day", "user_id"], count_alias="c",
                           combine="driver")
    du = du.sort_values(["day", "user_id"]).reset_index(drop=True)
    days = du["day"].to_numpy(np.int64)
    users = du["user_id"].to_numpy(np.int64)
    uds, starts = np.unique(days, return_index=True)
    ends = np.append(starts[1:], len(days))
    sets = {int(d): users[s:e] for d, s, e in zip(uds, starts, ends)}
    rows = []
    for d in uds.tolist():
        cur = sets[int(d)]
        prev = sets.get(int(d) - 1, np.array([], np.int64))
        nb = len(np.intersect1d(cur, prev, assume_unique=True))
        denom = len(prev) + len(cur) - nb
        j = (1.0 * nb) / denom if denom else 0.0
        rows.append((d, len(prev), len(cur), nb,
                     float(np.floor(j * 1e6 + 0.5) / 1e6) + 0.0))
    return pd.DataFrame(rows, columns=["day", "n_prev", "n_cur",
                                       "n_both", "jaccard"]) \
        .astype({"day": "int64", "n_prev": "int64", "n_cur": "int64",
                 "n_both": "int64"})


def gap_kaplan_meier(sf_dir: str):
    """Kaplan–Meier survival curve of time-to-next-event (seconds):
    every inter-event gap is an observed "death", each user's tail
    (corpus max timestamp − last event) is a censored observation, and
    S(t) steps down by (1 − d/n_at_risk) at each distinct death time.
    Survival multiplies via the windowed running product — np.cumprod
    and the oracle's product() OVER accumulate in the same ascending-t
    order.  One user-keyed shuffle for the gaps; the KM closure runs on
    the second-bounded (t, censored) histogram."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (bucketed_group_apply, np_columns,
                                         partial_group_agg)

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    empty = pd.DataFrame({"t_s": pd.Series([], dtype="int64"),
                          "d": pd.Series([], dtype="int64"),
                          "at_risk": pd.Series([], dtype="int64"),
                          "survival": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def us_col(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64())})

    evs = ds.map_batches(us_col, batch_format="pyarrow").materialize()
    mx_parts = np_columns(evs.map_batches(
        lambda b: pa.table({"m": pa.array(
            [int(pc.max(b.column("us")).as_py())]
            if b.num_rows else [], pa.int64())}),
        batch_format="pyarrow"), ["m"])["m"]
    MX = int(mx_parts.max())

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({"t_s": pd.Series([], dtype="int64"),
                                  "ev": pd.Series([], dtype="int64")})
        if not len(g):
            return out_empty
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        last = np.concatenate([uid[1:] != uid[:-1], [True]])
        gaps = (us[1:] - us[:-1])[~last[:-1]] // 1_000_000
        cens = (MX - us[last]) // 1_000_000
        return pd.DataFrame({
            "t_s": np.concatenate([gaps, cens]),
            "ev": np.concatenate([np.ones(len(gaps), np.int64),
                                  np.zeros(len(cens), np.int64)])})

    obs = bucketed_group_apply(evs, "user_id", per_bucket)
    h = partial_group_agg(obs, ["t_s", "ev"], count_alias="c",
                          combine="driver")
    if h.empty:
        return empty
    piv = h.pivot_table(index="t_s", columns="ev", values="c",
                        aggfunc="sum", fill_value=0)
    t = piv.index.to_numpy(np.int64)
    d = piv[1].to_numpy(np.int64) if 1 in piv.columns \
        else np.zeros(len(t), np.int64)
    tot = piv.sum(axis=1).to_numpy(np.int64)
    at_risk = tot[::-1].cumsum()[::-1]  # obs with time >= t
    keep = d > 0
    factor = 1.0 - (1.0 * d[keep]) / at_risk[keep]
    surv = np.cumprod(factor)
    return pd.DataFrame({
        "t_s": t[keep],
        "d": d[keep],
        "at_risk": at_risk[keep],
        "survival": np.floor(surv * 1e6 + 0.5) / 1e6 + 0.0})


def doc_char_entropy(sf_dir: str):
    """Character-level Shannon entropy per document (bits) — the
    classic gibberish/compressibility quality signal.  Per-doc char
    histograms stay inside the batch (no shuffle at all); the entropy
    terms use the identical p·log2(p) expression as the oracle, summed
    over ≤ charset-size terms and rounded at 6.  Empty documents have
    no distribution and are omitted (both sides)."""
    from collections import Counter

    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        ids, ns, ents = [], [], []
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            n = len(text)
            if n == 0:
                continue
            cnt = np.array(sorted(Counter(text).values()), np.int64)
            p = (1.0 * cnt) / n
            h = -float((p * np.log2(p)).sum())
            ids.append(doc_id)
            ns.append(n)
            ents.append(float(np.sign(h) * np.floor(abs(h) * 1e6 + 0.5)
                              / 1e6) + 0.0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_chars": pa.array(ns, pa.int64()),
                         "entropy": pa.array(ents, pa.float64())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def user_phase_value_means(sf_dir: str):
    """Early/mid/late behavior drift: each user's events split into
    time-order tertiles (SQL NTILE semantics via util.ntile_assign),
    average value per (user, phase) from exact cents — the lifecycle
    phase comparison.  One user-keyed shuffle, phases assigned
    vectorized inside the bucket."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (as_arrow, bucketed_group_apply,
                                         ntile_assign)

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "phase": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "avg_value": pd.Series([], dtype="float64")})
        if not len(g):
            return out_empty
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        starts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]]))
        sizes_per_user = np.diff(np.append(starts, len(uid)))
        sizes = np.repeat(sizes_per_user, sizes_per_user)
        ranks = np.arange(len(uid)) - np.repeat(starts, sizes_per_user)
        phase = ntile_assign(sizes, ranks, 3)
        res = pd.DataFrame({"user_id": uid, "phase": phase, "c": c})
        agg = res.groupby(["user_id", "phase"], sort=False).agg(
            n=("c", "size"), sc=("c", "sum")).reset_index()
        avg = (1.0 * agg["sc"].to_numpy(np.int64)) \
            / agg["n"].to_numpy(np.int64) / 100.0
        return pd.DataFrame({
            "user_id": agg["user_id"].astype("int64"),
            "phase": agg["phase"].astype("int64"),
            "n": agg["n"].astype("int64"),
            "avg_value": np.floor(avg * 1e6 + 0.5) / 1e6 + 0.0})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_bucket)
    return _det_sort(as_arrow(out), ["user_id", "phase"])


def signup_to_purchase_latency(sf_dir: str):
    """Activation latency: seconds from each user's FIRST signup to
    their first purchase at-or-after it, summarized as user count +
    exact p50/p90 (percentile_disc over the second-bounded histogram —
    stages/quantiles.py, no sort).  Users without a signup or without
    a qualifying purchase drop out."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.quantiles import grouped_quantiles
    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    empty = pd.DataFrame({"n_users": pd.Series([], dtype="int64"),
                          "p50_s": pd.Series([], dtype="int64"),
                          "p90_s": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        t = b.column("event_type")
        keep = pc.or_(pc.equal(t, pa.scalar("signup")),
                      pc.equal(t, pa.scalar("purchase")))
        b = b.filter(keep)
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "us": pa.array(us, pa.int64()),
                         "is_signup": pc.equal(b.column("event_type"),
                                               pa.scalar("signup"))})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({"lat_s": pd.Series([], dtype="int64")})
        if not len(g):
            return out_empty
        sg = g[g["is_signup"]].groupby("user_id")["us"].min()
        pu = g[~g["is_signup"]][["user_id", "us"]].merge(
            sg.rename("s0"), left_on="user_id", right_index=True)
        pu = pu[pu["us"] >= pu["s0"]]
        if not len(pu):
            return out_empty
        first = pu.groupby("user_id").agg(us=("us", "min"),
                                          s0=("s0", "first"))
        lat = (first["us"].to_numpy(np.int64)
               - first["s0"].to_numpy(np.int64)) // 1_000_000
        return pd.DataFrame({"lat_s": lat})

    lats = bucketed_group_apply(ds.map_batches(pre,
                                               batch_format="pyarrow"),
                                "user_id", per_bucket)
    from elevant_ray.stages.util import as_arrow

    lats = as_arrow(lats)
    q = grouped_quantiles(lats, "lat_s", (0.5, 0.9)).to_pandas()
    if q.empty:
        return empty
    n = lats.count()
    p = {r["q"]: int(r["lat_s"]) for _, r in q.iterrows()}
    return pd.DataFrame({"n_users": [np.int64(n)],
                         "p50_s": [np.int64(p[0.5])],
                         "p90_s": [np.int64(p[0.9])]})


def supplier_neighborhood_jaccard(sf_dir: str):
    """Top-50 supplier pairs by Jaccard similarity of their part
    neighborhoods — set-similarity join over the bipartite graph:
    J(a, b) = |parts(a) ∩ parts(b)| / (deg a + deg b − common).  Pair
    commons reuse the co-occurrence kernel (util.within_group_pairs)
    under the driver cutoff (cf. parts_cosupply_top_pairs for the
    bucketed scale path); ranking is by the ROUNDED score with (s1,
    s2) tie-break, so the oracle's ORDER BY matches bit-for-bit."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (bucketed_group_apply, np_columns,
                                         partial_group_agg, scale_cutoff,
                                         within_group_pairs)

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    empty = pd.DataFrame({"s1": pd.Series([], dtype="int64"),
                          "s2": pd.Series([], dtype="int64"),
                          "common_parts": pd.Series([], dtype="int64"),
                          "jaccard": pd.Series([], dtype="float64")})
    if line.count() == 0:
        return empty

    mask = np.int64((1 << 21) - 1)

    def edges(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        comp = np.unique((pk << 21) + sk)
        return pa.table({"part": pa.array(comp >> 21, pa.int64()),
                         "comp": pa.array(comp, pa.int64())})

    eds = line.map_batches(edges, batch_format="pyarrow").materialize()

    def pair_counts(comp: np.ndarray) -> pd.DataFrame:
        comp = np.unique(comp)
        part = comp >> 21
        starts = np.flatnonzero(
            np.concatenate([[True], part[1:] != part[:-1]]))
        sizes = np.diff(np.append(starts, len(part)))
        i, j = within_group_pairs(starts, sizes)
        pair = ((comp[i] & mask) << 21) + (comp[j] & mask)
        up, c = np.unique(pair, return_counts=True)
        return pd.DataFrame({"pair": up, "c": c.astype(np.int64)})

    if eds.size_bytes() <= scale_cutoff(256 << 20):
        comp = np.unique(np_columns(eds, ["comp"])["comp"]
                         .astype(np.int64))
        agg = pair_counts(comp)
        su, sdeg = np.unique(comp & mask, return_counts=True)
    else:
        # the per-batch np.unique in edges() is only a LOCAL dedup:
        # both the degree counts and the pair counts need globally
        # distinct edges, so one shuffle dedupe comes first (the
        # part_supplier_kcore lesson — per-batch unique overcounts)
        deduped = _distinct_int(eds, "comp", cutoff=0)
        import ray.data as rd

        if not hasattr(deduped, "map_batches"):
            deduped = rd.from_pandas(deduped)

        def re_part(b: pa.Table) -> pa.Table:
            cv = b.column("comp").to_numpy(zero_copy_only=False)
            return pa.table({"part": pa.array(cv >> 21, pa.int64()),
                             "comp": b.column("comp")})

        deduped = deduped.map_batches(re_part, batch_format="pyarrow") \
            .materialize()
        parts_df = bucketed_group_apply(
            deduped, "part",
            lambda g: pair_counts(g["comp"].to_numpy(np.int64)))
        agg = partial_group_agg(parts_df, ["pair"], sum_cols=["c"],
                                combine="driver")
        deg = partial_group_agg(
            deduped.map_batches(
                lambda b: pa.table({
                    "s": pa.array(
                        b.column("comp").to_numpy(zero_copy_only=False)
                        & mask, pa.int64())}),
                batch_format="pyarrow"),
            ["s"], count_alias="d", combine="driver")
        su = deg["s"].to_numpy(np.int64)
        sdeg = deg["d"].to_numpy(np.int64)
        order = np.argsort(su)
        su, sdeg = su[order], sdeg[order]
    if agg.empty:
        return empty
    pairv = agg["pair"].to_numpy(np.int64)
    common = agg["c"].to_numpy(np.int64)
    s1 = pairv >> 21
    s2 = pairv & mask
    d1 = sdeg[np.searchsorted(su, s1)]
    d2 = sdeg[np.searchsorted(su, s2)]
    j = (1.0 * common) / (d1 + d2 - common)
    j6 = np.floor(j * 1e6 + 0.5) / 1e6 + 0.0
    out = pd.DataFrame({"s1": s1, "s2": s2, "common_parts": common,
                        "jaccard": j6})
    out = out.sort_values(["jaccard", "s1", "s2"],
                          ascending=[False, True, True]).head(50)
    return out.reset_index(drop=True)


def nation_balance_qq(sf_dir: str):
    """Q–Q comparison of two nations' customer balance distributions:
    exact percentile_disc at each decile for nation 0 vs nation 1 —
    the distribution-shift diagnostic as quantile pairs.  Both sides
    come from ONE grouped histogram pass (stages/quantiles.py), no
    sort."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.quantiles import grouped_quantiles

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    empty = pd.DataFrame({"q": pd.Series([], dtype="float64"),
                          "bal_n0": pd.Series([], dtype="float64"),
                          "bal_n1": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        nk = pc.cast(b.column("c_nationkey"), pa.int64())
        keep = pc.or_(pc.equal(nk, pa.scalar(0, pa.int64())),
                      pc.equal(nk, pa.scalar(1, pa.int64())))
        b2 = pa.table({"nk": nk, "bal": b.column("c_acctbal")})
        b2 = b2.filter(keep)
        c = np.rint(b2.column("bal")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"nk": b2.column("nk"),
                         "c": pa.array(c, pa.int64())})

    QS = tuple(i / 10 for i in range(1, 10))
    q = grouped_quantiles(ds.map_batches(pre, batch_format="pyarrow"),
                          "c", QS, group_cols=["nk"]).to_pandas()
    if q.empty:
        return empty
    piv = q.pivot(index="q", columns="nk", values="c")
    if 0 not in piv.columns or 1 not in piv.columns:
        return empty
    return pd.DataFrame({
        "q": piv.index.to_numpy(np.float64),
        "bal_n0": piv[0].to_numpy(np.int64) / 100.0,
        "bal_n1": piv[1].to_numpy(np.int64) / 100.0}) \
        .sort_values("q").reset_index(drop=True)


def event_type_cosine(sf_dir: str):
    """Cosine similarity between event types over the per-user
    engagement space: each type is a vector of per-user counts, and
    cos(a, b) = Σᵤ cₐcᵦ / (‖a‖·‖b‖) measures co-engagement.  The
    (user, type) count matrix reduces through partials; the 5×5 gram
    closes on the driver in exact ints, one float division per pair
    (identical expression as the oracle's pairwise join)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    empty = pd.DataFrame({"t1": pd.Series([], dtype="object"),
                          "t2": pd.Series([], dtype="object"),
                          "dot": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    counts = partial_group_agg(ds, ["user_id", "event_type"],
                               count_alias="c", combine="driver")
    piv = counts.pivot_table(index="user_id", columns="event_type",
                             values="c", aggfunc="sum", fill_value=0)
    types = sorted(piv.columns.tolist())
    m = piv[types].to_numpy(np.int64)
    rows = []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            dot = int((m[:, i] * m[:, j]).sum())
            na = int((m[:, i] * m[:, i]).sum())
            nb = int((m[:, j] * m[:, j]).sum())
            if na == 0 or nb == 0:
                continue
            cos = (1.0 * dot) / (np.sqrt(1.0 * na) * np.sqrt(1.0 * nb))
            rows.append((types[i], types[j], dot,
                         float(np.floor(cos * 1e6 + 0.5) / 1e6) + 0.0))
    return pd.DataFrame(rows, columns=["t1", "t2", "dot", "cosine"]) \
        .astype({"dot": "int64"})


def part_name_token_pairs(sf_dir: str):
    """String set-similarity join on part names: the 100 part pairs
    sharing the most distinct name tokens (≥ 2 shared), tie-broken by
    keys — the schema-matching / near-duplicate-name shape.  The
    token→part inverted index feeds the same vectorized pair kernel as
    co-occurrence mining (util.within_group_pairs) after factorizing
    tokens to dense ints; token posting lists are capped like real ER
    blockers cap frequent keys (none hit the 2^21 part-id bound here,
    cf. parts_cosupply layout)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (np_columns, within_group_pairs)

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    empty = pd.DataFrame({"p1": pd.Series([], dtype="int64"),
                          "p2": pd.Series([], dtype="int64"),
                          "common_tokens": pd.Series([], dtype="int64")})
    if part.count() == 0:
        return empty

    def tok(b: pa.Table) -> pa.Table:
        ks, ts = [], []
        for k, name in zip(b.column("p_partkey").to_pylist(),
                           b.column("p_name").to_pylist()):
            for t in set(name.split(" ")):
                if t:
                    ks.append(k)
                    ts.append(t)
        return pa.table({"pk": pa.array(ks, pa.int64()),
                         "tok": pa.array(ts, pa.string())})

    # part names are a dimension table: the (token, part) postings fit
    # the driver (the bucketed fallback would key by token, exactly the
    # parts_cosupply scale path)
    cols = np_columns(part.map_batches(tok, batch_format="pyarrow"),
                      ["pk", "tok"])
    codes, _ = pd.factorize(cols["tok"])
    pk = cols["pk"].astype(np.int64)
    pkarr = np.unique(pk)
    P, V = len(pkarr), int(codes.max()) + 1 if len(codes) else 1

    from elevant_ray.stages.util import scale_cutoff

    if V <= 512 and P * V <= 500_000_000 and scale_cutoff(1) > 0:
        # dense-incidence path: name vocabularies are tiny, so common
        # counts are ONE blocked BLAS gram A·Aᵀ over the P×V bitmask
        # matrix — the Θ(Σ posting²) pair enumeration (50M pairs at
        # sf0.1, measured 83 s) collapses to ~seconds.  Per row block,
        # the top-100 by (count desc, p1, p2) survives as a
        # superset-safe candidate set: flat index order IS (p1, p2)
        # lexicographic order because rows/cols ascend by partkey.
        A = np.zeros((P, V), np.float32)
        A[np.searchsorted(pkarr, pk), codes] = 1.0
        cand = []
        BLK = max(1, min(P, (64 << 20) // max(P * 4, 1)))
        for r0 in range(0, P, BLK):
            r1 = min(r0 + BLK, P)
            C = np.rint(A[r0:r1] @ A.T).astype(np.int16)
            gi = np.arange(r0, r1)
            C[np.arange(P)[None, :] <= gi[:, None]] = 0
            C[C < 2] = 0
            flat = C.ravel()
            if flat.size > 100:
                kth = np.partition(flat, -100)[-100]
            else:
                kth = np.int16(0)
            if kth >= 2:
                hi = np.flatnonzero(flat > kth)
                eq = np.flatnonzero(flat == kth)[:100 - len(hi)]
                idx = np.concatenate([hi, eq])
            else:
                idx = np.flatnonzero(flat >= 2)[:100 * 100]
            ii, jj = np.divmod(idx, P)
            cand.append(pd.DataFrame({
                "p1": pkarr[ii + r0], "p2": pkarr[jj],
                "common_tokens": flat[idx].astype(np.int64)}))
        out = pd.concat(cand, ignore_index=True) if cand else \
            empty.copy()
    else:
        comp = np.unique(codes.astype(np.int64) * (1 << 21) + pk)
        grp = comp >> 21
        starts = np.flatnonzero(
            np.concatenate([[True], grp[1:] != grp[:-1]]))
        sizes = np.diff(np.append(starts, len(grp)))
        i, j = within_group_pairs(starts, sizes)
        mask = np.int64((1 << 21) - 1)
        pair = ((comp[i] & mask) << 21) + (comp[j] & mask)
        up, c = np.unique(pair, return_counts=True)
        keep = c >= 2
        up, c = up[keep], c[keep].astype(np.int64)
        out = pd.DataFrame({"p1": up >> 21, "p2": up & mask,
                            "common_tokens": c})
    out = out.sort_values(["common_tokens", "p1", "p2"],
                          ascending=[False, True, True]).head(100)
    return out.reset_index(drop=True)


def docs_incremental_new(sf_dir: str):
    """Incremental-ingest dedup: treat the first half of the corpus
    (doc_id < ⌈max/2⌉) as already-ingested state and report which
    second-half docs are genuinely NEW — their normalized-text
    fingerprint absent from the state.  The state's fingerprint set
    ships ONCE via ray.put and probes sorted-array membership per
    batch (cached per worker); a >memory state would swap this for the
    bucketed anti-join (customer_except's scale path)."""
    import numpy as np
    import pandas as pd

    import ray

    from elevant_ray.stages.util import np_columns

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "fingerprint": pd.Series([], dtype="object")})
    if ds.count() == 0:
        return empty
    mx = int(np_columns(ds.map_batches(
        lambda b: pa.table({"m": pa.array(
            [int(pc.max(b.column("doc_id")).as_py())]
            if b.num_rows else [], pa.int64())}),
        batch_format="pyarrow"), ["m"])["m"].max())
    split = mx // 2 + 1

    def fp(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import md5_fingerprint

        return pa.table({"doc_id": pc.cast(b.column("doc_id"),
                                           pa.int64()),
                         "fingerprint": pa.array(
                             [md5_fingerprint(t)
                              for t in b.column("text").to_pylist()],
                             pa.string())})

    fps = ds.map_batches(fp, batch_format="pyarrow").materialize()
    state = fps.map_batches(
        lambda b: b.filter(pc.less(b.column("doc_id"),
                                   pa.scalar(split, pa.int64()))),
        batch_format="pyarrow")
    state_fps = ray.put(np.unique(np_columns(
        state, ["fingerprint"])["fingerprint"].astype(str)))

    def new_only(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get

        st = cached_get(state_fps)
        keep_rows = pc.greater_equal(b.column("doc_id"),
                                     pa.scalar(split, pa.int64()))
        b = b.filter(keep_rows)
        f = np.asarray(b.column("fingerprint").to_pylist(), dtype=str)
        idx = np.searchsorted(st, f)
        idx = np.minimum(idx, len(st) - 1) if len(st) else idx
        seen = (st[idx] == f) if len(st) else np.zeros(len(f), bool)
        return b.filter(pa.array(~seen))

    out = fps.map_batches(new_only, batch_format="pyarrow")
    return _det_sort(out, "doc_id")


def daily_revenue_wow(sf_dir: str):
    """Week-over-week revenue pulse: per-day order revenue compared to
    the SAME WEEKDAY one calendar week earlier (a day-indexed join, not
    a row lag — gaps don't shift the comparison), with the percent
    change exact-rational until the one float division.  Per-day sums
    are calendar-bounded partials."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"day": pd.Series([], dtype="int64"),
                          "revenue": pd.Series([], dtype="float64"),
                          "revenue_prev_week":
                              pd.Series([], dtype="float64"),
                          "wow_pct": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["day"], sum_cols=["c"], combine="driver")
    agg = agg.sort_values("day").reset_index(drop=True)
    day = agg["day"].to_numpy(np.int64)
    c = agg["c"].to_numpy(np.int64)
    idx = np.searchsorted(day, day - 7)
    idx = np.minimum(idx, len(day) - 1)
    has_prev = day[idx] == day - 7
    prev = np.where(has_prev, c[idx], 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        pct = 100.0 * (c - prev) / prev
    pct = np.where(has_prev & (prev > 0),
                   np.sign(pct) * np.floor(np.abs(pct) * 1e6 + 0.5)
                   / 1e6 + 0.0, np.nan)
    return pd.DataFrame({
        "day": day,
        "revenue": c / 100.0,
        "revenue_prev_week": np.where(has_prev, prev / 100.0, np.nan),
        "wow_pct": pct})


def nation_segment_sets(sf_dir: str):
    """GROUPING SETS ((nation), (segment)): customer counts and exact
    balance sums at two independent granularities in one result, each
    side's absent key NULL — the multi-granularity report shape
    (complement of the ROLLUP/CUBE queries).  One scan produces both
    groupings' partials; no row is read twice."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "customer",
               ["c_nationkey", "c_mktsegment", "c_acctbal"])
    empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                          "c_mktsegment": pd.Series([], dtype="object"),
                          "n_customers": pd.Series([], dtype="int64"),
                          "total_bal": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("c_acctbal")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"nk": pc.cast(b.column("c_nationkey"),
                                       pa.int64()),
                         "seg": b.column("c_mktsegment"),
                         "c": pa.array(c, pa.int64())})

    pre_ds = ds.map_batches(pre, batch_format="pyarrow").materialize()
    by_n = partial_group_agg(pre_ds, ["nk"], sum_cols=["c"],
                             count_alias="n", combine="driver")
    by_s = partial_group_agg(pre_ds, ["seg"], sum_cols=["c"],
                             count_alias="n", combine="driver")
    rows = []
    for _, r in by_n.iterrows():
        rows.append((nation[int(r["nk"])], None, int(r["n"]),
                     int(r["c"]) / 100.0))
    for _, r in by_s.iterrows():
        rows.append((None, r["seg"], int(r["n"]), int(r["c"]) / 100.0))
    out = pd.DataFrame(rows, columns=["n_name", "c_mktsegment",
                                      "n_customers", "total_bal"])
    return out.astype({"n_customers": "int64"}) \
        .sort_values(["n_name", "c_mktsegment"],
                     na_position="last").reset_index(drop=True)


def events_hourly_control_chart(sf_dir: str):
    """X̄ control chart over hourly value means: each hour-of-day's
    mean is flagged out-of-control when it leaves the ±3σ/√n band
    around the global mean — the monitoring-rule shape.  Global and
    per-hour moments are exact integer partials from ONE scan; every
    float step (mean, σ, band, comparison) is the identical expression
    the oracle evaluates, so the boolean flag matches exactly."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["ts", "value"])
    empty = pd.DataFrame({"hour": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "mean_value": pd.Series([], dtype="float64"),
                          "out_of_control": pd.Series([], dtype="bool")})
    if ds.count() == 0:
        return empty

    HOUR_US = 3_600_000_000

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"hour": pa.array((us // HOUR_US) % 24,
                                          pa.int64()),
                         "s": pa.array(c, pa.int64()),
                         "q": pa.array(c * c, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["hour"], sum_cols=["s", "q"],
                          count_alias="n", combine="driver")
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    q = g["q"].to_numpy(np.int64)
    N, S, Q = int(n.sum()), int(s.sum()), int(q.sum())
    if N < 2:
        return empty
    mu = (1.0 * S) / N
    sigma = np.sqrt((Q - (1.0 * S) * S / N) / (N - 1))
    mean_h = (1.0 * s) / n
    flag = np.abs(mean_h - mu) > 3.0 * sigma / np.sqrt(1.0 * n)
    out = pd.DataFrame({
        "hour": g["hour"].astype("int64"),
        "n": n,
        "mean_value": np.floor(mean_h / 100.0 * 1e6 + 0.5) / 1e6 + 0.0,
        "out_of_control": flag})
    return out.sort_values("hour").reset_index(drop=True)


def embedding_quantize_check(sf_dir: str):
    """Symmetric int8 quantization of the embedding column with
    integrity checksums: per vector, scale = max|x| and qᵢ =
    round(127·xᵢ/scale) — reported as the exact integer sum and L1
    norm of the quantized vector (so the oracle compares the WHOLE
    quantized vector through two integers).  float32 → double is exact
    both sides; the division/round expression is identical.  Pure
    map, no shuffle."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def f(b: pa.Table) -> pa.Table:
        ids, scales, qsum, ql1 = [], [], [], []
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vids = b.column("vec_id").to_pylist()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        vals = col.values.to_numpy(zero_copy_only=False).astype(
            np.float64)
        for k, vid in enumerate(vids):
            x = vals[offs[k]:offs[k + 1]]
            scale = float(np.abs(x).max()) if len(x) else 0.0
            if scale > 0:
                z = 127.0 * x / scale
                qv = (np.sign(z) * np.floor(np.abs(z) + 0.5)) \
                    .astype(np.int64)
            else:
                qv = np.zeros(len(x), np.int64)
            ids.append(vid)
            scales.append(
                float(np.floor(scale * 1e6 + 0.5) / 1e6) + 0.0)
            qsum.append(int(qv.sum()))
            ql1.append(int(np.abs(qv).sum()))
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "scale": pa.array(scales, pa.float64()),
                         "q_sum": pa.array(qsum, pa.int64()),
                         "q_l1": pa.array(ql1, pa.int64())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "vec_id")


def user_trailing_type_diversity(sf_dir: str):
    """Sliding-window DISTINCT: how many distinct event types each
    user touched in their trailing 10 events (current + 9 preceding) —
    the windowed-diversity engagement signal.  Distinct-over-window
    isn't subtractable, so the kernel ORs 10 shifted type-bitmask
    arrays with user-boundary guards (types are enum-bounded; popcount
    by table) — no per-row set, no per-user loop."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])
    empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                          "n_types10": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    # global type enum from per-batch unique partials
    types = sorted({t for b in ds.map_batches(
        lambda b: pa.table({"t": pc.unique(b.column("event_type"))}),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        for t in b.column("t").to_pylist()})
    tcode = {t: i for i, t in enumerate(types)}
    if len(types) > 20:
        raise ValueError("type enum too wide for bitmask window")
    POP = np.array([bin(i).count("1") for i in range(1 << len(types))],
                   np.int64)

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        bits = np.array([1 << tcode[t]
                         for t in b.column("event_type").to_pylist()],
                        np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "bits": pa.array(bits, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "n_types10": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        bits = g["bits"].to_numpy(np.int64)
        m = len(uid)
        starts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]]))
        ustart = np.repeat(starts, np.diff(np.append(starts, m)))
        i = np.arange(m)
        acc = np.zeros(m, np.int64)
        for k in range(10):
            valid = i - k >= ustart
            src = np.where(valid, bits[np.maximum(i - k, 0)], 0)
            acc |= src
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(np.int64),
                             "n_types10": POP[acc]})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_bucket)
    return _det_sort(as_arrow(out), "event_id")


def customer_year_rank_shift(sf_dir: str):
    """Rank-mobility report: each customer's spend rank in 1997 vs
    1998 (row_number by spend desc, custkey tie-break), top 20 movers
    by |rank delta| — the year-over-year leaderboard shift.  Per-
    (customer, year) sums are one partial-pushed exchange; ranking is
    a driver lexsort over the dimension-bounded customer set."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                  "o_totalprice"])
    empty = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                          "rank_1997": pd.Series([], dtype="int64"),
                          "rank_1998": pd.Series([], dtype="int64"),
                          "rank_delta": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        y = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[Y]") \
            .astype(np.int64) + 1970
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"ck": pc.cast(b.column("o_custkey"), pa.int64()),
                      "y": pa.array(y, pa.int64()),
                      "c": pa.array(c, pa.int64())})
        keep = pc.or_(pc.equal(t.column("y"), pa.scalar(1997, pa.int64())),
                      pc.equal(t.column("y"), pa.scalar(1998, pa.int64())))
        return t.filter(keep)

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["ck", "y"], sum_cols=["c"],
                            combine="driver")
    if agg.empty:
        return empty
    piv = agg.pivot(index="ck", columns="y", values="c")
    if 1997 not in piv.columns or 1998 not in piv.columns:
        return empty
    piv = piv.dropna()
    if piv.empty:
        return empty
    ck = piv.index.to_numpy(np.int64)

    def ranks(c):
        c = c.astype(np.int64)
        order = np.lexsort((ck, -c))
        r = np.empty(len(c), np.int64)
        r[order] = np.arange(1, len(c) + 1)
        return r

    r97 = ranks(piv[1997].to_numpy())
    r98 = ranks(piv[1998].to_numpy())
    delta = r97 - r98
    out = pd.DataFrame({"c_custkey": ck, "rank_1997": r97,
                        "rank_1998": r98, "rank_delta": delta,
                        "absd": np.abs(delta)})
    out = out.sort_values(["absd", "c_custkey"],
                          ascending=[False, True]).head(20)
    return out.drop(columns=["absd"]).reset_index(drop=True)


def user_idle_share(sf_dir: str):
    """Share of each user's active span spent idle: idle = Σ max(gap −
    1h, 0) over consecutive-event gaps, span = last − first event —
    exact µs integers until the one share division.  One user-keyed
    shuffle, gaps vectorized."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    HOUR_US = 3_600_000_000

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "idle_us": pd.Series([], dtype="int64"),
            "span_us": pd.Series([], dtype="int64"),
            "idle_share": pd.Series([], dtype="float64")})
        if not len(g):
            return out_empty
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        same = uid[1:] == uid[:-1]
        gaps = np.maximum((us[1:] - us[:-1]) - HOUR_US, 0) * same
        idle = pd.Series(np.concatenate([gaps, [0]])) \
            .groupby(uid, sort=False).sum()
        span = pd.Series(us).groupby(uid, sort=False) \
            .agg(lambda s: s.iloc[-1] - s.iloc[0])
        keep = span > 0
        share = (1.0 * idle[keep].to_numpy(np.int64)) \
            / span[keep].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": idle[keep].index.to_numpy(np.int64),
            "idle_us": idle[keep].to_numpy(np.int64),
            "span_us": span[keep].to_numpy(np.int64),
            "idle_share": np.floor(share * 1e6 + 0.5) / 1e6 + 0.0})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_bucket)
    return _det_sort(as_arrow(out), "user_id")


def customers_churned_1998(sf_dir: str):
    """Temporal churn anti-join: customers who ordered in 1997 but
    placed NOTHING in 1998, with their 1997 order count and exact
    spend.  One scan; per-customer year-bucketed partials, the churn
    predicate closes on the combine — no join at all."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                  "o_totalprice"])
    empty = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                          "n_orders_1997": pd.Series([], dtype="int64"),
                          "spend_1997": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        y = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[Y]") \
            .astype(np.int64) + 1970
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        is97 = (y == 1997).astype(np.int64)
        is98 = (y == 1998).astype(np.int64)
        return pa.table({"ck": pc.cast(b.column("o_custkey"), pa.int64()),
                         "n97": pa.array(is97, pa.int64()),
                         "n98": pa.array(is98, pa.int64()),
                         "c97": pa.array(is97 * c, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["ck"], sum_cols=["n97", "n98", "c97"],
                            combine="driver")
    if agg.empty:
        return empty
    keep = (agg["n97"] > 0) & (agg["n98"] == 0)
    out = agg[keep]
    return pd.DataFrame({
        "c_custkey": out["ck"].astype("int64"),
        "n_orders_1997": out["n97"].astype("int64"),
        "spend_1997": out["c97"].to_numpy(np.int64) / 100.0}) \
        .sort_values("c_custkey").reset_index(drop=True)


def doc_keyword_context(sf_dir: str):
    """Keyword-in-context extraction: the first occurrence of 'merge'
    in each document with ±20 characters of context (the concordance /
    snippet stage of search indexing).  Byte-identical slicing both
    sides (ASCII corpus: Python str.find == SQL position); docs
    without the keyword drop out.  Pure map."""
    import numpy as np

    KW = "merge"

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        ids, poss, ctxs = [], [], []
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            p0 = text.find(KW)
            if p0 < 0:
                continue
            s = max(p0 - 20, 0)
            ids.append(doc_id)
            poss.append(p0 + 1)  # 1-based, as SQL position()
            ctxs.append(text[s:p0 + len(KW) + 20])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "pos": pa.array(poss, pa.int64()),
                         "context": pa.array(ctxs, pa.string())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def event_type_target_encoding(sf_dir: str):
    """Smoothed target encoding of the event-type categorical: each
    type's mean value shrunk toward the global mean with pseudo-count
    m = 100 — the leakage-free feature-engineering primitive.  All
    sums are exact cents; the smoothing chain (1·Σc + 100·μ)/(n+100)
    is the identical float expression the oracle evaluates."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])
    empty = pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                          "n": pd.Series([], dtype="int64"),
                          "raw_mean": pd.Series([], dtype="float64"),
                          "smoothed_mean":
                              pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"event_type": b.column("event_type"),
                         "c": pa.array(c, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["event_type"], sum_cols=["c"],
                          count_alias="n", combine="driver")
    g = g.sort_values("event_type").reset_index(drop=True)
    n = g["n"].to_numpy(np.int64)
    sc = g["c"].to_numpy(np.int64)
    N, S = int(n.sum()), int(sc.sum())
    mu = (1.0 * S) / N
    raw = (1.0 * sc) / n / 100.0
    sm = (1.0 * sc + 100.0 * mu) / (n + 100) / 100.0
    return pd.DataFrame({
        "event_type": g["event_type"],
        "n": n,
        "raw_mean": np.floor(raw * 1e6 + 0.5) / 1e6 + 0.0,
        "smoothed_mean": np.floor(sm * 1e6 + 0.5) / 1e6 + 0.0})


def doc_trigram_novelty(sf_dir: str):
    """Trigram novelty per document: the share of a doc's DISTINCT
    word trigrams appearing in no other document — the
    contamination/memorization screen.  (doc, trigram) incidence
    dedupes per doc in the map; doc frequency reduces through
    partials; the df=1 set broadcasts once and probes per batch.  The
    trigram vocabulary here is token-vocab³-bounded; an open-vocab
    corpus would swap the driver combine for a trigram-keyed bucket
    exchange."""
    import numpy as np
    import pandas as pd

    import ray

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "n_tri": pd.Series([], dtype="int64"),
                          "novel": pd.Series([], dtype="int64"),
                          "novel_share": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def tris(text):
        toks = text.split(" ")
        return {" ".join(toks[i:i + 3])
                for i in range(len(toks) - 2)} if len(toks) >= 3 else set()

    def pairs(b: pa.Table) -> pa.Table:
        ids, ts = [], []
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            for t in tris(text):
                ids.append(doc_id)
                ts.append(t)
        return pa.table({"tri": pa.array(ts, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})

    inc = ds.map_batches(pairs, batch_format="pyarrow").materialize()
    df = partial_group_agg(inc, ["tri"], count_alias="df",
                           combine="driver")
    if df.empty:
        return empty
    df1 = ray.put(np.sort(
        df[df["df"] == 1]["tri"].to_numpy(dtype=str)))

    def per_doc(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get

        uniq = cached_get(df1)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        t = np.asarray(b.column("tri").to_pylist(), dtype=str)
        if len(uniq):
            idx = np.minimum(np.searchsorted(uniq, t), len(uniq) - 1)
            nov = (uniq[idx] == t).astype(np.int64)
        else:
            nov = np.zeros(len(t), np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "one": pa.array(np.ones(len(t), np.int64)),
                         "nov": pa.array(nov, pa.int64())})

    agg = partial_group_agg(inc.map_batches(per_doc,
                                            batch_format="pyarrow"),
                            ["doc_id"], sum_cols=["one", "nov"],
                            combine="driver")
    agg = agg.sort_values("doc_id").reset_index(drop=True)
    nt = agg["one"].to_numpy(np.int64)
    nv = agg["nov"].to_numpy(np.int64)
    share = (1.0 * nv) / nt
    return pd.DataFrame({"doc_id": agg["doc_id"].astype("int64"),
                         "n_tri": nt, "novel": nv,
                         "novel_share": np.floor(share * 1e6 + 0.5)
                         / 1e6 + 0.0})


def docs_length_kruskal(sf_dir: str):
    """Kruskal–Wallis H test of document token-count distributions
    across sources — the nonparametric k-group location test.  Midrank
    sums stay integer in half-units (2R_g = Σ a·(2·cb + c + 1) over the
    value histogram, the Mann-Whitney trick generalized), the tie
    correction Σ(c³−c) is exact, and the H closure is the identical
    float expression the oracle evaluates."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["source", "text"])
    empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "h": pd.Series([], dtype="float64"),
                          "h_tied": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import token_count

        v = [token_count(t) for t in b.column("text").to_pylist()]
        return pa.table({"g": b.column("source"),
                         "v": pa.array(v, pa.int64())})

    h = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["v", "g"], count_alias="a", combine="driver")
    if h.empty:
        return empty
    h = h.sort_values(["v", "g"]).reset_index(drop=True)
    cv = h.groupby("v", sort=True)["a"].sum()
    vs = cv.index.to_numpy(np.int64)
    cva = cv.to_numpy(np.int64)
    cb = np.concatenate([[0], cva.cumsum()[:-1]])
    rank2 = pd.Series(2 * cb + cva + 1, index=vs)
    h["r2c"] = h["a"].to_numpy(np.int64) \
        * rank2.loc[h["v"]].to_numpy(np.int64)
    grp = h.groupby("g", sort=True).agg(r2=("r2c", "sum"),
                                        n=("a", "sum"))
    r2 = grp["r2"].to_numpy(np.int64)
    n = grp["n"].to_numpy(np.int64)
    N, k = int(n.sum()), len(grp)
    if N < 2 or k < 2:
        return empty
    tie = int((cva.astype(object) ** 3 - cva).sum())
    H = (12.0 / ((1.0 * N) * (N + 1))) \
        * float((((1.0 * r2) * r2 / 4.0) / n).sum()) - 3.0 * (N + 1)
    den = ((1.0 * N) * N * N - N)
    corr = 1.0 - (1.0 * tie) / den
    h_t = H / corr if corr > 0 else np.nan
    rnd = lambda x: (float(np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)
                           / 1e6) + 0.0) if np.isfinite(x) else np.nan
    return pd.DataFrame({"k": [np.int64(k)], "n": [np.int64(N)],
                         "h": [rnd(H)], "h_tied": [rnd(h_t)]})


def supplier_late_wilson(sf_dir: str):
    """Late-shipment rate per supplier with the Wilson-score lower
    confidence bound (z = 1.96) — the small-sample-safe reliability
    ranking.  Late = ship > 100 days after order.  The order-date side
    folds into the lineitem scan as a broadcast lookup under the
    cutoff (co-group beyond, cf. orders_ship_busdays); counts are
    exact and the Wilson closure is the identical float expression the
    oracle evaluates."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (IntKeyMap, cogroup_join,
                                         np_columns, partial_group_agg,
                                         scale_cutoff)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_shipdate"])
    empty = pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                          "n_lines": pd.Series([], dtype="int64"),
                          "n_late": pd.Series([], dtype="int64"),
                          "late_rate": pd.Series([], dtype="float64"),
                          "wilson_low": pd.Series([], dtype="float64")})
    if line.count() == 0 or orders.count() == 0:
        return empty

    if orders.size_bytes() <= scale_cutoff(64 << 20):
        o = np_columns(orders, ["o_orderkey", "o_orderdate"])
        od = o["o_orderdate"].astype("datetime64[D]").astype(np.int64)
        omap = IntKeyMap(o["o_orderkey"], od)

        def fold(b: pa.Table) -> pa.Table:
            sd = b.column("l_shipdate").to_numpy(
                zero_copy_only=False).astype("datetime64[D]").astype(
                np.int64)
            odv, found = omap.take(
                b.column("l_orderkey").to_numpy(zero_copy_only=False))
            late = (sd - np.asarray(odv, np.int64) > 100).astype(np.int64)
            return pa.table({"sk": pc.cast(b.column("l_suppkey"),
                                           pa.int64()),
                             "late": pa.array(late, pa.int64())}) \
                .filter(pa.array(found))

        folded = line.map_batches(fold, batch_format="pyarrow")
    else:
        def l_pre(b: pa.Table) -> pa.Table:
            sd = b.column("l_shipdate").to_numpy(
                zero_copy_only=False).astype("datetime64[D]").astype(
                np.int64)
            return pa.table({"l_orderkey": b.column("l_orderkey"),
                             "sk": pc.cast(b.column("l_suppkey"),
                                           pa.int64()),
                             "sd": pa.array(sd, pa.int64())})

        def o_pre(b: pa.Table) -> pa.Table:
            od = b.column("o_orderdate").to_numpy(
                zero_copy_only=False).astype("datetime64[D]").astype(
                np.int64)
            return pa.table({"l_orderkey": b.column("o_orderkey"),
                             "od": pa.array(od, pa.int64())})

        j = cogroup_join(
            line.map_batches(l_pre, batch_format="pyarrow"),
            orders.map_batches(o_pre, batch_format="pyarrow"),
            on="l_orderkey",
            left_schema=pa.schema([("l_orderkey", pa.int64()),
                                   ("sk", pa.int64()),
                                   ("sd", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("od", pa.int64())]))

        def fin(b: pa.Table) -> pa.Table:
            sd = b.column("sd").to_numpy(zero_copy_only=False)
            od = b.column("od").to_numpy(zero_copy_only=False)
            return pa.table({"sk": b.column("sk"),
                             "late": pa.array(
                                 (sd - od > 100).astype(np.int64),
                                 pa.int64())})

        folded = j.map_batches(fin, batch_format="pyarrow")

    agg = partial_group_agg(folded, ["sk"], sum_cols=["late"],
                            count_alias="n", combine="driver")
    if agg.empty:
        return empty
    agg = agg.sort_values("sk").reset_index(drop=True)
    n = agg["n"].to_numpy(np.int64)
    late = agg["late"].to_numpy(np.int64)
    p = (1.0 * late) / n
    z = 1.96
    z2 = z * z
    low = (p + z2 / (2.0 * n)
           - z * np.sqrt((p * (1.0 - p)) / n + z2 / (4.0 * (n * n)))) \
        / (1.0 + z2 / n)
    return pd.DataFrame({
        "s_suppkey": agg["sk"].astype("int64"),
        "n_lines": n, "n_late": late,
        "late_rate": np.floor(p * 1e6 + 0.5) / 1e6 + 0.0,
        "wilson_low": np.sign(low) * np.floor(np.abs(low) * 1e6 + 0.5)
        / 1e6 + 0.0})


def doc_zlib_ratio(sf_dir: str):
    """Compression-ratio quality signal: zlib(level 6) compressed size
    over raw size per document — low ratios flag repetitive/templated
    text, high ratios flag noise (the classic curation heuristic).
    Deterministic but not SQL-expressible → rows-only for the driver;
    the pytest suite pins monotonicity on constructed docs.  Pure
    map."""
    import zlib

    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        ids, ns, ratios = [], [], []
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            raw = text.encode("utf-8")
            if not raw:
                continue
            comp = len(zlib.compress(raw, 6))
            r = (1.0 * comp) / len(raw)
            ids.append(doc_id)
            ns.append(len(raw))
            ratios.append(float(np.floor(r * 1e6 + 0.5) / 1e6) + 0.0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_bytes": pa.array(ns, pa.int64()),
                         "zlib_ratio": pa.array(ratios, pa.float64())})

    return _det_sort(ds.map_batches(f, batch_format="pyarrow"), "doc_id")


def session_bounce_rate(sf_dir: str):
    """Bounce rate by session entry point: sessions (30-min µs gap
    rule) grouped by their FIRST event type, with the share that
    contain exactly one event — the landing-page quality report.  One
    user-keyed shuffle sessionizes vectorized; per-entry-type counts
    reduce through partials."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (as_arrow, bucketed_group_apply,
                                         partial_group_agg)

    GAP_US = 1_800_000_000

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])
    empty = pd.DataFrame({"first_type": pd.Series([], dtype="object"),
                          "n_sessions": pd.Series([], dtype="int64"),
                          "bounces": pd.Series([], dtype="int64"),
                          "bounce_rate": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "event_type": b.column("event_type")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "first_type": pd.Series([], dtype="object"),
                "bounce": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        new = np.concatenate(
            [[True], (uid[1:] != uid[:-1])
             | (us[1:] - us[:-1] > GAP_US)])
        sid = np.cumsum(new)
        res = pd.DataFrame({"sid": sid,
                            "t": g["event_type"].to_numpy()})
        agg = res.groupby("sid", sort=False).agg(
            first_type=("t", "first"), sz=("t", "size"))
        return pd.DataFrame({
            "first_type": agg["first_type"],
            "bounce": (agg["sz"] == 1).astype("int64")})

    sess = bucketed_group_apply(ds.map_batches(pre,
                                               batch_format="pyarrow"),
                                "user_id", per_bucket)
    agg = partial_group_agg(as_arrow(sess), ["first_type"],
                            sum_cols=["bounce"], count_alias="n",
                            combine="driver")
    if agg.empty:
        return empty
    agg = agg.sort_values("first_type").reset_index(drop=True)
    n = agg["n"].to_numpy(np.int64)
    b_ = agg["bounce"].to_numpy(np.int64)
    rate = (1.0 * b_) / n
    return pd.DataFrame({"first_type": agg["first_type"],
                         "n_sessions": n, "bounces": b_,
                         "bounce_rate": np.floor(rate * 1e6 + 0.5)
                         / 1e6 + 0.0})


def events_value_minmax_scaled(sf_dir: str):
    """Min-max feature scaling per event type: scaled = (c − min)/(max
    − min) over exact cents, the per-group bounds broadcast once into
    a streaming per-row map (single-event-value types scale to NULL).
    The normalization staple of feature pipelines — no shuffle touches
    the fact rows."""
    import numpy as np
    import pandas as pd

    import ray

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                          "event_type": pd.Series([], dtype="object"),
                          "scaled": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"event_id": b.column("event_id"),
                         "event_type": b.column("event_type"),
                         "c": pa.array(c, pa.int64()),
                         "cmin": pa.array(c, pa.int64()),
                         "cmax": pa.array(c, pa.int64())})

    pre_ds = ds.map_batches(pre, batch_format="pyarrow").materialize()
    bounds = partial_group_agg(pre_ds, ["event_type"],
                               min_cols=["cmin"], max_cols=["cmax"],
                               combine="driver")
    bmap = {r["event_type"]: (int(r["cmin"]), int(r["cmax"]))
            for _, r in bounds.iterrows()}
    bref = ray.put(bmap)

    def scale(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get

        bm = cached_get(bref)
        c = b.column("c").to_numpy(zero_copy_only=False)
        ts = b.column("event_type").to_pylist()
        mn = np.array([bm[t][0] for t in ts], np.int64)
        mx = np.array([bm[t][1] for t in ts], np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = (1.0 * (c - mn)) / (mx - mn)
        s = np.where(mx > mn,
                     np.floor(s * 1e6 + 0.5) / 1e6 + 0.0, np.nan)
        return pa.table({"event_id": b.column("event_id"),
                         "event_type": b.column("event_type"),
                         "scaled": pa.array(s, pa.float64())})

    return _det_sort(pre_ds.map_batches(scale, batch_format="pyarrow"),
                     "event_id")


def customer_abc_class(sf_dir: str):
    """ABC inventory-style classification of customers by cumulative
    revenue share: walking customers in (spend desc, custkey) order,
    class A while the running share ≤ 80%, B while ≤ 95%, else C —
    with the thresholds as exact integer predicates (100·cum vs
    80·total), so no float boundary can flip a class.  One
    partial-pushed exchange; the classification is a driver scan over
    the dimension-bounded customer set."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    empty = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                          "spend": pd.Series([], dtype="float64"),
                          "abc_class": pd.Series([], dtype="object")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"ck": pc.cast(b.column("o_custkey"), pa.int64()),
                         "c": pa.array(c, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["ck"], sum_cols=["c"], combine="driver")
    ck = agg["ck"].to_numpy(np.int64)
    c = agg["c"].to_numpy(np.int64)
    order = np.lexsort((ck, -c))
    ck, c = ck[order], c[order]
    cum = np.cumsum(c)
    tot = int(cum[-1])
    cls = np.where(100 * cum <= 80 * tot, "A",
                   np.where(100 * cum <= 95 * tot, "B", "C"))
    return pd.DataFrame({"c_custkey": ck, "spend": c / 100.0,
                         "abc_class": cls}) \
        .sort_values("c_custkey").reset_index(drop=True)


def user_burstiness(sf_dir: str):
    """Burstiness (Fano factor) of each user's event arrivals: the
    variance-to-mean ratio of per-hour event counts over the user's
    OBSERVED span, zero hours included — Poisson arrivals give ≈1,
    bursty sessions ≫1.  Σk and Σk² come from (user, hour) count
    partials; the H−n zero bins enter the closure arithmetically
    (they contribute nothing to Σk²), so nothing is materialized for
    empty hours."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    HOUR_US = 3_600_000_000

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "n_hours": pd.Series([], dtype="int64"),
                          "n_events": pd.Series([], dtype="int64"),
                          "fano": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        h = us // HOUR_US
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "h": pa.array(h, pa.int64()),
                         "hmin": pa.array(h, pa.int64()),
                         "hmax": pa.array(h, pa.int64())})

    per_hour = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["user_id", "h"], count_alias="k", combine="dataset")

    def moments(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "kk": pa.array([], pa.int64()),
                             "hmin": pa.array([], pa.int64()),
                             "hmax": pa.array([], pa.int64())})
        k = b.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        h = b.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": b.column("user_id"),
                         "n": b.column("k"),
                         "kk": pa.array(k * k, pa.int64()),
                         "hmin": pa.array(h, pa.int64()),
                         "hmax": pa.array(h, pa.int64())})

    agg = partial_group_agg(per_hour.map_batches(moments,
                                                 batch_format="pyarrow"),
                            ["user_id"], sum_cols=["n", "kk"],
                            min_cols=["hmin"], max_cols=["hmax"],
                            combine="driver")
    if agg.empty:
        return empty
    agg = agg.sort_values("user_id").reset_index(drop=True)
    n = agg["n"].to_numpy(np.int64)
    kk = agg["kk"].to_numpy(np.int64)
    H = agg["hmax"].to_numpy(np.int64) \
        - agg["hmin"].to_numpy(np.int64) + 1
    keep = H >= 2
    n, kk, H = n[keep], kk[keep], H[keep]
    uid = agg["user_id"].to_numpy(np.int64)[keep]
    mean = (1.0 * n) / H
    var = (kk - (1.0 * n) * n / H) / (H - 1)
    fano = var / mean
    return pd.DataFrame({
        "user_id": uid, "n_hours": H, "n_events": n,
        "fano": np.sign(fano) * np.floor(np.abs(fano) * 1e6 + 0.5)
        / 1e6 + 0.0})


def events_median_ci(sf_dir: str):
    """Distribution-free 95% confidence interval for the median of
    event values: the order statistics at ranks ⌊(n − 1.96·√n)/2⌋ and
    n + 1 − that — the binomial-argument CI, no resampling.  The rank
    positions derive from one identical float expression both sides;
    the order statistics themselves resolve exactly on the cents
    histogram (no sort of the data)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["value"])
    empty = pd.DataFrame({"n": pd.Series([], dtype="int64"),
                          "median": pd.Series([], dtype="float64"),
                          "ci_low": pd.Series([], dtype="float64"),
                          "ci_high": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"c": pa.array(c, pa.int64())})

    h = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["c"], count_alias="k", combine="driver")
    if h.empty:
        return empty
    h = h.sort_values("c").reset_index(drop=True)
    c = h["c"].to_numpy(np.int64)
    k = h["k"].to_numpy(np.int64)
    cum = np.cumsum(k)
    n = int(cum[-1])
    lo_rank = int(np.floor((n - 1.96 * np.sqrt(1.0 * n)) / 2.0))
    if lo_rank < 1 or n < 3:
        return empty
    hi_rank = n + 1 - lo_rank
    med_rank = (n + 1) // 2

    def order_stat(r):
        return float(c[np.searchsorted(cum, r)]) / 100.0

    return pd.DataFrame({
        "n": [np.int64(n)],
        "median": [order_stat(med_rank)],
        "ci_low": [order_stat(lo_rank)],
        "ci_high": [order_stat(hi_rank)]})


def nation_balance_levene(sf_dir: str):
    """Brown–Forsythe variance-homogeneity test of customer balances
    across nations: ANOVA F over |c − group median|, the
    median-centered (robust) Levene variant.  Group medians come off
    the grouped cents histogram exactly (percentile_disc, no sort),
    broadcast into a second scan whose deviation moments close in the
    identical float expression as the oracle."""
    import numpy as np
    import pandas as pd

    import ray

    from elevant_ray.stages.quantiles import grouped_quantiles
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "f_stat": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("c_acctbal")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"nk": pc.cast(b.column("c_nationkey"),
                                       pa.int64()),
                         "c": pa.array(c, pa.int64())})

    pre_ds = ds.map_batches(pre, batch_format="pyarrow").materialize()
    med = grouped_quantiles(pre_ds, "c", (0.5,),
                            group_cols=["nk"]).to_pandas()
    mmap = {int(r["nk"]): int(r["c"]) for _, r in med.iterrows()
            if r["q"] == 0.5}
    mref = ray.put(mmap)

    def dev(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get

        mm = cached_get(mref)
        nk = b.column("nk").to_numpy(zero_copy_only=False)
        c = b.column("c").to_numpy(zero_copy_only=False)
        meds = np.array([mm[int(x)] for x in nk], np.int64)
        z = np.abs(c - meds)
        return pa.table({"nk": b.column("nk"),
                         "s": pa.array(z, pa.int64()),
                         "q": pa.array(z * z, pa.int64())})

    g = partial_group_agg(pre_ds.map_batches(dev,
                                             batch_format="pyarrow"),
                          ["nk"], sum_cols=["s", "q"],
                          count_alias="n", combine="driver")
    g = g.sort_values("nk").reset_index(drop=True)
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    q = g["q"].to_numpy(np.int64)
    k, nn, gg = len(g), int(n.sum()), int(s.sum())
    if k < 2 or nn <= k:
        return empty
    ssb = float(((1.0 * s) * s / n).sum()) - ((1.0 * gg) * gg) / nn
    ssw = float((1.0 * q - ((1.0 * s) * s) / n).sum())
    if not ssw > 0:
        return empty
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    return pd.DataFrame({
        "k": [np.int64(k)], "n": [np.int64(nn)],
        "f_stat": [float(np.sign(f) * np.floor(np.abs(f) * 1e6 + 0.5)
                         / 1e6) + 0.0]})


def event_type_entropy_rate(sf_dir: str):
    """Markov entropy rate of the per-user event-type chain:
    H(Xₜ₊₁ | Xₜ) = −Σᵢⱼ (nᵢⱼ/N)·log2(nᵢⱼ/nᵢ) over consecutive-event
    transition counts — how predictable the next action is.  One
    user-keyed shuffle collects exact transition counts; the ≤|types|²
    closure is term-identical with the oracle."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (as_arrow, bucketed_group_apply,
                                         partial_group_agg)

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])
    empty = pd.DataFrame({"n_transitions": pd.Series([], dtype="int64"),
                          "entropy_rate": pd.Series([],
                                                    dtype="float64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"src": pd.Series([], dtype="object"),
                                 "dst": pd.Series([], dtype="object")})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        t = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        return pd.DataFrame({"src": t[:-1][same], "dst": t[1:][same]})

    trans = bucketed_group_apply(ds, "user_id", per_bucket)
    cnt = partial_group_agg(as_arrow(trans), ["src", "dst"],
                            count_alias="nij", combine="driver")
    if cnt.empty:
        return empty
    cnt = cnt.sort_values(["src", "dst"]).reset_index(drop=True)
    nij = cnt["nij"].to_numpy(np.int64)
    ni = cnt.groupby("src")["nij"].transform("sum").to_numpy(np.int64)
    N = int(nij.sum())
    terms = -((1.0 * nij) / N) * np.log2((1.0 * nij) / ni)
    h = float(terms.sum())
    return pd.DataFrame({
        "n_transitions": [np.int64(N)],
        "entropy_rate": [float(np.floor(h * 1e6 + 0.5) / 1e6) + 0.0]})


def dup_cluster_size_histogram(sf_dir: str):
    """Histogram of exact-duplicate cluster sizes (docs sharing a
    normalized-text fingerprint): how much of the corpus is singleton
    vs duplicated, the dedup-planning report.  Fingerprint-keyed
    counts reduce through partials; the size histogram is a second
    bounded rollup."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    empty = pd.DataFrame({"cluster_size": pd.Series([], dtype="int64"),
                          "n_clusters": pd.Series([], dtype="int64"),
                          "n_docs": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def fp(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import md5_fingerprint

        return pa.table({"fingerprint": pa.array(
            [md5_fingerprint(t) for t in b.column("text").to_pylist()],
            pa.string())})

    per_fp = partial_group_agg(ds.map_batches(fp,
                                              batch_format="pyarrow"),
                               ["fingerprint"], count_alias="sz",
                               combine="dataset")

    def to_size(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"cluster_size": pa.array([], pa.int64())})
        return pa.table({"cluster_size": pc.cast(b.column("sz"),
                                                 pa.int64())})

    hist = partial_group_agg(per_fp.map_batches(to_size,
                                                batch_format="pyarrow"),
                             ["cluster_size"], count_alias="n_clusters",
                             combine="driver")
    hist = hist.sort_values("cluster_size").reset_index(drop=True)
    cs = hist["cluster_size"].to_numpy(np.int64)
    ncl = hist["n_clusters"].to_numpy(np.int64)
    return pd.DataFrame({"cluster_size": cs, "n_clusters": ncl,
                         "n_docs": cs * ncl})


def multimodal_audio_energy(sf_dir: str):
    """Audio branch of the multimodal plumbing: synthetic audio
    payloads → windowed RMS energies via the AudioFeatureStage actor
    pool → per-doc window count and mean energy.  Decode is the
    documented stub; the actor-pool batching and binary handling are
    real (rows-only check)."""
    import numpy as np

    from elevant_ray.stages.multimodal import (AudioFeatureStage,
                                               synth_media_batch)

    ds = _read(sf_dir, "documents", ["doc_id"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow")
    feats = media.map_batches(AudioFeatureStage, concurrency=2,
                              batch_size=64, batch_format="pyarrow")

    def fmt(b: pa.Table) -> pa.Table:
        means = [float(np.floor(float(np.mean(e)) * 1e4 + 0.5) / 1e4)
                 if len(e) else None
                 for e in b.column("energy").to_pylist()]
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_windows": pc.cast(b.column("n_windows"),
                                              pa.int64()),
                         "mean_energy": pa.array(means, pa.float64())})

    return _det_sort(feats.map_batches(fmt, batch_format="pyarrow"),
                     "doc_id")


def multimodal_frame_sample(sf_dir: str):
    """Video branch of the multimodal plumbing: synthetic video
    payloads → every-2nd-frame byte slices (frame_sample_batch) →
    per-doc sampled-frame count and total sampled bytes.  The payload
    column is dropped right after slicing (the 100 TB sizing rule in
    stages/multimodal.py); rows-only check."""
    import numpy as np

    from elevant_ray.stages.multimodal import (frame_sample_batch,
                                               synth_media_batch)

    ds = _read(sf_dir, "documents", ["doc_id"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow")
    frames = media.map_batches(frame_sample_batch, batch_size=32,
                               batch_format="pyarrow")

    def stats(b: pa.Table) -> pa.Table:
        nb = np.array([len(f) for f in b.column("frame").to_pylist()],
                      np.int64)
        return pa.table({"doc_id": b.column("doc_id"),
                         "one": pa.array(np.ones(len(nb), np.int64)),
                         "nb": pa.array(nb, pa.int64())})

    from elevant_ray.stages.util import partial_group_agg

    agg = partial_group_agg(frames.map_batches(stats,
                                               batch_format="pyarrow"),
                            ["doc_id"], sum_cols=["one", "nb"],
                            combine="driver")
    import pandas as pd

    agg = agg.sort_values("doc_id").reset_index(drop=True)
    return pd.DataFrame({
        "doc_id": agg["doc_id"].astype("int64"),
        "n_frames_sampled": agg["one"].astype("int64"),
        "sampled_bytes": agg["nb"].astype("int64")})


def curated_shard_write(sf_dir: str):
    """Sink round-trip under the oracle gate: documents take their
    token-budget shard assignment (the docs_pack_shards prefix scan),
    WRITE as shard-partitioned Parquet under /tmp (the resumable
    layout — one directory per shard, a failed run skips finished
    partitions), then READ BACK and aggregate per shard.  The returned
    (shard, n_docs, total_chars) must match the oracle computed from
    the ORIGINAL table, so a bug in either the writer or the reader
    breaks the driver's correctness gate."""
    import os
    import shutil

    import numpy as np
    import pandas as pd

    import ray.data as rd

    from elevant_ray.stages.util import global_ordered_cumsum

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    empty = pd.DataFrame({"shard": pd.Series([], dtype="int64"),
                          "n_docs": pd.Series([], dtype="int64"),
                          "total_chars": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    cum = global_ordered_cumsum(ds, "doc_id", "n_chars")
    if cum is None:
        return empty

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int64())})
        c = np.asarray(b.column("cum").to_numpy(zero_copy_only=False),
                       np.int64)
        n = np.asarray(b.column("n_chars")
                       .to_numpy(zero_copy_only=False), np.int64)
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_chars": pa.array(n, pa.int64()),
                         "shard": pa.array((c - n) // 100_000,
                                           pa.int64())})

    from elevant_ray.stages.util import as_arrow

    assigned = as_arrow(cum).map_batches(assign, batch_format="pyarrow")
    out_dir = "/tmp/elevant_ray_out/shards"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    assigned.write_parquet(out_dir, partition_cols=["shard"])

    back = rd.read_parquet(out_dir)

    def agg(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "total_chars": pa.array([], pa.int64())})
        # hive partitioning reads the partition key back as string
        sh = np.array([int(s) for s in
                       b.column("shard").to_pylist()], np.int64)
        n = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = pa.table({"shard": pa.array(sh, pa.int64()),
                      "one": pa.array(np.ones(len(sh), np.int64)),
                      "n": pa.array(n, pa.int64())})
        g = t.group_by("shard").aggregate([("one", "sum"), ("n", "sum")])
        return g.rename_columns(["shard", "n_docs", "total_chars"])

    from elevant_ray.stages.util import partial_group_agg

    final = partial_group_agg(back.map_batches(agg,
                                               batch_format="pyarrow"),
                              ["shard"], sum_cols=["n_docs",
                                                   "total_chars"],
                              combine="driver")
    final = final.sort_values("shard").reset_index(drop=True)
    return pd.DataFrame({
        "shard": final["shard"].astype("int64"),
        "n_docs": final["n_docs"].astype("int64"),
        "total_chars": final["total_chars"].astype("int64")})


def doc_bigram_logprob(sf_dir: str):
    """Bigram language-model scoring with add-one smoothing: each
    document's Σ ln((c₁₂+1)/(c₁+V)) over its token bigrams, under the
    corpus's own counts — the next step up from the unigram LM filter.
    Bigram and unigram count tables broadcast once (vocabulary-
    bounded); scoring probes them per batch."""
    import numpy as np
    import pandas as pd

    import ray

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "n_bigrams": pd.Series([], dtype="int64"),
                          "logprob": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def uni_pairs(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import unigrams

        toks = []
        for t in b.column("text").to_pylist():
            toks.extend(unigrams(t))
        return pa.table({"w": pa.array(toks, pa.string())})

    def big_pairs(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import unigrams

        bgs = []
        for t in b.column("text").to_pylist():
            ts = unigrams(t)
            bgs.extend(f"{a} {b_}" for a, b_ in zip(ts, ts[1:]))
        return pa.table({"bg": pa.array(bgs, pa.string())})

    pre = ds.materialize()
    uc = partial_group_agg(pre.map_batches(uni_pairs,
                                           batch_format="pyarrow"),
                           ["w"], count_alias="c", combine="driver")
    if uc.empty:
        return empty
    bc = partial_group_agg(pre.map_batches(big_pairs,
                                           batch_format="pyarrow"),
                           ["bg"], count_alias="c", combine="driver")
    V = len(uc)
    umap = dict(zip(uc["w"], uc["c"].astype(int)))
    bmap = dict(zip(bc["bg"], bc["c"].astype(int))) if not bc.empty \
        else {}
    uref, bref = ray.put(umap), ray.put(bmap)

    def score(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import unigrams
        from elevant_ray.stages.util import cached_get

        um, bm = cached_get(uref), cached_get(bref)
        ids, nb, lp = [], [], []
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            ts = unigrams(text)
            if len(ts) < 2:
                continue
            s = 0.0
            for a, b_ in zip(ts, ts[1:]):
                c12 = bm[f"{a} {b_}"]
                c1 = um[a]
                s += np.log((1.0 * (c12 + 1)) / (c1 + V))
            ids.append(doc_id)
            nb.append(len(ts) - 1)
            lp.append(float(np.sign(s) * np.floor(abs(s) * 1e4 + 0.5)
                            / 1e4) + 0.0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_bigrams": pa.array(nb, pa.int64()),
                         "logprob": pa.array(lp, pa.float64())})

    return _det_sort(pre.map_batches(score, batch_format="pyarrow"),
                     "doc_id")


def events_daily_cycle_strength(sf_dir: str):
    """Strength of the 24-hour cycle in event arrivals: the first
    Fourier coefficient of the hour-of-day count profile, power =
    (a² + b²)/N² with a = Σ nₕ·cos(2πh/24), b = Σ nₕ·sin(2πh/24) —
    the seasonality detector.  Counts are exact; the 24-term
    trigonometric closure is term-identical with the oracle."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    HOUR_US = 3_600_000_000

    ds = _read(sf_dir, "events", ["ts"])
    empty = pd.DataFrame({"n": pd.Series([], dtype="int64"),
                          "cycle_power": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"h": pa.array((us // HOUR_US) % 24, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["h"], count_alias="n", combine="driver")
    g = g.sort_values("h").reset_index(drop=True)
    h = g["h"].to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    N = int(n.sum())
    ang = 2.0 * np.pi * h / 24.0
    a = float((n * np.cos(ang)).sum())
    b = float((n * np.sin(ang)).sum())
    power = (a * a + b * b) / ((1.0 * N) * N)
    return pd.DataFrame({
        "n": [np.int64(N)],
        "cycle_power": [float(np.floor(power * 1e6 + 0.5) / 1e6)
                        + 0.0]})


def nation_spearman(sf_dir: str):
    """Spearman rank correlation between customer balance and lifetime
    spend per nation — Pearson over exact integer MIDRANKS (2·midrank
    = 2·count-below + tie-size + 1, the Mann-Whitney half-unit trick),
    so every moment of the rank vectors is an exact int64 and only the
    final correlation divides.  Completes the rank-statistics family
    next to Kendall τ-b."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import np_columns, partial_group_agg

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                          "n": pd.Series([], dtype="int64"),
                          "spearman": pd.Series([], dtype="float64")})
    if cust.count() == 0:
        return empty

    def o_pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"o_custkey": pc.cast(b.column("o_custkey"),
                                              pa.int64()),
                         "y": pa.array(c, pa.int64())})

    spend = partial_group_agg(
        orders.map_batches(o_pre, batch_format="pyarrow"),
        ["o_custkey"], sum_cols=["y"], combine="driver")

    def c_pre(b: pa.Table) -> pa.Table:
        x = np.rint(b.column("c_acctbal")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"c_custkey": pc.cast(b.column("c_custkey"),
                                              pa.int64()),
                         "nk": pc.cast(b.column("c_nationkey"),
                                       pa.int64()),
                         "x": pa.array(x, pa.int64())})

    cols = np_columns(cust.map_batches(c_pre, batch_format="pyarrow"),
                      ["c_custkey", "nk", "x"])
    df = pd.DataFrame(cols).merge(spend, left_on="c_custkey",
                                  right_on="o_custkey", how="left")
    df["y"] = np.nan_to_num(df["y"].to_numpy(np.float64)).astype(np.int64)
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}

    def midranks2(a):
        # 2·midrank per element: 2·(#smaller) + tie-size + 1
        order = np.argsort(a, kind="stable")
        s = a[order]
        uniq, start = np.unique(s, return_index=True)
        cnt = np.diff(np.append(start, len(s)))
        r2u = 2 * start + cnt + 1
        idx = np.searchsorted(uniq, a)
        return r2u[idx].astype(np.int64)

    rows = []
    for nk, grp in df.groupby("nk"):
        x = grp["x"].to_numpy(np.int64)
        y = grp["y"].to_numpy(np.int64)
        n = len(x)
        if n < 2:
            continue
        rx = midranks2(x)
        ry = midranks2(y)
        sx, sy = int(rx.sum()), int(ry.sum())
        sxx = int((rx * rx).sum())
        syy = int((ry * ry).sum())
        sxy = int((rx * ry).sum())
        vx = (1.0 * n) * sxx - (1.0 * sx) * sx
        vy = (1.0 * n) * syy - (1.0 * sy) * sy
        if not (vx > 0 and vy > 0):
            continue
        rho = ((1.0 * n) * sxy - (1.0 * sx) * sy) \
            / (np.sqrt(vx) * np.sqrt(vy))
        rows.append((nation[int(nk)], n,
                     float(np.sign(rho) * np.floor(np.abs(rho) * 1e6
                                                   + 0.5) / 1e6) + 0.0))
    out = pd.DataFrame(rows, columns=["n_name", "n", "spearman"])
    return out.astype({"n": "int64"}) \
        .sort_values("n_name").reset_index(drop=True)


def hourly_click_purchase_corr24(sf_dir: str):
    """Rolling 24-hour cross-correlation between hourly click and
    purchase counts over the GAP-FILLED hour grid (absent hours count
    0 — a calendar join, not a row lag): the co-movement monitor.
    Windowed Σx, Σy, Σx², Σy², Σxy come from prefix-sum differences of
    exact integer counts; degenerate windows (zero variance) are
    NULL."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    HOUR_US = 3_600_000_000

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    empty = pd.DataFrame({"hour_us": pd.Series([], dtype="int64"),
                          "corr24": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        t = b.column("event_type")
        keep = pc.or_(pc.equal(t, pa.scalar("click")),
                      pc.equal(t, pa.scalar("purchase")))
        b = b.filter(keep)
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        isx = pc.equal(b.column("event_type"), pa.scalar("click")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"h": pa.array((us // HOUR_US) * HOUR_US,
                                       pa.int64()),
                         "x": pa.array(isx, pa.int64()),
                         "y": pa.array(1 - isx, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["h"], sum_cols=["x", "y"], combine="driver")
    if g.empty:
        return empty
    g = g.sort_values("h").reset_index(drop=True)
    hs = g["h"].to_numpy(np.int64)
    grid = np.arange(hs.min(), hs.max() + HOUR_US, HOUR_US)
    x = np.zeros(len(grid), np.int64)
    y = np.zeros(len(grid), np.int64)
    pos = (hs - hs.min()) // HOUR_US
    x[pos] = g["x"].to_numpy(np.int64)
    y[pos] = g["y"].to_numpy(np.int64)
    W = 24
    if len(grid) < W:
        return empty

    def win(a):
        cs = np.concatenate([[0], np.cumsum(a)])
        return cs[W:] - cs[:-W]

    sx, sy = win(x), win(y)
    sxx, syy = win(x * x), win(y * y)
    sxy = win(x * y)
    vx = (1.0 * W) * sxx - (1.0 * sx) * sx
    vy = (1.0 * W) * syy - (1.0 * sy) * sy
    with np.errstate(invalid="ignore", divide="ignore"):
        r = ((1.0 * W) * sxy - (1.0 * sx) * sy) \
            / (np.sqrt(vx) * np.sqrt(vy))
    ok = (vx > 0) & (vy > 0)
    r = np.where(ok, np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5)
                 / 1e6 + 0.0, np.nan)
    return pd.DataFrame({"hour_us": grid[W - 1:], "corr24": r})


def value_decile_type_matrix(sf_dir: str):
    """Contingency of event types across GLOBAL value deciles: decile
    cut points come exactly off the cents histogram (percentile_disc
    at k/10), every event lands in the decile of the highest cutpoint
    < its value, and the (decile, type) counts reduce through
    partials — the calibration-table shape joining the quantile and
    crosstab families."""
    import numpy as np
    import pandas as pd

    import ray

    from elevant_ray.stages.quantiles import grouped_quantiles
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])
    empty = pd.DataFrame({"decile": pd.Series([], dtype="int64"),
                          "event_type": pd.Series([], dtype="object"),
                          "n": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"event_type": b.column("event_type"),
                         "c": pa.array(c, pa.int64())})

    pre_ds = ds.map_batches(pre, batch_format="pyarrow").materialize()
    QS = tuple(i / 10 for i in range(1, 10))
    q = grouped_quantiles(pre_ds, "c", QS).to_pandas()
    cuts = np.sort(q["c"].to_numpy(np.int64))
    cref = ray.put(cuts)

    def bucket(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get

        cu = cached_get(cref)
        c = b.column("c").to_numpy(zero_copy_only=False)
        # decile d: # of cutpoints < value (ties at a cutpoint stay in
        # the lower decile — matches quantile_disc's right-closedness)
        d = np.searchsorted(cu, c, side="left")
        return pa.table({"decile": pa.array(d.astype(np.int64),
                                            pa.int64()),
                         "event_type": b.column("event_type")})

    cnt = partial_group_agg(pre_ds.map_batches(bucket,
                                               batch_format="pyarrow"),
                            ["decile", "event_type"], count_alias="n",
                            combine="driver")
    return cnt.sort_values(["decile", "event_type"]) \
        .reset_index(drop=True).astype({"decile": "int64",
                                        "n": "int64"})


def customer_recency_weighted_spend(sf_dir: str):
    """Recency-weighted customer value: each order contributes
    totalprice·0.99^(days before the corpus's max order date), summed
    per customer — top-20 (the CLV-style decay score).  The decay
    exponent is an exact integer day count; only pow and the weighted
    sum are float (term-identical with the oracle, rounded at 4)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import np_columns, partial_group_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                  "o_totalprice"])
    empty = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                          "n_orders": pd.Series([], dtype="int64"),
                          "weighted_spend":
                              pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty
    mx = int(np_columns(ds.map_batches(
        lambda b: pa.table({"m": pa.array(
            [int(b.column("o_orderdate").to_numpy(zero_copy_only=False)
             .astype("datetime64[D]").astype(np.int64).max())]
            if b.num_rows else [], pa.int64())}),
        batch_format="pyarrow"), ["m"])["m"].max())

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        w = (c / 100.0) * np.power(0.99, (mx - d).astype(np.float64))
        return pa.table({"ck": pc.cast(b.column("o_custkey"), pa.int64()),
                         "w": pa.array(w, pa.float64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["ck"], sum_cols=["w"], count_alias="n",
                            combine="driver")
    agg = agg.sort_values("ck").reset_index(drop=True)
    w4 = np.floor(agg["w"].to_numpy(np.float64) * 1e4 + 0.5) / 1e4 + 0.0
    out = pd.DataFrame({"c_custkey": agg["ck"].astype("int64"),
                        "n_orders": agg["n"].astype("int64"),
                        "weighted_spend": w4})
    return out.sort_values(["weighted_spend", "c_custkey"],
                           ascending=[False, True]).head(20) \
        .reset_index(drop=True)


def customer_third_order(sf_dir: str):
    """Each customer's THIRD order (nth-value window, n = 3, by order
    date then key): its date and price — the milestone-event report.
    One customer-keyed shuffle; the 3rd row per group falls out of a
    vectorized position index, no per-customer Python."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                  "o_orderdate", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"ck": pc.cast(b.column("o_custkey"), pa.int64()),
                         "ok": pc.cast(b.column("o_orderkey"),
                                       pa.int64()),
                         "d": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "c_custkey": pd.Series([], dtype="int64"),
            "third_orderkey": pd.Series([], dtype="int64"),
            "third_day": pd.Series([], dtype="int64"),
            "third_price": pd.Series([], dtype="float64")})
        if not len(g):
            return out_empty
        g = g.sort_values(["ck", "d", "ok"], kind="stable")
        ck = g["ck"].to_numpy(np.int64)
        starts = np.flatnonzero(
            np.concatenate([[True], ck[1:] != ck[:-1]]))
        sizes = np.diff(np.append(starts, len(ck)))
        has3 = sizes >= 3
        idx3 = starts[has3] + 2
        return pd.DataFrame({
            "c_custkey": ck[idx3],
            "third_orderkey": g["ok"].to_numpy(np.int64)[idx3],
            "third_day": g["d"].to_numpy(np.int64)[idx3],
            "third_price": g["c"].to_numpy(np.int64)[idx3] / 100.0})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "ck", per_bucket)
    return _det_sort(as_arrow(out), "c_custkey")


def events_type_lift_matrix(sf_dir: str):
    """Association lift between event types at the user level:
    lift(a, b) = P(user did both)·N / (P(a)·P(b)) from user-type
    incidence — the market-basket lift matrix over behavior instead of
    baskets.  Incidence reduces to per-user bitmasks (types are
    enum-bounded), pair counts are popcount arithmetic on the driver,
    and the single float division is term-identical with the
    oracle."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    empty = pd.DataFrame({"t1": pd.Series([], dtype="object"),
                          "t2": pd.Series([], dtype="object"),
                          "n_both": pd.Series([], dtype="int64"),
                          "lift": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    inc = partial_group_agg(ds, ["user_id", "event_type"],
                            count_alias="c", combine="driver")
    piv = inc.pivot_table(index="user_id", columns="event_type",
                          values="c", aggfunc="sum", fill_value=0)
    types = sorted(piv.columns.tolist())
    m = (piv[types].to_numpy(np.int64) > 0)
    N = len(piv)
    rows = []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            n1 = int(m[:, i].sum())
            n2 = int(m[:, j].sum())
            nb = int((m[:, i] & m[:, j]).sum())
            if n1 == 0 or n2 == 0:
                continue
            lift = (1.0 * nb * N) / ((1.0 * n1) * n2)
            rows.append((types[i], types[j], nb,
                         float(np.floor(lift * 1e6 + 0.5) / 1e6) + 0.0))
    return pd.DataFrame(rows, columns=["t1", "t2", "n_both", "lift"]) \
        .astype({"n_both": "int64"})


def customer_order_gap_median(sf_dir: str):
    """Median inter-order gap (days) per customer with ≥ 3 orders —
    the reorder-cadence report.  Gaps are exact integer day diffs in
    (date, key) order; the median is percentile_disc (lower middle)
    per customer, vectorized inside one customer-keyed shuffle."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                  "o_orderdate"])

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        return pa.table({"ck": pc.cast(b.column("o_custkey"), pa.int64()),
                         "ok": pc.cast(b.column("o_orderkey"),
                                       pa.int64()),
                         "d": pa.array(d, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "c_custkey": pd.Series([], dtype="int64"),
            "n_gaps": pd.Series([], dtype="int64"),
            "median_gap_days": pd.Series([], dtype="int64")})
        if not len(g):
            return out_empty
        g = g.sort_values(["ck", "d", "ok"], kind="stable")
        ck = g["ck"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        same = ck[1:] == ck[:-1]
        gaps = (d[1:] - d[:-1])[same]
        guser = ck[1:][same]
        res = pd.DataFrame({"ck": guser, "gap": gaps})
        out = []
        for ckv, grp in res.groupby("ck", sort=False):
            gv = np.sort(grp["gap"].to_numpy(np.int64))
            if len(gv) < 2:
                continue
            # percentile_disc(0.5): smallest value with cum share ≥ .5
            med = int(gv[(len(gv) + 1) // 2 - 1])
            out.append((int(ckv), len(gv), med))
        return pd.DataFrame(out, columns=["c_custkey", "n_gaps",
                                          "median_gap_days"]) \
            .astype({"c_custkey": "int64", "n_gaps": "int64",
                     "median_gap_days": "int64"}) if out else out_empty

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "ck", per_bucket)
    return _det_sort(as_arrow(out), "c_custkey")


def events_weekend_lift(sf_dir: str):
    """Weekend-vs-weekday lift of event value: counts, exact-cents
    means and their ratio (the dow-seasonality sanity check).  Weekend
    = ISO day ≥ 6, computed as (epoch_day + 3) mod 7 ≥ 5 with Monday
    aligned to 0 — the same closed-form weekday arithmetic as the
    business-day query."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    DAY_US = 86_400_000_000

    ds = _read(sf_dir, "events", ["ts", "value"])
    empty = pd.DataFrame({"n_weekday": pd.Series([], dtype="int64"),
                          "n_weekend": pd.Series([], dtype="int64"),
                          "avg_weekday": pd.Series([], dtype="float64"),
                          "avg_weekend": pd.Series([], dtype="float64"),
                          "lift": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        dow = (us // DAY_US + 3) % 7
        we = (dow >= 5).astype(np.int64)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"we": pa.array(we, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["we"], sum_cols=["c"], count_alias="n",
                          combine="driver")
    gd = {int(r["we"]): (int(r["n"]), int(r["c"]))
          for _, r in g.iterrows()}
    nw, cw = gd.get(0, (0, 0))
    ne, ce = gd.get(1, (0, 0))
    if nw == 0 or ne == 0:
        return empty
    aw = (1.0 * cw) / nw / 100.0
    ae = (1.0 * ce) / ne / 100.0
    lift = ae / aw
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"n_weekday": [np.int64(nw)],
                         "n_weekend": [np.int64(ne)],
                         "avg_weekday": [r6(aw)],
                         "avg_weekend": [r6(ae)],
                         "lift": [r6(lift)]})


def nation_part_coverage(sf_dir: str):
    """Revenue concentration per nation: the smallest number of parts
    covering ≥ 50% of the nation's lineitem revenue (integer predicate
    2·cum ≥ total — no float threshold), plus the covered share — the
    per-group coverage-curve search (vocab_coverage_90 generalized to
    groups).  (nation, part) revenue partials are one exchange; the
    per-nation walk is a driver lexsort over dimension-bounded rows."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    line = _read(sf_dir, "lineitem",
                 ["l_suppkey", "l_partkey", "l_extendedprice",
                  "l_discount"])
    empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                          "k_parts": pd.Series([], dtype="int64"),
                          "covered": pd.Series([], dtype="int64"),
                          "total": pd.Series([], dtype="int64")})
    if line.count() == 0:
        return empty
    supp = {r["s_suppkey"]: r["s_nationkey"]
            for r in _read(sf_dir, "supplier",
                           ["s_suppkey", "s_nationkey"]).take_all()}
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()}
    import ray
    sref = ray.put(supp)

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get

        sm = cached_get(sref)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        nk = np.array([sm[int(s)] for s in sk], np.int64)
        return pa.table({"nk": pa.array(nk, pa.int64()),
                         "pk": pc.cast(b.column("l_partkey"),
                                       pa.int64()),
                         "rev": pa.array(_rev_cents(b), pa.int64())})

    agg = partial_group_agg(
        line.map_batches(pre, batch_format="pyarrow"),
        ["nk", "pk"], sum_cols=["rev"], combine="driver")
    rows = []
    for nk, grp in agg.groupby("nk"):
        r = grp["rev"].to_numpy(np.int64)
        p = grp["pk"].to_numpy(np.int64)
        order = np.lexsort((p, -r))
        r = r[order]
        cum = np.cumsum(r)
        tot = int(cum[-1])
        if tot <= 0:
            continue
        k = int(np.argmax(2 * cum >= tot)) + 1
        rows.append((nation[int(nk)], k, int(cum[k - 1]), tot))
    out = pd.DataFrame(rows, columns=["n_name", "k_parts", "covered",
                                      "total"])
    return out.astype({"k_parts": "int64", "covered": "int64",
                       "total": "int64"}) \
        .sort_values("n_name").reset_index(drop=True)


def orders_1998_filter_pushdown(sf_dir: str):
    """Predicate pushdown at the READ: the 1998 order count and
    revenue with the date filter passed INTO read_parquet (row groups
    outside the range never leave storage — the prune-at-the-read
    rule), not applied post-scan.  The aggregate itself is one
    partial-sum pass."""
    import datetime

    import numpy as np
    import pandas as pd
    import pyarrow.dataset as pads

    import ray.data as rd

    flt = ((pads.field("o_orderdate")
            >= pads.scalar(datetime.datetime(1998, 1, 1)))
           & (pads.field("o_orderdate")
              < pads.scalar(datetime.datetime(1999, 1, 1))))
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"],
                         filter=flt)
    empty = pd.DataFrame({"n_orders": pd.Series([], dtype="int64"),
                          "revenue": pd.Series([], dtype="float64")})

    from elevant_ray.stages.util import np_columns

    parts = np_columns(ds.map_batches(
        lambda b: pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "c": pa.array([int(np.rint(
                b.column("o_totalprice").to_numpy(zero_copy_only=False)
                * 100).astype(np.int64).sum()) if b.num_rows else 0],
                pa.int64())}),
        batch_format="pyarrow"), ["n", "c"])
    n = int(parts["n"].sum())
    if n == 0:
        return empty
    return pd.DataFrame({"n_orders": [np.int64(n)],
                         "revenue": [int(parts["c"].sum()) / 100.0]})


def embedding_dispersion(sf_dir: str):
    """Mean squared pairwise distance of the embedding cloud WITHOUT
    any pair enumeration: E‖x−y‖² = 2·(mean‖x‖² − ‖mean x‖²), closed
    from per-component sums — the O(n·d) dispersion diagnostic that
    replaces an O(n²) distance scan.  float32 → double is exact; sums
    reduce through per-batch partials."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import np_columns

    ds = _read(sf_dir, "embeddings", ["embedding"])
    empty = pd.DataFrame({"n": pd.Series([], dtype="int64"),
                          "mean_sq_distance":
                              pd.Series([], dtype="float64")})

    def partials(b: pa.Table) -> pa.Table:
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if b.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "ssq": pa.array([], pa.float64()),
                             "comp": pa.array([], pa.list_(
                                 pa.float64()))})
        offs = col.offsets.to_numpy(zero_copy_only=False)
        vals = col.values.to_numpy(zero_copy_only=False).astype(
            np.float64)
        d = int(offs[1] - offs[0])
        m = vals.reshape(-1, d)
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "ssq": pa.array([float((m * m).sum())], pa.float64()),
            "comp": pa.array([m.sum(axis=0).tolist()],
                             pa.list_(pa.float64()))})

    rows = [b for b in ds.map_batches(
        partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow")]
    ns = sum(int(x) for b in rows for x in b.column("n").to_pylist())
    if ns == 0:
        return empty
    ssq = sum(float(x) for b in rows
              for x in b.column("ssq").to_pylist())
    comps = [np.array(x) for b in rows
             for x in b.column("comp").to_pylist()]
    total = np.sum(np.stack(comps), axis=0)
    mu = total / ns
    msd = 2.0 * (ssq / ns - float((mu * mu).sum()))
    return pd.DataFrame({
        "n": [np.int64(ns)],
        "mean_sq_distance": [float(np.floor(msd * 1e6 + 0.5) / 1e6)
                             + 0.0]})


def session_path_top10(sf_dir: str):
    """Top-10 session entry paths: the first (up to) three event types
    of each 30-minute session joined with '>', ranked by session count
    (ties → path asc) — sequence-pattern mining lite.  One user-keyed
    shuffle sessionizes and clips paths vectorized; path counts reduce
    through partials."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (as_arrow, bucketed_group_apply,
                                         partial_group_agg)

    GAP_US = 1_800_000_000

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])
    empty = pd.DataFrame({"path": pd.Series([], dtype="object"),
                          "n_sessions": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64()),
                         "event_type": b.column("event_type")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"path": pd.Series([], dtype="object")})
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        new = np.concatenate(
            [[True], (uid[1:] != uid[:-1])
             | (us[1:] - us[:-1] > GAP_US)])
        sid = np.cumsum(new)
        t = g["event_type"].to_numpy()
        res = pd.DataFrame({"sid": sid, "t": t})
        res["pos"] = res.groupby("sid", sort=False).cumcount()
        head = res[res["pos"] < 3]
        paths = head.groupby("sid", sort=False)["t"] \
            .agg(lambda s: ">".join(s))
        return pd.DataFrame({"path": paths.to_numpy()})

    sess = bucketed_group_apply(ds.map_batches(pre,
                                               batch_format="pyarrow"),
                                "user_id", per_bucket)
    cnt = partial_group_agg(as_arrow(sess), ["path"],
                            count_alias="n_sessions", combine="driver")
    cnt = cnt.sort_values(["n_sessions", "path"],
                          ascending=[False, True]).head(10)
    return cnt.reset_index(drop=True).astype({"n_sessions": "int64"})


def customer_tercile_migration(sf_dir: str):
    """Segment-migration matrix: customers active in BOTH 1997 and
    1998 move between spend terciles (NTILE(3) by (spend desc, key)
    within each year); the 3×3 transition counts quantify churn
    between value tiers.  One partial-pushed exchange; tercile
    assignment is the SQL-NTILE kernel on the driver over the
    dimension-bounded actives."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import ntile_assign, partial_group_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                  "o_totalprice"])
    empty = pd.DataFrame({"tercile_1997": pd.Series([], dtype="int64"),
                          "tercile_1998": pd.Series([], dtype="int64"),
                          "n_customers": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        y = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[Y]") \
            .astype(np.int64) + 1970
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"ck": pc.cast(b.column("o_custkey"), pa.int64()),
                      "y": pa.array(y, pa.int64()),
                      "c": pa.array(c, pa.int64())})
        keep = pc.or_(pc.equal(t.column("y"),
                               pa.scalar(1997, pa.int64())),
                      pc.equal(t.column("y"),
                               pa.scalar(1998, pa.int64())))
        return t.filter(keep)

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["ck", "y"], sum_cols=["c"],
                            combine="driver")
    if agg.empty:
        return empty
    piv = agg.pivot(index="ck", columns="y", values="c")
    if 1997 not in piv.columns or 1998 not in piv.columns:
        return empty
    piv = piv.dropna()
    if piv.empty:
        return empty
    ck = piv.index.to_numpy(np.int64)
    n = len(ck)

    def terciles(c):
        c = c.astype(np.int64)
        order = np.lexsort((ck, -c))
        ranks = np.empty(n, np.int64)
        ranks[order] = np.arange(n)
        return ntile_assign(np.full(n, n, np.int64), ranks, 3)

    t97 = terciles(piv[1997].to_numpy())
    t98 = terciles(piv[1998].to_numpy())
    out = pd.DataFrame({"tercile_1997": t97, "tercile_1998": t98}) \
        .groupby(["tercile_1997", "tercile_1998"]).size() \
        .reset_index(name="n_customers")
    return out.astype({"tercile_1997": "int64",
                       "tercile_1998": "int64",
                       "n_customers": "int64"}) \
        .sort_values(["tercile_1997", "tercile_1998"]) \
        .reset_index(drop=True)


def daily_revenue_trailing30(sf_dir: str):
    """Trailing-30-day revenue per calendar day over the gap-filled
    day grid (a calendar window, not a 30-ROW window — missing days
    widen nothing).  Exact cents via prefix-sum differences; emitted
    from the 30th grid day on."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"day": pd.Series([], dtype="int64"),
                          "revenue_30d": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["day"], sum_cols=["c"], combine="driver")
    agg = agg.sort_values("day").reset_index(drop=True)
    days = agg["day"].to_numpy(np.int64)
    grid = np.arange(days.min(), days.max() + 1)
    c = np.zeros(len(grid), np.int64)
    c[days - days.min()] = agg["c"].to_numpy(np.int64)
    W = 30
    if len(grid) < W:
        return empty
    cs = np.concatenate([[0], np.cumsum(c)])
    win = cs[W:] - cs[:-W]
    return pd.DataFrame({"day": grid[W - 1:],
                         "revenue_30d": win / 100.0})


def part_brand_size_median_price(sf_dir: str):
    """Exact median retail price per (brand, size) cell — the two-key
    grouped percentile_disc through the histogram-quantile stage (no
    sort, the only exchange moves the (brand, size, cents) histogram)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.quantiles import grouped_quantiles

    ds = _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])
    empty = pd.DataFrame({"p_brand": pd.Series([], dtype="object"),
                          "p_size": pd.Series([], dtype="int64"),
                          "median_price": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("p_retailprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"p_brand": b.column("p_brand"),
                         "p_size": pc.cast(b.column("p_size"),
                                           pa.int64()),
                         "c": pa.array(c, pa.int64())})

    q = grouped_quantiles(ds.map_batches(pre, batch_format="pyarrow"),
                          "c", (0.5,),
                          group_cols=["p_brand", "p_size"]).to_pandas()
    q = q[q["q"] == 0.5]
    out = pd.DataFrame({"p_brand": q["p_brand"],
                        "p_size": q["p_size"].astype("int64"),
                        "median_price": q["c"].astype(np.int64) / 100.0})
    return out.sort_values(["p_brand", "p_size"]).reset_index(drop=True)


def user_active_coverage(sf_dir: str):
    """Interval-union coverage per user: total microseconds covered by
    the union of [ts, ts+30 min) activity windows — overlapping
    windows merge (the islands-and-gaps union, exact integer µs).
    Inside one keyed shuffle: island starts where a window begins past
    the running max end; per-island spans sum vectorized."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    WIN_US = 1_800_000_000

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "event_id": b.column("event_id"),
                         "us": pa.array(us, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "n_islands": pd.Series([], dtype="int64"),
            "covered_us": pd.Series([], dtype="int64")})
        if not len(g):
            return out_empty
        g = g.sort_values(["user_id", "us", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        s = g["us"].to_numpy(np.int64)
        e = s + WIN_US
        # running max end per user; a new island starts when the
        # window begins at/after it
        emax = pd.Series(e).groupby(uid, sort=False).cummax() \
            .to_numpy(np.int64)
        first = np.concatenate([[True], uid[1:] != uid[:-1]])
        new = first | (s >= np.concatenate([[0], emax[:-1]]))
        isl = np.cumsum(new)
        res = pd.DataFrame({"uid": uid, "isl": isl, "s": s, "e": e})
        per_isl = res.groupby("isl", sort=False).agg(
            uid=("uid", "first"), start=("s", "min"), end=("e", "max"))
        span = per_isl["end"].to_numpy(np.int64) \
            - per_isl["start"].to_numpy(np.int64)
        out = pd.DataFrame({"user_id": per_isl["uid"].to_numpy(np.int64),
                            "span": span})
        agg = out.groupby("user_id", sort=False).agg(
            n_islands=("span", "size"), covered_us=("span", "sum"))
        return agg.reset_index().astype({"n_islands": "int64",
                                         "covered_us": "int64"})

    out = bucketed_group_apply(ds.map_batches(pre, batch_format="pyarrow"),
                               "user_id", per_bucket)
    return _det_sort(as_arrow(out), "user_id")


def user_stickiness(sf_dir: str):
    """DAU/MAU stickiness: mean daily active users over the observed
    span divided by total distinct users — the engagement-density KPI.
    Distinct (day, user) incidence reduces through partials; the
    closure is three exact integers and one division."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    DAY_US = 86_400_000_000

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    empty = pd.DataFrame({"n_days": pd.Series([], dtype="int64"),
                          "mau": pd.Series([], dtype="int64"),
                          "avg_dau": pd.Series([], dtype="float64"),
                          "stickiness": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"day": pa.array(us // DAY_US, pa.int64()),
                         "user_id": pc.cast(b.column("user_id"),
                                            pa.int64())})

    du = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                           ["day", "user_id"], count_alias="c",
                           combine="driver")
    n_days = int(du["day"].nunique())
    mau = int(du["user_id"].nunique())
    dau_sum = len(du)  # distinct (day, user) pairs
    avg_dau = (1.0 * dau_sum) / n_days
    stick = avg_dau / mau
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"n_days": [np.int64(n_days)],
                         "mau": [np.int64(mau)],
                         "avg_dau": [r6(avg_dau)],
                         "stickiness": [r6(stick)]})


def error_burst_peak(sf_dir: str):
    """Peak error burst: the maximum number of 'error' events in any
    sliding 60-minute window at minute resolution, plus the earliest
    window start that attains it — the incident-detection scan.
    Per-minute error counts reduce through partials; the sliding
    window is a prefix-sum difference over the gap-filled minute grid
    (bounded by the corpus span)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    MIN_US = 60_000_000

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    empty = pd.DataFrame({"peak_errors": pd.Series([], dtype="int64"),
                          "window_start_us":
                              pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"),
                              pa.scalar("error")))
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"m": pa.array(us // MIN_US, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["m"], count_alias="n", combine="driver")
    if g.empty:
        return empty
    g = g.sort_values("m").reset_index(drop=True)
    ms = g["m"].to_numpy(np.int64)
    grid = np.arange(ms.min(), ms.max() + 1)
    c = np.zeros(len(grid), np.int64)
    c[ms - ms.min()] = g["n"].to_numpy(np.int64)
    W = min(60, len(grid))
    cs = np.concatenate([[0], np.cumsum(c)])
    win = cs[W:] - cs[:-W] if len(grid) >= W else cs[-1:]
    peak = int(win.max())
    pos = int(np.argmax(win))  # earliest window with the peak
    start = int(grid[pos]) * MIN_US
    return pd.DataFrame({"peak_errors": [np.int64(peak)],
                         "window_start_us": [np.int64(start)]})


def orders_empirical_rule(sf_dir: str):
    """Empirical-rule check on order totals: the share of orders
    within μ±1σ and μ±2σ (sample σ from exact integer moments) — the
    normality sanity report.  Two passes: one for moments, one
    counting against the broadcast float bounds (both sides evaluate
    the identical bound expressions, so the integer counts match
    exactly)."""
    import numpy as np
    import pandas as pd

    import ray

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    empty = pd.DataFrame({"n": pd.Series([], dtype="int64"),
                          "share_1sigma": pd.Series([], dtype="float64"),
                          "share_2sigma":
                              pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        # whole-dollar domain: Σc² on cents would pass 2^63 by sf0.01
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        return pa.table({"k": pa.array(np.zeros(len(c), np.int64)),
                         "s": pa.array(c, pa.int64()),
                         "q": pa.array(c * c, pa.int64())})

    pre_ds = ds.map_batches(pre, batch_format="pyarrow").materialize()
    m = partial_group_agg(pre_ds, ["k"], sum_cols=["s", "q"],
                          count_alias="n", combine="driver")
    n = int(m["n"].iloc[0])
    s = int(m["s"].iloc[0])
    q = int(m["q"].iloc[0])
    if n < 2:
        return empty
    mu = (1.0 * s) / n
    sigma = np.sqrt((q - (1.0 * s) * s / n) / (n - 1))
    bounds = ray.put((mu - sigma, mu + sigma,
                      mu - 2.0 * sigma, mu + 2.0 * sigma))

    def cnt(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get

        lo1, hi1, lo2, hi2 = cached_get(bounds)
        c = b.column("s").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "c1": pa.array([int(((c >= lo1) & (c <= hi1)).sum())],
                           pa.int64()),
            "c2": pa.array([int(((c >= lo2) & (c <= hi2)).sum())],
                           pa.int64())})

    from elevant_ray.stages.util import np_columns

    parts = np_columns(pre_ds.map_batches(cnt, batch_format="pyarrow"),
                       ["c1", "c2"])
    c1 = int(parts["c1"].sum())
    c2 = int(parts["c2"].sum())
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"n": [np.int64(n)],
                         "share_1sigma": [r6((1.0 * c1) / n)],
                         "share_2sigma": [r6((1.0 * c2) / n)]})


def events_value_iqr_outliers(sf_dir: str):
    """Tukey-fence outlier counts on event values: Q1/Q3 exact off the
    cents histogram (percentile_disc), fences at ±1.5·IQR, and the
    below/above counts from one more pass against the broadcast float
    fences — the boxplot-rule screen (complements the 3×MAD
    detector)."""
    import numpy as np
    import pandas as pd

    import ray

    from elevant_ray.stages.quantiles import grouped_quantiles
    from elevant_ray.stages.util import np_columns

    ds = _read(sf_dir, "events", ["value"])
    empty = pd.DataFrame({"n": pd.Series([], dtype="int64"),
                          "n_low": pd.Series([], dtype="int64"),
                          "n_high": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"c": pa.array(c, pa.int64())})

    pre_ds = ds.map_batches(pre, batch_format="pyarrow").materialize()
    q = grouped_quantiles(pre_ds, "c", (0.25, 0.75)).to_pandas()
    qs = {r["q"]: int(r["c"]) for _, r in q.iterrows()}
    q1, q3 = qs[0.25], qs[0.75]
    iqr = q3 - q1
    lo = q1 - 1.5 * iqr
    hi = q3 + 1.5 * iqr
    bref = ray.put((lo, hi))

    def cnt(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get

        lo_, hi_ = cached_get(bref)
        c = b.column("c").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "nl": pa.array([int((c < lo_).sum())], pa.int64()),
            "nh": pa.array([int((c > hi_).sum())], pa.int64())})

    parts = np_columns(pre_ds.map_batches(cnt, batch_format="pyarrow"),
                       ["n", "nl", "nh"])
    return pd.DataFrame({
        "n": [np.int64(int(parts["n"].sum()))],
        "n_low": [np.int64(int(parts["nl"].sum()))],
        "n_high": [np.int64(int(parts["nh"].sum()))]})


def source_jsd_matrix(sf_dir: str):
    """Pairwise Jensen–Shannon divergence between ALL sources' unigram
    distributions — the full corpus-mixture distance matrix (the
    two-language JSD generalized to every source pair).  One scan
    emits (token, source) count partials; each pair's closure runs the
    identical guarded log2 term as the oracle over the shared
    vocabulary."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["source", "text"])
    empty = pd.DataFrame({"s1": pd.Series([], dtype="object"),
                          "s2": pd.Series([], dtype="object"),
                          "jsd": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.functions.tokens import unigrams

        srcs, toks = [], []
        for src, text in zip(b.column("source").to_pylist(),
                             b.column("text").to_pylist()):
            ts = unigrams(text)
            srcs.extend([src] * len(ts))
            toks.extend(ts)
        return pa.table({"s": pa.array(srcs, pa.string()),
                         "token": pa.array(toks, pa.string())})

    h = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["s", "token"], count_alias="c",
                          combine="driver")
    if h.empty:
        return empty
    piv = h.pivot_table(index="token", columns="s", values="c",
                        aggfunc="sum", fill_value=0).sort_index()
    srcs = sorted(piv.columns.tolist())
    tots = {s: int(piv[s].sum()) for s in srcs}
    rows = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            s1, s2 = srcs[i], srcs[j]
            a = piv[s1].to_numpy(np.int64)
            b = piv[s2].to_numpy(np.int64)
            keep = (a > 0) | (b > 0)
            a, b = a[keep], b[keep]
            A, B = tots[s1], tots[s2]
            if A == 0 or B == 0:
                continue
            pa_ = (1.0 * a) / A
            pb_ = (1.0 * b) / B
            with np.errstate(divide="ignore", invalid="ignore"):
                ta = np.where(a > 0,
                              0.5 * pa_ * np.log2(2.0 * pa_
                                                  / (pa_ + pb_)), 0.0)
                tb = np.where(b > 0,
                              0.5 * pb_ * np.log2(2.0 * pb_
                                                  / (pa_ + pb_)), 0.0)
            jsd = float((ta + tb).sum())
            rows.append((s1, s2,
                         float(np.floor(jsd * 1e6 + 0.5) / 1e6) + 0.0))
    return pd.DataFrame(rows, columns=["s1", "s2", "jsd"])


def orders_quarter_index(sf_dir: str):
    """Quarterly revenue indexed to the first quarter = 100 — the
    chained index-number report.  Quarterly sums are exact cents; the
    index is one float ratio per quarter (identical expression both
    sides)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"year": pd.Series([], dtype="int64"),
                          "quarter": pd.Series([], dtype="int64"),
                          "revenue": pd.Series([], dtype="float64"),
                          "index100": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[M]")
        m = d.astype(np.int64)  # months since epoch
        y = m // 12 + 1970
        q = (m % 12) // 3 + 1
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"year": pa.array(y, pa.int64()),
                         "quarter": pa.array(q, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    agg = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["year", "quarter"], sum_cols=["c"],
                            combine="driver")
    agg = agg.sort_values(["year", "quarter"]).reset_index(drop=True)
    c = agg["c"].to_numpy(np.int64)
    base = int(c[0])
    if base <= 0:
        return empty
    idx = 100.0 * c / base
    return pd.DataFrame({
        "year": agg["year"].astype("int64"),
        "quarter": agg["quarter"].astype("int64"),
        "revenue": c / 100.0,
        "index100": np.floor(idx * 1e6 + 0.5) / 1e6 + 0.0})


def events_cumulative_users(sf_dir: str):
    """Cumulative distinct-user curve: for each day with at least one
    first-time user, how many users have EVER been seen up to and
    including that day, plus that day's first-time count.
    COUNT(DISTINCT) OVER an unbounded-preceding
    frame collapses to per-user min-day (one user-keyed exchange)
    followed by a calendar-bounded day count + driver prefix sum; the
    oracle recomputes it from the definition (a correlated distinct
    count per day), not from the first-day identity."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    empty = pd.DataFrame({
        "day": pd.Series([], dtype="datetime64[us]"),
        "new_users": pd.Series([], dtype="int64"),
        "cum_users": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "day": pa.array(days, pa.int64())})

    first = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                              ["user_id"], min_cols=["day"])
    per_day = partial_group_agg(first, ["day"], count_alias="new_users",
                                combine="driver")
    per_day = per_day.sort_values("day").reset_index(drop=True)
    nu = per_day["new_users"].to_numpy(np.int64)
    return pd.DataFrame({
        "day": per_day["day"].to_numpy(np.int64)
            .astype("datetime64[D]").astype("datetime64[us]"),
        "new_users": nu,
        "cum_users": np.cumsum(nu)})


def orders_changepoint(sf_dir: str):
    """Single change-point detection on the daily-revenue series: the
    split day maximizing the between-segment sum of squares (binary
    segmentation's first step).  Daily sums are exact cents from one
    partial-agg scan; the ≤calendar-bounded argmax runs on the driver
    with Python-int prefix sums, and the BSS ordering key is the SAME
    double expression the oracle sorts by (HUGEINT squares → double
    division), so the argmax and its tie-break (earliest day) agree
    bit-for-bit."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({
        "split_day": pd.Series([], dtype="datetime64[us]"),
        "n_before": pd.Series([], dtype="int64"),
        "n_after": pd.Series([], dtype="int64"),
        "mean_before": pd.Series([], dtype="float64"),
        "mean_after": pd.Series([], dtype="float64"),
        "bss": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        days = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"day": pa.array(days, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    daily = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                              ["day"], sum_cols=["c"], combine="driver")
    daily = daily.sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(np.int64)
    cents = [int(x) for x in daily["c"].to_numpy(np.int64)]
    n = len(cents)
    if n < 2:
        return empty
    total = sum(cents)
    # exact Python-int prefix sums; BSS ordering key evaluated as the
    # identical double expression the oracle uses (exact-int square →
    # correctly-rounded double → double division → double add)
    best = None
    s1 = 0
    for k in range(n - 1):
        s1 += cents[k]
        n1 = k + 1
        s2 = total - s1
        n2 = n - n1
        key = float(s1 * s1) / n1 + float(s2 * s2) / n2
        if best is None or key > best[0]:
            best = (key, k, s1, n1, s2, n2)
    key, k, s1, n1, s2, n2 = best
    bss = (key - float(total * total) / n) / 10000.0
    rnd6 = lambda x: float(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5) / 1e6) \
        + 0.0
    return pd.DataFrame({
        "split_day": np.array([days[k]], dtype="datetime64[D]")
            .astype("datetime64[us]"),
        "n_before": [np.int64(n1)], "n_after": [np.int64(n2)],
        "mean_before": [rnd6(1.0 * s1 / n1 / 100.0)],
        "mean_after": [rnd6(1.0 * s2 / n2 / 100.0)],
        "bss": [rnd6(bss)]})


def docs_cramers_v(sf_dir: str):
    """Scalar chi-square independence statistic + Cramér's V effect
    size for the lang × source contingency table.  Cell contributions
    are the same per-cell double arithmetic as docs_lang_source_chi2;
    the cross-cell summation — normally forbidden (float order) — is
    made deterministic by folding in sorted (lang, source) order on
    BOTH sides (the oracle uses an ORDER BY aggregate)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "source"])
    cells = partial_group_agg(
        ds.map_batches(lambda b: b.select(["lang", "source"]),
                       batch_format="pyarrow"),
        ["lang", "source"], count_alias="observed", combine="driver")
    empty = pd.DataFrame({"n": pd.Series([], dtype="int64"),
                          "chi2": pd.Series([], dtype="float64"),
                          "cramers_v": pd.Series([], dtype="float64")})
    if cells.empty:
        return empty
    cells = cells.sort_values(["lang", "source"]).reset_index(drop=True)
    n = int(cells["observed"].sum())
    row_tot = cells.groupby("lang")["observed"].transform("sum").to_numpy(
        np.int64)
    col_tot = cells.groupby("source")["observed"].transform("sum").to_numpy(
        np.int64)
    o = cells["observed"].to_numpy(np.int64)
    expected = row_tot.astype(np.float64) * col_tot / n
    contrib = (o - expected) ** 2 / expected
    chi2 = 0.0
    for x in contrib:          # sequential fold in (lang, source) order
        chi2 += float(x)
    r = cells["lang"].nunique()
    c = cells["source"].nunique()
    dof = min(r, c) - 1
    v = float(np.sqrt(chi2 / (n * dof))) if dof > 0 else float("nan")
    rnd6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"n": [np.int64(n)], "chi2": [rnd6(chi2)],
                         "cramers_v": [rnd6(v) if v == v else v]})


def events_type_trend(sf_dir: str):
    """Per-event-type linear trend of monthly volume: OLS slope of
    count-per-month against a 0-based month index, per type.  Both the
    x (month ordinal) and y (count) moments are exact int64 sums, so
    the slope is ONE double division of exact integers on both sides —
    no float accumulation anywhere.  The monthly rollup is one
    partial-agg scan; slopes are computed per type on the driver
    (type × calendar bounded)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["event_type", "ts"])
    empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_months": pd.Series([], dtype="int64"),
        "slope_per_month": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        m = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[M]").astype(np.int64)
        return pa.table({"event_type": b.column("event_type"),
                         "month": pa.array(m, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["event_type", "month"], count_alias="y",
                          combine="driver")
    rows = []
    for et, sub in g.groupby("event_type", sort=True):
        # 0-based month index relative to the GLOBAL min month, so the
        # oracle can derive the identical x without per-type offsets
        x = sub["month"].to_numpy(np.int64) - int(g["month"].min())
        y = sub["y"].to_numpy(np.int64)
        n = len(sub)
        sx = int(x.sum()); sy = int(y.sum())
        sxy = int((x * y).sum()); sxx = int((x * x).sum())
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = float(num) / float(den) if den != 0 else float("nan")
        rows.append((et, n,
                     float(np.sign(slope)
                           * np.floor(abs(slope) * 1e6 + 0.5) / 1e6) + 0.0
                     if slope == slope else slope))
    return pd.DataFrame(rows, columns=["event_type", "n_months",
                                       "slope_per_month"])


def events_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value curve: users grouped by first-active
    month, cumulative total event value per (cohort_month,
    month_offset) — the companion of events_cohort_matrix with exact
    cents sums instead of headcounts.  The per-user first-month join
    happens inside the same user-keyed buckets as the monthly value
    partials (one exchange); the calendar²-bounded cells cumsum on the
    driver in exact int64 cents."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    empty = pd.DataFrame({
        "cohort_month": pd.Series([], dtype="datetime64[us]"),
        "month_offset": pd.Series([], dtype="int64"),
        "value_total": pd.Series([], dtype="float64"),
        "value_cum": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        m = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[M]").astype(np.int64)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "month": pa.array(m, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a user co-locate here: first month + offsets in
        # one pass, reduced to per-(cohort, offset) partials
        first = df.groupby("user_id")["month"].transform("min")
        out = pd.DataFrame({
            "cohort_month": first,
            "month_offset": df["month"].to_numpy(np.int64)
                - first.to_numpy(np.int64),
            "c": df["c"]})
        return (out.groupby(["cohort_month", "month_offset"],
                            as_index=False)["c"].sum())

    cells = partial_group_agg(
        bucketed_group_apply(
            ds.map_batches(pre, batch_format="pyarrow"), "user_id",
            per_user),
        ["cohort_month", "month_offset"], sum_cols=["c"],
        combine="driver")
    cells = cells.sort_values(["cohort_month", "month_offset"]) \
        .reset_index(drop=True)
    c = cells["c"].to_numpy(np.int64)
    cum = cells.groupby("cohort_month")["c"].cumsum().to_numpy(np.int64)
    return pd.DataFrame({
        "cohort_month": cells["cohort_month"].to_numpy(np.int64)
            .astype("datetime64[M]").astype("datetime64[us]"),
        "month_offset": cells["month_offset"].astype("int64"),
        "value_total": c / 100.0,
        "value_cum": cum / 100.0})


def part_name_damerau(sf_dir: str):
    """Transposition-aware pairwise string scoring: all part pairs
    sharing a brand, kept at unrestricted Damerau-Levenshtein ≤ 4
    (scoring.damerau_levenshtein is DuckDB-identical, differentially
    tested).  Same one-bucket-shuffle blocking as part_name_similarity;
    the DP memoizes over distinct name pairs, so the Python-level cost
    is O(vocab²) regardless of pair count."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.scoring import damerau_pairs
    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_name"])
    empty = pd.DataFrame({"p_brand": pd.Series([], dtype="object"),
                          "pk1": pd.Series([], dtype="int64"),
                          "pk2": pd.Series([], dtype="int64"),
                          "dl": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for brand, gg in g.groupby("p_brand"):
            gg = gg.sort_values("p_partkey")
            pk = gg["p_partkey"].to_numpy()
            nm = gg["p_name"].to_numpy(dtype=object)
            i, j = np.triu_indices(len(pk), k=1)
            dl = damerau_pairs(nm[i], nm[j])
            m = dl <= 4
            outs.append(pd.DataFrame({
                "p_brand": brand, "pk1": pk[i][m], "pk2": pk[j][m],
                "dl": dl[m]}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    return _det_sort(bucketed_group_apply(ds, "p_brand", per_bucket),
                     ["p_brand", "pk1", "pk2"])


def user_seq_pattern(sf_dir: str):
    """Sequence-pattern matching over per-user ordered event histories:
    encode each user's (ts, event_id)-ordered event types as a string
    of initials and flag users whose lifetime matches
    view→…→error→…→purchase ('v.*e.*p').  One user-keyed bucket
    shuffle; inside the bucket the sequence build is a grouped join and
    the regex is one vectorized pandas str.contains over ≤ users-in-
    bucket strings — never a per-event Python loop."""
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "n_events": pd.Series([], dtype="int64"),
                          "hit": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        c = g["event_type"].str[0]
        seq = c.groupby(g["user_id"]).agg("".join)
        return pd.DataFrame({
            "user_id": seq.index.to_numpy("int64"),
            "n_events": seq.str.len().to_numpy("int64"),
            "hit": seq.str.contains("v.*e.*p", regex=True)
                   .to_numpy("int64")})

    return _det_sort(bucketed_group_apply(ds, "user_id", per_bucket),
                     "user_id")


def error_next_purchase_asof(sf_dir: str):
    """FORWARD as-of join (time-to-resolution): each error event joined
    to the same user's earliest purchase strictly after it (NULL if
    none).  One user-keyed bucket shuffle; inside the bucket one global
    composite-key searchsorted (user band × µs offset) answers every
    error's probe against the sorted purchase array — the mirror image
    of the backward as-of in stages/asof.py."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])
    empty = pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "next_purchase_ts": pd.Series([], dtype="datetime64[us]")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        if not len(g):
            return empty
        codes = pd.factorize(g["user_id"])[0].astype(np.int64)
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        rel = us - us.min() + 1
        band = int(rel.max()) + 2
        comp = codes * band + rel
        is_pur = (g["event_type"] == "purchase").to_numpy()
        pcomp = comp[is_pur]
        pus = us[is_pur]
        err = (g["event_type"] == "error").to_numpy()
        # first purchase with comp strictly greater ⇒ strictly-later ts
        # (comp ties ⇔ same user AND same µs, which 'right' skips)
        idx = np.searchsorted(pcomp, comp[err], side="right")
        ok = idx < len(pcomp)
        same = np.zeros(err.sum(), bool)
        same[ok] = (pcomp[idx[ok]] // band) == (comp[err][ok] // band)
        nxt = np.full(err.sum(), np.iinfo(np.int64).min, np.int64)
        nxt[same] = pus[idx[same]]
        return pd.DataFrame({
            "event_id": g.loc[err, "event_id"].to_numpy("int64"),
            "user_id": g.loc[err, "user_id"].to_numpy("int64"),
            "ts": g.loc[err, "ts"].to_numpy("datetime64[us]"),
            "next_purchase_ts": pd.Series(
                nxt.view("datetime64[us]")).mask(~same)})

    return _ts_us(_det_sort(bucketed_group_apply(ds, "user_id",
                                                 per_bucket),
                            "event_id"),
                  ["ts", "next_purchase_ts"])


def customer_order_overlap_pairs(sf_dir: str):
    """Variable-length interval self-join: each order spans
    [orderdate, orderdate + (orderkey % 20 + 1) days]; per customer,
    the count of overlapping order pairs.  One custkey bucket shuffle;
    within the bucket ONE composite-key searchsorted counts, for every
    interval, the later-starting same-customer intervals it overlaps
    (sorted by start, pair i<j overlaps ⟺ start_j ≤ end_i) — O(k log k)
    per customer, no pair materialization."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                  "o_orderdate"])
    empty = pd.DataFrame({"o_custkey": pd.Series([], dtype="int64"),
                          "n_orders": pd.Series([], dtype="int64"),
                          "n_pairs": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="stable").reset_index(drop=True)
        if not len(g):
            return empty
        codes = pd.factorize(g["o_custkey"])[0].astype(np.int64)
        day = g["o_orderdate"].to_numpy().astype(
            "datetime64[D]").astype(np.int64)
        length = g["o_orderkey"].to_numpy(np.int64) % 20 + 1
        rel = day - day.min() + 1
        band = int(rel.max()) + 22  # end = start + ≤20 stays in band
        comp_s = codes * band + rel
        comp_e = comp_s + length
        # every row before global index i (earlier bands + same-band
        # earlier starts) satisfies comp_s ≤ comp_e_i, and no later
        # band does (end stays inside the band), so ss − i − 1 counts
        # exactly the same-customer later-starting overlaps
        later = np.searchsorted(comp_s, comp_e, side="right") \
            - np.arange(len(g)) - 1
        out = pd.DataFrame({"o_custkey": g["o_custkey"],
                            "one": np.ones(len(g), np.int64),
                            "p": later})
        return (out.groupby("o_custkey", as_index=False)
                .agg(n_orders=("one", "sum"), n_pairs=("p", "sum")))

    res = bucketed_group_apply(ds, "o_custkey", per_bucket)
    out = _det_sort(res, "o_custkey")
    if isinstance(out, pa.Table):
        return pa.table({
            "o_custkey": pc.cast(out.column("o_custkey"), pa.int64()),
            "n_orders": pc.cast(out.column("n_orders"), pa.int64()),
            "n_pairs": pc.cast(out.column("n_pairs"), pa.int64())})
    return out


def embedding_dim_argmax(sf_dir: str):
    """Positional argmax over a list<float> column: for each embedding
    dimension, the maximum component value and the smallest vec_id
    attaining it.  Each batch reshapes the flat values buffer and emits
    one dim-bounded (max, argmin-id-at-max) partial — pure comparisons,
    so float equality against the oracle is exact; the combine is a
    tiny driver reduction over batches × dims rows."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame({"dim": pd.Series([], dtype="int64"),
                          "max_val": pd.Series([], dtype="float64"),
                          "vec_id": pd.Series([], dtype="int64")})
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    if ds.count() == 0:
        return empty

    BIG = np.iinfo(np.int64).max

    def partial(b: pa.Table) -> pa.Table:
        arr = b.column("embedding").combine_chunks()
        n = len(arr)
        v = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(v) // n
        X = v.reshape(n, d)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mx = X.max(axis=0)
        amin = np.where(X == mx[None, :], ids[:, None], BIG).min(axis=0)
        return pa.table({"dim": pa.array(np.arange(1, d + 1), pa.int64()),
                         "mx": pa.array(mx),
                         "aid": pa.array(amin, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    gmax = parts.groupby("dim")["mx"].transform("max")
    top = parts[parts["mx"] == gmax]
    out = (top.groupby("dim", as_index=False)
           .agg(max_val=("mx", "max"), vec_id=("aid", "min"))
           .sort_values("dim").reset_index(drop=True))
    return out.astype({"dim": "int64", "max_val": "float64",
                       "vec_id": "int64"})


def customer_spend_index_first(sf_dir: str):
    """first_value() window: each order's price as a ratio to the SAME
    customer's first-ever order price (growth index to baseline).  One
    custkey bucket shuffle; inside the bucket the per-customer first is
    a grouped transform over the (date, key)-sorted frame — no per-key
    Python."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                  "o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                          "o_custkey": pd.Series([], dtype="int64"),
                          "spend_index": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="stable")
        first = g.groupby("o_custkey")["o_totalprice"].transform("first")
        r = g["o_totalprice"].to_numpy() / first.to_numpy()
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy("int64"),
            "o_custkey": g["o_custkey"].to_numpy("int64"),
            # same double quotient as the oracle ⇒ identical SQL ROUND
            # via the sign-aware floor (half away from zero)
            "spend_index": np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5)
                / 1e6})

    return _det_sort(bucketed_group_apply(ds, "o_custkey", per_bucket),
                     "o_orderkey")


def events_weekend_type_mi(sf_dir: str):
    """Mutual-information decomposition of the event_type × weekend
    contingency table: per-cell MI contributions (n/N)·log2(nN/(nt·nw))
    from one partial-aggregated count pass.  Cells are emitted
    individually (never float-summed across rows) so the oracle's
    single-expression float arithmetic is reproduced term by term."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    empty = pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                          "wk": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "mi_contrib": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        wk = ((d + 3) % 7 >= 5).astype(np.int64)  # == isodow(ts) >= 6
        return pa.table({"event_type": b.column("event_type"),
                         "wk": pa.array(wk, pa.int64()),
                         "one": pa.array(np.ones(b.num_rows, np.int64))})

    c = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["event_type", "wk"], sum_cols=["one"],
                          combine="driver")
    c.columns = ["event_type", "wk", "n"]
    c = c.sort_values(["event_type", "wk"]).reset_index(drop=True)
    n = c["n"].to_numpy(np.int64)
    nn = int(n.sum())
    nt = c.groupby("event_type")["n"].transform("sum").to_numpy(np.int64)
    nw = c.groupby("wk")["n"].transform("sum").to_numpy(np.int64)
    mi = (1.0 * n / nn) * np.log2((1.0 * n * nn) / (1.0 * nt * nw))
    c["mi_contrib"] = np.sign(mi) * np.floor(np.abs(mi) * 1e6 + 0.5) \
        / 1e6 + 0.0
    return c.astype({"wk": "int64", "n": "int64"})


def embedding_neighbor_dot(sf_dir: str):
    """lead() window over a vector column: dot product of each
    embedding with the NEXT vector in vec_id order.  No global sort —
    vec_ids hash into contiguous range buckets, each bucket computes
    its internal consecutive dots after one co-locating shuffle
    (float64 row-shift product), and the ≤256 cross-bucket seams are
    stitched on the driver from per-bucket boundary rows (min/max
    vec_id WITH vectors) reduced out of the same pass."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import key_range_buckets

    empty = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                          "next_vec_id": pd.Series([], dtype="int64"),
                          "dot": pd.Series([], dtype="float64")})
    from elevant_ray.stages.util import scale_cutoff

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .materialize()
    if ds.count() == 0:
        return empty

    def rnd(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    if ds.size_bytes() <= scale_cutoff(256 << 20):
        # neighbor pairs of a small table close on the driver in one
        # sorted pass; the range-bucket path below is the 100 TB plan
        df = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
        if len(df) < 2:
            return empty
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy("int64")[:-1],
            "next_vec_id": df["vec_id"].to_numpy("int64")[1:],
            "dot": rnd((X[:-1] * X[1:]).sum(axis=1))})

    rng = key_range_buckets(ds, "vec_id", 256)
    if rng is None:
        return empty
    lo, width = rng

    def add_bkt(b: pa.Table) -> pa.Table:
        k = b.column("vec_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "rbkt", pa.array((k - lo) // width, pa.int64()))

    def internal(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        if len(g) < 2:
            return empty
        X = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        d = (X[:-1] * X[1:]).sum(axis=1)
        return pd.DataFrame({
            "vec_id": g["vec_id"].to_numpy("int64")[:-1],
            "next_vec_id": g["vec_id"].to_numpy("int64")[1:],
            "dot": rnd(d)})

    bk = ds.map_batches(add_bkt, batch_format="pyarrow")
    inner = (bk.groupby("rbkt")
             .map_groups(internal, batch_format="pandas").to_pandas())

    def boundary(b: pa.Table) -> pa.Table:
        df = b.select(["rbkt", "vec_id", "embedding"]).to_pandas()
        lo_r = df.loc[df.groupby("rbkt")["vec_id"].idxmin()]
        hi_r = df.loc[df.groupby("rbkt")["vec_id"].idxmax()]
        lo_r = lo_r.assign(which=0)
        hi_r = hi_r.assign(which=1)
        return pa.Table.from_pandas(pd.concat([lo_r, hi_r]),
                                    preserve_index=False)

    bd = bk.map_batches(boundary, batch_format="pyarrow").to_pandas()
    firsts = bd[bd["which"] == 0].loc[
        lambda d: d.groupby("rbkt")["vec_id"].idxmin()] \
        .sort_values("rbkt")
    lasts = bd[bd["which"] == 1].loc[
        lambda d: d.groupby("rbkt")["vec_id"].idxmax()] \
        .sort_values("rbkt")
    seams = []
    fl = firsts.reset_index(drop=True)
    la = lasts.reset_index(drop=True)
    for i in range(len(la) - 1):
        a = la.iloc[i]
        b = fl.iloc[i + 1]
        d = float((np.asarray(a["embedding"], np.float64)
                   * np.asarray(b["embedding"], np.float64)).sum())
        seams.append((int(a["vec_id"]), int(b["vec_id"]), float(rnd(d))))
    out = pd.concat(
        [inner, pd.DataFrame(seams, columns=["vec_id", "next_vec_id",
                                             "dot"])],
        ignore_index=True)
    if out.empty:
        return empty
    return (out.sort_values("vec_id").reset_index(drop=True)
            .astype({"vec_id": "int64", "next_vec_id": "int64"}))


def orders_price_page2(sf_dir: str):
    """Deep pagination over a global order (rows ranked 101–200 by
    price desc, key asc): each batch keeps its local top-200 — a
    superset-safe partial, since a row outside every batch top-200
    cannot be in the global top-200 — and the driver re-ranks the
    ≤ batches × 200 survivors exactly.  No global sort."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                          "o_orderkey": pd.Series([], dtype="int64"),
                          "o_totalprice": pd.Series([], dtype="float64")})
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    if ds.count() == 0:
        return empty

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True],
            kind="stable")
        return pa.Table.from_pandas(df.head(200), preserve_index=False)

    surv = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
            .sort_values(["o_totalprice", "o_orderkey"],
                         ascending=[False, True], kind="stable")
            .reset_index(drop=True))
    page = surv.iloc[100:200].reset_index(drop=True)
    return pd.DataFrame({
        "rank": np.arange(101, 101 + len(page), dtype=np.int64),
        "o_orderkey": page["o_orderkey"].to_numpy("int64"),
        "o_totalprice": page["o_totalprice"].to_numpy("float64")})


def docs_source_checksum(sf_dir: str):
    """Order-independent integrity checksum per source: XOR of each
    text's 64-bit md5 tail (DuckDB ``md5_number_lower`` semantics —
    little-endian lower 8 digest bytes, bit-identical, differentially
    anchored by the oracle) plus the row count.  XOR partials are
    associative and commutative, so each batch reduces to ≤ sources
    rows and the driver combine is exact regardless of batch order —
    the audit primitive for verifying a 100 TB copy without moving
    data."""
    import hashlib

    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "documents", ["source", "text"])
    empty = pd.DataFrame({"source": pd.Series([], dtype="object"),
                          "checksum": pd.Series([], dtype="object"),
                          "n_docs": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def partial(b: pa.Table) -> pa.Table:
        tx = b.column("text").to_pylist()
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode()).digest()[8:16],
                            "little") for t in tx),
            np.uint64, len(tx)).view(np.int64)
        df = pd.DataFrame({"source": b.column("source").to_pylist(),
                           "h": h})
        g = df.groupby("source")["h"].agg(
            x=lambda s: np.bitwise_xor.reduce(s.to_numpy()), n="size")
        return pa.table({"source": pa.array(g.index, pa.string()),
                         "x": pa.array(g["x"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("source").agg(
        x=("x", lambda s: np.bitwise_xor.reduce(s.to_numpy(np.int64))),
        n_docs=("n", "sum")).sort_index().reset_index()
    out["checksum"] = [f"{v:016X}" for v in
                       out["x"].to_numpy(np.int64).view(np.uint64)]
    return out[["source", "checksum", "n_docs"]].astype(
        {"n_docs": "int64"})


def sessions_peak_concurrency(sf_dir: str):
    """Sweep-line max concurrency: sessionize every user (30-min gap,
    same islands as events_sessions), then find the peak number of
    simultaneously-active sessions and the earliest µs attaining it.
    Interval endpoints reduce to ±1 deltas grouped per (µs, side) —
    starts sort before ends at equal time, so closed-interval overlap
    is counted — and the running sum closes on the driver under the
    cutoff or through the distributed prefix-scan primitive beyond
    it."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import (bucketed_group_apply, np_columns,
                                         partial_group_agg, scale_cutoff)

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    empty = pd.DataFrame({"peak": pd.Series([], dtype="int64"),
                          "peak_t_us": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gaps = g.groupby("user_id")["ts"].diff().dt.total_seconds()
        new = (gaps.isna() | (gaps > 1800)).astype("int64")
        sid = new.groupby(g["user_id"]).cumsum()
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        iv = (pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                            "sid": sid.to_numpy(), "us": us})
              .groupby(["user_id", "sid"])["us"].agg(["min", "max"]))
        st = iv["min"].to_numpy(np.int64)
        en = iv["max"].to_numpy(np.int64)
        # side 0 = session start (+1), side 1 = end (−1): starts sort
        # first at equal µs ⇒ closed-interval concurrency
        return pd.DataFrame({
            "t": np.concatenate([st, en]),
            "side": np.concatenate([np.zeros(len(st), np.int64),
                                    np.ones(len(en), np.int64)]),
            "d": np.concatenate([np.ones(len(st), np.int64),
                                 np.full(len(en), -1, np.int64)])})

    deltas = bucketed_group_apply(ds, "user_id", per_bucket)
    if ds.size_bytes() <= scale_cutoff(16 << 30):
        df = partial_group_agg(deltas, ["t", "side"], sum_cols=["d"],
                               combine="driver")
        df = df.sort_values(["t", "side"]).reset_index(drop=True)
        cum = df["d"].to_numpy(np.int64).cumsum()
        peak = int(cum.max())
        at = (df["side"].to_numpy(np.int64) == 0) & (cum == peak)
        return pd.DataFrame({
            "peak": np.array([peak], np.int64),
            "peak_t_us": np.array([int(df["t"].to_numpy()[at].min())],
                                  np.int64)})

    from elevant_ray.stages.util import global_ordered_cumsum
    import ray.data as rd

    grp = partial_group_agg(deltas, ["t", "side"], sum_cols=["d"],
                            combine="dataset")
    if not hasattr(grp, "map_batches"):
        grp = rd.from_pandas(grp)

    def keyed(b: pa.Table) -> pa.Table:
        t = b.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("side").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"k": pa.array(t * 2 + s, pa.int64()),
                         "d": pc.cast(b.column("d"), pa.int64())})

    cs = global_ordered_cumsum(grp.map_batches(keyed,
                                               batch_format="pyarrow"),
                               "k", "d")
    arr = np_columns(cs, ["k", "cum"])
    k = arr["k"].astype(np.int64)
    cum = arr["cum"].astype(np.int64)
    peak = int(cum.max())
    at = (k % 2 == 0) & (cum == peak)
    return pd.DataFrame({"peak": np.array([peak], np.int64),
                         "peak_t_us": np.array([int((k[at] // 2).min())],
                                               np.int64)})


def supplier_clustering_coeff(sf_dir: str):
    """Global clustering coefficient of the supplier co-supply graph:
    3·triangles / wedges, wedges = Σ deg·(deg−1)/2 over co-supply
    degrees.  The triangle count reuses the cosupply_triangles plan
    (dense-adjacency matmul / wedge co-group, scale-gated there); the
    degree pass dedupes part-supplier edges once and counts distinct
    co-suppliers per node."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.graph import (bipartite_codes_batch,
                                          cooccurrence_pairs,
                                          dense_cooccurrence_adjacency)
    from elevant_ray.stages.util import (bucketed_group_apply, np_columns,
                                         partial_group_agg, scale_cutoff,
                                         within_group_pairs)

    empty = pd.DataFrame({"n_tri": pd.Series([], dtype="int64"),
                          "n_wedges": pd.Series([], dtype="int64"),
                          "clustering_coeff": pd.Series([],
                                                        dtype="float64")})
    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    if line.count() == 0:
        return empty

    tri = int(pd.DataFrame(cosupply_triangles(sf_dir))
              ["n_triangles"].iloc[0])

    mask = np.int64((1 << 21) - 1)
    eds = line.map_batches(
        lambda b: bipartite_codes_batch(b, "l_partkey", "l_suppkey"),
        batch_format="pyarrow").materialize()

    if eds.size_bytes() <= scale_cutoff(256 << 20):
        comp = np.unique(np_columns(eds, ["comp"])["comp"]
                         .astype(np.int64))
        dense = dense_cooccurrence_adjacency(comp)
        if dense is not None:
            _, A = dense
            deg = A.sum(axis=0).astype(np.int64)
        else:
            pairs = cooccurrence_pairs(comp)
            _, deg = np.unique(
                np.concatenate([pairs >> 21, pairs & mask]),
                return_counts=True)
            deg = deg.astype(np.int64)
    else:
        # globally dedupe (part, supp) edges, expand to distinct
        # co-supply pairs per part bucket, dedupe pairs, count
        # endpoint occurrences (the neighborhood-jaccard lesson:
        # per-batch unique is only a local dedup)
        deduped = _distinct_int(eds, "comp", cutoff=0)
        import ray.data as rd

        if not hasattr(deduped, "map_batches"):
            deduped = rd.from_pandas(deduped)

        def re_part(b: pa.Table) -> pa.Table:
            cv = b.column("comp").to_numpy(zero_copy_only=False)
            return pa.table({"part": pa.array(cv >> 21, pa.int64()),
                             "comp": b.column("comp")})

        def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
            comp = np.unique(g["comp"].to_numpy(np.int64))
            part = comp >> 21
            starts = np.flatnonzero(
                np.concatenate([[True], part[1:] != part[:-1]]))
            sizes = np.diff(np.append(starts, len(part)))
            i, j = within_group_pairs(starts, sizes)
            pair = np.unique(((comp[i] & mask) << 21) + (comp[j] & mask))
            return pd.DataFrame({"pair": pair})

        pr = bucketed_group_apply(
            deduped.map_batches(re_part, batch_format="pyarrow"),
            "part", part_pairs)
        upairs = _distinct_int(pr, "pair", cutoff=0)
        if not hasattr(upairs, "map_batches"):
            upairs = rd.from_pandas(upairs)

        def endpoints(b: pa.Table) -> pa.Table:
            pv = b.column("pair").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({"s": pa.array(
                np.concatenate([pv >> 21, pv & mask]), pa.int64())})

        dd = partial_group_agg(
            upairs.map_batches(endpoints, batch_format="pyarrow"),
            ["s"], count_alias="d", combine="driver")
        deg = dd["d"].to_numpy(np.int64)

    wedges = int((deg * (deg - 1) // 2).sum())
    if wedges == 0:
        return empty
    cc = 3.0 * tri / wedges
    return pd.DataFrame({
        "n_tri": np.array([tri], np.int64),
        "n_wedges": np.array([wedges], np.int64),
        "clustering_coeff": np.array(
            [np.sign(cc) * np.floor(abs(cc) * 1e6 + 0.5) / 1e6])})


def customer_max_drawdown(sf_dir: str):
    """Window composition — running max then aggregate over its
    residual: per customer, the largest drop of an order's price below
    the running price peak in (orderdate, orderkey) order.  One custkey
    bucket shuffle; cummax and the residual are grouped vectorized
    transforms in exact integer cents."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                  "o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"o_custkey": pd.Series([], dtype="int64"),
                          "max_drawdown": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="stable")
        cents = np.rint(g["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        run = (pd.Series(cents).groupby(g["o_custkey"].to_numpy())
               .cummax().to_numpy(np.int64))
        dd = pd.DataFrame({"o_custkey": g["o_custkey"].to_numpy("int64"),
                           "d": run - cents})
        out = dd.groupby("o_custkey", as_index=False)["d"].max()
        return pd.DataFrame({
            "o_custkey": out["o_custkey"].astype("int64"),
            "max_drawdown": out["d"].to_numpy(np.int64) / 100.0})

    return _det_sort(bucketed_group_apply(ds, "o_custkey", per_bucket),
                     "o_custkey")


def embedding_top_pairs(sf_dir: str):
    """All-pairs similarity search: the global top-20 embedding pairs
    by dot product (vec_id1 < vec_id2), ranked on the ROUNDED score
    with id tie-breaks so the oracle's ORDER BY matches exactly.  Each
    (row-block × column-block) tile is one float64 BLAS gram matmul
    emitting only its local top-20 — a superset-safe partial — and the
    driver re-ranks ≤ tiles × 20 survivors.  No pair list ever
    materializes."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import np_columns, scale_cutoff

    empty = pd.DataFrame({"vec_id1": pd.Series([], dtype="int64"),
                          "vec_id2": pd.Series([], dtype="int64"),
                          "dot": pd.Series([], dtype="float64")})
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .materialize()
    if ds.count() == 0:
        return empty

    def rnd(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def topk_of(ids1, X1, ids2, X2, same: bool) -> pd.DataFrame:
        G = X1 @ X2.T
        if same:
            iu = np.triu_indices(len(ids1), k=1)
            i, j, d = iu[0], iu[1], G[iu]
        else:
            i, j = np.unravel_index(np.arange(G.size), G.shape)
            d = G.ravel()
        d = rnd(d)
        a, b = ids1[i], ids2[j]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        if len(d) > 20:
            # O(n) prefilter: keep everything tied-or-above the 20th
            # largest rounded score, then lexsort only the survivors
            thr = np.partition(d, len(d) - 20)[len(d) - 20]
            keep = d >= thr
            d, lo, hi = d[keep], lo[keep], hi[keep]
        order = np.lexsort((hi, lo, -d))[:20]
        return pd.DataFrame({"vec_id1": lo[order], "vec_id2": hi[order],
                             "dot": d[order]})

    if ds.size_bytes() <= scale_cutoff(64 << 20):
        df = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy(np.int64)
        out = topk_of(ids, X, ids, X, True)
    else:
        # tile the gram: broadcast the (sorted) full matrix once via
        # ray.put, stream row-blocks against it, keep per-tile top-20
        import ray

        df = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy(np.int64)
        xref = ray.put(X)
        iref = ray.put(ids)

        @ray.remote
        def tile(r0, r1):
            XX = ray.get(xref)
            II = ray.get(iref)
            G = XX[r0:r1] @ XX.T
            rows, cols = G.shape
            # keep only j > i (upper triangle of the full gram)
            gi = np.repeat(np.arange(rows, dtype=np.int64) + r0, cols)
            gj = np.tile(np.arange(cols, dtype=np.int64), rows)
            m = gj > gi
            d = rnd(G.ravel()[m])
            lo = II[gi[m]]
            hi = II[gj[m]]
            order = np.lexsort((hi, lo, -d))[:20]
            return pd.DataFrame({"vec_id1": lo[order],
                                 "vec_id2": hi[order], "dot": d[order]})

        step = max(1, (1 << 25) // max(1, X.shape[0]))
        futs = [tile.remote(r, min(r + step, len(ids)))
                for r in range(0, len(ids), step)]
        out = pd.concat(ray.get(futs), ignore_index=True)

    out = (out.sort_values(["dot", "vec_id1", "vec_id2"],
                           ascending=[False, True, True], kind="stable")
           .head(20).reset_index(drop=True))
    return out.astype({"vec_id1": "int64", "vec_id2": "int64"})


def docs_jsonl_roundtrip(sf_dir: str):
    """JSONL sink + source fidelity: write the documents table to
    line-delimited JSON with Ray's write_json, re-read it with
    read_json, and aggregate the re-read rows (per-source count, char
    total, and order-independent md5-tail XOR checksum).  The oracle
    computes the same aggregate from the original parquet — equality
    proves the JSON round-trip is lossless, including unicode and
    embedded newlines."""
    import hashlib
    import os
    import shutil

    import numpy as np
    import pandas as pd
    import ray.data as rd

    ds = _read(sf_dir, "documents",
               ["doc_id", "text", "source", "n_chars"])
    empty = pd.DataFrame({"source": pd.Series([], dtype="object"),
                          "n_docs": pd.Series([], dtype="int64"),
                          "total_chars": pd.Series([], dtype="int64"),
                          "checksum": pd.Series([], dtype="object")})
    if ds.count() == 0:
        return empty

    out_dir = f"/tmp/elevant_ray_jsonl_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_json(out_dir)
    try:
        back = rd.read_json(out_dir)

        def partial(b: pa.Table) -> pa.Table:
            tx = b.column("text").to_pylist()
            h = np.fromiter(
                (int.from_bytes(hashlib.md5(t.encode()).digest()[8:16],
                                "little") for t in tx),
                np.uint64, len(tx)).view(np.int64)
            df = pd.DataFrame({
                "source": b.column("source").to_pylist(),
                "h": h,
                "nc": b.column("n_chars").to_numpy(zero_copy_only=False)
                    .astype(np.int64)})
            g = df.groupby("source").agg(
                x=("h", lambda s: np.bitwise_xor.reduce(
                    s.to_numpy(np.int64))),
                n=("h", "size"), tc=("nc", "sum"))
            return pa.table({"source": pa.array(g.index, pa.string()),
                             "x": pa.array(g["x"].to_numpy(np.int64)),
                             "n": pa.array(g["n"].to_numpy(np.int64)),
                             "tc": pa.array(g["tc"].to_numpy(np.int64))})

        parts = back.map_batches(partial,
                                 batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    out = parts.groupby("source").agg(
        x=("x", lambda s: np.bitwise_xor.reduce(s.to_numpy(np.int64))),
        n_docs=("n", "sum"), total_chars=("tc", "sum")) \
        .sort_index().reset_index()
    out["checksum"] = [f"{v:016X}" for v in
                       out["x"].to_numpy(np.int64).view(np.uint64)]
    return out[["source", "n_docs", "total_chars", "checksum"]].astype(
        {"n_docs": "int64", "total_chars": "int64"})


def docs_cdc_diff(sf_dir: str):
    """Change-data-capture diff: compare the current documents table
    against a deterministically synthesized prior state (text perturbed
    at doc_id%10==7, rows doc_id%9==4 absent, extra -doc_id rows at
    doc_id%11==5) and classify every key as insert / update / delete /
    unchanged.  Both sides reduce to (doc_id, 64-bit md5 tail) inside
    one map pass, so the diff join moves fingerprints, never text; the
    classification closes in a key-bucketed co-group."""
    import hashlib

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    empty = pd.DataFrame({"op": pd.Series([], dtype="object"),
                          "n": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def fp(texts):
        return np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode()).digest()[8:16],
                            "little") for t in texts),
            np.uint64, len(texts)).view(np.int64)

    def both_sides(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tx = b.column("text").to_pylist()
        new_h = fp(tx)
        st_tx = [t + "X" if i % 10 == 7 else t
                 for i, t in zip(ids.tolist(), tx)]
        st_h = fp(st_tx)
        keep = ids % 9 != 4
        extra = ids % 11 == 5
        return pa.table({
            "doc_id": pa.array(np.concatenate(
                [ids, ids[keep], -ids[extra]]), pa.int64()),
            "h": pa.array(np.concatenate(
                [new_h, st_h[keep], st_h[extra]]), pa.int64()),
            "side": pa.array(np.concatenate(
                [np.zeros(len(ids), np.int64),
                 np.ones(int(keep.sum()), np.int64),
                 np.ones(int(extra.sum()), np.int64)]), pa.int64())})

    rows = ds.map_batches(both_sides, batch_format="pyarrow")

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        # align the two sides by sorted searchsorted — never through a
        # nullable merge, which would upcast the 64-bit hashes to
        # float64 and lose the bits that distinguish near-collisions
        new = g[g["side"] == 0].sort_values("doc_id")
        st = g[g["side"] == 1].sort_values("doc_id")
        nid = new["doc_id"].to_numpy(np.int64)
        nh = new["h"].to_numpy(np.int64)
        sid = st["doc_id"].to_numpy(np.int64)
        sh = st["h"].to_numpy(np.int64)
        pos = np.searchsorted(sid, nid)
        safe = np.minimum(pos, max(len(sid) - 1, 0))
        in_st = (pos < len(sid)) & (len(sid) > 0) \
            & (sid[safe] == nid) if len(sid) else np.zeros(len(nid), bool)
        eq = nh[in_st] == sh[pos[in_st]]
        pos2 = np.searchsorted(nid, sid)
        safe2 = np.minimum(pos2, max(len(nid) - 1, 0))
        in_new = (pos2 < len(nid)) & (len(nid) > 0) \
            & (nid[safe2] == sid) if len(nid) else np.zeros(len(sid),
                                                            bool)
        counts = {"insert": int((~in_st).sum()),
                  "delete": int((~in_new).sum()),
                  "unchanged": int(eq.sum()),
                  "update": int((~eq).sum())}
        ops = [k for k, v in counts.items() if v > 0]
        return pd.DataFrame({"op": ops,
                             "n": np.array([counts[k] for k in ops],
                                           np.int64)})

    from elevant_ray.stages.util import partial_group_agg

    out = partial_group_agg(
        bucketed_group_apply(rows, "doc_id", classify),
        ["op"], sum_cols=["n"], combine="driver")
    out = out.sort_values("op").reset_index(drop=True)
    return out.astype({"n": "int64"})


def char_pair_top(sf_dir: str):
    """Byte-pair (BPE merge-candidate) counting: the 20 most frequent
    adjacent lowercase-letter pairs across the corpus.  Each batch
    views its concatenated text as uint8, forms a[:-1]·256+a[1:] pair
    codes, masks non-[a-z] participants, and bincounts into one
    676-row partial — the per-batch work is three numpy kernels, no
    Python per char."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "documents", ["text"])
    empty = pd.DataFrame({"pair": pd.Series([], dtype="object"),
                          "n": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def partial(b: pa.Table) -> pa.Table:
        # '\n' separators stop pairs from bridging documents
        blob = "\n".join(b.column("text").to_pylist()).encode(
            "utf-8", "surrogatepass")
        a = np.frombuffer(blob, np.uint8)
        if len(a) < 2:
            return pa.table({"code": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ok = (a >= 97) & (a <= 122)
        m = ok[:-1] & ok[1:]
        code = (a[:-1][m].astype(np.int64) - 97) * 26 \
            + (a[1:][m].astype(np.int64) - 97)
        cnt = np.bincount(code, minlength=676).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"code": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    from elevant_ray.stages.util import partial_group_agg

    agg = partial_group_agg(ds.map_batches(partial,
                                           batch_format="pyarrow"),
                            ["code"], sum_cols=["n"], combine="driver")
    agg = agg.sort_values(["n", "code"],
                          ascending=[False, True]).head(20)
    code = agg["code"].to_numpy(np.int64)
    return pd.DataFrame({
        "pair": [chr(97 + c // 26) + chr(97 + c % 26) for c in code],
        "n": agg["n"].to_numpy(np.int64)}).reset_index(drop=True)


def name_match_pr_curve(sf_dir: str):
    """Entity-resolution PR curve with an exact oracle: within-brand
    part pairs, gold = charset-Jaccard ≥ 0.8, predicted = edit distance
    ≤ t for t in 1..4; per threshold TP/FP/FN and precision/recall.
    Both metrics are DuckDB-identical kernels, so the whole evaluation
    — the flagship scorer's quality readout — is SQL-checkable; pair
    scoring is memoized per distinct name pair inside brand buckets."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.scoring import score_name_pairs
    from elevant_ray.stages.util import (bucketed_group_apply,
                                         partial_group_agg)

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_name"])
    empty = pd.DataFrame({"t": pd.Series([], dtype="int64"),
                          "tp": pd.Series([], dtype="int64"),
                          "fp": pd.Series([], dtype="int64"),
                          "fn": pd.Series([], dtype="int64"),
                          "precision": pd.Series([], dtype="float64"),
                          "recall": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, gg in g.groupby("p_brand"):
            gg = gg.sort_values("p_partkey")
            nm = gg["p_name"].to_numpy(dtype=object)
            i, j = np.triu_indices(len(nm), k=1)
            lev, jac = score_name_pairs(nm[i], nm[j])
            gold = jac >= 0.8
            for t in range(1, 5):
                pred = lev <= t
                rows.append((t, int((pred & gold).sum()),
                             int((pred & ~gold).sum()),
                             int((~pred & gold).sum())))
        return pd.DataFrame(rows, columns=["t", "tp", "fp", "fn"])

    agg = partial_group_agg(
        bucketed_group_apply(ds, "p_brand", per_bucket),
        ["t"], sum_cols=["tp", "fp", "fn"], combine="driver")
    agg = agg.sort_values("t").reset_index(drop=True)
    tp = agg["tp"].to_numpy(np.int64)
    fp = agg["fp"].to_numpy(np.int64)
    fn = agg["fn"].to_numpy(np.int64)

    def rnd(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    with np.errstate(invalid="ignore"):
        prec = np.where(tp + fp > 0, rnd(1.0 * tp / (tp + fp)),
                        np.nan)
        rec = np.where(tp + fn > 0, rnd(1.0 * tp / (tp + fn)), np.nan)
    return pd.DataFrame({"t": agg["t"].astype("int64"),
                         "tp": tp, "fp": fp, "fn": fn,
                         "precision": prec + 0.0, "recall": rec + 0.0})


_PATTERNS = [("digits", "[0-9]{3,}"),
             ("url", "https?://"),
             ("shout", "[A-Z]{4,}"),
             ("punct_run", "[!?.]{2,}")]


def docs_pattern_matrix(sf_dir: str):
    """Multi-pattern content audit: per (pattern, lang), how many docs
    match each of four compiled regexes (PII-ish digits, URLs,
    shouting, doubled words).  One scan; every pattern is a vectorized
    RE2 pc.count_substring_regex over the batch — four C++ kernel
    passes, zero Python per row — feeding a tiny (4 × langs) partial
    aggregate."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])
    empty = pd.DataFrame({"pattern": pd.Series([], dtype="object"),
                          "lang": pd.Series([], dtype="object"),
                          "n_docs": pd.Series([], dtype="int64"),
                          "n_hits": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def partial(b: pa.Table) -> pa.Table:
        outs = []
        for name, pat in _PATTERNS:
            c = pc.count_substring_regex(b.column("text"),
                                         pat).to_numpy(
                zero_copy_only=False).astype(np.int64)
            outs.append(pd.DataFrame({
                "pattern": name,
                "lang": b.column("lang").to_pylist(),
                "m": (c > 0).astype(np.int64), "h": c}))
        df = pd.concat(outs, ignore_index=True)
        g = df.groupby(["pattern", "lang"], as_index=False).agg(
            m=("m", "sum"), h=("h", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = partial_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["pattern", "lang"], sum_cols=["m", "h"], combine="driver")
    out.columns = ["pattern", "lang", "n_docs", "n_hits"]
    return (out.sort_values(["pattern", "lang"]).reset_index(drop=True)
            .astype({"n_docs": "int64", "n_hits": "int64"}))


def embedding_label_cohesion(sf_dir: str):
    """Two-pass vector analytics: per label, the mean dot product of
    members with their label centroid (cluster cohesion).  Pass 1
    reduces to label-bounded (Σx, n) partials; the centroids broadcast
    back into pass 2, where each batch dots its rows against its
    labels' centroids — classic broadcast-rejoin, no shuffle of the
    vectors themselves."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame({"label": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "cohesion": pd.Series([], dtype="float64")})
    ds = _read(sf_dir, "embeddings", ["label", "embedding"]) \
        .materialize()
    if ds.count() == 0:
        return empty

    def sums(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        arr = b.column("embedding").combine_chunks()
        v = arr.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        X = v.reshape(len(arr), -1)
        ul, inv = np.unique(lab, return_inverse=True)
        S = np.zeros((len(ul), X.shape[1]))
        np.add.at(S, inv, X)
        n = np.bincount(inv).astype(np.int64)
        return pa.table({"label": pa.array(np.repeat(ul, X.shape[1]),
                                           pa.int64()),
                         "dim": pa.array(np.tile(
                             np.arange(X.shape[1], dtype=np.int64),
                             len(ul)), pa.int64()),
                         "s": pa.array(S.ravel()),
                         "n": pa.array(np.repeat(n, X.shape[1]),
                                       pa.int64())})

    parts = ds.map_batches(sums, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["label", "dim"], sort=True).agg(
        s=("s", "sum"), n=("n", "sum")).reset_index()
    labels = np.sort(g["label"].unique()).astype(np.int64)
    dmax = int(g["dim"].max()) + 1
    C = np.zeros((len(labels), dmax))
    li = np.searchsorted(labels, g["label"].to_numpy(np.int64))
    C[li, g["dim"].to_numpy(np.int64)] = (g["s"].to_numpy()
                                          / g["n"].to_numpy())
    counts = (g[g["dim"] == 0].set_index("label")["n"]
              .reindex(labels).to_numpy(np.int64))

    import ray

    cref = ray.put(C)
    lref = ray.put(labels)

    def dots(b: pa.Table) -> pa.Table:
        CC = ray.get(cref)
        LL = ray.get(lref)
        lab = b.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        arr = b.column("embedding").combine_chunks()
        v = arr.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        X = v.reshape(len(arr), -1)
        d = (X * CC[np.searchsorted(LL, lab)]).sum(axis=1)
        df = pd.DataFrame({"label": lab, "d": d})
        gg = df.groupby("label", as_index=False)["d"].sum()
        return pa.Table.from_pandas(gg, preserve_index=False)

    from elevant_ray.stages.util import partial_group_agg

    dsum = partial_group_agg(
        ds.map_batches(dots, batch_format="pyarrow"),
        ["label"], sum_cols=["d"], combine="driver")
    dsum = dsum.sort_values("label").reset_index(drop=True)
    coh = dsum["d"].to_numpy() / counts
    return pd.DataFrame({
        "label": labels,
        "n": counts,
        "cohesion": np.sign(coh) * np.floor(np.abs(coh) * 1e6 + 0.5)
            / 1e6})


def docs_csv_roundtrip(sf_dir: str):
    """CSV sink + source fidelity (the JSONL round-trip's sibling for
    the delimited-text format): write documents with Ray's write_csv,
    re-read with read_csv, and re-aggregate per-source count, char
    total and md5-tail XOR checksum — quoting must survive embedded
    commas, quotes and newlines for the checksums to match the
    parquet-side oracle."""
    import hashlib
    import os
    import shutil

    import numpy as np
    import pandas as pd
    import ray.data as rd

    ds = _read(sf_dir, "documents",
               ["doc_id", "text", "source", "n_chars"])
    empty = pd.DataFrame({"source": pd.Series([], dtype="object"),
                          "n_docs": pd.Series([], dtype="int64"),
                          "total_chars": pd.Series([], dtype="int64"),
                          "checksum": pd.Series([], dtype="object")})
    if ds.count() == 0:
        return empty

    out_dir = f"/tmp/elevant_ray_csv_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_csv(out_dir)
    try:
        back = rd.read_csv(out_dir)

        def partial(b: pa.Table) -> pa.Table:
            tx = b.column("text").to_pylist()
            h = np.fromiter(
                (int.from_bytes(hashlib.md5(t.encode()).digest()[8:16],
                                "little") for t in tx),
                np.uint64, len(tx)).view(np.int64)
            df = pd.DataFrame({
                "source": b.column("source").to_pylist(),
                "h": h,
                "nc": b.column("n_chars").to_numpy(zero_copy_only=False)
                    .astype(np.int64)})
            g = df.groupby("source").agg(
                x=("h", lambda s: np.bitwise_xor.reduce(
                    s.to_numpy(np.int64))),
                n=("h", "size"), tc=("nc", "sum"))
            return pa.table({"source": pa.array(g.index, pa.string()),
                             "x": pa.array(g["x"].to_numpy(np.int64)),
                             "n": pa.array(g["n"].to_numpy(np.int64)),
                             "tc": pa.array(g["tc"].to_numpy(np.int64))})

        parts = back.map_batches(partial,
                                 batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    out = parts.groupby("source").agg(
        x=("x", lambda s: np.bitwise_xor.reduce(s.to_numpy(np.int64))),
        n_docs=("n", "sum"), total_chars=("tc", "sum")) \
        .sort_index().reset_index()
    out["checksum"] = [f"{v:016X}" for v in
                       out["x"].to_numpy(np.int64).view(np.uint64)]
    return out[["source", "n_docs", "total_chars", "checksum"]].astype(
        {"n_docs": "int64", "total_chars": "int64"})


def part_name_prefix_overlap(sf_dir: str):
    """Ordered-neighbor string analytics: histogram of the longest
    common prefix between each part name and the NEXT name in (name,
    partkey) order — the sortedness-exploiting kernel behind prefix
    compression and SSTable index sizing.  The engine sorts the
    bounded distinct-name vocabulary on the driver (names repeat
    heavily), computes LCPs in one padded uint32 matrix comparison,
    and weights each adjacent distinct pair by its row multiplicity
    from a distributed count aggregate."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])
    empty = pd.DataFrame({"lcp": pd.Series([], dtype="int64"),
                          "n_pairs": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    cnt = partial_group_agg(ds, ["p_name"], count_alias="n",
                            combine="driver")
    cnt = cnt.sort_values("p_name", kind="stable").reset_index(drop=True)
    names = cnt["p_name"].to_numpy(dtype=object)
    mult = cnt["n"].to_numpy(np.int64)
    total = int(mult.sum())
    if total < 2:
        return empty

    # neighbor pairs in the GLOBAL (name, partkey) row order: equal
    # names are adjacent (LCP = len(name)); across distinct names the
    # boundary pair's LCP is that of the two distinct strings
    width = max(len(n) for n in names)
    M = np.zeros((len(names), width), np.uint32)
    for i, n in enumerate(names):
        a = np.frombuffer(n.encode("utf-32-le"), np.uint32)
        M[i, :len(a)] = a
    eqlen = np.minimum(
        np.array([len(n) for n in names[:-1]], np.int64),
        np.array([len(n) for n in names[1:]], np.int64))
    neq = M[:-1] != M[1:]
    first_neq = np.where(neq.any(axis=1), neq.argmax(axis=1), width)
    lcp_adj = np.minimum(first_neq, eqlen)
    lens = np.array([len(n) for n in names], np.int64)
    # within-name runs contribute (mult-1) pairs at LCP = len(name)
    lcps = np.concatenate([np.repeat(lens, mult - 1), lcp_adj])
    u, c = np.unique(lcps, return_counts=True)
    return pd.DataFrame({"lcp": u.astype("int64"),
                         "n_pairs": c.astype("int64")})


def vocab_growth_curve(sf_dir: str):
    """Vocabulary growth (Heaps-law curve): cumulative distinct token
    count after each tenth of the corpus in doc_id order.  One
    token-keyed aggregate finds each token's FIRST document (min
    doc_id); the calendar of 10 checkpoints then cumsums a bounded
    histogram on the driver — the whole curve costs one shuffle over
    (token, min-doc) partials, never a re-scan per checkpoint."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    empty = pd.DataFrame({"decile": pd.Series([], dtype="int64"),
                          "n_docs": pd.Series([], dtype="int64"),
                          "vocab": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    import re

    TOK = re.compile(r"[a-z0-9_]+")

    def toks(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out_t, out_d = [], []
        for i, t in zip(ids.tolist(),
                        pc.utf8_lower(b.column("text")).to_pylist()):
            ts = set(TOK.findall(t))
            out_t.extend(ts)
            out_d.extend([i] * len(ts))
        return pa.table({"token": pa.array(out_t, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64())})

    firsts = partial_group_agg(
        ds.map_batches(toks, batch_format="pyarrow"),
        ["token"], min_cols=["doc_id"], combine="driver")
    firsts.columns = ["token", "first_doc"]

    mx = partial_group_agg(
        ds.map_batches(lambda b: pa.table(
            {"one": pa.array(np.ones(b.num_rows, np.int64)),
             "doc_id": b.column("doc_id")}), batch_format="pyarrow"),
        ["one"], max_cols=["doc_id"], combine="driver")
    max_id = int(mx["doc_id"].iloc[0])

    fd = firsts["first_doc"].to_numpy(np.int64)
    bkt = (fd * 10) // (max_id + 1)
    vocab_per = np.bincount(bkt, minlength=10).astype(np.int64)
    # docs per decile from a second bounded histogram
    dcount = partial_group_agg(
        ds.map_batches(lambda b: pa.table(
            {"decile": pa.array(
                (b.column("doc_id").to_numpy(zero_copy_only=False)
                 .astype(np.int64) * 10) // (max_id + 1), pa.int64()),
             "one": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["decile"], sum_cols=["one"], combine="driver")
    nd = np.zeros(10, np.int64)
    nd[dcount["decile"].to_numpy(np.int64)] = \
        dcount["one"].to_numpy(np.int64)
    return pd.DataFrame({"decile": np.arange(1, 11, dtype=np.int64),
                         "n_docs": nd.cumsum(),
                         "vocab": vocab_per.cumsum()})


def user_type_rle_top(sf_dir: str):
    """Run-length encoding of per-user event-type sequences: top-10
    (event_type, run_length) shapes by frequency — the session-replay
    compression / repetition-pattern primitive.  One user-keyed bucket
    shuffle; runs fall out of one vectorized boundary scan over the
    (user, ts, event_id)-sorted bucket (no per-run Python), reduced to
    (type, len) partials."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, partial_group_agg

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])
    empty = pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                          "run_len": pd.Series([], dtype="int64"),
                          "n_runs": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        t, types = pd.factorize(g["event_type"])
        start = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (t[1:] != t[:-1])])
        si = np.flatnonzero(start)
        ln = np.diff(np.append(si, len(g)))
        df = pd.DataFrame({"event_type": types[t[si]],
                           "run_len": ln.astype(np.int64)})
        return (df.groupby(["event_type", "run_len"], as_index=False)
                .size().rename(columns={"size": "n_runs"}))

    agg = partial_group_agg(
        bucketed_group_apply(ds, "user_id", per_bucket),
        ["event_type", "run_len"], sum_cols=["n_runs"],
        combine="driver")
    agg = agg.sort_values(["n_runs", "event_type", "run_len"],
                          ascending=[False, True, True],
                          kind="stable").head(10).reset_index(drop=True)
    return agg.astype({"run_len": "int64", "n_runs": "int64"})


def docs_k_anonymity(sf_dir: str):
    """k-anonymity audit over quasi-identifiers: how many (lang,
    source, length-bucket) equivalence classes have fewer than 5
    members, and how many documents sit in them — the privacy gate a
    training-data release pipeline runs before publishing.  One
    bounded partial aggregate (langs × sources × 20 buckets cells); the
    audit row closes on the driver."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    empty = pd.DataFrame({"n_classes": pd.Series([], dtype="int64"),
                          "n_risky_classes": pd.Series([], dtype="int64"),
                          "n_risky_docs": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        nb = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64) // 100
        return pa.table({"lang": b.column("lang"),
                         "source": b.column("source"),
                         "bucket": pa.array(nb, pa.int64()),
                         "one": pa.array(np.ones(b.num_rows, np.int64))})

    cells = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["lang", "source", "bucket"], sum_cols=["one"], combine="driver")
    n = cells["one"].to_numpy(np.int64)
    risky = n < 5
    return pd.DataFrame({
        "n_classes": np.array([len(n)], np.int64),
        "n_risky_classes": np.array([int(risky.sum())], np.int64),
        "n_risky_docs": np.array([int(n[risky].sum())], np.int64)})


def daily_revenue_forecast_mape(sf_dir: str):
    """Forecast backtest: seasonal-naive prediction (each day's revenue
    predicted by the revenue 7 days earlier on the observed-day grid)
    and its absolute percentage error per day.  Daily totals are a
    calendar-bounded partial aggregate in exact cents; the lag-7 join
    and APE close on the driver."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                          "revenue": pd.Series([], dtype="float64"),
                          "predicted": pd.Series([], dtype="float64"),
                          "ape": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    daily = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["day"], sum_cols=["c"], combine="driver")
    daily = daily.sort_values("day").reset_index(drop=True)
    c = daily["c"].to_numpy(np.int64)
    if len(c) <= 7:
        return empty
    rev = c[7:]
    pred = c[:-7]
    ape = np.abs(rev - pred) / rev
    ape = np.sign(ape) * np.floor(np.abs(ape) * 1e6 + 0.5) / 1e6
    return pd.DataFrame({
        "day": daily["day"].to_numpy(np.int64)[7:]
            .astype("datetime64[D]").astype("datetime64[us]"),
        "revenue": rev / 100.0,
        "predicted": pred / 100.0,
        "ape": ape})


def events_welch_ttest(sf_dir: str):
    """Welch two-sample t-test of event value, weekend vs weekday:
    t statistic, Welch–Satterthwaite degrees of freedom and Cohen's d.
    Moments are exact integer cents (Python-int sums on the engine
    side, HUGEINT in the oracle) closed into a float expression tree
    mirrored term-for-term in the SQL, so both sides are bit-identical
    before the final rounding.  One bounded partial aggregate."""
    import math

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", ["ts", "value"])
    empty = pd.DataFrame({"n_weekday": pd.Series([], dtype="int64"),
                          "n_weekend": pd.Series([], dtype="int64"),
                          "t_stat": pd.Series([], dtype="float64"),
                          "df": pd.Series([], dtype="float64"),
                          "cohens_d": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        we = ((us // DAY_US + 3) % 7 >= 5).astype(np.int64)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"we": pa.array(we, pa.int64()),
                         "c": pa.array(c, pa.int64()),
                         "c2": pa.array(c * c, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["we"], sum_cols=["c", "c2"], count_alias="n",
                          combine="driver")
    gd = {int(r["we"]): (int(r["n"]), int(r["c"]), int(r["c2"]))
          for _, r in g.iterrows()}
    n1, s1, q1 = gd.get(0, (0, 0, 0))
    n2, s2, q2 = gd.get(1, (0, 0, 0))
    if n1 < 2 or n2 < 2:
        return empty
    m1 = (1.0 * s1) / n1 / 100.0
    m2 = (1.0 * s2) / n2 / 100.0
    v1 = (1.0 * (n1 * q1 - s1 * s1)) / ((1.0 * n1) * (n1 - 1.0)) / 10000.0
    v2 = (1.0 * (n2 * q2 - s2 * s2)) / ((1.0 * n2) * (n2 - 1.0)) / 10000.0
    se1 = v1 / n1
    se2 = v2 / n2
    ss = se1 + se2
    t = (m1 - m2) / math.sqrt(ss)
    dfw = (ss * ss) / (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0))
    d = (m1 - m2) / math.sqrt(
        ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / (n1 + n2 - 2.0))
    r6 = lambda x: float(
        np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"n_weekday": [np.int64(n1)],
                         "n_weekend": [np.int64(n2)],
                         "t_stat": [r6(t)], "df": [r6(dfw)],
                         "cohens_d": [r6(d)]})


def purchase_rate_ztest(sf_dir: str):
    """Two-proportion z-test: is the share of purchase events different
    on weekends vs weekdays?  Pooled-variance z from exact conditional
    counts (one bounded partial aggregate), float tree mirrored in the
    oracle."""
    import math

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", ["ts", "event_type"])
    empty = pd.DataFrame({"n_weekday": pd.Series([], dtype="int64"),
                          "n_weekend": pd.Series([], dtype="int64"),
                          "k_weekday": pd.Series([], dtype="int64"),
                          "k_weekend": pd.Series([], dtype="int64"),
                          "rate_weekday": pd.Series([], dtype="float64"),
                          "rate_weekend": pd.Series([], dtype="float64"),
                          "z_score": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        we = ((us // DAY_US + 3) % 7 >= 5).astype(np.int64)
        k = pc.equal(b.column("event_type"), pa.scalar("purchase"))
        return pa.table({"we": pa.array(we, pa.int64()),
                         "k": pc.cast(k, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["we"], sum_cols=["k"], count_alias="n",
                          combine="driver")
    gd = {int(r["we"]): (int(r["n"]), int(r["k"]))
          for _, r in g.iterrows()}
    n1, k1 = gd.get(0, (0, 0))
    n2, k2 = gd.get(1, (0, 0))
    if n1 == 0 or n2 == 0:
        return empty
    p1 = (1.0 * k1) / n1
    p2 = (1.0 * k2) / n2
    p = (1.0 * (k1 + k2)) / (n1 + n2)
    if p <= 0.0 or p >= 1.0:
        return empty
    z = (p1 - p2) / math.sqrt(p * (1.0 - p) * (1.0 / n1 + 1.0 / n2))
    r6 = lambda x: float(
        np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"n_weekday": [np.int64(n1)],
                         "n_weekend": [np.int64(n2)],
                         "k_weekday": [np.int64(k1)],
                         "k_weekend": [np.int64(k2)],
                         "rate_weekday": [r6(p1)],
                         "rate_weekend": [r6(p2)],
                         "z_score": [r6(z)]})


def daily_revenue_autocorr7(sf_dir: str):
    """Lag-7 autocorrelation of daily revenue: Pearson r over (day,
    day+7) pairs where both days are observed.  Daily totals are one
    bounded partial aggregate in exact cents; the lag join is a
    searchsorted probe on the calendar-bounded driver series, and the
    correlation closes in exact integer moments (Python int / HUGEINT)
    with a mirrored float tree."""
    import math

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"n_pairs": pd.Series([], dtype="int64"),
                          "autocorr": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    daily = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["day"], sum_cols=["c"], combine="driver")
    daily = daily.sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(np.int64)
    c = daily["c"].to_numpy(np.int64)
    idx = np.searchsorted(days, days - 7)
    idx = np.clip(idx, 0, len(days) - 1)
    ok = days[idx] == days - 7
    x = c[idx[ok]].astype(object)
    y = c[ok].astype(object)
    n = int(ok.sum())
    if n < 2:
        return empty
    sx, sy = x.sum(), y.sum()
    sxy = (x * y).sum()
    sxx = (x * x).sum()
    syy = (y * y).sum()
    vn = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return empty
    r = (1.0 * vn) / math.sqrt((1.0 * vx) * (1.0 * vy))
    r6 = lambda v: float(
        np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"n_pairs": [np.int64(n)], "autocorr": [r6(r)]})


def orders_benford(sf_dir: str):
    """Benford's-law audit: leading-digit distribution of order price
    cents vs the log-law expectation — the fraud/data-quality screen.
    The leading digit falls out of a vectorized floor-divide loop (≤12
    rounds); counts are one 9-cell partial aggregate."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    empty = pd.DataFrame({"digit": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "share": pd.Series([], dtype="float64"),
                          "benford": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        c = c[c > 0]
        while c.size and c.max() >= 10:
            big = c >= 10
            c[big] //= 10
        return pa.table({"digit": pa.array(c, pa.int64()),
                         "one": pa.array(np.ones(c.size, np.int64))})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["digit"], sum_cols=["one"], combine="driver")
    if g.empty:
        return empty
    g = g.sort_values("digit").reset_index(drop=True)
    n = g["one"].to_numpy(np.int64)
    tot = int(n.sum())
    d = g["digit"].to_numpy(np.float64)
    share = (1.0 * n) / tot
    benford = np.log(1.0 + 1.0 / d) / np.log(10.0)
    r6 = lambda a: np.floor(a * 1e6 + 0.5) / 1e6
    return pd.DataFrame({"digit": g["digit"].astype("int64"),
                         "n": g["one"].astype("int64"),
                         "share": r6(share), "benford": r6(benford)})


def customer_spend_gini(sf_dir: str):
    """Gini coefficient of customer lifetime spend — the inequality /
    concentration audit.  Per-customer totals are one dimension-bounded
    partial aggregate in exact cents; the rank-weighted sum closes on
    the driver in exact Python-int arithmetic (HUGEINT in the oracle)
    with the classic 2·Σi·xᵢ formula, tie-order-invariant because tied
    spends contribute identically under any permutation."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    empty = pd.DataFrame({"n_customers": pd.Series([], dtype="int64"),
                          "gini": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"cust": pc.cast(b.column("o_custkey"), pa.int64()),
                         "x": pa.array(c, pa.int64())})

    per = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["cust"], sum_cols=["x"], combine="driver")
    order = np.lexsort((per["cust"].to_numpy(np.int64),
                        per["x"].to_numpy(np.int64)))
    x = per["x"].to_numpy(np.int64)[order].astype(object)
    n = len(x)
    t = x.sum()
    if n == 0 or t <= 0:
        return empty
    i = np.arange(1, n + 1, dtype=object)
    num = 2 * (i * x).sum() - (n + 1) * t
    g = (1.0 * num) / ((1.0 * n) * (1.0 * t))
    r6 = lambda v: float(
        np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"n_customers": [np.int64(n)], "gini": [r6(g)]})


def docs_orc_roundtrip(sf_dir: str):
    """ORC sink + source fidelity (the columnar sibling of the CSV /
    JSONL round-trips): write document shards as ORC via a distributed
    map_batches stage (pyarrow.orc writer per block), re-read them with
    read_binary_files + the ORC reader, and re-aggregate the per-source
    count / char-total / md5-tail XOR checksums.  Shards land under a
    run-unique /tmp dir (single-node sandbox; multi-node would point at
    shared storage) and both directions stream — no driver-side
    materialization of the documents."""
    import hashlib
    import os
    import shutil
    import uuid

    import numpy as np
    import pandas as pd
    import ray.data as rd
    from pyarrow import orc

    ds = _read(sf_dir, "documents",
               ["doc_id", "text", "source", "n_chars"])
    empty = pd.DataFrame({"source": pd.Series([], dtype="object"),
                          "n_docs": pd.Series([], dtype="int64"),
                          "total_chars": pd.Series([], dtype="int64"),
                          "checksum": pd.Series([], dtype="object")})
    if ds.count() == 0:
        return empty

    out_dir = f"/tmp/elevant_ray_orc_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(b: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"{uuid.uuid4().hex}.orc")
        orc.write_table(b, path)
        return pa.table({"path": pa.array([path], pa.string())})

    try:
        ds.map_batches(write_shard, batch_format="pyarrow").materialize()
        back = rd.read_binary_files(out_dir)

        def partial(b: pa.Table) -> pa.Table:
            tabs = [orc.ORCFile(pa.BufferReader(x.as_py())).read()
                    for x in b.column("bytes")]
            t = pa.concat_tables(tabs)
            tx = t.column("text").to_pylist()
            h = np.fromiter(
                (int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                                "little") for s in tx),
                np.uint64, len(tx)).view(np.int64)
            df = pd.DataFrame({
                "source": t.column("source").to_pylist(),
                "h": h,
                "nc": t.column("n_chars").to_numpy(zero_copy_only=False)
                    .astype(np.int64)})
            g = df.groupby("source").agg(
                x=("h", lambda s: np.bitwise_xor.reduce(
                    s.to_numpy(np.int64))),
                n=("h", "size"), tc=("nc", "sum"))
            return pa.table({"source": pa.array(g.index, pa.string()),
                             "x": pa.array(g["x"].to_numpy(np.int64)),
                             "n": pa.array(g["n"].to_numpy(np.int64)),
                             "tc": pa.array(g["tc"].to_numpy(np.int64))})

        parts = back.map_batches(partial,
                                 batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    out = parts.groupby("source").agg(
        x=("x", lambda s: np.bitwise_xor.reduce(s.to_numpy(np.int64))),
        n_docs=("n", "sum"), total_chars=("tc", "sum")) \
        .sort_index().reset_index()
    out["checksum"] = [f"{v:016X}" for v in
                       out["x"].to_numpy(np.int64).view(np.uint64)]
    return out[["source", "n_docs", "total_chars", "checksum"]].astype(
        {"n_docs": "int64", "total_chars": "int64"})


def daily_revenue_ewma14(sf_dir: str):
    """Exponentially weighted moving average (decay 0.9, 14-day
    calendar window) of daily revenue — the smoothed-trend primitive.
    EXACT despite being float-shaped: weights 0.9^k are carried as the
    rational 9^k·10^(13−k) over the common denominator 10^13, so the
    windowed numerator/denominator are exact integers (Python int
    engine-side, HUGEINT oracle-side) and the single closing division
    is the only float op.  Daily totals are one bounded partial
    aggregate; the window probe is a searchsorted walk on the
    calendar-bounded driver series."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                          "ewma": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    daily = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["day"], sum_cols=["c"], combine="driver")
    daily = daily.sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(np.int64)
    c = [int(v) for v in daily["c"].to_numpy(np.int64)]
    W = [9 ** k * 10 ** (13 - k) for k in range(14)]
    lo = np.searchsorted(days, days - 13)
    ewma = np.empty(len(days), np.float64)
    for i in range(len(days)):
        num = 0
        den = 0
        di = int(days[i])
        for j in range(int(lo[i]), i + 1):
            w = W[di - int(days[j])]
            num += c[j] * w
            den += w
        ewma[i] = (1.0 * num) / (1.0 * den) / 100.0
    return pd.DataFrame({
        "day": days.astype("datetime64[D]").astype("datetime64[us]"),
        "ewma": np.floor(ewma * 1e6 + 0.5) / 1e6})


def user_active_streaks(sf_dir: str):
    """Histogram of each user's longest run of consecutive active
    calendar days — the engagement-streak metric.  One user-keyed
    bucket shuffle; inside a bucket every user's rows are complete, so
    the per-bucket kernel dedupes (user, day), segments runs with one
    vectorized break scan (day ≠ prev+1), and reduces to per-user max
    before emitting (max_streak, n_users) partials."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply, \
        partial_group_agg

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    empty = pd.DataFrame({"max_streak": pd.Series([], dtype="int64"),
                          "n_users": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pc.cast(b.column("user_id"),
                                            pa.int64()),
                         "day": pa.array(us // DAY_US, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        o = np.lexsort((d, u))
        u, d = u[o], d[o]
        keep = np.concatenate([[True], (u[1:] != u[:-1]) | (d[1:] != d[:-1])])
        u, d = u[keep], d[keep]
        brk = np.concatenate([[True], (u[1:] != u[:-1])
                              | (d[1:] != d[:-1] + 1)])
        seg = np.cumsum(brk) - 1
        seglen = np.bincount(seg)
        segu = u[np.flatnonzero(brk)]
        mx = pd.DataFrame({"u": segu, "len": seglen}) \
            .groupby("u")["len"].max()
        return (pd.DataFrame({"max_streak": mx.to_numpy(np.int64)})
                .groupby("max_streak", as_index=False).size()
                .rename(columns={"size": "n_users"}))

    agg = partial_group_agg(
        bucketed_group_apply(
            ds.map_batches(pre, batch_format="pyarrow"),
            "user_id", per_bucket),
        ["max_streak"], sum_cols=["n_users"], combine="driver")
    agg = agg.sort_values("max_streak").reset_index(drop=True)
    return agg.astype({"max_streak": "int64", "n_users": "int64"})


def daily_revenue_rolling_median7(sf_dir: str):
    """Rolling median of daily revenue over the trailing 7 OBSERVED
    days (ROWS 6 PRECEDING) — the robust-trend window.  Medians are
    exact: odd windows pick an integer cent value, even windows
    interpolate (lo+hi)/2 which is exact in doubles below 2^53, so
    engine and oracle agree bit-for-bit.  Daily totals are one bounded
    partial aggregate; windows slide on the driver series."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                          "median7": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    daily = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["day"], sum_cols=["c"], combine="driver")
    daily = daily.sort_values("day").reset_index(drop=True)
    c = daily["c"].to_numpy(np.int64)
    n = len(c)
    med = np.empty(n, np.float64)
    head = min(n, 6)
    for i in range(head):
        med[i] = np.median(c[:i + 1])
    if n >= 7:
        win = np.lib.stride_tricks.sliding_window_view(c, 7)
        med[6:] = np.median(win, axis=1)
    return pd.DataFrame({
        "day": daily["day"].to_numpy(np.int64)
            .astype("datetime64[D]").astype("datetime64[us]"),
        "median7": np.floor(med / 100.0 * 1e6 + 0.5) / 1e6})


def customer_spend_theil(sf_dir: str):
    """Theil T inequality index of customer lifetime spend — the
    entropy-based companion to the Gini query.  Per-customer totals
    are one dimension-bounded partial aggregate in exact cents; the
    log-domain sum closes on the driver (same discipline as the
    geometric-mean and JSD queries: per-term values are bit-identical
    to SQL, sum-order drift is ~1e-13 relative, far inside round-6)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    empty = pd.DataFrame({"n_customers": pd.Series([], dtype="int64"),
                          "theil_t": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"cust": pc.cast(b.column("o_custkey"), pa.int64()),
                         "x": pa.array(c, pa.int64())})

    per = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["cust"], sum_cols=["x"], combine="driver")
    x = per["x"].to_numpy(np.int64)
    x = x[x > 0]
    n = len(x)
    if n == 0:
        return empty
    t = int(x.astype(object).sum())
    mu = (1.0 * t) / n / 100.0
    ratio = (x / 100.0) / mu
    theil = (ratio * np.log(ratio)).sum() / n
    r6 = lambda v: float(
        np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"n_customers": [np.int64(n)],
                         "theil_t": [r6(theil)]})


def part_token_assortativity(sf_dir: str):
    """Degree assortativity of the part-name token co-occurrence graph
    (do well-connected words co-occur with well-connected words?) —
    the graph-family companion to the triangle/clustering queries on a
    graph whose degrees actually vary (the supplier co-supply graph is
    complete at every test scale).  Per-batch local pair expansion
    (factorize → within-row pairs → canonicalize by token string) then
    ONE bounded (t1, t2) distinct aggregate — the vocabulary is ~10²
    words, so the global pair set is ≤ vocab², no matter how many
    parts; the Pearson-over-directed-edges close is exact Python-int /
    HUGEINT arithmetic on the driver."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.graph import PAIR_BITS, cooccurrence_pairs
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "part", ["p_name"])
    empty = pd.DataFrame({"n_tokens": pd.Series([], dtype="int64"),
                          "n_edges": pd.Series([], dtype="int64"),
                          "assortativity": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    mask = np.int64((1 << PAIR_BITS) - 1)

    def pair_partial(b: pa.Table) -> pa.Table:
        s = pd.Series(b.column("p_name").to_pylist()).str.split(" ")
        e = s.explode()
        codes, toks = pd.factorize(e.to_numpy())
        rows = e.index.to_numpy().astype(np.int64)
        comp = (rows << PAIR_BITS) + codes
        pairs = cooccurrence_pairs(comp)
        toks = toks.astype(object)
        u = toks[(pairs >> PAIR_BITS)]
        v = toks[pairs & mask]
        sw = u > v
        return pa.table({"t1": pa.array(np.where(sw, v, u), pa.string()),
                         "t2": pa.array(np.where(sw, u, v), pa.string()),
                         "one": pa.array(np.ones(len(u), np.int64))})

    pairs = partial_group_agg(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["t1", "t2"], sum_cols=["one"], combine="driver")
    if pairs.empty:
        return empty
    codes, toks = pd.factorize(
        np.concatenate([pairs["t1"].to_numpy(object),
                        pairs["t2"].to_numpy(object)]))
    half = len(pairs)
    a, b_ = codes[:half], codes[half:]
    deg = np.bincount(np.concatenate([a, b_]),
                      minlength=len(toks)).astype(object)
    da, db = deg[a], deg[b_]
    n = 2 * half
    sx = (da + db).sum()
    sxy = 2 * (da * db).sum()
    sxx = (da * da + db * db).sum()
    vr = n * sxx - sx * sx
    r6 = lambda v: float(
        np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6) + 0.0
    # Degenerate (regular) graph → NULL/NaN, matching SQL's x/0.0;
    # the node/edge counts stay checkable even then.
    r = (r6((1.0 * (n * sxy - sx * sx)) / (1.0 * vr)) if vr > 0
         else float("nan"))
    return pd.DataFrame({"n_tokens": [np.int64(len(toks))],
                         "n_edges": [np.int64(half)],
                         "assortativity": [r]})


def brand_weighted_median_price(sf_dir: str):
    """Quantity-weighted median unit price per brand — the weighted
    order statistic (smallest price whose cumulative weight reaches
    half the brand's total), exact in integer cents.  The part→brand
    side broadcasts once; (brand, cents) weight partials are one
    bounded aggregate (25 brands × distinct cents) and the weighted
    walk closes on the driver."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_quantity"])
    empty = pd.DataFrame({"brand": pd.Series([], dtype="object"),
                          "wmedian": pd.Series([], dtype="float64")})
    if line.count() == 0:
        return empty
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brands = np.sort(part["p_brand"].unique()).astype(object)
    bcode = {b: i for i, b in enumerate(brands)}
    import ray
    pk_ref = ray.put(np.sort(part["p_partkey"].to_numpy(np.int64)))
    bc_ref = ray.put(part.sort_values("p_partkey")["p_brand"]
                     .map(bcode).to_numpy(np.int64))

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get
        pk = cached_get(pk_ref)
        bc = cached_get(bc_ref)
        lp = b.column("l_partkey").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(pk, lp)
        c = np.rint(b.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        w = np.rint(b.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"bcode": pa.array(bc[idx], pa.int64()),
                         "c": pa.array(c, pa.int64()),
                         "w": pa.array(w, pa.int64())})

    from elevant_ray.stages.quantiles import grouped_weighted_median

    med = grouped_weighted_median(
        line.map_batches(pre, batch_format="pyarrow"),
        "c", "w", group_cols=["bcode"]).to_pandas()
    med = med.sort_values("bcode").reset_index(drop=True)
    return pd.DataFrame({
        "brand": pd.Series(brands[med["bcode"].to_numpy(np.int64)],
                           dtype="object"),
        "wmedian": med["c"].to_numpy(np.int64) / 100.0})


def nation_type_simpson(sf_dir: str):
    """Gini–Simpson diversity of part types shipped per supplier
    nation: 1 − Σ(nᵢ/N)², closed as the exact integer rational
    (N²−Σnᵢ²)/N² — the ecology-style concentration metric next to the
    entropy and HHI queries.  Two broadcast dims fold into one lineitem
    scan; (nation, type) cells are dimension-bounded."""
    import numpy as np
    import pandas as pd
    import ray

    from elevant_ray.stages.util import partial_group_agg

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    empty = pd.DataFrame({"nationkey": pd.Series([], dtype="int64"),
                          "n_types": pd.Series([], dtype="int64"),
                          "simpson": pd.Series([], dtype="float64")})
    if line.count() == 0:
        return empty
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    types = np.sort(part["p_type"].unique()).astype(object)
    tcode = {t: i for i, t in enumerate(types)}
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    pk_ref = ray.put(np.sort(part["p_partkey"].to_numpy(np.int64)))
    pt_ref = ray.put(part.sort_values("p_partkey")["p_type"]
                     .map(tcode).to_numpy(np.int64))
    sk_ref = ray.put(np.sort(supp["s_suppkey"].to_numpy(np.int64)))
    sn_ref = ray.put(supp.sort_values("s_suppkey")["s_nationkey"]
                     .to_numpy(np.int64))

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get
        pk, pt = cached_get(pk_ref), cached_get(pt_ref)
        sk, sn = cached_get(sk_ref), cached_get(sn_ref)
        lp = b.column("l_partkey").to_numpy(zero_copy_only=False)
        ls = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "nk": pa.array(sn[np.searchsorted(sk, ls)], pa.int64()),
            "tp": pa.array(pt[np.searchsorted(pk, lp)], pa.int64()),
            "one": pa.array(np.ones(b.num_rows, np.int64))})

    g = partial_group_agg(line.map_batches(pre, batch_format="pyarrow"),
                          ["nk", "tp"], sum_cols=["one"],
                          combine="driver")
    rows = []
    for nk, sub in g.groupby("nk"):
        cnt = [int(v) for v in sub["one"].to_numpy(np.int64)]
        t = sum(cnt)
        sq = sum(v * v for v in cnt)
        simpson = (1.0 * (t * t - sq)) / ((1.0 * t) * (1.0 * t))
        rows.append((int(nk), len(cnt),
                     float(np.floor(simpson * 1e6 + 0.5) / 1e6)))
    out = pd.DataFrame(rows, columns=["nationkey", "n_types", "simpson"])
    return out.sort_values("nationkey").reset_index(drop=True) \
        .astype({"nationkey": "int64", "n_types": "int64"})


def events_hour_of_week(sf_dir: str):
    """Hour-of-week activity heatmap: count and exact-cents mean value
    per (ISO day-of-week, hour) cell — the 168-cell seasonality matrix
    behind staffing and capacity dashboards.  Closed-form calendar
    arithmetic per batch, one bounded partial aggregate."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    DAY_US = 86_400_000_000
    HOUR_US = 3_600_000_000
    ds = _read(sf_dir, "events", ["ts", "value"])
    empty = pd.DataFrame({"dow": pd.Series([], dtype="int64"),
                          "hr": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "avg_value": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        dow = (us // DAY_US + 3) % 7 + 1
        hr = (us % DAY_US) // HOUR_US
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"dow": pa.array(dow, pa.int64()),
                         "hr": pa.array(hr, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["dow", "hr"], sum_cols=["c"],
                          count_alias="n", combine="driver")
    g = g.sort_values(["dow", "hr"]).reset_index(drop=True)
    s = g["c"].to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    avg = (1.0 * s) / n / 100.0
    return pd.DataFrame({"dow": g["dow"].astype("int64"),
                         "hr": g["hr"].astype("int64"),
                         "n": g["n"].astype("int64"),
                         "avg_value": np.floor(avg * 1e6 + 0.5) / 1e6})


def user_event_cms_top(sf_dir: str):
    """Count-Min sketch point estimates next to exact recounts for the
    top-10 users by event count — the fixed-memory frequency sketch
    (completes the sketch family: HLL, Misra-Gries, Bloom, MinHash,
    SimHash, approx-quantiles).  The sketch build is one bounded
    (depth×width)-cell aggregate regardless of user cardinality; the
    exact side is the usual partial aggregate.  Rows-only (a sketch
    has no SQL equivalent); the ≥-exact and ε-overshoot guarantees are
    pytest-gated."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.sketches import (count_min_estimate,
                                             count_min_matrix)
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id"])
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "exact_n": pd.Series([], dtype="int64"),
                          "cms_est": pd.Series([], dtype="int64"),
                          "overcount": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty

    exact = partial_group_agg(ds, ["user_id"], count_alias="exact_n",
                              combine="driver")
    exact = exact.sort_values(["exact_n", "user_id"],
                              ascending=[False, True],
                              kind="stable").head(10)
    m = count_min_matrix(ds, "user_id", width_bits=11, depth=4)
    keys = exact["user_id"].to_numpy(np.int64)
    est = count_min_estimate(m, keys)
    return pd.DataFrame({"user_id": keys,
                         "exact_n": exact["exact_n"].to_numpy(np.int64),
                         "cms_est": est.astype(np.int64),
                         "overcount": (est - exact["exact_n"]
                                       .to_numpy(np.int64))
                         .astype(np.int64)}).reset_index(drop=True)


def _events_midpoint_us(ds):
    """Midpoint of the event timeline in epoch µs (floor of the
    min/max average) — the deterministic H1/H2 split shared by the
    drift queries.  One bounded min/max partial aggregate."""
    import numpy as np

    from elevant_ray.stages.util import partial_group_agg

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({"k": pa.array(np.zeros(len(us), np.int64)),
                         "us_mn": pa.array(us, pa.int64()),
                         "us_mx": pa.array(us, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["k"], min_cols=["us_mn"], max_cols=["us_mx"],
                          combine="driver")
    return (int(g["us_mn"].iloc[0]) + int(g["us_mx"].iloc[0])) // 2


def events_value_psi(sf_dir: str):
    """Population Stability Index of event value, first half vs second
    half of the timeline — the model-monitoring drift metric.  Decile
    boundaries come from the H1 exact-cents histogram (quantile_disc
    semantics, shared with the quantile queries); both halves bucket
    against them and each bucket's PSI term closes per-CELL (never sum
    float cells across rows — the chi-square lesson)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.quantiles import quantiles_from_histogram
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["ts", "value"])
    empty = pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                          "n1": pd.Series([], dtype="int64"),
                          "n2": pd.Series([], dtype="int64"),
                          "psi_term": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty
    mid = _events_midpoint_us(ds)

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        c = np.rint(b.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"half": pa.array(np.where(us < mid, 1, 2),
                                          pa.int64()),
                         "c": pa.array(c, pa.int64())})

    hist = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                             ["half", "c"], count_alias="n",
                             combine="driver")
    h1 = hist[hist["half"] == 1]
    if h1.empty or hist[hist["half"] == 2].empty:
        return empty
    qs = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    bounds = np.array(sorted(quantiles_from_histogram(
        dict(zip(h1["c"].tolist(), h1["n"].tolist())), qs).values()),
        np.int64)
    # bucket = #boundaries strictly below the value (ties collapse the
    # same way as SQL's sum(c > q))
    bkt = np.searchsorted(np.sort(bounds),
                          hist["c"].to_numpy(np.int64), side="left")
    df = pd.DataFrame({"half": hist["half"].to_numpy(np.int64),
                       "bucket": bkt.astype(np.int64),
                       "n": hist["n"].to_numpy(np.int64)})
    g = df.pivot_table(index="bucket", columns="half", values="n",
                       aggfunc="sum", fill_value=0)
    n1 = g.get(1, pd.Series(0, index=g.index)).to_numpy(np.int64)
    n2 = g.get(2, pd.Series(0, index=g.index)).to_numpy(np.int64)
    tn1, tn2 = int(n1.sum()), int(n2.sum())
    keep = (n1 > 0) & (n2 > 0)
    p1 = (1.0 * n1[keep]) / tn1
    p2 = (1.0 * n2[keep]) / tn2
    term = (p2 - p1) * np.log(p2 / p1)
    r6 = lambda a: np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6
    return pd.DataFrame({
        "bucket": g.index.to_numpy(np.int64)[keep],
        "n1": n1[keep], "n2": n2[keep],
        "psi_term": r6(term) + 0.0}).reset_index(drop=True)


def user_purchase_mcnemar(sf_dir: str):
    """McNemar test on paired user behavior: do users who purchase on
    weekends also purchase on weekdays?  b = weekend-only purchasers,
    c = weekday-only; χ² = (b−c)²/(b+c), exact integers closed with
    one mirrored float division.  Per-user flags are max partials over
    one scan."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])
    empty = pd.DataFrame({"n_users": pd.Series([], dtype="int64"),
                          "b_weekend_only": pd.Series([], dtype="int64"),
                          "c_weekday_only": pd.Series([], dtype="int64"),
                          "chi2": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        purch = pc.equal(b.column("event_type"),
                         pa.scalar("purchase")).to_numpy(
            zero_copy_only=False)
        we = (us // DAY_US + 3) % 7 >= 5
        return pa.table({
            "user_id": pc.cast(b.column("user_id"), pa.int64()),
            "p1": pa.array((purch & we).astype(np.int64)),
            "p2": pa.array((purch & ~we).astype(np.int64))})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["user_id"], max_cols=["p1", "p2"],
                          combine="driver")
    p1 = g["p1"].to_numpy(np.int64)
    p2 = g["p2"].to_numpy(np.int64)
    b_ = int(((p1 == 1) & (p2 == 0)).sum())
    c_ = int(((p1 == 0) & (p2 == 1)).sum())
    if b_ + c_ == 0:
        return empty
    chi2 = (1.0 * ((b_ - c_) * (b_ - c_))) / (1.0 * (b_ + c_))
    return pd.DataFrame({"n_users": [np.int64(len(g))],
                         "b_weekend_only": [np.int64(b_)],
                         "c_weekday_only": [np.int64(c_)],
                         "chi2": [float(np.floor(chi2 * 1e6 + 0.5)
                                        / 1e6) + 0.0]})


def linkage_ari(sf_dir: str):
    """Adjusted Rand Index of the flagship linkage clusters against the
    planted ground truth (pages born from the same doc_id) — the
    chance-corrected companion to the pairwise-F1 gate.  The (cluster,
    doc_id) contingency is one grouped count over the label↔page join
    (cogroup, page-bounded); the ARI closes in exact Python-int pair
    arithmetic: (2T·Sij − 2Sa·Sb) / (T·(Sa+Sb) − 2Sa·Sb) with
    S = Σ n(n−1), T = n(n−1).  Rows-only (clusters are engine
    output, not SQL-derivable)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.pipelines.record_linkage import (cluster_pages,
                                                      prepare_pages)
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.util import cogroup_join, partial_group_agg

    if _read(sf_dir, "documents", ["doc_id"]).count() == 0:
        return pd.DataFrame({"n_pages": pd.Series([], dtype="int64"),
                             "ari": pd.Series([], dtype="float64")})
    pages = prepare_pages(synth_pages(sf_dir, include_doc_id=True)) \
        .materialize()
    labels, _ = cluster_pages(pages, num_partitions=_shuffle_parts())
    truth = pages.map_batches(
        lambda b: b.select(["url", "doc_id"]), batch_format="pyarrow")
    joined = cogroup_join(
        labels.rename_columns({"node": "url"}), truth, on="url",
        left_schema=pa.schema([("url", pa.string()),
                               ("label", pa.string())]),
        right_schema=pa.schema([("url", pa.string()),
                                ("doc_id", pa.int64())]))
    cont = partial_group_agg(joined, ["label", "doc_id"],
                             count_alias="n", combine="driver")
    nij = cont["n"].to_numpy(np.int64)
    n = int(nij.sum())
    if n < 2:
        return pd.DataFrame({"n_pages": [np.int64(n)],
                             "ari": [float("nan")]})
    sij = int(sum(int(v) * (int(v) - 1) for v in nij))
    a = cont.groupby("label")["n"].sum().to_numpy(np.int64)
    b_ = cont.groupby("doc_id")["n"].sum().to_numpy(np.int64)
    sa = int(sum(int(v) * (int(v) - 1) for v in a))
    sb = int(sum(int(v) * (int(v) - 1) for v in b_))
    t = n * (n - 1)
    den = t * (sa + sb) - 2 * sa * sb
    ari = 1.0 if den == 0 else (1.0 * (2 * t * sij - 2 * sa * sb)) \
        / (1.0 * den)
    return pd.DataFrame({"n_pages": [np.int64(n)],
                         "ari": [float(ari)]})


def user_activity_powerlaw_alpha(sf_dir: str):
    """Continuous-MLE power-law exponent of the per-user event-count
    distribution (Clauset-style α = 1 + n / Σ ln(xᵢ / 0.5) with
    x_min = 1) — the heavy-tail diagnostic next to Zipf and the Fano
    factor.  Per-user counts are dimension-bounded; the log sum closes
    on the driver."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id"])
    empty = pd.DataFrame({"n_users": pd.Series([], dtype="int64"),
                          "alpha": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty
    g = partial_group_agg(ds, ["user_id"], count_alias="n",
                          combine="driver")
    x = g["n"].to_numpy(np.float64)
    s = np.log(x / 0.5).sum()
    if s <= 0:
        return empty
    alpha = 1.0 + (1.0 * len(x)) / s
    return pd.DataFrame({"n_users": [np.int64(len(x))],
                         "alpha": [float(np.floor(alpha * 1e6 + 0.5)
                                         / 1e6)]})


def daily_revenue_acf(sf_dir: str):
    """Autocorrelation function of daily revenue at lags 1..14 on the
    observed-day calendar grid — the seasonality fingerprint
    (generalizes the lag-7 query to the full vector).  One bounded
    daily aggregate; each lag is a searchsorted probe with the exact
    integer-moment Pearson close (Python int / HUGEINT)."""
    import math

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"lag": pd.Series([], dtype="int64"),
                          "n_pairs": pd.Series([], dtype="int64"),
                          "acf": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    daily = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["day"], sum_cols=["c"], combine="driver")
    daily = daily.sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(np.int64)
    c = daily["c"].to_numpy(np.int64)
    rows = []
    r6 = lambda v: float(
        np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6) + 0.0
    for lag in range(1, 15):
        idx = np.searchsorted(days, days - lag)
        idx = np.clip(idx, 0, max(len(days) - 1, 0))
        ok = days[idx] == days - lag
        n = int(ok.sum())
        if n < 2:
            continue
        x = c[idx[ok]].astype(object)
        y = c[ok].astype(object)
        sx, sy = x.sum(), y.sum()
        vn = n * (x * y).sum() - sx * sy
        vx = n * (x * x).sum() - sx * sx
        vy = n * (y * y).sum() - sy * sy
        if vx <= 0 or vy <= 0:
            continue
        rows.append((lag, n,
                     r6((1.0 * vn) / math.sqrt((1.0 * vx) * (1.0 * vy)))))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "acf"]) \
        .astype({"lag": "int64", "n_pairs": "int64"})


def events_join_size_stat(sf_dir: str):
    """Join-cardinality statistic: the EXACT output size of the
    self-equi-join between first-half and second-half events on
    user_id (Σ n1(k)·n2(k)), plus both input sizes — the number a
    query planner estimates with sketches, computed here exactly from
    one per-key count aggregate without materializing the join."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    empty = pd.DataFrame({"n_h1": pd.Series([], dtype="int64"),
                          "n_h2": pd.Series([], dtype="int64"),
                          "join_rows": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty
    mid = _events_midpoint_us(ds)

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        h1 = (us < mid).astype(np.int64)
        return pa.table({
            "user_id": pc.cast(b.column("user_id"), pa.int64()),
            "c1": pa.array(h1), "c2": pa.array(1 - h1)})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["user_id"], sum_cols=["c1", "c2"],
                          combine="driver")
    c1 = g["c1"].to_numpy(np.int64).astype(object)
    c2 = g["c2"].to_numpy(np.int64).astype(object)
    return pd.DataFrame({"n_h1": [np.int64(int(c1.sum()))],
                         "n_h2": [np.int64(int(c2.sum()))],
                         "join_rows": [np.int64(int((c1 * c2).sum()))]})


def daily_revenue_volatility(sf_dir: str):
    """Volatility of daily revenue: mean and sample std of
    log-returns ln(cₜ/cₜ₋₁) over CONSECUTIVE observed days — the
    finance-style dispersion metric on the calendar grid.  Daily
    totals are one bounded exact-cents aggregate; per-term logs are
    bit-identical to SQL and the two-pass close drifts only in sum
    order (~1e-13), far inside round-6."""
    import math

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"n_returns": pd.Series([], dtype="int64"),
                          "mean_logret": pd.Series([], dtype="float64"),
                          "std_logret": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    daily = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["day"], sum_cols=["c"], combine="driver")
    daily = daily.sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(np.int64)
    c = daily["c"].to_numpy(np.int64)
    ok = np.diff(days) == 1
    r = np.log((1.0 * c[1:][ok]) / c[:-1][ok])
    n = len(r)
    if n < 2:
        return empty
    mean = r.sum() / n
    var = ((r - mean) ** 2).sum() / (n - 1.0)
    r6 = lambda v: float(
        np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6) + 0.0
    return pd.DataFrame({"n_returns": [np.int64(n)],
                         "mean_logret": [r6(mean)],
                         "std_logret": [r6(math.sqrt(var))]})


def customer_top1pct_share(sf_dir: str):
    """Revenue concentration: the share of total revenue held by the
    top 1% of customers (⌈n/100⌉ biggest lifetime spenders) — the
    inequality headline next to Gini/Theil.  Exact integer cents
    throughout; only the final share divides."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    empty = pd.DataFrame({"n_customers": pd.Series([], dtype="int64"),
                          "k_top": pd.Series([], dtype="int64"),
                          "top_share": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"cust": pc.cast(b.column("o_custkey"), pa.int64()),
                         "x": pa.array(c, pa.int64())})

    per = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            ["cust"], sum_cols=["x"], combine="driver")
    x = np.sort(per["x"].to_numpy(np.int64))[::-1].astype(object)
    n = len(x)
    t = x.sum()
    if n == 0 or t <= 0:
        return empty
    k = -(-n // 100)
    top = x[:k].sum()
    return pd.DataFrame({"n_customers": [np.int64(n)],
                         "k_top": [np.int64(k)],
                         "top_share": [float(np.floor(
                             (1.0 * top) / (1.0 * t) * 1e6 + 0.5)
                             / 1e6)]})


def orders_seasonal_index(sf_dir: str):
    """Classical seasonal index per calendar month: the month's mean
    order value over the overall mean (ratio-of-means form, exact
    cents into one mirrored float tree) — the decomposition primitive
    behind the seasonality queries.  One 12-cell partial aggregate."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"month": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "avg_price": pd.Series([], dtype="float64"),
                          "seasonal_index": pd.Series([],
                                                      dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        m = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]").astype(np.int64) % 12 + 1
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"month": pa.array(m, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["month"], sum_cols=["c"], count_alias="n",
                          combine="driver")
    g = g.sort_values("month").reset_index(drop=True)
    s = [int(v) for v in g["c"].to_numpy(np.int64)]
    n = [int(v) for v in g["n"].to_numpy(np.int64)]
    st, nt = sum(s), sum(n)
    overall = (1.0 * st) / nt / 100.0
    avg = np.array([(1.0 * si) / ni / 100.0 for si, ni in zip(s, n)])
    idx = avg / overall
    r6 = lambda a: np.floor(a * 1e6 + 0.5) / 1e6
    return pd.DataFrame({"month": g["month"].astype("int64"),
                         "n": g["n"].astype("int64"),
                         "avg_price": r6(avg),
                         "seasonal_index": r6(idx)})


def nation_top_supplier_share(sf_dir: str):
    """Market dominance per nation: the top-revenue supplier (exact
    lexicographic argmax) and its share of the nation's lineitem
    revenue — the group-leader-share shape (argmax + ratio in one).
    (nation, supplier) revenue partials are dimension-bounded; the
    argmax walk closes on the driver in exact revenue cents."""
    import numpy as np
    import pandas as pd
    import ray

    from elevant_ray.stages.util import partial_group_agg

    line = _read(sf_dir, "lineitem",
                 ["l_suppkey", "l_extendedprice", "l_discount"])
    empty = pd.DataFrame({"nationkey": pd.Series([], dtype="int64"),
                          "top_suppkey": pd.Series([], dtype="int64"),
                          "share": pd.Series([], dtype="float64")})
    if line.count() == 0:
        return empty
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    sk_ref = ray.put(np.sort(supp["s_suppkey"].to_numpy(np.int64)))
    sn_ref = ray.put(supp.sort_values("s_suppkey")["s_nationkey"]
                     .to_numpy(np.int64))

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get
        sk, sn = cached_get(sk_ref), cached_get(sn_ref)
        ls = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        rev = _rev_cents(b)
        return pa.table({
            "nk": pa.array(sn[np.searchsorted(sk, ls)], pa.int64()),
            "sk": pc.cast(b.column("l_suppkey"), pa.int64()),
            "rev": rev})

    g = partial_group_agg(line.map_batches(pre, batch_format="pyarrow"),
                          ["nk", "sk"], sum_cols=["rev"],
                          combine="driver")
    rows = []
    for nk, sub in g.groupby("nk"):
        sub = sub.sort_values(["rev", "sk"],
                              ascending=[False, True], kind="stable")
        tot = int(sub["rev"].astype(object).sum())
        top = int(sub["rev"].iloc[0])
        if tot <= 0:
            continue
        rows.append((int(nk), int(sub["sk"].iloc[0]),
                     float(np.floor((1.0 * top) / (1.0 * tot) * 1e6
                                    + 0.5) / 1e6)))
    out = pd.DataFrame(rows, columns=["nationkey", "top_suppkey",
                                      "share"])
    return out.sort_values("nationkey").reset_index(drop=True) \
        .astype({"nationkey": "int64", "top_suppkey": "int64"})


def events_key_skew_report(sf_dir: str):
    """Shuffle-skew diagnostic for a join/groupby key: the top-10
    heaviest user_id keys with their row share and skew ratio
    (count / mean count) — the report a planner consults before
    deciding to salt a hot key.  One per-key count aggregate; ratios
    close in mirrored float trees."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "events", ["user_id"])
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "share": pd.Series([], dtype="float64"),
                          "skew_ratio": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty
    full = partial_group_agg(ds, ["user_id"], count_alias="n",
                             combine="driver")
    g = full.sort_values(["n", "user_id"], ascending=[False, True],
                         kind="stable").head(10).reset_index(drop=True)
    tot = int(full["n"].astype(object).sum())
    nk = len(full)
    n = g["n"].to_numpy(np.int64)
    share = (1.0 * n) / tot
    skew = (1.0 * n) / ((1.0 * tot) / nk)
    r6 = lambda a: np.floor(a * 1e6 + 0.5) / 1e6
    return pd.DataFrame({"user_id": g["user_id"].astype("int64"),
                         "n": g["n"].astype("int64"),
                         "share": r6(share),
                         "skew_ratio": r6(skew)})


def nation_seat_allocation(sf_dir: str):
    """Proportional allocation by largest remainder (Hare quota): 100
    'seats' distributed to nations by exact lineitem revenue — the
    deterministic integer-apportionment kernel (budget splits, shard
    quotas).  base = ⌊rev·100/total⌋, leftovers go to the largest
    remainders (nationkey tie-break); everything stays in Python-int /
    HUGEINT arithmetic."""
    import numpy as np
    import pandas as pd
    import ray

    from elevant_ray.stages.util import partial_group_agg

    line = _read(sf_dir, "lineitem",
                 ["l_suppkey", "l_extendedprice", "l_discount"])
    empty = pd.DataFrame({"nationkey": pd.Series([], dtype="int64"),
                          "seats": pd.Series([], dtype="int64")})
    if line.count() == 0:
        return empty
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    sk_ref = ray.put(np.sort(supp["s_suppkey"].to_numpy(np.int64)))
    sn_ref = ray.put(supp.sort_values("s_suppkey")["s_nationkey"]
                     .to_numpy(np.int64))

    def pre(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get
        sk, sn = cached_get(sk_ref), cached_get(sn_ref)
        ls = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "nk": pa.array(sn[np.searchsorted(sk, ls)], pa.int64()),
            "rev": _rev_cents(b)})

    g = partial_group_agg(line.map_batches(pre, batch_format="pyarrow"),
                          ["nk"], sum_cols=["rev"], combine="driver")
    g = g.sort_values("nk").reset_index(drop=True)
    rev = [int(v) for v in g["rev"].to_numpy(np.int64)]
    tot = sum(rev)
    if tot <= 0:
        return empty
    base = [r * 100 // tot for r in rev]
    rem = [r * 100 % tot for r in rev]
    left = 100 - sum(base)
    order = sorted(range(len(rev)),
                   key=lambda i: (-rem[i], int(g["nk"].iloc[i])))
    seats = list(base)
    for i in order[:left]:
        seats[i] += 1
    return pd.DataFrame({"nationkey": g["nk"].astype("int64"),
                         "seats": pd.Series(seats, dtype="int64")})


def part_token_pmi(sf_dir: str):
    """Pointwise mutual information of part-name token pairs:
    PMI = ln(n·c_ab / (c_a·c_b)) for every co-occurring pair (≥5
    parts), the collocation-strength metric behind phrase mining.
    Per-row distinct pair partials (the assortativity kernel) plus a
    bounded token-count aggregate; the log closes per-ROW in exact
    integer operands."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.graph import PAIR_BITS
    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "part", ["p_name"])
    empty = pd.DataFrame({"t1": pd.Series([], dtype="object"),
                          "t2": pd.Series([], dtype="object"),
                          "n_both": pd.Series([], dtype="int64"),
                          "pmi": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty
    n_parts = ds.count()

    mask = np.int64((1 << PAIR_BITS) - 1)

    def pair_partial(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.graph import group_starts_sizes
        from elevant_ray.stages.util import within_group_pairs
        s = pd.Series(b.column("p_name").to_pylist()).str.split(" ")
        e = s.explode()
        codes, toks = pd.factorize(e.to_numpy())
        rows = e.index.to_numpy().astype(np.int64)
        comp = np.unique((rows << PAIR_BITS) + codes)
        # per-PART pair instances (no cross-part dedup — unlike the
        # assortativity query, PMI counts supports, not edge identity),
        # then a within-batch count compression
        starts, sizes = group_starts_sizes(comp >> PAIR_BITS)
        i, j = within_group_pairs(starts, sizes)
        pairs, cnt = np.unique(
            ((comp[i] & mask) << PAIR_BITS) + (comp[j] & mask),
            return_counts=True)
        toks = toks.astype(object)
        u = toks[(pairs >> PAIR_BITS)]
        v = toks[pairs & mask]
        sw = u > v
        return pa.table({"t1": pa.array(np.where(sw, v, u), pa.string()),
                         "t2": pa.array(np.where(sw, u, v), pa.string()),
                         "one": pa.array(cnt.astype(np.int64))})

    pair_cnt = partial_group_agg(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["t1", "t2"], sum_cols=["one"], combine="driver")

    def tok_partial(b: pa.Table) -> pa.Table:
        s = pd.Series(b.column("p_name").to_pylist()).str.split(" ")
        e = s.explode()
        df = pd.DataFrame({"row": e.index, "tok": e.to_numpy()}) \
            .drop_duplicates()
        return pa.table({"tok": pa.array(df["tok"].to_numpy(object),
                                         pa.string()),
                         "one": pa.array(np.ones(len(df), np.int64))})

    tok_cnt = partial_group_agg(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["tok"], sum_cols=["one"], combine="driver")
    cmap = dict(zip(tok_cnt["tok"], tok_cnt["one"].astype(int)))
    pair_cnt = pair_cnt[pair_cnt["one"] >= 5].reset_index(drop=True)
    if pair_cnt.empty:
        return empty
    cab = pair_cnt["one"].to_numpy(np.int64)
    ca = np.array([cmap[t] for t in pair_cnt["t1"]], np.int64)
    cb = np.array([cmap[t] for t in pair_cnt["t2"]], np.int64)
    pmi = np.log((n_parts * cab).astype(np.float64) / ((1.0 * ca) * cb))
    r6 = lambda a: np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6
    out = pd.DataFrame({"t1": pair_cnt["t1"].astype(object),
                        "t2": pair_cnt["t2"].astype(object),
                        "n_both": cab, "pmi": r6(pmi) + 0.0})
    return out.sort_values(["t1", "t2"]).reset_index(drop=True) \
        .astype({"n_both": "int64"})


def docs_extract_numbers(sf_dir: str):
    """Multi-match regex extraction (extract-all + explode): every
    digit run (≤9 digits per chunk, both sides chunk long runs the
    same way) in each document, reduced to per-source match count and
    exact integer sum — the ETL shape behind price/ID scraping.  RE2
    and Python re agree on this pattern; the scan stays per-batch."""
    import re

    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "documents", ["source", "text"])
    empty = pd.DataFrame({"source": pd.Series([], dtype="object"),
                          "n_matches": pd.Series([], dtype="int64"),
                          "total": pd.Series([], dtype="int64")})
    if ds.count() == 0:
        return empty
    rx = re.compile(r"[0-9]{1,9}")

    def pre(b: pa.Table) -> pa.Table:
        srcs = b.column("source").to_pylist()
        txts = b.column("text").to_pylist()
        n = np.zeros(len(txts), np.int64)
        s = np.zeros(len(txts), np.int64)
        for i, t in enumerate(txts):
            hits = rx.findall(t)
            n[i] = len(hits)
            s[i] = sum(int(h) for h in hits)
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "n_matches": pa.array(n), "total": pa.array(s)})

    g = partial_group_agg(ds.map_batches(pre, batch_format="pyarrow"),
                          ["source"], sum_cols=["n_matches", "total"],
                          combine="driver")
    g = g.sort_values("source").reset_index(drop=True)
    return g.astype({"n_matches": "int64", "total": "int64"})


def daily_revenue_theilsen(sf_dir: str):
    """Theil–Sen robust trend estimator over daily revenue: the median
    of all pairwise slopes (c_j−c_i)/(day_j−day_i) — the breakdown-
    resistant alternative to the OLS slope for drift monitoring.  One
    bounded daily aggregate (partial sums, no shuffle of raw orders);
    the O(n²) pairwise-slope multiset closes on the driver over the
    observed-day series with quantile_cont-compatible interpolation."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"n_days": pd.Series([], dtype="int64"),
                          "n_pairs": pd.Series([], dtype="int64"),
                          "slope": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    daily = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["day"], sum_cols=["c"], combine="driver")
    daily = daily.sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(np.int64)
    c = daily["c"].to_numpy(np.int64)
    i, j = np.triu_indices(len(days), k=1)
    slopes = (c[j] - c[i]).astype(np.float64) / (days[j] - days[i])
    if len(slopes) == 0:
        return pd.DataFrame({"n_days": [np.int64(len(days))],
                             "n_pairs": [np.int64(0)],
                             "slope": [np.nan]})
    slopes.sort()
    # quantile_cont(0.5) interpolation: lo + (hi - lo) * frac
    h = (len(slopes) - 1) * 0.5
    f = int(np.floor(h))
    frac = h - f
    med = slopes[f] if frac == 0.0 \
        else slopes[f] + (slopes[f + 1] - slopes[f]) * frac
    r6 = lambda v: float(np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)
                         / 1e6) + 0.0
    return pd.DataFrame({"n_days": [np.int64(len(days))],
                         "n_pairs": [np.int64(len(slopes))],
                         "slope": [r6(med)]})


def daily_revenue_mann_kendall(sf_dir: str):
    """Mann–Kendall monotone-trend test on daily revenue: S = Σ_{i<j}
    sign(c_j − c_i) with the tie-corrected variance
    (n(n−1)(2n+5) − Σ t(t−1)(2t+5)) / 18 and the continuity-corrected
    normal score.  S and both variance operands stay exact Python ints
    (HUGEINT in the oracle); only the final z divides into doubles."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"n_days": pd.Series([], dtype="int64"),
                          "s_stat": pd.Series([], dtype="int64"),
                          "var_s": pd.Series([], dtype="float64"),
                          "z": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        c = np.rint(b.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    daily = partial_group_agg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["day"], sum_cols=["c"], combine="driver")
    daily = daily.sort_values("day").reset_index(drop=True)
    c = daily["c"].to_numpy(np.int64)
    n = len(c)
    i, j = np.triu_indices(n, k=1)
    s = int(np.sign(c[j] - c[i]).astype(np.int64).sum())
    _, cnt = np.unique(c, return_counts=True)
    corr = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5)
               for t in cnt if t > 1)
    num = n * (n - 1) * (2 * n + 5) - corr
    var = float(num) / 18.0
    if var > 0:
        z = (s - 1) / np.sqrt(var) if s > 0 \
            else ((s + 1) / np.sqrt(var) if s < 0 else 0.0)
    else:
        z = np.nan
    r6 = lambda v: float(np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)
                         / 1e6) + 0.0
    return pd.DataFrame({"n_days": [np.int64(n)], "s_stat": [np.int64(s)],
                         "var_s": [r6(var)], "z": [r6(z)]})


def orders_new_vs_repeat_revenue(sf_dir: str):
    """Monthly revenue split between first-time and returning
    customers — the acquisition-vs-retention readout.  Pass 1 is a
    bounded min-aggregate (customer → first order timestamp) broadcast
    as an IntKeyMap; pass 2 flags each order per batch with a
    searchsorted probe and partial-aggregates (month, is_new) sums, so
    neither pass shuffles the orders table."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import IntKeyMap, partial_group_agg

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"])
    empty = pd.DataFrame({"month": pd.Series([], dtype="int64"),
                          "is_new": pd.Series([], dtype="int64"),
                          "n_orders": pd.Series([], dtype="int64"),
                          "revenue": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def key_us(b: pa.Table) -> pa.Table:
        us = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "ck": pc.cast(b.column("o_custkey"), pa.int64()),
            "us": pa.array(us, pa.int64())})

    first = partial_group_agg(
        ds.map_batches(key_us, batch_format="pyarrow"),
        ["ck"], min_cols=["us"], combine="driver")
    fmap = IntKeyMap(first["ck"].to_numpy(np.int64),
                     first["us"].to_numpy(np.int64))

    def flag(b: pa.Table) -> pa.Table:
        us = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        is_new = (fmap.take_checked(ck) == us).astype(np.int64)
        m = us.astype("datetime64[us]").astype("datetime64[M]") \
            .astype(np.int64)
        month = (1970 + m // 12) * 100 + (m % 12 + 1)
        cents = np.rint(b.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({"month": pa.array(month, pa.int64()),
                         "is_new": pa.array(is_new, pa.int64()),
                         "c": pa.array(cents, pa.int64())})

    g = partial_group_agg(ds.map_batches(flag, batch_format="pyarrow"),
                          ["month", "is_new"], sum_cols=["c"],
                          count_alias="n_orders", combine="driver")
    g = g.sort_values(["month", "is_new"]).reset_index(drop=True)
    rev = g["c"].to_numpy(np.int64).astype(np.float64) / 100.0
    return pd.DataFrame({"month": g["month"].astype("int64"),
                         "is_new": g["is_new"].astype("int64"),
                         "n_orders": g["n_orders"].astype("int64"),
                         "revenue": rev})


def lineitem_multiregr(sf_dir: str):
    """Two-predictor OLS (whole-dollar price on quantity + discount
    points) solved from exact integer moments: the five centered
    second-moment sums S11, S22, S12, S1y, S2y are n·Σxy − Σx·Σy in
    unbounded Python-int (HUGEINT in the oracle), and only the final
    Cramer divisions leave exact arithmetic.  One streaming pass of
    per-batch int64 moment partials; no shuffle at all."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import partial_group_agg

    ds = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount"])
    empty = pd.DataFrame({"n": pd.Series([], dtype="int64"),
                          "b0": pd.Series([], dtype="float64"),
                          "b_qty": pd.Series([], dtype="float64"),
                          "b_disc": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def mom(b: pa.Table) -> pa.Table:
        x1 = np.rint(b.column("l_quantity")
                     .to_numpy(zero_copy_only=False)).astype(np.int64)
        x2 = np.rint(b.column("l_discount")
                     .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        y = np.rint(b.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64) // 100
        return pa.table({"k": pa.array([np.int64(0)]),
                         "n": pa.array([np.int64(len(x1))]),
                         "sx1": pa.array([x1.sum()]),
                         "sx2": pa.array([x2.sum()]),
                         "sy": pa.array([y.sum()]),
                         "sx1x1": pa.array([(x1 * x1).sum()]),
                         "sx2x2": pa.array([(x2 * x2).sum()]),
                         "sx1x2": pa.array([(x1 * x2).sum()]),
                         "sx1y": pa.array([(x1 * y).sum()]),
                         "sx2y": pa.array([(x2 * y).sum()])})

    a = partial_group_agg(
        ds.map_batches(mom, batch_format="pyarrow"),
        ["k"], sum_cols=["n", "sx1", "sx2", "sy", "sx1x1", "sx2x2",
                         "sx1x2", "sx1y", "sx2y"], combine="driver")
    n, sx1, sx2, sy, sx1x1, sx2x2, sx1x2, sx1y, sx2y = \
        (int(a[c].iloc[0]) for c in
         ["n", "sx1", "sx2", "sy", "sx1x1", "sx2x2", "sx1x2",
          "sx1y", "sx2y"])
    s11 = n * sx1x1 - sx1 * sx1
    s22 = n * sx2x2 - sx2 * sx2
    s12 = n * sx1x2 - sx1 * sx2
    s1y = n * sx1y - sx1 * sy
    s2y = n * sx2y - sx2 * sy
    det = s11 * s22 - s12 * s12
    r6 = lambda v: float(np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)
                         / 1e6) + 0.0
    if det == 0:
        return pd.DataFrame({"n": [np.int64(n)], "b0": [np.nan],
                             "b_qty": [np.nan], "b_disc": [np.nan]})
    b1 = (float(s22) * s1y - float(s12) * s2y) / det
    b2 = (float(s11) * s2y - float(s12) * s1y) / det
    b0 = (float(sy) - b1 * sx1 - b2 * sx2) / n
    return pd.DataFrame({"n": [np.int64(n)], "b0": [r6(b0)],
                         "b_qty": [r6(b1)], "b_disc": [r6(b2)]})


def linkage_fs_weights(sf_dir: str):
    """Fellegi–Sunter match/non-match weights for record linkage:
    within size-blocked part pairs, gold match = charset-Jaccard of
    names ≥ 0.8 (the DuckDB-identical kernel), and each comparison
    feature (same brand, same type, price within $50) gets
    m = P(agree | match), u = P(agree | non-match) and the log2
    agreement/disagreement weights — the classical ER scoring model
    (Fellegi & Sunter 1969).  Pairs enumerate inside one hash-bucket
    exchange on the block key; only 4-integer per-feature partials
    leave the buckets.

    Reference parity: elevant's pair-scoring evaluation
    (evaluation/benchmark comparison) generalized to weighted ER."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.scoring import score_name_pairs
    from elevant_ray.stages.util import (bucketed_group_apply,
                                         partial_group_agg)

    ds = _read(sf_dir, "part",
               ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                "p_retailprice"])
    cols = ["feature", "n_match", "n_nonmatch", "m_prob", "u_prob",
            "w_agree", "w_disagree"]
    empty = pd.DataFrame({
        "feature": pd.Series([], dtype="object"),
        "n_match": pd.Series([], dtype="int64"),
        "n_nonmatch": pd.Series([], dtype="int64"),
        "m_prob": pd.Series([], dtype="float64"),
        "u_prob": pd.Series([], dtype="float64"),
        "w_agree": pd.Series([], dtype="float64"),
        "w_disagree": pd.Series([], dtype="float64")})
    if ds.count() == 0:
        return empty

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, gg in g.groupby("p_size"):
            gg = gg.sort_values("p_partkey")
            nm = gg["p_name"].to_numpy(dtype=object)
            if len(nm) < 2:
                continue
            i, j = np.triu_indices(len(nm), k=1)
            _, jac = score_name_pairs(nm[i], nm[j])
            match = jac >= 0.8
            br = gg["p_brand"].to_numpy(dtype=object)
            ty = gg["p_type"].to_numpy(dtype=object)
            cc = np.rint(gg["p_retailprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)
            feats = {"same_brand": br[i] == br[j],
                     "same_type": ty[i] == ty[j],
                     "price_within_50": np.abs(cc[i] - cc[j]) <= 5000}
            nm_cnt = int(match.sum())
            nu_cnt = int((~match).sum())
            for name, agree in feats.items():
                rows.append((name, int((agree & match).sum()), nm_cnt,
                             int((agree & ~match).sum()), nu_cnt))
        return pd.DataFrame(rows,
                            columns=["feature", "ma", "nm", "ua", "nu"])

    agg = partial_group_agg(
        bucketed_group_apply(ds, "p_size", per_bucket),
        ["feature"], sum_cols=["ma", "nm", "ua", "nu"],
        combine="driver")
    if agg.empty:
        return empty
    agg = agg.sort_values("feature").reset_index(drop=True)
    ma = agg["ma"].to_numpy(np.int64)
    nm_ = agg["nm"].to_numpy(np.int64)
    ua = agg["ua"].to_numpy(np.int64)
    nu = agg["nu"].to_numpy(np.int64)
    r6 = lambda v: np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6
    with np.errstate(invalid="ignore", divide="ignore"):
        m_prob = np.where(nm_ > 0, r6(1.0 * ma / nm_), np.nan)
        u_prob = np.where(nu > 0, r6(1.0 * ua / nu), np.nan)
        ok_a = (ma > 0) & (ua > 0) & (nm_ > 0) & (nu > 0)
        w_a = np.where(ok_a,
                       r6(np.log2(np.where(ok_a, (1.0 * ma) * nu, 1.0)
                                  / np.where(ok_a, (1.0 * ua) * nm_, 1.0))),
                       np.nan)
        ok_d = (nm_ - ma > 0) & (nu - ua > 0) & (nm_ > 0) & (nu > 0)
        w_d = np.where(ok_d,
                       r6(np.log2(
                           np.where(ok_d, (1.0 * (nm_ - ma)) * nu, 1.0)
                           / np.where(ok_d, (1.0 * (nu - ua)) * nm_, 1.0))),
                       np.nan)
    return pd.DataFrame({"feature": agg["feature"].astype(object),
                         "n_match": nm_, "n_nonmatch": nu,
                         "m_prob": m_prob + 0.0, "u_prob": u_prob + 0.0,
                         "w_agree": w_a + 0.0,
                         "w_disagree": w_d + 0.0})[cols]


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 → cluster labels."""
    return linkage_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # relational core
        "q1_pricing_summary": q1_pricing_summary,
        "q3_top_orders": q3_top_orders,
        "region_revenue": region_revenue,
        "order_priority_counts": order_priority_counts,
        "top_customer_order": top_customer_order,
        "customer_first_order": customer_first_order,
        "customer_running_spend": customer_running_spend,
        "customer_top3_orders": customer_top3_orders,
        "part_type_stats": part_type_stats,
        "supplier_nation_balance": supplier_nation_balance,
        "nation_region_rollup": nation_region_rollup,
        "orders_priority_pivot": orders_priority_pivot,
        "part_brand_sets": part_brand_sets,
        "customer_except": customer_except,
        "supplier_ship_except_all": supplier_ship_except_all,
        "returnflag_harmonic_qty": returnflag_harmonic_qty,
        "repeat_customers": repeat_customers,
        "customer_order_counts": customer_order_counts,
        "customers_inactive": customers_inactive,
        "local_supplier_volume": local_supplier_volume,
        "orders_rank_in_customer": orders_rank_in_customer,
        "orders_price_histogram": orders_price_histogram,
        "small_quantity_revenue": small_quantity_revenue,
        "customer_ntile": customer_ntile,
        "lineitem_price_corr": lineitem_price_corr,
        "orders_yearly_growth": orders_yearly_growth,
        "q22_sales_opportunity": q22_sales_opportunity,
        "part_min_cost_supplier": part_min_cost_supplier,
        "nation_segment_cube": nation_segment_cube,
        "nation_metrics_unpivot": nation_metrics_unpivot,
        "party_nations_union": party_nations_union,
        "brand_names_concat": brand_names_concat,
        "orders_weekly_gapfill": orders_weekly_gapfill,
        "orders_priority_dense_rank": orders_priority_dense_rank,
        "nation_balance_stddev": nation_balance_stddev,
        "returnflag_weighted_avg": returnflag_weighted_avg,
        "customer_running_max": customer_running_max,
        "q7_trade_volume": q7_trade_volume,
        "q10_returned_revenue": q10_returned_revenue,
        "q14_promo_revenue": q14_promo_revenue,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q8_market_share": q8_market_share,
        "q15_top_supplier": q15_top_supplier,
        "q9_product_profit": q9_product_profit,
        "q11_important_parts": q11_important_parts,
        "q20_promotion_suppliers": q20_promotion_suppliers,
        "q18_large_volume": q18_large_volume,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "q4_order_priority": q4_order_priority,
        "q12_late_lines": q12_late_lines,
        "q13_order_count_distribution": q13_order_count_distribution,
        "q16_supplier_variety": q16_supplier_variety,
        "q21_sole_late_shipper": q21_sole_late_shipper,
        "priority_intersect_all": priority_intersect_all,
        "docs_pack_shards": docs_pack_shards,
        "doc_bpe_token_counts": doc_bpe_token_counts,
        "docs_decontaminate": docs_decontaminate,
        "events_value_kurtosis": events_value_kurtosis,
        "purchase_id_gaps": purchase_id_gaps,
        "events_trimmed_mean": events_trimmed_mean,
        "embedding_kmeans": embedding_kmeans,
        "nation_revenue_share": nation_revenue_share,
        "region_priority_grid": region_priority_grid,
        "events_dedup_consecutive": events_dedup_consecutive,
        "nation_balance_band_join": nation_balance_band_join,
        "embedding_component_stats": embedding_component_stats,
        "orders_top_price_rank": orders_top_price_rank,
        "discount_nullaware_stats": discount_nullaware_stats,
        "docs_length_pctile": docs_length_pctile,
        "orders_above_customer_avg": orders_above_customer_avg,
        "orders_price_date_skyline": orders_price_date_skyline,
        "doc_unigram_logprob": doc_unigram_logprob,
        "docs_redact_numbers": docs_redact_numbers,
        "curation_pipeline": curation_pipeline,
        "events_anomaly_mad": events_anomaly_mad,
        "parts_cosupply_top_pairs": parts_cosupply_top_pairs,
        "cosupply_triangles": cosupply_triangles,
        "supplier_bfs_hops": supplier_bfs_hops,
        "purchase_followup_counts": purchase_followup_counts,
        "users_new_cumulative": users_new_cumulative,
        "events_rolling_dau_7d": events_rolling_dau_7d,
        "events_cohort_matrix": events_cohort_matrix,
        "events_snapshot_diff": events_snapshot_diff,
        "data_quality_audit": data_quality_audit,
        "docs_lang_source_chi2": docs_lang_source_chi2,
        "events_value_winsorized": events_value_winsorized,
        "token_postings": token_postings,
        "embedding_pca_top": embedding_pca_top,
        "lang_top_tokens": lang_top_tokens,
        "activity_feed_daily": activity_feed_daily,
        "user_type_breadth_histogram": user_type_breadth_histogram,
        "supplier_degree_histogram": supplier_degree_histogram,
        "events_time_rollup": events_time_rollup,
        "user_time_weighted_value": user_time_weighted_value,
        "orders_peer_avg_diff": orders_peer_avg_diff,
        "priority_ship_delay": priority_ship_delay,
        "events_value_pct_change": events_value_pct_change,
        "region_acctbal_boxplot": region_acctbal_boxplot,
        "docs_source_dedup_rate": docs_source_dedup_rate,
        "user_value_locf": user_value_locf,
        "lineitem_corr_matrix": lineitem_corr_matrix,
        "user_event_type_bitmask": user_event_type_bitmask,
        "returnflag_weighted_median": returnflag_weighted_median,
        "nation_balance_gini": nation_balance_gini,
        "user_activity_streaks": user_activity_streaks,
        "order_basket_rules": order_basket_rules,
        "events_value_benford": events_value_benford,
        "user_value_autocorr": user_value_autocorr,
        "customer_rfm_segments": customer_rfm_segments,
        "events_purchase_context": events_purchase_context,
        "events_since_purchase_rank": events_since_purchase_rank,
        "part_name_split_counts": part_name_split_counts,
        "orders_systematic_sample": orders_systematic_sample,
        "nation_share_of_parent": nation_share_of_parent,
        "signup_purchase_conversion": signup_purchase_conversion,
        "events_rolling_median5": events_rolling_median5,
        "nation_segment_welch_t": nation_segment_welch_t,
        "user_value_ewma": user_value_ewma,
        "customer_decile_concentration": customer_decile_concentration,
        "events_value_ks": events_value_ks,
        "events_mannwhitney_u": events_mannwhitney_u,
        "user_modal_hour": user_modal_hour,
        "user_value_cusum": user_value_cusum,
        "docs_weighted_sample": docs_weighted_sample,
        "events_type_anova": events_type_anova,
        "orders_ship_busdays": orders_ship_busdays,
        "lang_token_js_divergence": lang_token_js_divergence,
        "user_runs_test": user_runs_test,
        "nation_supply_hhi": nation_supply_hhi,
        "user_value_interp_hourly": user_value_interp_hourly,
        "lineitem_qty_chisq_uniform": lineitem_qty_chisq_uniform,
        "orders_iso_week": orders_iso_week,
        "customer_mahalanobis": customer_mahalanobis,
        "doc_sentence_stats": doc_sentence_stats,
        "events_value_rolling_std5": events_value_rolling_std5,
        "lang_confusion_matrix": lang_confusion_matrix,
        "vocab_coverage_90": vocab_coverage_90,
        "part_supplier_kcore": part_supplier_kcore,
        "blocking_quality": blocking_quality,
        "nation_kendall_tau": nation_kendall_tau,
        "daily_user_overlap": daily_user_overlap,
        "gap_kaplan_meier": gap_kaplan_meier,
        "doc_char_entropy": doc_char_entropy,
        "user_phase_value_means": user_phase_value_means,
        "signup_to_purchase_latency": signup_to_purchase_latency,
        "supplier_neighborhood_jaccard": supplier_neighborhood_jaccard,
        "nation_balance_qq": nation_balance_qq,
        "event_type_cosine": event_type_cosine,
        "part_name_token_pairs": part_name_token_pairs,
        "docs_incremental_new": docs_incremental_new,
        "daily_revenue_wow": daily_revenue_wow,
        "nation_segment_sets": nation_segment_sets,
        "events_hourly_control_chart": events_hourly_control_chart,
        "embedding_quantize_check": embedding_quantize_check,
        "user_trailing_type_diversity": user_trailing_type_diversity,
        "customer_year_rank_shift": customer_year_rank_shift,
        "user_idle_share": user_idle_share,
        "customers_churned_1998": customers_churned_1998,
        "doc_keyword_context": doc_keyword_context,
        "event_type_target_encoding": event_type_target_encoding,
        "doc_trigram_novelty": doc_trigram_novelty,
        "docs_length_kruskal": docs_length_kruskal,
        "supplier_late_wilson": supplier_late_wilson,
        "doc_zlib_ratio": doc_zlib_ratio,
        "session_bounce_rate": session_bounce_rate,
        "events_value_minmax_scaled": events_value_minmax_scaled,
        "customer_abc_class": customer_abc_class,
        "user_burstiness": user_burstiness,
        "events_median_ci": events_median_ci,
        "nation_balance_levene": nation_balance_levene,
        "event_type_entropy_rate": event_type_entropy_rate,
        "dup_cluster_size_histogram": dup_cluster_size_histogram,
        "multimodal_audio_energy": multimodal_audio_energy,
        "multimodal_frame_sample": multimodal_frame_sample,
        "curated_shard_write": curated_shard_write,
        "doc_bigram_logprob": doc_bigram_logprob,
        "events_daily_cycle_strength": events_daily_cycle_strength,
        "nation_spearman": nation_spearman,
        "hourly_click_purchase_corr24": hourly_click_purchase_corr24,
        "value_decile_type_matrix": value_decile_type_matrix,
        "customer_recency_weighted_spend": customer_recency_weighted_spend,
        "customer_third_order": customer_third_order,
        "events_type_lift_matrix": events_type_lift_matrix,
        "customer_order_gap_median": customer_order_gap_median,
        "events_weekend_lift": events_weekend_lift,
        "nation_part_coverage": nation_part_coverage,
        "orders_1998_filter_pushdown": orders_1998_filter_pushdown,
        "embedding_dispersion": embedding_dispersion,
        "session_path_top10": session_path_top10,
        "customer_tercile_migration": customer_tercile_migration,
        "daily_revenue_trailing30": daily_revenue_trailing30,
        "part_brand_size_median_price": part_brand_size_median_price,
        "user_active_coverage": user_active_coverage,
        "user_stickiness": user_stickiness,
        "error_burst_peak": error_burst_peak,
        "orders_empirical_rule": orders_empirical_rule,
        "events_value_iqr_outliers": events_value_iqr_outliers,
        "source_jsd_matrix": source_jsd_matrix,
        "orders_quarter_index": orders_quarter_index,
        "events_cumulative_users": events_cumulative_users,
        "orders_changepoint": orders_changepoint,
        "docs_cramers_v": docs_cramers_v,
        "events_type_trend": events_type_trend,
        "events_cohort_ltv": events_cohort_ltv,
        "supplier_pctile": supplier_pctile,
        "lineitem_regr": lineitem_regr,
        "nation_acctbal_geomean": nation_acctbal_geomean,
        "orders_month_seasonality": orders_month_seasonality,
        "part_name_similarity": part_name_similarity,
        "part_name_damerau": part_name_damerau,
        "user_seq_pattern": user_seq_pattern,
        "error_next_purchase_asof": error_next_purchase_asof,
        "customer_order_overlap_pairs": customer_order_overlap_pairs,
        "embedding_dim_argmax": embedding_dim_argmax,
        "customer_spend_index_first": customer_spend_index_first,
        "events_weekend_type_mi": events_weekend_type_mi,
        "embedding_neighbor_dot": embedding_neighbor_dot,
        "orders_price_page2": orders_price_page2,
        "docs_source_checksum": docs_source_checksum,
        "sessions_peak_concurrency": sessions_peak_concurrency,
        "supplier_clustering_coeff": supplier_clustering_coeff,
        "customer_max_drawdown": customer_max_drawdown,
        "embedding_top_pairs": embedding_top_pairs,
        "docs_jsonl_roundtrip": docs_jsonl_roundtrip,
        "docs_cdc_diff": docs_cdc_diff,
        "char_pair_top": char_pair_top,
        "name_match_pr_curve": name_match_pr_curve,
        "docs_pattern_matrix": docs_pattern_matrix,
        "embedding_label_cohesion": embedding_label_cohesion,
        "docs_csv_roundtrip": docs_csv_roundtrip,
        "part_name_prefix_overlap": part_name_prefix_overlap,
        "vocab_growth_curve": vocab_growth_curve,
        "user_type_rle_top": user_type_rle_top,
        "docs_k_anonymity": docs_k_anonymity,
        "daily_revenue_forecast_mape": daily_revenue_forecast_mape,
        "events_welch_ttest": events_welch_ttest,
        "purchase_rate_ztest": purchase_rate_ztest,
        "daily_revenue_autocorr7": daily_revenue_autocorr7,
        "orders_benford": orders_benford,
        "customer_spend_gini": customer_spend_gini,
        "docs_orc_roundtrip": docs_orc_roundtrip,
        "daily_revenue_ewma14": daily_revenue_ewma14,
        "user_active_streaks": user_active_streaks,
        "daily_revenue_rolling_median7": daily_revenue_rolling_median7,
        "customer_spend_theil": customer_spend_theil,
        "part_token_assortativity": part_token_assortativity,
        "brand_weighted_median_price": brand_weighted_median_price,
        "nation_type_simpson": nation_type_simpson,
        "events_hour_of_week": events_hour_of_week,
        "user_event_cms_top": user_event_cms_top,
        "events_value_psi": events_value_psi,
        "user_purchase_mcnemar": user_purchase_mcnemar,
        "linkage_ari": linkage_ari,
        "user_activity_powerlaw_alpha": user_activity_powerlaw_alpha,
        "daily_revenue_acf": daily_revenue_acf,
        "events_join_size_stat": events_join_size_stat,
        "daily_revenue_volatility": daily_revenue_volatility,
        "customer_top1pct_share": customer_top1pct_share,
        "orders_seasonal_index": orders_seasonal_index,
        "nation_top_supplier_share": nation_top_supplier_share,
        "events_key_skew_report": events_key_skew_report,
        "nation_seat_allocation": nation_seat_allocation,
        "part_token_pmi": part_token_pmi,
        "docs_extract_numbers": docs_extract_numbers,
        "daily_revenue_theilsen": daily_revenue_theilsen,
        "daily_revenue_mann_kendall": daily_revenue_mann_kendall,
        "orders_new_vs_repeat_revenue": orders_new_vs_repeat_revenue,
        "lineitem_multiregr": lineitem_multiregr,
        "linkage_fs_weights": linkage_fs_weights,
        "nation_balance_full_join": nation_balance_full_join,
        "type_closure": type_closure,
        "part_pagerank": part_pagerank,
        "split_assign": split_assign,
        # events
        "events_hourly": events_hourly,
        "events_distinct_users": events_distinct_users,
        "events_distinct_users_approx": events_distinct_users_approx,
        "events_sessions": events_sessions,
        "events_attribution": events_attribution,
        "events_funnel": events_funnel,
        "events_window_counts": events_window_counts,
        "events_user_gaps": events_user_gaps,
        "events_heavy_hitters": events_heavy_hitters,
        "events_prop_buckets": events_prop_buckets,
        "user_top_event": user_top_event,
        "user_event_entropy": user_event_entropy,
        "events_moving_avg": events_moving_avg,
        "events_retention": events_retention,
        "event_type_transitions": event_type_transitions,
        "user_first_last_event": user_first_last_event,
        "events_value_skewness": events_value_skewness,
        "events_value_zscore": events_value_zscore,
        "events_purchaser_events": events_purchaser_events,
        "orders_nearby_counts": orders_nearby_counts,
        # text analysis
        "doc_token_counts": doc_token_counts,
        "doc_token_quantiles": doc_token_quantiles,
        "doc_token_quartiles_cont": doc_token_quartiles_cont,
        "doc_token_quantiles_approx": doc_token_quantiles_approx,
        "doc_token_mad": doc_token_mad,
        "unigram_counts": unigram_counts,
        "unigram_counts_incremental": unigram_counts_incremental,
        "bigram_counts": bigram_counts,
        "doc_quality": doc_quality,
        "doc_repetition_stats": doc_repetition_stats,
        "doc_tfidf_top3": doc_tfidf_top3,
        "token_zipf": token_zipf,
        "lang_id": lang_id,
        "doc_fingerprint": doc_fingerprint,
        "docs_stratified_sample": docs_stratified_sample,
        "docs_hash_sample": docs_hash_sample,
        "doc_chunks": doc_chunks,
        # dedup
        "dedup_exact": dedup_exact,
        "dedup_minhash": dedup_minhash,
        "dedup_simhash": dedup_simhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        # similarity search
        "knn_cosine": knn_cosine,
        "knn_ivf": knn_ivf,
        "neardup_embedding": neardup_embedding,
        "embedding_centroids": embedding_centroids,
        "embedding_stats": embedding_stats,
        # multimodal (stubbed decode, real Ray plumbing)
        "multimodal_features": multimodal_features,
        # pages / ELEVANT
        "url_canonicalize": url_canonicalize,
        "extract_pages": extract_pages,
        "benchmark_stats": benchmark_stats,
        "link_frequencies": link_frequencies,
        "most_popular_candidates": most_popular_candidates,
        "entity_popularity": entity_popularity,
        "alias_candidates": alias_candidates,
        "title_synonyms": title_synonyms,
        "docs_longest": docs_longest,
        "linkage_clusters": linkage_clusters,
        "entity_linking": entity_linking,
        "prior_linking": prior_linking,
        "popular_linking": popular_linking,
        "coref_clusters": coref_clusters,
        "linking_eval_counts": linking_eval_counts,
    }


_EN = _sql_list(EN_STOP)
_DE = _sql_list(DE_STOP)


# Shared CTE re-deriving the synthesized pages' hyperlinks (sources/pages.py
# build_markup arithmetic: token p links iff (p*_MIX + doc_id) % 13 == 0,
# target 'Entity <(doc_id+p)%97>'; exact-dup urls at doc_id%25==11 double the
# count, mirrors at doc_id%10==7 add a copy with the middle token perturbed to
# 'variant') so the link-frequency dim family gets closed-form SQL oracles.
_LINKS_CTE = """
WITH raw AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok,
         generate_subscripts(string_split_regex(text, '\\s+'), 1) AS sub
  FROM documents
), toks AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY sub) - 1 AS p,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM raw WHERE tok <> ''
), hits AS (
  SELECT doc_id, tok, p, n FROM toks
  WHERE p > 0 AND (p * 2654435761 + doc_id) % 13 = 0
), links AS (
  SELECT tok AS alias, 'Entity ' || CAST((doc_id + p) % 97 AS VARCHAR) AS target,
         CAST(1 + CASE WHEN doc_id % 25 = 11 THEN 1 ELSE 0 END AS BIGINT) AS w
  FROM hits
  UNION ALL
  SELECT CASE WHEN p = n // 2 THEN 'variant' ELSE tok END AS alias,
         'Entity ' || CAST((doc_id + p) % 97 AS VARCHAR) AS target,
         CAST(1 AS BIGINT) AS w
  FROM hits WHERE doc_id % 10 = 7
), lfreq AS (
  SELECT alias, target, CAST(SUM(w) AS BIGINT) AS freq
  FROM links GROUP BY alias, target
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "link_frequencies": _LINKS_CTE + """
            SELECT alias, target, freq FROM lfreq ORDER BY alias, target
        """,
        "most_popular_candidates": _LINKS_CTE + """
            , r AS (SELECT alias, target, freq,
                    row_number() OVER (PARTITION BY alias
                                       ORDER BY freq DESC, target ASC) AS rn
                    FROM lfreq)
            SELECT alias, target AS top_candidate, freq
            FROM r WHERE rn = 1 ORDER BY alias
        """,
        "entity_popularity": _LINKS_CTE + """
            SELECT target, CAST(SUM(freq) AS BIGINT) AS popularity
            FROM lfreq GROUP BY target ORDER BY target
        """,
        "alias_candidates": _LINKS_CTE + """
            , d AS (SELECT DISTINCT alias, target FROM lfreq)
            SELECT alias, string_agg(target, ',' ORDER BY target) AS qids,
                   CAST(count(*) AS BIGINT) AS n_candidates
            FROM d GROUP BY alias ORDER BY alias
        """,
        # bold-first-token title synonym → distinct page urls; urls are the
        # sources/pages.py page_url variants, mirrors perturb a 1-token doc's
        # only (hence bold) token to 'variant'.
        "title_synonyms": _LINKS_CTE + """
            , ft AS (
              SELECT doc_id, tok, n,
                     'example' || CAST(doc_id % 50 AS VARCHAR)
                       || '.com/articles/' || CAST(doc_id AS VARCHAR) AS base
              FROM toks WHERE p = 0
            ), pages_syn AS (
              SELECT tok AS synonym,
                     CASE CAST(doc_id % 5 AS INTEGER)
                       WHEN 0 THEN 'https://www.' || base
                       WHEN 1 THEN 'http://' || base || '/'
                       WHEN 2 THEN 'https://' || base
                                   || '?utm_source=feed&id='
                                   || CAST(doc_id AS VARCHAR)
                       WHEN 3 THEN 'HTTPS://WWW.' || base
                       ELSE 'https://' || base || '#section-2'
                     END AS url
              FROM ft
              UNION ALL
              SELECT CASE WHEN n = 1 THEN 'variant' ELSE tok END AS synonym,
                     'https://mirror.example.com/copy/'
                       || CAST(doc_id AS VARCHAR) AS url
              FROM ft WHERE doc_id % 10 = 7
            ), d2 AS (SELECT DISTINCT synonym, url FROM pages_syn)
            SELECT synonym, string_agg(url, ',' ORDER BY url) AS urls,
                   CAST(count(*) AS BIGINT) AS n_urls
            FROM d2 GROUP BY synonym ORDER BY synonym
        """,
        "nation_region_rollup": """
            SELECT COALESCE(r_name, 'ALL') AS r_name,
                   COALESCE(n_name, 'ALL') AS n_name,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS total_acctbal_cents
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, n_name)
            ORDER BY 1, 2
        """,
        "orders_priority_pivot": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(count(*) FILTER (o_orderpriority = '1-URGENT')
                        AS BIGINT) AS urgent,
                   CAST(count(*) FILTER (o_orderpriority = '2-HIGH')
                        AS BIGINT) AS high,
                   CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM')
                        AS BIGINT) AS medium,
                   CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
                        AS BIGINT) AS not_specified,
                   CAST(count(*) FILTER (o_orderpriority = '5-LOW')
                        AS BIGINT) AS low
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "customer_running_spend": """
            SELECT o_custkey, o_orderkey,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS running_spend_cents
            FROM orders ORDER BY o_custkey, o_orderkey
        """,
        "customer_top3_orders": """
            WITH r AS (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC,
                                                 o_orderkey ASC) AS rnk
              FROM orders)
            SELECT o_custkey, CAST(rnk AS BIGINT) AS rnk,
                   o_orderkey, o_totalprice
            FROM r WHERE rnk <= 3 ORDER BY o_custkey, rnk
        """,
        "events_funnel": """
            WITH f AS (
              SELECT user_id, min(ts) AS first_view FROM events
              WHERE event_type = 'view' GROUP BY user_id)
            SELECT f.user_id, CAST(count(e.event_id) AS BIGINT) AS purchases_1h
            FROM f LEFT JOIN events e
              ON e.user_id = f.user_id AND e.event_type = 'purchase'
             AND e.ts >= f.first_view
             AND e.ts < f.first_view + INTERVAL 1 HOUR
            GROUP BY f.user_id ORDER BY f.user_id
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT l_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderdate, l_orderkey
            LIMIT 10
        """,
        "region_revenue": """
            SELECT r_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM region JOIN nation ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY r_name ORDER BY r_name
        """,
        "order_priority_counts": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "top_customer_order": """
            SELECT o_custkey, o_orderkey, o_totalprice
            FROM orders
            QUALIFY row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) = 1
            ORDER BY o_custkey
        """,
        "customer_first_order": """
            SELECT o_custkey,
                   o_orderkey AS first_orderkey,
                   o_orderdate AS first_orderdate,
                   count(*) OVER (PARTITION BY o_custkey) AS n_orders
            FROM orders
            QUALIFY row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) = 1
            ORDER BY o_custkey
        """,
        "part_type_stats": """
            SELECT p_type, count(*) AS n_parts,
                   round(avg(p_retailprice), 4) AS avg_price,
                   max(p_size) AS max_size
            FROM part GROUP BY p_type ORDER BY p_type
        """,
        "supplier_nation_balance": """
            SELECT n_name, round(sum(s_acctbal), 2) AS total_balance,
                   count(*) AS n_suppliers
            FROM supplier JOIN nation ON n_nationkey = s_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "part_brand_sets": """
            SELECT p_type,
                   array_to_string(list_sort(list_distinct(list(p_brand))), ',')
                       AS brands,
                   count(DISTINCT p_brand) AS n_brands
            FROM part GROUP BY p_type ORDER BY p_type
        """,
        "customer_except": """
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            EXCEPT
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            ORDER BY o_custkey
        """,
        "repeat_customers": """
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            INTERSECT
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            ORDER BY o_custkey
        """,
        "customer_order_counts": """
            SELECT c_custkey, c_mktsegment,
                   COUNT(o_orderkey)::BIGINT AS n_orders
            FROM customer
            LEFT JOIN orders ON o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey
        """,
        "local_supplier_volume": """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE c_nationkey = s_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "customers_inactive": """
            SELECT c_mktsegment, COUNT(*)::BIGINT AS n_customers,
                   ROUND(SUM(c_acctbal), 2) AS total_acctbal
            FROM customer
            WHERE NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1997-01-01'
                  AND o_orderdate < TIMESTAMP '1997-07-01')
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "orders_rank_in_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC,
                                               o_orderkey) AS rnk
            FROM orders ORDER BY o_custkey, rnk
        """,
        "orders_price_histogram": """
            SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bin,
                   COUNT(*)::BIGINT AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders GROUP BY bin ORDER BY bin
        """,
        "small_quantity_revenue": """
            WITH pagg AS (
                SELECT l_partkey AS pk, COUNT(*) AS cnt,
                       SUM(l_quantity) AS tot
                FROM lineitem GROUP BY l_partkey)
            SELECT p_brand,
                   ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
                   COUNT(*)::BIGINT AS n_items
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN pagg ON pk = l_partkey
            WHERE l_quantity * cnt * 5 < tot
            GROUP BY p_brand ORDER BY p_brand
        """,
        "events_prop_buckets": """
            SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
                       // 10 AS k_bucket,
                   COUNT(*)::BIGINT AS n,
                   ROUND(SUM(value), 2) AS total_value
            FROM events GROUP BY k_bucket ORDER BY k_bucket
        """,
        "user_top_event": """
            WITH c AS (SELECT user_id, event_type, COUNT(*)::BIGINT AS n
                       FROM events GROUP BY user_id, event_type),
            r AS (SELECT user_id, event_type, n,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY n DESC,
                                                     event_type) AS rn
                  FROM c)
            SELECT user_id, event_type, n FROM r WHERE rn = 1
            ORDER BY user_id
        """,
        "events_moving_avg": """
            SELECT user_id, event_id,
                   ROUND(AVG(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                       AS moving_avg
            FROM events ORDER BY user_id, event_id
        """,
        "events_user_gaps": """
            WITH g AS (
                SELECT user_id,
                       epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)) AS gap
                FROM events)
            SELECT user_id, COUNT(*)::BIGINT AS n_events,
                   ROUND(AVG(gap), 3) AS avg_gap_sec,
                   ROUND(MAX(gap), 3) AS max_gap_sec
            FROM g GROUP BY user_id HAVING COUNT(*) >= 2
            ORDER BY user_id
        """,
        "doc_tfidf_top3": """
            WITH t AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
                FROM documents),
            tf AS (SELECT doc_id, token, COUNT(*)::BIGINT AS tf
                   FROM t GROUP BY doc_id, token),
            df AS (SELECT token, COUNT(*)::BIGINT AS df FROM tf GROUP BY token),
            n AS (SELECT COUNT(*) AS n FROM documents),
            s AS (SELECT doc_id, tf.token AS token,
                         tf.tf * ln(n.n / df.df::DOUBLE) AS score
                  FROM tf, df, n WHERE tf.token = df.token),
            r AS (SELECT doc_id, token, score,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, token) AS rn
                  FROM s)
            SELECT doc_id, token, ROUND(score, 6) AS score
            FROM r WHERE rn <= 3 ORDER BY doc_id, token
        """,
        "embedding_centroids": """
            SELECT label::BIGINT AS label, dim::BIGINT AS dim,
                   ROUND(SUM(val::DOUBLE) / COUNT(*), 6) AS centroid
            FROM (SELECT label, unnest(embedding) AS val,
                         generate_subscripts(embedding, 1) AS dim
                  FROM embeddings)
            GROUP BY label, dim ORDER BY label, dim
        """,
        "type_closure": """
            WITH RECURSIVE edges AS (
                SELECT p_partkey AS src, p_partkey // 7 AS dst
                FROM part WHERE p_partkey > 0
                UNION
                SELECT p_partkey, p_partkey // 3
                FROM part WHERE p_partkey > 0),
            walk(src, dst, depth) AS (
                SELECT src, dst, 1 FROM edges
                UNION ALL
                SELECT w.src, e.dst, w.depth + 1
                FROM walk w JOIN edges e ON w.dst = e.src)
            SELECT src, dst, min(depth)::BIGINT AS depth
            FROM walk GROUP BY src, dst ORDER BY src, dst
        """,
        "split_assign": """
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 10 THEN 'test'
                        WHEN bucket < 20 THEN 'dev'
                        ELSE 'train' END AS split
            FROM (SELECT doc_id,
                         ('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::INT64 % 100
                             AS bucket
                  FROM documents)
            ORDER BY doc_id
        """,
        "docs_stratified_sample": """
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       ('0x' || substr(md5(lang || '|' || doc_id::VARCHAR),
                                       1, 6))::INT64 % 100 AS bucket
                FROM documents)
            WHERE bucket < CASE WHEN lang = 'en' THEN 10
                                WHEN lang = 'de' THEN 50
                                ELSE 20 END
            ORDER BY doc_id
        """,
        "doc_chunks": """
            WITH n AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\\S+'))::BIGINT AS n
                FROM documents)
            , c AS (
                SELECT doc_id, n,
                       unnest(range(0, CAST(ceil(n / 80.0) AS BIGINT)))
                           AS chunk_id
                FROM n WHERE n > 0)
            SELECT doc_id, chunk_id,
                   chunk_id * 80 AS begin_tok,
                   LEAST(chunk_id * 80 + 100, n) AS end_tok
            FROM c ORDER BY doc_id, chunk_id
        """,
        "orders_nearby_counts": """
            SELECT a.o_orderkey,
                   count(b.o_orderkey) AS n_nearby,
                   round(coalesce(sum(b.o_totalprice), 0), 2) AS nearby_total
            FROM orders a LEFT JOIN orders b
              ON a.o_custkey = b.o_custkey
             AND a.o_orderkey <> b.o_orderkey
             AND b.o_orderdate BETWEEN a.o_orderdate - INTERVAL 30 DAY
                                   AND a.o_orderdate + INTERVAL 30 DAY
            GROUP BY a.o_orderkey ORDER BY a.o_orderkey
        """,
        "events_window_counts": """
            SELECT event_id, user_id, ts,
                   count(*) OVER w AS n_events_1h,
                   round(sum(value) OVER w, 2) AS sum_value_1h
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
            ORDER BY event_id
        """,
        "events_attribution": """
            SELECT p.user_id, p.event_id, p.ts,
                   v.src_event_id, v.src_ts
            FROM (SELECT user_id, event_id, ts FROM events
                  WHERE event_type = 'purchase') p
            ASOF LEFT JOIN
                 (SELECT user_id, event_id AS src_event_id, ts AS src_ts
                  FROM events WHERE event_type = 'view') v
              ON p.user_id = v.user_id AND p.ts >= v.src_ts
            ORDER BY p.event_id
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY event_type, hour
            ORDER BY event_type, hour
        """,
        "events_distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "events_sessions": """
            WITH e AS (
                SELECT user_id, event_id, ts,
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS pts
                FROM events),
            f AS (
                SELECT user_id,
                       CASE WHEN pts IS NULL
                                 OR date_diff('second', pts, ts) > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM e)
            SELECT user_id, sum(new_sess)::BIGINT AS n_sessions,
                   count(*) AS n_events
            FROM f GROUP BY user_id ORDER BY user_id
        """,
        "doc_token_quantiles": """
            WITH c AS (SELECT lang,
                              length(regexp_extract_all(text, '\\S+'))::BIGINT AS n
                       FROM documents)
            SELECT lang, 0.5::DOUBLE AS q,
                   quantile_disc(n, 0.5)::BIGINT AS n_tokens
            FROM c GROUP BY lang
            UNION ALL
            SELECT lang, 0.9::DOUBLE, quantile_disc(n, 0.9)::BIGINT
            FROM c GROUP BY lang
            UNION ALL
            SELECT lang, 0.99::DOUBLE, quantile_disc(n, 0.99)::BIGINT
            FROM c GROUP BY lang
            ORDER BY lang, q
        """,
        "doc_token_counts": """
            SELECT doc_id,
                   length(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens
            FROM documents ORDER BY doc_id
        """,
        "docs_longest": """
            SELECT doc_id,
                   length(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens
            FROM documents ORDER BY n_tokens DESC, doc_id LIMIT 20
        """,
        "unigram_counts_incremental": """
            SELECT token, count(*)::BIGINT AS count
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
                  FROM documents)
            GROUP BY token ORDER BY token
        """,
        "unigram_counts": """
            SELECT token, count(*)::BIGINT AS count
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
                  FROM documents)
            GROUP BY token ORDER BY token
        """,
        "bigram_counts": """
            SELECT w1, w2, count(*)::BIGINT AS count
            FROM (
              SELECT tok AS w1,
                     lead(tok) OVER (PARTITION BY doc_id ORDER BY sub) AS w2
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok,
                           generate_subscripts(
                               regexp_extract_all(lower(text), '[a-z0-9_]+'), 1) AS sub
                    FROM documents)
            ) WHERE w2 IS NOT NULL
            GROUP BY w1, w2 ORDER BY w1, w2
        """,
        "customer_ntile": """
            SELECT c_custkey, c_mktsegment, c_acctbal,
                   CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                                       ORDER BY c_acctbal, c_custkey) AS BIGINT) AS tile
            FROM customer
            ORDER BY c_mktsegment, tile, c_custkey
        """,
        "lineitem_price_corr": """
            SELECT l_returnflag,
                   round(corr(l_quantity, l_extendedprice), 6) AS price_qty_corr,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "orders_yearly_growth": """
            WITH y AS (
              SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS year,
                     round(sum(o_totalprice), 2) AS revenue,
                     count(*)::BIGINT AS n_orders
              FROM orders GROUP BY 1)
            SELECT year, revenue, n_orders,
                   COALESCE(round(revenue - lag(revenue) OVER (ORDER BY year), 2),
                            0) AS yoy_delta
            FROM y ORDER BY year
        """,
        "q22_sales_opportunity": """
            WITH pos AS (
              SELECT CAST(round(sum(c_acctbal * 100)) AS BIGINT) AS scents,
                     count(*)::BIGINT AS n
              FROM customer
              WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0)
            SELECT c_mktsegment, count(*)::BIGINT AS n_cust,
                   round(sum(c_acctbal), 2) AS total_bal
            FROM customer, pos
            WHERE CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.scents
              AND c_custkey NOT IN (
                    SELECT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1998-01-01')
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "part_min_cost_supplier": """
            SELECT l_partkey AS p_partkey, l_extendedprice AS min_price,
                   s_name AS supplier_name
            FROM (SELECT l_partkey, l_extendedprice, l_suppkey,
                         row_number() OVER (PARTITION BY l_partkey
                                            ORDER BY l_extendedprice,
                                                     l_suppkey) AS rn
                  FROM lineitem) t
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE rn = 1 ORDER BY p_partkey
        """,
        "nation_segment_cube": """
            SELECT COALESCE(CAST(c_nationkey AS BIGINT), -1) AS nationkey,
                   COALESCE(c_mktsegment, 'ALL') AS segment,
                   count(*)::BIGINT AS n_cust,
                   CAST(round(sum(c_acctbal * 100)) AS BIGINT) AS bal_cents
            FROM customer
            GROUP BY CUBE(c_nationkey, c_mktsegment)
            ORDER BY nationkey, segment
        """,
        "party_nations_union": """
            SELECT nationkey FROM (
              SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
              UNION
              SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
            ORDER BY nationkey
        """,
        "brand_names_concat": """
            SELECT p_brand,
                   string_agg(p_name, '|' ORDER BY p_partkey) AS names,
                   count(*)::BIGINT AS n_parts
            FROM part GROUP BY p_brand ORDER BY p_brand
        """,
        "orders_priority_dense_rank": """
            SELECT o_custkey, o_orderkey, o_orderpriority,
                   CAST(dense_rank() OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderpriority)
                        AS BIGINT) AS rnk
            FROM orders ORDER BY o_custkey, o_orderkey
        """,
        "nation_balance_stddev": """
            SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
                   round(stddev_samp(s_acctbal), 6) AS stddev_bal,
                   count(*)::BIGINT AS n_suppliers
            FROM supplier GROUP BY s_nationkey ORDER BY nationkey
        """,
        "returnflag_weighted_avg": """
            SELECT l_returnflag,
                   round(sum(l_extendedprice * l_quantity)
                         / sum(l_quantity), 6) AS wavg_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "customer_running_max": """
            SELECT o_custkey, o_orderkey, o_orderdate,
                   max(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING) AS running_max
            FROM orders ORDER BY o_custkey, o_orderkey
        """,
        "q7_trade_volume": f"""
            SELECT supp_nation, cust_nation, l_year,
                   {_c2d_sql('s')} AS revenue
            FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                         EXTRACT(year FROM l_shipdate)::BIGINT AS l_year,
                         sum({_REV_C_SQL}) AS s
                  FROM lineitem
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation n1 ON n1.n_nationkey = s_nationkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation n2 ON n2.n_nationkey = c_nationkey
                  WHERE n1.n_name <> n2.n_name
                  GROUP BY 1, 2, 3)
            ORDER BY 1, 2, 3
        """,
        "q10_returned_revenue": f"""
            SELECT c_custkey, c_name, n_name, {_c2d_sql('s')} AS revenue
            FROM (SELECT c_custkey, c_name, n_name, sum({_REV_C_SQL}) AS s
                  FROM lineitem
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation ON n_nationkey = c_nationkey
                  WHERE l_returnflag = 'R'
                  GROUP BY 1, 2, 3)
            ORDER BY s DESC, c_custkey
            LIMIT 20
        """,
        "q14_promo_revenue": f"""
            SELECT round((100.0 * sum({_REV_C_SQL})
                              FILTER (WHERE p_type LIKE 'PROMO%'))
                         / sum({_REV_C_SQL}), 6) AS promo_pct,
                   count(*)::BIGINT AS n_items
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-07-01'
        """,
        "q6_forecast_revenue": f"""
            SELECT {_c2d_sql('s')} AS revenue, n_items
            FROM (SELECT sum(CAST(round(l_extendedprice*100) AS BIGINT)
                             * CAST(round(l_discount*100) AS BIGINT)) AS s,
                         count(*)::BIGINT AS n_items
                  FROM lineitem
                  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                    AND l_shipdate < TIMESTAMP '1997-01-01'
                    AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
                    AND l_quantity < 24)
        """,
        "q8_market_share": f"""
            SELECT o_year,
                   round((1.0 * num_c) / rev_c, 6) AS mkt_share
            FROM (SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
                         sum(CASE WHEN n1.n_name = 'NATION_2'
                             THEN {_REV_C_SQL} ELSE 0 END) AS num_c,
                         sum({_REV_C_SQL}) AS rev_c
                  FROM lineitem
                  JOIN part ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation n1 ON n1.n_nationkey = s_nationkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation n2 ON n2.n_nationkey = c_nationkey
                  JOIN region ON r_regionkey = n2.n_regionkey
                  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
                    AND o_orderdate >= TIMESTAMP '1996-01-01'
                    AND o_orderdate < TIMESTAMP '1998-01-01'
                  GROUP BY 1)
            ORDER BY o_year
        """,
        "q15_top_supplier": f"""
            WITH rev AS (SELECT l_suppkey, sum({_REV_C_SQL}) AS s
                         FROM lineitem
                         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                           AND l_shipdate < TIMESTAMP '1996-04-01'
                         GROUP BY 1)
            SELECT s_suppkey, s_name, {_c2d_sql('s')} AS total_revenue
            FROM rev JOIN supplier ON s_suppkey = l_suppkey
            WHERE s = (SELECT max(s) FROM rev)
            ORDER BY s_suppkey
        """,
        "q9_product_profit": f"""
            SELECT n_name AS nation,
                   EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
                   {_c2d_sql(('sum(' + _REV_C_SQL +
                              ' - CAST(round(p_retailprice*100) AS BIGINT)'
                              ' * 100 * CAST(round(l_quantity) AS BIGINT))'))}
                     AS sum_profit
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%bolt%'
            GROUP BY 1, 2
            ORDER BY nation, o_year DESC
        """,
        "q11_important_parts": f"""
            WITH val AS (SELECT l_partkey, sum({_REV_C_SQL}) AS value_c
                         FROM lineitem GROUP BY 1)
            SELECT l_partkey AS p_partkey, {_c2d_sql('value_c')} AS value
            FROM val
            WHERE value_c * 2000 > (SELECT sum(value_c) FROM val)
            ORDER BY value_c DESC, p_partkey
        """,
        "q20_promotion_suppliers": """
            WITH ps AS (SELECT l_partkey, l_suppkey,
                               sum(CAST(round(l_quantity) AS BIGINT)) AS q
                        FROM lineitem JOIN part ON p_partkey = l_partkey
                        WHERE p_name LIKE 'blue%'
                          AND l_shipdate >= TIMESTAMP '1996-01-01'
                          AND l_shipdate < TIMESTAMP '1997-01-01'
                        GROUP BY 1, 2),
                 pt AS (SELECT l_partkey, sum(q) AS t FROM ps GROUP BY 1)
            SELECT DISTINCT s_suppkey, s_name
            FROM ps JOIN pt USING (l_partkey)
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE q * 2 > t
            ORDER BY s_suppkey
        """,
        "q18_large_volume": """
            SELECT o_orderkey, o_custkey, c_name, o_orderdate, o_totalprice,
                   CAST(sum_qty AS BIGINT) AS sum_qty
            FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                  FROM lineitem GROUP BY 1
                  HAVING sum(l_quantity) > 250) q
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY o_orderkey
        """,
        "q19_disjunctive_revenue": f"""
            SELECT {_c2d_sql(f'sum({_REV_C_SQL})')} AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate >= o_orderdate
                                              + INTERVAL 90 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "q12_late_lines": """
            SELECT year(l_shipdate)::BIGINT AS l_year,
                   count(*) FILTER (o_orderpriority IN
                                    ('1-URGENT', '2-HIGH'))::BIGINT
                     AS high_lines,
                   count(*) FILTER (o_orderpriority NOT IN
                                    ('1-URGENT', '2-HIGH'))::BIGINT
                     AS low_lines
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
            GROUP BY 1 ORDER BY 1
        """,
        "q13_order_count_distribution": """
            WITH c_orders AS (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
            SELECT c_count::BIGINT AS c_count,
                   count(*)::BIGINT AS custdist
            FROM c_orders GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "q16_supplier_variety": """
            SELECT p_brand, p_size::BIGINT AS p_size,
                   count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1'
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY p_brand, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_size
        """,
        "q21_sole_late_shipper": """
            WITH ls AS (
              SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ship
              FROM lineitem GROUP BY 1, 2
            ), w AS (
              SELECT l_orderkey, l_suppkey, ship,
                     max(ship) OVER (PARTITION BY l_orderkey) AS mx,
                     count(*) OVER (PARTITION BY l_orderkey) AS nsupp
              FROM ls
            ), q AS (
              SELECT l_orderkey, l_suppkey, ship, mx, nsupp,
                     SUM(CASE WHEN ship = mx THEN 1 ELSE 0 END)
                       OVER (PARTITION BY l_orderkey) AS n_at_max
              FROM w
            )
            SELECT s_name, count(*)::BIGINT AS numwait
            FROM q JOIN supplier ON l_suppkey = s_suppkey
            WHERE nsupp > 1 AND ship = mx AND n_at_max = 1
            GROUP BY s_name ORDER BY numwait DESC, s_name
        """,
        "priority_intersect_all": """
            SELECT o_orderpriority FROM orders
            WHERE year(o_orderdate) = 1996
            INTERSECT ALL
            SELECT o_orderpriority FROM orders
            WHERE year(o_orderdate) = 1997
            ORDER BY o_orderpriority
        """,
        "docs_pack_shards": """
            SELECT doc_id,
                   SUM(n_chars) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING)::BIGINT
                     AS cum_chars,
                   ((SUM(n_chars) OVER (ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING)
                     - n_chars) // 100000)::BIGINT AS shard
            FROM documents ORDER BY doc_id
        """,
        "doc_bpe_token_counts": r"""
            SELECT doc_id,
                   len(regexp_extract_all(
                     text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT
                     AS n_bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "docs_decontaminate": """
            WITH snips AS (
              SELECT DISTINCT substr(text, 21, 40) AS snip
              FROM documents
              WHERE doc_id % 97 = 0 AND length(text) >= 60)
            SELECT doc_id, count(*)::BIGINT AS n_matches
            FROM documents d JOIN snips s ON contains(d.text, s.snip)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "events_retention": """
            WITH w AS (SELECT DISTINCT user_id,
                              date_trunc('week', ts) AS week FROM events)
            SELECT a.week AS week, count(*)::BIGINT AS active,
                   count(b.user_id)::BIGINT AS retained,
                   round(count(b.user_id)::DOUBLE / count(*), 6) AS retention
            FROM w a LEFT JOIN w b
              ON b.user_id = a.user_id AND b.week = a.week + INTERVAL 7 DAY
            GROUP BY 1 ORDER BY 1
        """,
        "event_type_transitions": """
            WITH s AS (SELECT event_type,
                              lead(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
                       FROM events)
            SELECT event_type AS from_type, next_type AS to_type,
                   count(*)::BIGINT AS n
            FROM s WHERE next_type IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "user_first_last_event": """
            WITH s AS (SELECT user_id, event_type,
                              row_number() OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS rn,
                              count(*) OVER (PARTITION BY user_id) AS cnt
                       FROM events)
            SELECT user_id,
                   max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
                   max(CASE WHEN rn = cnt THEN event_type END) AS last_type,
                   max(cnt)::BIGINT AS n_events
            FROM s GROUP BY user_id ORDER BY user_id
        """,
        "supplier_pctile": """
            SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS nationkey,
                   s_acctbal,
                   round(percent_rank() OVER (PARTITION BY s_nationkey
                                              ORDER BY s_acctbal), 6)
                       AS pct_rank,
                   round(cume_dist() OVER (PARTITION BY s_nationkey
                                           ORDER BY s_acctbal), 6) AS cume
            FROM supplier ORDER BY s_suppkey
        """,
        "lineitem_regr": """
            SELECT l_returnflag,
                   round(regr_slope(l_extendedprice, l_quantity), 6)
                       AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 6)
                       AS intercept,
                   count(*)::BIGINT AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "events_value_skewness": """
            SELECT event_type, round(skewness(value), 6) AS skew,
                   count(*)::BIGINT AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "events_value_kurtosis": """
            SELECT event_type, round(kurtosis(value), 6) AS kurt,
                   count(*)::BIGINT AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "parts_cosupply_top_pairs": """
            WITH ls AS (SELECT DISTINCT l_partkey, l_suppkey
                        FROM lineitem)
            SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
                   count(*)::BIGINT AS common_parts
            FROM ls a JOIN ls b ON a.l_partkey = b.l_partkey
                              AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
            ORDER BY common_parts DESC, s1, s2 LIMIT 100
        """,
        "cosupply_triangles": """
            WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                        FROM lineitem),
                 e AS (SELECT DISTINCT a.s AS x, b.s AS y
                       FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s)
            SELECT count(*)::BIGINT AS n_triangles
            FROM e e1
            JOIN e e2 ON e2.x = e1.y
            JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
        """,
        "supplier_bfs_hops": """
            WITH RECURSIVE
              ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                     FROM lineitem),
              e AS (SELECT DISTINCT a.s AS u, b.s AS v
                    FROM ps a JOIN ps b ON a.p = b.p AND a.s <> b.s),
              bfs(node, dist) AS (
                SELECT min(l_suppkey), 0 FROM lineitem
                HAVING min(l_suppkey) IS NOT NULL
                UNION
                SELECT e.v, bfs.dist + 1
                FROM bfs JOIN e ON e.u = bfs.node
                WHERE bfs.dist < 20)
            SELECT node AS s_suppkey, CAST(min(dist) AS BIGINT) AS hops
            FROM bfs GROUP BY node ORDER BY node
        """,
        "events_rolling_dau_7d": """
            WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d
                          FROM events)
            SELECT d AS day,
                   (SELECT count(DISTINCT user_id) FROM events
                    WHERE ts >= d - INTERVAL 6 DAY
                      AND ts < d + INTERVAL 1 DAY)::BIGINT AS dau_7d
            FROM days ORDER BY day
        """,
        "events_cohort_matrix": """
            WITH uw AS (SELECT DISTINCT user_id,
                               date_trunc('week', ts) AS w FROM events),
                 fc AS (SELECT user_id, min(w) AS cw FROM uw GROUP BY 1)
            SELECT cw AS cohort_week,
                   date_diff('day', cw, w) // 7 AS week_offset,
                   count(*)::BIGINT AS n_users
            FROM uw JOIN fc USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "data_quality_audit": """
            SELECT * FROM (
              SELECT 'documents_dup_id' AS check_name,
                     (SELECT (count(*) - count(DISTINCT doc_id))::BIGINT
                      FROM documents) AS n_violations
              UNION ALL SELECT 'events_negative_value',
                     (SELECT count(*)::BIGINT FROM events WHERE value < 0)
              UNION ALL SELECT 'events_null_user',
                     (SELECT count(*)::BIGINT FROM events
                      WHERE user_id IS NULL)
              UNION ALL SELECT 'lineitem_discount_range',
                     (SELECT count(*)::BIGINT FROM lineitem
                      WHERE l_discount < 0 OR l_discount > 1)
              UNION ALL SELECT 'lineitem_fk_part',
                     (SELECT count(*)::BIGINT FROM lineitem
                      WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
              UNION ALL SELECT 'lineitem_fk_supplier',
                     (SELECT count(*)::BIGINT FROM lineitem
                      WHERE l_suppkey NOT IN
                            (SELECT s_suppkey FROM supplier))
              UNION ALL SELECT 'orders_fk_customer',
                     (SELECT count(*)::BIGINT FROM orders
                      WHERE o_custkey NOT IN
                            (SELECT c_custkey FROM customer))
              UNION ALL SELECT 'orders_nonpositive_price',
                     (SELECT count(*)::BIGINT FROM orders
                      WHERE o_totalprice <= 0)
            ) ORDER BY check_name
        """,
        "events_snapshot_diff": """
            WITH a AS (SELECT user_id,
                              sum(CAST(round(value*100) AS BIGINT)) AS c
                       FROM events WHERE ts < TIMESTAMP '2024-01-16'
                       GROUP BY 1),
                 b AS (SELECT user_id,
                              sum(CAST(round(value*100) AS BIGINT)) AS c
                       FROM events WHERE ts >= TIMESTAMP '2024-01-16'
                       GROUP BY 1)
            SELECT COALESCE(a.user_id, b.user_id)::BIGINT AS user_id,
                   CASE WHEN a.user_id IS NULL THEN 'added'
                        WHEN b.user_id IS NULL THEN 'removed'
                        WHEN a.c <> b.c THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   COALESCE(a.c, 0)::BIGINT AS a_cents,
                   COALESCE(b.c, 0)::BIGINT AS b_cents
            FROM a FULL JOIN b ON a.user_id = b.user_id
            ORDER BY user_id
        """,
        "token_postings": """
            WITH td AS (SELECT DISTINCT doc_id,
                               unnest(string_split(text, ' ')) AS token
                        FROM documents),
                 r AS (SELECT token, doc_id,
                              row_number() OVER (PARTITION BY token
                                                 ORDER BY doc_id) AS rn,
                              count(*) OVER (PARTITION BY token) AS df
                       FROM td)
            SELECT token, CAST(max(df) AS BIGINT) AS df_docs,
                   string_agg(CASE WHEN rn <= 10 THEN doc_id END, ','
                              ORDER BY doc_id) AS postings
            FROM r GROUP BY token ORDER BY token
        """,
        "region_acctbal_boxplot": """
            WITH c AS (SELECT r_name,
                              CAST(round(c_acctbal*100) AS BIGINT) AS b
                       FROM customer
                       JOIN nation ON n_nationkey = c_nationkey
                       JOIN region ON r_regionkey = n_regionkey)
            SELECT r_name,
                   min(b)/100.0 AS bal_min,
                   percentile_disc(0.25) WITHIN GROUP (ORDER BY b)/100.0
                     AS bal_q1,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY b)/100.0
                     AS bal_median,
                   percentile_disc(0.75) WITHIN GROUP (ORDER BY b)/100.0
                     AS bal_q3,
                   max(b)/100.0 AS bal_max
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "docs_source_dedup_rate": """
            WITH d AS (SELECT source, count(*) AS n,
                              count(DISTINCT md5(text)) AS nd
                       FROM documents GROUP BY 1)
            SELECT source, n::BIGINT AS n_docs, nd::BIGINT AS n_distinct,
                   round(1.0 - (1.0*nd)/n, 6) + 0 AS dup_rate
            FROM d ORDER BY source
        """,
        "events_value_pct_change": """
            WITH w AS (SELECT event_id, user_id,
                              CAST(round(value*100) AS BIGINT) AS c,
                              lag(CAST(round(value*100) AS BIGINT))
                                OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev
                       FROM events)
            SELECT event_id, user_id::BIGINT AS user_id,
                   round((1.0*(c - prev))/prev, 6) + 0 AS pct_change
            FROM w WHERE prev IS NOT NULL AND prev <> 0
            ORDER BY event_id
        """,
        "orders_peer_avg_diff": """
            WITH o AS (SELECT o_orderkey, o_custkey,
                              CAST(round(o_totalprice*100) AS BIGINT) AS c
                       FROM orders),
                 s AS (SELECT o_custkey, sum(c) AS sc, count(*) AS n
                       FROM o GROUP BY 1)
            SELECT o_orderkey, o.o_custkey::BIGINT AS o_custkey,
                   round((c - (1.0*(sc - c))/(n - 1)) / 100, 4) + 0
                     AS peer_diff
            FROM o JOIN s USING (o_custkey)
            WHERE n >= 2 ORDER BY o_orderkey
        """,
        "priority_ship_delay": """
            WITH j AS (SELECT o_orderpriority AS p,
                              date_diff('day', o_orderdate, l_shipdate)
                                AS d
                       FROM lineitem
                       JOIN orders ON o_orderkey = l_orderkey)
            SELECT p AS o_orderpriority,
                   round(1.0*sum(d)/count(*), 6) AS avg_delay,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY d)::BIGINT
                     AS p50_delay,
                   max(d)::BIGINT AS max_delay,
                   count(*)::BIGINT AS n_lines
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "signup_purchase_conversion": """
            WITH s AS (SELECT user_id, min(ts) AS st FROM events
                       WHERE event_type = 'signup' GROUP BY 1),
                 p AS (SELECT e.user_id, min(e.ts) AS pt
                       FROM events e JOIN s ON e.user_id = s.user_id
                                         AND e.ts >= s.st
                       WHERE e.event_type = 'purchase' GROUP BY 1),
                 j AS (SELECT (epoch_us(pt) - epoch_us(st))
                                // 86400000000 AS day_offset
                       FROM p JOIN s ON p.user_id = s.user_id)
            SELECT day_offset::BIGINT AS day_offset,
                   count(*)::BIGINT AS n_users
            FROM j WHERE day_offset <= 7
            GROUP BY 1 ORDER BY 1
        """,
        "events_rolling_median5": """
            WITH c AS (SELECT event_id, user_id, ts,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events)
            SELECT event_id, user_id::BIGINT AS user_id,
                   (median(c) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS 4 PRECEDING)) / 100.0 AS med5
            FROM c ORDER BY event_id
        """,
        "nation_segment_welch_t": """
            WITH c AS (SELECT c_nationkey, c_mktsegment,
                              CAST(round(c_acctbal*100) AS BIGINT) AS c
                       FROM customer
                       WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
                 a AS (SELECT c_nationkey, c_mktsegment,
                              count(*)::BIGINT AS n,
                              sum(c)::BIGINT AS sc,
                              sum(c*c)::BIGINT AS scc
                       FROM c GROUP BY 1, 2),
                 p AS (SELECT x.c_nationkey,
                              x.n AS na, x.sc AS sa, x.scc AS qa,
                              y.n AS nb, y.sc AS sb, y.scc AS qb
                       FROM a x JOIN a y USING (c_nationkey)
                       WHERE x.c_mktsegment = 'BUILDING'
                         AND y.c_mktsegment = 'MACHINERY'
                         AND x.n >= 2 AND y.n >= 2)
            SELECT n_name, na AS n_a, nb AS n_b,
                   round(((1.0*sa)/na - (1.0*sb)/nb) /
                         sqrt(((qa - (1.0*sa/na)*sa)/(na-1))/na +
                              ((qb - (1.0*sb/nb)*sb)/(nb-1))/nb), 6) + 0
                     AS welch_t
            FROM p JOIN nation ON n_nationkey = c_nationkey
            ORDER BY n_name
        """,
        "user_value_ewma": """
            WITH o AS (SELECT user_id,
                              CAST(round(value*100) AS BIGINT)/100.0 AS v,
                              ts, event_id
                       FROM events),
                 l AS (SELECT user_id,
                              list(v ORDER BY ts, event_id) AS vs
                       FROM o GROUP BY 1)
            SELECT user_id::BIGINT AS user_id,
                   len(vs)::BIGINT AS n_events,
                   round(list_reduce(vs, (acc, x) -> 0.8*acc + 0.2*x), 6)
                     + 0 AS ewma
            FROM l ORDER BY user_id
        """,
        "customer_decile_concentration": """
            WITH a AS (SELECT o_custkey,
                              sum(CAST(round(o_totalprice*100) AS BIGINT))
                                ::BIGINT AS c
                       FROM orders GROUP BY 1),
                 t AS (SELECT c, ntile(10) OVER (ORDER BY c, o_custkey)
                                AS decile
                       FROM a)
            SELECT decile::BIGINT AS decile,
                   count(*)::BIGINT AS n_customers,
                   sum(c)::BIGINT/100.0 AS revenue,
                   round((1.0*sum(c))/(SELECT sum(c) FROM a), 6) + 0
                     AS share
            FROM t GROUP BY 1 ORDER BY 1
        """,
        "events_purchase_context": """
            WITH w AS (SELECT event_id, user_id, ts, event_type,
                              lag(CASE WHEN event_type <> 'purchase'
                                       THEN event_id END IGNORE NULLS)
                                OVER uw AS pid,
                              lag(CASE WHEN event_type <> 'purchase'
                                       THEN ts END IGNORE NULLS)
                                OVER uw AS pts,
                              lead(CASE WHEN event_type <> 'purchase'
                                        THEN event_id END IGNORE NULLS)
                                OVER uw AS nid,
                              lead(CASE WHEN event_type <> 'purchase'
                                        THEN ts END IGNORE NULLS)
                                OVER uw AS nts
                       FROM events
                       WINDOW uw AS (PARTITION BY user_id
                                     ORDER BY ts, event_id))
            SELECT event_id, user_id::BIGINT AS user_id,
                   CASE WHEN nid IS NULL THEN pid
                        WHEN pid IS NULL THEN nid
                        WHEN date_diff('microsecond', pts, ts)
                             <= date_diff('microsecond', ts, nts)
                          THEN pid
                        ELSE nid END AS ctx_event_id
            FROM w
            WHERE event_type = 'purchase'
              AND (pid IS NOT NULL OR nid IS NOT NULL)
            ORDER BY event_id
        """,
        "events_since_purchase_rank": """
            WITH g AS (SELECT event_id, user_id, ts,
                              sum(CASE WHEN event_type = 'purchase'
                                       THEN 1 ELSE 0 END)
                                OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS grp
                       FROM events)
            SELECT event_id, user_id::BIGINT AS user_id,
                   row_number() OVER (PARTITION BY user_id, grp
                                      ORDER BY ts, event_id)::BIGINT
                     AS n_since
            FROM g ORDER BY event_id
        """,
        "part_name_split_counts": """
            WITH s AS (SELECT split_part(p_name, ' ', 1) AS adjective,
                              split_part(p_name, ' ', 2) AS noun,
                              CAST(round(p_retailprice*100) AS BIGINT)
                                AS c
                       FROM part)
            SELECT adjective, noun, count(*)::BIGINT AS n_parts,
                   round((1.0*sum(c))/(100*count(*)), 6) + 0 AS avg_price
            FROM s GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "orders_systematic_sample": """
            WITH r AS (SELECT o_orderkey,
                              row_number() OVER (ORDER BY o_orderdate,
                                                 o_orderkey) AS rn
                       FROM orders)
            SELECT o_orderkey, rn::BIGINT AS sample_rank
            FROM r WHERE (rn - 1) % 97 = 0 ORDER BY o_orderkey
        """,
        "nation_share_of_parent": """
            WITH f AS (SELECT n_nationkey, n_name, r_name,
                              sum(CAST(round(o_totalprice*100) AS BIGINT))
                                ::BIGINT AS c
                       FROM orders
                       JOIN customer ON c_custkey = o_custkey
                       JOIN nation ON n_nationkey = c_nationkey
                       JOIN region ON r_regionkey = n_regionkey
                       GROUP BY 1, 2, 3),
                 r AS (SELECT *,
                              sum(c) OVER (PARTITION BY r_name) AS rc,
                              sum(c) OVER () AS tc
                       FROM f)
            SELECT r_name, n_name, c/100.0 AS revenue,
                   round((1.0*c)/rc, 6) + 0 AS share_of_region,
                   round((1.0*rc)/tc, 6) + 0 AS region_share_of_total
            FROM r ORDER BY r_name, n_name
        """,
        "user_activity_streaks": """
            WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt
                       FROM events),
                 r AS (SELECT user_id, dt,
                              dt - (row_number() OVER
                                    (PARTITION BY user_id
                                     ORDER BY dt))::INT AS grp
                       FROM d),
                 s AS (SELECT user_id, count(*) AS len
                       FROM r GROUP BY user_id, grp)
            SELECT user_id::BIGINT AS user_id,
                   sum(len)::BIGINT AS n_active_days,
                   max(len)::BIGINT AS max_streak
            FROM s GROUP BY 1 ORDER BY user_id
        """,
        "order_basket_rules": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                        FROM lineitem),
                 nn AS (SELECT count(DISTINCT o) AS n FROM op),
                 ic AS (SELECT p, count(*) AS c FROM op GROUP BY 1),
                 pr AS (SELECT a.p AS pa, b.p AS pb
                        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
                 s AS (SELECT pa, pb, count(*) AS sup
                       FROM pr GROUP BY 1, 2)
            SELECT pa AS part_a, pb AS part_b, sup::BIGINT AS support,
                   round((1.0*sup)/ca.c, 6) + 0 AS conf_a_to_b,
                   round((1.0*sup)/cb.c, 6) + 0 AS conf_b_to_a,
                   round((1.0*nn.n*sup)/(ca.c*cb.c), 6) + 0 AS lift
            FROM s JOIN ic ca ON ca.p = pa JOIN ic cb ON cb.p = pb
            CROSS JOIN nn
            WHERE sup >= 2 ORDER BY pa, pb
        """,
        "events_value_benford": """
            WITH c AS (SELECT CAST(round(value*100) AS BIGINT) AS c
                       FROM events WHERE round(value*100) > 0),
                 d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1)
                                   AS BIGINT) AS digit FROM c),
                 g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1)
            SELECT digit, n::BIGINT AS n,
                   round((1.0*n)/(SELECT sum(n) FROM g), 6) + 0 AS share
            FROM g ORDER BY digit
        """,
        "user_value_autocorr": """
            WITH w AS (SELECT user_id,
                              CAST(round(value*100) AS BIGINT) AS c,
                              lag(CAST(round(value*100) AS BIGINT))
                                OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev
                       FROM events)
            SELECT user_id::BIGINT AS user_id,
                   count(*)::BIGINT AS n_pairs,
                   round(corr(c, prev), 6) + 0 AS autocorr
            FROM w WHERE prev IS NOT NULL
            GROUP BY 1 HAVING count(*) >= 2 ORDER BY user_id
        """,
        "customer_rfm_segments": """
            WITH a AS (SELECT o_custkey, max(o_orderdate) AS r,
                              count(*) AS f,
                              sum(CAST(round(o_totalprice*100) AS BIGINT))
                                AS m
                       FROM orders GROUP BY 1),
                 t AS (SELECT o_custkey,
                              ntile(5) OVER (ORDER BY r, o_custkey)
                                AS r_score,
                              ntile(5) OVER (ORDER BY f, o_custkey)
                                AS f_score,
                              ntile(5) OVER (ORDER BY m, o_custkey)
                                AS m_score
                       FROM a)
            SELECT r_score::BIGINT AS r_score, f_score::BIGINT AS f_score,
                   m_score::BIGINT AS m_score,
                   count(*)::BIGINT AS n_customers
            FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "user_value_locf": """
            WITH w AS (SELECT event_id, user_id, ts,
                              CASE WHEN event_type <> 'click'
                                   THEN CAST(round(value*100) AS BIGINT)
                              END AS c
                       FROM events),
                 f AS (SELECT event_id, user_id,
                              last_value(c IGNORE NULLS) OVER
                                (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS fc
                       FROM w)
            SELECT event_id, user_id::BIGINT AS user_id,
                   fc/100.0 AS locf_value
            FROM f WHERE fc IS NOT NULL ORDER BY event_id
        """,
        "lineitem_corr_matrix": """
            SELECT * FROM (
              SELECT 'l_discount' AS var_x, 'l_extendedprice' AS var_y,
                     round(corr(l_discount, l_extendedprice), 6) + 0 AS r
              FROM lineitem
              UNION ALL
              SELECT 'l_discount', 'l_quantity',
                     round(corr(l_discount, l_quantity), 6) + 0
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', 'l_quantity',
                     round(corr(l_extendedprice, l_quantity), 6) + 0
              FROM lineitem)
            ORDER BY var_x, var_y
        """,
        "user_event_type_bitmask": """
            WITH codes AS (SELECT event_type,
                                  row_number() OVER (ORDER BY event_type)
                                    - 1 AS b
                           FROM (SELECT DISTINCT event_type FROM events)),
                 m AS (SELECT user_id, date_trunc('week', ts) AS wk,
                              bit_or(1::BIGINT << b::INT) AS mask
                       FROM events JOIN codes USING (event_type)
                       GROUP BY 1, 2)
            SELECT mask, count(*)::BIGINT AS n_groups
            FROM m GROUP BY 1 ORDER BY mask
        """,
        "returnflag_weighted_median": """
            WITH b AS (SELECT l_returnflag,
                              CAST(round(l_extendedprice*100) AS BIGINT)
                                AS v,
                              CAST(round(l_quantity) AS BIGINT) AS w
                       FROM lineitem),
                 g AS (SELECT l_returnflag, v, sum(w) AS w
                       FROM b GROUP BY 1, 2),
                 c AS (SELECT l_returnflag, v,
                              sum(w) OVER (PARTITION BY l_returnflag
                                           ORDER BY v) AS cw,
                              sum(w) OVER (PARTITION BY l_returnflag)
                                AS tw
                       FROM g)
            SELECT l_returnflag, min(v)/100.0 AS wmedian_price
            FROM c WHERE 2*cw >= tw GROUP BY 1 ORDER BY 1
        """,
        "nation_balance_gini": """
            WITH b AS (SELECT c_nationkey,
                              CAST(round(c_acctbal*100) AS BIGINT) AS x
                       FROM customer),
                 r AS (SELECT c_nationkey, x,
                              row_number() OVER (PARTITION BY c_nationkey
                                                 ORDER BY x) AS i
                       FROM b),
                 a AS (SELECT c_nationkey, sum(i*x)::BIGINT AS six,
                              sum(x)::BIGINT AS sx, count(*)::BIGINT AS n
                       FROM r GROUP BY 1)
            SELECT n_name,
                   round((2.0*six)/(n*sx) - (1.0*(n+1))/n, 6) + 0 AS gini
            FROM a JOIN nation ON n_nationkey = c_nationkey
            ORDER BY n_name
        """,
        "supplier_degree_histogram": """
            WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                        FROM lineitem),
                 e AS (SELECT DISTINCT a.s AS u, b.s AS v
                       FROM ps a JOIN ps b ON a.p = b.p AND a.s <> b.s),
                 d AS (SELECT u, count(*) AS deg FROM e GROUP BY 1)
            SELECT deg::BIGINT AS degree, count(*)::BIGINT AS n_suppliers
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "events_time_rollup": """
            SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket,
                   count(*)::BIGINT AS n,
                   CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                     AS amt_cents
            FROM events GROUP BY 2
            UNION ALL
            SELECT 'day', date_trunc('day', ts), count(*)::BIGINT,
                   CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
            FROM events GROUP BY 2
            UNION ALL
            SELECT 'week', date_trunc('week', ts), count(*)::BIGINT,
                   CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
            FROM events GROUP BY 2
            ORDER BY grain, bucket
        """,
        "user_time_weighted_value": """
            WITH w AS (SELECT user_id,
                              CAST(round(value*100) AS BIGINT) AS c,
                              (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id))
                               - epoch_us(ts)) // 1000 AS dur
                       FROM events)
            SELECT user_id::BIGINT AS user_id,
                   round((1.0 * sum(c*dur) / sum(dur)) / 100, 6)
                     AS twa_value
            FROM w WHERE dur IS NOT NULL
            GROUP BY 1 HAVING sum(dur) > 0 ORDER BY 1
        """,
        "lang_top_tokens": """
            WITH c AS (SELECT lang, unnest(string_split(text, ' ')) AS token
                       FROM documents),
                 cc AS (SELECT lang, token, count(*)::BIGINT AS cnt
                        FROM c GROUP BY 1, 2),
                 r AS (SELECT *, row_number() OVER (PARTITION BY lang
                                 ORDER BY cnt DESC, token) AS rn
                       FROM cc)
            SELECT lang, token, cnt, rn::BIGINT AS rnk
            FROM r WHERE rn <= 3 ORDER BY lang, rnk
        """,
        "activity_feed_daily": """
            WITH feed AS (
              SELECT ts AS t, 'event_' || event_type AS kind,
                     CAST(round(value*100) AS BIGINT) AS amt FROM events
              UNION ALL
              SELECT o_orderdate, 'order',
                     CAST(round(o_totalprice*100) AS BIGINT) FROM orders)
            SELECT date_trunc('day', t) AS day, kind,
                   count(*)::BIGINT AS n,
                   CAST(sum(amt) AS BIGINT) AS amt_cents
            FROM feed GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "user_type_breadth_histogram": """
            WITH b AS (SELECT user_id,
                              count(DISTINCT event_type) AS k
                       FROM events GROUP BY 1)
            SELECT k::BIGINT AS n_types, count(*)::BIGINT AS n_users
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "events_value_winsorized": """
            WITH q AS (SELECT event_type,
                              percentile_disc(0.05) WITHIN GROUP
                                (ORDER BY CAST(round(value*100) AS BIGINT))
                                AS lo,
                              percentile_disc(0.95) WITHIN GROUP
                                (ORDER BY CAST(round(value*100) AS BIGINT))
                                AS hi
                       FROM events GROUP BY 1)
            SELECT event_id, e.event_type,
                   LEAST(GREATEST(CAST(round(value*100) AS BIGINT), lo),
                         hi) / 100.0 AS value_w
            FROM events e JOIN q USING (event_type)
            ORDER BY event_id
        """,
        "docs_lang_source_chi2": """
            WITH cells AS (SELECT lang, source, count(*)::BIGINT AS o
                           FROM documents GROUP BY 1, 2),
                 m AS (SELECT lang, source, o,
                              sum(o) OVER (PARTITION BY lang) AS rt,
                              sum(o) OVER (PARTITION BY source) AS ct,
                              sum(o) OVER () AS n
                       FROM cells)
            SELECT lang, source, o AS observed,
                   round((1.0*rt)*ct/n, 6) AS expected,
                   round((o - (1.0*rt)*ct/n) * (o - (1.0*rt)*ct/n)
                         / ((1.0*rt)*ct/n), 6) AS contrib
            FROM m ORDER BY lang, source
        """,
        "purchase_followup_counts": """
            SELECT p.event_id, count(e.event_id)::BIGINT AS n_follow
            FROM events p
            LEFT JOIN events e ON e.user_id = p.user_id
                              AND e.ts > p.ts
                              AND e.ts <= p.ts + INTERVAL 1 HOUR
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id ORDER BY p.event_id
        """,
        "users_new_cumulative": """
            WITH f AS (SELECT user_id, min(ts) AS mn
                       FROM events GROUP BY 1),
                 d AS (SELECT date_trunc('day', mn) AS day,
                              count(*)::BIGINT AS new_users
                       FROM f GROUP BY 1)
            SELECT day, new_users,
                   CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
                     AS cum_users
            FROM d ORDER BY day
        """,
        "events_anomaly_mad": """
            WITH s AS (SELECT event_type, median(value) AS med,
                              mad(value) AS madv
                       FROM events GROUP BY 1)
            SELECT e.event_type, round(med, 6) AS med,
                   round(madv, 6) AS mad,
                   count(*) FILTER (abs(value - med) > 3 * madv)::BIGINT
                     AS n_outliers,
                   count(*)::BIGINT AS n
            FROM events e JOIN s USING (event_type)
            GROUP BY e.event_type, med, madv ORDER BY e.event_type
        """,
        "curation_pipeline": f"""
            WITH fp AS (
              SELECT doc_id, text, n_chars,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ',
                                             'g'))) AS f
              FROM documents),
            keep AS (
              SELECT doc_id, text, n_chars FROM fp
              QUALIFY row_number() OVER (PARTITION BY f
                                         ORDER BY doc_id) = 1),
            q AS (
              SELECT doc_id, text, n_chars FROM keep
              WHERE length(regexp_extract_all(text, '\\S+')) >= 20
                AND length(list_filter(
                      regexp_extract_all(lower(text), '[a-z0-9_]+'),
                      x -> list_contains({_EN}, x))) >= 1),
            snips AS (
              SELECT DISTINCT substr(text, 21, 40) AS snip
              FROM documents
              WHERE doc_id % 97 = 0 AND length(text) >= 60),
            surv AS (
              SELECT doc_id, n_chars FROM q
              WHERE NOT EXISTS (SELECT 1 FROM snips s
                                WHERE contains(q.text, s.snip)))
            SELECT doc_id,
                   SUM(n_chars) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING)::BIGINT
                     AS cum_chars,
                   ((SUM(n_chars) OVER (ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING)
                     - n_chars) // 100000)::BIGINT AS shard
            FROM surv ORDER BY doc_id
        """,
        "docs_redact_numbers": """
            SELECT doc_id,
                   regexp_replace(text, '[0-9]+', '<NUM>', 'g')
                     AS redacted,
                   len(regexp_extract_all(text, '[0-9]+'))::BIGINT
                     AS n_redacted
            FROM documents ORDER BY doc_id
        """,
        "doc_unigram_logprob": """
            WITH d AS (SELECT doc_id,
                              unnest(regexp_extract_all(
                                lower(text), '[a-z0-9_]+')) AS token
                       FROM documents),
            vc AS (SELECT token, count(*) AS c FROM d GROUP BY token),
            tot AS (SELECT sum(c)::DOUBLE AS t FROM vc)
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   round(SUM(ln(c / t)), 4) AS logprob
            FROM d JOIN vc USING (token) CROSS JOIN tot
            GROUP BY doc_id ORDER BY doc_id
        """,
        "orders_price_date_skyline": """
            SELECT o_orderkey, o_orderdate, o_totalprice
            FROM orders o
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o2
              WHERE o2.o_totalprice > o.o_totalprice
                AND o2.o_orderdate < o.o_orderdate)
            ORDER BY o_orderkey
        """,
        "orders_above_customer_avg": """
            WITH c AS (
              SELECT o_custkey,
                     SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS s,
                     count(*) AS n
              FROM orders GROUP BY o_custkey)
            SELECT o_orderpriority, count(*)::BIGINT AS n_above
            FROM orders JOIN c USING (o_custkey)
            WHERE CAST(round(o_totalprice * 100) AS BIGINT) * n > s
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "docs_length_pctile": """
            SELECT doc_id, source,
                   round(percent_rank() OVER (PARTITION BY source
                                              ORDER BY n_chars), 6)
                     AS pct_rank
            FROM documents ORDER BY doc_id
        """,
        "discount_nullaware_stats": """
            WITH d AS (SELECT l_returnflag,
                              NULLIF(l_discount, 0.0) AS disc
                       FROM lineitem)
            SELECT l_returnflag,
                   count(*)::BIGINT AS n_rows,
                   count(disc)::BIGINT AS n_discounted,
                   round(avg(disc), 6) AS avg_discount,
                   count(DISTINCT disc)::BIGINT AS n_distinct
            FROM d GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "embedding_component_stats": """
            WITH x AS (
              SELECT unnest(embedding) AS v,
                     generate_subscripts(embedding, 1) - 1 AS dim
              FROM embeddings)
            SELECT dim::BIGINT AS dim,
                   round(SUM(CAST(v AS DOUBLE))
                         / count(*), 6) AS mean_val,
                   round(CAST(max(v) AS DOUBLE), 6) AS max_val
            FROM x GROUP BY dim ORDER BY dim
        """,
        "orders_top_price_rank": """
            WITH r AS (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC)
                       AS price_rank
              FROM orders)
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   price_rank::BIGINT AS price_rank
            FROM r WHERE price_rank <= 3
            ORDER BY o_orderpriority, price_rank, o_orderkey
        """,
        "events_dedup_consecutive": """
            WITH o AS (
              SELECT user_id, event_id, event_type, ts,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM events)
            SELECT user_id, event_id, event_type, ts
            FROM o WHERE prev IS NULL OR event_type <> prev
            ORDER BY user_id, ts, event_id
        """,
        "nation_balance_band_join": """
            SELECT n_name, count(*)::BIGINT AS n_pairs
            FROM customer
            JOIN supplier ON c_nationkey = s_nationkey
              AND abs(CAST(round(c_acctbal * 100) AS BIGINT)
                      - CAST(round(s_acctbal * 100) AS BIGINT)) <= 1000
            JOIN nation ON n_nationkey = c_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "nation_revenue_share": """
            WITH n AS (
              SELECT n_name,
                     SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name)
            SELECT n_name,
                   c / 100.0 AS revenue,
                   round(c / SUM(c) OVER (), 6) AS share
            FROM n ORDER BY n_name
        """,
        "region_priority_grid": """
            SELECT r_name, o_orderpriority,
                   COALESCE(cnt, 0)::BIGINT AS n_orders
            FROM region
            CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders
                        UNION
                        SELECT unnest(['1-URGENT', '2-HIGH', '3-MEDIUM',
                                       '4-NOT SPECIFIED', '5-LOW'])) p
            LEFT JOIN (
              SELECT r_name AS rn, o_orderpriority AS op,
                     count(*) AS cnt
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY 1, 2) f
              ON f.rn = r_name AND f.op = o_orderpriority
            ORDER BY r_name, o_orderpriority
        """,
        "events_trimmed_mean": """
            WITH q AS (SELECT event_type,
                              quantile_disc(value, 0.05) AS lo,
                              quantile_disc(value, 0.95) AS hi
                       FROM events GROUP BY event_type)
            SELECT e.event_type, lo, hi,
                   round(SUM(CAST(round(value * 100) AS BIGINT))
                         / 100.0 / count(*), 6) AS trimmed_mean,
                   count(*)::BIGINT AS n_kept
            FROM events e JOIN q USING (event_type)
            WHERE value >= lo AND value <= hi
            GROUP BY e.event_type, lo, hi ORDER BY e.event_type
        """,
        "purchase_id_gaps": """
            WITH o AS (SELECT event_id AS k FROM events
                       WHERE event_type = 'purchase'),
            d AS (SELECT k, lag(k) OVER (ORDER BY k) AS pk FROM o)
            SELECT (pk + 1)::BIGINT AS gap_start,
                   (k - 1)::BIGINT AS gap_end
            FROM d WHERE pk IS NOT NULL AND k - pk > 1 ORDER BY 1
        """,
        "nation_acctbal_geomean": """
            SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
                   round(exp(avg(ln(s_acctbal))), 6) AS geomean_bal,
                   count(*)::BIGINT AS n_pos
            FROM supplier WHERE s_acctbal > 0
            GROUP BY 1 ORDER BY 1
        """,
        "orders_month_seasonality": """
            SELECT EXTRACT(month FROM o_orderdate)::BIGINT AS month,
                   count(*)::BIGINT AS n_orders,
                   round(sum(o_totalprice) / count(*), 2) AS avg_price
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "embedding_stats": """
            SELECT vec_id, label,
                   round(list_max(embedding::DOUBLE[]), 6) AS vmax,
                   round(list_sum(list_transform(embedding::DOUBLE[],
                                                 x -> abs(x))), 6) AS l1
            FROM embeddings ORDER BY vec_id
        """,
        "supplier_ship_except_all": """
            WITH d AS (
                SELECT l_suppkey FROM lineitem
                WHERE EXTRACT(year FROM l_shipdate) = 1996
                EXCEPT ALL
                SELECT l_suppkey FROM lineitem
                WHERE EXTRACT(year FROM l_shipdate) = 1997)
            SELECT l_suppkey, count(*)::BIGINT AS n
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "returnflag_harmonic_qty": """
            SELECT l_returnflag,
                   round(count(*) / sum(1.0 / l_quantity), 6) AS hmean_qty,
                   count(*)::BIGINT AS n
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "part_pagerank": """
            WITH e AS (SELECT p_partkey AS src, p_partkey // 7 AS dst
                       FROM part WHERE p_partkey > 0
                       UNION ALL
                       SELECT p_partkey, p_partkey // 3
                       FROM part WHERE p_partkey > 0),
                 nodes AS (SELECT DISTINCT node FROM
                           (SELECT src AS node FROM e
                            UNION ALL SELECT dst FROM e)),
                 nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
                 deg AS (SELECT src, count(*)::DOUBLE AS d
                         FROM e GROUP BY 1),
                 r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r
                        FROM nodes),
                 r1 AS (SELECT nodes.node,
                               (1 - 0.85) / (SELECT n FROM nn)
                               + 0.85 * COALESCE(sum(r0.r / deg.d), 0) AS r
                        FROM nodes
                        LEFT JOIN e ON e.dst = nodes.node
                        LEFT JOIN deg ON deg.src = e.src
                        LEFT JOIN r0 ON r0.node = e.src
                        GROUP BY nodes.node),
                 r2 AS (SELECT nodes.node,
                               (1 - 0.85) / (SELECT n FROM nn)
                               + 0.85 * COALESCE(sum(r1.r / deg.d), 0) AS r
                        FROM nodes
                        LEFT JOIN e ON e.dst = nodes.node
                        LEFT JOIN deg ON deg.src = e.src
                        LEFT JOIN r1 ON r1.node = e.src
                        GROUP BY nodes.node),
                 r3 AS (SELECT nodes.node,
                               (1 - 0.85) / (SELECT n FROM nn)
                               + 0.85 * COALESCE(sum(r2.r / deg.d), 0) AS r
                        FROM nodes
                        LEFT JOIN e ON e.dst = nodes.node
                        LEFT JOIN deg ON deg.src = e.src
                        LEFT JOIN r2 ON r2.node = e.src
                        GROUP BY nodes.node)
            SELECT node, round(r, 8) AS rank FROM r3 ORDER BY node
        """,
        "events_purchaser_events": """
            SELECT event_id, user_id, event_type FROM events
            WHERE user_id IN (SELECT user_id FROM events
                              WHERE event_type = 'purchase'
                                AND value > 200)
            ORDER BY event_id
        """,
        "events_value_zscore": """
            WITH s AS (SELECT event_type, avg(value) AS mu,
                              stddev_samp(value) AS sd
                       FROM events GROUP BY 1)
            SELECT event_id, e.event_type,
                   round((value - mu) / sd, 4) + 0 AS z
            FROM events e JOIN s USING (event_type)
            ORDER BY event_id
        """,
        "docs_hash_sample": """
            SELECT doc_id, lang,
                   CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS h
            FROM documents ORDER BY h, doc_id LIMIT 100
        """,
        "nation_balance_full_join": """
            WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                              round(sum(c_acctbal), 2) AS cust_bal,
                              count(*)::BIGINT AS n_cust
                       FROM customer WHERE c_acctbal > 4500 GROUP BY 1),
                 s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
                              round(sum(s_acctbal), 2) AS supp_bal,
                              count(*)::BIGINT AS n_supp
                       FROM supplier WHERE s_acctbal > 4500 GROUP BY 1)
            SELECT nationkey, cust_bal, supp_bal,
                   COALESCE(n_cust, 0) AS n_cust,
                   COALESCE(n_supp, 0) AS n_supp
            FROM c FULL OUTER JOIN s USING (nationkey)
            ORDER BY nationkey
        """,
        "doc_token_mad": """
            WITH c AS (SELECT lang,
                              length(regexp_extract_all(text, '\\S+'))::BIGINT
                                  AS n
                       FROM documents)
            SELECT lang, mad(n) AS mad, median(n) AS med,
                   count(*)::BIGINT AS n_docs
            FROM c GROUP BY lang ORDER BY lang
        """,
        "part_name_similarity": """
            SELECT a.p_brand AS p_brand, a.p_partkey AS pk1,
                   b.p_partkey AS pk2, a.p_name AS name1, b.p_name AS name2,
                   levenshtein(a.p_name, b.p_name)::BIGINT AS lev,
                   jaccard(a.p_name, b.p_name) AS char_jac
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 4
            ORDER BY 1, 2, 3
        """,
        "token_zipf": """
            WITH c AS (SELECT token, count(*)::BIGINT AS count
                       FROM (SELECT unnest(regexp_extract_all(
                                 lower(text), '[a-z0-9_]+')) AS token
                             FROM documents)
                       GROUP BY token)
            SELECT CAST(row_number() OVER (ORDER BY count DESC, token)
                        AS BIGINT) AS rank,
                   token, count
            FROM c ORDER BY count DESC, token LIMIT 100
        """,
        "user_event_entropy": """
            WITH c AS (SELECT user_id, event_type, count(*)::DOUBLE AS n
                       FROM events GROUP BY 1, 2),
                 t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY 1)
            SELECT c.user_id,
                   round(sum(-(n / tot) * log2(n / tot)), 6) + 0 AS entropy,
                   CAST(t.tot AS BIGINT) AS n_events
            FROM c JOIN t USING (user_id)
            GROUP BY c.user_id, t.tot ORDER BY c.user_id
        """,
        "doc_token_quartiles_cont": """
            WITH c AS (SELECT lang,
                              length(regexp_extract_all(text, '\\S+'))::BIGINT AS n
                       FROM documents)
            SELECT lang, 0.25::DOUBLE AS q,
                   quantile_cont(n, 0.25)::DOUBLE AS n_tokens
            FROM c GROUP BY lang
            UNION ALL
            SELECT lang, 0.5::DOUBLE, quantile_cont(n, 0.5)::DOUBLE
            FROM c GROUP BY lang
            UNION ALL
            SELECT lang, 0.75::DOUBLE, quantile_cont(n, 0.75)::DOUBLE
            FROM c GROUP BY lang
            ORDER BY lang, q
        """,
        "orders_weekly_gapfill": """
            WITH w AS (SELECT date_trunc('week', o_orderdate) AS week,
                              count(*)::BIGINT AS n
                       FROM orders GROUP BY 1),
                 spine AS (SELECT unnest(generate_series(
                              (SELECT min(week) FROM w),
                              (SELECT max(week) FROM w),
                              INTERVAL 7 DAY)) AS week)
            SELECT spine.week AS week, COALESCE(w.n, 0)::BIGINT AS n_orders
            FROM spine LEFT JOIN w USING (week) ORDER BY week
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars,
                   length(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::BIGINT AS n_alpha,
                   length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digit,
                   length(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                                      x -> list_contains({_EN}, x)))::BIGINT
                       AS stopword_count
            FROM documents ORDER BY doc_id
        """,
        "doc_repetition_stats": """
            SELECT doc_id, n::BIGINT AS n_tokens,
                   round(1.0 * d1 / n, 6) AS ttr,
                   round(1.0 - 1.0 * d3 / (n - 2), 6) + 0 AS dup3
            FROM (SELECT doc_id, len(toks) AS n, list_unique(toks) AS d1,
                         list_unique(list_transform(
                             generate_series(1, len(toks) - 2),
                             i -> toks[i] || ' ' || toks[i+1] || ' '
                                  || toks[i+2])) AS d3
                  FROM (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM documents))
            WHERE n >= 3
            ORDER BY doc_id
        """,
        "nation_metrics_unpivot": """
            WITH agg AS (SELECT c_nationkey::BIGINT AS nationkey,
                                count(*)::BIGINT AS n_cust,
                                CAST(sum(CAST(round(c_acctbal*100) AS BIGINT))
                                     AS BIGINT) AS bal_cents
                         FROM customer GROUP BY 1)
            SELECT nationkey, metric, value
            FROM agg UNPIVOT (value FOR metric IN (bal_cents, n_cust))
            ORDER BY nationkey, metric
        """,
        "lang_id": f"""
            SELECT doc_id,
                   CASE WHEN en = 0 AND de = 0 THEN 'other'
                        WHEN en >= de THEN 'en' ELSE 'de' END AS lang_pred
            FROM (
                SELECT doc_id,
                       length(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                                          x -> list_contains({_EN}, x))) AS en,
                       length(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                                          x -> list_contains({_DE}, x))) AS de
                FROM documents)
            ORDER BY doc_id
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents ORDER BY doc_id
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id
            FROM documents
            GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
            ORDER BY doc_id
        """,
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 10),
            sims AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qe, e.embedding) AS sim
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id)
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rank
            FROM sims
            QUALIFY rank <= 5
            ORDER BY query_id, rank
        """,
        "url_canonicalize": """
            SELECT doc_id,
                   'example' || (doc_id % 50) || '.com/articles/' || doc_id ||
                   CASE WHEN doc_id % 5 = 2 THEN '?id=' || doc_id ELSE '' END
                       AS canon
            FROM documents ORDER BY doc_id
        """,
        "dedup_ngram_jaccard": """
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(toks) >= 3
                       THEN [array_to_string(toks[i:i+2], ' ')
                             for i in range(1, len(toks)-1)]
                       ELSE [array_to_string(toks, ' ')] END) AS grams
              FROM t),
            e AS (SELECT doc_id, unnest(grams) AS gram, len(grams) AS sz FROM g)
            SELECT a.doc_id AS left, b.doc_id AS right,
                   round(count(*)::DOUBLE / (a.sz + b.sz - count(*)), 6) AS jac
            FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
            HAVING jac >= 0.5
            ORDER BY 1, 2
        """,
        "neardup_embedding": """
            SELECT a.vec_id AS left, b.vec_id AS right,
                   round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4
            ORDER BY 1, 2
        """,
        "events_value_ks": """
            WITH v AS (SELECT event_type AS t,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events
                       WHERE event_type IN ('click', 'purchase')),
                 h AS (SELECT c,
                              count(*) FILTER (WHERE t = 'click')
                                ::BIGINT AS a,
                              count(*) FILTER (WHERE t = 'purchase')
                                ::BIGINT AS b
                       FROM v GROUP BY 1),
                 e AS (SELECT CAST(sum(a) OVER (ORDER BY c
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
                              CAST(sum(b) OVER (ORDER BY c
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
                       FROM h),
                 n AS (SELECT sum(a)::BIGINT AS n1, sum(b)::BIGINT AS n2
                       FROM h)
            SELECT n1 AS n_click, n2 AS n_purchase,
                   max(abs(ca*n2 - cb*n1))::BIGINT AS ks_num,
                   round((1.0*max(abs(ca*n2 - cb*n1)))/(n1*n2), 6) + 0
                     AS ks_stat
            FROM e, n GROUP BY n1, n2
            HAVING n1 > 0 AND n2 > 0
        """,
        "events_mannwhitney_u": """
            WITH v AS (SELECT event_type AS t,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events
                       WHERE event_type IN ('click', 'purchase')),
                 h AS (SELECT c,
                              count(*) FILTER (WHERE t = 'click')
                                ::BIGINT AS a,
                              count(*) FILTER (WHERE t = 'purchase')
                                ::BIGINT AS b
                       FROM v GROUP BY 1),
                 e AS (SELECT a, b,
                              CAST(coalesce(sum(a + b) OVER (ORDER BY c
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS before
                       FROM h),
                 n AS (SELECT sum(a)::BIGINT AS n1, sum(b)::BIGINT AS n2
                       FROM h)
            SELECT n1 AS n_click, n2 AS n_purchase,
                   (sum(a*(2*before + a + b + 1))::BIGINT
                      - n1*(n1 + 1))::BIGINT AS u2,
                   (1.0*(sum(a*(2*before + a + b + 1))::BIGINT
                      - n1*(n1 + 1)))/2 AS u
            FROM e, n GROUP BY n1, n2
            HAVING n1 > 0 AND n2 > 0
        """,
        "user_modal_hour": """
            WITH h AS (SELECT user_id,
                              CAST(hour(ts) AS BIGINT) AS hr,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
                 r AS (SELECT user_id, hr, n,
                              row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, hr) AS rn
                       FROM h)
            SELECT user_id::BIGINT AS user_id, hr AS modal_hour, n
            FROM r WHERE rn = 1 ORDER BY user_id
        """,
        "user_value_cusum": """
            WITH o AS (SELECT user_id, event_id, ts,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 s AS (SELECT user_id, count(*)::BIGINT AS n,
                              sum(c)::BIGINT AS sc
                       FROM o GROUP BY 1),
                 w AS (SELECT o.user_id, n, ts, event_id,
                              CAST(sum(n*c - sc) OVER (
                                PARTITION BY o.user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                       FROM o JOIN s USING (user_id)),
                 m AS (SELECT user_id, n, cum,
                              least(0, CAST(min(cum) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT))
                                AS runmin
                       FROM w)
            SELECT user_id::BIGINT AS user_id, n AS n_events,
                   count(*) FILTER (WHERE cum - runmin > n*25000)
                     ::BIGINT AS n_alarms
            FROM m GROUP BY user_id, n ORDER BY user_id
        """,
        "docs_weighted_sample": """
            WITH t AS (SELECT doc_id,
                              length(regexp_extract_all(text, '\\S+'))
                                ::BIGINT AS w
                       FROM documents),
                 c AS (SELECT doc_id, w,
                              CAST(sum(w) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                       FROM t),
                 g AS (SELECT sum(w)::BIGINT AS tw FROM t),
                 s AS (SELECT doc_id, w,
                              greatest(0, least(50,
                                  (100*cum + tw - 1) // (2*tw)))
                              - greatest(0, least(50,
                                  (100*(cum - w) + tw - 1) // (2*tw)))
                                AS times
                       FROM c, g WHERE tw > 0)
            SELECT doc_id::BIGINT AS doc_id, w AS weight,
                   times::BIGINT AS times_selected
            FROM s WHERE times >= 1 ORDER BY doc_id
        """,
        "events_type_anova": """
            WITH c AS (SELECT event_type,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 g AS (SELECT event_type, count(*)::BIGINT AS n,
                              sum(c)::BIGINT AS s, sum(c*c)::BIGINT AS q
                       FROM c GROUP BY 1),
                 t AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
                              sum(s)::BIGINT AS gg
                       FROM g),
                 p AS (SELECT k, nn,
                              sum((1.0*s)*s/n) - ((1.0*gg)*gg)/nn AS ssb,
                              sum(1.0*q - ((1.0*s)*s)/n) AS ssw
                       FROM g, t GROUP BY k, nn, gg)
            SELECT k AS k_groups, nn AS n_total,
                   round((ssb/(k-1))/(ssw/(nn-k)), 6) + 0 AS f_stat
            FROM p WHERE k >= 2 AND nn > k AND ssw > 0
        """,
        "orders_ship_busdays": """
            WITH j AS (SELECT l_returnflag,
                              CAST(CAST(l_shipdate AS DATE)
                                   - DATE '1970-01-01' AS BIGINT) AS sd,
                              CAST(CAST(o_orderdate AS DATE)
                                   - DATE '1970-01-01' AS BIGINT) AS od
                       FROM lineitem
                       JOIN orders ON o_orderkey = l_orderkey),
                 b AS (SELECT l_returnflag,
                              (5*((sd+3)//7) + least((sd+3)%7, 5))
                              - (5*((od+3)//7) + least((od+3)%7, 5))
                                AS busdays
                       FROM j)
            SELECT l_returnflag, count(*)::BIGINT AS n_lines,
                   sum(busdays)::BIGINT AS total_busdays,
                   round((1.0*sum(busdays))/count(*), 6) + 0
                     AS avg_busdays
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "lang_token_js_divergence": """
            WITH tok AS (SELECT lang,
                                unnest(regexp_extract_all(lower(text),
                                                          '[a-z0-9_]+'))
                                  AS token
                         FROM documents WHERE lang IN ('en', 'de')),
                 h AS (SELECT token,
                              count(*) FILTER (WHERE lang = 'en')
                                ::BIGINT AS a,
                              count(*) FILTER (WHERE lang = 'de')
                                ::BIGINT AS b
                       FROM tok GROUP BY 1),
                 n AS (SELECT sum(a)::BIGINT AS ta, sum(b)::BIGINT AS tb,
                              count(*)::BIGINT AS nt
                       FROM h),
                 terms AS (SELECT (1.0*a)/ta AS pa, (1.0*b)/tb AS pb,
                                  a, b, ta, tb, nt
                           FROM h, n WHERE ta > 0 AND tb > 0)
            SELECT ta AS n_en, tb AS n_de, nt AS n_tokens,
                   round(sum(
                       CASE WHEN a > 0
                            THEN 0.5*pa*log2(2.0*pa/(pa + pb))
                            ELSE 0 END
                     + CASE WHEN b > 0
                            THEN 0.5*pb*log2(2.0*pb/(pa + pb))
                            ELSE 0 END), 6) + 0 AS jsd
            FROM terms GROUP BY ta, tb, nt
        """,
        "user_runs_test": """
            WITH o AS (SELECT user_id, event_id, ts,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 s AS (SELECT user_id, count(*)::BIGINT AS n,
                              sum(c)::BIGINT AS sc
                       FROM o GROUP BY 1),
                 w AS (SELECT o.user_id, (n*c > sc) AS ab,
                              lag(n*c > sc) OVER (
                                PARTITION BY o.user_id
                                ORDER BY ts, event_id) AS prev
                       FROM o JOIN s USING (user_id))
            SELECT user_id::BIGINT AS user_id,
                   count(*) FILTER (WHERE ab)::BIGINT AS n_above,
                   count(*) FILTER (WHERE NOT ab)::BIGINT AS n_below,
                   (1 + count(*) FILTER (WHERE prev IS NOT NULL
                                           AND ab <> prev))::BIGINT
                     AS runs
            FROM w GROUP BY user_id ORDER BY user_id
        """,
        "nation_supply_hhi": """
            WITH r AS (SELECT l_suppkey,
                              sum(""" + _REV_C_SQL + """)::HUGEINT AS rev
                       FROM lineitem GROUP BY 1),
                 j AS (SELECT s_nationkey, rev
                       FROM r JOIN supplier ON s_suppkey = l_suppkey),
                 a AS (SELECT s_nationkey,
                              sum(rev*rev) AS ssq, sum(rev) AS tot,
                              count(*)::BIGINT AS n_suppliers
                       FROM j GROUP BY 1)
            SELECT n_name, n_suppliers,
                   round((1.0*ssq)/((1.0*tot)*(1.0*tot)), 6) + 0 AS hhi
            FROM a JOIN nation ON n_nationkey = s_nationkey
            WHERE tot > 0
            ORDER BY n_name
        """,
        "user_value_interp_hourly": """
            WITH e0 AS (SELECT user_id, event_id,
                               epoch_us(ts)::BIGINT AS us,
                               CAST(round(value*100) AS BIGINT) AS c
                        FROM events),
                 e AS (SELECT user_id, us, c
                       FROM (SELECT *, row_number() OVER (
                                 PARTITION BY user_id, us
                                 ORDER BY event_id) AS rn
                             FROM e0)
                       WHERE rn = 1),
                 seq AS (SELECT user_id, us AS t1, c AS c1,
                                lead(us, 1, us + 1) OVER w AS t2,
                                lead(c, 1, c) OVER w AS c2
                         FROM e
                         WINDOW w AS (PARTITION BY user_id ORDER BY us)),
                 b AS (SELECT user_id,
                              ((min(us) + 3599999999)//3600000000)
                                *3600000000 AS lo,
                              (max(us)//3600000000)*3600000000 AS hi
                       FROM e GROUP BY 1),
                 g AS (SELECT user_id,
                              unnest(generate_series(lo, hi,
                                                     3600000000)) AS t
                       FROM b WHERE lo <= hi),
                 j AS (SELECT g.user_id, t,
                              c1 + (1.0*(c2 - c1))*(1.0*(t - t1))
                                   /(1.0*(t2 - t1)) AS v
                       FROM g JOIN seq ON g.user_id = seq.user_id
                                      AND t >= t1 AND t < t2)
            SELECT user_id::BIGINT AS user_id, t AS t_us,
                   round(v/100.0, 4) + 0 AS value_interp
            FROM j ORDER BY user_id, t_us
        """,
        "lineitem_qty_chisq_uniform": """
            WITH h AS (SELECT CAST(round(l_quantity) AS BIGINT) AS bin,
                              count(*)::BIGINT AS obs
                       FROM lineitem GROUP BY 1),
                 f AS (SELECT gs.bin, coalesce(obs, 0)::BIGINT AS obs
                       FROM (SELECT unnest(generate_series(1, 50))
                                ::BIGINT AS bin) gs
                       LEFT JOIN h USING (bin)),
                 t AS (SELECT sum(obs)::BIGINT AS n FROM f)
            SELECT n, CAST(49 AS BIGINT) AS df,
                   sum((50*obs - n)*(50*obs - n))::BIGINT AS chi2_num,
                   round((1.0*sum((50*obs - n)*(50*obs - n)))
                         /(50.0*n), 6) + 0 AS chi2
            FROM f, t GROUP BY n HAVING n > 0
        """,
        "orders_iso_week": """
            SELECT isoyear(o_orderdate)::BIGINT AS iso_year,
                   weekofyear(o_orderdate)::BIGINT AS iso_week,
                   count(*)::BIGINT AS n_orders,
                   sum(CAST(round(o_totalprice*100) AS BIGINT))
                     ::BIGINT/100.0 AS revenue
            FROM orders GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "customer_mahalanobis": """
            WITH sp AS (SELECT o_custkey,
                               sum(CAST(round(o_totalprice) AS BIGINT))
                                 ::BIGINT AS y
                        FROM orders GROUP BY 1),
                 d AS (SELECT c_custkey,
                              CAST(round(c_acctbal) AS BIGINT) AS x,
                              coalesce(y, 0)::BIGINT AS y
                       FROM customer
                       LEFT JOIN sp ON o_custkey = c_custkey),
                 m AS (SELECT count(*)::BIGINT AS n,
                              sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                              sum(x*x)::BIGINT AS sxx,
                              sum(y*y)::BIGINT AS syy,
                              sum(x*y)::BIGINT AS sxy
                       FROM d),
                 v AS (SELECT n, sx, sy,
                              (sxx - (1.0*sx)*sx/n)/(n-1) AS vxx,
                              (syy - (1.0*sy)*sy/n)/(n-1) AS vyy,
                              (sxy - (1.0*sx)*sy/n)/(n-1) AS vxy
                       FROM m WHERE n >= 3),
                 r AS (SELECT c_custkey, x, y,
                              round((vyy*(x - (1.0*sx)/n)*(x - (1.0*sx)/n)
                                     - 2.0*vxy*(x - (1.0*sx)/n)
                                          *(y - (1.0*sy)/n)
                                     + vxx*(y - (1.0*sy)/n)
                                          *(y - (1.0*sy)/n))
                                    /(vxx*vyy - vxy*vxy), 6) + 0 AS d2
                       FROM d, v WHERE vxx*vyy - vxy*vxy > 0)
            SELECT c_custkey::BIGINT AS c_custkey, x AS bal, y AS spend,
                   d2
            FROM r ORDER BY d2 DESC, c_custkey LIMIT 20
        """,
        "doc_sentence_stats": """
            WITH s AS (SELECT doc_id,
                              list_filter(
                                  regexp_split_to_array(text,
                                                        '[.!?]+\\s+'),
                                  x -> x <> '') AS segs
                       FROM documents)
            SELECT doc_id::BIGINT AS doc_id,
                   len(segs)::BIGINT AS n_sentences,
                   CASE WHEN len(segs) > 0
                        THEN round((1.0*list_sum(list_transform(segs,
                                 x -> length(x))))/len(segs), 4) + 0
                        END AS mean_sentence_chars
            FROM s ORDER BY doc_id
        """,
        "events_value_rolling_std5": """
            WITH o AS (SELECT event_id, user_id, ts,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 w AS (SELECT event_id,
                              count(*) OVER win AS n,
                              sum(c) OVER win AS s,
                              sum(c*c) OVER win AS q
                       FROM o
                       WINDOW win AS (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN 4 PRECEDING
                                      AND CURRENT ROW))
            SELECT event_id::BIGINT AS event_id, n::BIGINT AS n_win,
                   CASE WHEN n >= 2
                        THEN round(sqrt(((1.0*n)*q - (1.0*s)*s)
                                        /((1.0*n)*(n - 1)))/100.0, 6) + 0
                        END AS std5
            FROM w ORDER BY event_id
        """,
        "lang_confusion_matrix": f"""
            WITH p AS (SELECT lang,
                              CASE WHEN en = 0 AND de = 0 THEN 'other'
                                   WHEN en >= de THEN 'en'
                                   ELSE 'de' END AS lang_pred
                       FROM (SELECT lang,
                                    length(list_filter(
                                        regexp_extract_all(lower(text),
                                                           '[a-z0-9_]+'),
                                        x -> list_contains({_EN}, x)))
                                      AS en,
                                    length(list_filter(
                                        regexp_extract_all(lower(text),
                                                           '[a-z0-9_]+'),
                                        x -> list_contains({_DE}, x)))
                                      AS de
                             FROM documents)),
                 c AS (SELECT lang, lang_pred, count(*)::BIGINT AS n
                       FROM p GROUP BY 1, 2)
            SELECT lang, lang_pred, n,
                   round((1.0*n)/(sum(n) OVER (PARTITION BY lang)), 6)
                     + 0 AS share
            FROM c ORDER BY lang, lang_pred
        """,
        "vocab_coverage_90": """
            WITH h AS (SELECT token, count(*)::BIGINT AS c
                       FROM (SELECT unnest(regexp_extract_all(
                                 lower(text), '[a-z0-9_]+')) AS token
                             FROM documents)
                       GROUP BY 1),
                 t AS (SELECT sum(c)::BIGINT AS tot FROM h),
                 w AS (SELECT row_number() OVER
                                  (ORDER BY c DESC, token) AS k,
                              CAST(sum(c) OVER (ORDER BY c DESC, token
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                                AS cum
                       FROM h)
            SELECT min(k)::BIGINT AS k,
                   min_by(cum, k)::BIGINT AS covered, tot AS total
            FROM w, t WHERE 10*cum >= 9*tot GROUP BY tot
        """,
        "nation_kendall_tau": """
            WITH sp AS (SELECT o_custkey,
                               sum(CAST(round(o_totalprice*100)
                                        AS BIGINT))::BIGINT AS y
                        FROM orders GROUP BY 1),
                 d AS (SELECT c_custkey AS ck, c_nationkey AS nk,
                              CAST(round(c_acctbal*100) AS BIGINT) AS x,
                              coalesce(y, 0)::BIGINT AS y
                       FROM customer
                       LEFT JOIN sp ON o_custkey = c_custkey),
                 p AS (SELECT a.nk,
                              count(*)::BIGINT AS n0,
                              count(*) FILTER (WHERE (a.x - b.x)
                                  *(a.y - b.y) > 0)::BIGINT AS c,
                              count(*) FILTER (WHERE (a.x - b.x)
                                  *(a.y - b.y) < 0)::BIGINT AS dd,
                              count(*) FILTER (WHERE a.x = b.x)
                                ::BIGINT AS n1,
                              count(*) FILTER (WHERE a.y = b.y)
                                ::BIGINT AS n2
                       FROM d a JOIN d b ON a.nk = b.nk AND a.ck < b.ck
                       GROUP BY 1)
            SELECT n_name, n0 AS n_pairs, (c - dd)::BIGINT AS c_minus_d,
                   round((1.0*(c - dd))
                         /sqrt((1.0*(n0 - n1))*(n0 - n2)), 6) + 0
                     AS tau_b
            FROM p JOIN nation ON n_nationkey = nk
            WHERE (1.0*(n0 - n1))*(n0 - n2) > 0
            ORDER BY n_name
        """,
        "daily_user_overlap": """
            WITH du AS (SELECT DISTINCT
                               (epoch_us(ts)//86400000000)::BIGINT
                                 AS day,
                               user_id
                        FROM events),
                 cur AS (SELECT day, count(*)::BIGINT AS n_cur
                         FROM du GROUP BY 1),
                 ov AS (SELECT a.day, count(*)::BIGINT AS n_both
                        FROM du a JOIN du b ON b.day = a.day - 1
                                           AND b.user_id = a.user_id
                        GROUP BY 1)
            SELECT c.day, coalesce(p.n_cur, 0)::BIGINT AS n_prev,
                   c.n_cur, coalesce(o.n_both, 0)::BIGINT AS n_both,
                   round((1.0*coalesce(o.n_both, 0))
                         /(coalesce(p.n_cur, 0) + c.n_cur
                           - coalesce(o.n_both, 0)), 6) + 0 AS jaccard
            FROM cur c
            LEFT JOIN cur p ON p.day = c.day - 1
            LEFT JOIN ov o ON o.day = c.day
            ORDER BY c.day
        """,
        "gap_kaplan_meier": """
            WITH e AS (SELECT user_id, event_id,
                              epoch_us(ts)::BIGINT AS us
                       FROM events),
                 mx AS (SELECT max(us)::BIGINT AS m FROM e),
                 g AS (SELECT user_id, us,
                              lead(us) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS nxt
                       FROM e),
                 o AS (SELECT (nxt - us)//1000000 AS t_s, 1 AS ev
                       FROM g WHERE nxt IS NOT NULL
                       UNION ALL
                       SELECT (m - us)//1000000 AS t_s, 0 AS ev
                       FROM g, mx WHERE nxt IS NULL),
                 h AS (SELECT t_s::BIGINT AS t_s, sum(ev)::BIGINT AS d,
                              count(*)::BIGINT AS n_all
                       FROM o GROUP BY 1),
                 w AS (SELECT t_s, d,
                              CAST(sum(n_all) OVER (ORDER BY t_s DESC
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                                AS at_risk
                       FROM h),
                 s AS (SELECT t_s, d, at_risk,
                              product(1.0 - (1.0*d)/at_risk)
                                OVER (ORDER BY t_s
                                      ROWS UNBOUNDED PRECEDING) AS surv
                       FROM w WHERE d > 0)
            SELECT t_s, d, at_risk, round(surv, 6) + 0 AS survival
            FROM s ORDER BY t_s
        """,
        "doc_char_entropy": """
            WITH ch AS (SELECT doc_id,
                               unnest(string_split(text, '')) AS ch
                        FROM documents),
                 cnt AS (SELECT doc_id, ch, count(*)::BIGINT AS c
                         FROM ch GROUP BY 1, 2),
                 n AS (SELECT doc_id, sum(c)::BIGINT AS n
                       FROM cnt GROUP BY 1)
            SELECT doc_id::BIGINT AS doc_id, n AS n_chars,
                   round(-sum(((1.0*c)/n)*log2((1.0*c)/n)), 6) + 0
                     AS entropy
            FROM cnt JOIN n USING (doc_id)
            GROUP BY doc_id, n ORDER BY doc_id
        """,
        "user_phase_value_means": """
            WITH o AS (SELECT user_id, event_id, ts,
                              CAST(round(value*100) AS BIGINT) AS c,
                              ntile(3) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS phase
                       FROM events)
            SELECT user_id::BIGINT AS user_id, phase::BIGINT AS phase,
                   count(*)::BIGINT AS n,
                   round((1.0*sum(c))/count(*)/100.0, 6) + 0
                     AS avg_value
            FROM o GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "signup_to_purchase_latency": """
            WITH s AS (SELECT user_id, min(epoch_us(ts))::BIGINT AS s0
                       FROM events WHERE event_type = 'signup'
                       GROUP BY 1),
                 p AS (SELECT e.user_id,
                              min(epoch_us(ts))::BIGINT AS p0, s0
                       FROM events e JOIN s USING (user_id)
                       WHERE event_type = 'purchase'
                         AND epoch_us(ts) >= s0
                       GROUP BY e.user_id, s0),
                 l AS (SELECT (p0 - s0)//1000000 AS lat_s FROM p)
            SELECT count(*)::BIGINT AS n_users,
                   quantile_disc(lat_s, 0.5)::BIGINT AS p50_s,
                   quantile_disc(lat_s, 0.9)::BIGINT AS p90_s
            FROM l HAVING count(*) > 0
        """,
        "supplier_neighborhood_jaccard": """
            WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                       FROM lineitem),
                 deg AS (SELECT s, count(*)::BIGINT AS d
                         FROM e GROUP BY 1),
                 pr AS (SELECT a.s AS s1, b.s AS s2,
                               count(*)::BIGINT AS common
                        FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
                        GROUP BY 1, 2),
                 j AS (SELECT s1, s2, common,
                              round((1.0*common)
                                    /(d1.d + d2.d - common), 6) + 0
                                AS jaccard
                       FROM pr
                       JOIN deg d1 ON d1.s = s1
                       JOIN deg d2 ON d2.s = s2)
            SELECT s1::BIGINT AS s1, s2::BIGINT AS s2,
                   common AS common_parts, jaccard
            FROM j ORDER BY jaccard DESC, s1, s2 LIMIT 50
        """,
        "nation_balance_qq": """
            WITH c AS (SELECT c_nationkey AS nk,
                              CAST(round(c_acctbal*100) AS BIGINT) AS c
                       FROM customer WHERE c_nationkey IN (0, 1)),
                 s AS (""" + "\n                      UNION ALL ".join(
            f"""SELECT {q/10}::DOUBLE AS q,
                              (SELECT quantile_disc(c, {q/10}) FROM c
                               WHERE nk = 0) AS c0,
                              (SELECT quantile_disc(c, {q/10}) FROM c
                               WHERE nk = 1) AS c1"""
            for q in range(1, 10)) + """)
            SELECT q, c0::BIGINT/100.0 AS bal_n0,
                   c1::BIGINT/100.0 AS bal_n1
            FROM s WHERE c0 IS NOT NULL AND c1 IS NOT NULL
            ORDER BY q
        """,
        "event_type_cosine": """
            WITH c AS (SELECT user_id, event_type,
                              count(*)::BIGINT AS c
                       FROM events GROUP BY 1, 2),
                 n AS (SELECT event_type,
                              sum(c*c)::BIGINT AS nrm
                       FROM c GROUP BY 1),
                 d AS (SELECT a.event_type AS t1, b.event_type AS t2,
                              sum(a.c*b.c)::BIGINT AS dot
                       FROM c a JOIN c b ON a.user_id = b.user_id
                                        AND a.event_type < b.event_type
                       GROUP BY 1, 2)
            SELECT t1, t2, dot,
                   round((1.0*dot)/(sqrt(1.0*na.nrm)*sqrt(1.0*nb.nrm)),
                         6) + 0 AS cosine
            FROM d
            JOIN n na ON na.event_type = t1
            JOIN n nb ON nb.event_type = t2
            WHERE na.nrm > 0 AND nb.nrm > 0
            ORDER BY t1, t2
        """,
        "part_name_token_pairs": """
            WITH tok AS (SELECT DISTINCT p_partkey AS pk,
                                unnest(string_split(p_name, ' ')) AS t
                         FROM part),
                 tk AS (SELECT pk, t FROM tok WHERE t <> ''),
                 pr AS (SELECT a.pk AS p1, b.pk AS p2,
                               count(*)::BIGINT AS common_tokens
                        FROM tk a JOIN tk b ON a.t = b.t AND a.pk < b.pk
                        GROUP BY 1, 2
                        HAVING count(*) >= 2)
            SELECT p1::BIGINT AS p1, p2::BIGINT AS p2, common_tokens
            FROM pr ORDER BY common_tokens DESC, p1, p2 LIMIT 100
        """,
        "docs_incremental_new": """
            WITH f AS (SELECT doc_id,
                              md5(trim(regexp_replace(lower(text),
                                                      '\\s+', ' ', 'g')))
                                AS fingerprint
                       FROM documents),
                 mx AS (SELECT max(doc_id)//2 + 1 AS split
                        FROM documents)
            SELECT doc_id::BIGINT AS doc_id, fingerprint
            FROM f, mx
            WHERE doc_id >= split
              AND fingerprint NOT IN (SELECT fingerprint
                                      FROM f, mx WHERE doc_id < split)
            ORDER BY doc_id
        """,
        "daily_revenue_wow": """
            WITH a AS (SELECT CAST(CAST(o_orderdate AS DATE)
                                   - DATE '1970-01-01' AS BIGINT) AS day,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT))::BIGINT AS c
                       FROM orders GROUP BY 1)
            SELECT a.day, a.c/100.0 AS revenue,
                   p.c/100.0 AS revenue_prev_week,
                   CASE WHEN p.c > 0
                        THEN round(100.0*(a.c - p.c)/p.c, 6) + 0
                        END AS wow_pct
            FROM a LEFT JOIN a p ON p.day = a.day - 7
            ORDER BY a.day
        """,
        "nation_segment_sets": """
            SELECT n_name, c_mktsegment,
                   count(*)::BIGINT AS n_customers,
                   sum(CAST(round(c_acctbal*100) AS BIGINT))
                     ::BIGINT/100.0 AS total_bal
            FROM customer JOIN nation ON n_nationkey = c_nationkey
            GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
            ORDER BY n_name NULLS LAST, c_mktsegment NULLS LAST
        """,
        "events_hourly_control_chart": """
            WITH c AS (SELECT CAST(hour(ts) AS BIGINT) AS hour,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 g AS (SELECT hour, count(*)::BIGINT AS n,
                              sum(c)::BIGINT AS s, sum(c*c)::BIGINT AS q
                       FROM c GROUP BY 1),
                 t AS (SELECT sum(n)::BIGINT AS nn, sum(s)::BIGINT AS ss,
                              sum(q)::BIGINT AS qq
                       FROM g)
            SELECT hour, n,
                   round((1.0*s)/n/100.0, 6) + 0 AS mean_value,
                   abs((1.0*s)/n - (1.0*ss)/nn)
                     > 3.0*sqrt((qq - (1.0*ss)*ss/nn)/(nn - 1))
                       /sqrt(1.0*n) AS out_of_control
            FROM g, t WHERE nn >= 2 ORDER BY hour
        """,
        "embedding_quantize_check": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
                 s AS (SELECT vec_id, v,
                              list_aggregate(
                                  list_transform(v, x -> abs(x)),
                                  'max') AS scale
                       FROM e),
                 q AS (SELECT vec_id, scale,
                              CASE WHEN scale > 0
                                   THEN list_transform(v,
                                       x -> CAST(round(127.0*x/scale)
                                                 AS BIGINT))
                                   ELSE list_transform(v,
                                       x -> CAST(0 AS BIGINT))
                                   END AS qv
                       FROM s)
            SELECT vec_id::BIGINT AS vec_id,
                   round(scale, 6) + 0 AS scale,
                   list_sum(qv)::BIGINT AS q_sum,
                   list_sum(list_transform(qv, x -> abs(x)))::BIGINT
                     AS q_l1
            FROM q ORDER BY vec_id
        """,
        "user_trailing_type_diversity": """
            SELECT event_id::BIGINT AS event_id,
                   count(DISTINCT event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                     ::BIGINT AS n_types10
            FROM events ORDER BY event_id
        """,
        "customer_year_rank_shift": """
            WITH s AS (SELECT o_custkey AS ck,
                              year(o_orderdate)::BIGINT AS y,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT))::BIGINT AS c
                       FROM orders
                       WHERE year(o_orderdate) IN (1997, 1998)
                       GROUP BY 1, 2),
                 b AS (SELECT a.ck, a.c AS c97, z.c AS c98
                       FROM s a JOIN s z ON a.ck = z.ck
                       WHERE a.y = 1997 AND z.y = 1998),
                 r AS (SELECT ck,
                              row_number() OVER (ORDER BY c97 DESC, ck)
                                ::BIGINT AS rank_1997,
                              row_number() OVER (ORDER BY c98 DESC, ck)
                                ::BIGINT AS rank_1998
                       FROM b)
            SELECT ck::BIGINT AS c_custkey, rank_1997, rank_1998,
                   (rank_1997 - rank_1998)::BIGINT AS rank_delta
            FROM r
            ORDER BY abs(rank_1997 - rank_1998) DESC, ck LIMIT 20
        """,
        "user_idle_share": """
            WITH o AS (SELECT user_id, event_id,
                              epoch_us(ts)::BIGINT AS us
                       FROM events),
                 g AS (SELECT user_id, us,
                              lead(us) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS nxt
                       FROM o),
                 a AS (SELECT user_id,
                              sum(CASE WHEN nxt IS NOT NULL
                                       THEN greatest(nxt - us
                                                     - 3600000000, 0)
                                       ELSE 0 END)::BIGINT AS idle_us,
                              (max(us) - min(us))::BIGINT AS span_us
                       FROM g GROUP BY 1)
            SELECT user_id::BIGINT AS user_id, idle_us, span_us,
                   round((1.0*idle_us)/span_us, 6) + 0 AS idle_share
            FROM a WHERE span_us > 0 ORDER BY user_id
        """,
        "customers_churned_1998": """
            SELECT o_custkey::BIGINT AS c_custkey,
                   count(*) FILTER (WHERE year(o_orderdate) = 1997)
                     ::BIGINT AS n_orders_1997,
                   sum(CASE WHEN year(o_orderdate) = 1997
                            THEN CAST(round(o_totalprice*100) AS BIGINT)
                            ELSE 0 END)::BIGINT/100.0 AS spend_1997
            FROM orders
            GROUP BY 1
            HAVING count(*) FILTER (WHERE year(o_orderdate) = 1997) > 0
               AND count(*) FILTER (WHERE year(o_orderdate) = 1998) = 0
            ORDER BY 1
        """,
        "doc_keyword_context": """
            WITH p AS (SELECT doc_id, text,
                              position('merge' IN text)::BIGINT AS pos
                       FROM documents)
            SELECT doc_id::BIGINT AS doc_id, pos,
                   substr(text, greatest(pos - 20, 1),
                          pos + 24 + 1 - greatest(pos - 20, 1))
                     AS context
            FROM p WHERE pos > 0 ORDER BY doc_id
        """,
        "event_type_target_encoding": """
            WITH g AS (SELECT event_type, count(*)::BIGINT AS n,
                              sum(CAST(round(value*100) AS BIGINT))
                                ::BIGINT AS sc
                       FROM events GROUP BY 1),
                 t AS (SELECT sum(n)::BIGINT AS nn, sum(sc)::BIGINT AS ss
                       FROM g)
            SELECT event_type, n,
                   round((1.0*sc)/n/100.0, 6) + 0 AS raw_mean,
                   round((1.0*sc + 100.0*((1.0*ss)/nn))/(n + 100)
                         /100.0, 6) + 0 AS smoothed_mean
            FROM g, t ORDER BY event_type
        """,
        "doc_trigram_novelty": """
            WITH td AS (SELECT DISTINCT doc_id,
                               unnest(list_transform(
                                   generate_series(1, len(toks) - 2),
                                   i -> toks[i] || ' ' || toks[i+1]
                                        || ' ' || toks[i+2])) AS tri
                        FROM (SELECT doc_id,
                                     string_split(text, ' ') AS toks
                              FROM documents)
                        WHERE len(toks) >= 3),
                 df AS (SELECT tri, count(*)::BIGINT AS df
                        FROM td GROUP BY 1)
            SELECT doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_tri,
                   count(*) FILTER (WHERE df = 1)::BIGINT AS novel,
                   round((1.0*count(*) FILTER (WHERE df = 1))
                         /count(*), 6) + 0 AS novel_share
            FROM td JOIN df USING (tri)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "docs_length_kruskal": """
            WITH c AS (SELECT source AS g,
                              length(regexp_extract_all(text, '\\S+'))
                                ::BIGINT AS v
                       FROM documents),
                 h AS (SELECT v, g, count(*)::BIGINT AS a
                       FROM c GROUP BY 1, 2),
                 cv AS (SELECT v, sum(a)::BIGINT AS cv
                        FROM h GROUP BY 1),
                 w AS (SELECT v, cv,
                              coalesce(CAST(sum(cv) OVER (ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS BIGINT), 0) AS cb
                       FROM cv),
                 r AS (SELECT g, sum(a*(2*cb + cv + 1))::BIGINT AS r2,
                              sum(a)::BIGINT AS n
                       FROM h JOIN w USING (v) GROUP BY g),
                 t AS (SELECT sum(n)::BIGINT AS nn,
                              count(*)::BIGINT AS k
                       FROM r),
                 tc AS (SELECT sum(cv*cv*cv - cv)::HUGEINT AS tie
                        FROM cv)
            SELECT k, nn AS n,
                   round((12.0/((1.0*nn)*(nn + 1)))
                         *sum(((1.0*r2)*r2/4.0)/n)
                         - 3.0*(nn + 1), 6) + 0 AS h,
                   CASE WHEN 1.0 - (1.0*tie)
                                   /((1.0*nn)*nn*nn - nn) > 0
                        THEN round(((12.0/((1.0*nn)*(nn + 1)))
                                    *sum(((1.0*r2)*r2/4.0)/n)
                                    - 3.0*(nn + 1))
                                   /(1.0 - (1.0*tie)
                                     /((1.0*nn)*nn*nn - nn)), 6) + 0
                        END AS h_tied
            FROM r, t, tc
            GROUP BY k, nn, tie
            HAVING nn >= 2 AND k >= 2
        """,
        "supplier_late_wilson": """
            WITH j AS (SELECT l_suppkey AS sk,
                              CASE WHEN CAST(l_shipdate AS DATE)
                                        - CAST(o_orderdate AS DATE)
                                        > 100
                                   THEN 1 ELSE 0 END AS late
                       FROM lineitem
                       JOIN orders ON o_orderkey = l_orderkey),
                 a AS (SELECT sk, count(*)::BIGINT AS n,
                              sum(late)::BIGINT AS late
                       FROM j GROUP BY 1),
                 w AS (SELECT sk, n, late, (1.0*late)/n AS p
                       FROM a)
            SELECT sk::BIGINT AS s_suppkey, n AS n_lines,
                   late AS n_late,
                   round(p, 6) + 0 AS late_rate,
                   round((p + (1.96*1.96)/(2.0*n)
                          - 1.96*sqrt((p*(1.0 - p))/n
                                      + (1.96*1.96)/(4.0*(n*n))))
                         /(1.0 + (1.96*1.96)/n), 6) + 0 AS wilson_low
            FROM w ORDER BY s_suppkey
        """,
        "session_bounce_rate": """
            WITH e AS (SELECT user_id, event_id, event_type,
                              epoch_us(ts)::BIGINT AS us
                       FROM events),
                 w AS (SELECT *, lag(us) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS pus
                       FROM e),
                 f AS (SELECT *, CASE WHEN pus IS NULL
                                        OR us - pus > 1800000000
                                      THEN 1 ELSE 0 END AS new
                       FROM w),
                 s AS (SELECT *, CAST(sum(new) OVER (
                                  PARTITION BY user_id
                                  ORDER BY us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                                  AS sid
                       FROM f),
                 g AS (SELECT user_id, sid, count(*)::BIGINT AS sz,
                              first(event_type ORDER BY us, event_id)
                                AS first_type
                       FROM s GROUP BY 1, 2)
            SELECT first_type, count(*)::BIGINT AS n_sessions,
                   count(*) FILTER (WHERE sz = 1)::BIGINT AS bounces,
                   round((1.0*count(*) FILTER (WHERE sz = 1))
                         /count(*), 6) + 0 AS bounce_rate
            FROM g GROUP BY 1 ORDER BY 1
        """,
        "events_value_minmax_scaled": """
            WITH o AS (SELECT event_id, event_type,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 b AS (SELECT event_type, min(c)::BIGINT AS mn,
                              max(c)::BIGINT AS mx
                       FROM o GROUP BY 1)
            SELECT event_id::BIGINT AS event_id, event_type,
                   CASE WHEN mx > mn
                        THEN round((1.0*(c - mn))/(mx - mn), 6) + 0
                        END AS scaled
            FROM o JOIN b USING (event_type)
            ORDER BY event_id
        """,
        "customer_abc_class": """
            WITH a AS (SELECT o_custkey AS ck,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT))::BIGINT AS c
                       FROM orders GROUP BY 1),
                 w AS (SELECT ck, c,
                              CAST(sum(c) OVER (ORDER BY c DESC, ck
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                                AS cum,
                              (SELECT sum(c) FROM a)::BIGINT AS tot
                       FROM a)
            SELECT ck::BIGINT AS c_custkey, c/100.0 AS spend,
                   CASE WHEN 100*cum <= 80*tot THEN 'A'
                        WHEN 100*cum <= 95*tot THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM w ORDER BY c_custkey
        """,
        "user_burstiness": """
            WITH ph AS (SELECT user_id,
                               (epoch_us(ts)//3600000000)::BIGINT AS h,
                               count(*)::BIGINT AS k
                        FROM events GROUP BY 1, 2),
                 a AS (SELECT user_id, sum(k)::BIGINT AS n,
                              sum(k*k)::BIGINT AS kk,
                              (max(h) - min(h) + 1)::BIGINT AS hh
                       FROM ph GROUP BY 1)
            SELECT user_id::BIGINT AS user_id, hh AS n_hours,
                   n AS n_events,
                   round(((kk - (1.0*n)*n/hh)/(hh - 1))
                         /((1.0*n)/hh), 6) + 0 AS fano
            FROM a WHERE hh >= 2 ORDER BY user_id
        """,
        "events_median_ci": """
            WITH c AS (SELECT CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 n AS (SELECT count(*)::BIGINT AS n FROM c),
                 r AS (SELECT n,
                              CAST(floor((n - 1.96*sqrt(1.0*n))/2.0)
                                   AS BIGINT) AS lo
                       FROM n),
                 w AS (SELECT c, row_number() OVER (ORDER BY c) AS rn
                       FROM c)
            SELECT r.n AS n,
                   (SELECT c FROM w WHERE rn = (r.n + 1)//2)
                     /100.0 AS median,
                   (SELECT c FROM w WHERE rn = r.lo)/100.0 AS ci_low,
                   (SELECT c FROM w WHERE rn = r.n + 1 - r.lo)
                     /100.0 AS ci_high
            FROM r WHERE r.lo >= 1 AND r.n >= 3
        """,
        "nation_balance_levene": """
            WITH c AS (SELECT c_nationkey AS nk,
                              CAST(round(c_acctbal*100) AS BIGINT) AS c
                       FROM customer),
                 m AS (SELECT nk, quantile_disc(c, 0.5)::BIGINT AS med
                       FROM c GROUP BY 1),
                 z AS (SELECT c.nk, abs(c.c - med)::BIGINT AS z
                       FROM c JOIN m USING (nk)),
                 g AS (SELECT nk, count(*)::BIGINT AS n,
                              sum(z)::BIGINT AS s, sum(z*z)::BIGINT AS q
                       FROM z GROUP BY 1),
                 t AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
                              sum(s)::BIGINT AS gg
                       FROM g),
                 p AS (SELECT k, nn,
                              sum((1.0*s)*s/n) - ((1.0*gg)*gg)/nn AS ssb,
                              sum(1.0*q - ((1.0*s)*s)/n) AS ssw
                       FROM g, t GROUP BY k, nn, gg)
            SELECT k, nn AS n,
                   round((ssb/(k-1))/(ssw/(nn-k)), 6) + 0 AS f_stat
            FROM p WHERE k >= 2 AND nn > k AND ssw > 0
        """,
        "event_type_entropy_rate": """
            WITH w AS (SELECT user_id, event_type,
                              lead(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
                       FROM events),
                 c AS (SELECT event_type AS src, nxt AS dst,
                              count(*)::BIGINT AS nij
                       FROM w WHERE nxt IS NOT NULL GROUP BY 1, 2),
                 r AS (SELECT src, sum(nij)::BIGINT AS ni
                       FROM c GROUP BY 1),
                 t AS (SELECT sum(nij)::BIGINT AS nn FROM c)
            SELECT nn AS n_transitions,
                   round(sum(-((1.0*nij)/nn)
                             *log2((1.0*nij)/ni)), 6) + 0
                     AS entropy_rate
            FROM c JOIN r USING (src), t
            GROUP BY nn
        """,
        "dup_cluster_size_histogram": """
            WITH f AS (SELECT md5(trim(regexp_replace(lower(text),
                                                      '\\s+', ' ',
                                                      'g'))) AS fp
                       FROM documents),
                 s AS (SELECT fp, count(*)::BIGINT AS sz
                       FROM f GROUP BY 1)
            SELECT sz AS cluster_size, count(*)::BIGINT AS n_clusters,
                   (sz*count(*))::BIGINT AS n_docs
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "curated_shard_write": """
            WITH a AS (SELECT doc_id, n_chars,
                              ((SUM(n_chars) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING)
                                - n_chars) // 100000)::BIGINT AS shard
                       FROM documents)
            SELECT shard, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars
            FROM a GROUP BY 1 ORDER BY 1
        """,
        "doc_bigram_logprob": """
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(lower(text),
                                                    '[a-z0-9_]+') AS ts
                          FROM documents),
                 big AS (SELECT doc_id,
                                unnest(list_transform(
                                    generate_series(1, len(ts) - 1),
                                    i -> ts[i] || ' ' || ts[i+1]))
                                  AS bg
                         FROM toks WHERE len(ts) >= 2),
                 uc AS (SELECT unnest(regexp_extract_all(lower(text),
                                                         '[a-z0-9_]+'))
                                 AS w
                        FROM documents),
                 u AS (SELECT w, count(*)::BIGINT AS c1
                       FROM uc GROUP BY 1),
                 v AS (SELECT count(*)::BIGINT AS v FROM u),
                 bcn AS (SELECT bg, count(*)::BIGINT AS c12
                         FROM big GROUP BY 1)
            SELECT doc_id::BIGINT AS doc_id,
                   count(*)::BIGINT AS n_bigrams,
                   round(sum(ln((1.0*(c12 + 1))/(c1 + v))), 4) + 0
                     AS logprob
            FROM big JOIN bcn USING (bg)
            JOIN u ON u.w = split_part(bg, ' ', 1), v
            GROUP BY doc_id ORDER BY doc_id
        """,
        "events_daily_cycle_strength": """
            WITH g AS (SELECT CAST(hour(ts) AS BIGINT) AS h,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1),
                 t AS (SELECT sum(n)::BIGINT AS nn,
                              sum(n*cos(2.0*pi()*h/24.0)) AS a,
                              sum(n*sin(2.0*pi()*h/24.0)) AS b
                       FROM g)
            SELECT nn AS n,
                   round((a*a + b*b)/((1.0*nn)*nn), 6) + 0
                     AS cycle_power
            FROM t WHERE nn > 0
        """,
        "nation_spearman": """
            WITH sp AS (SELECT o_custkey,
                               sum(CAST(round(o_totalprice*100)
                                        AS BIGINT))::BIGINT AS y
                        FROM orders GROUP BY 1),
                 d AS (SELECT c_custkey AS ck, c_nationkey AS nk,
                              CAST(round(c_acctbal*100) AS BIGINT) AS x,
                              coalesce(y, 0)::BIGINT AS y
                       FROM customer
                       LEFT JOIN sp ON o_custkey = c_custkey),
                 r AS (SELECT nk,
                              (2*(rank() OVER (PARTITION BY nk
                                    ORDER BY x) - 1)
                               + count(*) OVER (PARTITION BY nk, x)
                               + 1)::BIGINT AS rx,
                              (2*(rank() OVER (PARTITION BY nk
                                    ORDER BY y) - 1)
                               + count(*) OVER (PARTITION BY nk, y)
                               + 1)::BIGINT AS ry
                       FROM d),
                 m AS (SELECT nk, count(*)::BIGINT AS n,
                              sum(rx)::BIGINT AS sx,
                              sum(ry)::BIGINT AS sy,
                              sum(rx*rx)::BIGINT AS sxx,
                              sum(ry*ry)::BIGINT AS syy,
                              sum(rx*ry)::BIGINT AS sxy
                       FROM r GROUP BY 1)
            SELECT n_name, n,
                   round(((1.0*n)*sxy - (1.0*sx)*sy)
                         /(sqrt((1.0*n)*sxx - (1.0*sx)*sx)
                           *sqrt((1.0*n)*syy - (1.0*sy)*sy)), 6) + 0
                     AS spearman
            FROM m JOIN nation ON n_nationkey = nk
            WHERE n >= 2
              AND (1.0*n)*sxx - (1.0*sx)*sx > 0
              AND (1.0*n)*syy - (1.0*sy)*sy > 0
            ORDER BY n_name
        """,
        "hourly_click_purchase_corr24": """
            WITH e AS (SELECT (epoch_us(ts)//3600000000)*3600000000
                                AS h,
                              CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END AS x,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS y
                       FROM events
                       WHERE event_type IN ('click', 'purchase')),
                 g AS (SELECT h, sum(x)::BIGINT AS x,
                              sum(y)::BIGINT AS y
                       FROM e GROUP BY 1),
                 b AS (SELECT min(h) AS mn, max(h) AS mx FROM g),
                 grid AS (SELECT unnest(generate_series(mn, mx,
                                                        3600000000))
                                   AS h
                          FROM b),
                 f AS (SELECT grid.h, coalesce(g.x, 0)::BIGINT AS x,
                              coalesce(g.y, 0)::BIGINT AS y
                       FROM grid LEFT JOIN g USING (h)),
                 w AS (SELECT h, count(*) OVER win AS cnt,
                              CAST(sum(x) OVER win AS BIGINT) AS sx,
                              CAST(sum(y) OVER win AS BIGINT) AS sy,
                              CAST(sum(x*x) OVER win AS BIGINT) AS sxx,
                              CAST(sum(y*y) OVER win AS BIGINT) AS syy,
                              CAST(sum(x*y) OVER win AS BIGINT) AS sxy
                       FROM f
                       WINDOW win AS (ORDER BY h
                                      ROWS BETWEEN 23 PRECEDING
                                      AND CURRENT ROW))
            SELECT h AS hour_us,
                   CASE WHEN (24.0*sxx - (1.0*sx)*sx) > 0
                         AND (24.0*syy - (1.0*sy)*sy) > 0
                        THEN round((24.0*sxy - (1.0*sx)*sy)
                                   /(sqrt(24.0*sxx - (1.0*sx)*sx)
                                     *sqrt(24.0*syy - (1.0*sy)*sy)),
                                   6) + 0
                        END AS corr24
            FROM w WHERE cnt = 24 ORDER BY h
        """,
        "value_decile_type_matrix": """
            WITH c AS (SELECT event_type,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 q AS (SELECT quantile_disc(c, [0.1, 0.2, 0.3, 0.4,
                                                0.5, 0.6, 0.7, 0.8,
                                                0.9]) AS cuts
                       FROM c)
            SELECT len(list_filter(cuts, x -> x < c.c))::BIGINT
                     AS decile,
                   event_type, count(*)::BIGINT AS n
            FROM c, q GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "customer_recency_weighted_spend": """
            WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS m
                        FROM orders),
                 w AS (SELECT o_custkey AS ck,
                              (CAST(round(o_totalprice*100)
                                    AS BIGINT)/100.0)
                              * power(0.99,
                                      CAST(m - CAST(o_orderdate AS DATE)
                                           AS BIGINT)) AS w
                       FROM orders, mx),
                 a AS (SELECT ck, count(*)::BIGINT AS n,
                              sum(w) AS w
                       FROM w GROUP BY 1)
            SELECT ck::BIGINT AS c_custkey, n AS n_orders,
                   round(w, 4) + 0 AS weighted_spend
            FROM a ORDER BY round(w, 4) DESC, ck LIMIT 20
        """,
        "customer_third_order": """
            WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
                              o_totalprice,
                              row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
                                AS rn
                       FROM orders)
            SELECT o_custkey::BIGINT AS c_custkey,
                   o_orderkey::BIGINT AS third_orderkey,
                   CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS third_day,
                   CAST(round(o_totalprice*100) AS BIGINT)/100.0
                     AS third_price
            FROM r WHERE rn = 3 ORDER BY c_custkey
        """,
        "events_type_lift_matrix": """
            WITH inc AS (SELECT DISTINCT user_id, event_type
                         FROM events),
                 n AS (SELECT count(DISTINCT user_id)::BIGINT AS nn
                       FROM events),
                 per AS (SELECT event_type, count(*)::BIGINT AS c
                         FROM inc GROUP BY 1),
                 pr AS (SELECT a.event_type AS t1, b.event_type AS t2,
                               count(*)::BIGINT AS n_both
                        FROM inc a JOIN inc b
                          ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
                        GROUP BY 1, 2)
            SELECT t1, t2, n_both,
                   round((1.0*n_both*nn)/((1.0*p1.c)*p2.c), 6) + 0
                     AS lift
            FROM pr
            JOIN per p1 ON p1.event_type = t1
            JOIN per p2 ON p2.event_type = t2, n
            WHERE p1.c > 0 AND p2.c > 0
            ORDER BY t1, t2
        """,
        "customer_order_gap_median": """
            WITH g AS (SELECT o_custkey AS ck,
                              CAST(CAST(o_orderdate AS DATE)
                                   - lag(CAST(o_orderdate AS DATE))
                                     OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate,
                                                    o_orderkey)
                                   AS BIGINT) AS gap
                       FROM orders)
            SELECT ck::BIGINT AS c_custkey, count(*)::BIGINT AS n_gaps,
                   quantile_disc(gap, 0.5)::BIGINT AS median_gap_days
            FROM g WHERE gap IS NOT NULL
            GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1
        """,
        "events_weekend_lift": """
            WITH c AS (SELECT CASE WHEN isodow(ts) >= 6
                                   THEN 1 ELSE 0 END AS we,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 g AS (SELECT we, count(*)::BIGINT AS n,
                              sum(c)::BIGINT AS s
                       FROM c GROUP BY 1),
                 p AS (SELECT max(CASE WHEN we = 0 THEN n END) AS nw,
                              max(CASE WHEN we = 0 THEN s END) AS cw,
                              max(CASE WHEN we = 1 THEN n END) AS ne,
                              max(CASE WHEN we = 1 THEN s END) AS ce
                       FROM g)
            SELECT nw::BIGINT AS n_weekday, ne::BIGINT AS n_weekend,
                   round((1.0*cw)/nw/100.0, 6) + 0 AS avg_weekday,
                   round((1.0*ce)/ne/100.0, 6) + 0 AS avg_weekend,
                   round(((1.0*ce)/ne/100.0)/((1.0*cw)/nw/100.0), 6)
                     + 0 AS lift
            FROM p WHERE nw > 0 AND ne > 0
        """,
        "nation_part_coverage": """
            WITH r AS (SELECT s_nationkey AS nk, l_partkey AS pk,
                              sum(""" + _REV_C_SQL + """)::BIGINT
                                AS rev
                       FROM lineitem
                       JOIN supplier ON s_suppkey = l_suppkey
                       GROUP BY 1, 2),
                 w AS (SELECT nk, rev,
                              row_number() OVER (PARTITION BY nk
                                  ORDER BY rev DESC, pk) AS k,
                              CAST(sum(rev) OVER (PARTITION BY nk
                                  ORDER BY rev DESC, pk
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                                AS cum,
                              CAST(sum(rev) OVER (PARTITION BY nk)
                                   AS BIGINT) AS tot
                       FROM r)
            SELECT n_name, min(k)::BIGINT AS k_parts,
                   min_by(cum, k)::BIGINT AS covered, tot AS total
            FROM w JOIN nation ON n_nationkey = nk
            WHERE 2*cum >= tot AND tot > 0
            GROUP BY n_name, tot ORDER BY n_name
        """,
        "orders_1998_filter_pushdown": """
            SELECT count(*)::BIGINT AS n_orders,
                   sum(CAST(round(o_totalprice*100) AS BIGINT))
                     ::BIGINT/100.0 AS revenue
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1998-01-01'
              AND o_orderdate < TIMESTAMP '1999-01-01'
            HAVING count(*) > 0
        """,
        "embedding_dispersion": """
            WITH e AS (SELECT embedding::DOUBLE[] AS v
                       FROM embeddings),
                 n AS (SELECT count(*)::BIGINT AS n FROM e),
                 s AS (SELECT sum(list_sum(list_transform(v,
                                  x -> x*x))) AS ssq
                       FROM e),
                 x AS (SELECT unnest(v) AS val,
                              generate_subscripts(v, 1) AS dim
                       FROM e),
                 comp AS (SELECT dim, sum(val) AS cs
                          FROM x GROUP BY 1),
                 m AS (SELECT sum((cs/n)*(cs/n)) AS musq
                       FROM comp, n)
            SELECT n.n AS n,
                   round(2.0*(ssq/n.n - musq), 6) + 0
                     AS mean_sq_distance
            FROM n, s, m WHERE n.n > 0
        """,
        "session_path_top10": """
            WITH e AS (SELECT user_id, event_id, event_type,
                              epoch_us(ts)::BIGINT AS us
                       FROM events),
                 w AS (SELECT *, lag(us) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS pus
                       FROM e),
                 f AS (SELECT *, CASE WHEN pus IS NULL
                                        OR us - pus > 1800000000
                                      THEN 1 ELSE 0 END AS new
                       FROM w),
                 s AS (SELECT *, CAST(sum(new) OVER (
                                  PARTITION BY user_id
                                  ORDER BY us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                                  AS sid
                       FROM f),
                 p AS (SELECT user_id, sid,
                              array_to_string(
                                  (list(event_type
                                        ORDER BY us, event_id))[1:3],
                                  '>') AS path
                       FROM s GROUP BY 1, 2)
            SELECT path, count(*)::BIGINT AS n_sessions
            FROM p GROUP BY 1
            ORDER BY n_sessions DESC, path LIMIT 10
        """,
        "customer_tercile_migration": """
            WITH s AS (SELECT o_custkey AS ck,
                              year(o_orderdate)::BIGINT AS y,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT))::BIGINT AS c
                       FROM orders
                       WHERE year(o_orderdate) IN (1997, 1998)
                       GROUP BY 1, 2),
                 b AS (SELECT a.ck, a.c AS c97, z.c AS c98
                       FROM s a JOIN s z ON a.ck = z.ck
                       WHERE a.y = 1997 AND z.y = 1998),
                 t AS (SELECT ck,
                              ntile(3) OVER (ORDER BY c97 DESC, ck)
                                ::BIGINT AS t97,
                              ntile(3) OVER (ORDER BY c98 DESC, ck)
                                ::BIGINT AS t98
                       FROM b)
            SELECT t97 AS tercile_1997, t98 AS tercile_1998,
                   count(*)::BIGINT AS n_customers
            FROM t GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "daily_revenue_trailing30": """
            WITH a AS (SELECT CAST(CAST(o_orderdate AS DATE)
                                   - DATE '1970-01-01' AS BIGINT)
                                AS day,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT))::BIGINT AS c
                       FROM orders GROUP BY 1),
                 b AS (SELECT min(day) AS mn, max(day) AS mx FROM a),
                 grid AS (SELECT unnest(generate_series(mn, mx, 1))
                                   AS day
                          FROM b),
                 f AS (SELECT grid.day, coalesce(a.c, 0)::BIGINT AS c
                       FROM grid LEFT JOIN a USING (day)),
                 w AS (SELECT day, count(*) OVER win AS cnt,
                              CAST(sum(c) OVER win AS BIGINT) AS s
                       FROM f
                       WINDOW win AS (ORDER BY day
                                      ROWS BETWEEN 29 PRECEDING
                                      AND CURRENT ROW))
            SELECT day, s/100.0 AS revenue_30d
            FROM w WHERE cnt = 30 ORDER BY day
        """,
        "part_brand_size_median_price": """
            SELECT p_brand, p_size::BIGINT AS p_size,
                   quantile_disc(CAST(round(p_retailprice*100)
                                      AS BIGINT), 0.5)::BIGINT/100.0
                     AS median_price
            FROM part GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "user_active_coverage": """
            WITH e AS (SELECT user_id, event_id,
                              epoch_us(ts)::BIGINT AS s,
                              epoch_us(ts)::BIGINT + 1800000000 AS en
                       FROM events),
                 w AS (SELECT *, max(en) OVER (PARTITION BY user_id
                                  ORDER BY s, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pmax
                       FROM e),
                 f AS (SELECT user_id, s, en, event_id,
                              CASE WHEN pmax IS NULL OR s >= pmax
                                   THEN 1 ELSE 0 END AS new
                       FROM w),
                 i AS (SELECT user_id, s, en,
                              CAST(sum(new) OVER (PARTITION BY user_id
                                  ORDER BY s, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                                AS isl
                       FROM f),
                 g AS (SELECT user_id, isl,
                              (max(en) - min(s))::BIGINT AS span
                       FROM i GROUP BY 1, 2)
            SELECT user_id::BIGINT AS user_id,
                   count(*)::BIGINT AS n_islands,
                   sum(span)::BIGINT AS covered_us
            FROM g GROUP BY 1 ORDER BY 1
        """,
        "user_stickiness": """
            WITH du AS (SELECT DISTINCT
                               (epoch_us(ts)//86400000000)::BIGINT
                                 AS day,
                               user_id
                        FROM events),
                 a AS (SELECT count(DISTINCT day)::BIGINT AS nd,
                              count(DISTINCT user_id)::BIGINT AS mau,
                              count(*)::BIGINT AS ds
                       FROM du)
            SELECT nd AS n_days, mau,
                   round((1.0*ds)/nd, 6) + 0 AS avg_dau,
                   round(((1.0*ds)/nd)/mau, 6) + 0 AS stickiness
            FROM a WHERE nd > 0
        """,
        "error_burst_peak": """
            WITH e AS (SELECT (epoch_us(ts)//60000000)::BIGINT AS m
                       FROM events WHERE event_type = 'error'),
                 g AS (SELECT m, count(*)::BIGINT AS n
                       FROM e GROUP BY 1),
                 b AS (SELECT min(m) AS mn, max(m) AS mx FROM g),
                 grid AS (SELECT unnest(generate_series(mn, mx, 1))
                                   AS m
                          FROM b),
                 f AS (SELECT grid.m, coalesce(g.n, 0)::BIGINT AS n
                       FROM grid LEFT JOIN g USING (m)),
                 w AS (SELECT m, count(*) OVER win AS cnt,
                              CAST(sum(n) OVER win AS BIGINT) AS s
                       FROM f
                       WINDOW win AS (ORDER BY m
                                      ROWS BETWEEN 59 PRECEDING
                                      AND CURRENT ROW)),
                 p AS (SELECT s, m - 59 AS start_m
                       FROM w WHERE cnt = 60)
            SELECT s AS peak_errors,
                   (start_m*60000000)::BIGINT AS window_start_us
            FROM p WHERE s = (SELECT max(s) FROM p)
            ORDER BY start_m LIMIT 1
        """,
        "orders_empirical_rule": """
            WITH c AS (SELECT CAST(round(o_totalprice) AS BIGINT) AS c
                       FROM orders),
                 m AS (SELECT count(*)::BIGINT AS n,
                              sum(c)::BIGINT AS s,
                              sum(c*c)::BIGINT AS q
                       FROM c),
                 b AS (SELECT n,
                              (1.0*s)/n AS mu,
                              sqrt((q - (1.0*s)*s/n)/(n - 1)) AS sg
                       FROM m WHERE n >= 2)
            SELECT n,
                   round((1.0*(SELECT count(*) FROM c, b
                               WHERE c >= mu - sg AND c <= mu + sg))
                         /n, 6) + 0 AS share_1sigma,
                   round((1.0*(SELECT count(*) FROM c, b
                               WHERE c >= mu - 2.0*sg
                                 AND c <= mu + 2.0*sg))
                         /n, 6) + 0 AS share_2sigma
            FROM b
        """,
        "events_value_iqr_outliers": """
            WITH c AS (SELECT CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 q AS (SELECT quantile_disc(c, 0.25)::BIGINT AS q1,
                              quantile_disc(c, 0.75)::BIGINT AS q3,
                              count(*)::BIGINT AS n
                       FROM c)
            SELECT n,
                   (SELECT count(*) FROM c, q
                    WHERE c < q1 - 1.5*(q3 - q1))::BIGINT AS n_low,
                   (SELECT count(*) FROM c, q
                    WHERE c > q3 + 1.5*(q3 - q1))::BIGINT AS n_high
            FROM q WHERE n > 0
        """,
        "source_jsd_matrix": """
            WITH tok AS (SELECT source AS s,
                                unnest(regexp_extract_all(lower(text),
                                                          '[a-z0-9_]+'))
                                  AS token
                         FROM documents),
                 h AS (SELECT s, token, count(*)::BIGINT AS c
                       FROM tok GROUP BY 1, 2),
                 t AS (SELECT s, sum(c)::BIGINT AS tc
                       FROM h GROUP BY 1),
                 pairs AS (SELECT a.s AS s1, a.tc AS ta,
                                  b.s AS s2, b.tc AS tb
                           FROM t a JOIN t b ON a.s < b.s
                           WHERE a.tc > 0 AND b.tc > 0),
                 vocab AS (SELECT DISTINCT token FROM h),
                 u AS (SELECT p.s1, p.s2, p.ta, p.tb, v.token,
                              coalesce(h1.c, 0)::BIGINT AS a,
                              coalesce(h2.c, 0)::BIGINT AS b
                       FROM pairs p
                       CROSS JOIN vocab v
                       LEFT JOIN h h1 ON h1.s = p.s1
                                     AND h1.token = v.token
                       LEFT JOIN h h2 ON h2.s = p.s2
                                     AND h2.token = v.token
                       WHERE coalesce(h1.c, 0) > 0
                          OR coalesce(h2.c, 0) > 0)
            SELECT s1, s2,
                   round(sum(
                       CASE WHEN a > 0
                            THEN 0.5*((1.0*a)/ta)
                                 *log2(2.0*((1.0*a)/ta)
                                       /((1.0*a)/ta + (1.0*b)/tb))
                            ELSE 0 END
                     + CASE WHEN b > 0
                            THEN 0.5*((1.0*b)/tb)
                                 *log2(2.0*((1.0*b)/tb)
                                       /((1.0*a)/ta + (1.0*b)/tb))
                            ELSE 0 END), 6) + 0 AS jsd
            FROM u GROUP BY s1, s2 ORDER BY s1, s2
        """,
        "orders_quarter_index": """
            WITH q AS (SELECT year(o_orderdate)::BIGINT AS year,
                              quarter(o_orderdate)::BIGINT AS quarter,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT))::BIGINT AS c
                       FROM orders GROUP BY 1, 2),
                 b AS (SELECT c AS base FROM q
                       ORDER BY year, quarter LIMIT 1)
            SELECT year, quarter, c/100.0 AS revenue,
                   round(100.0*c/base, 6) + 0 AS index100
            FROM q, b WHERE base > 0 ORDER BY year, quarter
        """,
        "events_cumulative_users": """
            WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day
                          FROM events),
                 c AS (SELECT day,
                              (SELECT count(DISTINCT user_id) FROM events
                               WHERE ts < day + INTERVAL 1 DAY)::BIGINT
                                AS cum_users
                       FROM days),
                 w AS (SELECT day,
                              (cum_users
                               - coalesce(lag(cum_users)
                                            OVER (ORDER BY day), 0))
                                ::BIGINT AS new_users,
                              cum_users
                       FROM c)
            SELECT * FROM w WHERE new_users > 0 ORDER BY day
        """,
        "orders_changepoint": """
            WITH d AS (SELECT date_trunc('day', o_orderdate) AS day,
                              sum(CAST(round(o_totalprice*100) AS BIGINT))
                                ::BIGINT AS c
                       FROM orders GROUP BY 1),
                 p AS (SELECT day, c,
                              sum(c) OVER (ORDER BY day)::BIGINT AS s1,
                              row_number() OVER (ORDER BY day)::BIGINT
                                AS n1
                       FROM d),
                 t AS (SELECT sum(c)::BIGINT AS S,
                              count(*)::BIGINT AS N FROM d),
                 k AS (SELECT day, s1, n1, S - s1 AS s2, N - n1 AS n2,
                              S, N
                       FROM p, t WHERE n1 < N)
            SELECT day AS split_day, n1 AS n_before, n2 AS n_after,
                   round((1.0*s1)/n1/100.0, 6) + 0 AS mean_before,
                   round((1.0*s2)/n2/100.0, 6) + 0 AS mean_after,
                   round(((s1::HUGEINT*s1)/n1 + (s2::HUGEINT*s2)/n2
                          - (S::HUGEINT*S)/N)/10000.0, 6) + 0 AS bss
            FROM k
            ORDER BY (s1::HUGEINT*s1)/n1 + (s2::HUGEINT*s2)/n2 DESC, day
            LIMIT 1
        """,
        "docs_cramers_v": """
            WITH h AS (SELECT lang, source, count(*)::BIGINT AS o
                       FROM documents GROUP BY 1, 2),
                 m AS (SELECT *,
                              sum(o) OVER (PARTITION BY lang)::BIGINT
                                AS rt,
                              sum(o) OVER (PARTITION BY source)::BIGINT
                                AS ct,
                              sum(o) OVER ()::BIGINT AS n
                       FROM h),
                 s AS (SELECT any_value(n) AS n,
                              sum((o - (1.0*rt)*ct/n)
                                  * (o - (1.0*rt)*ct/n)
                                  / ((1.0*rt)*ct/n)
                                  ORDER BY lang, source) AS chi2,
                              least(count(DISTINCT lang),
                                    count(DISTINCT source)) - 1 AS dof
                       FROM m)
            SELECT n::BIGINT AS n, round(chi2, 6) + 0 AS chi2,
                   CASE WHEN dof > 0
                        THEN round(sqrt(chi2/(n*dof)), 6) + 0
                        ELSE NULL END AS cramers_v
            FROM s
        """,
        "events_type_trend": """
            WITH g AS (SELECT event_type,
                              date_diff('month',
                                        (SELECT date_trunc('month',
                                                           min(ts))
                                         FROM events),
                                        date_trunc('month', ts))::BIGINT
                                AS x,
                              count(*)::BIGINT AS y
                       FROM events GROUP BY 1, 2),
                 m AS (SELECT event_type, count(*)::BIGINT AS n,
                              sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                              sum(x*y)::BIGINT AS sxy,
                              sum(x*x)::BIGINT AS sxx
                       FROM g GROUP BY 1)
            SELECT event_type, n AS n_months,
                   CASE WHEN n*sxx - sx*sx <> 0
                        THEN round((1.0*(n*sxy - sx*sy))
                                   / (n*sxx - sx*sx), 6) + 0
                        ELSE NULL END AS slope_per_month
            FROM m ORDER BY event_type
        """,
        "events_cohort_ltv": """
            WITH e AS (SELECT user_id, date_trunc('month', ts) AS m,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 f AS (SELECT user_id, min(m) AS cm FROM e GROUP BY 1),
                 cell AS (SELECT cm AS cohort_month,
                                 date_diff('month', cm, m)::BIGINT
                                   AS month_offset,
                                 sum(c)::BIGINT AS cc
                          FROM e JOIN f USING (user_id)
                          GROUP BY 1, 2)
            SELECT cohort_month, month_offset,
                   cc/100.0 AS value_total,
                   (sum(cc) OVER (PARTITION BY cohort_month
                                  ORDER BY month_offset))/100.0
                     AS value_cum
            FROM cell ORDER BY cohort_month, month_offset
        """,
        "part_name_damerau": """
            SELECT a.p_brand AS p_brand, a.p_partkey AS pk1,
                   b.p_partkey AS pk2,
                   damerau_levenshtein(a.p_name, b.p_name)::BIGINT AS dl
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE damerau_levenshtein(a.p_name, b.p_name) <= 4
            ORDER BY 1, 2, 3
        """,
        "user_seq_pattern": """
            WITH s AS (SELECT user_id,
                              string_agg(substr(event_type, 1, 1), ''
                                         ORDER BY ts, event_id) AS seq,
                              count(*)::BIGINT AS n_events
                       FROM events GROUP BY user_id)
            SELECT user_id, n_events,
                   CAST(regexp_matches(seq, 'v.*e.*p') AS BIGINT) AS hit
            FROM s ORDER BY user_id
        """,
        "error_next_purchase_asof": """
            SELECT e.event_id, e.user_id, e.ts,
                   min(p.ts) AS next_purchase_ts
            FROM events e LEFT JOIN events p
              ON p.user_id = e.user_id AND p.event_type = 'purchase'
                 AND p.ts > e.ts
            WHERE e.event_type = 'error'
            GROUP BY 1, 2, 3 ORDER BY e.event_id
        """,
        "customer_order_overlap_pairs": """
            WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate AS s,
                              o_orderdate + to_days(CAST(
                                  o_orderkey % 20 + 1 AS INTEGER)) AS e
                       FROM orders),
                 p AS (SELECT a.o_custkey AS ck, count(*)::BIGINT AS np
                       FROM o a JOIN o b
                         ON a.o_custkey = b.o_custkey
                            AND a.o_orderkey < b.o_orderkey
                            AND a.s <= b.e AND b.s <= a.e
                       GROUP BY 1)
            SELECT o_custkey, count(*)::BIGINT AS n_orders,
                   COALESCE(np, 0)::BIGINT AS n_pairs
            FROM orders LEFT JOIN p ON o_custkey = ck
            GROUP BY o_custkey, np ORDER BY o_custkey
        """,
        "embedding_dim_argmax": """
            WITH u AS (SELECT vec_id,
                              generate_subscripts(embedding, 1) AS dim,
                              unnest(embedding) AS v
                       FROM embeddings),
                 m AS (SELECT dim, max(v) AS mx FROM u GROUP BY dim)
            SELECT u.dim::BIGINT AS dim, CAST(m.mx AS DOUBLE) AS max_val,
                   min(u.vec_id) AS vec_id
            FROM u JOIN m ON u.dim = m.dim AND u.v = m.mx
            GROUP BY u.dim, m.mx ORDER BY dim
        """,
        "customer_spend_index_first": """
            SELECT o_orderkey, o_custkey,
                   round(o_totalprice / first_value(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey), 6) AS spend_index
            FROM orders ORDER BY o_orderkey
        """,
        "events_weekend_type_mi": """
            WITH c AS (SELECT event_type,
                              CAST(isodow(ts) >= 6 AS BIGINT) AS wk,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
                 t AS (SELECT event_type, sum(n)::BIGINT AS nt
                       FROM c GROUP BY 1),
                 w AS (SELECT wk, sum(n)::BIGINT AS nw FROM c GROUP BY 1),
                 g AS (SELECT sum(n)::BIGINT AS nn FROM c)
            SELECT c.event_type, c.wk, c.n,
                   round((1.0 * c.n / g.nn)
                         * log2((1.0 * c.n * g.nn) / (1.0 * t.nt * w.nw)),
                         6) + 0 AS mi_contrib
            FROM c JOIN t USING (event_type) JOIN w USING (wk)
                 CROSS JOIN g
            ORDER BY c.event_type, c.wk
        """,
        "embedding_neighbor_dot": """
            WITH s AS (SELECT vec_id, embedding,
                              lead(vec_id) OVER (ORDER BY vec_id) AS nid,
                              lead(embedding) OVER (ORDER BY vec_id)
                                AS nemb
                       FROM embeddings)
            SELECT vec_id, nid AS next_vec_id,
                   round(list_dot_product(CAST(embedding AS DOUBLE[]),
                                          CAST(nemb AS DOUBLE[])), 6)
                     AS dot
            FROM s WHERE nid IS NOT NULL ORDER BY vec_id
        """,
        "orders_price_page2": """
            SELECT * FROM (
                SELECT CAST(row_number() OVER (
                           ORDER BY o_totalprice DESC, o_orderkey)
                           AS BIGINT) AS rank,
                       o_orderkey, o_totalprice
                FROM orders)
            WHERE rank > 100 AND rank <= 200 ORDER BY rank
        """,
        "docs_source_checksum": """
            SELECT source,
                   lpad(to_hex(bit_xor(md5_number_lower(text))), 16, '0')
                     AS checksum,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY source ORDER BY source
        """,
        "sessions_peak_concurrency": """
            WITH e AS (SELECT user_id, ts, event_id,
                              CASE WHEN lag(ts) OVER w IS NULL
                                     OR epoch_us(ts)
                                        - epoch_us(lag(ts) OVER w)
                                        > 1800000000
                                   THEN 1 ELSE 0 END AS new_s
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
                 s AS (SELECT user_id, ts,
                              sum(new_s) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
                       FROM e),
                 iv AS (SELECT user_id, sid, min(epoch_us(ts)) AS st,
                               max(epoch_us(ts)) AS en
                        FROM s GROUP BY 1, 2),
                 d AS (SELECT st AS t, 0 AS side, 1 AS dd FROM iv
                       UNION ALL
                       SELECT en, 1, -1 FROM iv),
                 g AS (SELECT t, side, sum(dd) AS dd FROM d
                       GROUP BY 1, 2),
                 c AS (SELECT t, side,
                              sum(dd) OVER (ORDER BY t, side
                                            ROWS UNBOUNDED PRECEDING)
                                AS conc
                       FROM g)
            SELECT max(conc)::BIGINT AS peak,
                   (SELECT min(t) FROM c
                    WHERE side = 0
                      AND conc = (SELECT max(conc) FROM c))::BIGINT
                     AS peak_t_us
            FROM c HAVING max(conc) IS NOT NULL
        """,
        "supplier_clustering_coeff": """
            WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                        FROM lineitem),
                 e AS (SELECT DISTINCT a.s AS x, b.s AS y
                       FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
                 d AS (SELECT node, count(*)::BIGINT AS deg
                       FROM (SELECT x AS node FROM e
                             UNION ALL SELECT y FROM e)
                       GROUP BY 1),
                 w AS (SELECT sum(deg * (deg - 1) / 2)::BIGINT AS wedges
                       FROM d),
                 t AS (SELECT count(*)::BIGINT AS tri
                       FROM e e1
                       JOIN e e2 ON e2.x = e1.y
                       JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y)
            SELECT t.tri AS n_tri, w.wedges AS n_wedges,
                   round(3.0 * t.tri / w.wedges, 6) AS clustering_coeff
            FROM t, w WHERE w.wedges > 0
        """,
        "customer_max_drawdown": """
            WITH c AS (SELECT o_custkey, o_orderdate, o_orderkey,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                AS cents
                       FROM orders),
                 r AS (SELECT o_custkey,
                              max(cents) OVER (
                                  PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey
                                  ROWS UNBOUNDED PRECEDING) - cents AS d
                       FROM c)
            SELECT o_custkey, max(d) / 100.0 AS max_drawdown
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "embedding_top_pairs": """
            WITH p AS (SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2,
                              round(list_dot_product(
                                  CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])), 6)
                                AS dot
                       FROM embeddings a
                       JOIN embeddings b ON a.vec_id < b.vec_id)
            SELECT vec_id1, vec_id2, dot FROM p
            ORDER BY dot DESC, vec_id1, vec_id2 LIMIT 20
        """,
        "docs_jsonl_roundtrip": """
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars,
                   lpad(to_hex(bit_xor(md5_number_lower(text))), 16, '0')
                     AS checksum
            FROM documents GROUP BY source ORDER BY source
        """,
        "docs_cdc_diff": """
            WITH newt AS (SELECT doc_id, md5_number_lower(text) AS h
                          FROM documents),
                 st AS (SELECT doc_id,
                               md5_number_lower(CASE WHEN doc_id % 10 = 7
                                   THEN text || 'X' ELSE text END) AS h
                        FROM documents WHERE doc_id % 9 <> 4
                        UNION ALL
                        SELECT -doc_id,
                               md5_number_lower(CASE WHEN doc_id % 10 = 7
                                   THEN text || 'X' ELSE text END)
                        FROM documents WHERE doc_id % 11 = 5),
                 j AS (SELECT CASE WHEN s.doc_id IS NULL THEN 'insert'
                                   WHEN n.doc_id IS NULL THEN 'delete'
                                   WHEN n.h = s.h THEN 'unchanged'
                                   ELSE 'update' END AS op
                       FROM newt n FULL JOIN st s
                         ON n.doc_id = s.doc_id)
            SELECT op, count(*)::BIGINT AS n FROM j
            GROUP BY op ORDER BY op
        """,
        "char_pair_top": """
            WITH p AS (SELECT unnest(list_transform(
                           generate_series(1, length(text) - 1),
                           i -> substr(text, i, 2))) AS pair
                       FROM documents),
                 c AS (SELECT pair, count(*)::BIGINT AS n FROM p
                       WHERE regexp_matches(pair, '^[a-z]{2}$')
                       GROUP BY pair)
            SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT 20
        """,
        "name_match_pr_curve": """
            WITH pr AS (SELECT levenshtein(a.p_name, b.p_name) AS lev,
                               jaccard(a.p_name, b.p_name) AS jac
                        FROM part a JOIN part b
                          ON a.p_brand = b.p_brand
                             AND a.p_partkey < b.p_partkey),
                 th AS (SELECT unnest([1, 2, 3, 4]) AS t),
                 m AS (SELECT th.t,
                              sum(CASE WHEN lev <= th.t AND jac >= 0.8
                                       THEN 1 ELSE 0 END)::BIGINT AS tp,
                              sum(CASE WHEN lev <= th.t AND jac < 0.8
                                       THEN 1 ELSE 0 END)::BIGINT AS fp,
                              sum(CASE WHEN lev > th.t AND jac >= 0.8
                                       THEN 1 ELSE 0 END)::BIGINT AS fn
                       FROM pr CROSS JOIN th GROUP BY th.t)
            SELECT t::BIGINT AS t, tp, fp, fn,
                   CASE WHEN tp + fp > 0
                        THEN round(1.0 * tp / (tp + fp), 6) + 0
                        END AS "precision",
                   CASE WHEN tp + fn > 0
                        THEN round(1.0 * tp / (tp + fn), 6) + 0
                        END AS recall
            FROM m ORDER BY t
        """,
        "docs_pattern_matrix": """
            WITH m AS (
                SELECT 'digits' AS pattern, lang,
                       CAST(length(regexp_extract_all(
                           text, '[0-9]{3,}')) > 0 AS BIGINT) AS m,
                       length(regexp_extract_all(
                           text, '[0-9]{3,}'))::BIGINT AS h
                FROM documents
                UNION ALL
                SELECT 'url', lang,
                       CAST(length(regexp_extract_all(
                           text, 'https?://')) > 0 AS BIGINT),
                       length(regexp_extract_all(
                           text, 'https?://'))::BIGINT
                FROM documents
                UNION ALL
                SELECT 'shout', lang,
                       CAST(length(regexp_extract_all(
                           text, '[A-Z]{4,}')) > 0 AS BIGINT),
                       length(regexp_extract_all(
                           text, '[A-Z]{4,}'))::BIGINT
                FROM documents
                UNION ALL
                SELECT 'punct_run', lang,
                       CAST(length(regexp_extract_all(
                           text, '[!?.]{2,}')) > 0 AS BIGINT),
                       length(regexp_extract_all(
                           text, '[!?.]{2,}'))::BIGINT
                FROM documents)
            SELECT pattern, lang, sum(m)::BIGINT AS n_docs,
                   sum(h)::BIGINT AS n_hits
            FROM m GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "embedding_label_cohesion": """
            WITH u AS (SELECT vec_id, label,
                              generate_subscripts(embedding, 1) AS dim,
                              CAST(unnest(embedding) AS DOUBLE) AS v
                       FROM embeddings),
                 c AS (SELECT label, dim, sum(v) / count(*) AS m
                       FROM u GROUP BY 1, 2),
                 d AS (SELECT u.vec_id, u.label, sum(u.v * c.m) AS dot
                       FROM u JOIN c
                         ON u.label = c.label AND u.dim = c.dim
                       GROUP BY 1, 2)
            SELECT label::BIGINT AS label, count(*)::BIGINT AS n,
                   round(sum(dot) / count(*), 6) + 0 AS cohesion
            FROM d GROUP BY label ORDER BY label
        """,
        "docs_csv_roundtrip": """
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars,
                   lpad(to_hex(bit_xor(md5_number_lower(text))), 16, '0')
                     AS checksum
            FROM documents GROUP BY source ORDER BY source
        """,
        "part_name_prefix_overlap": """
            WITH s AS (SELECT p_name AS a,
                              lead(p_name) OVER (
                                  ORDER BY p_name, p_partkey) AS b
                       FROM part),
                 l AS (SELECT COALESCE(list_sum(list_transform(
                           generate_series(1, least(length(a),
                                                    length(b))),
                           i -> CAST(substr(a, 1, i) = substr(b, 1, i)
                                     AS BIGINT))), 0)::BIGINT AS lcp
                       FROM s WHERE b IS NOT NULL)
            SELECT lcp, count(*)::BIGINT AS n_pairs FROM l
            GROUP BY lcp ORDER BY lcp
        """,
        "vocab_growth_curve": """
            WITH mx AS (SELECT max(doc_id) AS m FROM documents),
                 tk AS (SELECT unnest(regexp_extract_all(
                            lower(text), '[a-z0-9_]+')) AS token, doc_id
                        FROM documents),
                 f AS (SELECT token, min(doc_id) AS fd FROM tk
                       GROUP BY token),
                 v AS (SELECT (fd * 10) // (m + 1) AS b,
                              count(*)::BIGINT AS nv
                       FROM f, mx GROUP BY 1),
                 dd AS (SELECT (doc_id * 10) // (m + 1) AS b,
                               count(*)::BIGINT AS ndoc
                        FROM documents, mx GROUP BY 1),
                 sp AS (SELECT unnest(generate_series(0, 9)) AS b)
            SELECT (sp.b + 1)::BIGINT AS decile,
                   (SELECT COALESCE(sum(ndoc), 0) FROM dd
                    WHERE dd.b <= sp.b)::BIGINT AS n_docs,
                   (SELECT COALESCE(sum(nv), 0) FROM v
                    WHERE v.b <= sp.b)::BIGINT AS vocab
            FROM sp ORDER BY decile
        """,
        "user_type_rle_top": """
            WITH s AS (SELECT user_id, event_type,
                              row_number() OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
                              row_number() OVER (
                                  PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rt
                       FROM events),
                 r AS (SELECT event_type, count(*)::BIGINT AS run_len
                       FROM s GROUP BY user_id, event_type, rn - rt),
                 c AS (SELECT event_type, run_len,
                              count(*)::BIGINT AS n_runs
                       FROM r GROUP BY 1, 2)
            SELECT event_type, run_len, n_runs FROM c
            ORDER BY n_runs DESC, event_type, run_len LIMIT 10
        """,
        "docs_k_anonymity": """
            WITH c AS (SELECT lang, source, n_chars // 100 AS bucket,
                              count(*)::BIGINT AS n
                       FROM documents GROUP BY 1, 2, 3)
            SELECT count(*)::BIGINT AS n_classes,
                   sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT
                     AS n_risky_classes,
                   COALESCE(sum(n) FILTER (WHERE n < 5), 0)::BIGINT
                     AS n_risky_docs
            FROM c
        """,
        "daily_revenue_forecast_mape": """
            WITH d AS (SELECT date_trunc('day', o_orderdate) AS day,
                              sum(CAST(round(o_totalprice * 100)
                                       AS BIGINT)) AS c
                       FROM orders GROUP BY 1),
                 l AS (SELECT day, c, lag(c, 7) OVER (ORDER BY day) AS p
                       FROM d)
            SELECT day, c / 100.0 AS revenue, p / 100.0 AS predicted,
                   round(abs(c - p) / c, 6) AS ape
            FROM l WHERE p IS NOT NULL ORDER BY day
        """,
        "events_welch_ttest": """
            WITH c AS (SELECT CASE WHEN isodow(ts) >= 6
                                   THEN 1 ELSE 0 END AS we,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 g AS (SELECT we, count(*)::BIGINT AS n,
                              sum(CAST(c AS HUGEINT)) AS s,
                              sum(CAST(c AS HUGEINT)*c) AS q
                       FROM c GROUP BY 1),
                 p AS (SELECT max(CASE WHEN we=0 THEN n END) AS n1,
                              max(CASE WHEN we=0 THEN s END) AS s1,
                              max(CASE WHEN we=0 THEN q END) AS q1,
                              max(CASE WHEN we=1 THEN n END) AS n2,
                              max(CASE WHEN we=1 THEN s END) AS s2,
                              max(CASE WHEN we=1 THEN q END) AS q2
                       FROM g),
                 f AS (SELECT n1, n2,
                              (1.0*s1)/n1/100.0 AS m1,
                              (1.0*s2)/n2/100.0 AS m2,
                              CAST(n1*q1 - s1*s1 AS DOUBLE)
                                / ((1.0*n1)*(n1-1.0)) / 10000.0 AS v1,
                              CAST(n2*q2 - s2*s2 AS DOUBLE)
                                / ((1.0*n2)*(n2-1.0)) / 10000.0 AS v2
                       FROM p WHERE n1 >= 2 AND n2 >= 2),
                 e AS (SELECT n1, n2, m1, m2, v1, v2,
                              v1/n1 AS se1, v2/n2 AS se2,
                              v1/n1 + v2/n2 AS ss
                       FROM f)
            SELECT n1 AS n_weekday, n2 AS n_weekend,
                   round((m1-m2)/sqrt(ss), 6) + 0 AS t_stat,
                   round((ss*ss) / (se1*se1/(n1-1.0)
                                    + se2*se2/(n2-1.0)), 6) + 0 AS df,
                   round((m1-m2)/sqrt(((n1-1.0)*v1 + (n2-1.0)*v2)
                                      /(n1+n2-2.0)), 6) + 0 AS cohens_d
            FROM e
        """,
        "purchase_rate_ztest": """
            WITH c AS (SELECT CASE WHEN isodow(ts) >= 6
                                   THEN 1 ELSE 0 END AS we,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS k
                       FROM events),
                 g AS (SELECT we, count(*)::BIGINT AS n,
                              sum(k)::BIGINT AS k
                       FROM c GROUP BY 1),
                 p AS (SELECT max(CASE WHEN we=0 THEN n END) AS n1,
                              max(CASE WHEN we=0 THEN k END) AS k1,
                              max(CASE WHEN we=1 THEN n END) AS n2,
                              max(CASE WHEN we=1 THEN k END) AS k2
                       FROM g),
                 f AS (SELECT n1, n2, k1, k2,
                              (1.0*k1)/n1 AS p1, (1.0*k2)/n2 AS p2,
                              (1.0*(k1+k2))/(n1+n2) AS pp
                       FROM p WHERE n1 > 0 AND n2 > 0)
            SELECT n1 AS n_weekday, n2 AS n_weekend,
                   k1 AS k_weekday, k2 AS k_weekend,
                   round(p1, 6) + 0 AS rate_weekday,
                   round(p2, 6) + 0 AS rate_weekend,
                   round((p1-p2)/sqrt(pp*(1.0-pp)*(1.0/n1 + 1.0/n2)), 6)
                     + 0 AS z_score
            FROM f WHERE pp > 0.0 AND pp < 1.0
        """,
        "daily_revenue_autocorr7": """
            WITH d AS (SELECT CAST(epoch_us(date_trunc('day',
                                  o_orderdate))/86400000000 AS BIGINT)
                                AS day,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT)) AS c
                       FROM orders GROUP BY 1),
                 p AS (SELECT a.c AS x, b.c AS y
                       FROM d a JOIN d b ON b.day = a.day + 7),
                 m AS (SELECT count(*)::BIGINT AS n,
                              sum(CAST(x AS HUGEINT)) AS sx,
                              sum(CAST(y AS HUGEINT)) AS sy,
                              sum(CAST(x AS HUGEINT)*y) AS sxy,
                              sum(CAST(x AS HUGEINT)*x) AS sxx,
                              sum(CAST(y AS HUGEINT)*y) AS syy
                       FROM p)
            SELECT n AS n_pairs,
                   round(CAST(n*sxy - sx*sy AS DOUBLE)
                         / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                                * CAST(n*syy - sy*sy AS DOUBLE)), 6)
                     + 0 AS autocorr
            FROM m WHERE n >= 2 AND n*sxx - sx*sx > 0
                  AND n*syy - sy*sy > 0
        """,
        "orders_benford": """
            WITH c AS (SELECT CAST(round(o_totalprice*100) AS BIGINT)
                                AS c
                       FROM orders
                       WHERE round(o_totalprice*100) > 0),
                 g AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1)
                                   AS BIGINT) AS digit,
                              count(*)::BIGINT AS n
                       FROM c GROUP BY 1),
                 t AS (SELECT sum(n)::BIGINT AS tot FROM g)
            SELECT digit, n,
                   round((1.0*n)/tot, 6) AS share,
                   round(ln(1.0 + 1.0/digit)/ln(10.0), 6) AS benford
            FROM g, t ORDER BY digit
        """,
        "customer_spend_gini": """
            WITH s AS (SELECT o_custkey,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT)) AS x
                       FROM orders GROUP BY 1),
                 w AS (SELECT x, row_number() OVER (
                                  ORDER BY x, o_custkey) AS i
                       FROM s),
                 m AS (SELECT count(*)::BIGINT AS n,
                              sum(CAST(x AS HUGEINT)) AS t,
                              sum(CAST(i AS HUGEINT)*x) AS ix
                       FROM w)
            SELECT n AS n_customers,
                   round(CAST(2*ix - (n+1)*t AS DOUBLE)
                         / ((1.0*n)*CAST(t AS DOUBLE)), 6) + 0 AS gini
            FROM m WHERE n > 0 AND t > 0
        """,
        "docs_orc_roundtrip": """
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars,
                   lpad(to_hex(bit_xor(md5_number_lower(text))), 16, '0')
                     AS checksum
            FROM documents GROUP BY source ORDER BY source
        """,
        "daily_revenue_ewma14": """
            WITH d AS (SELECT CAST(epoch_us(date_trunc('day',
                                  o_orderdate))/86400000000 AS BIGINT)
                                AS day,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT)) AS c
                       FROM orders GROUP BY 1),
                 j AS (SELECT a.day AS day,
                              sum(CAST(b.c AS HUGEINT)
                                  * CAST(round(power(9.0, a.day - b.day))
                                         AS HUGEINT)
                                  * CAST(round(power(10.0,
                                            13 - (a.day - b.day)))
                                         AS HUGEINT)) AS num,
                              sum(CAST(round(power(9.0, a.day - b.day))
                                       AS HUGEINT)
                                  * CAST(round(power(10.0,
                                            13 - (a.day - b.day)))
                                         AS HUGEINT)) AS den
                       FROM d a JOIN d b
                         ON b.day BETWEEN a.day - 13 AND a.day
                       GROUP BY 1)
            SELECT make_timestamp(day * 86400000000) AS day,
                   round(CAST(num AS DOUBLE)/CAST(den AS DOUBLE)/100.0,
                         6) AS ewma
            FROM j ORDER BY day
        """,
        "user_active_streaks": """
            WITH d AS (SELECT DISTINCT user_id,
                              CAST(epoch_us(date_trunc('day', ts))
                                   /86400000000 AS BIGINT) AS day
                       FROM events),
                 s AS (SELECT user_id, day,
                              day - row_number() OVER (
                                  PARTITION BY user_id ORDER BY day)
                                AS anch
                       FROM d),
                 r AS (SELECT user_id, count(*)::BIGINT AS len
                       FROM s GROUP BY user_id, anch),
                 m AS (SELECT user_id, max(len) AS max_streak
                       FROM r GROUP BY 1)
            SELECT max_streak::BIGINT AS max_streak,
                   count(*)::BIGINT AS n_users
            FROM m GROUP BY 1 ORDER BY 1
        """,
        "daily_revenue_rolling_median7": """
            WITH d AS (SELECT CAST(epoch_us(date_trunc('day',
                                  o_orderdate))/86400000000 AS BIGINT)
                                AS day,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT)) AS c
                       FROM orders GROUP BY 1),
                 w AS (SELECT day, median(c) OVER (ORDER BY day
                                  ROWS BETWEEN 6 PRECEDING
                                  AND CURRENT ROW) AS m
                       FROM d)
            SELECT make_timestamp(day * 86400000000) AS day,
                   round(m / 100.0, 6) AS median7
            FROM w ORDER BY day
        """,
        "customer_spend_theil": """
            WITH s AS (SELECT o_custkey,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT)) AS x
                       FROM orders GROUP BY 1),
                 m AS (SELECT count(*)::BIGINT AS n,
                              sum(CAST(x AS HUGEINT)) AS t
                       FROM s WHERE x > 0)
            SELECT n AS n_customers,
                   round(sum((x/100.0)/((1.0*t)/n/100.0)
                             * ln((x/100.0)/((1.0*t)/n/100.0)))
                         / n, 6) + 0 AS theil_t
            FROM s, m WHERE x > 0 GROUP BY n
        """,
        "part_token_assortativity": """
            WITH tk AS (SELECT p_partkey pk,
                               unnest(string_split(p_name, ' ')) tok
                        FROM part),
                 d AS (SELECT DISTINCT pk, tok FROM tk),
                 e AS (SELECT DISTINCT a.tok u, b.tok v
                       FROM d a JOIN d b
                         ON a.pk = b.pk AND a.tok < b.tok),
                 de AS (SELECT u, v FROM e
                        UNION ALL SELECT v, u FROM e),
                 deg AS (SELECT u AS s, count(*)::BIGINT dg
                         FROM de GROUP BY 1),
                 m AS (SELECT count(*)::BIGINT n,
                              sum(CAST(du.dg AS HUGEINT)) sx,
                              sum(CAST(du.dg AS HUGEINT)*dv.dg) sxy,
                              sum(CAST(du.dg AS HUGEINT)*du.dg) sxx
                       FROM de JOIN deg du ON du.s = de.u
                               JOIN deg dv ON dv.s = de.v),
                 v AS (SELECT count(DISTINCT tok)::BIGINT AS n_tokens
                       FROM tk)
            SELECT v.n_tokens, n/2 AS n_edges,
                   round(CAST(n*sxy - sx*sx AS DOUBLE)
                         / (CASE WHEN n*sxx - sx*sx > 0
                            THEN CAST(n*sxx - sx*sx AS DOUBLE)
                            ELSE NULL END), 6) + 0 AS assortativity
            FROM m, v WHERE n > 0
        """,
        "brand_weighted_median_price": """
            WITH j AS (SELECT p_brand brand,
                              CAST(round(l_extendedprice*100) AS BIGINT)
                                AS c,
                              CAST(round(l_quantity) AS BIGINT) AS w
                       FROM lineitem
                       JOIN part ON p_partkey = l_partkey),
                 g AS (SELECT brand, c, sum(w)::BIGINT w
                       FROM j GROUP BY 1, 2),
                 cw AS (SELECT brand, c,
                               CAST(sum(w) OVER (PARTITION BY brand
                                   ORDER BY c
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                                 AS cum,
                               CAST(sum(w) OVER (PARTITION BY brand)
                                    AS BIGINT) AS tot
                        FROM g),
                 p AS (SELECT brand, min(c) AS mc
                       FROM cw WHERE 2*cum >= tot GROUP BY brand)
            SELECT brand, mc/100.0 AS wmedian FROM p ORDER BY brand
        """,
        "nation_type_simpson": """
            WITH j AS (SELECT s_nationkey nk, p_type tp
                       FROM lineitem
                       JOIN part ON p_partkey = l_partkey
                       JOIN supplier ON s_suppkey = l_suppkey),
                 g AS (SELECT nk, tp, count(*)::BIGINT n
                       FROM j GROUP BY 1, 2),
                 m AS (SELECT nk, sum(CAST(n AS HUGEINT)) t,
                              sum(CAST(n AS HUGEINT)*n) sq,
                              count(*)::BIGINT k
                       FROM g GROUP BY 1)
            SELECT nk::BIGINT AS nationkey, k AS n_types,
                   round(CAST(t*t - sq AS DOUBLE)
                         / ((1.0*t)*(1.0*t)), 6) + 0 AS simpson
            FROM m ORDER BY nk
        """,
        "events_hour_of_week": """
            WITH c AS (SELECT isodow(ts) AS dow, hour(ts) AS hr,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events)
            SELECT dow::BIGINT AS dow, hr::BIGINT AS hr,
                   count(*)::BIGINT AS n,
                   round((1.0*sum(c))/count(*)/100.0, 6) AS avg_value
            FROM c GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_value_psi": """
            WITH b0 AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts)))
                                 // 2 AS mid
                        FROM events),
                 c AS (SELECT CASE WHEN epoch_us(ts) <
                                       (SELECT mid FROM b0)
                                   THEN 1 ELSE 2 END AS half,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
                 q AS (SELECT quantile_disc(c, [0.1,0.2,0.3,0.4,0.5,
                                                0.6,0.7,0.8,0.9]) AS qs
                       FROM c WHERE half = 1),
                 t AS (SELECT half,
                              list_sum(list_transform(
                                  (SELECT qs FROM q),
                                  x -> CAST(c > x AS BIGINT)))::BIGINT
                                AS bucket
                       FROM c),
                 g AS (SELECT bucket,
                              sum(CASE WHEN half=1 THEN 1 ELSE 0
                                  END)::BIGINT n1,
                              sum(CASE WHEN half=2 THEN 1 ELSE 0
                                  END)::BIGINT n2
                       FROM t GROUP BY 1),
                 n AS (SELECT sum(n1)::BIGINT tn1, sum(n2)::BIGINT tn2
                       FROM g)
            SELECT bucket, n1, n2,
                   round(((1.0*n2)/tn2 - (1.0*n1)/tn1)
                         * ln(((1.0*n2)/tn2)/((1.0*n1)/tn1)), 6) + 0
                     AS psi_term
            FROM g, n WHERE n1 > 0 AND n2 > 0 ORDER BY bucket
        """,
        "user_purchase_mcnemar": """
            WITH u AS (SELECT user_id,
                              max(CASE WHEN event_type = 'purchase'
                                   AND isodow(ts) >= 6
                                   THEN 1 ELSE 0 END) p1,
                              max(CASE WHEN event_type = 'purchase'
                                   AND isodow(ts) < 6
                                   THEN 1 ELSE 0 END) p2
                       FROM events GROUP BY 1),
                 m AS (SELECT count(*)::BIGINT n,
                              sum(CASE WHEN p1=1 AND p2=0
                                  THEN 1 ELSE 0 END)::BIGINT b,
                              sum(CASE WHEN p1=0 AND p2=1
                                  THEN 1 ELSE 0 END)::BIGINT c
                       FROM u)
            SELECT n AS n_users, b AS b_weekend_only,
                   c AS c_weekday_only,
                   round(CAST((b-c)*(b-c) AS DOUBLE)/(1.0*(b+c)), 6)
                     + 0 AS chi2
            FROM m WHERE b + c > 0
        """,
        "user_activity_powerlaw_alpha": """
            WITH g AS (SELECT user_id, count(*)::BIGINT n
                       FROM events GROUP BY 1),
                 m AS (SELECT count(*)::BIGINT nu, sum(ln(n / 0.5)) s
                       FROM g)
            SELECT nu AS n_users, round(1.0 + (1.0*nu)/s, 6) AS alpha
            FROM m WHERE s > 0
        """,
        "events_key_skew_report": """
            WITH g AS (SELECT user_id, count(*)::BIGINT n
                       FROM events GROUP BY 1),
                 t AS (SELECT sum(n)::BIGINT tot, count(*)::BIGINT nk
                       FROM g),
                 w AS (SELECT user_id, n, row_number() OVER (
                                  ORDER BY n DESC, user_id) rn
                       FROM g)
            SELECT user_id, n, round((1.0*n)/tot, 6) AS share,
                   round((1.0*n)/((1.0*tot)/nk), 6) AS skew_ratio
            FROM w, t WHERE rn <= 10 ORDER BY n DESC, user_id
        """,
        "nation_seat_allocation": """
            WITH r AS (SELECT s_nationkey nk,
                              sum(""" + _REV_C_SQL + """)::BIGINT rev
                       FROM lineitem
                       JOIN supplier ON s_suppkey = l_suppkey
                       GROUP BY 1),
                 t AS (SELECT sum(CAST(rev AS HUGEINT)) tot FROM r),
                 q AS (SELECT nk,
                              CAST(rev AS HUGEINT)*100 // tot AS base,
                              CAST(rev AS HUGEINT)*100 % tot AS rem
                       FROM r, t WHERE tot > 0),
                 l AS (SELECT 100 - sum(base) AS left_ FROM q),
                 w AS (SELECT nk, base, row_number() OVER (
                                  ORDER BY rem DESC, nk) rn
                       FROM q)
            SELECT nk::BIGINT AS nationkey,
                   (base + CASE WHEN rn <= (SELECT left_ FROM l)
                           THEN 1 ELSE 0 END)::BIGINT AS seats
            FROM w ORDER BY nk
        """,
        "part_token_pmi": """
            WITH tk AS (SELECT p_partkey pk,
                               unnest(string_split(p_name, ' ')) tok
                        FROM part),
                 d AS (SELECT DISTINCT pk, tok FROM tk),
                 e AS (SELECT a.tok t1, b.tok t2, count(*)::BIGINT cab
                       FROM d a JOIN d b
                         ON a.pk = b.pk AND a.tok < b.tok
                       GROUP BY 1, 2),
                 c AS (SELECT tok, count(*)::BIGINT cn FROM d
                       GROUP BY 1),
                 np AS (SELECT count(*)::BIGINT n FROM part)
            SELECT t1, t2, cab AS n_both,
                   round(ln(CAST(n*cab AS DOUBLE)
                            /((1.0*ca.cn)*cb.cn)), 6) + 0 AS pmi
            FROM e JOIN c ca ON ca.tok = e.t1
                   JOIN c cb ON cb.tok = e.t2, np
            WHERE cab >= 5 ORDER BY t1, t2
        """,
        "docs_extract_numbers": """
            WITH x AS (SELECT source,
                              regexp_extract_all(text, '[0-9]{1,9}')
                                AS hits
                       FROM documents)
            SELECT source, sum(len(hits))::BIGINT AS n_matches,
                   sum(COALESCE(list_sum(list_transform(hits,
                       h -> CAST(h AS BIGINT))), 0))::BIGINT AS total
            FROM x GROUP BY source ORDER BY source
        """,
        "events_join_size_stat": """
            WITH b0 AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts)))
                                 // 2 AS mid
                        FROM events),
                 g AS (SELECT user_id,
                              sum(CASE WHEN epoch_us(ts) <
                                       (SELECT mid FROM b0)
                                  THEN 1 ELSE 0 END)::BIGINT c1,
                              sum(CASE WHEN epoch_us(ts) >=
                                       (SELECT mid FROM b0)
                                  THEN 1 ELSE 0 END)::BIGINT c2
                       FROM events GROUP BY 1)
            SELECT sum(c1)::BIGINT AS n_h1, sum(c2)::BIGINT AS n_h2,
                   sum(CAST(c1 AS HUGEINT)*c2)::BIGINT AS join_rows
            FROM g
        """,
        "daily_revenue_volatility": """
            WITH d AS (SELECT CAST(epoch_us(date_trunc('day',
                                  o_orderdate))/86400000000 AS BIGINT)
                                AS day,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT)) AS c
                       FROM orders GROUP BY 1),
                 s AS (SELECT day, c,
                              lead(day) OVER (ORDER BY day) nd,
                              lead(c) OVER (ORDER BY day) nc
                       FROM d),
                 r AS (SELECT ln((1.0*nc)/c) lr FROM s
                       WHERE nd = day + 1),
                 m AS (SELECT count(*)::BIGINT n, sum(lr) sl FROM r),
                 v AS (SELECT n, sl/n AS mu FROM m WHERE n >= 2)
            SELECT n AS n_returns, round(mu, 6) + 0 AS mean_logret,
                   round(sqrt((SELECT sum((lr - v.mu)*(lr - v.mu))
                               FROM r) / (n - 1.0)), 6) + 0
                     AS std_logret
            FROM v
        """,
        "customer_top1pct_share": """
            WITH s AS (SELECT o_custkey,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT)) AS x
                       FROM orders GROUP BY 1),
                 w AS (SELECT x, row_number() OVER (
                                  ORDER BY x DESC, o_custkey) rn
                       FROM s),
                 m AS (SELECT count(*)::BIGINT n,
                              sum(CAST(x AS HUGEINT)) t
                       FROM w),
                 k AS (SELECT n, t, (n + 99) // 100 AS k FROM m),
                 tp AS (SELECT sum(CAST(x AS HUGEINT)) top
                        FROM w, k WHERE rn <= k.k)
            SELECT k.n AS n_customers, k.k AS k_top,
                   round(CAST(tp.top AS DOUBLE)/CAST(k.t AS DOUBLE),
                         6) AS top_share
            FROM k, tp WHERE k.n > 0 AND k.t > 0
        """,
        "orders_seasonal_index": """
            WITH c AS (SELECT month(o_orderdate) m,
                              CAST(round(o_totalprice*100) AS BIGINT) c
                       FROM orders),
                 g AS (SELECT m, count(*)::BIGINT n, sum(c)::BIGINT s
                       FROM c GROUP BY 1),
                 t AS (SELECT sum(n)::BIGINT nt, sum(s)::BIGINT st
                       FROM g)
            SELECT m::BIGINT AS month, n,
                   round((1.0*s)/n/100.0, 6) AS avg_price,
                   round(((1.0*s)/n/100.0)/((1.0*st)/nt/100.0), 6)
                     AS seasonal_index
            FROM g, t ORDER BY m
        """,
        "nation_top_supplier_share": """
            WITH r AS (SELECT s_nationkey nk, l_suppkey sk,
                              sum(""" + _REV_C_SQL + """)::BIGINT rev
                       FROM lineitem
                       JOIN supplier ON s_suppkey = l_suppkey
                       GROUP BY 1, 2),
                 w AS (SELECT nk, sk, rev,
                              row_number() OVER (PARTITION BY nk
                                  ORDER BY rev DESC, sk) rn,
                              sum(CAST(rev AS HUGEINT)) OVER (
                                  PARTITION BY nk) tot
                       FROM r)
            SELECT nk::BIGINT AS nationkey, sk AS top_suppkey,
                   round(CAST(rev AS DOUBLE)/CAST(tot AS DOUBLE), 6)
                     AS share
            FROM w WHERE rn = 1 AND tot > 0 ORDER BY nk
        """,
        "daily_revenue_acf": """
            WITH d AS (SELECT CAST(epoch_us(date_trunc('day',
                                  o_orderdate))/86400000000 AS BIGINT)
                                AS day,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT)) AS c
                       FROM orders GROUP BY 1),
                 l AS (SELECT unnest(generate_series(1, 14)) AS lag),
                 p AS (SELECT l.lag, a.c x, b.c y
                       FROM d a CROSS JOIN l
                       JOIN d b ON b.day = a.day + l.lag),
                 m AS (SELECT lag, count(*)::BIGINT n,
                              sum(CAST(x AS HUGEINT)) sx,
                              sum(CAST(y AS HUGEINT)) sy,
                              sum(CAST(x AS HUGEINT)*y) sxy,
                              sum(CAST(x AS HUGEINT)*x) sxx,
                              sum(CAST(y AS HUGEINT)*y) syy
                       FROM p GROUP BY 1)
            SELECT lag::BIGINT AS lag, n AS n_pairs,
                   round(CAST(n*sxy - sx*sy AS DOUBLE)
                         / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                                * CAST(n*syy - sy*sy AS DOUBLE)), 6)
                     + 0 AS acf
            FROM m WHERE n >= 2 AND n*sxx - sx*sx > 0
                  AND n*syy - sy*sy > 0
            ORDER BY lag
        """,
        "daily_revenue_theilsen": """
            WITH d AS (SELECT CAST(epoch_us(date_trunc('day',
                                  o_orderdate))/86400000000 AS BIGINT)
                                AS day,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT)) AS c
                       FROM orders GROUP BY 1),
                 p AS (SELECT CAST(b.c - a.c AS DOUBLE)/(b.day - a.day)
                                AS slope
                       FROM d a JOIN d b ON b.day > a.day)
            SELECT (SELECT count(*) FROM d)::BIGINT AS n_days,
                   count(*)::BIGINT AS n_pairs,
                   round(quantile_cont(slope, 0.5), 6) + 0 AS slope
            FROM p
        """,
        "daily_revenue_mann_kendall": """
            WITH d AS (SELECT CAST(epoch_us(date_trunc('day',
                                  o_orderdate))/86400000000 AS BIGINT)
                                AS day,
                              sum(CAST(round(o_totalprice*100)
                                       AS BIGINT)) AS c
                       FROM orders GROUP BY 1),
                 s_ AS (SELECT coalesce(sum(CASE WHEN b.c > a.c THEN 1
                                     WHEN b.c < a.c THEN -1
                                     ELSE 0 END), 0)::BIGINT AS s
                        FROM d a JOIN d b ON b.day > a.day),
                 t AS (SELECT count(*)::HUGEINT AS cnt
                       FROM d GROUP BY c),
                 v AS (SELECT coalesce(sum(cnt*(cnt-1)*(2*cnt+5)), 0)
                                AS corr
                       FROM t WHERE cnt > 1),
                 nn AS (SELECT count(*)::HUGEINT AS n FROM d)
            SELECT n::BIGINT AS n_days, s AS s_stat,
                   round(CAST(n*(n-1)*(2*n+5) - corr AS DOUBLE)/18.0, 6)
                     AS var_s,
                   CASE WHEN n*(n-1)*(2*n+5) - corr > 0 THEN
                     round(CASE WHEN s > 0 THEN (s-1)/sqrt(
                             CAST(n*(n-1)*(2*n+5) - corr AS DOUBLE)/18.0)
                           WHEN s < 0 THEN (s+1)/sqrt(
                             CAST(n*(n-1)*(2*n+5) - corr AS DOUBLE)/18.0)
                           ELSE 0.0 END, 6) + 0
                   ELSE NULL END AS z
            FROM nn, s_, v
        """,
        "orders_new_vs_repeat_revenue": """
            WITH f AS (SELECT o_custkey AS ck, min(o_orderdate) AS fd
                       FROM orders GROUP BY 1)
            SELECT (year(o_orderdate)*100 + month(o_orderdate))::BIGINT
                     AS month,
                   (CASE WHEN o_orderdate = fd THEN 1
                         ELSE 0 END)::BIGINT AS is_new,
                   count(*)::BIGINT AS n_orders,
                   CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                        AS DOUBLE)/100.0 AS revenue
            FROM orders JOIN f ON ck = o_custkey
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "lineitem_multiregr": """
            WITH b AS (SELECT CAST(round(l_quantity) AS HUGEINT) x1,
                              CAST(round(l_discount*100) AS HUGEINT) x2,
                              CAST(round(l_extendedprice*100)
                                   AS HUGEINT)//100 y
                       FROM lineitem),
                 m AS (SELECT count(*)::HUGEINT n, sum(x1) sx1,
                              sum(x2) sx2, sum(y) sy,
                              sum(x1*x1) sx1x1, sum(x2*x2) sx2x2,
                              sum(x1*x2) sx1x2, sum(x1*y) sx1y,
                              sum(x2*y) sx2y
                       FROM b),
                 c AS (SELECT n, sx1, sx2, sy,
                              n*sx1x1 - sx1*sx1 AS s11,
                              n*sx2x2 - sx2*sx2 AS s22,
                              n*sx1x2 - sx1*sx2 AS s12,
                              n*sx1y - sx1*sy AS s1y,
                              n*sx2y - sx2*sy AS s2y
                       FROM m),
                 k AS (SELECT n, sx1, sx2, sy,
                              s11*s22 - s12*s12 AS det,
                              CASE WHEN s11*s22 - s12*s12 = 0 THEN NULL
                                ELSE (CAST(s22 AS DOUBLE)*s1y
                                      - CAST(s12 AS DOUBLE)*s2y)
                                     /(s11*s22 - s12*s12) END AS b1,
                              CASE WHEN s11*s22 - s12*s12 = 0 THEN NULL
                                ELSE (CAST(s11 AS DOUBLE)*s2y
                                      - CAST(s12 AS DOUBLE)*s1y)
                                     /(s11*s22 - s12*s12) END AS b2
                       FROM c)
            SELECT n::BIGINT AS n,
                   round((CAST(sy AS DOUBLE) - b1*sx1 - b2*sx2)/n, 6)
                     + 0 AS b0,
                   round(b1, 6) + 0 AS b_qty,
                   round(b2, 6) + 0 AS b_disc
            FROM k
        """,
        "linkage_fs_weights": """
            WITH pr AS (SELECT p_partkey, p_name, p_brand, p_type,
                               p_size,
                               CAST(round(p_retailprice*100) AS BIGINT)
                                 AS c
                        FROM part),
                 pairs AS (SELECT CASE WHEN jaccard(a.p_name, b.p_name)
                                            >= 0.8
                                       THEN 1 ELSE 0 END AS m,
                                  CASE WHEN a.p_brand = b.p_brand
                                       THEN 1 ELSE 0 END AS f1,
                                  CASE WHEN a.p_type = b.p_type
                                       THEN 1 ELSE 0 END AS f2,
                                  CASE WHEN abs(a.c - b.c) <= 5000
                                       THEN 1 ELSE 0 END AS f3
                           FROM pr a JOIN pr b
                             ON a.p_size = b.p_size
                            AND a.p_partkey < b.p_partkey),
                 agg AS (
                   SELECT 'same_brand' AS feature,
                          sum(m*f1)::BIGINT ma, sum(m)::BIGINT nm,
                          sum((1-m)*f1)::BIGINT ua,
                          sum(1-m)::BIGINT nu
                   FROM pairs
                   UNION ALL
                   SELECT 'same_type', sum(m*f2)::BIGINT,
                          sum(m)::BIGINT, sum((1-m)*f2)::BIGINT,
                          sum(1-m)::BIGINT
                   FROM pairs
                   UNION ALL
                   SELECT 'price_within_50', sum(m*f3)::BIGINT,
                          sum(m)::BIGINT, sum((1-m)*f3)::BIGINT,
                          sum(1-m)::BIGINT
                   FROM pairs)
            SELECT feature, nm AS n_match, nu AS n_nonmatch,
                   CASE WHEN nm > 0
                        THEN round(CAST(ma AS DOUBLE)/nm, 6) + 0
                        ELSE NULL END AS m_prob,
                   CASE WHEN nu > 0
                        THEN round(CAST(ua AS DOUBLE)/nu, 6) + 0
                        ELSE NULL END AS u_prob,
                   CASE WHEN ma > 0 AND ua > 0 AND nm > 0 AND nu > 0
                        THEN round(log2((CAST(ma AS DOUBLE)*nu)
                                        /(CAST(ua AS DOUBLE)*nm)), 6)
                             + 0
                        ELSE NULL END AS w_agree,
                   CASE WHEN nm - ma > 0 AND nu - ua > 0
                        THEN round(log2((CAST(nm - ma AS DOUBLE)*nu)
                                        /(CAST(nu - ua AS DOUBLE)*nm)),
                                   6) + 0
                        ELSE NULL END AS w_disagree
            FROM agg ORDER BY feature
        """,
        # extract_pages / link_frequencies / most_popular_candidates /
        # linkage_clusters / entity_linking / linking_eval_counts /
        # dedup_minhash / dedup_simhash (sketch-derived), knn_ivf
        # (approximate by construction), multimodal_features /
        # multimodal_audio_energy / multimodal_frame_sample (stub
        # decoders), part_supplier_kcore (iterative fixpoint),
        # blocking_quality (sketch-derived metrics), doc_zlib_ratio
        # (zlib has no SQL equivalent): rows-only checks; semantics
        # covered by the pytest differential suite.
    }
