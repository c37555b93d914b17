"""Small shared stage helpers."""

from __future__ import annotations

# Per-worker-process cache for broadcast side data (see cached_get).
_BCAST_CACHE: dict = {}


def scale_cutoff(default: int) -> int:
    """Broadcast/driver-short-circuit size cutoff in bytes.

    ``ELEVANT_RAY_BROADCAST_CUTOFF`` overrides every small-side
    broadcast / driver-combine decision at once — set it to 0 to force
    the distributed fallback paths (hash-partitioned joins, Dataset
    sorts, shuffle groupbys: the 100 TB code paths) on small data; the
    conformance tests do exactly that."""
    import os

    v = os.environ.get("ELEVANT_RAY_BROADCAST_CUTOFF")
    return int(v) if v is not None and v != "" else default


def cached_get(ref):
    """Per-worker-process memoized ``ray.get`` for broadcast side data.

    ``ray.get`` of a pickled Python object (dict/set/Counter) re-runs the
    unpickle on EVERY call; a map stage that consults a broadcast dict per
    batch pays that deserialization hundreds of times per worker, and for
    a multi-MB dict it dominates the stage.  One deserialized copy per
    worker process is the engine's analog of the reference's forkserver
    copy-on-write preload (link_text.py:83-84).  Numpy arrays don't need
    this (plasma zero-copy); plain ``ray.get`` is fine for those.

    The cache is keyed by object-ref hex and intentionally unbounded:
    broadcast objects are few and live for the job anyway (their plasma
    copy is pinned by the driver-held ref)."""
    import ray

    key = ref.hex()
    v = _BCAST_CACHE.get(key)
    if v is None:
        v = _BCAST_CACHE[key] = ray.get(ref)
    return v


class IntKeyMap:
    """Vectorized broadcast lookup table for integer keys.

    The scale-correct form of the "ship a Python dict with ray.put,
    probe it per row" broadcast join: keys are sorted into one int64
    numpy array and values dictionary-encoded into parallel numpy
    arrays, all shipped via ``ray.put`` (numpy → plasma, zero-copy on
    every ``ray.get``, no per-batch unpickle), and probed per batch
    with ONE ``np.searchsorted`` instead of a Python loop.  String
    values are encoded as int32 codes + a small vocab list.

    Driver side: ``IntKeyMap(keys, values)``; worker side inside a
    map_batches fn: ``vals, mask = m.take(probe)`` / ``m.contains(p)``.
    Instances hold only object refs, so closures capturing them stay
    tiny."""

    def __init__(self, keys, values=None):
        import numpy as np
        import ray

        keys = np.asarray(keys, dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        self._keys = ray.put(keys[order])
        self._vocab = None
        self._vals = None
        if values is not None:
            values = np.asarray(values)
            values = values[order]
            if values.dtype.kind in ("O", "U", "S"):
                vocab, codes = np.unique(values, return_inverse=True)
                self._vocab = [str(v) for v in vocab.tolist()]
                self._vals = ray.put(codes.astype(np.int32))
            else:
                self._vals = ray.put(values)

    def _probe(self, probe):
        import numpy as np
        import ray

        keys = ray.get(self._keys)
        probe = np.asarray(probe, dtype=np.int64)
        pos = np.searchsorted(keys, probe)
        pos_c = np.minimum(pos, len(keys) - 1) if len(keys) else pos
        found = (keys[pos_c] == probe) if len(keys) else \
            np.zeros(len(probe), dtype=bool)
        return pos_c, found

    def contains(self, probe):
        """bool mask: probe key present."""
        return self._probe(probe)[1]

    def take(self, probe):
        """(values, found_mask); missing keys get an arbitrary value —
        mask before use, or use ``take_checked`` to assert totality."""
        import numpy as np
        import ray

        pos, found = self._probe(probe)
        vals_arr = ray.get(self._vals)
        if len(vals_arr) == 0:
            # empty build side: honor the mask-before-use contract
            # instead of indexing a 0-length array
            if self._vocab is not None:
                return np.full(len(pos), "", dtype=object), found
            return np.zeros(len(pos), dtype=vals_arr.dtype), found
        codes = vals_arr[pos]
        if self._vocab is not None:
            return np.asarray(self._vocab, dtype=object)[codes], found
        return codes, found

    def take_checked(self, probe):
        vals, found = self.take(probe)
        if not found.all():
            raise KeyError("IntKeyMap probe misses %d keys"
                           % int((~found).sum()))
        return vals


def np_columns(ds, cols):
    """Materialize selected columns of a SMALL Dataset to driver numpy
    arrays (streamed per batch — no per-row Python dicts like
    ``take_all``).  For broadcast-side dims under the 64 MB cutoff
    only; big tables stay distributed."""
    import numpy as np

    parts = {c: [] for c in cols}
    for b in ds.iter_batches(batch_format="pyarrow"):
        for c in cols:
            parts[c].append(b.column(c).to_numpy(zero_copy_only=False))
    return {c: (np.concatenate(v) if v else np.array([]))
            for c, v in parts.items()}


def as_arrow(ds):
    """Coerce a Dataset's blocks to Arrow format.

    ``map_groups(batch_format="pandas")`` leaves pandas blocks behind;
    several downstream ops (rename_columns, hash joins) expect Arrow
    blocks.  An identity map_batches with batch_format="pyarrow" converts
    once, streaming."""
    return ds.map_batches(lambda b: b, batch_format="pyarrow")


def hash_bucket_array(col, buckets: int):
    """Vectorized stable hash-bucket of a key column (Knuth multiplicative
    fast path for ints, crc32-of-utf8 otherwise) → int32 Arrow array."""
    import zlib

    import numpy as np
    import pyarrow as pa

    if pa.types.is_integer(col.type) and col.null_count == 0:
        # null-free gate: a nullable int column materializes as float64
        # with NaN, where keys above 2^53 round — the same key would
        # bucket differently in null-containing vs null-free batches
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array(((v * np.uint64(2654435761)) % np.uint64(buckets))
                        .astype(np.int32))
    return pa.array(
        [zlib.crc32(str(v).encode("utf-8")) % buckets
         for v in col.to_pylist()],
        pa.int32())


def bucketed_group_apply(ds, key: str, per_bucket, buckets: int = 64,
                         parallelism: int = None):
    """One hash shuffle on ``bucket(key)``; ``per_bucket(df)`` then runs
    once per bucket over the concatenated rows of MANY whole key groups
    and must implement the per-key logic vectorized (pandas groupby /
    sort + drop_duplicates / composite-key searchsorted).

    Replaces ``ds.groupby(key).map_groups(per_key_fn)`` wherever key
    cardinality is high: map_groups pays a Python call + block slice +
    format conversion PER KEY, which dominates wall time once there are
    more than a few thousand groups.  Co-location guarantee is the same
    (a key's rows all hash to one bucket); raise ``buckets`` if a bucket
    outgrows a worker's heap.

    ``parallelism``: shuffle partition count.  The groupby inherits
    the INPUT's block count, so a compute-heavy ``per_bucket`` fed by
    a few-block read (small dimension table under the size-capped
    reader) serializes onto those few slots — callers whose group
    compute dominates should pass the cluster's slot count.  Only set
    it for bounded inputs (dimension tables): on corpus-scale inputs
    a fixed repartition would COALESCE, not spread."""
    import pandas as pd
    import pyarrow as pa

    def add_bkt(b: pa.Table) -> pa.Table:
        return b.append_column("bkt", hash_bucket_array(b.column(key), buckets))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return per_bucket(g.drop(columns=["bkt"]))

    keyed = ds.map_batches(add_bkt, batch_format="pyarrow")
    if parallelism:
        keyed = keyed.repartition(parallelism)
    return keyed.groupby("bkt").map_groups(run, batch_format="pandas")


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
    Precondition: grouping keys must be non-null (``count_alias``
    counts the first key column, so a null-key group would report 0).
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
    if combine == "auto":
        # size-gated driver combine with the distributed path as the
        # scale fallback: materialize the partials (cheap — already
        # reduced to ≤ batches × groups rows), stream them to the
        # driver when they fit the broadcast cutoff, else run the
        # distributed combine and stream its (group-bounded) result.
        # Either way the caller gets a pandas frame; the conformance
        # suite forces the fallback via ELEVANT_RAY_BROADCAST_CUTOFF=0.
        m = partials.materialize()
        if m.size_bytes() <= scale_cutoff(256 << 20):
            partials = m
            combine = "driver"
        else:
            import pandas as pd

            final_aggs = [Sum(c, alias_name=c) for c in sum_cols]
            final_aggs += [Max(c, alias_name=c) for c in max_cols]
            final_aggs += [Min(c, alias_name=c) for c in min_cols]
            if count_alias:
                final_aggs.append(Sum(count_alias,
                                      alias_name=count_alias))
            gb = (m.groupby(keys, num_partitions=num_partitions)
                  if num_partitions else m.groupby(keys))
            parts = [b.to_pandas() for b in gb.aggregate(*final_aggs)
                     .iter_batches(batch_format="pyarrow")]
            if parts:
                return (pd.concat(parts, ignore_index=True)
                        .sort_values(keys).reset_index(drop=True))
            partials = m          # empty input: typed-empty via driver path
            combine = "driver"
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
            # empty input: a typed empty frame with the full output
            # column set, so callers' selects / rounds / sorts still work
            out_cols = {k: pd.Series([], dtype="object") for k in keys}
            for c in (*sum_cols, *max_cols, *min_cols):
                out_cols[c] = pd.Series([], dtype="float64")
            if count_alias:
                out_cols[count_alias] = pd.Series([], dtype="int64")
            return pd.DataFrame(out_cols)
        spec = {c: "sum" for c in sum_cols}
        spec.update({c: "max" for c in max_cols})
        spec.update({c: "min" for c in min_cols})
        if count_alias:
            spec[count_alias] = "sum"
        # dropna=False: a null-key group must survive the combine the
        # same way the distributed path keeps it (note the count
        # partial counts non-null keys[0], so fully-null-key groups
        # still need non-null keys — documented precondition)
        return (allp.groupby(keys, as_index=False, dropna=False)
                .agg(spec)
                .sort_values(keys).reset_index(drop=True))
    final_aggs = [Sum(c, alias_name=c) for c in sum_cols]
    final_aggs += [Max(c, alias_name=c) for c in max_cols]
    final_aggs += [Min(c, alias_name=c) for c in min_cols]
    if count_alias:
        final_aggs.append(Sum(count_alias, alias_name=count_alias))
    gb = (partials.groupby(keys, num_partitions=num_partitions)
          if num_partitions else partials.groupby(keys))
    return gb.aggregate(*final_aggs)


def cogroup_join(left, right, on, num_partitions: int = 8,
                 buckets: int = 64, left_schema=None, right_schema=None,
                 how: str = "inner"):
    """Equi-join as a tagged-union co-group: one hash-bucketed
    ``groupby`` shuffle + a LOCAL Acero hash join per bucket.

    Exists because Ray's ``Dataset.join`` is flaky on inputs containing
    empty blocks: the hash-shuffle sender short-circuits empty blocks
    (hash_shuffle.py `_shuffle_block`: `if block.num_rows == 0: return`)
    even when that task was the one designated to broadcast schemas to
    all partitions, so whether a join partition can build its (empty)
    table depends on task scheduling order — "No match or multiple
    matches for key field reference" at finalize.  The co-group costs
    the same single all-to-all, runs the actual join vectorized in C++
    inside each bucket, and is deterministic.

    ``on``: one key column name or a list (same names on both sides).
    ``how``: "inner", "left_outer", or "full_outer".  Payload column
    names must be disjoint (rename upstream).
    """
    import zlib

    import pyarrow as pa

    keys = [on] if isinstance(on, str) else list(on)
    acero_how = {"inner": "inner", "left_outer": "left outer",
                 "full_outer": "full outer"}[how]
    # ds.schema() on a lazy lineage triggers a sampling execution —
    # callers that know their schemas statically should pass them
    lschema = left_schema or left.schema().base_schema
    rschema = right_schema or right.schema().base_schema
    lcols = [c for c in lschema.names if c not in keys]
    rcols = [c for c in rschema.names if c not in keys]

    def bucket_col(batch: pa.Table) -> "pa.Array":
        if len(keys) == 1:
            # single-key fast path: vectorized hash, no per-row Python
            # on the join's hottest stage (both sides share this fn, so
            # co-location is unaffected)
            return hash_bucket_array(batch.column(keys[0]), buckets)
        cols = [batch.column(k).to_pylist() for k in keys]
        return pa.array(
            [zlib.crc32("\x00".join(str(v) for v in row).encode("utf-8"))
             % buckets for row in zip(*cols)],
            pa.int32())

    def tag(side_flag, own, other, other_schema):
        def f(b: pa.Table) -> pa.Table:
            cols = {"bkt": bucket_col(b),
                    "__side": pa.array([side_flag] * b.num_rows, pa.int8())}
            for k in keys:
                cols[k] = b.column(k)
            for c in own:
                cols[c] = b.column(c)
            for c in other:
                cols[c] = pa.nulls(b.num_rows, other_schema.field(c).type)
            return pa.table(cols)
        return f

    tagged = (left.map_batches(tag(0, lcols, rcols, rschema),
                               batch_format="pyarrow")
              .union(right.map_batches(tag(1, rcols, lcols, lschema),
                                       batch_format="pyarrow")))

    out_schema = pa.schema(
        [lschema.field(k) for k in keys]
        + [lschema.field(c) for c in lcols]
        + [rschema.field(c) for c in rcols])
    tag_schema = pa.schema(
        [pa.field("bkt", pa.int32()), pa.field("__side", pa.int8())]
        + list(out_schema))

    def merge(g: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        if g.num_rows == 0 or "__side" not in g.column_names:
            return out_schema.empty_table()
        # groups can arrive with all-null padding columns degraded to
        # null type (shuffle concat) — Acero rejects null-typed payload
        g = g.select(tag_schema.names).cast(tag_schema)
        mask = _pc.equal(g.column("__side"), pa.scalar(0, pa.int8()))
        l = g.filter(mask).select(keys + lcols)
        r = g.filter(_pc.invert(mask)).select(keys + rcols)
        if r.num_rows == 0 and how == "inner":
            return out_schema.empty_table()
        if l.num_rows == 0 and how == "inner":
            return out_schema.empty_table()
        joined = l.join(r, keys=keys, join_type=acero_how)
        return joined.select(out_schema.names).cast(out_schema)

    return tagged.groupby("bkt", num_partitions=num_partitions) \
        .map_groups(merge, batch_format="pyarrow")


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


def ntile_assign(sizes, ranks, tiles: int):
    """Exact SQL NTILE(tiles): 1-based tile for each row given its
    0-based rank within its partition and the partition size (both
    per-row arrays, so whole buckets of many partitions vectorize in
    one call).  SQL semantics: the first ``n % tiles`` tiles get one
    extra row; partitions smaller than ``tiles`` yield tiles 1..n."""
    import numpy as np

    sizes = np.asarray(sizes, dtype=np.int64)
    ranks = np.asarray(ranks, dtype=np.int64)
    q, rem = sizes // tiles, sizes % tiles
    boundary = rem * (q + 1)
    tile = np.where(ranks < boundary, ranks // (q + 1),
                    rem + (ranks - boundary) // np.maximum(q, 1))
    return (tile + 1).astype(np.int64)


def pearson_from_moments(n, sx, sy, sxy, sx2, sy2):
    """Pearson correlation closed from mergeable per-group moment sums
    (n, Σx, Σy, Σxy, Σx², Σy²) — the combine step of the distributed
    corr aggregate.  Degenerate groups (zero variance) → NaN, matching
    SQL corr()."""
    import numpy as np

    n = np.asarray(n, dtype=np.float64)
    sx, sy = np.asarray(sx, np.float64), np.asarray(sy, np.float64)
    sx2, sy2 = np.asarray(sx2, np.float64), np.asarray(sy2, np.float64)
    cov = n * np.asarray(sxy, np.float64) - sx * sy
    vx = n * sx2 - sx * sx
    vy = n * sy2 - sy * sy
    # n·Σx² − (Σx)² cancels catastrophically for (near-)constant groups:
    # clamp anything below the roundoff floor of its operands to true
    # zero variance so degenerate groups yield NaN, not float noise
    tol = 4 * np.finfo(np.float64).eps
    vx = np.where(vx <= tol * (n * np.abs(sx2) + sx * sx), 0.0, vx)
    vy = np.where(vy <= tol * (n * np.abs(sy2) + sy * sy), 0.0, vy)
    denom = np.sqrt(vx * vy)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(denom > 0, cov / denom, np.nan)


def key_range_buckets(ds, col: str, buckets: int = 256):
    """Fix equal-width key-range buckets for order-preserving
    partitioning: one streaming pass of per-batch (min, max) partials →
    driver reduce.  Returns ``(lo, width)`` — bucket id of key k is
    ``(k - lo) // width`` — or ``None`` for empty input.  Shared by the
    prefix-scan and islands-and-gaps operators (any algorithm that
    needs contiguous, ordered key ranges co-located)."""
    import numpy as np
    import pyarrow as pa

    def minmax(b: pa.Table) -> pa.Table:
        k = b.column(col).to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": [int(k.min())], "hi": [int(k.max())]})

    bounds = np_columns(ds.map_batches(minmax, batch_format="pyarrow"),
                        ["lo", "hi"])
    if len(bounds["lo"]) == 0:
        return None
    lo, hi = int(bounds["lo"].min()), int(bounds["hi"].max())
    return lo, max(1, (hi - lo + 1 + buckets - 1) // buckets)


def global_ordered_cumsum(ds, key: str, val: str, buckets: int = 256):
    """Exact global running sum of ``val`` in ``key`` order, without a
    global sort: the distributed prefix-scan primitive behind
    token-budget shard packing and any "cumulative position in the
    corpus" assignment.

    Three bounded passes over a two-column projection:
      1. min/max of ``key`` (per-batch partials → driver reduce) fixes
         equal-width key-range buckets;
      2. per-batch partial sums per bucket (map-side combine) → driver
         exclusive scan over ≤ ``buckets`` ordered bucket totals;
      3. one hash shuffle co-locating each bucket, then a vectorized
         in-bucket sort + cumsum, plus the bucket's scanned offset.

    No stage ever materializes more than the bucket totals on the
    driver, and the one shuffle moves each row once — unlike a global
    ``Dataset.sort`` + per-block scan, which pays a range exchange AND
    needs block-index bookkeeping.  Requires unique integer keys (ties
    would make "sum of all earlier rows" ambiguous).  Returns a Dataset
    with columns (key, val, cum) where ``cum`` is the inclusive prefix
    sum.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    rng = key_range_buckets(ds, key, buckets)
    if rng is None:
        return None
    lo, width = rng

    def bucket_sums(b: pa.Table) -> pa.Table:
        k = b.column(key).to_numpy(zero_copy_only=False)
        v = b.column(val).to_numpy(zero_copy_only=False)
        bk = (k - lo) // width
        t = pa.table({"rbkt": pa.array(bk, pa.int64()),
                      "s": pa.array(v, pa.int64())})
        return t.group_by("rbkt").aggregate([("s", "sum")]) \
                .rename_columns(["rbkt", "s"])

    part = np_columns(ds.map_batches(bucket_sums, batch_format="pyarrow"),
                      ["rbkt", "s"])
    totals = pd.DataFrame(part).groupby("rbkt")["s"].sum().sort_index()
    offsets = totals.cumsum().shift(fill_value=0)
    omap = IntKeyMap(offsets.index.to_numpy(np.int64),
                     offsets.to_numpy(np.int64))

    def add_bkt(b: pa.Table) -> pa.Table:
        k = b.column(key).to_numpy(zero_copy_only=False)
        return b.append_column(
            "rbkt", pa.array((k - lo) // width, pa.int64()))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key, kind="stable")
        off = int(omap.take_checked(g["rbkt"].to_numpy()[:1])[0]) \
            if len(g) else 0
        out = g[[key, val]].copy()
        out["cum"] = g[val].to_numpy(np.int64).cumsum() + off
        return out

    return (ds.map_batches(add_bkt, batch_format="pyarrow")
            .groupby("rbkt").map_groups(scan, batch_format="pandas"))


def within_group_pairs(starts, sizes):
    """Global row indices (i, j), i<j, of every unordered within-group
    pair of a group-contiguous array — the pair-generation kernel of
    co-occurrence / market-basket mining.  Vectorized per DISTINCT
    group size (one np.triu_indices template per size, broadcast over
    all groups of that size), so the Python cost is O(|distinct
    sizes|), not O(pairs)."""
    import numpy as np

    starts = np.asarray(starts, np.int64)
    sizes = np.asarray(sizes, np.int64)
    out_i, out_j = [], []
    for sz in np.unique(sizes):
        if sz < 2:
            continue
        ti, tj = np.triu_indices(int(sz), k=1)
        st = starts[sizes == sz]
        out_i.append((st[:, None] + ti[None, :]).ravel())
        out_j.append((st[:, None] + tj[None, :]).ravel())
    if not out_i:
        e = np.empty(0, np.int64)
        return e, e
    return np.concatenate(out_i), np.concatenate(out_j)


def within_group_triples(starts, sizes):
    """Global row indices (i, j, k), i<j<k, of every unordered
    within-group TRIPLE of a group-contiguous array — the 3-itemset
    analog of within_group_pairs (Apriori candidate enumeration).
    One combination template per distinct group size, broadcast over
    all groups of that size; Python cost O(|distinct sizes|)."""
    import itertools

    import numpy as np

    starts = np.asarray(starts, np.int64)
    sizes = np.asarray(sizes, np.int64)
    out_i, out_j, out_k = [], [], []
    for sz in np.unique(sizes):
        if sz < 3:
            continue
        tmpl = np.array(list(itertools.combinations(range(int(sz)), 3)),
                        np.int64)
        st = starts[sizes == sz]
        out_i.append((st[:, None] + tmpl[None, :, 0]).ravel())
        out_j.append((st[:, None] + tmpl[None, :, 1]).ravel())
        out_k.append((st[:, None] + tmpl[None, :, 2]).ravel())
    if not out_i:
        e = np.empty(0, np.int64)
        return e, e, e
    return (np.concatenate(out_i), np.concatenate(out_j),
            np.concatenate(out_k))


def tie_pair_count(a, assume_sorted: bool = False) -> int:
    """Number of unordered pairs with equal value — the tie-correction
    terms of rank statistics (Kendall τ-b, Mann-Whitney variance).
    Σ c·(c−1)/2 over value multiplicities, run-length encoded on the
    sorted array."""
    import numpy as np

    a = np.asarray(a)
    if not len(a):
        return 0
    if not assume_sorted:
        a = np.sort(a, kind="stable")
    new = np.concatenate([[True], a[1:] != a[:-1]])
    sizes = np.diff(np.append(np.flatnonzero(new), len(a)))
    return int((sizes * (sizes - 1) // 2).sum())


def merge_inversions(a) -> int:
    """Count strict inversions (i < j with a[i] > a[j]) by bottom-up
    merge: at each doubling level every adjacent run pair contributes
    Σ_b |A| − searchsorted(A, B_b, 'right') with ONE vectorized
    searchsorted per pair — O(n log² n) with numpy inner loops, the
    Kendall-τ concordance kernel (Knight 1966).  The array is consumed
    (copied internally)."""
    import numpy as np

    a = np.asarray(a).copy()
    n = len(a)
    total = 0
    w = 1
    while w < n:
        for lo in range(0, n, 2 * w):
            mid = min(lo + w, n)
            hi = min(lo + 2 * w, n)
            if mid >= hi:
                continue
            A = a[lo:mid]
            B = a[mid:hi]
            pos = np.searchsorted(A, B, side="right")
            total += int((len(A) - pos).sum())
            a[lo:hi] = np.sort(a[lo:hi], kind="stable")
        w *= 2
    return total
