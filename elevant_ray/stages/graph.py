"""Graph-shaped operators: distributed transitive closure with min-depth.

The reference computes a type transitive closure single-process with a
recursive DFS over ``subclass_of`` edges, tracking minimum depth
(``scripts/create_all_types_mapping.py:15-49``).  The engine
re-expresses it as **min-plus path doubling**: keep a Dataset of
(src, dst, min_depth) path summaries, and each round compose it with
itself (square it) under the (min, +) semiring:

    paths₁ = edges                                  (depth 1)
    paths₂ₗ = min-dedupe(pathsₗ ∪ (pathsₗ ∘ pathsₗ))

Composition is a tagged-union co-group on the mid node — rows keyed by
path head meet rows keyed by path tail in ONE hash-partitioned
``groupby``, cross-producted per group.  No ``Dataset.join`` anywhere:
Ray's join operator loses block schemas on empty shuffle partitions
(guaranteed by small late-round frontiers), and the co-group costs the
same single shuffle.

Doubling converges in ceil(log₂ depth)+1 rounds (2 shuffles each) vs
`depth` rounds for naive BFS — the shuffle-count win dominates because
every Ray all-to-all carries fixed aggregator-actor cost on top of data
volume.  The trade-off is intermediate fan-out (a (s,t) pair is derived
once per mid node on a shortest path), bounded by closure_size × depth —
fine for the shallow dimension-scale hierarchies this mirrors (the
reference's Wikidata subclass graph has depth < 20).

Cycles are handled naturally: depths only decrease under (min, +) and
pair count only grows, so the (count, Σdepth) pair is a monotone
convergence witness; reflexive pairs surface with their min cycle
length.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

CLOSURE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                            ("depth", pa.int64())])


def _with_schema(batch: pa.Table) -> pa.Table:
    """Groupby aggregates emit schema-less empty blocks for empty shuffle
    partitions; pin every block (empty included) to the closure schema."""
    if batch.num_columns == 0:
        return CLOSURE_SCHEMA.empty_table()
    return batch.select(CLOSURE_SCHEMA.names).cast(CLOSURE_SCHEMA)


def _dedupe_min_depth(ds, num_partitions: int = 8):
    from ray.data.aggregate import Min

    return ds.groupby(["src", "dst"], num_partitions=num_partitions).aggregate(
        Min("depth", alias_name="depth")).map_batches(
            _with_schema, batch_format="pyarrow")


_COMPOSE_BUCKETS = 64


def _compose(paths, num_partitions: int = 8):
    """paths ∘ paths under (min, +): co-group rows keyed by ``dst`` with
    rows keyed by ``src`` on the shared mid node, one shuffle.

    The shuffle key is a HASH BUCKET of the mid node, not the node
    itself: ``map_groups`` pays per-group Python overhead (one UDF call
    per group — minutes at 10⁴⁺ mid nodes), while a bucket groupby makes
    ~64 calls, each running the exact-key composition as one vectorized
    pandas hash merge in C.  Same co-location guarantee (equal keys hash
    to equal buckets), ~200× fewer UDF invocations."""

    def tag_head(b: pa.Table) -> pa.Table:
        return pa.table({"bkt": pc.bit_wise_and(
            b.column("dst"), pa.scalar(_COMPOSE_BUCKETS - 1, pa.int64())),
            "k": b.column("dst"),
            "side": pa.array([0] * b.num_rows, pa.int8()),
            "n": b.column("src"), "d": b.column("depth")})

    def tag_tail(b: pa.Table) -> pa.Table:
        return pa.table({"bkt": pc.bit_wise_and(
            b.column("src"), pa.scalar(_COMPOSE_BUCKETS - 1, pa.int64())),
            "k": b.column("src"),
            "side": pa.array([1] * b.num_rows, pa.int8()),
            "n": b.column("dst"), "d": b.column("depth")})

    combined = (paths.map_batches(tag_head, batch_format="pyarrow")
                .union(paths.map_batches(tag_tail, batch_format="pyarrow")))

    def cross(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                              "dst": pd.Series([], dtype="int64"),
                              "depth": pd.Series([], dtype="int64")})
        if len(g) == 0 or "side" not in g.columns:
            return empty
        a = g[g["side"] == 0][["k", "n", "d"]]
        b = g[g["side"] == 1][["k", "n", "d"]]
        if a.empty or b.empty:
            return empty
        m = a.merge(b, on="k", suffixes=("_a", "_b"))
        return pd.DataFrame({
            "src": m["n_a"].to_numpy(dtype="int64"),
            "dst": m["n_b"].to_numpy(dtype="int64"),
            "depth": (m["d_a"] + m["d_b"]).to_numpy(dtype="int64"),
        })

    from elevant_ray.stages.util import as_arrow

    # as_arrow: map_groups leaves pandas blocks; union with the Arrow
    # `paths` blocks requires one block type
    return as_arrow(combined.groupby("bkt", num_partitions=num_partitions)
                    .map_groups(cross, batch_format="pandas"))


def _local_closure(tbl: pa.Table, max_rounds: int) -> pa.Table:
    """Driver-side min-plus closure: SEMI-NAIVE squaring over dense
    node indices with pure-numpy kernels.  Pairs live as one int64
    composite key (src_idx·n + dst_idx); each round composes only the
    delta (new or depth-improved pairs) against the full path set in
    both directions — a searchsorted range-join, no pandas, no hashing.
    Same semiring and fixpoint as the distributed loop; converges when
    the delta empties (cycles included: depths only decrease)."""
    import numpy as np

    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    if len(src) == 0:
        return CLOSURE_SCHEMA.empty_table()
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(nodes)
    pk = np.unique(inv[:len(src)].astype(np.int64) * n + inv[len(src):])
    pd_ = np.ones(len(pk), np.int64)
    dk, dd = pk, pd_

    def compose(ak, ad, bk, bd):
        # (a→m) ∘ (m→c): range-join on the shared mid node m
        am = ak % n
        aa = ak // n
        order = np.argsort(bk // n, kind="stable")
        bs = (bk // n)[order]
        bc = (bk % n)[order]
        bdep = bd[order]
        lo = np.searchsorted(bs, am, "left")
        cnt = np.searchsorted(bs, am, "right") - lo
        tot = int(cnt.sum())
        if tot == 0:
            return (np.empty(0, np.int64),) * 2
        idx = np.repeat(lo, cnt) + \
            (np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt))
        return (np.repeat(aa, cnt) * n + bc[idx],
                np.repeat(ad, cnt) + bdep[idx])

    for _ in range(max_rounds):
        k1, d1 = compose(dk, dd, pk, pd_)
        k2, d2 = compose(pk, pd_, dk, dd)
        allk = np.concatenate([pk, k1, k2])
        alld = np.concatenate([pd_, d1, d2])
        order = np.lexsort((alld, allk))
        allk, alld = allk[order], alld[order]
        first = np.concatenate([[True], allk[1:] != allk[:-1]])
        newk, newd = allk[first], alld[first]
        # delta = pairs absent from the old set or with improved depth
        pos = np.minimum(np.searchsorted(pk, newk), len(pk) - 1)
        known = (pk[pos] == newk) & (pd_[pos] <= newd)
        pk, pd_ = newk, newd
        dk, dd = newk[~known], newd[~known]
        if len(dk) == 0:
            return pa.table({"src": nodes[pk // n], "dst": nodes[pk % n],
                             "depth": pd_}).cast(CLOSURE_SCHEMA)
    raise RuntimeError(
        f"transitive_closure: no fixpoint after {max_rounds} rounds")


def transitive_closure(edges, num_partitions: int = 8, max_rounds: int = 64,
                       driver_cutoff: int = 16 << 20):
    """All (src, dst, depth) reachability pairs with minimum path
    length, as a Dataset.  ``edges`` is a Dataset(src, dst); duplicate
    edges are deduped up front.  Terminates on cyclic graphs too (see
    module docstring); ``max_rounds`` is only a runaway bound.

    Small edge sets (≤ ``driver_cutoff`` bytes) short-circuit to
    driver-side squaring — the same cutoff contract as
    clustering.connected_components: each distributed round costs two
    full exchanges (~2-3 s fixed latency apiece locally) while a ≤16 MB
    edge table closes in milliseconds of pandas merges, with an
    identical result by construction.  Dimension-scale type hierarchies
    (the reference's use case) always sit under the cutoff; the
    distributed path is for corpus-scale graphs."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.size_bytes() <= driver_cutoff:
        import ray.data as rd

        edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
        whole = pa.concat_tables(
            [b.select(["src", "dst"]).cast(edge_schema)
             for b in edges.iter_batches(batch_format="pyarrow")]
            or [edge_schema.empty_table()])
        return rd.from_arrow(_local_closure(whole, max_rounds)).materialize()
    edges = edges.map_batches(
        lambda b: b.append_column(
            "depth", pa.array([1] * b.num_rows, pa.int64())),
        batch_format="pyarrow")
    # repartition before each materialize: the groupby emits one block
    # per (hash partition × upstream operator), and union sums block
    # counts — left alone, blocks triple per round and per-task fixed
    # overhead swamps the (tiny) data (measured 5s → 400s by round 3)
    paths = _dedupe_min_depth(edges, num_partitions) \
        .repartition(num_partitions).materialize()
    prev = (paths.count(), paths.sum("depth") or 0)

    for _ in range(max_rounds):
        grown = _dedupe_min_depth(
            paths.union(_compose(paths, num_partitions)),
            num_partitions).repartition(num_partitions).materialize()
        cur = (grown.count(), grown.sum("depth") or 0)
        # squaring only adds pairs or lowers depths, so equal
        # (count, Σdepth) ⇒ fixpoint
        if cur == prev:
            return grown
        paths, prev = grown, cur

    raise RuntimeError(
        f"transitive_closure: no fixpoint after {max_rounds} rounds")


def pagerank(edges, num_iters: int = 3, damping: float = 0.85,
             num_partitions: int = 8, cutoff: int = None):
    """Iterative PageRank over (src, dst) edges, simplified semantics
    (no dangling-mass redistribution — a sink node's mass leaks, which
    the oracle mirrors): r₀ = 1/N over the distinct node set and

        r_{t+1}(v) = (1-d)/N + d · Σ_{(u,v)∈E} r_t(u) / outdeg(u)

    Under the edge-size cutoff the iteration runs as driver numpy
    scatter-adds (same short-circuit discipline as transitive_closure);
    beyond it each iteration is a co-group join of the rank state with
    the edge list on src plus one dst-sum exchange, with the node/degree
    table carried as iteration-invariant state — the hash-min-style
    frontier pattern the north rule names for cluster formation, applied
    to a value iteration.
    """
    import numpy as np

    from elevant_ray.stages.util import (cogroup_join, np_columns,
                                         partial_group_agg, scale_cutoff)

    e = edges.materialize()
    if cutoff is None:
        cutoff = scale_cutoff(16 << 20)
    if e.count() == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})
    if e.size_bytes() <= cutoff:
        cols = np_columns(e, ["src", "dst"])
        src, dst = cols["src"], cols["dst"]
        nodes = np.unique(np.concatenate([src, dst]))
        n = len(nodes)
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        deg = np.bincount(si, minlength=n)
        r = np.full(n, 1.0 / n)
        for _ in range(num_iters):
            contrib = r[si] / deg[si]
            s = np.zeros(n)
            np.add.at(s, di, contrib)
            r = (1.0 - damping) / n + damping * s
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "rank": pa.array(r, pa.float64())})

    # distributed path: state = (node, r, deg) Dataset
    def src_key(b: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(b.column("src"), pa.int64()),
                         "dst": pc.cast(b.column("dst"), pa.int64())})

    ekeyed = e.map_batches(src_key, batch_format="pyarrow").materialize()
    deg = partial_group_agg(
        ekeyed.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "one": pa.array(
                                    np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["node"], sum_cols=["one"], combine="dataset",
        num_partitions=num_partitions)

    def all_nodes(b: pa.Table) -> pa.Table:
        arr = np.unique(np.concatenate([
            b.column("node").to_numpy(zero_copy_only=False),
            b.column("dst").to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(arr, pa.int64()),
                         "one": pa.array(np.ones(len(arr), np.int64))})

    nodes_ds = partial_group_agg(
        ekeyed.map_batches(all_nodes, batch_format="pyarrow"),
        ["node"], sum_cols=["one"], combine="dataset",
        num_partitions=num_partitions).materialize()
    n = nodes_ds.count()
    node_schema = pa.schema([("node", pa.int64()), ("one", pa.int64())])
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def rename_deg(b: pa.Table) -> pa.Table:
        # groupby-aggregate emits SCHEMA-LESS 0-column empty blocks for
        # empty shuffle partitions; rename_columns raises on those
        if b.num_columns == 0:
            return deg_schema.empty_table()
        return b.rename_columns(["node", "deg"])

    # state: node, deg (0 for sinks), r
    state = cogroup_join(
        nodes_ds, deg.map_batches(rename_deg, batch_format="pyarrow"),
        on="node", how="left_outer", num_partitions=num_partitions,
        left_schema=node_schema, right_schema=deg_schema)

    def init_r(b: pa.Table) -> pa.Table:
        d = b.column("deg").to_numpy(zero_copy_only=False)
        d = np.nan_to_num(d.astype(np.float64), nan=0.0).astype(np.int64)
        return pa.table({"node": b.column("node"),
                         "deg": pa.array(d, pa.int64()),
                         "r": pa.array(np.full(b.num_rows, 1.0 / n))})

    state = state.map_batches(init_r, batch_format="pyarrow").materialize()
    state_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64()),
                              ("r", pa.float64())])
    edge_schema = pa.schema([("node", pa.int64()), ("dst", pa.int64())])
    for _ in range(num_iters):
        j = cogroup_join(ekeyed, state, on="node",
                         num_partitions=num_partitions,
                         left_schema=edge_schema,
                         right_schema=state_schema)

        def contrib(b: pa.Table) -> pa.Table:
            r = b.column("r").to_numpy(zero_copy_only=False)
            d = b.column("deg").to_numpy(zero_copy_only=False)
            return pa.table({"node": b.column("dst"),
                             "c": pa.array(r / d, pa.float64())})

        sums = partial_group_agg(
            j.map_batches(contrib, batch_format="pyarrow"),
            ["node"], sum_cols=["c"], combine="dataset",
            num_partitions=num_partitions)
        def rename_c(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:
                return pa.schema([("node", pa.int64()),
                                  ("c", pa.float64())]).empty_table()
            return b.rename_columns(["node", "c"])

        nxt = cogroup_join(
            state.map_batches(lambda b: b.select(["node", "deg"]),
                              batch_format="pyarrow"),
            sums.map_batches(rename_c, batch_format="pyarrow"),
            on="node", how="left_outer", num_partitions=num_partitions,
            left_schema=pa.schema([("node", pa.int64()),
                                   ("deg", pa.int64())]),
            right_schema=pa.schema([("node", pa.int64()),
                                    ("c", pa.float64())]))

        def close(b: pa.Table) -> pa.Table:
            c = np.nan_to_num(
                b.column("c").to_numpy(zero_copy_only=False), nan=0.0)
            r = (1.0 - damping) / n + damping * c
            return pa.table({"node": b.column("node"),
                             "deg": b.column("deg"),
                             "r": pa.array(r, pa.float64())})

        state = nxt.map_batches(close, batch_format="pyarrow").materialize()
    return state.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "rank": b.column("r")}),
        batch_format="pyarrow")


# --- shared co-occurrence-graph kernels ------------------------------
# Used by the cosupply graph queries (triangles, BFS hops, degree
# histogram): edges are "two right-keys share a left-key" over a
# bipartite fact (part → supplier).  Keys pack into one int64 as
# (left << PAIR_BITS) | right, so distincts and shuffles move a single
# integer column.

PAIR_BITS = 21
PAIR_MASK = (1 << PAIR_BITS) - 1  # plain int; cast np.int64 at use sites


def bipartite_codes_batch(b: "pa.Table", left: str, right: str):
    """Per-batch distinct (left<<21|right) codes + the left key, as the
    (part, comp) table every cosupply query starts from.  Assumes both
    keys < 2^21 (asserted) — widen PAIR_BITS for larger dimensions."""
    import numpy as np
    import pyarrow as pa

    lk = b.column(left).to_numpy(zero_copy_only=False)
    rk = b.column(right).to_numpy(zero_copy_only=False)
    comp = np.unique((lk << PAIR_BITS) + rk)
    return pa.table({"part": pa.array(comp >> PAIR_BITS, pa.int64()),
                     "comp": pa.array(comp, pa.int64())})


def group_starts_sizes(sorted_group_keys):
    """(starts, sizes) runs of a sorted key array."""
    import numpy as np

    starts = np.flatnonzero(np.concatenate(
        [[True], sorted_group_keys[1:] != sorted_group_keys[:-1]]))
    sizes = np.diff(np.append(starts, len(sorted_group_keys)))
    return starts, sizes


def cooccurrence_pairs(comp):
    """Sorted unique (x<<21|y) co-occurrence pair codes, x < y, from
    sorted-unique (left<<21|right) codes — the within-left-group pair
    expansion (util.within_group_pairs) plus global dedup."""
    import numpy as np

    from .util import within_group_pairs

    mask = np.int64((1 << PAIR_BITS) - 1)
    comp = np.unique(comp)
    starts, sizes = group_starts_sizes(comp >> PAIR_BITS)
    i, j = within_group_pairs(starts, sizes)
    return np.unique(((comp[i] & mask) << PAIR_BITS) + (comp[j] & mask))


def dense_cooccurrence_adjacency(comp, max_nodes: int = 4096,
                                 max_groups: int = 200_000):
    """Dense boolean adjacency of the co-occurrence graph, built by
    marking each left-group's right-key block directly (NO pair
    materialization — on near-complete graphs the flat pair list alone
    costs seconds of memory bandwidth, and wedge lists are Θ(n³)).
    Returns ``(nodes, A)`` or ``None`` when the node or group count
    exceeds the dense bounds (callers fall back to the pair/wedge
    path).  Diagonal is cleared."""
    import numpy as np

    mask = np.int64((1 << PAIR_BITS) - 1)
    comp = np.unique(comp)
    supp = comp & mask
    nodes = np.unique(supp)
    starts, sizes = group_starts_sizes(comp >> PAIR_BITS)
    if len(nodes) > max_nodes or len(starts) > max_groups:
        return None
    scode = np.searchsorted(nodes, supp)
    A = np.zeros((len(nodes), len(nodes)), np.bool_)
    for st, sz in zip(starts.tolist(), sizes.tolist()):
        if sz >= 2:
            s = scode[st:st + sz]
            A[np.ix_(s, s)] = True
    np.fill_diagonal(A, False)
    return nodes, A


def dense_cooccurrence_counts(comp, max_nodes: int = 4096,
                              max_groups: int = 200_000):
    """Dense co-occurrence COUNT gram of the bipartite codes: G[i, j] =
    number of groups containing both node i and node j — the
    market-basket pair-count matrix without materializing the pair
    list (on near-complete graphs the flat i/j arrays alone cost
    seconds of memory bandwidth; the per-group np.ix_ scatter-add
    touches only the n²-bounded gram).  Returns ``(nodes, G)`` with a
    cleared diagonal, or ``None`` beyond the dense bounds (callers
    fall back to the within_group_pairs path)."""
    import numpy as np

    mask = np.int64((1 << PAIR_BITS) - 1)
    comp = np.unique(comp)
    supp = comp & mask
    nodes = np.unique(supp)
    starts, sizes = group_starts_sizes(comp >> PAIR_BITS)
    if len(nodes) > max_nodes or len(starts) > max_groups:
        return None
    scode = np.searchsorted(nodes, supp)
    G = np.zeros((len(nodes), len(nodes)), np.int64)
    for st, sz in zip(starts.tolist(), sizes.tolist()):
        if sz >= 2:
            s = scode[st:st + sz]
            G[np.ix_(s, s)] += 1
    np.fill_diagonal(G, 0)
    return nodes, G
