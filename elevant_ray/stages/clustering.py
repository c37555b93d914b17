"""Distributed transitive clustering: iterative hash-min connected
components over match edges.

The reference's "clusters" are per-document coref groups keyed by entity
id (``kb_coref_linker.py:311-315``); at corpus scale the north rule
requires cross-document transitive clustering.  Pattern: the classic
hash-min label propagation (cf. the reference's frontier-expansion type
closure, ``scripts/create_all_types_mapping.py:15-49``, and BTS, ICDE
2024 in PAPERS.md): every node starts labeled with itself; each round
sends labels across edges and keeps the per-node minimum; converges in
O(log diameter) rounds.

Three scale/latency optimizations over the textbook loop:

1. **Local contraction** (BTS-style): each edge block is first collapsed
   with an in-memory union-find; the loop then runs on (node → local
   root) star edges.  Within-block paths cost zero rounds, so the round
   count is O(log #blocks-spanned), not O(log diameter).
2. **One join per round**: edges are pre-exploded into both orientations
   once, so a round is one hash join + one union + one groupby-min.
3. **Checksum convergence**: labels only ever shrink, so a 64-bit
   content checksum of the (node, label) table decides convergence with
   a streaming sum over the already-materialized label table — no extra
   join.

Each iteration's label table is materialized: it is the iteration state
(one row per node).  At 10^12-edge scale each round checkpoints this
table to Parquet instead (state/checkpoint.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _local_contract(batch: pa.Table) -> pa.Table:
    """Union-find over one edge block → star edges (node, root)."""
    left = batch.column("left").to_pylist()
    right = batch.column("right").to_pylist()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(left, right):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # min id wins the root slot → deterministic labels
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    nodes = list(parent)
    roots = [find(n) for n in nodes]
    return pa.table({"left": pa.array(nodes, pa.string()),
                     "right": pa.array(roots, pa.string())})


def _checksum_batch(batch: pa.Table) -> pa.Table:
    """Order-insensitive uint64 checksum partial of a 2-string-column
    table (vectorized: pandas siphash per row, wrapping sum).  Partials
    are the per-block uint64 sum reinterpreted as signed int64; the
    driver folds the partial total back mod 2^64, so the checksum
    depends only on CONTENT — never on how rows were blocked (a
    per-block constant or unfolded wraps would both leak block count
    into the value and break fixpoint detection)."""
    a, b = batch.column_names[0], batch.column_names[1]
    df = batch.to_pandas()
    hashes = pd.util.hash_pandas_object(
        df[a] + "\x00" + df[b], index=False).to_numpy(np.uint64)
    acc = np.add.reduce(hashes, dtype=np.uint64) if len(hashes) \
        else np.uint64(0)
    return pa.table({"cs": pa.array([int(acc.astype(np.int64))],
                                    pa.int64())})


def _edge_checksum(edges) -> int:
    total = edges.map_batches(_checksum_batch,
                              batch_format="pyarrow").sum("cs")
    return int(total) % (1 << 64)


def connected_components(edges, num_partitions: int = 16,
                         max_iters: int = 25,
                         driver_cutoff: int = 16 << 20):
    """edges(left, right) → labels(node, label) with label = min node id
    (lexicographic) of the component.  Deterministic under any
    partitioning / batch order (min is commutative; local contraction
    roots are min-ids too)."""
    from ray.data.aggregate import Min

    edges = edges.map_batches(
        lambda b: pa.table({
            "left": b.column("left").combine_chunks().cast(pa.string()),
            "right": b.column("right").combine_chunks().cast(pa.string()),
        }), batch_format="pyarrow").materialize()

    if edges.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()),
                                       "label": pa.array([], pa.string())}))

    # Small edge sets short-circuit to ONE in-memory union-find on the
    # driver: every distributed pass below costs a full exchange
    # (~2-3 s fixed latency locally), while a ≤16 MB edge table is a
    # few hundred thousand pairs — microseconds of union-find.  Labels
    # are identical to the distributed result by construction (same
    # min-id-wins root contract in _local_contract).  Above the cutoff
    # (real corpora) the alternating sort-contract path runs.
    if edges.size_bytes() <= driver_cutoff:
        import ray.data as rd

        whole = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow")))
        lab = _local_contract(whole)
        return rd.from_arrow(
            lab.rename_columns(["node", "label"])).materialize()

    # BTS-style per-block contraction seeds the loop (within-block paths
    # cost zero rounds), then alternating LARGE-STAR / SMALL-STAR
    # (Kiveris et al., "Connected Components in MapReduce and Beyond",
    # SoCC'14).  Each pass co-locates every node's incident rows via the
    # hash-bucket co-group (util.bucketed_group_apply) — a key's rows
    # are GUARANTEED to land in one bucket, unlike sort +
    # fixed-size-rebatch, which can split a key run across a batch
    # boundary — and applies the per-node star rule vectorized.  Naive
    # "union-find within whatever shares a bucket" is NOT convergent
    # (two rows (b,a)/(c,b) may never share a bucket and re-emitted
    # stale self-rows make the state 2-cycle); the star rules carry the
    # paper's convergence proof (only fixpoints are min-rooted stars).
    # Non-convergence raises rather than returning silently split
    # components.
    from elevant_ray.stages.util import as_arrow, bucketed_group_apply

    # canonical (left > right) parent pointers; local roots are minima,
    # so dropping self-loops is the only normalization needed
    def _drop_self(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.not_equal(b.column("left"), b.column("right")))

    star = edges.map_batches(_local_contract, batch_format="pyarrow",
                             batch_size=65536) \
        .map_batches(_drop_self, batch_format="pyarrow").materialize()
    cs_prev = _edge_checksum(star)

    def _both_orientations(b: pa.Table) -> pa.Table:
        flipped = pa.table({"left": b.column("right"),
                            "right": b.column("left")})
        return pa.concat_tables([b.select(["left", "right"]), flipped])

    def _large_star_df(df: pd.DataFrame) -> pd.DataFrame:
        # per node u (all orientations present): m = min(Γ(u) ∪ {u});
        # emit (v, m) for v ∈ Γ(u), v > u.  Output keeps left > right.
        df = df.drop_duplicates()
        gmin = df.groupby("left", sort=False)["right"].min()
        m = pd.Series(np.minimum(gmin.to_numpy(), gmin.index.to_numpy()),
                      index=gmin.index)
        sel = df[df["right"].to_numpy() > df["left"].to_numpy()]
        return pd.DataFrame({
            "left": sel["right"].to_numpy(),
            "right": sel["left"].map(m).to_numpy()})

    def _small_star_df(df: pd.DataFrame) -> pd.DataFrame:
        # rows oriented left > right, grouped by left=u:
        # m = min(Γ⁻(u) ∪ {u}) = min(right); emit (u, m) and (v, m)
        # for v ∈ Γ⁻(u), v ≠ m.
        df = df.drop_duplicates()
        m = df.groupby("left", sort=False)["right"].min()
        mu = df["left"].map(m).to_numpy()
        rv = df["right"].to_numpy()
        keep = rv != mu
        return pd.DataFrame({
            "left": np.concatenate([rv[keep], m.index.to_numpy()]),
            "right": np.concatenate([mu[keep], m.to_numpy()])})

    buckets = num_partitions * 4
    for _ in range(max_iters):
        both = star.map_batches(_both_orientations, batch_format="pyarrow")
        larged = as_arrow(bucketed_group_apply(
            both, "left", _large_star_df, buckets=buckets))
        star = as_arrow(bucketed_group_apply(
            larged, "left", _small_star_df, buckets=buckets)).materialize()
        cs_new = _edge_checksum(star)
        if cs_new == cs_prev:
            # fixpoint: min-rooted stars (the only fixpoints of the
            # large/small-star alternation)
            break
        cs_prev = cs_new
    else:
        raise RuntimeError(
            "connected_components: no fixpoint after "
            f"{max_iters} alternating passes — raise max_iters")

    # star rows are (member, root) with roots absent from `left`; union
    # in (root, root) self-rows so every node gets a label
    def _with_root_rows(b: pa.Table) -> pa.Table:
        roots = pa.table({"left": b.column("right"),
                          "right": b.column("right")})
        return pa.concat_tables([b.select(["left", "right"]), roots])

    labels = star.map_batches(_with_root_rows, batch_format="pyarrow") \
        .rename_columns({"left": "node", "right": "label"}) \
        .groupby("node").aggregate(Min("label", alias_name="label"))
    return labels.materialize()


def clusters_to_pairs(labels, max_cluster: int = 1000):
    """labels(node, label) → all within-cluster pairs (left < right) —
    the predicted-pair set for pairwise F1.  Clusters larger than
    `max_cluster` are SILENTLY truncated to their `max_cluster`
    smallest node ids to bound the quadratic expansion; the north-rule
    metric operates on *labeled* candidate pairs, so full expansion is
    only needed for small clusters."""

    from elevant_ray.stages.util import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # numpy triu expansion per cluster slice — the pair loop is
        # quadratic by definition, but the loop body is one vectorized
        # triu_indices per cluster, not a Python pair loop
        g = g.sort_values(["label", "node"], kind="stable")
        g = g[g.groupby("label").cumcount() < max_cluster]
        nodes = g["node"].to_numpy()
        sizes = g.groupby("label", sort=False).size().to_numpy()
        offs = np.concatenate([[0], np.cumsum(sizes)])
        lefts, rights = [], []
        for s, e in zip(offs[:-1], offs[1:]):
            if e - s < 2:
                continue
            sub = nodes[s:e]
            i, j = np.triu_indices(len(sub), k=1)
            lefts.append(sub[i])
            rights.append(sub[j])
        if not lefts:
            return pd.DataFrame({"left": pd.Series([], dtype=g["node"].dtype),
                                 "right": pd.Series([], dtype=g["node"].dtype)})
        return pd.DataFrame({"left": np.concatenate(lefts),
                             "right": np.concatenate(rights)})

    return bucketed_group_apply(labels, "label", per_bucket)
