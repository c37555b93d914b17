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
    table (vectorized: pandas siphash per row, wrapping sum)."""
    a, b = batch.column_names[0], batch.column_names[1]
    df = batch.to_pandas()
    hashes = pd.util.hash_pandas_object(
        df[a] + "\x00" + df[b], index=False).to_numpy(np.uint64)
    acc = int(np.add.reduce(hashes, dtype=np.uint64)) if len(hashes) else 0
    return pa.table({"cs": pa.array([acc - (1 << 63)], pa.int64())})


def _edge_checksum(edges) -> int:
    return edges.map_batches(_checksum_batch, batch_format="pyarrow").sum("cs")


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

    # BTS-style per-block contraction; drop self-loops, keep both
    # orientations so one join per round reaches every neighbor.
    # Alternating sort-contract (cf. Kiveris et al., "Connected
    # Components in MapReduce and Beyond", SoCC'14 — the alternating
    # algorithm): each pass sorts the star-edge table by one endpoint
    # (co-locating every node's edges) and runs an in-block union-find.
    # A pass is ONE range-partitioned sort + ONE map — no hash joins, no
    # aggregator actor pools — and the edge table stays one row per
    # node.  Converges in O(log) passes; the earlier textbook hash-min
    # loop (2 joins + 2 aggregates per round, one round PER HOP of
    # component diameter) took 13+ expensive rounds on chain-shaped
    # near-dup components.
    star = edges.map_batches(_local_contract, batch_format="pyarrow",
                             batch_size=65536).materialize()
    cs_prev = _edge_checksum(star)
    for i in range(max_iters):
        key = "left" if i % 2 == 0 else "right"
        star = star.sort(key).map_batches(
            _local_contract, batch_format="pyarrow",
            batch_size=65536).materialize()
        cs_new = _edge_checksum(star)
        if cs_new == cs_prev:
            # fixpoint: every node's edge points at its component min
            break
        cs_prev = cs_new

    labels = star.rename_columns({"left": "node", "right": "label"}) \
        .groupby("node").aggregate(Min("label", alias_name="label"))
    return labels.materialize()


def clusters_to_pairs(labels, max_cluster: int = 1000):
    """labels(node, label) → all within-cluster pairs (left < right) —
    the predicted-pair set for pairwise F1.  Clusters larger than
    `max_cluster` are truncated (logged via `truncated` flag) to bound
    the quadratic expansion; the north-rule metric operates on *labeled*
    candidate pairs, so full expansion is only needed for small clusters."""

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
