"""End-to-end record-linkage tests: the distributed blocking + scoring +
CC pipeline must reproduce the single-node brute-force oracle's clusters
with pairwise F1 ≥ 0.99 (north rule), and must recall every planted
duplicate."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def linkage_result(ray_session):
    from elevant_ray.pipelines.record_linkage import (
        cluster_pages, clusters_to_pairs, gold_pairs_from_doc_ids, prepare_pages,
    )
    from elevant_ray.sources.pages import synth_pages

    pages = prepare_pages(synth_pages(SF_DIR, include_doc_id=True)).materialize()
    labels, scored = cluster_pages(pages, num_partitions=4)
    pred = clusters_to_pairs(labels)
    pred_pairs = {(r["left"], r["right"]) for r in pred.take_all()}
    pages_df = pages.to_pandas()
    gold_planted = {(r["left"], r["right"])
                    for r in gold_pairs_from_doc_ids(pages).take_all()}
    return pages_df, pred_pairs, gold_planted


def test_pairwise_f1_vs_bruteforce_oracle(linkage_result):
    from elevant_ray.pipelines.oracle import (
        bruteforce_match_pairs, cluster_pairs_from_labels, pairwise_prf,
        transitive_closure,
    )

    pages_df, pred_pairs, _ = linkage_result
    oracle_matches = bruteforce_match_pairs(
        pages_df["url"].tolist(), pages_df["text"].tolist(),
        pages_df["canon"].tolist())
    gold = cluster_pairs_from_labels(transitive_closure(oracle_matches))
    prf = pairwise_prf(pred_pairs, gold)
    assert prf["f1"] >= 0.99, prf


def test_planted_duplicates_all_recalled(linkage_result):
    _, pred_pairs, gold_planted = linkage_result
    missing = gold_planted - pred_pairs
    assert not missing, f"{len(missing)} planted dup pairs missed: {sorted(missing)[:5]}"


def test_cluster_labels_are_min_member(linkage_result, ray_session):
    # hash-min CC invariant: every label is the lexicographic min of its
    # component — check via the oracle's union-find on predicted pairs
    from elevant_ray.pipelines.oracle import transitive_closure

    _, pred_pairs, _ = linkage_result
    labels = transitive_closure(sorted(pred_pairs))
    by_label = {}
    for node, lab in labels.items():
        by_label.setdefault(lab, set()).add(node)
    for lab, members in by_label.items():
        assert lab == min(members | {lab})


def test_distributed_cc_path_matches_driver_shortcircuit(ray_session):
    # connected_components short-circuits to one driver-side union-find
    # under driver_cutoff; force BOTH paths on the same edges and assert
    # identical labels (same min-id root contract).
    import pyarrow as pa
    import ray.data as rd

    from elevant_ray.stages.clustering import connected_components

    # two chains, one star, singleton-free edge list with dup edges
    edges = [("a", "b"), ("b", "c"), ("c", "d"),
             ("x", "y"), ("y", "z"), ("x", "z"),
             ("m", "n"), ("m", "o"), ("m", "p"), ("n", "o")]
    ds = rd.from_arrow(pa.table({
        "left": pa.array([e[0] for e in edges], pa.string()),
        "right": pa.array([e[1] for e in edges], pa.string()),
    })).repartition(3)

    def lab_map(res):
        return {r["node"]: r["label"] for r in res.take_all()}

    fast = lab_map(connected_components(ds, num_partitions=2))
    dist = lab_map(connected_components(ds, num_partitions=2,
                                        driver_cutoff=0))
    assert fast == dist
    assert fast["d"] == "a" and fast["z"] == "x" and fast["p"] == "m"


def test_distributed_cc_long_chain_and_random_graph(ray_session):
    # Chains are the adversarial case for star-contraction CC (each
    # round only halves path length); a naive "union-find whatever
    # shares a bucket" loop 2-cycles forever on them.  Force the
    # distributed large/small-star path on a 240-node path graph plus a
    # seeded random graph, tiny batches so components span many blocks,
    # and compare against the driver union-find short-circuit.
    import random

    import pyarrow as pa
    import ray.data as rd

    from elevant_ray.stages.clustering import connected_components

    chain = [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(239)]
    rng = random.Random(7)
    randg = [(f"r{rng.randrange(300):04d}", f"r{rng.randrange(300):04d}")
             for _ in range(260)]
    edges = [e for e in chain + randg if e[0] != e[1]]
    rng.shuffle(edges)
    ds = rd.from_arrow(pa.table({
        "left": pa.array([e[0] for e in edges], pa.string()),
        "right": pa.array([e[1] for e in edges], pa.string()),
    })).repartition(16)

    def lab_map(res):
        return {r["node"]: r["label"] for r in res.take_all()}

    fast = lab_map(connected_components(ds, num_partitions=4))
    dist = lab_map(connected_components(ds, num_partitions=4,
                                        driver_cutoff=0))
    assert fast == dist
    assert dist["n0239"] == "n0000"


def test_inprocess_flagship_matches_distributed(ray_session, monkeypatch):
    # cluster_pages short-circuits sub-cutoff corpora to the in-process
    # kernel path; force the distributed DAG on the same pages and
    # assert identical labels (same kernels, same min-root contract).
    from elevant_ray.pipelines.record_linkage import cluster_pages, prepare_pages
    from elevant_ray.sources.pages import synth_pages

    pages = prepare_pages(synth_pages(SF_DIR)).materialize()
    fast, _ = cluster_pages(pages, num_partitions=4)
    fast_labels = sorted((r["node"], r["label"]) for r in fast.take_all())

    monkeypatch.setenv("ELEVANT_RAY_BROADCAST_CUTOFF", "0")
    dist, _ = cluster_pages(pages, num_partitions=4)
    dist_labels = sorted((r["node"], r["label"]) for r in dist.take_all())
    assert fast_labels == dist_labels and len(fast_labels) > 0
