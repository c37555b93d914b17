"""Scale-path conformance: force the distributed fallbacks (hash-
partitioned joins, Dataset sorts, shuffle distincts, join-side dedup
labeling) by zeroing the broadcast cutoff, and check they produce the
same results as the broadcast/driver short-circuits — on small data,
against the DuckDB oracle where one exists, else against the
default-path result.  These are the code paths a 100 TB run takes."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# queries whose size-cutoff branch swaps broadcast↔join / driver↔shuffle
ORACLE_CHECKED = ["region_revenue", "q3_top_orders", "customer_except",
                  "repeat_customers", "party_nations_union",
                  "bigram_counts", "part_min_cost_supplier",
                  "q7_trade_volume", "q10_returned_revenue",
                  "nation_balance_full_join", "events_purchaser_events",
                  "part_pagerank", "q12_late_lines",
                  "q16_supplier_variety", "q4_order_priority",
                  "orders_above_customer_avg",
                  "parts_cosupply_top_pairs", "q8_market_share",
                  "cosupply_triangles", "supplier_bfs_hops",
                  "q9_product_profit", "supplier_degree_histogram",
                  "q20_promotion_suppliers", "priority_ship_delay",
                  "order_basket_rules", "part_name_token_pairs",
                  "supplier_late_wilson", "orders_ship_busdays",
                  "supplier_neighborhood_jaccard",
                  "docs_weighted_sample", "docs_incremental_new",
                  "embedding_neighbor_dot", "sessions_peak_concurrency",
                  "supplier_clustering_coeff", "embedding_top_pairs",
                  # combine="auto" users (driver merge ↔ distributed
                  # combine inside partial_group_agg)
                  "part_xyz_classes", "orders_backlog_monthly",
                  "unit_price_variance_decomposition",
                  "basket_size_by_priority",
                  "yearly_laspeyres_price_index",
                  "q18_large_volume", "q15_top_supplier",
                  # exact pair joins with in-process sub-cutoff twins
                  "dedup_containment", "dedup_ngram_jaccard",
                  "order_basket_triples",
                  # dedup_first_by's in-process pack/min/unpack twin
                  "dedup_exact",
                  # driver-combine distinct-pairs fast path ↔ two
                  # keyed exchanges
                  "customers_all_priorities"]
PATH_VS_PATH = ["dedup_simhash", "dedup_minhash", "part_supplier_kcore",
                "blocking_quality", "linkage_ari", "dedup_embedding_clusters",
                "linking_eval_counts", "model_ner_linking",
                "abstracts_mapping", "coref_types_mapping",
                "neardup_embedding",
                # _stage_map users (in-process twin ↔ actor pool)
                "prior_linking", "popular_linking", "entity_linking",
                "coref_clusters",
                # incremental ER state: in-process delta fold ↔
                # distributed blocking/scoring/CC + staged writes
                "linkage_incremental"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def _run(name: str) -> pd.DataFrame:
    import ray.data

    import __ray_entry__ as m

    r = m.queries()[name](SF_DIR)
    if isinstance(r, ray.data.Dataset):
        r = r.to_pandas()
    elif hasattr(r, "to_pandas"):
        r = r.to_pandas()
    return r


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_distributed_fallback_matches_oracle(name, ray_session, ddb,
                                             monkeypatch):
    import __ray_entry__ as m

    # multi-block reads: per-batch-local assumptions (in-batch dedup
    # that must be global, per-batch partials) can hide behind sf0.001
    # fitting one block — force 4 so they can't
    monkeypatch.setenv("ELEVANT_RAY_BROADCAST_CUTOFF", "0")
    monkeypatch.setenv("ELEVANT_RAY_READ_BLOCKS", "4")
    got = _norm(_run(name))
    want = _norm(ddb.execute(m.oracle_sql()[name]).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.parametrize("name", PATH_VS_PATH)
def test_distributed_fallback_matches_broadcast_path(name, ray_session,
                                                     monkeypatch):
    default = _norm(_run(name))
    monkeypatch.setenv("ELEVANT_RAY_BROADCAST_CUTOFF", "0")
    monkeypatch.setenv("ELEVANT_RAY_READ_BLOCKS", "4")
    fallback = _norm(_run(name))
    pd.testing.assert_frame_equal(fallback, default, check_dtype=False)


# the inherently-pairwise string-similarity family: enumeration goes
# through scoring.guarded_pair_slabs; a tiny forced slab proves the
# guard path (many slabs + running top-k merges) yields the exact
# oracle answer
PAIR_SLAB_GUARDED = ["part_name_similarity", "part_name_damerau",
                     "part_name_monge_elkan", "name_match_pr_curve",
                     "linkage_fs_weights", "linkage_em_step",
                     "linkage_waterfall_counts",
                     "linkage_fs_score_distribution",
                     "nation_acctbal_hodges_lehmann"]


@pytest.mark.parametrize("name", PAIR_SLAB_GUARDED)
def test_tiny_pair_slab_matches_oracle(name, ray_session, ddb,
                                       monkeypatch):
    import __ray_entry__ as m

    monkeypatch.setenv("ELEVANT_RAY_PAIR_SLAB", "3")
    got = _norm(_run(name))
    want = _norm(ddb.execute(m.oracle_sql()[name]).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
