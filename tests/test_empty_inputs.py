"""Empty-input robustness: every driver-contract query must run (and
return an empty result, not crash) over schema-only parquet tables.

At 100 TB, empty partitions and fully-filtered intermediate datasets are
routine; Ray's weak spot is schema-less empty blocks (groupby/aggregate
emits them, ``to_pandas`` drops column names).  The engine's guards live
in ``_det_sort`` (schema-derived empty frames), ``partial_group_agg``
(typed empty combine), the dims materializers, and per-stage early
returns (knn, sketches, asof, dedup, linkage)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

EMPTY_DIR = "/tmp/elevant_ray_sf_empty"


@pytest.fixture(scope="module")
def empty_sf_dir():
    os.makedirs(EMPTY_DIR, exist_ok=True)
    for f in glob.glob("/root/testdata/sf0.001/*.parquet"):
        out = os.path.join(EMPTY_DIR, os.path.basename(f))
        if not os.path.exists(out):
            pq.write_table(pq.read_schema(f).empty_table(), out)
    return EMPTY_DIR


def _query_names():
    import __ray_entry__ as m

    return sorted(m.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_survives_empty_tables(name, ray_session, empty_sf_dir):
    import ray.data

    import __ray_entry__ as m

    result = m.queries()[name](empty_sf_dir)
    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    elif hasattr(result, "to_pandas"):
        result = result.to_pandas()
    if name in ("nation_region_rollup", "nation_segment_cube",
                "q14_promo_revenue", "q19_disjunctive_revenue",
                "q6_forecast_revenue", "cosupply_triangles"):
        # SQL ROLLUP/CUBE and ungrouped scalar aggregates keep the ()
        # grouping set: aggregating an empty table still yields the
        # grand-total row (DuckDB agrees)
        assert len(result) == 1
    elif name == "data_quality_audit":
        # the audit reports every check with a zero violation count
        # (the oracle's UNION ALL of scalar subqueries does the same)
        assert len(result) == 8
        assert (result["n_violations"] == 0).all()
    elif name.startswith("reader_") or name in ("entity_dims_load",
                                                "coref_types_mapping"):
        # fixture-backed reader queries parse committed format samples
        # and ignore the sf tables entirely — non-empty by design
        # regardless of corpus emptiness
        assert len(result) > 0
    else:
        assert len(result) == 0, \
            f"{name}: non-empty result from empty tables"
