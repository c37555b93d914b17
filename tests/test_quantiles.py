"""Exact histogram quantiles (stages/quantiles.py): percentile_disc
semantics vs DuckDB's quantile_disc, plus the grouped Dataset path."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from elevant_ray.stages.quantiles import (grouped_quantiles,
                                          quantiles_from_histogram)


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                max_size=200),
       st.floats(min_value=0.01, max_value=1.0, allow_nan=False))
@settings(max_examples=60, deadline=None)
def test_matches_duckdb_quantile_disc(values, q):
    from collections import Counter

    hist = dict(Counter(values))
    got = quantiles_from_histogram(hist, [q])[q]
    expected = duckdb.sql(
        "SELECT quantile_disc(v, ?) FROM (SELECT unnest(?) AS v)",
        params=[q, values]).fetchone()[0]
    assert got == expected


def test_empty_histogram():
    assert quantiles_from_histogram({}, [0.5]) == {0.5: None}


def test_grouped_quantiles_dataset(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "g": ["a"] * 10 + ["b"] * 4,
        "v": list(range(1, 11)) + [5, 5, 7, 100],
    })
    out = grouped_quantiles(rd.from_arrow(tbl), "v", (0.5, 0.9),
                            group_cols=["g"])
    rows = {(r["g"], r["q"]): r["v"] for r in out.to_pylist()}
    # group a: 1..10 → p50 = ceil(0.5*10)=5th value = 5; p90 = 9th = 9
    assert rows[("a", 0.5)] == 5 and rows[("a", 0.9)] == 9
    # group b: [5,5,7,100] → p50 = 2nd = 5; p90 = ceil(3.6)=4th = 100
    assert rows[("b", 0.5)] == 5 and rows[("b", 0.9)] == 100


def test_global_quantiles_no_groups(ray_session):
    import ray.data as rd

    out = grouped_quantiles(rd.from_arrow(pa.table({"v": [3, 1, 2]})),
                            "v", (0.5,))
    assert out.to_pylist() == [{"q": 0.5, "v": 2}]
