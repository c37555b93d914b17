"""Driver-contract conformance: every ``queries()`` entry runs at
sf0.001 and, where oracle SQL exists, matches DuckDB row-for-row
(order-insensitive, columns sorted by name) — replicating the driver's
CORRECTNESS check locally."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    elif isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _query_names():
    import __ray_entry__ as m

    return sorted(m.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_runs_and_matches_oracle(name, ray_session, ddb):
    import __ray_entry__ as m

    result = _to_df(m.queries()[name](SF_DIR))
    assert len(result) >= 0
    sql = m.oracle_sql().get(name)
    if sql is None:
        assert len(result) > 0, f"{name}: rows-only query returned 0 rows"
        return
    expected = ddb.execute(sql).fetchdf()
    got, want = _normalize(result), _normalize(expected)
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-9, atol=1e-9)
    # the driver's value-hash is unit- and dtype-sensitive: datetime
    # columns must carry the oracle's exact resolution ([us], not the
    # [s] Ray's hash shuffle downcasts to) and integers must stay
    # integers (no float64 upcast from outer joins)
    for c in got.columns:
        wk, gk = want[c].dtype.kind, got[c].dtype.kind
        if wk == "M" or gk == "M":
            assert got[c].dtype == want[c].dtype, \
                f"{name}.{c}: {got[c].dtype} != {want[c].dtype}"
        elif wk == "i":
            assert gk == "i", f"{name}.{c}: {got[c].dtype} not integer"


def test_entry_smoke(ray_session):
    import __ray_entry__ as m

    ds = m.entry()
    df = _to_df(ds)
    assert len(df) >= 0
    assert set(df.columns) == {"url", "cluster"}


def test_every_oracle_key_has_a_query():
    # an oracle whose key no longer matches a query would silently stop
    # being conformance-checked — lock the alignment
    import __ray_entry__ as m

    assert set(m.oracle_sql()) <= set(m.queries())
