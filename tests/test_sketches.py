"""HyperLogLog sketch: accuracy vs exact distinct, merge associativity,
and the driver-contract approx query against the exact query."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from elevant_ray.stages.sketches import hll_estimate, hll_registers

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("n", [10, 500, 5_000, 200_000])
def test_hll_estimate_within_standard_error(n):
    vals = np.arange(n, dtype=np.int64) * 7919 + 13
    est = hll_estimate(hll_registers(vals, p=12))
    # standard error at p=12 is 1.04/sqrt(4096) ≈ 1.6%; allow 4 sigma
    assert abs(est - n) / n < 0.065, (n, est)


def test_hll_merge_equals_union():
    a = np.arange(0, 3000, dtype=np.int64)
    b = np.arange(1500, 6000, dtype=np.int64)
    ra, rb = hll_registers(a), hll_registers(b)
    merged = np.maximum(ra, rb)
    assert (merged == hll_registers(np.arange(6000, dtype=np.int64))).all()


def test_hll_duplicates_do_not_inflate():
    vals = np.tile(np.arange(100, dtype=np.int64), 1000)
    est = hll_estimate(hll_registers(vals))
    assert abs(est - 100) / 100 < 0.065


def test_approx_query_matches_exact_within_tolerance(ray_session):
    import __ray_entry__ as m

    exact = (m.queries()["events_distinct_users"](SF_DIR)
             .to_pandas().set_index("event_type")["n_users"])
    approx = (m.queries()["events_distinct_users_approx"](SF_DIR)
              .to_pandas().set_index("event_type")["n_users_approx"])
    assert set(exact.index) == set(approx.index)
    for et in exact.index:
        err = abs(approx[et] - exact[et]) / max(exact[et], 1)
        assert err < 0.05, (et, exact[et], approx[et])


def test_misra_gries_compress_guarantee():
    from elevant_ray.stages.sketches import _mg_compress

    rng = np.random.default_rng(7)
    items = np.arange(500, dtype=np.int64)
    weights = rng.integers(1, 50, size=500).astype(np.int64)
    weights[7] = 10_000  # one true heavy hitter
    n = int(weights.sum())
    cap = 16
    ki, kw = _mg_compress(items, weights, cap)
    assert len(ki) <= cap
    # every item with true weight > N/cap survives, underestimated by <= N/cap
    for it, w in zip(items, weights):
        if w > n / cap:
            assert it in ki
            kept = kw[np.flatnonzero(ki == it)[0]]
            assert 0 < kept <= w and w - kept <= n / cap


def test_heavy_hitters_query_exact_counts_and_coverage(ray_session):
    import duckdb

    import __ray_entry__ as m

    res = m.queries()["events_heavy_hitters"](SF_DIR).to_pandas()
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT user_id, COUNT(*)::BIGINT AS c FROM "
        f"read_parquet('{SF_DIR}/events.parquet') GROUP BY user_id"
    ).fetchdf().set_index("user_id")["c"]
    n = int(exact.sum())
    # (a) every returned count is exact
    for uid, cnt in zip(res["user_id"], res["count"]):
        assert exact[uid] == cnt, (uid, cnt, exact[uid])
    # (b) every user with freq > N/capacity is in the candidate top-k
    # superset — with k=10 reported, check only those above the bound
    # that are also in the exact top-10
    top10 = set(exact.sort_values(ascending=False).head(10).index)
    for uid in top10:
        if exact[uid] > n / 64:
            assert uid in set(res["user_id"]), uid


def test_approx_quantiles_within_tolerance(ray_session):
    import __ray_entry__ as m

    exact = m.queries()["doc_token_quantiles"](SF_DIR)
    if hasattr(exact, "to_pandas"):
        exact = exact.to_pandas()
    approx = m.queries()["doc_token_quantiles_approx"](SF_DIR).to_pandas()
    ex = exact.set_index(["lang", "q"])["n_tokens"]
    for _, row in approx.iterrows():
        truth = float(ex.loc[(row["lang"], round(row["q"], 2))])
        assert abs(row["value"] - truth) / max(truth, 1) <= 0.05, \
            (row["lang"], row["q"], row["value"], truth)


def test_approx_quantiles_deterministic(ray_session):
    import ray.data as rd

    from elevant_ray.stages.sketches import approx_quantiles

    tbl = pa.table({"v": np.arange(10_000, dtype=np.int64) % 997})
    a = approx_quantiles(rd.from_arrow(tbl), "v", (0.25, 0.5, 0.75))
    b = approx_quantiles(rd.from_arrow(tbl), "v", (0.25, 0.5, 0.75))
    assert a.equals(b)
    # uniform 0..996: quantile q ≈ 997q, allow sketch rank error
    for q, val in zip(a.column("q").to_pylist(), a.column("value").to_pylist()):
        assert abs(val - 997 * q) <= 997 * 0.02 + 2, (q, val)


def test_bloom_no_false_negatives_and_fp_bound():
    import numpy as np

    from elevant_ray.stages.sketches import bloom_bits, bloom_contains

    rng = np.random.default_rng(31072020)
    members = rng.integers(0, 1 << 62, size=5000, dtype=np.int64)
    words = bloom_bits(members, m_bits=1 << 17, k=4)
    assert bloom_contains(words, members).all(), "false negative"
    probes = rng.integers(0, 1 << 62, size=100_000, dtype=np.int64)
    outside = probes[~np.isin(probes, members)]
    fp = bloom_contains(words, outside).mean()
    # theoretical (1-e^{-kn/m})^k ≈ 4e-4 at n=5000, m=2^17, k=4
    assert fp < 5e-3, fp


def test_bloom_or_merge_equals_union_build():
    import numpy as np

    from elevant_ray.stages.sketches import bloom_bits

    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 62, size=1000, dtype=np.int64)
    b = rng.integers(0, 1 << 62, size=1000, dtype=np.int64)
    m = 1 << 14
    assert ((bloom_bits(a, m) | bloom_bits(b, m))
            == bloom_bits(np.concatenate([a, b]), m)).all()


def test_heavy_hitters_all_tied_returns_empty(ray_session):
    """Review regression: when every merged weight ties at the
    Misra-Gries compression threshold the candidate set is empty —
    must return an empty result, not IndexError."""
    import pyarrow as pa
    import ray.data as rd

    from elevant_ray.stages.sketches import heavy_hitters

    # 130 distinct values, one occurrence each, spread over blocks so
    # per-batch compression never fires (capacity 64 > per-block uniques)
    vals = list(range(130))
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})) \
        .repartition(4)
    out = heavy_hitters(ds, "x", k=5, capacity=128)
    assert out.num_rows == 0


def test_intkeymap_take_empty_map():
    """Review regression: take() on an empty build side returns an
    all-miss mask instead of indexing a 0-length values array."""
    import numpy as np

    from elevant_ray.stages.util import IntKeyMap

    m = IntKeyMap(np.array([], np.int64), np.array([], np.int64))
    vals, found = m.take(np.array([1, 2, 3], np.int64))
    assert not found.any() and len(vals) == 3


def test_hll_registers_rejects_small_p():
    import numpy as np
    import pytest

    from elevant_ray.stages.sketches import hll_registers

    with pytest.raises(ValueError):
        hll_registers(np.array([1, 2, 3], np.int64), p=10)


def test_count_min_never_undercounts_and_bounded_overshoot(ray_session):
    import numpy as np
    import ray.data as rd

    from elevant_ray.stages.sketches import (count_min_estimate,
                                             count_min_matrix)

    rng = np.random.default_rng(7)
    # Zipf-ish key stream with heavy hitters
    keys = rng.zipf(1.5, size=20_000).astype(np.int64) % 500
    ds = rd.from_pandas(__import__("pandas").DataFrame({"k": keys}))
    m = count_min_matrix(ds, "k", width_bits=11, depth=4)
    assert m.shape == (4, 2048)
    assert int(m[0].sum()) == len(keys)  # each row counts every key once
    uniq, exact = np.unique(keys, return_counts=True)
    est = count_min_estimate(m, uniq)
    assert (est >= exact).all()
    # ε = e/width; overshoot beyond εN for ALL of depth rows is ~e^-4
    eps_n = np.e / 2048 * len(keys)
    assert (est - exact <= 2 * eps_n).all()


def test_count_min_query_estimates_match_exact_at_tiny_scale(ray_session):
    import __ray_entry__ as m

    df = m.queries()["user_event_cms_top"]("/root/testdata/sf0.001")
    assert len(df) > 0
    assert (df["cms_est"] >= df["exact_n"]).all()
    assert (df["overcount"] == df["cms_est"] - df["exact_n"]).all()
