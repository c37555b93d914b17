"""Property tests for the window/aggregate combine kernels backing the
driver-contract queries: exact SQL NTILE assignment and the Pearson
correlation closed from mergeable moment sums."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elevant_ray.stages.util import ntile_assign, pearson_from_moments


def _ntile_reference(n: int, k: int) -> list[int]:
    """SQL NTILE per the standard: sizes differ by at most one, larger
    tiles first (one row per rank, 1-based tile numbers)."""
    q, rem = divmod(n, k)
    out = []
    for tile in range(1, k + 1):
        out.extend([tile] * (q + (1 if tile <= rem else 0)))
    return out


@given(st.lists(st.integers(min_value=1, max_value=40), min_size=1,
                max_size=8),
       st.integers(min_value=1, max_value=8))
@settings(max_examples=200, deadline=None)
def test_ntile_matches_sql_semantics(group_sizes, k):
    # build the per-row (size, rank) arrays for several partitions at
    # once — the same shape the bucketed query kernel feeds it
    sizes = np.concatenate([np.full(n, n) for n in group_sizes])
    ranks = np.concatenate([np.arange(n) for n in group_sizes])
    got = ntile_assign(sizes, ranks, k)
    want = np.concatenate([_ntile_reference(n, k) for n in group_sizes])
    assert (got == want).all()


def test_ntile_small_partitions_use_leading_tiles():
    # n < k: each row its own tile, numbered 1..n (DuckDB agrees)
    assert ntile_assign([2, 2], [0, 1], 4).tolist() == [1, 2]


_measurable = st.floats(-100, 100).filter(lambda v: v == 0 or abs(v) >= 1e-6)


@given(st.lists(st.tuples(_measurable, _measurable),
                min_size=3, max_size=200))
@settings(max_examples=200, deadline=None)
def test_pearson_from_moments_matches_numpy(xy):
    # exclude magnitudes whose SQUARES underflow toward subnormal range
    # (e.g. 1e-161² = 1e-322): Σx² then carries no precision and NO
    # single-pass moment form can recover the centered result — outside
    # the kernel's documented bounded-data domain
    x = np.array([p[0] for p in xy])
    y = np.array([p[1] for p in xy])
    n = len(x)
    got = pearson_from_moments(
        [n], [x.sum()], [y.sum()], [(x * y).sum()],
        [(x * x).sum()], [(y * y).sum()])[0]
    if np.std(x) == 0 or np.std(y) == 0:
        assert np.isnan(got)
        return
    # near-constant columns: the subtraction n·Σx²−(Σx)² keeps only the
    # digits below the roundoff of its operands — skip the value
    # comparison when the relative spread is inside that noise band
    if (np.std(x) < 1e-6 * np.abs(x).max()
            or np.std(y) < 1e-6 * np.abs(y).max()):
        assert np.isnan(got) or abs(got) <= 1 + 1e-9
        return
    want = np.corrcoef(x, y)[0, 1]
    if np.isnan(want) or np.isnan(got):
        # one side hit its degenerate-variance floor (near-constant
        # column): both forms must agree it is not a meaningful corr
        assert np.isnan(got) or abs(got) <= 1 + 1e-9
        return
    # moment form is less numerically stable than the centered form;
    # bounded data keeps them within a loose float tolerance
    assert got == np.clip(got, -1 - 1e-9, 1 + 1e-9)
    assert abs(got - want) < 1e-4


def test_pearson_split_merge_associativity():
    # merging per-batch moment partials must equal the single-pass result
    rng = np.random.default_rng(7)
    x = rng.normal(size=1000)
    y = 0.3 * x + rng.normal(size=1000)
    parts = np.array_split(np.arange(1000), 7)
    n = sum(len(p) for p in parts)
    sx = sum(x[p].sum() for p in parts)
    sy = sum(y[p].sum() for p in parts)
    sxy = sum((x[p] * y[p]).sum() for p in parts)
    sx2 = sum((x[p] * x[p]).sum() for p in parts)
    sy2 = sum((y[p] * y[p]).sum() for p in parts)
    merged = pearson_from_moments([n], [sx], [sy], [sxy], [sx2], [sy2])[0]
    single = pearson_from_moments(
        [1000], [x.sum()], [y.sum()], [(x * y).sum()],
        [(x * x).sum()], [(y * y).sum()])[0]
    assert abs(merged - single) < 1e-12


def test_global_ordered_cumsum_matches_numpy(ray_session):
    """Property: the distributed prefix scan equals np.cumsum in key
    order, for sparse non-contiguous keys and values spanning many
    bucket boundaries."""
    import numpy as np
    import ray.data

    from elevant_ray.stages.util import global_ordered_cumsum

    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 1 << 40, size=5000, dtype=np.int64))
    vals = rng.integers(0, 10_000, size=len(keys)).astype(np.int64)
    ds = ray.data.from_arrow(
        __import__("pyarrow").table({"k": keys, "v": vals})
    ).repartition(13)
    out = (global_ordered_cumsum(ds, "k", "v", buckets=32)
           .to_pandas().sort_values("k").reset_index(drop=True))
    order = np.argsort(keys, kind="stable")
    assert (out["k"].to_numpy() == keys[order]).all()
    assert (out["cum"].to_numpy() == np.cumsum(vals[order])).all()


def test_global_ordered_cumsum_empty(ray_session):
    import pyarrow as pa
    import ray.data

    from elevant_ray.stages.util import global_ordered_cumsum

    ds = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                       "v": pa.array([], pa.int64())}))
    assert global_ordered_cumsum(ds, "k", "v") is None


class TestKendallKernels:
    def test_merge_inversions_matches_brute(self):
        import numpy as np

        from elevant_ray.stages.util import merge_inversions

        rng = np.random.RandomState(7)
        for _ in range(100):
            n = rng.randint(0, 60)
            a = rng.randint(0, 8, n)
            brute = sum(1 for i in range(n) for j in range(i + 1, n)
                        if a[i] > a[j])
            assert merge_inversions(a) == brute

    def test_tie_pair_count(self):
        import numpy as np

        from elevant_ray.stages.util import tie_pair_count

        assert tie_pair_count(np.array([], np.int64)) == 0
        assert tie_pair_count(np.array([5])) == 0
        assert tie_pair_count(np.array([3, 3, 3])) == 3
        assert tie_pair_count(np.array([2, 1, 2, 1, 2])) == 4

    def test_knight_identity_matches_brute_force_tau(self):
        """C−D = n0−n1−n2+n3−2I on lexicographically sorted pairs."""
        import numpy as np

        from elevant_ray.stages.util import merge_inversions, tie_pair_count

        rng = np.random.RandomState(11)
        for _ in range(100):
            n = rng.randint(2, 40)
            x = rng.randint(0, 6, n).astype(np.int64)
            y = rng.randint(0, 6, n).astype(np.int64)
            C = D = 0
            for i in range(n):
                for j in range(i + 1, n):
                    s = (x[i] - x[j]) * (y[i] - y[j])
                    if s > 0:
                        C += 1
                    elif s < 0:
                        D += 1
            order = np.lexsort((y, x))
            xs, ys = x[order], y[order]
            n0 = n * (n - 1) // 2
            n1 = tie_pair_count(xs, assume_sorted=True)
            n2 = tie_pair_count(ys)
            new = np.concatenate(
                [[True], (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])])
            sizes = np.diff(np.append(np.flatnonzero(new), n))
            n3 = int((sizes * (sizes - 1) // 2).sum())
            got = n0 - n1 - n2 + n3 - 2 * merge_inversions(ys)
            assert got == C - D
