"""PAVA isotonic regression: differential test against the O(n²)
brute-force pooling definition + invariants (monotone, weighted-mean
preserving, idempotent), plus determinism of the query."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _pava_reference(y, w):
    """O(n²) reference: repeatedly merge any adjacent violating blocks."""
    blocks = [[yi, wi, 1] for yi, wi in zip(y, w)]
    changed = True
    while changed:
        changed = False
        for k in range(len(blocks) - 1):
            if blocks[k][0] > blocks[k + 1][0]:
                v = (blocks[k][0] * blocks[k][1]
                     + blocks[k + 1][0] * blocks[k + 1][1]) \
                    / (blocks[k][1] + blocks[k + 1][1])
                blocks[k] = [v, blocks[k][1] + blocks[k + 1][1],
                             blocks[k][2] + blocks[k + 1][2]]
                del blocks[k + 1]
                changed = True
                break
    out = []
    for v, _, c in blocks:
        out.extend([v] * c)
    return np.array(out)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=-10**6, max_value=10**6),
    st.integers(min_value=1, max_value=50)), min_size=1, max_size=40))
def test_pava_matches_reference(pairs):
    import __ray_entry__ as m

    y = np.array([p[0] for p in pairs], np.float64)
    w = np.array([p[1] for p in pairs], np.float64)
    got = m.pava_isotonic(y, w)
    want = _pava_reference(y, w)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-9)
    # monotone non-decreasing
    assert (np.diff(got) >= -1e-9).all()
    # weighted mean preserved
    assert np.isclose((got * w).sum(), (y * w).sum(), rtol=1e-12)
    # idempotent
    assert np.allclose(m.pava_isotonic(got, w), got, rtol=1e-12)


def test_isotonic_query_deterministic(ray_session):
    import pandas as pd

    import __ray_entry__ as m

    a = m.queries()["part_price_isotonic"]("/root/testdata/sf0.001")
    b = m.queries()["part_price_isotonic"]("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert (a["iso_cents"].diff().dropna() >= 0).all()
