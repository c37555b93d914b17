"""Incremental grouped aggregation (state/incremental.py): per-bucket
merges over persisted state, exactly-once replay, untouched-bucket
carryover."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def two_increments(ray_session):
    import ray.data as rd

    a = rd.from_arrow(pa.table({"k": ["x", "y", "x"], "n": [1, 2, 3]}))
    b = rd.from_arrow(pa.table({"k": ["y", "z"], "n": [10, 5]}))
    return a, b


def test_incremental_equals_oneshot(two_increments, tmp_path):
    from elevant_ray.state.incremental import incremental_group_sum

    a, b = two_increments
    state = str(tmp_path / "state")
    incremental_group_sum(state, a, ["k"], ["n"], "inc-a")
    out = incremental_group_sum(state, b, ["k"], ["n"], "inc-b")
    want = pd.DataFrame({"k": ["x", "y", "z"], "n": [4, 12, 5]})
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True).astype({"n": "int64"}), want)


def test_replay_is_noop(two_increments, tmp_path):
    from elevant_ray.state.incremental import incremental_group_sum

    a, _ = two_increments
    state = str(tmp_path / "state")
    first = incremental_group_sum(state, a, ["k"], ["n"], "inc-a")
    again = incremental_group_sum(state, a, ["k"], ["n"], "inc-a")
    pd.testing.assert_frame_equal(first, again)


def test_untouched_buckets_carry_over(ray_session, tmp_path):
    import ray.data as rd

    from elevant_ray.state.incremental import incremental_group_sum

    state = str(tmp_path / "state")
    base = rd.from_arrow(pa.table({"k": [f"k{i}" for i in range(64)],
                                   "n": list(range(64))}))
    incremental_group_sum(state, base, ["k"], ["n"], "base", num_buckets=8)
    sizes0 = {f: os.path.getmtime(os.path.join(state, f))
              for f in os.listdir(state) if f.startswith("bucket")}
    inc = rd.from_arrow(pa.table({"k": ["k0"], "n": [100]}))
    out = incremental_group_sum(state, inc, ["k"], ["n"], "inc1")
    assert out.set_index("k").loc["k0", "n"] == 100
    # every bucket file still present; only k0's bucket re-merged
    assert set(os.listdir(state)) - {"manifest.json"} == set(sizes0)


def test_empty_increment_records_id(ray_session, tmp_path):
    import ray.data as rd

    from elevant_ray.state.incremental import incremental_group_sum, read_state

    state = str(tmp_path / "state")
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                    "n": pa.array([], pa.int64())}))
    out = incremental_group_sum(state, empty, ["k"], ["n"], "e1")
    assert len(out) == 0
    assert len(read_state(state)) == 0
