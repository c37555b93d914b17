"""Incremental grouped aggregation over persisted bucketed state.

The production shape of the reference's offline dictionary builds
(``scripts/get_link_frequencies.py``, ``count_unigrams.py`` — full-corpus
rescans on every refresh): fold an append-only *increment* into saved
aggregate state instead of recomputing from scratch.

Design (per-bucket merge, not a global shuffle):

- state lives in ``state_dir`` as one Parquet file per hash bucket of
  the group key, plus ``manifest.json`` recording the applied increment
  ids, the bucket count, and the schema;
- an increment is first shrunk by the engine's two-phase partial
  aggregation (the increment is small next to the state, so its driver
  combine is bounded by the increment's own group count);
- only buckets the increment actually touches are read + re-merged +
  rewritten; untouched bucket files carry over as-is — update cost is
  O(increment + touched state), independent of total state size;
- the swap is write-to-temp then atomic rename, and ``increment_id``
  makes replays exactly-once: re-applying a recorded increment is a
  no-op (the idempotence a restarted 100 TB job needs).
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

import numpy as np
import pandas as pd


def _manifest(state_dir: str) -> dict | None:
    p = os.path.join(state_dir, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _bucket_of(key_frame: pd.DataFrame, num_buckets: int) -> np.ndarray:
    crcs = [zlib.crc32("\x00".join(str(v) for v in row).encode("utf-8"))
            % num_buckets
            for row in key_frame.itertuples(index=False, name=None)]
    return np.asarray(crcs, dtype=np.int64)


def read_state(state_dir: str) -> pd.DataFrame:
    """Current aggregate state, concatenated across buckets."""
    man = _manifest(state_dir)
    if man is None:
        return pd.DataFrame()
    parts = []
    for i in range(man["buckets"]):
        p = os.path.join(state_dir, f"bucket={i}.parquet")
        if os.path.exists(p):
            parts.append(pd.read_parquet(p))
    if not parts:
        return pd.DataFrame(columns=man["keys"] + man["sum_cols"])
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(man["keys"], kind="stable").reset_index(drop=True)


def incremental_group_sum(state_dir: str, ds, keys, sum_cols,
                          increment_id: str,
                          num_buckets: int = 16) -> pd.DataFrame:
    """Fold ``ds`` (one increment) into the grouped-sum state and return
    the updated state.  Exactly-once per ``increment_id``."""
    from elevant_ray.stages.util import partial_group_agg

    keys, sum_cols = list(keys), list(sum_cols)
    man = _manifest(state_dir)
    if man is not None and increment_id in man["applied"]:
        return read_state(state_dir)  # replay → no-op
    if man is None:
        man = {"applied": [], "buckets": num_buckets, "keys": keys,
               "sum_cols": sum_cols}
    assert man["keys"] == keys and man["sum_cols"] == sum_cols

    inc = partial_group_agg(ds, keys, sum_cols=sum_cols, combine="driver")
    tmp = state_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    touched = set()
    if not inc.empty:
        bkt = _bucket_of(inc[keys], man["buckets"])
        for i in np.unique(bkt):
            part = inc[bkt == i]
            old_p = os.path.join(state_dir, f"bucket={int(i)}.parquet")
            if os.path.exists(old_p):
                part = pd.concat([pd.read_parquet(old_p), part],
                                 ignore_index=True)
            merged = (part.groupby(keys, as_index=False)[sum_cols].sum()
                      .sort_values(keys, kind="stable")
                      .reset_index(drop=True))
            merged.to_parquet(os.path.join(tmp, f"bucket={int(i)}.parquet"),
                              index=False)
            touched.add(int(i))
    # untouched buckets carry over unchanged — the incremental win
    for i in range(man["buckets"]):
        if i in touched:
            continue
        old_p = os.path.join(state_dir, f"bucket={i}.parquet")
        if os.path.exists(old_p):
            shutil.copy2(old_p, os.path.join(tmp, f"bucket={i}.parquet"))
    man["applied"] = man["applied"] + [increment_id]
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(man, f)
    shutil.rmtree(state_dir, ignore_errors=True)
    os.rename(tmp, state_dir)
    return read_state(state_dir)
