"""Canopy blocking: distributed stage vs a brute-force single-partition
reference, plus the algorithm's structural invariants."""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _ref_canopy(df: pd.DataFrame, t1: float, t2: float, buckets: int):
    """Brute-force reference: same min-token-hash bucketing, then the
    sequential McCallum scan per bucket in ascending doc_id order."""
    from elevant_ray.stages.util import hash_bucket_array

    toks = {int(r.doc_id): frozenset(str(r.text).lower().split())
            for r in df.itertuples()}
    keys = {d: min((zlib.crc32(w.encode("utf-8")) for w in ts),
                   default=0) for d, ts in toks.items()}
    karr = pa.array([keys[d] for d in sorted(keys)], pa.int64())
    bkt = hash_bucket_array(karr, buckets).to_pylist()
    by_bucket: dict = {}
    for d, b in zip(sorted(keys), bkt):
        by_bucket.setdefault(b, []).append(d)
    rows = []
    for b in sorted(by_bucket):
        ids = sorted(by_bucket[b])
        alive = {d: True for d in ids}
        for i, d in enumerate(ids):
            if not alive[d]:
                continue
            alive[d] = False
            rows.append((d, d, 1.0))
            for e in ids[i + 1:]:
                if not alive[e]:
                    continue
                a, c = toks[d], toks[e]
                inter = len(a & c)
                union = len(a) + len(c) - inter
                jac = inter / union if union else 0.0
                if jac >= t1:
                    rows.append((d, e, round(jac, 6)))
                    if jac >= t2:
                        alive[e] = False
    return pd.DataFrame(rows, columns=["center", "member", "jac"]) \
        .sort_values(["center", "member"]).reset_index(drop=True)


def test_canopy_matches_reference(ray_session):
    import ray.data as rd

    from elevant_ray.stages.dedup import canopy_blocks

    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).head(300)
    ds = rd.from_pandas(df).repartition(5)
    out = canopy_blocks(ds, id_col="doc_id", text_col="text",
                        t1=0.3, t2=0.6, buckets=8).to_pandas()
    out = out.sort_values(["center", "member"]).reset_index(drop=True) \
        .astype({"center": "int64", "member": "int64"})
    ref = _ref_canopy(df, t1=0.3, t2=0.6, buckets=8)
    pd.testing.assert_frame_equal(out, ref, check_exact=False, rtol=0,
                                  atol=1e-9)


def test_canopy_invariants(ray_session):
    import __ray_entry__ as m

    out = m.queries()["docs_canopy_blocks"](SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id"])
    # every doc appears at least once (as a member of some canopy)
    assert set(docs["doc_id"]) == set(out["member"])
    # every center is a member of its own canopy with jac exactly 1
    self_rows = out[out["center"] == out["member"]]
    assert set(self_rows["center"]) == set(out["center"])
    assert (self_rows["jac"] == 1.0).all()
    # all reported similarities pass the loose threshold
    assert (out["jac"] >= 0.3 - 1e-12).all()
    out2 = m.queries()["docs_canopy_blocks"](SF)
    pd.testing.assert_frame_equal(out, out2)
