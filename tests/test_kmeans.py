"""Differential + determinism gates for the distributed Lloyd's
k-means stage (stages/knn.py lloyd_kmeans): the Ray pipeline must
reproduce a single-node numpy reference exactly (same init, same
tie-breaks, same drop-empty semantics), and repeated runs must agree.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _numpy_reference(k=8, iters=4):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    X = np.stack([np.asarray(v, np.float64)
                  for v in t.column("embedding").to_pylist()])
    order = np.argsort(ids, kind="stable")
    C = X[order[:k]]
    cids = np.arange(len(C), dtype=np.int64)
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        cnt = np.bincount(a, minlength=len(cids))
        keep = cnt > 0
        S = np.zeros_like(C)
        np.add.at(S, a, X)
        C = S[keep] / cnt[keep, None]
        cids = cids[keep]
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return ids, cids[d2.argmin(axis=1)]


def test_kmeans_matches_numpy_reference(ray_session):
    import __ray_entry__ as m

    got = m.queries()["embedding_kmeans"](SF_DIR)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    ids, want = _numpy_reference()
    order = np.argsort(ids, kind="stable")
    assert (got["vec_id"].to_numpy() == ids[order]).all()
    assert (got["cluster"].to_numpy() == want[order]).all()
    # useful clustering, not a degenerate single blob
    assert len(np.unique(want)) >= 2


def test_kmeans_deterministic(ray_session):
    import __ray_entry__ as m

    a = m.queries()["embedding_kmeans"](SF_DIR)
    b = m.queries()["embedding_kmeans"](SF_DIR)
    a = a.to_pandas() if hasattr(a, "to_pandas") else a
    b = b.to_pandas() if hasattr(b, "to_pandas") else b
    assert a.equals(b)


def test_kmeans_drops_empty_clusters(ray_session):
    """Crafted input where most seed centroids lose every member after
    the first mean recompute: the stage must drop them (SQL inner-join
    semantics) and keep cluster ids stable, matching the same algorithm
    run inline."""
    import pyarrow as pa
    import ray.data as rd

    from elevant_ray.stages.knn import lloyd_kmeans

    # ids 0..3 seed k=4, but seed 1 duplicates seed 0's location: every
    # point at the origin (including seed 1's own) ties to centroids 0
    # and 1 and argmin breaks to the lower cid — cluster 1 receives no
    # members in iteration 1 and must be dropped, while ids 2 and 3
    # keep their original cluster numbers
    vecs = [[0.0, 0.0], [0.0, 0.0], [0.0, 10.0], [10.0, 10.0]]
    vecs += [[0.0, 0.0]] * 20
    t = pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array(vecs,
                                        pa.list_(pa.float32()))})
    out = (lloyd_kmeans(rd.from_arrow(t).repartition(3), k=4, iters=3)
           .to_pandas().sort_values("vec_id"))
    assert set(out["cluster"]) == {0, 2, 3}
    assert (out[out["vec_id"] >= 4]["cluster"] == 0).all()
