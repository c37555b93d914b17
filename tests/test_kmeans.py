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
