"""Numpy differential gate for the distributed PCA pipeline: the
covariance assembled from streaming per-batch (n, Σx, XᵀX) partials must
match an in-memory numpy covariance of the same rows, and the reported
eigenpair must match np.linalg.eigh on it.  Float reduction order
differs between the partial fold and the one-shot numpy sum, so the
comparison uses tight tolerances, not bit equality (rounded to 6
decimals in the query output, the difference is invisible)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _full_numpy():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    col = t.column("embedding").combine_chunks()
    dim = len(col[0])
    X = (col.flatten().to_numpy(zero_copy_only=False)
         .astype(np.float64).reshape(len(t), dim))
    return X


def test_covariance_moments_match_numpy(ray_session):
    import ray.data

    from elevant_ray.stages.knn import covariance_moments

    X = _full_numpy()
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet",
                               columns=["embedding"])
    n, s, ss = covariance_moments(ds, "embedding")
    assert n == len(X)
    np.testing.assert_allclose(s, X.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(ss, X.T @ X, rtol=1e-10)


def test_pca_top_matches_eigh(ray_session):
    import __ray_entry__ as m

    X = _full_numpy()
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    vec = v[:, -1]
    if vec[np.argmax(np.abs(vec))] < 0:
        vec = -vec

    out = m.queries()["embedding_pca_top"](SF_DIR)
    np.testing.assert_allclose(out["mean"].to_numpy(), np.round(mean, 6),
                               atol=2e-6)
    np.testing.assert_allclose(out["pc1"].to_numpy(), np.round(vec, 6),
                               atol=2e-6)
    np.testing.assert_allclose(out["eigenvalue"].to_numpy()[0],
                               round(float(w[-1]), 6), atol=2e-6)


def test_top_eigenpair_sign_and_value():
    from elevant_ray.stages.knn import top_eigenpair

    rng = np.random.default_rng(7)
    A = rng.normal(size=(16, 200))
    C = A @ A.T / 200
    val, vec = top_eigenpair(C)
    w, V = np.linalg.eigh(C)
    assert abs(val - w[-1]) / w[-1] < 1e-12
    assert abs(abs(vec @ V[:, -1]) - 1.0) < 1e-12
    assert vec[np.argmax(np.abs(vec))] > 0
