"""Perceptual-hash near-dup: the 4×16-bit band LSH must find EXACTLY
the Hamming-≤3 pairs (pigeonhole recall 1.0, verify removes false
candidates) — checked against a driver brute force at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _brute_force(hashes_df, max_hamming=3):
    ids = hashes_df["doc_id"].to_numpy(np.int64)
    ph = hashes_df["phash"].to_numpy(np.int64).view(np.uint64)
    i, j = np.triu_indices(len(ids), k=1)
    x = ph[i] ^ ph[j]
    ham = np.zeros(len(x), np.int64)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    keep = ham <= max_hamming
    lo = np.minimum(ids[i][keep], ids[j][keep])
    hi = np.maximum(ids[i][keep], ids[j][keep])
    return (pd.DataFrame({"left": lo, "right": hi,
                          "hamming": ham[keep]})
            .sort_values(["left", "right"]).reset_index(drop=True))


@pytest.fixture(scope="module")
def hashes_df(ray_session):
    import ray.data as rd

    from elevant_ray.stages.multimodal import (PHashStage,
                                               add_media_variants,
                                               synth_media_batch)

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow") \
        .map_batches(add_media_variants, batch_format="pyarrow")
    hashes = media.map_batches(PHashStage, concurrency=2, batch_size=64,
                               batch_format="pyarrow")
    return hashes.to_pandas()


def test_banded_equals_brute_force(ray_session, hashes_df):
    import ray.data as rd

    from elevant_ray.stages.multimodal import phash_near_pairs

    banded = phash_near_pairs(
        rd.from_pandas(hashes_df), max_hamming=3).to_pandas() \
        .drop_duplicates(["left", "right"]) \
        .sort_values(["left", "right"]).reset_index(drop=True)
    brute = _brute_force(hashes_df)
    pd.testing.assert_frame_equal(
        banded.astype({"left": "int64", "right": "int64",
                       "hamming": "int64"}),
        brute.astype({"left": "int64", "right": "int64",
                      "hamming": "int64"}))


def test_planted_variants_found(ray_session, hashes_df):
    from elevant_ray.stages.multimodal import VARIANT_ID_OFFSET

    import __ray_entry__ as m

    out = m.queries()["multimodal_phash_dedup"](SF)
    planted = set(hashes_df.loc[
        hashes_df["doc_id"] >= VARIANT_ID_OFFSET, "doc_id"]
        - VARIANT_ID_OFFSET)
    assert planted, "fixture should plant variants"
    got = set(zip(out["left"], out["right"]))
    for d in planted:
        assert (d, d + VARIANT_ID_OFFSET) in got

    out2 = m.queries()["multimodal_phash_dedup"](SF)
    pd.testing.assert_frame_equal(out, out2)
