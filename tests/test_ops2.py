"""Unit tests for the round-1b operators: transitive closure, as-of
join, JSONL article round-trip, and the submit CLI's resume path."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pytest


def _ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


# both paths: driver short-circuit (default cutoff) and distributed
# squaring (cutoff=0) must agree everywhere
CUTOFFS = [16 << 20, 0]


class TestTransitiveClosure:
    @pytest.mark.parametrize("cutoff", CUTOFFS)
    def test_diamond_with_shortcut_keeps_min_depth(self, ray_session, cutoff):
        from elevant_ray.stages.graph import transitive_closure

        # a→b→c plus shortcut a→c: (a,c) must be depth 1, not 2
        edges = _ds(pa.table({"src": [1, 2, 1], "dst": [2, 3, 3]}))
        out = transitive_closure(edges, num_partitions=2,
                                 driver_cutoff=cutoff).to_pandas()
        got = {(r.src, r.dst): r.depth for r in out.itertuples()}
        assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1}

    @pytest.mark.parametrize("cutoff", CUTOFFS)
    def test_chain_depths(self, ray_session, cutoff):
        from elevant_ray.stages.graph import transitive_closure

        edges = _ds(pa.table({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 5]}))
        out = transitive_closure(edges, num_partitions=2,
                                 driver_cutoff=cutoff).to_pandas()
        got = {(r.src, r.dst): r.depth for r in out.itertuples()}
        assert got[(1, 5)] == 4 and got[(2, 5)] == 3 and got[(1, 2)] == 1
        assert len(got) == 10

    @pytest.mark.parametrize("cutoff", CUTOFFS)
    def test_duplicate_edges_deduped(self, ray_session, cutoff):
        from elevant_ray.stages.graph import transitive_closure

        edges = _ds(pa.table({"src": [1, 1, 1], "dst": [2, 2, 2]}))
        out = transitive_closure(edges, num_partitions=2,
                                 driver_cutoff=cutoff).to_pandas()
        assert len(out) == 1

    @pytest.mark.parametrize("cutoff", CUTOFFS)
    def test_cycle_converges_with_reflexive_pairs(self, ray_session, cutoff):
        from elevant_ray.stages.graph import transitive_closure

        # dropping already-known pairs bounds the walk even on cycles:
        # 1⇄2 closes to {(1,2),(2,1),(1,1),(2,2)} and terminates
        edges = _ds(pa.table({"src": [1, 2], "dst": [2, 1]}))
        out = transitive_closure(edges, num_partitions=2,
                                 driver_cutoff=cutoff).to_pandas()
        got = {(r.src, r.dst): r.depth for r in out.itertuples()}
        assert got == {(1, 2): 1, (2, 1): 1, (1, 1): 2, (2, 2): 2}


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


class TestAsofJoin:
    def _run(self, left_tbl, right_tbl):
        from elevant_ray.stages.asof import asof_join

        out = asof_join(_ds(left_tbl), _ds(right_tbl), key="k",
                        left_ts="ts", right_ts="src_ts",
                        left_cols=["eid", "ts"],
                        right_cols=["src_eid", "src_ts"],
                        num_partitions=2)
        return out.to_pandas().sort_values("eid").reset_index(drop=True)

    def test_basic_most_recent_and_equal_ts(self, ray_session):
        left = pa.table({
            "k": [1, 1, 1], "eid": [10, 11, 12],
            "ts": [_ts("2024-01-01T00:05"), _ts("2024-01-01T00:10"),
                   _ts("2024-01-01T00:02")]})
        right = pa.table({
            "k": [1, 1], "src_eid": [100, 101],
            "src_ts": [_ts("2024-01-01T00:02"), _ts("2024-01-01T00:07")]})
        df = self._run(left, right)
        # eid 12 at 00:02 matches src 100 exactly (>= semantics);
        # eid 10 at 00:05 → 100; eid 11 at 00:10 → 101 (most recent)
        assert list(df["src_eid"]) == [100, 101, 100]

    def test_left_rows_before_any_right_are_null(self, ray_session):
        left = pa.table({"k": [1], "eid": [10], "ts": [_ts("2024-01-01")]})
        right = pa.table({"k": [1], "src_eid": [100],
                          "src_ts": [_ts("2025-01-01")]})
        df = self._run(left, right)
        assert df["src_eid"].isna().all()

    def test_key_with_no_right_rows(self, ray_session):
        left = pa.table({"k": [1, 2], "eid": [10, 20],
                         "ts": [_ts("2024-01-01"), _ts("2024-01-01")]})
        right = pa.table({"k": [1], "src_eid": [100],
                          "src_ts": [_ts("2023-01-01")]})
        df = self._run(left, right)
        by_k = df.set_index("eid")
        assert by_k.loc[10, "src_eid"] == 100
        assert pa.compute.is_null(pa.scalar(by_k.loc[20, "src_eid"])) or \
            df[df["eid"] == 20]["src_eid"].isna().all()


class TestJsonlRoundtrip:
    def test_articles_roundtrip(self, ray_session, tmp_path):
        from elevant_ray.sources.jsonl import (ARTICLE_SCHEMA,
                                               read_articles_jsonl,
                                               write_articles_jsonl)

        labels = [[{"id": 0, "begin": 0, "end": 5, "entity_id": "Q1",
                    "name": "Alpha", "parent": None, "optional": False,
                    "type": "Q215627"}],
                  []]
        tbl = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "url": pa.array(["http://a", "http://b"]),
            "title": pa.array(["A", None]),
            "text": pa.array(["Alpha beta.", "Gamma."]),
            "labels": pa.array(labels, ARTICLE_SCHEMA.field("labels").type),
        })
        path = str(tmp_path / "articles")
        write_articles_jsonl(_ds(tbl), path)
        back = read_articles_jsonl(path).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(back["doc_id"]) == [1, 2]
        assert list(back["text"]) == ["Alpha beta.", "Gamma."]
        lbl = back["labels"][0]
        assert lbl[0]["entity_id"] == "Q1" and lbl[0]["end"] == 5
        assert len(back["labels"][1]) == 0

    def test_missing_optional_columns_defaulted(self, ray_session, tmp_path):
        import json as _json

        from elevant_ray.sources.jsonl import read_articles_jsonl

        p = tmp_path / "min.jsonl"
        p.write_text("\n".join(_json.dumps(x) for x in [
            {"doc_id": 7, "url": "http://c", "text": "Delta."}]) + "\n")
        back = read_articles_jsonl(str(p)).to_pandas()
        assert back["title"].isna().all()
        assert len(back["labels"][0]) == 0


CONLL_SAMPLE = """-DOCSTART- (1 testa)
CRICKET
LEICESTERSHIRE\tB\tLEICESTERSHIRE\tLeicestershire\thttp://en.wikipedia.org/wiki/Leicestershire_CCC
TAKE
OVER
AT
TOP
London\tB\tLondon\t--NME--
1996-08-30
-DOCSTART- (2 testa)
Phil\tB\tPhil Simmons\tPhil_Simmons\thttp://en.wikipedia.org/wiki/Phil_Simmons
Simmons\tI\tPhil Simmons\tPhil_Simmons\thttp://en.wikipedia.org/wiki/Phil_Simmons
took
West\tB\tWest Indies\tWest_Indies\thttp://en.wikipedia.org/wiki/West_Indies
Indies\tI\tWest Indies\tWest_Indies\thttp://en.wikipedia.org/wiki/West_Indies
-DOCSTART- (3 testa)
New\tB\tNew Zealand\tNew_Zealand\thttp://en.wikipedia.org/wiki/New_Zealand
Zealand\tB\tNew Zealand\tnull
won
"""


class TestConllReader:
    def test_parse_spans_and_entities(self):
        from elevant_ray.sources.conll import NIL, parse_conll

        arts = parse_conll(CONLL_SAMPLE)
        assert len(arts) == 3
        a0 = arts[0]
        assert a0["text"] == ("CRICKET LEICESTERSHIRE TAKE OVER AT TOP "
                              "London 1996-08-30")
        spans = [(l["begin"], l["end"], l["entity_id"]) for l in a0["labels"]]
        # mention text recovered exactly from the span
        for b, e, _ in spans:
            assert a0["text"][b:e] in ("LEICESTERSHIRE", "London")
        assert spans[0][2].endswith("Leicestershire_CCC")
        assert spans[1][2] == NIL

        a1 = arts[1]
        assert [a1["text"][l["begin"]:l["end"]] for l in a1["labels"]] == \
            ["Phil Simmons", "West Indies"]
        # B/null directly after an open label CONTINUES it
        # (aida_conll_benchmark_reader.py:74 comment); the label closes
        # at the next O token
        a2 = arts[2]
        assert [a2["text"][l["begin"]:l["end"]] for l in a2["labels"]] == \
            ["New Zealand"]

    def test_uri_mapping_and_null_continuation(self):
        from elevant_ray.sources.conll import parse_conll

        qid = {"http://en.wikipedia.org/wiki/Phil_Simmons": "Q2087431"}
        arts = parse_conll(CONLL_SAMPLE, uri_to_qid=qid)
        a1 = arts[1]
        assert a1["labels"][0]["entity_id"] == "Q2087431"
        # unmapped URIs pass through verbatim
        assert a1["labels"][1]["entity_id"].endswith("West_Indies")

    def test_ray_reader_with_split(self, ray_session, tmp_path):
        from elevant_ray.sources.conll import read_conll_benchmark

        p = tmp_path / "bench.tsv"
        p.write_text(CONLL_SAMPLE)
        ds = read_conll_benchmark(str(p))
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(df["doc_id"]) == [0, 1, 2]
        assert df["labels"][0][0]["entity_id"].endswith("Leicestershire_CCC")
        train = read_conll_benchmark(str(p), split="train").to_pandas()
        assert len(train) == 3  # all articles fall in [0, 945]


class TestAlignByPrefix:
    def test_prefix_join_and_collision_count(self, ray_session):
        from elevant_ray.stages.align import align_predictions_by_text

        arts = _ds(pa.table({
            "doc_id": [1, 2, 3],
            "text": ["alpha " * 30, "beta " * 30, "gamma " * 30]}))
        preds = _ds(pa.table({
            "text": ["alpha " * 30, "gamma " * 30, "unmatched text"],
            "pred_qid": ["Q1", "Q3", "Q9"]}))
        out = align_predictions_by_text(arts, preds, num_partitions=2) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(out["doc_id"]) == [1, 3]
        assert list(out["pred_qid"]) == ["Q1", "Q3"]
        assert (out["prefix_collisions"] == 1).all()

    def test_collision_resolves_to_min_doc_id(self, ray_session):
        from elevant_ray.stages.align import align_predictions_by_text

        shared = "same prefix " * 20
        arts = _ds(pa.table({"doc_id": [7, 4], "text": [shared, shared]}))
        preds = _ds(pa.table({"text": [shared], "pred_qid": ["Q5"]}))
        out = align_predictions_by_text(arts, preds, num_partitions=2).to_pandas()
        assert list(out["doc_id"]) == [4]
        assert list(out["prefix_collisions"]) == [2]


class TestBenchmarkStats:
    def test_exact_counts(self, ray_session):
        from elevant_ray.stages.benchmark_stats import benchmark_statistics

        lt = pa.list_(pa.struct([
            ("begin", pa.int32()), ("end", pa.int32()),
            ("entity_id", pa.string()), ("name", pa.string()),
            ("coref", pa.bool_()), ("type", pa.string())]))
        arts = _ds(pa.table({
            "text": pa.array(["Alpha Beta works here.", "it runs fine"]),
            "labels": pa.array([
                [{"begin": 0, "end": 10, "entity_id": "Q1",
                  "name": "Alpha Beta", "coref": None, "type": "Q215627"}],
                [{"begin": 0, "end": 2, "entity_id": "Q2", "name": "it",
                  "coref": True, "type": None}],
            ], lt)}))
        df = benchmark_statistics(arts, num_partitions=2).to_pandas()
        got = {(r.stat, r.key): r.value for r in df.itertuples()}
        assert got[("text", "articles")] == 2
        assert got[("text", "labels")] == 2
        assert got[("text", "words")] == 7
        assert got[("mention_type", "ENTITY_NAMED")] == 1
        assert got[("mention_type", "COREF_PRONOMINAL")] == 1
        assert got[("multi_word", "2")] == 1
        assert got[("multi_word", "1")] == 1
        assert got[("case", "capitalized")] == 1
        assert got[("case", "lowercased")] == 1
        assert got[("entity_type", "Q215627")] == 1
        assert got[("entity_type", "OTHER")] == 1


class TestKcoreAndBlocking:
    def test_kcore_matches_naive_peel(self, ray_session):
        """Differential: the engine's bipartite k-core fixpoint equals a
        naive dict-based peel over the same distinct edge set."""
        import duckdb
        import pandas as pd

        import __ray_entry__ as m

        sf = "/root/testdata/sf0.001"
        got = m.queries()["part_supplier_kcore"](sf)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()

        edges = duckdb.sql(
            f"SELECT DISTINCT l_partkey p, l_suppkey s "
            f"FROM '{sf}/lineitem.parquet'").df()
        pairs = set(zip(edges["p"].tolist(), edges["s"].tolist()))
        while True:
            pdeg, sdeg = {}, {}
            for p, s in pairs:
                pdeg[p] = pdeg.get(p, 0) + 1
                sdeg[s] = sdeg.get(s, 0) + 1
            nxt = {(p, s) for p, s in pairs
                   if pdeg[p] >= 15 and sdeg[s] >= 400}
            if nxt == pairs:
                break
            pairs = nxt
        want = {("part", k): v for k, v in pdeg.items()} if pairs else {}
        want.update({("supplier", k): v for k, v in sdeg.items()}
                    if pairs else {})
        for r in got.itertuples():
            exp = want.get((r.side, r.key), 0)
            assert r.core_degree == exp, (r.side, r.key)
            assert r.in_core == (exp > 0)
        # totality: every part and supplier appears exactly once
        assert len(got) == len({p for p, _ in zip(
            edges["p"], edges["s"])} ) + len(set(edges["s"]))

    def test_blocking_quality_metric_arithmetic(self, ray_session):
        import pandas as pd

        import __ray_entry__ as m

        r = m.queries()["blocking_quality"]("/root/testdata/sf0.001")
        if not isinstance(r, pd.DataFrame):
            r = r.to_pandas()
        assert len(r) == 1
        row = r.iloc[0]
        assert 0 <= row.n_hit <= row.n_gold
        assert row.n_hit <= row.n_candidates
        assert 0.0 <= row.pair_completeness <= 1.0
        assert 0.0 <= row.reduction_ratio <= 1.0
        import numpy as np
        exp_pc = np.floor((1.0 * row.n_hit) / row.n_gold * 1e6 + 0.5) / 1e6
        assert row.pair_completeness == exp_pc
        allp = row.n_pages * (row.n_pages - 1) // 2
        exp_rr = np.floor(
            (1.0 - (1.0 * row.n_candidates) / allp) * 1e6 + 0.5) / 1e6
        assert row.reduction_ratio == exp_rr
        # the canonical-url blocking key guarantees exact-dup urls and
        # mirrors land in a shared block: completeness is high
        assert row.pair_completeness >= 0.9


class TestZlibRatio:
    def test_repetitive_text_compresses_harder(self, ray_session, tmp_path):
        """Monotonicity pin: highly repetitive text must get a lower
        zlib ratio than high-entropy text of the same length."""
        import random

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as m

        rng = random.Random(0)
        noisy = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ")
                        for _ in range(4000))
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["spam " * 800, noisy]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["a", "a"])}),
            str(tmp_path / "documents.parquet"))
        r = m.queries()["doc_zlib_ratio"](str(tmp_path))
        if not isinstance(r, pd.DataFrame):
            r = r.to_pandas()
        r = r.set_index("doc_id")
        assert r.loc[1, "zlib_ratio"] < 0.05
        assert r.loc[2, "zlib_ratio"] > 0.5
        assert r.loc[1, "zlib_ratio"] < r.loc[2, "zlib_ratio"]
