"""Unit tests for the round-1b operators: transitive closure, as-of
join, JSONL article round-trip, and the submit CLI's resume path."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pytest


def _ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


class TestTransitiveClosure:
    def test_diamond_with_shortcut_keeps_min_depth(self, ray_session):
        from elevant_ray.stages.graph import transitive_closure

        # a→b→c plus shortcut a→c: (a,c) must be depth 1, not 2
        edges = _ds(pa.table({"src": [1, 2, 1], "dst": [2, 3, 3]}))
        out = transitive_closure(edges, num_partitions=2).to_pandas()
        got = {(r.src, r.dst): r.depth for r in out.itertuples()}
        assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1}

    def test_chain_depths(self, ray_session):
        from elevant_ray.stages.graph import transitive_closure

        edges = _ds(pa.table({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 5]}))
        out = transitive_closure(edges, num_partitions=2).to_pandas()
        got = {(r.src, r.dst): r.depth for r in out.itertuples()}
        assert got[(1, 5)] == 4 and got[(2, 5)] == 3 and got[(1, 2)] == 1
        assert len(got) == 10

    def test_duplicate_edges_deduped(self, ray_session):
        from elevant_ray.stages.graph import transitive_closure

        edges = _ds(pa.table({"src": [1, 1, 1], "dst": [2, 2, 2]}))
        out = transitive_closure(edges, num_partitions=2).to_pandas()
        assert len(out) == 1

    def test_cycle_converges_with_reflexive_pairs(self, ray_session):
        from elevant_ray.stages.graph import transitive_closure

        # dropping already-known pairs bounds the walk even on cycles:
        # 1⇄2 closes to {(1,2),(2,1),(1,1),(2,2)} and terminates
        edges = _ds(pa.table({"src": [1, 2], "dst": [2, 1]}))
        out = transitive_closure(edges, num_partitions=2).to_pandas()
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
