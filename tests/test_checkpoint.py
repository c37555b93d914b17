"""Checkpoint / resume (state/checkpoint.py) — the north-rule lineage
manifests: per-partition row counts, input fingerprint, atomic rename,
and mid-pipeline resume that skips completed stages."""

from __future__ import annotations

import json
import os

import pyarrow as pa


def _ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


class TestRunStage:
    def test_build_once_then_resume_reads_back(self, ray_session, tmp_path):
        from elevant_ray.state.checkpoint import run_stage

        calls = []

        def build():
            calls.append(1)
            return _ds(pa.table({"a": [1, 2, 3]}))

        out = str(tmp_path / "stage1")
        ds1, resumed1 = run_stage(build, out, "stage1", "fp-abc")
        assert not resumed1 and len(calls) == 1
        assert sorted(r["a"] for r in ds1.take_all()) == [1, 2, 3]

        ds2, resumed2 = run_stage(build, out, "stage1", "fp-abc")
        assert resumed2 and len(calls) == 1  # not rebuilt
        assert sorted(r["a"] for r in ds2.take_all()) == [1, 2, 3]

    def test_fingerprint_change_rebuilds(self, ray_session, tmp_path):
        from elevant_ray.state.checkpoint import run_stage

        calls = []

        def build():
            calls.append(1)
            return _ds(pa.table({"a": [len(calls)]}))

        out = str(tmp_path / "stage2")
        run_stage(build, out, "stage2", "fp-1")
        ds, resumed = run_stage(build, out, "stage2", "fp-2")
        assert not resumed and len(calls) == 2
        assert ds.take_all()[0]["a"] == 2

    def test_manifest_contents(self, ray_session, tmp_path):
        from elevant_ray.state.checkpoint import write_checkpoint

        out = str(tmp_path / "stage3")
        write_checkpoint(_ds(pa.table({"a": list(range(10))})), out,
                         "stage3", "fp-xyz", extra_metrics={"note": "m"})
        manifest = json.load(open(os.path.join(out, "manifest.json")))
        assert manifest["stage"] == "stage3"
        assert manifest["input_fingerprint"] == "fp-xyz"
        assert manifest["complete"] is True
        assert manifest["row_count"] == 10
        assert sum(manifest["partitions"].values()) == 10
        assert manifest["note"] == "m"
        assert not os.path.exists(out + ".tmp")  # atomic rename, no débris

    def test_incomplete_checkpoint_is_rebuilt(self, ray_session, tmp_path):
        from elevant_ray.state.checkpoint import is_complete, run_stage

        out = str(tmp_path / "stage4")
        os.makedirs(out)
        # torn write: data but no manifest
        with open(os.path.join(out, "part-0.parquet"), "wb") as f:
            f.write(b"not parquet")
        assert not is_complete(out, "fp")
        ds, resumed = run_stage(
            lambda: _ds(pa.table({"a": [7]})), out, "stage4", "fp")
        assert not resumed
        assert ds.take_all()[0]["a"] == 7


class TestLinkageResume:
    def test_end_to_end_resume_identical_labels(self, ray_session, tmp_path):
        from elevant_ray.pipelines.record_linkage import run_record_linkage

        ck = str(tmp_path / "ck")
        r1 = run_record_linkage("/root/testdata/sf0.001", checkpoint_dir=ck)
        labels1 = sorted((r["node"], r["label"])
                         for r in r1["labels"].take_all())
        manifests = {}
        for stage in ("pages", "edges", "labels"):
            p = os.path.join(ck, stage, "manifest.json")
            manifests[stage] = (os.path.getmtime(p),
                                json.load(open(p))["row_count"])

        r2 = run_record_linkage("/root/testdata/sf0.001", checkpoint_dir=ck)
        labels2 = sorted((r["node"], r["label"])
                         for r in r2["labels"].take_all())
        assert labels1 == labels2
        assert r1["planted_pairs"] == r2["planted_pairs"]
        for stage in ("pages", "edges", "labels"):
            p = os.path.join(ck, stage, "manifest.json")
            # untouched manifests ⇒ the stages were resumed, not re-run
            assert os.path.getmtime(p) == manifests[stage][0]
