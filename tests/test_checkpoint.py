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


class TestPartitionedStage:
    def test_only_missing_shards_rebuild(self, ray_session, tmp_path):
        from elevant_ray.state.checkpoint import run_partitioned_stage

        built = []

        def build(key):
            built.append(key)
            v = int(key)
            return _ds(pa.table({"shard": [v] * 3, "x": [v, v + 1, v + 2]}))

        shards = [(str(k), f"fp:{k}") for k in range(4)]
        out = str(tmp_path / "pstage")
        ds1, rebuilt1 = run_partitioned_stage(shards, build, out, "p")
        assert rebuilt1 == ["0", "1", "2", "3"] and built == rebuilt1
        assert ds1.count() == 12

        # full resume: nothing rebuilds
        ds2, rebuilt2 = run_partitioned_stage(shards, build, out, "p")
        assert rebuilt2 == [] and len(built) == 4
        assert ds2.count() == 12

        # lose ONE shard's output → only that shard re-executes
        import shutil
        shutil.rmtree(os.path.join(out, "shard=2"))
        ds3, rebuilt3 = run_partitioned_stage(shards, build, out, "p")
        assert rebuilt3 == ["2"] and built == ["0", "1", "2", "3", "2"]
        assert ds3.count() == 12
        rows = sorted((r["shard"], r["x"]) for r in ds3.take_all())
        assert rows == sorted((k, k + d) for k in range(4)
                              for d in range(3))

        # per-shard manifests carry lineage
        m = json.load(open(os.path.join(out, "shard=1", "manifest.json")))
        assert m["input_fingerprint"] == "fp:1"
        assert m["row_count"] == 3

    def test_stale_fingerprint_rebuilds_one_shard(self, ray_session,
                                                  tmp_path):
        from elevant_ray.state.checkpoint import run_partitioned_stage

        built = []

        def build(key):
            built.append(key)
            return _ds(pa.table({"x": [len(built)]}))

        out = str(tmp_path / "pstage2")
        run_partitioned_stage([("0", "a"), ("1", "b")], build, out, "p")
        _, rebuilt = run_partitioned_stage([("0", "a"), ("1", "B")],
                                           build, out, "p")
        assert rebuilt == ["1"] and built == ["0", "1", "1"]


class TestLinkagePartitionedResume:
    def test_shard_loss_resumes_minimally(self, ray_session, tmp_path):
        import shutil

        from elevant_ray.pipelines.record_linkage import run_record_linkage

        sf = "/root/testdata/sf0.001"
        ck = str(tmp_path / "ck")
        r1 = run_record_linkage(sf, checkpoint_dir=ck, pages_shards=4)
        assert sorted(r1["rebuilt_shards"]) == ["0", "1", "2", "3"]
        labels1 = sorted((r["node"], r["label"])
                         for r in r1["labels"].take_all())

        # crash scenario: one pages shard lost; downstream stage
        # checkpoints intact → resume re-runs ONLY the lost shard
        shutil.rmtree(os.path.join(ck, "pages", "shard=2"))
        r2 = run_record_linkage(sf, checkpoint_dir=ck, pages_shards=4)
        assert r2["rebuilt_shards"] == ["2"]
        labels2 = sorted((r["node"], r["label"])
                         for r in r2["labels"].take_all())
        assert labels1 == labels2
        assert r1["planted_pairs"] == r2["planted_pairs"]

        # sharded pages == unsharded pages (the url-never-crosses-shards
        # partitioning assumption, end to end)
        r3 = run_record_linkage(sf, checkpoint_dir=str(tmp_path / "ck2"))
        labels3 = sorted((r["node"], r["label"])
                         for r in r3["labels"].take_all())
        assert labels1 == labels3
