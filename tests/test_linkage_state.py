"""Incremental linkage state (state/linkage_state.py): build from one
crawl batch, fold a second batch in, and assert the effective labels
equal the full-batch clustering label for label — plus re-ingest
idempotence and alias-chain compaction."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _prepared(shard=None):
    from elevant_ray.pipelines.record_linkage import prepare_pages
    from elevant_ray.sources.pages import synth_pages

    return prepare_pages(synth_pages(SF, shard=shard))


def _labels_df(labels_ds) -> pd.DataFrame:
    df = labels_ds.to_pandas()
    return df.sort_values("node").reset_index(drop=True)


@pytest.fixture(scope="module")
def full_batch_labels(ray_session):
    from elevant_ray.pipelines.record_linkage import cluster_pages

    labels, _ = cluster_pages(_prepared(), num_partitions=8)
    return _labels_df(labels)


class TestIncrementalLinkage:
    def test_update_equals_full_batch(self, ray_session, tmp_path,
                                      full_batch_labels):
        from elevant_ray.state.linkage_state import (build_linkage_state,
                                                     read_labels,
                                                     update_linkage_state)

        state = str(tmp_path / "state")
        build_linkage_state(_prepared(shard=(0, 2)), state,
                            num_partitions=8, buckets=8)
        res = update_linkage_state(_prepared(shard=(1, 2)), state,
                                   num_partitions=8)
        assert res["new_nodes"] > 0 and res["dropped_known"] == 0

        got = read_labels(state)
        want = full_batch_labels
        # state labels EVERY url (self for singletons); the full-batch
        # CC labels only matched nodes — compare on its domain, and
        # assert self-labels elsewhere
        assert len(got) == _prepared().count()
        merged = got.merge(want, on="node", how="left",
                           suffixes=("_inc", "_full"))
        on_full = merged["label_full"].notna()
        mism = merged[on_full & (merged["label_inc"]
                                 != merged["label_full"])]
        assert len(mism) == 0, mism.head()
        singles = merged[~on_full]
        assert (singles["label_inc"] == singles["node"]).all()
        assert on_full.sum() == len(want)

        man = json.load(open(os.path.join(state, "manifest.json")))
        assert man["update_seq"] == 1
        assert man["n_pages"] == len(got)

        # re-ingesting the same batch is a no-op (first-crawl wins)
        res2 = update_linkage_state(_prepared(shard=(1, 2)), state,
                                    num_partitions=8)
        assert res2["new_nodes"] == 0
        assert res2["dropped_known"] > 0
        again = read_labels(state)
        pd.testing.assert_frame_equal(again, got)

    def test_distributed_fallback_same_labels(self, ray_session,
                                              tmp_path,
                                              full_batch_labels,
                                              monkeypatch):
        """ELEVANT_RAY_BROADCAST_CUTOFF=0 forces the distributed delta
        path (Dataset blocking/scoring/CC + distributed writes); labels
        must equal the in-process fast path's."""
        from elevant_ray.state.linkage_state import (build_linkage_state,
                                                     read_labels,
                                                     update_linkage_state)

        monkeypatch.setenv("ELEVANT_RAY_BROADCAST_CUTOFF", "0")
        monkeypatch.setenv("ELEVANT_RAY_READ_BLOCKS", "4")
        state = str(tmp_path / "state3")
        build_linkage_state(_prepared(shard=(0, 2)), state,
                            num_partitions=8, buckets=8)
        res = update_linkage_state(_prepared(shard=(1, 2)), state,
                                   num_partitions=8)
        assert res["new_nodes"] > 0
        got = read_labels(state)
        merged = got.merge(full_batch_labels, on="node", how="left",
                           suffixes=("_inc", "_full"))
        on_full = merged["label_full"].notna()
        assert (merged.loc[on_full, "label_inc"]
                == merged.loc[on_full, "label_full"]).all()
        assert (merged.loc[~on_full, "label_inc"]
                == merged.loc[~on_full, "node"]).all()

    def test_compaction_preserves_labels(self, ray_session, tmp_path,
                                         full_batch_labels):
        from elevant_ray.state.linkage_state import (build_linkage_state,
                                                     compact_linkage_state,
                                                     read_labels,
                                                     update_linkage_state)

        state = str(tmp_path / "state2")
        # three-way split: two updates so cluster merges (an entity
        # split across batches) exercise the alias chain
        build_linkage_state(_prepared(shard=(0, 3)), state,
                            num_partitions=8, buckets=8)
        update_linkage_state(_prepared(shard=(1, 3)), state,
                             num_partitions=8)
        update_linkage_state(_prepared(shard=(2, 3)), state,
                             num_partitions=8)
        before = read_labels(state)
        merged = before.merge(full_batch_labels, on="node", how="left",
                              suffixes=("_inc", "_full"))
        on_full = merged["label_full"].notna()
        assert (merged.loc[on_full, "label_inc"]
                == merged.loc[on_full, "label_full"]).all()
        assert (merged.loc[~on_full, "label_inc"]
                == merged.loc[~on_full, "node"]).all()

        compact_linkage_state(state)
        assert not os.path.exists(os.path.join(state, "remap.parquet"))
        after = read_labels(state)
        pd.testing.assert_frame_equal(after, before)

    def test_torn_update_invisible_and_reingestable(self, ray_session,
                                                    tmp_path,
                                                    full_batch_labels):
        """A crash mid-persist (pages delta written, manifest NOT
        bumped) must leave the state logically unchanged: the torn
        urls are invisible to read_labels, are NOT treated as known by
        a retry, and the retry fully ingests the batch to the same
        labels as an uninterrupted run."""
        import pyarrow as pa

        from elevant_ray.state import linkage_state as L

        state = str(tmp_path / "state_torn")
        L.build_linkage_state(_prepared(shard=(0, 2)), state,
                              num_partitions=8, buckets=8)
        clean = L.read_labels(state)

        # simulate the crash: append ONLY the pages delta at the next
        # seq (exactly what a failure after step one of the persist
        # leaves behind), no bands, no labels, no manifest bump
        batch = _prepared(shard=(1, 2)).materialize()
        tbl = pa.concat_tables(
            [b.select(["url", "canon", "text"])
             for b in batch.iter_batches(batch_format="pyarrow")])
        L._append_bucketed_table(tbl, os.path.join(state, "pages"),
                                 "url", 8, seq=1)

        # torn rows invisible to readers
        pd.testing.assert_frame_equal(L.read_labels(state), clean)

        # retry ingests the full batch — nothing "known", no url lost
        res = L.update_linkage_state(_prepared(shard=(1, 2)), state,
                                     num_partitions=8)
        assert res["dropped_known"] == 0
        assert res["new_nodes"] == tbl.num_rows
        got = L.read_labels(state)
        assert len(got) == _prepared().count()
        merged = got.merge(full_batch_labels, on="node", how="left",
                           suffixes=("_inc", "_full"))
        on_full = merged["label_full"].notna()
        assert (merged.loc[on_full, "label_inc"]
                == merged.loc[on_full, "label_full"]).all()
        assert (merged.loc[~on_full, "label_inc"]
                == merged.loc[~on_full, "node"]).all()

    def test_compaction_purges_torn_orphans(self, ray_session,
                                            tmp_path,
                                            full_batch_labels):
        """A compaction after a torn update must NOT commit the
        orphan delta files at its new seq: it purges them first, so
        the torn batch stays invisible and fully re-ingestable."""
        import pyarrow as pa

        from elevant_ray.state import linkage_state as L

        state = str(tmp_path / "state_compact_torn")
        L.build_linkage_state(_prepared(shard=(0, 3)), state,
                              num_partitions=8, buckets=8)
        # an update so the remap chain is non-empty (else compaction
        # is a no-op)
        L.update_linkage_state(_prepared(shard=(1, 3)), state,
                               num_partitions=8)
        clean = L.read_labels(state)

        # torn update at the NEXT seq: pages delta only
        batch = _prepared(shard=(2, 3)).materialize()
        tbl = pa.concat_tables(
            [b.select(["url", "canon", "text"])
             for b in batch.iter_batches(batch_format="pyarrow")])
        seq = L._read_manifest(state)["update_seq"] + 1
        L._append_bucketed_table(tbl, os.path.join(state, "pages"),
                                 "url", 8, seq=seq)

        n = L.compact_linkage_state(state)
        # compaction committed seq — the orphan must be GONE, not
        # promoted into visibility
        pd.testing.assert_frame_equal(L.read_labels(state), clean)
        res = L.update_linkage_state(_prepared(shard=(2, 3)), state,
                                     num_partitions=8)
        assert res["dropped_known"] == 0
        assert res["new_nodes"] == tbl.num_rows
        got = L.read_labels(state)
        merged = got.merge(full_batch_labels, on="node", how="left",
                           suffixes=("_inc", "_full"))
        on_full = merged["label_full"].notna()
        assert (merged.loc[on_full, "label_inc"]
                == merged.loc[on_full, "label_full"]).all()

    def test_remap_cycle_fails_loudly(self, ray_session, tmp_path):
        """A corrupted remap with an alias cycle must raise, not hang
        (the chain is monotone under correct writes, so a cycle is
        always torn/foreign state)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from elevant_ray.state import linkage_state as L

        state = str(tmp_path / "state_cycle")
        L.build_linkage_state(_prepared(shard=(0, 4)), state,
                              num_partitions=8, buckets=8)
        pq.write_table(
            pa.table({"old_label": ["a", "b"], "new_label": ["b", "a"]}),
            os.path.join(state, "remap-0.parquet"))
        with pytest.raises(RuntimeError, match="cycle"):
            L.read_labels(state)

    def test_out_of_order_five_way_ingest(self, ray_session, tmp_path,
                                          full_batch_labels):
        """Five doc-shards ingested out of order (0, then 3,1,4,2):
        alias chains stack across updates; the final effective labels
        must still equal the full-batch clustering."""
        from elevant_ray.state.linkage_state import (build_linkage_state,
                                                     read_labels,
                                                     update_linkage_state)

        state = str(tmp_path / "state5")
        build_linkage_state(_prepared(shard=(0, 5)), state,
                            num_partitions=8, buckets=8)
        for k in (3, 1, 4, 2):
            update_linkage_state(_prepared(shard=(k, 5)), state,
                                 num_partitions=8)
        got = read_labels(state)
        assert len(got) == _prepared().count()
        merged = got.merge(full_batch_labels, on="node", how="left",
                           suffixes=("_inc", "_full"))
        on_full = merged["label_full"].notna()
        mism = merged[on_full & (merged["label_inc"]
                                 != merged["label_full"])]
        assert len(mism) == 0, mism.head()
        assert (merged.loc[~on_full, "label_inc"]
                == merged.loc[~on_full, "node"]).all()


class TestVisibilityRules:
    """Unit tests for the seq-window file-visibility logic the commit
    protocol rests on (no Ray needed beyond the session fixture)."""

    def _mk(self, tmp_path, files):
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = tmp_path / "labels"
        for fname in files:
            d = root / "bkt=0"
            d.mkdir(parents=True, exist_ok=True)
            pq.write_table(pa.table({"node": [fname], "label": [fname]}),
                           str(d / fname))
        return str(root)

    def test_seq_window(self, ray_session, tmp_path):
        from elevant_ray.state import linkage_state as L

        root = self._mk(tmp_path, [
            "base.parquet",            # seq 0 (untagged)
            "delta-1.parquet",
            "delta-2-0.parquet",       # distributed delta at seq 2
            "delta-3.parquet",         # uncommitted (beyond manifest)
            "compact-2.parquet",       # committed compaction
            "compact-3.parquet",       # orphaned compaction
        ])
        def vis(max_seq, compact_seq):
            files = L._read_buckets(root, max_seq=max_seq,
                                    compact_seq=compact_seq,
                                    _want_files=True)
            return sorted(os.path.basename(f) for f in files) \
                if isinstance(files, list) else []

        # no compaction committed: base + deltas <= max_seq
        assert vis(2, 0) == ["base.parquet", "delta-1.parquet",
                             "delta-2-0.parquet"]
        # uncommitted delta-3 invisible at max_seq=2, visible at 3
        assert "delta-3.parquet" in vis(3, 0)
        # committed compaction at 2: ONLY compact-2 plus deltas > 2
        assert vis(2, 2) == ["compact-2.parquet"]
        assert vis(3, 2) == ["compact-2.parquet", "delta-3.parquet"]
        # an orphaned compact-3 never becomes visible unless
        # compact_seq itself is 3
        assert "compact-3.parquet" not in vis(3, 2)
        assert vis(3, 3) == ["compact-3.parquet"]


class TestInterleavedWriters:
    """Two-writer/reader interleavings of the commit protocol: a
    FULLY torn update (every delta file written, manifest not bumped —
    the instant before the commit point) interleaved with a compaction
    in both orders.  Visibility rules must hold at every step and the
    crashed batch must remain exactly re-ingestable.

    The single-writer protocol means writers never run concurrently
    within one mutation — the hazard is a crashed writer's leftovers
    interleaving with the NEXT writer, which is what these simulate
    (the torn files are produced by a real update on a cloned state
    dir, so they are byte-for-byte what a crash leaves behind)."""

    def _torn_files(self, src_state, dst_state, seq):
        """Copy every seq-tagged artifact of a committed mutation from
        a cloned state dir into dst WITHOUT the manifest — exactly the
        on-disk picture one instant before _write_manifest."""
        import shutil

        from elevant_ray.state import linkage_state as L

        copied = 0
        for sub in ("pages", "bands", "labels"):
            sroot = os.path.join(src_state, sub)
            if not os.path.isdir(sroot):
                continue
            for d in sorted(os.listdir(sroot)):
                if not d.startswith("bkt="):
                    continue
                for f in sorted(os.listdir(os.path.join(sroot, d))):
                    if f.endswith(".parquet") and L._file_seq(f) == seq:
                        dst = os.path.join(dst_state, sub, d)
                        os.makedirs(dst, exist_ok=True)
                        shutil.copy2(os.path.join(sroot, d, f),
                                     os.path.join(dst, f))
                        copied += 1
        rm = os.path.join(src_state, f"remap-{seq}.parquet")
        if os.path.exists(rm):
            shutil.copy2(rm, os.path.join(dst_state,
                                          f"remap-{seq}.parquet"))
            copied += 1
        return copied

    def test_update_crashes_then_compactor_runs(self, ray_session,
                                                tmp_path,
                                                full_batch_labels):
        import shutil

        from elevant_ray.state import linkage_state as L

        state = str(tmp_path / "s_a")
        L.build_linkage_state(_prepared(shard=(0, 3)), state,
                              num_partitions=8, buckets=8)
        L.update_linkage_state(_prepared(shard=(1, 3)), state,
                               num_partitions=8)
        clean = L.read_labels(state)
        seq0 = L._read_manifest(state)["update_seq"]

        # writer A: run the REAL update on a clone, then transplant
        # its delta files (not the manifest) = crash right before the
        # commit point
        ghost = str(tmp_path / "s_a_ghost")
        shutil.copytree(state, ghost)
        L.update_linkage_state(_prepared(shard=(2, 3)), ghost,
                               num_partitions=8)
        seq_a = L._read_manifest(ghost)["update_seq"]
        assert seq_a == seq0 + 1
        assert self._torn_files(ghost, state, seq_a) > 0

        # reader between the writers: A's files are invisible
        pd.testing.assert_frame_equal(L.read_labels(state), clean)

        # writer B: compaction commits seq_a as ITS seq — A's orphans
        # must be purged, not promoted into visibility
        L.compact_linkage_state(state)
        man = L._read_manifest(state)
        assert man["update_seq"] == man["compact_seq"] == seq_a
        pd.testing.assert_frame_equal(L.read_labels(state), clean)
        # no stray delta files survived at seq_a
        assert self._torn_files(state, str(tmp_path / "probe"),
                                seq_a) == len(
            [1 for sub in ("pages", "bands", "labels")
             for d in os.listdir(os.path.join(state, sub))
             if d.startswith("bkt=")
             for f in os.listdir(os.path.join(state, sub, d))
             if f == f"compact-{seq_a}.parquet"])

        # writer A retries: the batch is fully unknown and ingests to
        # the full-batch labels
        res = L.update_linkage_state(_prepared(shard=(2, 3)), state,
                                     num_partitions=8)
        assert res["dropped_known"] == 0
        assert res["new_nodes"] == _prepared(shard=(2, 3)).count()
        got = L.read_labels(state)
        merged = got.merge(full_batch_labels, on="node", how="left",
                           suffixes=("_inc", "_full"))
        on_full = merged["label_full"].notna()
        assert (merged.loc[on_full, "label_inc"]
                == merged.loc[on_full, "label_full"]).all()

    def test_compactor_crashes_then_update_runs(self, ray_session,
                                                tmp_path,
                                                full_batch_labels):
        import shutil

        from elevant_ray.state import linkage_state as L

        state = str(tmp_path / "s_b")
        L.build_linkage_state(_prepared(shard=(0, 3)), state,
                              num_partitions=8, buckets=8)
        L.update_linkage_state(_prepared(shard=(1, 3)), state,
                               num_partitions=8)
        clean = L.read_labels(state)
        seq0 = L._read_manifest(state)["update_seq"]

        # writer B: real compaction on a clone, transplant only the
        # compact-<seq> files = crash before the manifest bump
        ghost = str(tmp_path / "s_b_ghost")
        shutil.copytree(state, ghost)
        assert L.compact_linkage_state(ghost) > 0
        seq_b = L._read_manifest(ghost)["update_seq"]
        assert seq_b == seq0 + 1
        n_copied = 0
        lroot = os.path.join(ghost, "labels")
        for d in sorted(os.listdir(lroot)):
            if not d.startswith("bkt="):
                continue
            src = os.path.join(lroot, d, f"compact-{seq_b}.parquet")
            if os.path.exists(src):
                shutil.copy2(src, os.path.join(state, "labels", d,
                                               f"compact-{seq_b}.parquet"))
                n_copied += 1
        assert n_copied > 0

        # reader: an uncommitted compaction is invisible (compact
        # files need seq == compact_seq EXACTLY)
        pd.testing.assert_frame_equal(L.read_labels(state), clean)

        # writer A: an update commits seq_b as its own seq — B's
        # orphan compact files must be purged first, or they would
        # shadow every older label delta the moment compact_seq catches
        # up (here: remain invisible since compact_seq stays behind)
        res = L.update_linkage_state(_prepared(shard=(2, 3)), state,
                                     num_partitions=8)
        assert res["dropped_known"] == 0
        for d in sorted(os.listdir(os.path.join(state, "labels"))):
            if d.startswith("bkt="):
                assert f"compact-{seq_b}.parquet" not in os.listdir(
                    os.path.join(state, "labels", d))
        got = L.read_labels(state)
        merged = got.merge(full_batch_labels, on="node", how="left",
                           suffixes=("_inc", "_full"))
        on_full = merged["label_full"].notna()
        assert (merged.loc[on_full, "label_inc"]
                == merged.loc[on_full, "label_full"]).all()

        # and a fresh compaction afterwards still converges
        L.compact_linkage_state(state)
        got2 = L.read_labels(state)
        pd.testing.assert_frame_equal(
            got2.sort_values("node").reset_index(drop=True),
            got.sort_values("node").reset_index(drop=True))
