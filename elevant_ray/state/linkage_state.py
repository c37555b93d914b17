"""Incremental record linkage against persisted cluster state.

At 10^12 documents a daily crawl delta is ~10^9 pages; re-clustering
the full corpus per delta is not an option.  This module persists the
flagship's linkage state as bucketed Parquet and folds a new page
batch in by touching only the buckets the batch actually hits.

State layout (all Parquet, shared-FS / object-store friendly)::

    state/pages/bkt=<k>/    (url, canon, text)   hash(url) buckets
    state/bands/bkt=<k>/    (band_key, url)      hash(band_key) buckets
    state/labels/bkt=<k>/   (node, label)        hash(node) buckets
    state/remap.parquet     (old_label, new_label) alias chain
    state/manifest.json     counts, bucket count, update sequence

Update path (`update_linkage_state`):

1. urls already in state are dropped (first-crawl wins — the same node
   identity rule as the flagship's url-dedup); the membership probe
   reads ONLY the page buckets the new urls hash into.
2. the batch's blocking keys (deterministic per page —
   `stages/dedup.blocking_keys`) probe ONLY the band buckets its keys
   hash into; probed state rows are filtered to the batch's key set.
3. candidate pairs expand with the same skew-guarded bucket kernel as
   the full batch (`stages/dedup.pairs_from_keys`), then keep only
   pairs touching >= 1 new url (old-old connectivity is already in the
   labels).
4. scoring (`stages/scoring.verify_pairs`) sees old texts only for
   touched endpoints (pruned page-bucket read).
5. the merge runs connected components over new nodes + old LABEL
   ROOTS as virtual nodes, so an old component enters as one node and
   old connectivity costs nothing.  Labels stay "min url of the
   component" exactly as in the full batch, so incremental state ==
   full-batch clustering, label for label (tests/test_linkage_state.py
   asserts equality).  Caveat: the equality contract holds while no
   blocking-key group crosses ``max_block`` between builds — beyond
   it the skew-guard star+chain pair set is membership-dependent, and
   incremental ingest is then MONOTONE (it keeps every match the
   state already scored, never splitting past clusters), which can
   retain a borderline edge a from-scratch run of the combined corpus
   would not have generated.  That is the standard incremental-ER
   contract; a periodic `build_linkage_state` rebuild reconciles.
6. cluster merges append (old_label -> new_label) alias rows instead
   of rewriting every label bucket; readers resolve the alias chain
   (driver-side path compression over the small remap table) and
   `compact_linkage_state` folds it back into the buckets as an
   explicit, schedulable O(state) pass.

Commit protocol (crash safety): every delta file is named with the
update sequence that produced it (``delta-<seq>[-<i>].parquet``,
``compact-<seq>.parquet``, ``remap-<seq>.parquet``) and readers only
see files whose seq is <= the manifest's ``update_seq`` (label deltas
additionally require seq > ``compact_seq``; compact files require
seq == ``compact_seq`` exactly).  The manifest itself is
replaced atomically (tmp + ``os.replace``) and is written LAST, so an
update that crashes mid-persist leaves only invisible files: a re-run
re-ingests the same batch from scratch instead of half-seeing it
(pages present but bands/labels missing would silently exclude those
urls from candidate generation forever).  Distributed-path deltas are
staged under ``_staging-<seq>/`` and moved into the bucket dirs under
seq-tagged names before the manifest bump; single-writer protocol
throughout (concurrent updates would need a coordinator).

Scale assumptions (explicit, per the north rule): the DELTA is small
relative to state — its url set, key set and touched-endpoint texts
ride in broadcasts bounded by the delta, never by the state.  State
reads are always bucket-pruned.  A delta comparable to the state is a
rebuild (`build_linkage_state`), not an update.

Reference anchor: the reference re-links whole corpora per run
(link_benchmark.py:63, link_text.py:77 — full rescans, no state); the
incremental path is the engine-side answer to the same workload
arriving as a stream of crawl batches.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import pyarrow as pa

_MANIFEST = "manifest.json"


def _hash_np(values, buckets: int):
    """Stable crc32 bucket per string value (matches
    util.hash_bucket_array semantics for strings)."""
    import zlib

    import numpy as np

    return np.asarray([zlib.crc32(str(v).encode("utf-8")) % buckets
                       for v in values], dtype=np.int64)


def _write_bucketed(ds, root: str, key: str, buckets: int):
    """Write `ds` partitioned by hash(key) bucket (hive dirs bkt=<k>)."""
    from elevant_ray.stages.util import hash_bucket_array

    def add_bkt(b: pa.Table) -> pa.Table:
        return b.append_column("bkt", hash_bucket_array(b.column(key),
                                                        buckets))

    ds.map_batches(add_bkt, batch_format="pyarrow") \
        .write_parquet(root, partition_cols=["bkt"])


def _append_bucketed_table(tbl: pa.Table, root: str, key: str,
                           buckets: int, seq: int):
    """Driver-side bucketed append of a (small) delta table: one new
    file per touched bucket, named by update sequence (single-writer
    protocol — concurrent updates would need a coordinator)."""
    import numpy as np
    import pyarrow.parquet as pq

    bk = _hash_np(tbl.column(key).to_pylist(), buckets)
    for k in np.unique(bk):
        sub = tbl.filter(pa.array(bk == k))
        d = os.path.join(root, f"bkt={int(k)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub, os.path.join(d, f"delta-{seq}.parquet"))


def _file_seq(fname: str) -> int:
    """Update sequence encoded in a state file name; files without a
    seq tag (distributed-build base files from ``_write_bucketed``)
    are the seq-0 base."""
    import re

    m = re.match(r"(?:delta|compact)-(\d+)", fname)
    return int(m.group(1)) if m else 0


def _read_buckets(root: str, bucket_ids=None, drop=("bkt",),
                  empty_schema: pa.Schema = None, max_seq=None,
                  compact_seq=None, _want_files: bool = False):
    """Dataset over the given bucket dirs (all when None); missing
    dirs are skipped (empty buckets are simply never written).

    Visibility (the commit protocol): delta/base files need
    ``compact_seq < seq <= max_seq`` (``max_seq`` = the manifest's
    committed ``update_seq``; files beyond it are torn, uncommitted
    deltas and MUST be ignored).  ``compact-<seq>`` files need
    ``seq == compact_seq`` exactly — an uncommitted compaction's seq
    can later be reused by an update's delta, so "<= max_seq" alone
    would surface orphaned compact duplicates.  When nothing
    qualifies, returns an empty Dataset with `empty_schema` so
    downstream column selects / unions still typecheck."""
    import ray.data as rd

    if bucket_ids is None:
        names = sorted(os.listdir(root)) if os.path.isdir(root) else []
        dirs = [os.path.join(root, d) for d in names
                if d.startswith("bkt=")]
    else:
        dirs = [os.path.join(root, f"bkt={int(k)}")
                for k in sorted(set(int(x) for x in bucket_ids))]
        dirs = [d for d in dirs if os.path.isdir(d)]
    files = []
    for d in dirs:
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            s = _file_seq(f)
            if f.startswith("compact-"):
                if compact_seq is None or s != compact_seq:
                    continue
            else:
                # a committed compaction at seq C subsumes every
                # delta/base at s <= C (the purge guarantees no delta
                # shares C, but exclude s == C too — defense in depth
                # against double-counting)
                if compact_seq and s <= compact_seq:
                    continue
                if max_seq is not None and s > max_seq:
                    continue
            files.append(os.path.join(d, f))
    if not files:
        schema = empty_schema or pa.schema([("url", pa.string())])
        return rd.from_arrow(schema.empty_table())
    if _want_files:
        return files
    ds = rd.read_parquet(files, file_extensions=["parquet"])
    cols = [c for c in ds.schema().names if c not in drop]
    return ds.select_columns(cols)


def _read_buckets_df(root: str, bucket_ids=None, drop=("bkt",),
                     empty_schema: pa.Schema = None, max_seq=None,
                     compact_seq=None, local_cutoff: int = 64 << 20):
    """Pandas twin of ``_read_buckets`` for the delta-bounded reads
    that end in ``.to_pandas()`` anyway: when the visible files fit
    ``local_cutoff`` bytes they're read with pyarrow directly — the
    fast delta path was paying three fixed-latency Dataset executions
    per update just to probe a few small bucket files.  Falls back to
    the Dataset reader beyond the cutoff (same visibility rules)."""
    import pyarrow.parquet as pq

    ds = _read_buckets(root, bucket_ids, drop=drop,
                       empty_schema=empty_schema, max_seq=max_seq,
                       compact_seq=compact_seq, _want_files=True)
    if isinstance(ds, list):                      # visible file list
        if sum(os.path.getsize(f) for f in ds) <= local_cutoff:
            tabs = [pq.read_table(f) for f in ds]
            t = pa.concat_tables(tabs, promote_options="default")
            cols = [c for c in t.column_names if c not in drop]
            return t.select(cols).to_pandas()
        import ray.data as rd

        out = rd.read_parquet(ds, file_extensions=["parquet"])
        cols = [c for c in out.schema().names if c not in drop]
        return out.select_columns(cols).to_pandas()
    return ds.to_pandas()                         # empty-schema Dataset


def _purge_uncommitted(state_dir: str, cur_seq: int):
    """Remove every file a crashed mutation left at seq > cur_seq —
    delta/compact bucket files, remap snapshots and staging dirs.
    MUST run before any mutation that will commit a seq above
    cur_seq: an orphan at that seq would otherwise become visible the
    moment the new mutation's manifest bump reaches it (the torn
    batch's pages would then read as 'known' with no bands/labels —
    permanent silent match loss)."""
    import re
    import shutil

    for sub in ("pages", "bands", "labels"):
        sroot = os.path.join(state_dir, sub)
        if not os.path.isdir(sroot):
            continue
        for d in os.listdir(sroot):
            if not d.startswith("bkt="):
                continue
            for f in list(os.listdir(os.path.join(sroot, d))):
                if f.endswith(".parquet") and _file_seq(f) > cur_seq:
                    os.remove(os.path.join(sroot, d, f))
    for f in list(os.listdir(state_dir)):
        m = re.match(r"remap-(\d+)\.parquet$", f)
        if m and int(m.group(1)) > cur_seq:
            os.remove(os.path.join(state_dir, f))
        elif f.startswith("_staging-"):
            shutil.rmtree(os.path.join(state_dir, f),
                          ignore_errors=True)


def _read_manifest(state_dir: str) -> dict:
    with open(os.path.join(state_dir, _MANIFEST)) as f:
        return json.load(f)


def _write_manifest(state_dir: str, man: dict):
    """Atomic manifest replace — the commit point of every mutation."""
    tmp = os.path.join(state_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(state_dir, _MANIFEST))


_PAGES_SCHEMA = pa.schema([("url", pa.string()), ("canon", pa.string()),
                           ("text", pa.string())])
_BANDS_SCHEMA = pa.schema([("band_key", pa.string()),
                           ("url", pa.string())])
_LABELS_SCHEMA = pa.schema([("node", pa.string()),
                            ("label", pa.string())])


def _remap_path(state_dir: str, max_seq=None):
    """Newest committed remap snapshot (each update writes the FULL
    resolved map as ``remap-<seq>.parquet``; legacy un-tagged
    ``remap.parquet`` counts as seq 0)."""
    import re

    best, best_seq = None, -1
    for f in os.listdir(state_dir):
        m = re.match(r"remap(?:-(\d+))?\.parquet$", f)
        if not m:
            continue
        s = int(m.group(1)) if m.group(1) else 0
        if s > best_seq and (max_seq is None or s <= max_seq):
            best, best_seq = os.path.join(state_dir, f), s
    return best


def _resolve_remap(state_dir: str, max_seq=None) -> dict:
    """Alias chain -> root map with path compression (remap rows are
    per-merge, so the table is tiny relative to state).  The chain is
    monotone by the min-label merge contract, so a cycle can only come
    from corrupted state — the walk is bounded and fails loudly rather
    than hanging."""
    path = _remap_path(state_dir, max_seq)
    if path is None:
        return {}
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    m = dict(zip(t.column("old_label").to_pylist(),
                 t.column("new_label").to_pylist()))
    bound = len(m) + 1

    def root(x):
        seen = []
        while x in m:
            if len(seen) >= bound:
                raise RuntimeError(
                    f"remap alias cycle at {x!r} ({path}): state is "
                    "corrupt; rebuild or restore from a checkpoint")
            seen.append(x)
            x = m[x]
        for s in seen:
            m[s] = x
        return x

    return {k: root(k) for k in list(m)}


def build_linkage_state(pages, state_dir: str, threshold: float = 0.75,
                        num_partitions: int = 16, buckets: int = 32):
    """Full-batch clustering of prepared pages (url, canon, text) →
    persisted state.  Returns the labels Dataset."""
    import ray

    from elevant_ray.stages.clustering import connected_components
    from elevant_ray.stages.dedup import blocking_keys, pairs_from_keys
    from elevant_ray.stages.scoring import verify_pairs
    from elevant_ray.stages.util import cached_get

    pages = pages.materialize()
    if pages.count() == 0:
        import ray.data as rd

        for sub in ("pages", "bands", "labels"):
            os.makedirs(os.path.join(state_dir, sub), exist_ok=True)
        _write_manifest(state_dir, {"buckets": buckets,
                                    "threshold": threshold,
                                    "n_pages": 0, "update_seq": 0,
                                    "compact_seq": 0})
        return rd.from_arrow(_LABELS_SCHEMA.empty_table())
    from elevant_ray.stages.util import scale_cutoff

    if pages.size_bytes() <= scale_cutoff(64 << 20):
        # sub-cutoff corpus: run blocking/scoring/CC in process with
        # the exact distributed kernels (the same fast path as
        # cluster_pages and the delta update) and persist driver-side
        import ray.data as rd

        from elevant_ray.stages.clustering import _local_contract
        from elevant_ray.stages.dedup import (add_minhash_columns,
                                              expand_pairs_frame,
                                              explode_keys_table)
        from elevant_ray.stages.scoring import score_pair_batch

        tbl = pa.concat_tables(
            [b.select(["url", "canon", "text"])
             for b in pages.iter_batches(batch_format="pyarrow")]
            or [_PAGES_SCHEMA.empty_table()])
        keys_tbl = explode_keys_table(
            add_minhash_columns(tbl, text_col="text"), "url",
            canon_col="canon")
        import pandas as pd  # noqa: F401  (expand returns a frame)

        cand = expand_pairs_frame(keys_tbl.to_pandas(), "url") \
            .drop_duplicates(ignore_index=True)
        urls = tbl.column("url").to_pylist()
        lm = {}
        if len(cand):
            texts = dict(zip(urls, tbl.column("text").to_pylist()))
            canons = dict(zip(urls, tbl.column("canon").to_pylist()))
            lv = cand["left"].tolist()
            rv = cand["right"].tolist()
            scored_tbl = score_pair_batch(pa.table({
                "left": pa.array(lv, pa.string()),
                "right": pa.array(rv, pa.string()),
                "text_l": pa.array([texts[u] for u in lv], pa.string()),
                "text_r": pa.array([texts[u] for u in rv], pa.string()),
                "canon_l": pa.array([canons[u] for u in lv],
                                    pa.string()),
                "canon_r": pa.array([canons[u] for u in rv],
                                    pa.string())}), threshold=threshold)
            lab_t = _local_contract(
                scored_tbl.filter(scored_tbl.column("is_match"))
                .select(["left", "right"]))
            lm = dict(zip(lab_t.column("left").to_pylist(),
                          lab_t.column("right").to_pylist()))
        lab_tbl = pa.table({
            "node": pa.array(urls, pa.string()),
            "label": pa.array([lm.get(u, u) for u in urls],
                              pa.string())})
        os.makedirs(state_dir, exist_ok=True)
        _append_bucketed_table(tbl, os.path.join(state_dir, "pages"),
                               "url", buckets, 0)
        _append_bucketed_table(keys_tbl,
                               os.path.join(state_dir, "bands"),
                               "band_key", buckets, 0)
        _append_bucketed_table(lab_tbl,
                               os.path.join(state_dir, "labels"),
                               "node", buckets, 0)
        _write_manifest(state_dir, {"buckets": buckets,
                                    "threshold": threshold,
                                    "n_pages": tbl.num_rows,
                                    "update_seq": 0, "compact_seq": 0})
        return rd.from_arrow(lab_tbl)

    # ONE minhash/key pass serves both the pair expansion and the
    # persisted band index (cluster_pages + a separate blocking_keys
    # call would scan and hash the corpus twice)
    keys = blocking_keys(pages, id_col="url",
                         canon_col="canon").materialize()
    pairs = pairs_from_keys(keys, "url", num_partitions=num_partitions)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    scored = verify_pairs(pairs, pages, id_col="url",
                          threshold=threshold,
                          num_partitions=num_partitions,
                          score_parallelism=2 * cpus)
    labels = connected_components(
        scored.map_batches(
            lambda b: b.filter(b.column("is_match"))
            .select(["left", "right"]), batch_format="pyarrow"),
        num_partitions=num_partitions)
    # state invariant: EVERY ingested url carries a label (CC labels
    # only matched nodes; singletons label themselves) — the same
    # "every doc labeled" convention as the dedup cluster queries.
    # The attach is a bucketed left-outer cogroup of pages against the
    # CC labels (null -> self), NOT a driver dict: on this path the
    # corpus is by definition too large for driver materialization,
    # and the module's scale contract is "broadcasts bounded by the
    # delta, never by the state".
    import pyarrow.compute as pc

    from elevant_ray.stages.util import cogroup_join

    os.makedirs(state_dir, exist_ok=True)
    pages_sel = pages.select_columns(["url", "canon", "text"])

    nodes = pages.select_columns(["url"]).map_batches(
        lambda b: b.rename_columns(["node"]), batch_format="pyarrow")

    def fill_self(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            "label": pc.coalesce(b.column("label"), b.column("node"))})

    labels = cogroup_join(
        nodes, labels, on="node", num_partitions=num_partitions,
        left_schema=pa.schema([("node", pa.string())]),
        right_schema=_LABELS_SCHEMA, how="left_outer") \
        .map_batches(fill_self, batch_format="pyarrow").materialize()
    _write_bucketed(pages_sel, os.path.join(state_dir, "pages"),
                    "url", buckets)
    _write_bucketed(keys, os.path.join(state_dir, "bands"),
                    "band_key", buckets)
    _write_bucketed(labels, os.path.join(state_dir, "labels"),
                    "node", buckets)
    n_pages = pages.count()
    _write_manifest(state_dir, {"buckets": buckets,
                                "threshold": threshold,
                                "n_pages": n_pages, "update_seq": 0,
                                "compact_seq": 0})
    return labels


def read_labels(state_dir: str):
    """Effective (node, label) pandas frame: stored labels with the
    merge alias chain resolved.  Only COMMITTED rows are visible —
    delta files beyond the manifest's update_seq (a torn update) are
    ignored, exactly as the update path ignores them."""
    import pandas as pd

    man = _read_manifest(state_dir)
    seq = int(man.get("update_seq", 0))
    lab = _read_buckets_df(os.path.join(state_dir, "labels"),
                           empty_schema=_LABELS_SCHEMA, max_seq=seq,
                           compact_seq=int(man.get("compact_seq", 0)))
    if "node" not in lab.columns:
        # Ray's to_pandas() on a fully-empty dataset drops the schema
        lab = pd.DataFrame({"node": pd.Series([], dtype=object),
                            "label": pd.Series([], dtype=object)})
    remap = _resolve_remap(state_dir, max_seq=seq)
    if remap:
        lab["label"] = lab["label"].map(lambda x: remap.get(x, x))
    return lab.sort_values("node").reset_index(drop=True)


def compact_linkage_state(state_dir: str):
    """Fold the remap alias chain into the label buckets (the explicit
    O(state) pass; schedule it when the chain grows).

    Crash-safe: each bucket's compacted table is written as
    ``compact-<newseq>.parquet`` — INVISIBLE until the manifest bumps
    ``update_seq``/``compact_seq`` to newseq, because readers require
    ``seq == compact_seq`` for compact files (deltas need
    ``seq > compact_seq``).  Only after
    that atomic commit are the superseded files deleted (a crash
    between commit and cleanup leaves stale files that the seq window
    already excludes)."""
    man = _read_manifest(state_dir)
    cur_seq = int(man.get("update_seq", 0))
    old_compact = int(man.get("compact_seq", 0))
    remap = _resolve_remap(state_dir, max_seq=cur_seq)
    if not remap:
        return 0
    import pyarrow.parquet as pq

    # a crashed update may have left orphan files at cur_seq+1 — they
    # must not ride into visibility on THIS compaction's commit
    _purge_uncommitted(state_dir, cur_seq)
    newseq = cur_seq + 1
    root = os.path.join(state_dir, "labels")
    n = 0
    for d in sorted(os.listdir(root)):
        if not d.startswith("bkt="):
            continue
        bdir = os.path.join(root, d)
        parts = [pq.read_table(os.path.join(bdir, f))
                 for f in sorted(os.listdir(bdir))
                 if f.endswith(".parquet")
                 and old_compact <= _file_seq(f) <= cur_seq]
        if not parts:
            continue
        t = pa.concat_tables(parts)
        labs = [remap.get(x, x) for x in t.column("label").to_pylist()]
        out = pa.table({"node": t.column("node"),
                        "label": pa.array(labs, pa.string())})
        tmp = os.path.join(bdir, f"compact-{newseq}.parquet.tmp")
        pq.write_table(out, tmp)
        os.replace(tmp, os.path.join(bdir, f"compact-{newseq}.parquet"))
        n += out.num_rows
    man["update_seq"] = newseq
    man["compact_seq"] = newseq
    _write_manifest(state_dir, man)  # <- the commit point
    # post-commit cleanup: superseded label files + remap snapshots
    for d in sorted(os.listdir(root)):
        if not d.startswith("bkt="):
            continue
        bdir = os.path.join(root, d)
        for f in list(os.listdir(bdir)):
            if f.endswith(".parquet") and _file_seq(f) < newseq:
                os.remove(os.path.join(bdir, f))
    import re

    for f in list(os.listdir(state_dir)):
        if re.match(r"remap(?:-\d+)?\.parquet$", f):
            os.remove(os.path.join(state_dir, f))
    return n


def update_linkage_state(new_pages, state_dir: str,
                         num_partitions: int = 16,
                         threshold: Optional[float] = None):
    """Fold a prepared new-page batch (url, canon, text) into the
    state.  Returns dict(new_nodes, merged_labels, dropped_known)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    from elevant_ray.stages.clustering import connected_components
    from elevant_ray.stages.dedup import blocking_keys, pairs_from_keys
    from elevant_ray.stages.scoring import verify_pairs
    from elevant_ray.stages.util import cached_get

    man = _read_manifest(state_dir)
    buckets = int(man["buckets"])
    cur_seq = int(man.get("update_seq", 0))
    compact_seq = int(man.get("compact_seq", 0))
    seq = cur_seq + 1  # this update's (uncommitted until manifest bump)
    if threshold is None:
        threshold = float(man.get("threshold", 0.75))

    new_pages = new_pages.materialize()
    new_urls = np.unique(np.concatenate(
        [b.column("url").to_numpy(zero_copy_only=False)
         for b in new_pages.iter_batches(batch_format="pyarrow")]
        or [np.array([], dtype=object)]))
    if len(new_urls) == 0:
        return {"new_nodes": 0, "merged_labels": 0, "dropped_known": 0}

    # 1. drop urls already in state (pruned membership probe)
    page_root = os.path.join(state_dir, "pages")
    known = _read_buckets_df(page_root, _hash_np(new_urls, buckets),
                             empty_schema=_PAGES_SCHEMA,
                             max_seq=cur_seq)
    known_urls = set(known["url"]) & set(new_urls.tolist()) \
        if len(known) else set()
    if known_urls:
        ref = ray.put(known_urls)

        def drop_known(b: pa.Table) -> pa.Table:
            ks = cached_get(ref)
            keep = [u not in ks for u in b.column("url").to_pylist()]
            return b.filter(pa.array(keep))

        new_pages = new_pages.map_batches(
            drop_known, batch_format="pyarrow").materialize()
        new_urls = np.asarray(
            [u for u in new_urls.tolist() if u not in known_urls],
            dtype=object)
    if len(new_urls) == 0:
        return {"new_nodes": 0, "merged_labels": 0,
                "dropped_known": len(known_urls)}
    new_url_set = set(new_urls.tolist())

    # sub-cutoff deltas run IN PROCESS with the exact distributed
    # kernels (explode_keys_table / expand_pairs_frame /
    # score_pair_batch / _local_contract): the only Dataset executions
    # left are the three bucket-pruned state reads, so the update costs
    # seconds instead of a dozen fixed-latency exchanges.  Beyond the
    # cutoff (delta comparable to a corpus) the distributed path below
    # runs — the conformance suite forces it via
    # ELEVANT_RAY_BROADCAST_CUTOFF=0 and asserts identical labels.
    from elevant_ray.stages.util import scale_cutoff

    # gate on Dataset metadata BEFORE any driver materialization — the
    # distributed branch exists precisely for deltas that don't fit
    # the driver
    fast = new_pages.size_bytes() <= scale_cutoff(64 << 20)

    if fast:
        new_tbl = pa.concat_tables(
            [b.select(["url", "canon", "text"])
             for b in new_pages.iter_batches(batch_format="pyarrow")]
            or [_PAGES_SCHEMA.empty_table()])
        from elevant_ray.stages.dedup import (add_minhash_columns,
                                              expand_pairs_frame,
                                              explode_keys_table)
        from elevant_ray.stages.scoring import score_pair_batch

        keys_tbl = explode_keys_table(
            add_minhash_columns(new_tbl, text_col="text"), "url",
            canon_col="canon")
        keys_new_df = keys_tbl.to_pandas()
        key_set = set(keys_new_df["band_key"])
        old_keys_df = _read_buckets_df(
            os.path.join(state_dir, "bands"),
            _hash_np(sorted(key_set), buckets),
            empty_schema=_BANDS_SCHEMA, max_seq=cur_seq)
        if len(old_keys_df):
            old_keys_df = old_keys_df[
                old_keys_df["band_key"].isin(key_set)]
        cand = expand_pairs_frame(
            pd.concat([keys_new_df, old_keys_df], ignore_index=True),
            "url").drop_duplicates(ignore_index=True)
        cand = cand[cand["left"].isin(new_url_set)
                    | cand["right"].isin(new_url_set)]
        old_ends = sorted((set(cand["left"]) | set(cand["right"]))
                          - new_url_set)
        texts = dict(zip(new_tbl.column("url").to_pylist(),
                         new_tbl.column("text").to_pylist()))
        canons = dict(zip(new_tbl.column("url").to_pylist(),
                          new_tbl.column("canon").to_pylist()))
        if old_ends:
            op = _read_buckets_df(page_root,
                                  _hash_np(old_ends, buckets),
                                  empty_schema=_PAGES_SCHEMA,
                                  max_seq=cur_seq)
            op = op[op["url"].isin(old_ends)]
            texts.update(zip(op["url"], op["text"]))
            canons.update(zip(op["url"], op["canon"]))
        if len(cand):
            lv = cand["left"].tolist()
            rv = cand["right"].tolist()
            scored = score_pair_batch(pa.table({
                "left": pa.array(lv, pa.string()),
                "right": pa.array(rv, pa.string()),
                "text_l": pa.array([texts[u] for u in lv], pa.string()),
                "text_r": pa.array([texts[u] for u in rv], pa.string()),
                "canon_l": pa.array([canons[u] for u in lv],
                                    pa.string()),
                "canon_r": pa.array([canons[u] for u in rv],
                                    pa.string())}), threshold=threshold)
            edges = scored.filter(scored.column("is_match")) \
                .select(["left", "right"]).to_pandas()
        else:
            edges = pd.DataFrame({"left": [], "right": []})
    else:
        # 2. blocking keys of the batch probe only their band buckets
        keys_new = blocking_keys(new_pages, id_col="url",
                                 canon_col="canon").materialize()
        nk = pa.concat_tables(
            list(keys_new.iter_batches(batch_format="pyarrow")))
        key_set = set(nk.column("band_key").to_pylist())
        kref = ray.put(key_set)

        def keep_probed(b: pa.Table) -> pa.Table:
            ks = cached_get(kref)
            keep = [k in ks for k in b.column("band_key").to_pylist()]
            return b.filter(pa.array(keep))

        old_keys = _read_buckets(
            os.path.join(state_dir, "bands"),
            _hash_np(sorted(key_set), buckets),
            empty_schema=_BANDS_SCHEMA, max_seq=cur_seq) \
            .map_batches(keep_probed, batch_format="pyarrow")

        # 3. pair expansion over (new ∪ probed-old) keys; keep pairs
        #    touching >= 1 new url
        uref = ray.put(new_url_set)

        def keep_new_touching(b: pa.Table) -> pa.Table:
            us = cached_get(uref)
            keep = [(l in us) or (r in us)
                    for l, r in zip(b.column("left").to_pylist(),
                                    b.column("right").to_pylist())]
            return b.filter(pa.array(keep))

        cand = pairs_from_keys(keys_new.union(old_keys), "url",
                               num_partitions=num_partitions) \
            .map_batches(keep_new_touching, batch_format="pyarrow") \
            .materialize()

        # 4. scoring side: new texts + touched old endpoints only
        ends = set()
        for b in cand.iter_batches(batch_format="pyarrow"):
            ends.update(b.column("left").to_pylist())
            ends.update(b.column("right").to_pylist())
        old_ends = sorted(ends - new_url_set)
        side = new_pages.select_columns(["url", "canon", "text"])
        if old_ends:
            eref = ray.put(set(old_ends))

            def keep_ends(b: pa.Table) -> pa.Table:
                es = cached_get(eref)
                keep = [u in es for u in b.column("url").to_pylist()]
                return b.filter(pa.array(keep))

            side = side.union(
                _read_buckets(page_root, _hash_np(old_ends, buckets),
                              empty_schema=_PAGES_SCHEMA,
                              max_seq=cur_seq)
                .map_batches(keep_ends, batch_format="pyarrow")
                .select_columns(["url", "canon", "text"]))
        side = side.materialize()
        edges = pd.concat(
            [b.to_pandas() for b in
             verify_pairs(cand, side, id_col="url", threshold=threshold,
                          num_partitions=num_partitions)
             .map_batches(lambda b: b.filter(b.column("is_match"))
                          .select(["left", "right"]),
                          batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")] or
            [pd.DataFrame({"left": [], "right": []})], ignore_index=True)

    # 5. old endpoints enter CC as their label roots (virtual nodes)
    remap = _resolve_remap(state_dir, max_seq=cur_seq)
    old_lab = _read_buckets_df(os.path.join(state_dir, "labels"),
                               _hash_np(old_ends, buckets),
                               empty_schema=_LABELS_SCHEMA,
                               max_seq=cur_seq,
                               compact_seq=compact_seq) \
        if old_ends else pd.DataFrame({"node": [], "label": []})
    lmap = {n: remap.get(l, l)
            for n, l in zip(old_lab["node"], old_lab["label"])}
    missing = [u for u in old_ends if u not in lmap]
    if missing:
        # every ingested url is labeled at write time, so a miss means
        # torn/foreign state — fail loudly rather than silently
        # re-clustering
        raise RuntimeError(f"state labels missing for {missing[:5]}")
    sub = lambda u: lmap.get(u, u)
    ev = pd.DataFrame({"left": [sub(u) for u in edges["left"]],
                       "right": [sub(u) for u in edges["right"]]})
    import ray.data as rd

    if fast:
        from elevant_ray.stages.clustering import _local_contract

        lab_t = _local_contract(pa.table({
            "left": pa.array(ev["left"].tolist(), pa.string()),
            "right": pa.array(ev["right"].tolist(), pa.string())}))
        comp = dict(zip(lab_t.column("left").to_pylist(),
                        lab_t.column("right").to_pylist()))
    else:
        labels_new = connected_components(
            rd.from_pandas(ev) if len(ev) else
            rd.from_arrow(pa.table({"left": pa.array([], pa.string()),
                                    "right": pa.array([], pa.string())})),
            num_partitions=num_partitions).to_pandas()
        comp = dict(zip(labels_new["node"], labels_new["label"]))

    # every new url gets a label (singletons label themselves); an old
    # root whose component label moved is a cluster merge -> alias row
    out_nodes, out_labels = [], []
    for u in new_urls.tolist():
        out_nodes.append(u)
        out_labels.append(comp.get(u, u))
    merges = {}
    for u in set(lmap.values()):
        r = comp.get(u, u)
        if r != u:
            merges[u] = r

    # 6. persist: append pages/bands/labels, extend the alias chain.
    #    Every file lands under a seq-tagged name FIRST (invisible to
    #    readers: seq > the manifest's update_seq); the atomic
    #    manifest replace at the end is the commit point.  First purge
    #    any uncommitted orphans a crashed prior mutation left at
    #    seq > cur_seq (incl. staging dirs) — they belong to an
    #    abandoned batch and would otherwise become visible when THIS
    #    update commits their seq.
    _purge_uncommitted(state_dir, cur_seq)
    lab_tbl = pa.table({"node": pa.array(out_nodes, pa.string()),
                        "label": pa.array(out_labels, pa.string())})
    if fast:
        _append_bucketed_table(new_tbl, page_root, "url", buckets, seq)
        _append_bucketed_table(keys_tbl,
                               os.path.join(state_dir, "bands"),
                               "band_key", buckets, seq)
        _append_bucketed_table(lab_tbl,
                               os.path.join(state_dir, "labels"),
                               "node", buckets, seq)
    else:
        # distributed delta: Ray writes uniquely-named (un-tagged)
        # files, so stage under _staging-<seq>/ and move each file
        # into its bucket dir under a delta-<seq>-<i> name (an
        # O(buckets) driver admin pass, not a data-plane copy)
        import shutil

        stage_root = os.path.join(state_dir, f"_staging-{seq}")
        shutil.rmtree(stage_root, ignore_errors=True)
        _write_bucketed(
            new_pages.select_columns(["url", "canon", "text"]),
            os.path.join(stage_root, "pages"), "url", buckets)
        _write_bucketed(keys_new, os.path.join(stage_root, "bands"),
                        "band_key", buckets)
        _write_bucketed(rd.from_arrow(lab_tbl),
                        os.path.join(stage_root, "labels"), "node",
                        buckets)
        for sub in ("pages", "bands", "labels"):
            sroot = os.path.join(stage_root, sub)
            if not os.path.isdir(sroot):
                continue
            for d in sorted(os.listdir(sroot)):
                if not d.startswith("bkt="):
                    continue
                dst = os.path.join(state_dir, sub, d)
                os.makedirs(dst, exist_ok=True)
                for i, f in enumerate(sorted(
                        os.listdir(os.path.join(sroot, d)))):
                    if f.endswith(".parquet"):
                        os.replace(
                            os.path.join(sroot, d, f),
                            os.path.join(dst,
                                         f"delta-{seq}-{i}.parquet"))
        shutil.rmtree(stage_root, ignore_errors=True)
    if merges or remap:
        allmap = dict(remap)
        allmap.update(merges)
        # re-resolve through the new merges so chains stay shallow;
        # bounded walk — a cycle here means corrupted input state
        bound = len(allmap) + 1

        def root(x):
            steps = 0
            while x in allmap and allmap[x] != x:
                if steps > bound:
                    raise RuntimeError(
                        f"remap alias cycle at {x!r}: state is "
                        "corrupt; rebuild or restore")
                x = allmap[x]
                steps += 1
            return x

        rows = [(k, root(v)) for k, v in allmap.items()]
        # full snapshot under a seq name — invisible until the commit
        pq.write_table(
            pa.table({"old_label": pa.array([r[0] for r in rows],
                                            pa.string()),
                      "new_label": pa.array([r[1] for r in rows],
                                            pa.string())}),
            os.path.join(state_dir, f"remap-{seq}.parquet"))
    man["n_pages"] = int(man.get("n_pages", 0)) + len(new_urls)
    man["update_seq"] = seq
    _write_manifest(state_dir, man)  # <- the commit point
    # post-commit cleanup: superseded remap snapshots (best-effort)
    import re

    for f in list(os.listdir(state_dir)):
        m = re.match(r"remap(?:-(\d+))?\.parquet$", f)
        if m and (int(m.group(1)) if m.group(1) else 0) < seq \
                and (merges or remap):
            os.remove(os.path.join(state_dir, f))
    return {"new_nodes": len(new_urls), "merged_labels": len(merges),
            "dropped_known": len(known_urls)}
