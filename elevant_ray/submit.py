"""Cluster entry point for the flagship record-linkage DAG.

North rule: "the whole DAG runs under streaming execution via
`ray job submit` on fixed N-node and 4N-node clusters".  Usage::

    ray job submit --working-dir . -- \
        python -m elevant_ray.submit --sf-dir /data/sf0.1 \
            --out /data/out/linkage --checkpoint-dir /data/ckpt

Inside a job the cluster is already up, so ``ray.init()`` here attaches
to it (guarded — never re-inits; the pytest/driver sessions own their
own Ray).  Each wide stage checkpoints per-partition Parquet with a
lineage manifest (state/checkpoint.py); re-submitting the same command
after a failure resumes from the last complete stage.  Prints one JSON
line of metrics (pages, clusters, pairwise F1 vs planted gold, wall
time) to stdout — the job log is the run record.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True,
                    help="directory holding documents.parquet")
    ap.add_argument("--out", default=None,
                    help="write cluster labels Parquet here (else count only)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="per-stage Parquet checkpoints (resume on re-submit)")
    ap.add_argument("--pages-shards", type=int, default=0,
                    help="with --checkpoint-dir: checkpoint the pages "
                         "stage per doc-shard; resume re-runs only "
                         "missing/stale shards (partition-granular "
                         "lineage)")
    ap.add_argument("--threshold", type=float, default=0.75)
    ap.add_argument("--num-partitions", type=int, default=16)
    ap.add_argument("--state-dir", default=None,
                    help="persisted incremental-linkage state "
                         "(state/linkage_state.py): with --delta-shard "
                         "K/N folds that doc-shard in as a crawl "
                         "delta; without it builds the state from the "
                         "full corpus")
    ap.add_argument("--delta-shard", default=None, metavar="K/N",
                    help="with --state-dir: ingest only documents with "
                         "doc_id %% N == K as the incremental delta")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, ignore_reinit_error=True)

    from elevant_ray.pipelines.record_linkage import run_record_linkage

    t0 = time.time()
    if args.state_dir:
        from elevant_ray.pipelines.record_linkage import prepare_pages
        from elevant_ray.sources.pages import synth_pages
        from elevant_ray.state.linkage_state import (build_linkage_state,
                                                     read_labels,
                                                     update_linkage_state)

        if args.delta_shard:
            k, n = (int(x) for x in args.delta_shard.split("/"))
            res = update_linkage_state(
                prepare_pages(synth_pages(args.sf_dir, shard=(k, n))),
                args.state_dir, num_partitions=args.num_partitions,
                threshold=args.threshold)
            out = {"metric": "linkage_state_update", **res}
        else:
            labels = build_linkage_state(
                prepare_pages(synth_pages(args.sf_dir)),
                args.state_dir, threshold=args.threshold,
                num_partitions=args.num_partitions)
            out = {"metric": "linkage_state_build",
                   "rows": labels.count()}
        if args.out:
            import pyarrow as pa
            import pyarrow.parquet as pq

            lab = read_labels(args.state_dir)
            pq.write_table(pa.Table.from_pandas(lab, preserve_index=False),
                           args.out)
        print(json.dumps({**out, "wall_s": round(time.time() - t0, 3),
                          "sf_dir": args.sf_dir,
                          "state_dir": args.state_dir,
                          "delta_shard": args.delta_shard,
                          "out": args.out}))
        return
    result = run_record_linkage(args.sf_dir, threshold=args.threshold,
                                num_partitions=args.num_partitions,
                                checkpoint_dir=args.checkpoint_dir,
                                pages_shards=args.pages_shards)
    labels = result["labels"]
    if args.out:
        labels.write_parquet(args.out)
        n_rows = sum(
            b.num_rows for b in labels.iter_batches(batch_format="pyarrow"))
    else:
        n_rows = labels.count()
    print(json.dumps({
        "metric": "linkage_submit", "rows": n_rows,
        "planted_pairwise": result["planted_pairs"],
        "wall_s": round(time.time() - t0, 3),
        "sf_dir": args.sf_dir, "out": args.out,
        "checkpoint_dir": args.checkpoint_dir,
        **({"rebuilt_shards": result["rebuilt_shards"]}
           if "rebuilt_shards" in result else {}),
    }))


if __name__ == "__main__":
    main()
