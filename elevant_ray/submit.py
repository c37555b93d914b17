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
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, ignore_reinit_error=True)

    from elevant_ray.pipelines.record_linkage import run_record_linkage

    t0 = time.time()
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
