#!/usr/bin/env python3
"""Benchmark harness for the Ray-Data-native engine.

Default mode: run the headline pipelines from ``__ray_entry__.queries()``
over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and
print ONE JSON line::

    {"metric": "bench_total", "value": <sec>, "unit": "sec",
     "queries": {...}, "sf": "...", "num_cpus": N}

``--scaling``: run the flagship record-linkage pipeline twice, each in a
FRESH subprocess + fresh Ray session (num_cpus=8 then num_cpus=32), on
the same input, and report pages/s at both levels plus scaling
efficiency  thr_32 / (4 * thr_8)  — the sandbox stand-in for the north
rule's N-node vs 4N-node cluster criterion (BASELINE.json: "scaling
efficiency >= 0.8 from N to 4N Ray nodes").

``--one NAME``: internal child mode used by --scaling; times one query
in this process and prints a small JSON dict.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

DEFAULT_SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32") or "32")

# Headline pipelines (subset of __ray_entry__.queries() covering every
# operator family: relational joins/aggregates, windowed events, text
# analysis, dedup/sketching, ANN, extraction, linking, clustering).
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "region_revenue",
    "events_hourly",
    "events_sessions",
    "unigram_counts",
    "doc_quality",
    "lang_id",
    "dedup_exact",
    "dedup_minhash",
    "knn_cosine",
    "extract_pages",
    "link_frequencies",
    "entity_linking",
    "linkage_clusters",
]

FLAGSHIP = "linkage_clusters"


def _consume(res) -> int:
    """Stream the result to completion; return row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow", batch_size=8192):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    if isinstance(res, pd.DataFrame):
        return len(res)
    return len(res)


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True)


def _num_pages(sf_dir: str) -> int:
    """Input page count of the flagship pipeline (deterministic function
    of the documents table — see elevant_ray/sources/pages.py)."""
    import duckdb

    return duckdb.sql(
        f"""SELECT (count(*)
                    + sum(CASE WHEN doc_id % 25 = 11 THEN 1 ELSE 0 END)
                    + sum(CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END))::BIGINT
            FROM read_parquet('{sf_dir}/documents.parquet')"""
    ).fetchone()[0]


def run_bench(sf_dir: str, num_cpus: int, names) -> dict:
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        n = _consume(qs[name](sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    return {"metric": "bench_total", "value": total, "unit": "sec",
            "queries": timings, "sf": sf_dir, "num_cpus": num_cpus}


def run_one(sf_dir: str, num_cpus: int, name: str) -> dict:
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod

    t0 = time.perf_counter()
    rows = _consume(entrymod.queries()[name](sf_dir))
    elapsed = time.perf_counter() - t0
    return {"query": name, "elapsed": round(elapsed, 3), "rows": rows,
            "num_cpus": num_cpus}


def run_scaling(sf_dir: str, levels=(8, 32)) -> dict:
    """Fresh-process runs of the flagship pipeline at each parallelism
    level; pages/s throughput + scaling efficiency."""
    pages = _num_pages(sf_dir)
    results = {}
    for cpus in levels:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", FLAGSHIP,
               "--num-cpus", str(cpus), "--sf-dir", sf_dir]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        child = json.loads(out.stdout.strip().splitlines()[-1])
        results[cpus] = child
        print(f"# scaling num_cpus={cpus}: {child['elapsed']:.3f}s "
              f"-> {pages / child['elapsed']:.1f} pages/s", file=sys.stderr)
    lo, hi = levels
    thr = {c: pages / results[c]["elapsed"] for c in levels}
    eff = thr[hi] / (thr[lo] * (hi / lo))
    return {
        "metric": "scaling_efficiency", "value": round(eff, 3), "unit": "ratio",
        "queries": {
            f"{FLAGSHIP}_cpus{lo}_sec": results[lo]["elapsed"],
            f"{FLAGSHIP}_cpus{hi}_sec": results[hi]["elapsed"],
            f"pages_per_sec_cpus{lo}": round(thr[lo], 2),
            f"pages_per_sec_cpus{hi}": round(thr[hi], 2),
        },
        "sf": sf_dir, "num_cpus": hi, "pages": pages,
        "levels": list(levels),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF)
    ap.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--one", metavar="QUERY", default=None)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of BENCH_QUERIES")
    args = ap.parse_args()

    if args.one:
        payload = run_one(args.sf_dir, args.num_cpus, args.one)
    elif args.scaling:
        payload = run_scaling(args.sf_dir)
    else:
        names = args.queries.split(",") if args.queries else BENCH_QUERIES
        payload = run_bench(args.sf_dir, args.num_cpus, names)

    print(json.dumps(payload))

    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
