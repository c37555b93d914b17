"""Command-line entry points mirroring the reference's top-level scripts.

    python -m elevant_ray.cli link     --input articles.jsonl --linker pos-prior ...
    python -m elevant_ray.cli evaluate --input linked.jsonl --out-dir ...
    python -m elevant_ray.cli stats    --input benchmark.jsonl

``link`` is the engine analog of ``link_benchmark.py`` (reference
:57-104): read a benchmark with a registered reader, run a registered
linker stage as an actor-pool ``map_batches``, write mention rows plus
the same metadata JSON (experiment name, linker name, timestamp,
linking time).  ``evaluate`` mirrors ``evaluate.py:56-128``: cases out
per mention, nested results dict from the associative counter
aggregate.  ``stats`` mirrors ``scripts/analyze_benchmark.py``.

Each subcommand owns its Ray session (init-if-needed; the driver
contract in ``__ray_entry__`` never imports this module).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)


def _read_articles(path: str, reader: str):
    from elevant_ray.registry import build_reader

    return build_reader(reader)(path)


def _dims_from_pages(pages):
    """link-frequency dimension dicts from a pages Dataset carrying
    (text, hyperlinks) — the CLI-scale stand-in for the reference's
    ``generate-wikipedia-mappings`` offline DAG (Makefile:212-226)."""
    from elevant_ray.stages.dims import (link_frequencies, to_broadcast_dicts,
                                         to_prior_dicts)

    lf = link_frequencies(pages).materialize()
    return to_broadcast_dicts(lf), to_prior_dicts(lf)


def _synth_extracted(sf_dir: str):
    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages

    return synth_pages(sf_dir).map_batches(
        extract_batch, batch_format="pyarrow").materialize()


def cmd_link(args) -> int:
    import pyarrow as pa
    import ray

    from elevant_ray.functions.tokens import convert_to_filename
    from elevant_ray.registry import apply_stage

    _init_ray()
    t0 = time.time()
    articles = _read_articles(args.input, args.reader)
    if args.limit:
        articles = articles.limit(args.limit)

    dims_src = (_synth_extracted(args.dims_from) if args.dims_from
                else articles.materialize())
    has_links = "hyperlinks" in dims_src.schema().names
    if not has_links:
        print("warning: dim source has no hyperlinks column; "
              "dims are empty (all candidates unknown)", file=sys.stderr)
        empty = pa.table({"alias": pa.array([], pa.string()),
                          "target": pa.array([], pa.string()),
                          "freq": pa.array([], pa.int64())})
        from elevant_ray.stages.dims import to_broadcast_dicts, to_prior_dicts
        import ray.data as rd

        lf = rd.from_arrow(empty)
        bdicts, pdicts = to_broadcast_dicts(lf), to_prior_dicts(lf)
    else:
        bdicts, pdicts = _dims_from_pages(dims_src)

    pages = articles.materialize() if args.dims_from else dims_src
    id_col = "url" if "url" in pages.schema().names else "doc_id"

    if args.linker == "baseline":
        a_ref = ray.put(bdicts["alias_to_qids"])
        p_ref = ray.put(bdicts["popularity"])

        def mentions(b: pa.Table) -> pa.Table:
            ids, ments, begins, ends = [], [], [], []
            links_col = (b.column("hyperlinks").to_pylist()
                         if "hyperlinks" in b.column_names
                         else [[]] * b.num_rows)
            for i, text, links in zip(b.column(id_col).to_pylist(),
                                      b.column("text").to_pylist(),
                                      links_col):
                for hl in links or ():
                    ids.append(i)
                    begins.append(hl["begin"])
                    ends.append(hl["end"])
                    ments.append(text[hl["begin"]:hl["end"]])
            return pa.table({
                id_col: pa.array(ids),
                "begin": pa.array(begins, pa.int32()),
                "end": pa.array(ends, pa.int32()),
                "mention": pa.array(ments, pa.string())})

        ment_ds = pages.map_batches(mentions, batch_format="pyarrow")
        out = apply_stage(ment_ds, "baseline", "linker", config={
            "alias_to_qids_ref": a_ref, "popularity_ref": p_ref,
            "strategy": args.strategy})
    elif args.linker == "pos-prior":
        lf_ref = ray.put(pdicts["link_frequencies"])
        al_ref = ray.put(pdicts["entity_aliases"])
        out = apply_stage(pages.select_columns([id_col, "text"]),
                          "pos-prior", "linker",
                          config={"link_freq_ref": lf_ref,
                                  "aliases_ref": al_ref,
                                  "id_col": id_col})
    elif args.linker == "popular-entities":
        alias_to_qids = {a: set(qs)
                         for a, qs in bdicts["alias_to_qids"].items()}
        dims_ref = ray.put({"name_to_qids": alias_to_qids,
                            "alias_to_qids": alias_to_qids,
                            "sitelinks": bdicts["popularity"]})
        out = apply_stage(pages.select_columns([id_col, "text"]),
                          "popular-entities", "linker",
                          config={"dims_ref": dims_ref, "id_col": id_col,
                                  "min_score": args.min_score})
    else:
        raise SystemExit(f"unknown linker {args.linker!r}")

    os.makedirs(args.out_dir, exist_ok=True)
    mentions_dir = os.path.join(args.out_dir, "mentions")
    out.write_parquet(mentions_dir)
    meta = {
        "experiment_name": args.experiment,
        # sanitized form used for derived paths — the reference's
        # convert_to_filename (link_benchmark.py:53-56)
        "experiment_filename": convert_to_filename(args.experiment or ""),
        "linker_name": args.linker,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "linking_time": round(time.time() - t0, 3),
    }
    with open(os.path.join(args.out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))
    return 0


def cmd_evaluate(args) -> int:
    import pyarrow as pa
    import ray.data as rd

    from elevant_ray.stages.evaluation import (aggregate_counts,
                                               evaluate_dataset,
                                               results_from_counts)

    _init_ray()
    ds = rd.read_json(args.input)

    def normalize(b: pa.Table) -> pa.Table:
        cols = {}
        names = set(b.column_names)
        n = b.num_rows
        cols["doc_id"] = (b.column("doc_id")
                          if "doc_id" in names else pa.nulls(n, pa.int64()))
        cols["text"] = b.column("text")
        for c in ("labels", "predictions", "hyperlinks"):
            cols[c] = (b.column(c) if c in names
                       else pa.array([[]] * n, pa.list_(pa.struct(
                           [("begin", pa.int32()), ("end", pa.int32())]))))
        for c in ("eval_begin", "eval_end"):
            cols[c] = (b.column(c).cast(pa.int32()) if c in names
                       else pa.nulls(n, pa.int32()))
        return pa.table(cols)

    docs = ds.map_batches(normalize, batch_format="pyarrow").materialize()
    os.makedirs(args.out_dir, exist_ok=True)
    cases = evaluate_dataset(docs)
    cases.write_parquet(os.path.join(args.out_dir, "cases"))
    counts = aggregate_counts(docs)
    results = results_from_counts(counts)
    with open(os.path.join(args.out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(json.dumps(results, sort_keys=True))
    return 0


def cmd_stats(args) -> int:
    from elevant_ray.stages.benchmark_stats import benchmark_statistics

    _init_ray()
    articles = _read_articles(args.input, args.reader)
    out = benchmark_statistics(articles).to_pandas()
    payload = {f"{r.stat}/{r.key}": int(r.value)
               for r in out.itertuples(index=False)}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
    print(json.dumps(payload, sort_keys=True))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="elevant_ray.cli", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    lk = sub.add_parser("link", help="link a benchmark with a linker")
    lk.add_argument("--input", required=True)
    lk.add_argument("--reader", default="jsonl",
                    help="registered reader name (jsonl, simple-jsonl, "
                         "aida-conll, nif, tsv, ...)")
    lk.add_argument("--linker", default="pos-prior",
                    choices=["baseline", "pos-prior", "popular-entities"])
    lk.add_argument("--strategy", default="wikidata",
                    choices=["wikidata", "wikipedia"])
    lk.add_argument("--min-score", type=int, default=2)
    lk.add_argument("--dims-from", default=None,
                    help="sf dir; build link-frequency dims from its "
                         "synthesized pages instead of the input")
    lk.add_argument("--experiment", default="experiment")
    lk.add_argument("--limit", type=int, default=None)
    lk.add_argument("--out-dir", required=True)
    lk.set_defaults(fn=cmd_link)

    ev = sub.add_parser("evaluate", help="evaluate linked articles")
    ev.add_argument("--input", required=True,
                    help="JSONL with text, labels, predictions per line")
    ev.add_argument("--out-dir", required=True)
    ev.set_defaults(fn=cmd_evaluate)

    st = sub.add_parser("stats", help="benchmark statistics")
    st.add_argument("--input", required=True)
    st.add_argument("--reader", default="jsonl")
    st.add_argument("--out", default=None)
    st.set_defaults(fn=cmd_stats)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
