"""JSONL benchmark/article source + sink.

The reference's interchange format is one JSON article per line with
optional nested label structs (`OurJsonlBenchmarkReader`,
src/elevant/benchmark_readers/our_jsonl_benchmark_reader.py:10-23;
writer at add_benchmark.py:50-68).  The engine keeps Parquet as the
production format but supports the same JSONL shape for interop:
``write_articles_jsonl`` emits one JSON object per row via the
distributed ``write_json`` sink, and ``read_articles_jsonl`` parses it
back with an explicit Arrow schema so optional/absent nested fields
(sparse JSON, article.py:40-59) land as typed nulls instead of
inference-dependent types.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import pyarrow as pa

# the benchmark-article schema: spans are int32 offsets into `text`
# (SURVEY.md §1.3); labels mirror GroundtruthLabel's core fields
LABEL_TYPE = pa.struct([
    ("id", pa.int32()),
    ("begin", pa.int32()),
    ("end", pa.int32()),
    ("entity_id", pa.string()),
    ("name", pa.string()),
    ("parent", pa.int32()),
    ("optional", pa.bool_()),
    ("type", pa.string()),
])

ARTICLE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("title", pa.string()),
    ("text", pa.string()),
    ("labels", pa.list_(LABEL_TYPE)),
])


def write_articles_jsonl(ds, path: str) -> None:
    """Distributed JSONL sink: one file per block, one article per line."""
    ds.write_json(path)


def read_articles_jsonl(path: str):
    """JSONL → articles Dataset with the canonical schema.  Missing
    optional fields default like the reference reader
    (article.py:144-162): absent labels → empty list, absent title →
    null."""
    import ray.data as rd

    ds = rd.read_json(path)

    def normalize(batch: pa.Table) -> pa.Table:
        cols = {}
        n = batch.num_rows
        names = set(batch.column_names)
        for field in ARTICLE_SCHEMA:
            if field.name not in names:
                if field.name == "labels":
                    cols[field.name] = pa.array([[]] * n, field.type)
                else:
                    cols[field.name] = pa.nulls(n, field.type)
                continue
            cols[field.name] = batch.column(field.name).cast(field.type)
        return pa.table(cols)

    return ds.map_batches(normalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Simple-JSONL benchmark format: {"title"?, "text", "labels": [{"start_char",
# "end_char", "entity_reference", "coref"?}]} — one document per line
# (simple_jsonl_benchmark_reader.py:26-64).

# full GroundtruthLabel struct as consumed by the evaluation kernel
# (groundtruth_label.py:4-29): includes the nested-forest linkage fields
FULL_LABEL_TYPE = pa.struct([
    ("id", pa.int32()),
    ("begin", pa.int32()),
    ("end", pa.int32()),
    ("entity_id", pa.string()),
    ("name", pa.string()),
    ("parent", pa.int32()),
    ("children", pa.list_(pa.int32())),
    ("optional", pa.bool_()),
    ("type", pa.string()),
    ("coref", pa.bool_()),
    ("desc", pa.bool_()),
])

SIMPLE_ARTICLE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("title", pa.string()),
    ("text", pa.string()),
    ("labels", pa.list_(FULL_LABEL_TYPE)),
])


def assign_parent_child(labels: List[dict]) -> None:
    """Nested-label forest linkage, exactly the reference's quirky
    semantics (nested_groundtruth_handler.py:20-30): for each label i in
    list order, EVERY label whose span is contained in i's span (all
    descendants, not just direct children) is appended to i's
    ``children`` and gets ``parent = i.id`` — so a grandchild's final
    parent is the LAST containing label in list order, and ``children``
    lists transitive descendants.  Replicated verbatim because the
    factor recursion (case_generator.py:212-343) consumes exactly this
    shape."""
    for i, outer in enumerate(labels):
        for j, inner in enumerate(labels):
            if (j != i and inner["begin"] >= outer["begin"]
                    and inner["end"] <= outer["end"]):
                inner["parent"] = outer["id"]
                outer["children"].append(inner["id"])


def parse_simple_jsonl(content: str, title_to_qid: Optional[Dict[str, str]] = None,
                       custom_kb: bool = False,
                       doc_id_start: int = 0) -> List[dict]:
    """Parse simple-JSONL lines into article dicts.  Labels are sorted by
    start_char before id assignment (simple_jsonl_benchmark_reader.py:38);
    ``entity_reference`` is normalized to a QID via the
    KnowledgeBaseMapper port unless ``custom_kb`` keeps references as-is
    (:43-46); label names default to "Unknown" (:52); nested parent /
    child ids are assigned per ``assign_parent_child``."""
    from elevant_ray.functions.normalize import wikidata_qid

    articles: List[dict] = []
    doc_id = doc_id_start
    for line in content.splitlines():
        line = line.strip()
        if not line:
            continue
        obj = json.loads(line)
        labels: List[dict] = []
        for i, raw in enumerate(
                sorted(obj.get("labels", []), key=lambda x: x["start_char"])):
            ref = raw["entity_reference"]
            if custom_kb:
                entity_id = ref if ref else "<NIL>"
            else:
                entity_id = wikidata_qid(ref, title_to_qid or {})
            labels.append({
                "id": i, "begin": int(raw["start_char"]),
                "end": int(raw["end_char"]), "entity_id": entity_id,
                "name": "Unknown", "parent": None, "children": [],
                "optional": False, "type": None,
                "coref": raw.get("coref"), "desc": False,
            })
        assign_parent_child(labels)
        articles.append({"doc_id": doc_id, "title": obj.get("title", ""),
                         "text": obj["text"], "labels": labels})
        doc_id += 1
    return articles


def read_simple_jsonl(path: str, title_to_qid: Optional[Dict[str, str]] = None,
                      custom_kb: bool = False):
    """Simple-JSONL file(s) → articles Dataset.  Files are natural split
    units (one read task per file, like the CoNLL reader); doc ids are
    file-offset based so the result is deterministic regardless of task
    order (replaces the reference's sequential article_id_counter,
    simple_jsonl_benchmark_reader.py:62)."""
    import os

    import ray.data as rd

    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])
    # per-file doc_id offsets from line counts, so ids match the
    # reference's single-pass counter over sorted files
    offsets, total = [], 0
    for p in paths:
        offsets.append(total)
        with open(p, "r", encoding="utf8") as fh:
            total += sum(1 for ln in fh if ln.strip())

    items = [{"path": p, "offset": o} for p, o in zip(paths, offsets)]

    def load(batch: pa.Table) -> pa.Table:
        rows: List[dict] = []
        for item in batch.to_pylist():
            with open(item["path"], "r", encoding="utf8") as fh:
                rows.extend(parse_simple_jsonl(
                    fh.read(), title_to_qid=title_to_qid, custom_kb=custom_kb,
                    doc_id_start=item["offset"]))
        return pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "labels": pa.array([r["labels"] for r in rows],
                               pa.list_(FULL_LABEL_TYPE)),
        })

    return rd.from_items(items).map_batches(
        load, batch_format="pyarrow", batch_size=1)
