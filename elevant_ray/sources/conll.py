"""AIDA-CoNLL-style IOB TSV benchmark reader.

Mirrors the reference's stateful token-accumulation semantics
(``src/elevant/benchmark_readers/aida_conll_benchmark_reader.py:50-132``)
as a pure per-file parse inside ``flat_map`` — one file is the natural
split unit (SURVEY.md §2.1), so a corpus of shard files parallelizes
per shard with no cross-file state.

Format (tab-separated, one token per line)::

    -DOCSTART- (943testa Ajax)
    CRICKET
    LEICESTERSHIRE\tB\tLEICESTERSHIRE\tLeicestershire\thttp://en.wikipedia.org/wiki/Leicestershire_County_Cricket_Club
    TAKE
    ...

Semantics replicated exactly:
- text = tokens joined by single spaces (trailing space stripped);
- a label opens at a ``B`` line whose entity name is not ``null``
  (``null`` marks a continuation of the previous label) and closes at
  the next O-token / new ``B`` / article end; span end excludes the
  trailing space;
- ``--NME--`` maps to the NIL sentinel;
- entity URIs are mapped through an optional ``uri_to_qid`` dict
  (the reference chases redirects via KnowledgeBaseMapper; the engine
  takes the equivalent pre-built dimension mapping);
- train/dev/test = article-index ranges [0,945] / [946,1161] /
  [1162,1392] (``article_iterator``, :113-132).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

NIL = "<NIL>"

SPLITS = {"train": (0, 945), "dev": (946, 1161), "test": (1162, 1392)}

CONLL_LABEL_TYPE = pa.struct([
    ("id", pa.int32()),
    ("begin", pa.int32()),
    ("end", pa.int32()),
    ("entity_id", pa.string()),
])

CONLL_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("labels", pa.list_(CONLL_LABEL_TYPE)),
])


def parse_conll(content: str,
                uri_to_qid: Optional[Dict[str, str]] = None) -> List[dict]:
    """One file's content → list of article dicts (doc_id is the
    article index within the file)."""
    uri_to_qid = uri_to_qid or {}
    articles: List[dict] = []
    text_parts: List[str] = []
    text_len = 0  # running length of "".join(text_parts)
    labels: List[dict] = []
    open_span_start = -1
    open_entity: Optional[str] = None
    label_id = 0

    def close_label():
        nonlocal open_entity, label_id
        if open_entity is not None:
            labels.append({"id": label_id, "begin": open_span_start,
                           "end": text_len - 1,  # strip trailing space
                           "entity_id": open_entity})
            label_id += 1
            open_entity = None

    def close_article():
        nonlocal text_parts, text_len, labels, open_span_start, label_id
        close_label()
        if text_len:
            articles.append({"doc_id": len(articles),
                             "text": "".join(text_parts)[:-1],
                             "labels": labels})
        text_parts, text_len, labels = [], 0, []
        open_span_start, label_id = -1, 0

    for line in content.splitlines():
        cols = line.strip().split("\t")
        token = cols[0]
        if token.startswith("-DOCSTART-"):
            close_article()
        elif token:
            if len(cols) > 1 and cols[1] != "O":
                if cols[1] == "B" and cols[3] != "null":
                    close_label()
                    name = cols[3]
                    if name == "--NME--":
                        entity = NIL
                    else:
                        uri = cols[4] if len(cols) > 4 else name
                        entity = uri_to_qid.get(uri, uri)
                    open_span_start = text_len
                    open_entity = entity
                # I-tag or B/null continuation: label stays open
            else:
                close_label()
            text_parts.append(token + " ")
            text_len += len(token) + 1
    close_article()
    return articles


def _articles_table(articles: List[dict]) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([a["doc_id"] for a in articles], pa.int64()),
        "text": pa.array([a["text"] for a in articles], pa.string()),
        "labels": pa.array([a["labels"] for a in articles],
                           pa.list_(CONLL_LABEL_TYPE)),
    })


def read_conll_benchmark(path: str, split: Optional[str] = None,
                         uri_to_qid: Optional[Dict[str, str]] = None):
    """Path (file or dir of shards) → articles Dataset(doc_id, text,
    labels).  ``split``: 'train' / 'dev' / 'test' filters by the
    reference's fixed article-index ranges."""
    import ray.data as rd

    ds = rd.read_binary_files(path)

    def parse(row: dict) -> List[dict]:
        arts = parse_conll(row["bytes"].decode("utf-8"), uri_to_qid)
        if split is not None:
            lo, hi = SPLITS[split]
            arts = [a for a in arts if lo <= a["doc_id"] <= hi]
        return arts

    parsed = ds.flat_map(parse)

    def to_schema(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return CONLL_SCHEMA.empty_table()
        # rebuild labels from python — Arrow cast() refuses structs whose
        # inferred field order differs from the target type
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "text": batch.column("text").cast(pa.string()),
            "labels": pa.array(batch.column("labels").to_pylist(),
                               pa.list_(CONLL_LABEL_TYPE)),
        })

    return parsed.map_batches(to_schema, batch_format="pyarrow")
