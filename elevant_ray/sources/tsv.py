"""TSV-family benchmark readers: token-IOB TSV and PubTator.

Two more format adapters in the reference's benchmark-reader family
(SURVEY.md §2.1), each a pure per-file parse fanned out with one read
task per file (the file is the natural split unit — cross-document
state never crosses a file boundary):

- :func:`parse_tsv` — ``token \\t entity_reference \\t IOB`` lines,
  empty line = document boundary
  (``src/elevant/benchmark_readers/tsv_benchmark_reader.py:22-86``):
  text is tokens joined by single spaces; a ``B`` line opens a label
  whose span ends before the trailing space; ``I`` lines extend the
  open label's span; entity references map through an optional
  ``uri_to_qid`` dict (the KnowledgeBaseMapper analog — unmapped
  references pass through verbatim so a later stage can decide).
- :func:`parse_pubtator` — PubTator abstracts
  (``src/elevant/benchmark_readers/pubtator_benchmark_reader.py:18-66``):
  per document a ``id|t|title`` line, an ``id|a|abstract`` line, then
  ``id \\t start \\t end \\t mention \\t type \\t entity_id`` label
  lines; ``text = title + "\\n" + abstract``; entity ids without a
  ``:`` prefix get ``MESH:`` prepended (the reference's NCBI quirk,
  :55-58).

Both assign the nested-label forest linkage with the same quirky
semantics as the reference (``nested_groundtruth_handler.py:20-30``)
via :func:`elevant_ray.sources.jsonl.assign_parent_child`.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

from elevant_ray.sources.jsonl import FULL_LABEL_TYPE, assign_parent_child


def _label(label_id: int, begin: int, end: int, entity_id: str,
           name: str = "Unknown") -> dict:
    return {"id": label_id, "begin": begin, "end": end,
            "entity_id": entity_id, "name": name, "parent": None,
            "children": [], "optional": False, "type": None,
            "coref": None, "desc": False}


def parse_tsv(content: str,
              uri_to_qid: Optional[Dict[str, str]] = None,
              doc_id_start: int = 0) -> List[dict]:
    """One file's content → article dicts (tsv_benchmark_reader.py:22-86).

    Exact semantics: each token contributes ``token + " "`` to the text;
    a label's span is ``(start_of_token, len(text)-1)`` i.e. excludes
    the trailing space; ``I`` adjusts the last label's end; the final
    article text is ``text.strip()`` (the reference strips on Article
    construction, :32), which is a no-op for the span math because only
    the trailing space goes.
    """
    uri_to_qid = uri_to_qid or {}
    articles: List[dict] = []
    doc_id = doc_id_start

    text = ""
    labels: List[dict] = []
    label_id = 0

    def close_article():
        nonlocal text, labels, label_id, doc_id
        assign_parent_child(labels)
        articles.append({"doc_id": doc_id, "title": "",
                         "text": text.strip(), "labels": labels})
        doc_id += 1
        text, labels, label_id = "", [], 0

    for line in content.splitlines():
        line = line.strip()
        if not line:
            close_article()
            continue
        cols = line.split("\t")
        token, entity_reference, ner_iob = cols[0], cols[1], cols[2][0]
        start_idx = len(text)
        text += token + " "
        end_idx = len(text) - 1
        if ner_iob == "B":
            entity_id = uri_to_qid.get(entity_reference, entity_reference)
            labels.append(_label(label_id, start_idx, end_idx, entity_id))
            label_id += 1
        elif ner_iob == "I":
            labels[-1]["end"] = end_idx
    if text:
        close_article()
    return articles


def parse_pubtator(content: str, doc_id_start: int = 0) -> List[dict]:
    """One file's content → article dicts
    (pubtator_benchmark_reader.py:18-66).  ``doc_id`` is the engine's
    dense per-file index; the PubTator document id (PMID) is kept as the
    article ``title`` prefix ``title`` line's own text, matching the
    reference which stores it as the Article id."""
    articles: List[dict] = []
    doc_id = doc_id_start

    line_counter = 0
    text = ""
    title = ""
    labels: List[dict] = []
    label_id = 0

    def close_article():
        nonlocal text, title, labels, label_id, line_counter, doc_id
        assign_parent_child(labels)
        articles.append({"doc_id": doc_id, "title": title,
                         "text": text, "labels": labels})
        doc_id += 1
        text, title, labels, label_id, line_counter = "", "", [], 0, 0

    for line in content.split("\n"):
        if line == "":
            if line_counter:
                close_article()
            continue
        if line_counter == 0:
            _, _, title = line.split("|", 2)
            text += title + "\n"
        elif line_counter == 1:
            _, _, abstract = line.split("|", 2)
            text += abstract
        else:
            _, start, end, _, _, entity_id = line.split("\t")
            if ":" not in entity_id:
                entity_id = "MESH:" + entity_id  # NCBI quirk (:55-58)
            labels.append(_label(label_id, int(start), int(end), entity_id))
            label_id += 1
        line_counter += 1
    if line_counter:
        close_article()
    return articles


def _read_per_file(path: str, parse, count_docs):
    """Shared reader scaffold: list files, precompute per-file doc_id
    offsets (deterministic ids regardless of task order), parse each
    file in its own task."""
    import os

    import ray.data as rd

    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])
    offsets, total = [], 0
    for p in paths:
        offsets.append(total)
        with open(p, "r", encoding="utf8") as fh:
            total += count_docs(fh.read())

    items = [{"path": p, "offset": o} for p, o in zip(paths, offsets)]

    def load(batch: pa.Table) -> pa.Table:
        rows: List[dict] = []
        for item in batch.to_pylist():
            with open(item["path"], "r", encoding="utf8") as fh:
                rows.extend(parse(fh.read(), doc_id_start=item["offset"]))
        return pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "labels": pa.array([r["labels"] for r in rows],
                               pa.list_(FULL_LABEL_TYPE)),
        })

    return rd.from_items(items).map_batches(
        load, batch_size=1, batch_format="pyarrow")


def read_tsv_benchmark(path: str,
                       uri_to_qid: Optional[Dict[str, str]] = None):
    """IOB TSV file(s) → articles Dataset(doc_id, title, text, labels)."""
    def parse(content, doc_id_start=0):
        return parse_tsv(content, uri_to_qid, doc_id_start)

    def count_docs(content):
        return len(parse_tsv(content, {}))

    return _read_per_file(path, parse, count_docs)


def read_pubtator_benchmark(path: str):
    """PubTator file(s) → articles Dataset(doc_id, title, text, labels)."""
    def count_docs(content):
        return len(parse_pubtator(content))

    return _read_per_file(path, parse_pubtator, count_docs)


def parse_tagme(snippets: str, annotations: str,
                id_to_title: Optional[Dict[int, str]] = None,
                title_to_qid: Optional[Dict[str, str]] = None,
                redirects: Optional[Dict[str, str]] = None) -> List[dict]:
    """TagMe benchmark: a snippets TSV (``line_id \\t text``) plus an
    annotations TSV (``article_id \\t mention \\t wikipedia_id``),
    consumed in one forward pass with a single look-ahead annotation
    line — the reference's exact interleave
    (``tagme_benchmark_reader.py:24-103``):

    - a mention is located with ``text.lower().find(mention)`` (the
      annotation file carries lowercased mention strings); not found →
      label dropped;
    - wikipedia_id → title via the id→title dimension, missing →
      ``<NO_MAPPING>``; else title → QID through the normalizer;
    - an annotation whose article_id is *greater* than the current
      snippet's id is held over for the next snippet.
    """
    from elevant_ray.functions.normalize import NO_MAPPING, wikidata_qid

    id_to_title = id_to_title or {}
    title_to_qid = title_to_qid or {}
    articles: List[dict] = []

    ann_iter = iter(annotations.splitlines())
    article_id, mention_text, wikipedia_id = -1, "", -1
    exhausted = False

    for line in snippets.splitlines():
        if not line.strip("\n"):
            continue
        line_id_s, text = line.strip("\n").split("\t")
        line_id = int(line_id_s)
        labels: List[dict] = []
        label_id = 0
        while True:
            if article_id == line_id:
                mention_start = text.lower().find(mention_text)
                if mention_start > -1:
                    begin = mention_start
                    end = mention_start + len(mention_text)
                    title = id_to_title.get(wikipedia_id)
                    if not title:
                        entity_id = NO_MAPPING
                    else:
                        entity_id = wikidata_qid(
                            "https://en.wikipedia.org/wiki/"
                            + title.replace(" ", "_"),
                            title_to_qid, redirects)
                    labels.append(_label(label_id, begin, end, entity_id))
                    label_id += 1
            if exhausted:
                break
            ann = next(ann_iter, None)
            if ann is None:
                # Verbatim reference behavior: the last-read annotation
                # stays live and can re-match later snippet lines
                # (tagme_benchmark_reader.py:71-73 reads at loop end and
                # re-checks at the top for every subsequent snippet).
                exhausted = True
                break
            aid, mention_text, wid = ann.strip("\n").split("\t")
            article_id, wikipedia_id = int(aid), int(wid)
            if article_id > line_id:
                break
        assign_parent_child(labels)
        articles.append({"doc_id": len(articles), "title": "",
                         "text": text, "labels": labels})
    return articles


def read_tagme_benchmark(snippet_path: str, annotation_path: str,
                         id_to_title: Optional[Dict[int, str]] = None,
                         title_to_qid: Optional[Dict[str, str]] = None,
                         redirects: Optional[Dict[str, str]] = None):
    """TagMe snippet + annotation files → articles Dataset.  The two
    files interleave on a shared cursor, so the parse is one task; the
    result is a Dataset for downstream fan-out."""
    import ray.data as rd

    with open(snippet_path, "r", encoding="utf8") as fh:
        snippets = fh.read()
    with open(annotation_path, "r", encoding="utf8") as fh:
        annotations = fh.read()
    arts = parse_tagme(snippets, annotations, id_to_title, title_to_qid,
                       redirects)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([a["doc_id"] for a in arts], pa.int64()),
        "title": pa.array([a["title"] for a in arts], pa.string()),
        "text": pa.array([a["text"] for a in arts], pa.string()),
        "labels": pa.array([a["labels"] for a in arts],
                           pa.list_(FULL_LABEL_TYPE)),
    }))
