"""XML benchmark reader (ACE / MSNBC / AQUAINT shapes) plus the
ReFinED-JSONL and Newscrawl formats.

Reference parity targets (SURVEY.md §2.1):

- :func:`parse_xml_mentions` — single labels XML with ``<document
  docName>`` / ``<annotation>`` children
  (``src/elevant/benchmark_readers/xml_benchmark_reader.py:73-88``);
- :func:`parse_xml_mention_dir_file` — the per-document variant where
  an element STREAM of ``ReferenceFileName`` / ``Offset`` / ``Length``
  / ``Annotation`` tags is folded with a running span cursor
  (``:90-116``, incl. the ``none`` / ``---`` → NIL and
  ``http://en.wikipedia.org/wiki/`` strip rules);
- :func:`xml_articles` — text files are LEFT-STRIPPED and spans
  shifted by the stripped offset (the Neural-EL leading-whitespace
  workaround, ``:33-35``); labels sorted by span start before id
  assignment (``:45``); ``NIL``/None references → ``<NIL>``, others
  through the title→QID normalizer;
- :func:`parse_refined_jsonl` — ``{doc_title?, text, mentions:
  [{start, length, wiki_name}]}`` per line
  (``refined_jsonl_benchmark_reader.py:23-59``);
- :func:`parse_newscrawl` — newscrawl JSONL ``{id, date, text}``;
  title = ``date + " - " + first paragraph`` with newlines removed,
  id dots stripped (``helpers/newscrawl_dump_reader.py:19-32``).

All readers emit the articles schema ``(doc_id, title, text, labels)``
with the nested-forest linkage from
:func:`elevant_ray.sources.jsonl.assign_parent_child`.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree

import pyarrow as pa

from elevant_ray.functions.normalize import NIL, wikidata_qid
from elevant_ray.sources.jsonl import FULL_LABEL_TYPE, assign_parent_child


def _label(label_id: int, begin: int, end: int, entity_id: str) -> dict:
    return {"id": label_id, "begin": begin, "end": end,
            "entity_id": entity_id, "name": "Unknown", "parent": None,
            "children": [], "optional": False, "type": None,
            "coref": None, "desc": False}


Mention = Tuple[Tuple[int, int], Optional[str]]


def parse_xml_mentions(content: str) -> Dict[str, List[Mention]]:
    """Single labels-XML → ``{docName: [((begin,end), wiki_title), …]}``
    (xml_benchmark_reader.py:73-88)."""
    root = ElementTree.fromstring(content)
    out: Dict[str, List[Mention]] = {}
    for document in root.iter("document"):
        doc_name = document.get("docName")
        out[doc_name] = []
        for annotation in document.iter("annotation"):
            wiki_title = annotation.find("wikiName").text
            start = int(annotation.find("offset").text)
            length = int(annotation.find("length").text)
            out[doc_name].append(((start, start + length), wiki_title))
    return out


def parse_xml_mention_dir_file(content: str) -> Dict[str, List[Mention]]:
    """One per-document mentions XML (element-stream variant) →
    ``{reference_filename: [(span, entity), …]}``
    (xml_benchmark_reader.py:90-116): a running (Offset, Length) cursor
    is consumed by the next Annotation element."""
    root = ElementTree.fromstring(content)
    out: Dict[str, List[Mention]] = {}
    reference_filename = ""
    curr_offset = -1
    curr_span = (-1, -1)
    for element in root.iter():
        if element.tag == "ReferenceFileName":
            reference_filename = element.text.strip()
            out[reference_filename] = []
        elif element.tag == "Annotation":
            ent = element.text.strip().strip('"').replace("_", " ")
            ent = ent.replace("http://en.wikipedia.org/wiki/", "")
            ent = "NIL" if ent in ("none", "---") else ent
            out[reference_filename].append((curr_span, ent))
        elif element.tag == "Offset":
            curr_offset = int(element.text.strip())
        elif element.tag == "Length":
            curr_length = int(element.text.strip())
            curr_span = (curr_offset, curr_offset + curr_length)
    return out


def xml_articles(mention_dict: Dict[str, List[Mention]],
                 texts: List[Tuple[str, str]],
                 title_to_qid: Optional[Dict[str, str]] = None,
                 redirects: Optional[Dict[str, str]] = None) -> List[dict]:
    """``texts`` = [(filename, raw text)] in sorted-filename order →
    article dicts (xml_benchmark_reader.py:27-71)."""
    title_to_qid = title_to_qid or {}
    articles: List[dict] = []
    for doc_id, (filename, text) in enumerate(texts):
        stripped = text.lstrip()
        offset = len(text) - len(stripped)
        labels: List[dict] = []
        for (b, e), wiki_name in sorted(mention_dict.get(filename, []),
                                        key=lambda x: x[0][0]):
            if wiki_name != "NIL" and wiki_name is not None:
                entity_id = wikidata_qid(
                    "https://en.wikipedia.org/wiki/"
                    + wiki_name.replace(" ", "_"),
                    title_to_qid, redirects)
            else:
                entity_id = NIL
            labels.append(_label(len(labels), b - offset, e - offset,
                                 entity_id))
        assign_parent_child(labels)
        articles.append({"doc_id": doc_id, "title": filename,
                         "text": stripped, "labels": labels})
    return articles


def read_xml_benchmark(labels_file_or_dir: str, text_dir: str,
                       title_to_qid: Optional[Dict[str, str]] = None,
                       redirects: Optional[Dict[str, str]] = None):
    """Labels XML (file or per-document dir) + text dir → articles
    Dataset.  The mention dictionary is tiny (one tuple per gold label)
    and built on the driver; text files fan out one read task per file
    with ``doc_id`` = sorted-filename rank."""
    import os

    import ray.data as rd

    mention_dict: Dict[str, List[Mention]] = {}
    if os.path.isdir(labels_file_or_dir):
        for xml_file in sorted(os.listdir(labels_file_or_dir)):
            with open(os.path.join(labels_file_or_dir, xml_file),
                      "r", encoding="utf8") as fh:
                mention_dict.update(parse_xml_mention_dir_file(fh.read()))
    else:
        with open(labels_file_or_dir, "r", encoding="utf8") as fh:
            mention_dict = parse_xml_mentions(fh.read())

    filenames = sorted(os.listdir(text_dir))
    items = [{"path": os.path.join(text_dir, f), "filename": f,
              "doc_id": i} for i, f in enumerate(filenames)]

    def load(batch: pa.Table) -> pa.Table:
        rows: List[dict] = []
        for item in batch.to_pylist():
            with open(item["path"], "r", encoding="utf8") as fh:
                text = fh.read()
            art = xml_articles(mention_dict, [(item["filename"], text)],
                               title_to_qid, redirects)[0]
            art["doc_id"] = item["doc_id"]
            rows.append(art)
        return _articles_table(rows)

    return rd.from_items(items).map_batches(
        load, batch_size=8, batch_format="pyarrow")


def parse_refined_jsonl(content: str,
                        title_to_qid: Optional[Dict[str, str]] = None,
                        redirects: Optional[Dict[str, str]] = None,
                        doc_id_start: int = 0) -> List[dict]:
    """ReFinED-JSONL lines → article dicts
    (refined_jsonl_benchmark_reader.py:23-59)."""
    title_to_qid = title_to_qid or {}
    articles: List[dict] = []
    doc_id = doc_id_start
    for line in content.splitlines():
        line = line.strip()
        if not line:
            continue
        obj = json.loads(line)
        labels: List[dict] = []
        for raw in obj["mentions"]:
            begin = raw["start"]
            end = begin + raw["length"]
            entity_id = wikidata_qid(
                "https://en.wikipedia.org/wiki/"
                + str(raw["wiki_name"]).replace(" ", "_"),
                title_to_qid, redirects) if raw["wiki_name"] else NIL
            labels.append(_label(len(labels), begin, end, entity_id))
        assign_parent_child(labels)
        articles.append({"doc_id": doc_id,
                         "title": obj.get("doc_title", ""),
                         "text": obj["text"], "labels": labels})
        doc_id += 1
    return articles


def parse_newscrawl(content: str, doc_id_start: int = 0) -> List[dict]:
    """Newscrawl JSONL ``{id, date, text}`` lines → article dicts
    (newscrawl_dump_reader.py:19-32): the title is the date plus the
    first paragraph, newline-free; no labels."""
    articles: List[dict] = []
    doc_id = doc_id_start
    for line in content.splitlines():
        line = line.strip()
        if not line:
            continue
        obj = json.loads(line)
        title = obj["date"] + " - " + obj["text"].split("\n\n")[0]
        title = title.replace("\n", "")
        articles.append({"doc_id": doc_id, "title": title,
                         "text": obj["text"], "labels": [],
                         "source_id": obj["id"].replace(".", "")})
        doc_id += 1
    return articles


def _articles_table(rows: List[dict],
                    extra_cols: Tuple[str, ...] = ()) -> pa.Table:
    cols = {
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "title": pa.array([r["title"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "labels": pa.array([r["labels"] for r in rows],
                           pa.list_(FULL_LABEL_TYPE)),
    }
    for c in extra_cols:
        cols[c] = pa.array([r[c] for r in rows], pa.string())
    return pa.table(cols)


def _read_jsonl_per_file(path: str, parse, extra_cols: Tuple[str, ...] = ()):
    import os

    import ray.data as rd

    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])
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
                rows.extend(parse(fh.read(), doc_id_start=item["offset"]))
        return _articles_table(rows, extra_cols)

    return rd.from_items(items).map_batches(
        load, batch_size=1, batch_format="pyarrow")


def expand_span_alpha(text: str, begin: int, end: int) -> Tuple[int, int]:
    """Widen a span to full alphabetic runs — the WikipediaReader's
    hyperlink-span expansion (benchmark_readers/wikipedia_reader.py:11-17;
    NOTE: the reference's ``begin - 1 > 0`` means a span can never expand
    to offset 0 — replicated verbatim)."""
    while begin - 1 > 0 and text[begin - 1].isalpha():
        begin -= 1
    while end < len(text) and text[end].isalpha():
        end += 1
    return begin, end


def hyperlinks_to_labels(pages,
                         title_to_qid: Optional[Dict[str, str]] = None,
                         redirects: Optional[Dict[str, str]] = None,
                         text_col: str = "text",
                         hyperlinks_col: str = "hyperlinks"):
    """Pages with extracted ``hyperlinks: list<struct<begin,end,target>>``
    → add a ``labels`` column built from the links — the engine's
    WikipediaReader (wikipedia_reader.py:20-36): spans alpha-expanded,
    targets mapped title→QID."""
    title_to_qid = title_to_qid or {}

    def to_labels(batch: pa.Table) -> pa.Table:
        all_labels: List[List[dict]] = []
        for text, links in zip(batch.column(text_col).to_pylist(),
                               batch.column(hyperlinks_col).to_pylist()):
            labels: List[dict] = []
            for link in links or ():
                b, e = expand_span_alpha(text, link["begin"], link["end"])
                qid = wikidata_qid(
                    "https://en.wikipedia.org/wiki/"
                    + link["target"].replace(" ", "_"),
                    title_to_qid, redirects)
                labels.append(_label(len(labels), b, e, qid))
            all_labels.append(labels)
        return batch.append_column(
            "labels", pa.array(all_labels, pa.list_(FULL_LABEL_TYPE)))

    return pages.map_batches(to_labels, batch_format="pyarrow")


def read_refined_jsonl(path: str,
                       title_to_qid: Optional[Dict[str, str]] = None,
                       redirects: Optional[Dict[str, str]] = None):
    """ReFinED-JSONL file(s) → articles Dataset."""
    def parse(content, doc_id_start=0):
        return parse_refined_jsonl(content, title_to_qid, redirects,
                                   doc_id_start)

    return _read_jsonl_per_file(path, parse)


def read_newscrawl(path: str):
    """Newscrawl JSONL file(s) → articles Dataset (keeps the dot-stripped
    upstream document id as ``source_id``, the reference's Article.id)."""
    return _read_jsonl_per_file(path, parse_newscrawl,
                                extra_cols=("source_id",))
