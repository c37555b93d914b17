"""External-linker prediction readers: Ambiverse, Wikifier, WEXEA.

Completes the reference's prediction-reader family (SURVEY.md §2.1;
``src/elevant/prediction_readers/*``) as pure per-file parsers fanned
out one read task per file.  The reference pairs these files with
benchmark articles by stream position (order-zip,
``abstract_prediction_reader.py:141-144``); the engine instead assigns
a deterministic ``doc_idx`` = the file's rank in the sorted directory
listing — exactly the order the reference would consume — so pairing
becomes an equi-join on ``doc_idx`` (or the text-prefix co-group in
``stages/align.py`` when no ids exist), ordering-free under
distributed execution.

Output schema (long/exploded — one row per predicted mention)::

    predictions(doc_idx: int64, begin: int32, end: int32,
                entity_id: string, candidates: list<string>)

Parsers and their reference parity targets:

- :func:`parse_ambiverse`
  (``ambiverse_prediction_reader.py:19-57``): per-file JSON; entity ids
  from ``matches[].entity.id`` URL tails, empty/absent → ``<NIL>``;
  the per-file ``entities[].name`` remap applied first ("the entity
  name is more trustworthy" rule, :27-40).
- :func:`parse_wikifier`
  (``wikifier_prediction_reader.py:20-95``): per-file XML; underscore→
  space titles, encoding-error ``?`` titles corrected via the page-id
  → title dimension (with the reference's 3658264 bad-page-id quirk,
  :36-45); candidates keep the reference's verbatim behavior of
  resolving every candidate with the TOP disambiguation's page id
  (:82, a reference bug preserved for parity).
- :func:`parse_wexea`
  (``wexea_prediction_reader.py:23-58``): ``[[target|text|type]]``
  markup; the visible text is rebuilt while links are stripped so
  spans index into clean text; ``DISAMBIGUATION*`` links skipped;
  ``coref`` selects coref vs non-coref link types.
"""

from __future__ import annotations

import json
import re
from typing import Dict, List, Optional
from xml.etree import ElementTree

import pyarrow as pa

from elevant_ray.functions.normalize import NIL, wikidata_qid

PREDICTION_SCHEMA = pa.schema([
    ("doc_idx", pa.int64()),
    ("begin", pa.int32()),
    ("end", pa.int32()),
    ("entity_id", pa.string()),
    ("candidates", pa.list_(pa.string())),
])


def parse_ambiverse(content: str,
                    title_to_qid: Optional[Dict[str, str]] = None,
                    redirects: Optional[Dict[str, str]] = None) -> List[dict]:
    """One Ambiverse result JSON → prediction dicts (span, qid,
    candidates)."""
    result = json.loads(content)
    title_to_qid = title_to_qid or {}

    remap: Dict[str, str] = {}
    for entity in result.get("entities", ()):
        entity_id = entity["id"].split("/")[-1]
        if entity_id != "null":
            from_name = wikidata_qid(entity["name"], title_to_qid, redirects)
            if from_name not in (NIL, "<NO_MAPPING>"):
                remap[entity_id] = from_name

    preds: List[dict] = []
    for match in result.get("matches", ()):
        begin = match["charOffset"]
        end = begin + match["charLength"]
        entity_id = (match["entity"]["id"].split("/")[-1]
                     if match.get("entity") else NIL)
        entity_id = entity_id or NIL  # empty string → NIL (:47-48)
        entity_id = remap.get(entity_id, entity_id) or entity_id
        preds.append({"begin": begin, "end": end, "entity_id": entity_id,
                      "candidates": [entity_id]})
    return preds


_BAD_WIKIFIER_PAGE_ID = 3658264  # reference quirk (:38-42)


def _correct_wikifier_title(wiki_title: str, wiki_id: int,
                            id_to_title: Dict[int, str]) -> str:
    by_id = id_to_title.get(wiki_id)
    if wiki_title != by_id and "?" in wiki_title:
        if wiki_id != _BAD_WIKIFIER_PAGE_ID and by_id is not None:
            return by_id
    return wiki_title


def parse_wikifier(content: str,
                   title_to_qid: Optional[Dict[str, str]] = None,
                   id_to_title: Optional[Dict[int, str]] = None,
                   redirects: Optional[Dict[str, str]] = None) -> List[dict]:
    """One Wikifier ``.full.xml`` result → prediction dicts."""
    title_to_qid = title_to_qid or {}
    id_to_title = id_to_title or {}
    root = ElementTree.fromstring(content)

    def to_qid(title: str) -> str:
        return wikidata_qid("https://en.wikipedia.org/wiki/"
                            + title.replace(" ", "_"),
                            title_to_qid, redirects)

    preds: List[dict] = []
    for ent in root.iter("Entity"):
        begin = int(ent.find("EntityTextStart").text)
        end = int(ent.find("EntityTextEnd").text)
        top = ent.find("TopDisambiguation")
        wiki_title = top.find("WikiTitle").text.replace("_", " ")
        wiki_id = int(top.find("WikiTitleID").text)
        wiki_title = _correct_wikifier_title(wiki_title, wiki_id, id_to_title)
        entity_id = to_qid(wiki_title)

        candidates = set()
        for cand in ent.find("DisambiguationCandidates").iter("Candidate"):
            cand_title = cand.find("WikiTitle").text.replace("_", " ")
            # verbatim reference behavior: candidates are corrected with
            # the TOP disambiguation's page id (:82)
            cand_title = _correct_wikifier_title(cand_title, wiki_id,
                                                 id_to_title)
            cand_qid = to_qid(cand_title)
            if cand_qid not in (NIL, "<NO_MAPPING>"):
                candidates.add(cand_qid)

        preds.append({"begin": begin, "end": end, "entity_id": entity_id,
                      "candidates": sorted(candidates)})
    return preds


_WEXEA_LINK_RE = re.compile(r"\[\[([^\[]*?\|)?([^\[]*?)\|([^\[]*?[^\]])\]\]")


def parse_wexea(content: str,
                title_to_qid: Optional[Dict[str, str]] = None,
                redirects: Optional[Dict[str, str]] = None,
                coref: bool = False) -> List[dict]:
    """One WEXEA annotated file → prediction dicts over the REBUILT clean
    text (links stripped, spans index into it)."""
    title_to_qid = title_to_qid or {}
    pos = 0
    out_len = 0
    preds: List[dict] = []
    for m in _WEXEA_LINK_RE.finditer(content):
        target = m.group(1).strip("|") if m.group(1) else None
        link_text = m.group(2)
        link_type = m.group(3)
        out_len += m.start() - pos
        begin = out_len
        out_len += len(link_text)
        end = out_len
        pos = m.end()
        if link_type.startswith("DISAMBIGUATION"):
            continue
        entity_id = wikidata_qid(target or "", title_to_qid, redirects)
        if (coref and "coref" in link_type) or \
                (not coref and "coref" not in link_type):
            preds.append({"begin": begin, "end": end, "entity_id": entity_id,
                          "candidates": [entity_id]})
    return preds


def rebuild_wexea_text(content: str) -> str:
    """The clean text WEXEA spans index into (links replaced by their
    visible text, wexea_prediction_reader.py:31-57)."""
    pos = 0
    parts: List[str] = []
    for m in _WEXEA_LINK_RE.finditer(content):
        parts.append(content[pos:m.start()])
        parts.append(m.group(2))
        pos = m.end()
    parts.append(content[pos:])
    return "".join(parts)


def parse_epgel(input_content: str, output_content: str) -> List[List[dict]]:
    """EPGEL paired input/output JSONL → per-article prediction lists
    (``epgel_prediction_reader.py:15-46``).

    The input file carries ``article_index, mention_start, mention_end``
    per line; the output file (same line count — a mismatch yields NO
    predictions, like the reference which only logs and returns the
    empty per-article dicts) carries ``candidates`` ranked best-first;
    the top candidate is the prediction, no candidates → unlinked
    (entity_id None)."""
    in_lines = input_content.splitlines()
    out_lines = output_content.splitlines()
    last_idx = json.loads(in_lines[-1])["article_index"] if in_lines else -1
    per_article: List[List[dict]] = [[] for _ in range(last_idx + 1)]
    if len(in_lines) != len(out_lines):
        return per_article
    for i_line, o_line in zip(in_lines, out_lines):
        inp, outp = json.loads(i_line), json.loads(o_line)
        cands = outp.get("candidates", [])
        per_article[inp["article_index"]].append({
            "begin": inp["mention_start"], "end": inp["mention_end"],
            "entity_id": cands[0] if cands else None,
            "candidates": list(cands),
        })
    return per_article


def read_epgel_predictions(output_path: str,
                           input_path: Optional[str] = None):
    """EPGEL output file (+ its input file, defaulting to the
    reference's ``output``→``input`` path convention,
    epgel_prediction_reader.py:54) → Dataset(PREDICTION_SCHEMA), one
    ``doc_idx`` per article_index."""
    import ray.data as rd

    input_path = input_path or output_path.replace("output", "input")
    with open(input_path, "r", encoding="utf8") as fh:
        in_content = fh.read()
    with open(output_path, "r", encoding="utf8") as fh:
        out_content = fh.read()
    per_article = parse_epgel(in_content, out_content)
    cols = {name: [] for name in PREDICTION_SCHEMA.names}
    for idx, preds in enumerate(per_article):
        for name, vals in _predictions_table(idx, preds).items():
            cols[name].extend(vals)
    return rd.from_arrow(pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in PREDICTION_SCHEMA}))


def _predictions_table(doc_idx: int, preds: List[dict]) -> dict:
    return {
        "doc_idx": [doc_idx] * len(preds),
        "begin": [p["begin"] for p in preds],
        "end": [p["end"] for p in preds],
        "entity_id": [p["entity_id"] for p in preds],
        "candidates": [p["candidates"] for p in preds],
    }


def read_predictions(path: str, fmt: str,
                     title_to_qid: Optional[Dict[str, str]] = None,
                     id_to_title: Optional[Dict[int, str]] = None,
                     redirects: Optional[Dict[str, str]] = None,
                     coref: bool = False,
                     suffix: Optional[str] = None):
    """Directory (or single file) of per-article result files →
    Dataset(PREDICTION_SCHEMA).  ``doc_idx`` is the file's rank in the
    sorted listing — the engine's ordering-free replacement for the
    reference's order-zip (abstract_prediction_reader.py:141-144;
    Wikifier keeps only ``.full.xml`` files, :99-103)."""
    import os

    import ray.data as rd

    if fmt not in ("ambiverse", "wikifier", "wexea"):
        raise ValueError(f"unknown prediction format {fmt!r}")
    if suffix is None and fmt == "wikifier":
        suffix = ".full.xml"

    files = ([os.path.join(path, f) for f in sorted(os.listdir(path))
              if not suffix or f.endswith(suffix)]
             if os.path.isdir(path) else [path])
    items = [{"path": p, "doc_idx": i} for i, p in enumerate(files)]

    def load(batch: pa.Table) -> pa.Table:
        cols = {name: [] for name in PREDICTION_SCHEMA.names}
        for item in batch.to_pylist():
            with open(item["path"], "r", encoding="utf8") as fh:
                content = fh.read()
            if fmt == "ambiverse":
                preds = parse_ambiverse(content, title_to_qid, redirects)
            elif fmt == "wikifier":
                preds = parse_wikifier(content, title_to_qid, id_to_title,
                                       redirects)
            else:
                preds = parse_wexea(content, title_to_qid, redirects, coref)
            for name, vals in _predictions_table(item["doc_idx"],
                                                 preds).items():
                cols[name].extend(vals)
        return pa.table(
            {f.name: pa.array(cols[f.name], f.type) for f in PREDICTION_SCHEMA})

    return rd.from_items(items).map_batches(
        load, batch_size=8, batch_format="pyarrow")
