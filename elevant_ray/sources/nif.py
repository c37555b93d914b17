"""NIF (NLP Interchange Format) benchmark source + sink — the
reference's NIF reader/writer semantics (helpers/nif_parser.py:27-114,
benchmark_readers/nif_benchmark_reader.py) over a self-contained
turtle-SUBSET parser (the reference uses pynif, not available here; the
subset covers the statement shape pynif emits: one ``<uri> a ... ;
pred obj ; ... .`` block per context/phrase with nif:isString /
nif:beginIndex / nif:endIndex / nif:referenceContext /
itsrdf:taIdentRef predicates).

Parity notes:
- article title = context-uri substring after the FIRST '/', unquoted
  (nif_parser.py:35);
- label entity id = taIdentRef substring after the LAST '/'
  (nif_parser.py:40-41);
- label names default "Unknown"; nested parent/child assignment is the
  shared quirky containment pass (sources/jsonl.assign_parent_child);
- writer emits wikidata-prefixed taIdentRef and skips NIL/unknown
  entities (nif_parser.py:84-96).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple
from urllib.parse import quote, unquote

from elevant_ray.sources.jsonl import assign_parent_child

WIKIDATA_PREFIX = "http://www.wikidata.org/entity/"
_NIL_IDS = {"<NIL>", "<NO_MAPPING>", "", None}

_STMT_RE = re.compile(r"<([^>]+)>\s+a\s+(.*?)\s\.\s*(?:\n|$)", re.DOTALL)
_PRED_URI_RE = {
    "referenceContext": re.compile(r"nif:referenceContext\s+<([^>]+)>"),
    "taIdentRef": re.compile(r"itsrdf:taIdentRef\s+<([^>]+)>"),
}
_PRED_INT_RE = {
    "beginIndex": re.compile(r'nif:beginIndex\s+"(\d+)"'),
    "endIndex": re.compile(r'nif:endIndex\s+"(\d+)"'),
}
_IS_STRING_RE = re.compile(r'nif:isString\s+"((?:[^"\\]|\\.)*)"')


def _escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            out.append({"n": "\n", "r": "\r", "t": "\t",
                        '"': '"', "\\": "\\"}.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def articles_to_nif(articles: List[dict],
                    collection_uri: str = "http://example.org/") -> str:
    """articles ``{title, text, labels: [{begin, end, entity_id}]}`` →
    NIF turtle string (nif_parser.py:83-114 shape)."""
    lines = [
        "@prefix nif: <http://persistence.uni-leipzig.org/nlp2rdf/"
        "ontologies/nif-core#> .",
        "@prefix itsrdf: <http://www.w3.org/2005/11/its/rdf#> .",
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
        "",
    ]
    for art in articles:
        text = art["text"]
        uri = collection_uri + quote(art.get("title") or "")
        ctx = f"{uri}#char=0,{len(text)}"
        lines += [
            f"<{ctx}> a nif:Context, nif:OffsetBasedString ;",
            f'    nif:beginIndex "0"^^xsd:nonNegativeInteger ;',
            f'    nif:endIndex "{len(text)}"^^xsd:nonNegativeInteger ;',
            f'    nif:isString "{_escape(text)}" .',
            "",
        ]
        for lb in art.get("labels", ()):
            if lb.get("entity_id") in _NIL_IDS:
                continue
            b, e = lb["begin"], lb["end"]
            lines += [
                f"<{uri}#char={b},{e}> a nif:OffsetBasedString, nif:Phrase ;",
                f'    nif:beginIndex "{b}"^^xsd:nonNegativeInteger ;',
                f'    nif:endIndex "{e}"^^xsd:nonNegativeInteger ;',
                f"    nif:referenceContext <{ctx}> ;",
                f"    itsrdf:taIdentRef <{WIKIDATA_PREFIX}{lb['entity_id']}> .",
                "",
            ]
    return "\n".join(lines)


def parse_nif(content: str, entity_mapper=None,
              sort_contexts: bool = False) -> List[dict]:
    """NIF turtle (subset) → articles ``{doc_id, title, text, labels}``,
    one per nif:Context, labels nested-linked (nif_parser.py:32-60).

    ``entity_mapper``: optional ``full taIdentRef URI -> entity id``
    override (default: substring after the last '/').  ``sort_contexts``
    sorts contexts by URI and drops empty-text contexts — the OKE
    reader's reproducibility rule (oke_benchmark_reader.py:45-51)."""
    contexts: Dict[str, dict] = {}
    phrases: List[dict] = []
    for m in _STMT_RE.finditer(content):
        uri, types_and_body = m.group(1), m.group(2)
        body = types_and_body
        is_string = _IS_STRING_RE.search(body)
        if "nif:Context" in body.split(";")[0] or is_string:
            if not is_string:
                continue
            contexts[uri] = {"uri": uri, "text": _unescape(is_string.group(1))}
            continue
        ref = _PRED_URI_RE["referenceContext"].search(body)
        ident = _PRED_URI_RE["taIdentRef"].search(body)
        b = _PRED_INT_RE["beginIndex"].search(body)
        e = _PRED_INT_RE["endIndex"].search(body)
        if ref and ident and b and e:
            phrases.append({"context": ref.group(1),
                            "begin": int(b.group(1)), "end": int(e.group(1)),
                            "uri": ident.group(1)})

    ctx_items = list(contexts.items())
    if sort_contexts:
        ctx_items = sorted(
            ((u, c) for u, c in ctx_items if c["text"]),
            key=lambda uc: uc[0])

    articles: List[dict] = []
    for doc_id, (uri, ctx) in enumerate(ctx_items):
        base = uri.split("#", 1)[0]
        title = unquote(base[base.find("/"):]) if "/" in base else base
        labels = []
        for i, ph in enumerate(sorted(
                (p for p in phrases if p["context"] == uri),
                key=lambda p: (p["begin"], p["end"]))):
            ent = ph["uri"]
            labels.append({
                "id": i, "begin": ph["begin"], "end": ph["end"],
                "entity_id": (entity_mapper(ent) if entity_mapper
                              else ent[ent.rfind("/") + 1:]),
                "name": "Unknown",
                "parent": None, "children": [], "optional": False,
                "type": None, "coref": None, "desc": False,
            })
        assign_parent_child(labels)
        articles.append({"doc_id": doc_id, "title": title,
                         "text": ctx["text"], "labels": labels})
    return articles


_SAME_AS_RE = re.compile(
    r"(?:owl:sameAs|<http://www\.w3\.org/2002/07/owl#sameAs>)\s+<([^>]+)>")


def parse_same_as(content: str) -> Dict[str, str]:
    """owl:sameAs subject→object mapping from the turtle subset
    (oke_benchmark_reader.py:84-97; the reference walks an rdflib graph,
    the engine scans per-statement blocks: the statement's leading
    ``<uri>`` is the subject)."""
    mapping: Dict[str, str] = {}
    for stmt in content.split(" .\n"):
        m_subj = re.search(r"<([^>]+)>", stmt)
        if not m_subj:
            continue
        m_obj = _SAME_AS_RE.search(stmt)
        if m_obj:
            mapping[m_subj.group(1)] = m_obj.group(1)
    return mapping


def parse_oke(content: str,
              title_to_qid: Optional[Dict[str, str]] = None,
              redirects: Optional[Dict[str, str]] = None) -> List[dict]:
    """OKE ttl → articles (oke_benchmark_reader.py:19-82): taIdentRefs
    are anonymous URIs resolved through the file's owl:sameAs mapping to
    a DBpedia URI, then normalized to a QID; refs with no sameAs entry
    stay ``<NIL>``.  Contexts sorted by URI, empty contexts dropped."""
    from elevant_ray.functions.normalize import NIL, wikidata_qid

    same_as = parse_same_as(content)

    def mapper(uri: str) -> str:
        if uri in same_as:
            return wikidata_qid(same_as[uri], title_to_qid or {}, redirects)
        return NIL

    return parse_nif(content, entity_mapper=mapper, sort_contexts=True)


def read_oke(path: str,
             title_to_qid: Optional[Dict[str, str]] = None,
             redirects: Optional[Dict[str, str]] = None):
    """OKE ttl file(s) → articles Dataset (per-file read tasks)."""
    return _read_nif_like(
        path, lambda content: parse_oke(content, title_to_qid, redirects))


def read_nif(path: str):
    """NIF file(s) → articles Dataset (per-file read tasks, deterministic
    doc ids by file order + in-file context order)."""
    return _read_nif_like(path, parse_nif)


def _read_nif_like(path: str, parse_fn):
    import os

    import pyarrow as pa
    import ray.data as rd

    from elevant_ray.sources.jsonl import FULL_LABEL_TYPE

    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])
    offsets, total = [], 0
    for p in paths:
        offsets.append(total)
        with open(p, "r", encoding="utf8") as fh:
            total += fh.read().count("nif:isString")

    items = [{"path": p, "offset": o} for p, o in zip(paths, offsets)]

    def load(batch: pa.Table) -> pa.Table:
        rows: List[dict] = []
        for item in batch.to_pylist():
            with open(item["path"], "r", encoding="utf8") as fh:
                for art in parse_fn(fh.read()):
                    art["doc_id"] += item["offset"]
                    rows.append(art)
        return pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "labels": pa.array([r["labels"] for r in rows],
                               pa.list_(FULL_LABEL_TYPE)),
        })

    return rd.from_items(items).map_batches(
        load, batch_format="pyarrow", batch_size=1)
