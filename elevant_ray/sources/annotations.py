"""Inline entity-annotation export/import — the reference's article
exporter format ``[<QID>:<name>|<mention>]`` (scripts/write_articles.py:84,122,
annotations applied right-to-left so earlier offsets stay valid) and the
NER-only ``[[<mention>]]`` variant (:102).

The writer is a stateless ``map_batches`` kernel (one annotated string
per article row); the reader inverts it exactly — round-trip
``parse(annotate(text, labels)) == (text, labels)`` is property-tested.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

_ANNOT_RE = re.compile(r"\[([^:\[\]|]+):([^|\[\]]*)\|([^\[\]]*)\]")
_NER_RE = re.compile(r"\[\[([^\[\]]*)\]\]")


def annotate_text(text: str, labels: List[dict],
                  names: Optional[Dict[str, str]] = None) -> str:
    """Inline ``[QID:name|mention]`` annotations, applied reverse-sorted
    by span (write_articles.py:77-87)."""
    names = names or {}
    for lb in sorted(labels, key=lambda l: (l["begin"], l["end"]),
                     reverse=True):
        b, e = lb["begin"], lb["end"]
        name = lb.get("name") or names.get(lb["entity_id"], "Unknown")
        text = (text[:b]
                + f"[{lb['entity_id']}:{name}|{text[b:e]}]"
                + text[e:])
    return text


def parse_annotated_text(annotated: str) -> Tuple[str, List[dict]]:
    """Invert ``annotate_text``: plain text + labels with original
    offsets."""
    out: List[str] = []
    labels: List[dict] = []
    pos = 0          # cursor in the annotated string
    plain_len = 0    # length of reconstructed plain text
    for m in _ANNOT_RE.finditer(annotated):
        out.append(annotated[pos:m.start()])
        plain_len += m.start() - pos
        mention = m.group(3)
        labels.append({"begin": plain_len, "end": plain_len + len(mention),
                       "entity_id": m.group(1), "name": m.group(2)})
        out.append(mention)
        plain_len += len(mention)
        pos = m.end()
    out.append(annotated[pos:])
    return "".join(out), labels


def ner_annotate_text(text: str, labels: List[dict]) -> str:
    """NER-only ``[[mention]]`` markers (write_articles.py:94-103
    semantics: root labels only — caller pre-filters)."""
    for lb in sorted(labels, key=lambda l: (l["begin"], l["end"]),
                     reverse=True):
        b, e = lb["begin"], lb["end"]
        text = text[:b] + "[[" + text[b:e] + "]]" + text[e:]
    return text


def parse_ner_annotated_text(annotated: str) -> Tuple[str, List[Tuple[int, int]]]:
    out: List[str] = []
    spans: List[Tuple[int, int]] = []
    pos = 0
    plain_len = 0
    for m in _NER_RE.finditer(annotated):
        out.append(annotated[pos:m.start()])
        plain_len += m.start() - pos
        mention = m.group(1)
        spans.append((plain_len, plain_len + len(mention)))
        out.append(mention)
        plain_len += len(mention)
        pos = m.end()
    out.append(annotated[pos:])
    return "".join(out), spans


def annotate_batch(batch: pa.Table, text_col: str = "text",
                   labels_col: str = "labels") -> pa.Table:
    """articles(text, labels) → + annotated column (stateless MB)."""
    annotated = [
        annotate_text(t, [dict(l) for l in ls or ()])
        for t, ls in zip(batch.column(text_col).to_pylist(),
                         batch.column(labels_col).to_pylist())]
    return batch.append_column("annotated", pa.array(annotated, pa.string()))
