"""WikiExtractor-markup text extraction — the byte-identity kernel.

Re-implements, from scratch, the semantics of the reference extractor
(``src/elevant/helpers/wikipedia_dump_reader.py:58-167``,
``_process_extractor_text``): replace ``<a href="...">``/``<b>`` tag pairs
by their inner text while recording hyperlink spans + targets and
bold-in-abstract title-synonym spans, and strip ``\\nSection::::Title``
headers while recording section spans.  The north rule requires the
extracted ``text`` to be byte-identical per url to the reference
(BASELINE.json ``input_hint``), so every branch below — including two
deliberate quirks of the original — is mirrored exactly and covered by
differential tests in ``tests/test_extract.py``:

* a "pseudo-tag" ``< ... >`` (tag body starting AND ending with a space)
  is kept in the text; the reference implements the undo as
  ``text = text[:-k]`` which, when ``k == 0`` (pseudo-tag adjacent to the
  previous match), wipes the whole accumulated text — mirrored;
* bold spans count as title synonyms only while the accumulated text
  contains fewer than two paragraph breaks (``"\\n\\n"``), i.e. the bold
  text starts in the first two paragraphs.

The per-document state machine is inherently sequential, but documents
are independent → it runs as a vectorized-over-rows ``map_batches``
kernel (``extract_batch``) with Arrow list<struct> outputs.
"""

from __future__ import annotations

import re
from typing import List, Tuple
from urllib.parse import unquote

import pyarrow as pa

# Tag and section-header patterns (reference: wikipedia_dump_reader.py:17-18).
_TAG_RE = re.compile(r"<([/]?)([^<>]*)>")
_SECTION_RE = re.compile(r"\nSection::::([^\n]*)$", re.MULTILINE)

# Title of the implicit leading section (reference: models/article.py:10).
ABSTRACT_SECTION = "ABSTRACT"

_HREF_PREFIX = '<a href="'

Span = Tuple[int, int]


def link_target_of(tag_text: str) -> str:
    """Link target of an ``<a href="...">`` start tag, percent-decoded.

    Mirrors ``wikipedia_dump_reader.py:39-56``: anything not starting with
    the exact ``<a href="`` prefix yields "".
    """
    if not tag_text.startswith(_HREF_PREFIX):
        return ""
    close = tag_text.find('"', len(_HREF_PREFIX))
    return unquote(tag_text[len(_HREF_PREFIX):close])


def extract_page(markup: str):
    """Extract plain text + annotation spans from WikiExtractor markup.

    Returns ``(text, hyperlinks, title_synonyms, sections)`` where
    ``hyperlinks``    = [((begin, end), target), ...]
    ``title_synonyms``= [(begin, end), ...]
    ``sections``      = [((begin, end), title), ...]
    with offsets into the returned ``text``.  Semantics byte-identical to
    the reference (``wikipedia_dump_reader.py:58-167``).
    """
    out = ""          # accumulated output text (string, to mirror undo quirk)
    pos = 0           # cursor into `markup`: everything before it is consumed

    hyperlinks: List[Tuple[Span, str]] = []
    synonyms: List[Span] = []
    bold_at = -1      # output offset where an open <b> started, -1 = closed
    link_at = -1      # output offset where an open <a href> started
    target = ""       # target of the currently open link

    sections: List[Tuple[Span, str]] = []
    sec_begin = 0
    sec_title = ABSTRACT_SECTION

    tags = _TAG_RE.finditer(markup)
    secs = _SECTION_RE.finditer(markup)
    tag = next(tags, None)
    sec = next(secs, None)

    while tag or sec:
        if tag and (sec is None or sec.start() > tag.start()):
            # ---- a tag comes first ----
            out += markup[pos:tag.start()]
            body = tag.group(2)
            if not tag.group(1):            # opening tag
                if body == "b":
                    bold_at = len(out)
                elif body.startswith("a "):
                    link_at = len(out)
                    target = link_target_of(tag.group(0))
                elif body.startswith(" ") and body.endswith(" "):
                    # Pseudo-tag like "< not a tag >": keep it in the text.
                    # Undo the append above; mirrors the reference's
                    # text[:-k] including the k==0 full-wipe quirk.
                    out = out[:-(tag.start() - pos)]
                    tag = next(tags, None)
                    continue                # pos intentionally NOT advanced
            else:                           # closing tag
                if body == "b":
                    if out.count("\n\n") < 2 and bold_at >= 0:
                        synonyms.append((bold_at, len(out)))
                    bold_at = -1
                elif body == "a":
                    if link_at >= 0:
                        hyperlinks.append(((link_at, len(out)), target))
                    link_at = -1
            pos = tag.end()
            tag = next(tags, None)
        else:
            # ---- a section header comes first ----
            # tags inside the header are dropped (yes, that happens)
            while tag and tag.start() < sec.end():
                tag = next(tags, None)
            out += markup[pos:sec.start()]
            # +1: the newline after the header belongs to the section before
            sec_end = len(out) + 1
            sections.append(((sec_begin, sec_end), sec_title))
            sec_title = sec.group(1)
            sec_begin = sec_end
            pos = sec.end()
            sec = next(secs, None)

    out += markup[pos:]
    sections.append(((sec_begin, len(out)), sec_title))
    return out, hyperlinks, synonyms, sections


# ---------------------------------------------------------------------------
# Arrow plumbing: map_batches kernel over the `pages` table
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct([("begin", pa.int32()), ("end", pa.int32())])
LINK_STRUCT = pa.struct(
    [("begin", pa.int32()), ("end", pa.int32()), ("target", pa.string())]
)
SECTION_STRUCT = pa.struct(
    [("begin", pa.int32()), ("end", pa.int32()), ("title", pa.string())]
)


def extract_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` kernel: pages(url, warc_ts, html, lang, ...) →
    + text, hyperlinks, title_synonyms, sections; the wide ``html`` column
    is dropped immediately so downstream blocks stay small (SURVEY §4
    memory note).  Stateless → runs as Ray tasks, no actor needed.
    """
    htmls = batch.column("html").to_pylist()
    texts: List[str] = []
    links_col, syn_col, sec_col = [], [], []
    for raw in htmls:
        markup = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else (raw or "")
        text, links, syns, secs = extract_page(markup)
        texts.append(text)
        links_col.append(
            [{"begin": b, "end": e, "target": t} for (b, e), t in links]
        )
        syn_col.append([{"begin": b, "end": e} for b, e in syns])
        sec_col.append(
            [{"begin": b, "end": e, "title": t} for (b, e), t in secs]
        )
    # drop the wide html column and any pre-existing extraction outputs
    # (CC-style inputs ship a `text` column; extraction is authoritative)
    drop = {"html", "text", "hyperlinks", "title_synonyms", "sections"}
    keep = [n for n in batch.column_names if n not in drop]
    out = batch.select(keep)
    out = out.append_column("text", pa.array(texts, type=pa.string()))
    out = out.append_column("hyperlinks", pa.array(links_col, type=pa.list_(LINK_STRUCT)))
    out = out.append_column("title_synonyms", pa.array(syn_col, type=pa.list_(SPAN_STRUCT)))
    out = out.append_column("sections", pa.array(sec_col, type=pa.list_(SECTION_STRUCT)))
    return out


def abstract_span(text: str, sections) -> tuple:
    """(begin, end) of the article abstract — the first-section text
    after the title block, with a leading coordinate line filtered out.

    Parity target: ``src/elevant/models/article.py:118-135``
    (``Article.get_abstract_span``), including its quirks: the title
    block ends at the first ``\\n\\n`` (when absent, ``find`` returns -1
    so the abstract starts at offset 1), and a first line shorter than
    60 chars containing ``°`` is treated as a coordinate line and
    skipped.  ``sections`` accepts the engine's dict rows
    ({begin,end,title}) or the reference's ((begin,end),title) tuples.
    """
    if not sections:
        raise ValueError("abstract_span needs section data")
    first = sections[0]
    if isinstance(first, dict):
        s_begin, s_end = int(first["begin"]), int(first["end"])
    else:
        (s_begin, s_end) = first[0]
    first_section_text = text[s_begin:s_end]
    title_end = first_section_text.find("\n\n") + 2
    abstract_start = title_end
    abstract_text = text[abstract_start:s_end]
    first_newline = abstract_text.find("\n")
    if 0 < first_newline < 60 and "°" in abstract_text[:first_newline] \
            and len(abstract_text) > first_newline + 2:
        abstract_start = title_end + first_newline + 1
    return abstract_start, s_end
