"""Normalizers: URL canonicalization (blocking key) and entity-reference →
QID normalization.

``canonical_url`` is the engine's URL blocking key for Common-Crawl-style
pages (north rule: "canonicalized URLs" blocking).  The rule chain is
fixed and mirrored in oracle SQL (``__ray_entry__.py``): lowercase scheme
+ host, drop scheme, drop ``www.`` prefix, drop fragment, drop tracking
query params (utm_*/ref/fbclid/gclid), drop empty query, collapse
duplicate slashes in the path, drop trailing slash.

``wikidata_qid`` re-expresses the reference's entity-reference normalizer
(``src/elevant/utils/knowledge_base_mapper.py:56-117``): URI → last path
segment, KB detection by substring, percent-decode, ``_``→space,
unprintable-strip, then a broadcast title→QID dict with redirect chase
(``entity_database.py:345-356``: ≤1 redirect hop + lowercase-first-letter
retry).
"""

from __future__ import annotations

import re
from typing import Dict, Optional
from urllib.parse import unquote

NIL = "<NIL>"
NO_MAPPING = "<NO_MAPPING>"

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
_TRACKING_RE = re.compile(r"^(utm_[a-z0-9_]*|ref|fbclid|gclid)$")
_QID_RE = re.compile(r"Q[0-9]+")


def canonical_url(url: str) -> str:
    u = url.strip()
    u = _SCHEME_RE.sub("", u)
    # split off fragment
    u = u.split("#", 1)[0]
    # host[:port] is everything before the first "/", lowercased
    slash = u.find("/")
    if slash == -1:
        host, rest = u, ""
    else:
        host, rest = u[:slash], u[slash:]
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    # strip tracking params, keep the rest in original order
    path, _, query = rest.partition("?")
    if query:
        kept = [p for p in query.split("&")
                if p and not _TRACKING_RE.match(p.split("=", 1)[0].lower())]
        query = "&".join(kept)
    path = re.sub(r"//+", "/", path)
    if path.endswith("/"):
        path = path[:-1]
    return host + path + (("?" + query) if query else "")


_NIL_ALIASES = ("NIL", "<NIL>", "<unk_wid>", "<unk>", "<UNK>")


def wikidata_qid(
    entity_reference: str,
    title_to_qid: Dict[str, str],
    redirects: Optional[Dict[str, str]] = None,
) -> str:
    """Normalize an entity reference (URI / title / QID) to a Wikidata QID,
    or a sentinel.  Parity target: knowledge_base_mapper.py:56-117."""
    if not entity_reference:
        return NIL
    if entity_reference in _NIL_ALIASES:
        return NIL
    name = entity_reference[entity_reference.rfind("/") + 1:]
    if not name:
        return NIL
    if "/notInWiki/" in entity_reference:
        return NIL

    is_wikidata = "wikidata.org/" in entity_reference
    known_kb = is_wikidata or "wikipedia.org/" in entity_reference \
        or "dbpedia.org/" in entity_reference

    if is_wikidata or (not known_kb and _QID_RE.match(name)):
        return name

    if name != entity_reference:
        name = unquote(name)
    name = name.replace("_", " ")
    name = "".join(c for c in name if c.isprintable())
    qid = title_to_qid_lookup(name, title_to_qid, redirects or {})
    return qid if qid else NO_MAPPING


def title_to_qid_lookup(
    title: str, title_to_qid: Dict[str, str], redirects: Dict[str, str]
) -> Optional[str]:
    """Title → QID with one redirect hop and a lowercased-first-letter
    retry (entity_database.py:345-356)."""
    for cand in (title, title[:1].lower() + title[1:] if title else title):
        if cand in title_to_qid:
            return title_to_qid[cand]
        if cand in redirects:
            dst = redirects[cand]
            if dst in title_to_qid:
                return title_to_qid[dst]
    return None
