"""Popular-entities linker — the ELEVANT PopularEntitiesLinker
(src/elevant/linkers/popular_entities_linker.py:38-262) re-expressed
spaCy-free, using the engine's longest-alias NER (functions/ner.py, the
reference's ``longest_alias_ner`` configuration) for named mentions and
a word-level prefix trie for the lowercase non-named scan.

Ported verbatim:
- the lowercase-name prefix trie build with sitelink-argmax for
  ambiguous names (:55-69; tie broken min-QID — the reference's
  strictly-greater scan over a set is insertion-order-dependent);
- ``select_entity``: sorted(names+demonyms) before sorted(aliases),
  sitelink count ≥ min_score and strictly greater wins (:246-259);
- ``predict_globally``'s per-document flow: per-snippet prediction
  cache, islower / is_date skips, unknown-person-name-part
  suppression (:114-168);
- the lowercase trie scan: snippet growth while a subtrie exists,
  singular-form fallback (``snippet[:-1]``), last-hit backtracking,
  overlap rejection against named predictions, min-score +
  not-only-OTHER-type gate, jump to j+1 (:170-230).

Differs (no spaCy / dependency parse in this environment):
- ``is_language`` uses the "in <Language>" surface check only (the
  reference additionally requires dep_ == "pobj");
- ``is_person`` is always False under longest-alias NER — exactly the
  reference's own behavior in that configuration (:87-89 TODO note);
- the NOUN-in-span gate of the lowercase scan is the ``assume_nouns``
  parameter (True = every span passes, the useful default without a
  tagger);
- stopword/punctuation token tests use the engine's fixed stopword
  inventory and ``str.isalnum``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import pyarrow as pa

from elevant_ray.functions.dates import is_date
from elevant_ray.functions.ner import alias_mentions
from elevant_ray.functions.prior import tokenize_with_offsets
from elevant_ray.functions.tokens import EN_STOP

NIL = "<NIL>"
OTHER_TYPE = "OTHER"


class WordTrie:
    """Minimal word-level (space-separated) prefix trie — the pygtrie
    StringTrie(separator=" ") surface the reference uses: membership,
    value lookup, and has_subtrie (key is a PROPER prefix of some key)."""

    __slots__ = ("_root",)

    def __init__(self):
        self._root: dict = {}

    def insert(self, key: str, value) -> None:
        node = self._root
        entry = None
        for w in key.split(" "):
            if w not in node:
                node[w] = {"_children": {}, "_value": None, "_has": False}
            entry = node[w]
            node = entry["_children"]
        entry["_value"] = value
        entry["_has"] = True

    def _walk(self, key: str) -> Optional[dict]:
        node = self._root
        entry = None
        for w in key.split(" "):
            if w not in node:
                return None
            entry = node[w]
            node = entry["_children"]
        return entry

    def __contains__(self, key: str) -> bool:
        e = self._walk(key)
        return bool(e and e["_has"])

    def get(self, key: str):
        e = self._walk(key)
        return e["_value"] if e and e["_has"] else None

    def has_subtrie(self, key: str) -> bool:
        e = self._walk(key)
        return bool(e and e["_children"])

    def __len__(self) -> int:
        count = 0
        stack = [self._root]
        while stack:
            node = stack.pop()
            for entry in node.values():
                if entry["_has"]:
                    count += 1
                stack.append(entry["_children"])
        return count


def build_lowercase_trie(name_to_qids: Dict[str, Set[str]],
                         sitelinks: Dict[str, int]) -> WordTrie:
    """Lowercase-name trie: unambiguous name → its QID; ambiguous →
    sitelink argmax (popular_entities_linker.py:55-69), ties min-QID."""
    trie = WordTrie()
    for name, qids in name_to_qids.items():
        if not name.islower():
            continue
        qids = set(qids)
        if len(qids) == 1:
            trie.insert(name, next(iter(qids)))
        else:
            best = max(sitelinks.get(q, 0) for q in qids)
            trie.insert(name, min(q for q in qids
                                  if sitelinks.get(q, 0) == best))
    return trie


def select_entity(name_and_demonym_candidates: Set[str],
                  candidates: Set[str], sitelinks: Dict[str, int],
                  min_score: int) -> Optional[str]:
    """Sitelink argmax with names/demonyms preferred on ties
    (popular_entities_linker.py:246-259, sorted-iteration order kept)."""
    best_id, best_count = None, 0
    for qid in sorted(name_and_demonym_candidates) + sorted(candidates):
        count = sitelinks.get(qid, 0)
        if count >= min_score and count > best_count:
            best_id, best_count = qid, count
    return best_id


def popular_link_text(
    text: str,
    ner_aliases: Set[str],
    name_to_qids: Dict[str, Set[str]],
    alias_to_qids: Dict[str, Set[str]],
    sitelinks: Dict[str, int],
    trie: WordTrie,
    demonyms: Optional[Dict[str, Set[str]]] = None,
    languages: Optional[Dict[str, str]] = None,
    entity_types: Optional[Dict[str, List[str]]] = None,
    min_score: int = 15,
    assume_nouns: bool = True,
    ner_first_token_index=None,
) -> List[dict]:
    """One document → predictions ``[{begin, end, mention, entity_id,
    candidates, by}]`` with ``by`` ∈ {"named", "lowercase"}."""
    demonyms = demonyms or {}
    languages = languages or {}
    predictions: Dict[Tuple[int, int], dict] = {}
    unknown_person_name_parts: Set[str] = set()
    prediction_cache: Dict[str, Tuple[str, Set[str]]] = {}

    # ---- named pass: longest-alias NER spans ---------------------------
    for span in alias_mentions(text, ner_aliases,
                               first_token_index=ner_first_token_index):
        snippet = text[span[0]:span[1]]
        is_language = (snippet in languages and span[0] >= 3
                       and text[span[0] - 3:span[0] - 1].lower() == "in")
        if snippet in prediction_cache:
            qid, cands = prediction_cache[snippet]
            predictions[span] = {"begin": span[0], "end": span[1],
                                 "mention": snippet, "entity_id": qid,
                                 "candidates": sorted(cands), "by": "named"}
            continue
        if snippet.islower():
            continue
        if is_date(snippet):
            continue
        if snippet in unknown_person_name_parts:
            continue
        candidates: Set[str] = set()
        nd: Set[str] = set()
        if is_language:
            qid = languages[snippet]
        else:
            nd = set(name_to_qids.get(snippet, ()))
            nd |= set(demonyms.get(snippet, ()))
            candidates = set(alias_to_qids.get(snippet, ())) \
                | set(name_to_qids.get(snippet, ()))
            qid = select_entity(nd, candidates, sitelinks, min_score)
        if qid is None:
            qid = NIL
        candidates |= nd
        predictions[span] = {"begin": span[0], "end": span[1],
                             "mention": snippet, "entity_id": qid,
                             "candidates": sorted(candidates), "by": "named"}
        prediction_cache[snippet] = (qid, candidates)

    # ---- lowercase pass: trie longest-match scan -----------------------
    # char-occupancy mask instead of a per-candidate scan over the
    # taken-span list (O(1) slice check vs O(|spans|) genexpr — the
    # genexpr was a top-3 profile line on the in-process twin)
    occ = bytearray(len(text))
    for p in predictions.values():
        occ[p["begin"]:p["end"]] = b"\x01" * (p["end"] - p["begin"])
    tokens = tokenize_with_offsets(text)
    i = 0
    while i < len(tokens):
        b, e = tokens[i]
        tok_text = text[b:e]
        if (not tok_text.islower() or tok_text in EN_STOP
                or not any(c.isalnum() for c in tok_text)):
            i += 1
            continue
        span_end = e
        snippet = tok_text
        last_in_trie, last_j = None, -1

        def in_trie(s: str) -> bool:
            return s in trie or (s.endswith("s") and s[:-1] in trie)

        def from_trie(s: str) -> str:
            return trie.get(s) if s in trie else trie.get(s[:-1])

        j = i + 1
        while trie.has_subtrie(snippet) and j < len(tokens):
            nb, ne = tokens[j]
            if in_trie(snippet):
                last_in_trie, last_j = snippet, j
            snippet += text[span_end:ne]
            span_end = ne
            j += 1
        if in_trie(snippet):
            qid = from_trie(snippet)
        elif last_in_trie is not None:
            qid = from_trie(last_in_trie)
            snippet = last_in_trie
            j = last_j
        else:
            i += 1
            continue

        span = (b, b + len(snippet))
        if any(occ[span[0]:span[1]]):
            i += 1
            continue
        if not assume_nouns:
            i += 1
            continue
        count = sitelinks.get(qid, 0)
        types = (entity_types or {}).get(qid)
        if count >= min_score and types != [OTHER_TYPE]:
            predictions[span] = {
                "begin": span[0], "end": span[1], "mention": snippet,
                "entity_id": qid if qid is not None else NIL,
                "candidates": [qid], "by": "lowercase"}
            occ[span[0]:span[1]] = b"\x01" * (span[1] - span[0])
        i = j + 1

    return sorted(predictions.values(), key=lambda p: (p["begin"], p["end"]))


class PopularEntitiesStage:
    """Actor-pool stage: page batches → popular-entities predictions.
    Dims (alias/name dicts, sitelinks, trie inputs) load once per actor
    from object-store refs; the trie is BUILT once per actor in
    ``__init__`` (mirroring popular_entities_linker.py:55-69)."""

    def __init__(self, dims_ref, id_col: str = "url",
                 text_col: str = "text", min_score: int = 15,
                 assume_nouns: bool = True):
        import ray

        d = ray.get(dims_ref)
        self.name_to_qids: Dict[str, Set[str]] = d["name_to_qids"]
        self.alias_to_qids: Dict[str, Set[str]] = d["alias_to_qids"]
        self.sitelinks: Dict[str, int] = d["sitelinks"]
        self.demonyms = d.get("demonyms", {})
        self.languages = d.get("languages", {})
        self.entity_types = d.get("entity_types", {})
        self.ner_aliases: Set[str] = (set(self.alias_to_qids)
                                      | set(self.name_to_qids))
        # once per actor: first-token pruning index for the greedy
        # alias matcher (None when the dict isn't indexable)
        from elevant_ray.functions.ner import alias_first_token_index

        self.ner_ft_index = alias_first_token_index(self.ner_aliases)
        self.trie = build_lowercase_trie(self.name_to_qids, self.sitelinks)
        self.id_col, self.text_col = id_col, text_col
        self.min_score = min_score
        self.assume_nouns = assume_nouns

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, begins, ends, mentions, qids, bys = [], [], [], [], [], []
        for rid, text in zip(batch.column(self.id_col).to_pylist(),
                             batch.column(self.text_col).to_pylist()):
            for p in popular_link_text(
                    text, self.ner_aliases, self.name_to_qids,
                    self.alias_to_qids, self.sitelinks, self.trie,
                    demonyms=self.demonyms, languages=self.languages,
                    entity_types=self.entity_types,
                    min_score=self.min_score,
                    assume_nouns=self.assume_nouns,
                    ner_first_token_index=self.ner_ft_index):
                ids.append(rid)
                begins.append(p["begin"])
                ends.append(p["end"])
                mentions.append(p["mention"])
                qids.append(p["entity_id"])
                bys.append(p["by"])
        return pa.table({
            self.id_col: pa.array(ids, batch.column(self.id_col).type),
            "begin": pa.array(begins, pa.int32()),
            "end": pa.array(ends, pa.int32()),
            "mention": pa.array(mentions, pa.string()),
            "pred_qid": pa.array(qids, pa.string()),
            "recognized_by": pa.array(bys, pa.string()),
        })
