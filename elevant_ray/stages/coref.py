"""KB coreference linker — the ELEVANT KBCorefLinker's per-document
scan (src/elevant/linkers/kb_coref_linker.py:134-315) re-expressed
spaCy-free.  Clusters are keyed by entity id (:311-315) — the
reference's within-document "transitive clustering".

Ported verbatim:
- the pronoun-gender inventory and the is-pronoun test that excludes
  ALL-CAPS forms except "I" (utils/pronoun_finder.py:7-25);
- the sentence-windowed recent-entity store
  (``recent_ents_per_sent``, MAX_NUM_SENTS = -1 → unbounded, :222-228);
- gender-filtered / type-filtered preceding-entity collection
  (:189-200);
- ``get_referenced_entity``'s reversed scan with the
  max-distance cutoff (200 chars for pronouns, 300 for type
  references, :150-186) — with no dependency parse every mention's
  ``deps`` list is empty, so the scan degrades exactly as the
  reference's own code does on depless input: most recent matching
  entity within range;
- type-alias expansion for "the <type>" references: coref-type QIDs →
  their aliases, lowercased, split on "/" (:240-247), single-token
  types only, prefixes {"the", "that", "this"} (:136, :288-295);
- title-entity tracking (mention at offset 0).

Not ported (requires a dependency parse / POS tags; parameterized off):
- direct-speech spans + speaker resolution (:50-91, :165-176);
- the "problematic it" dependency-graph filter (:268-277);
- ``is_first_subj_in_paragraph`` neutral-paragraph-subject shortcut.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Set, Tuple

import pyarrow as pa

from elevant_ray.functions.prior import (sentence_start_flags,
                                         tokenize_with_offsets)

FEMALE, MALE, NEUTRAL, OTHER, UNKNOWN = range(5)

PRONOUN_GENDERS: Dict[str, int] = {
    "i": UNKNOWN, "my": UNKNOWN, "me": UNKNOWN, "myself": UNKNOWN,
    "mine": UNKNOWN,
    "you": UNKNOWN, "your": UNKNOWN, "yourself": UNKNOWN, "yours": UNKNOWN,
    "he": MALE, "his": MALE, "him": MALE, "himself": MALE,
    "she": FEMALE, "her": FEMALE, "herself": FEMALE, "hers": FEMALE,
    "it": NEUTRAL, "its": NEUTRAL, "itself": NEUTRAL,
    "we": UNKNOWN, "us": UNKNOWN, "our": UNKNOWN, "ourselves": UNKNOWN,
    "ours": UNKNOWN,
    "yourselves": UNKNOWN,
    "they": UNKNOWN, "their": UNKNOWN, "them": UNKNOWN,
    "themselves": UNKNOWN, "theirs": UNKNOWN,
}

COREF_PREFIXES = ("the", "that", "this")


def is_pronoun(text: str) -> bool:
    """Match pronouns but not "US"/"IT" (pronoun_finder.py:23-25)."""
    return text.lower() in PRONOUN_GENDERS and (
        not text.isupper() or text.lower() == "i")


def is_first_person_singular(text: str) -> bool:
    return text in ("I", "my", "me")


class _RefEntity:
    __slots__ = ("span", "entity_id", "gender", "types")

    def __init__(self, span, entity_id, gender, types):
        self.span = span
        self.entity_id = entity_id
        self.gender = gender
        self.types = types


def _strip_punct(tok: str) -> str:
    """Our tokens keep trailing punctuation spaCy would split off."""
    return tok.rstrip(".,;:!?\"')")


def _referenced_entity(span, preceding: List[_RefEntity],
                       max_distance: int) -> Optional[_RefEntity]:
    """Reversed scan with distance cutoff (kb_coref_linker.py:159-186,
    depless degradation: most recent match in range)."""
    referenced = None
    for i, pre in enumerate(reversed(preceding)):
        if pre.span[1] + max_distance < span[0]:
            break
        if i == 0:
            referenced = pre
    return referenced


def _preceding_entities(recent_per_sent, gender=None, typ=None):
    out = []
    for sent_entities in recent_per_sent:
        for pre in sent_entities.values():
            matching_gender = gender is not None and (
                pre.gender == gender or gender == UNKNOWN)
            matching_type = typ is not None and typ in pre.types
            if matching_gender or matching_type:
                out.append(pre)
    return out


def kb_coref_clusters(
    text: str,
    mentions: List[dict],
    gender_map: Optional[Dict[str, int]] = None,
    coref_types: Optional[Dict[str, List[str]]] = None,
    type_qid_aliases: Optional[Dict[str, Set[str]]] = None,
) -> List[dict]:
    """One document → coref clusters
    ``[{entity_id, main: (b, e), mentions: [(b, e), ...]}]``.

    ``mentions``: already-linked entity mentions ``{begin, end,
    entity_id}`` (the reference's ``article.entity_mentions``);
    ``gender_map``: QID → gender constant; ``coref_types``: QID → list
    of type QIDs; ``type_qid_aliases``: type QID → alias strings."""
    if not mentions:
        return []
    gender_map = gender_map or {}
    coref_types = coref_types or {}
    type_qid_aliases = type_qid_aliases or {}

    tokens = tokenize_with_offsets(text)
    sent_flags = sentence_start_flags(text, tokens)
    sorted_mentions = sorted((m["begin"], m["end"], m["entity_id"])
                             for m in mentions)
    clusters: Dict[str, List[Tuple[int, int]]] = defaultdict(list)
    mention_idx = 0
    recent_per_sent: List[Dict] = []
    seen_types: Set[str] = set()
    type_alias_cache: Dict[str, Set[str]] = {}
    prev_tok_text: Optional[str] = None

    for ti, (b, e) in enumerate(tokens):
        if ti == 0 or sent_flags[ti]:
            recent_per_sent.append({})
        tok_text = text[b:e]
        core = _strip_punct(tok_text)

        # register the next linked mention once the scan reaches it
        if mention_idx < len(sorted_mentions) and b >= sorted_mentions[mention_idx][0]:
            mb, me, qid = sorted_mentions[mention_idx]
            gender = gender_map.get(qid, UNKNOWN)
            types = type_alias_cache.get(qid)
            if types is None:
                types = set()
                for type_id in coref_types.get(qid, ()):
                    for alias in type_qid_aliases.get(type_id, ()):
                        types.update(alias.lower().split("/"))
                type_alias_cache[qid] = types
            seen_types.update(types)
            ref = _RefEntity((mb, me), qid, gender, types)
            recent_per_sent[-1][(mb, me)] = ref
            mention_idx += 1
            clusters[qid].append((mb, me))

        referenced = None
        span = None
        if is_pronoun(core):
            span = (b, b + len(core))
            p_gender = PRONOUN_GENDERS[core.lower()]
            if p_gender != UNKNOWN or is_first_person_singular(core):
                preceding = _preceding_entities(recent_per_sent,
                                                gender=p_gender)
                referenced = _referenced_entity(span, preceding,
                                                max_distance=200)
        elif core in seen_types and prev_tok_text is not None \
                and prev_tok_text.lower() in COREF_PREFIXES:
            prev_b = tokens[ti - 1][0]
            span = (prev_b, b + len(core))
            preceding = _preceding_entities(recent_per_sent,
                                            typ=core.lower())
            referenced = _referenced_entity(span, preceding,
                                            max_distance=300)

        if referenced is not None:
            recent_per_sent[-1][(span[0], span[0])] = _RefEntity(
                span, referenced.entity_id, referenced.gender,
                referenced.types)
            clusters[referenced.entity_id].append(span)

        prev_tok_text = core

    return [{"entity_id": qid, "main": spans[0], "mentions": spans}
            for qid, spans in clusters.items()]


class KBCorefStage:
    """Actor-pool stage: batches of (id, text, mentions list<struct>) →
    exploded coref-cluster mention rows.  Gender / type dims load once
    per actor from an object-store ref."""

    def __init__(self, dims_ref=None, id_col: str = "url",
                 text_col: str = "text", mentions_col: str = "mentions"):
        import ray

        d = ray.get(dims_ref) if dims_ref is not None else {}
        self.gender_map = d.get("gender_map", {})
        self.coref_types = d.get("coref_types", {})
        self.type_qid_aliases = d.get("type_qid_aliases", {})
        self.id_col, self.text_col = id_col, text_col
        self.mentions_col = mentions_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, qids, mains, begins, ends, kinds = [], [], [], [], [], []
        for rid, text, ments in zip(
                batch.column(self.id_col).to_pylist(),
                batch.column(self.text_col).to_pylist(),
                batch.column(self.mentions_col).to_pylist()):
            linked = {(m["begin"], m["end"]) for m in ments or ()}
            for cl in kb_coref_clusters(text, list(ments or ()),
                                        self.gender_map, self.coref_types,
                                        self.type_qid_aliases):
                for (mb, me) in cl["mentions"]:
                    ids.append(rid)
                    qids.append(cl["entity_id"])
                    mains.append(cl["main"][0])
                    begins.append(mb)
                    ends.append(me)
                    kinds.append("mention" if (mb, me) in linked else "coref")
        return pa.table({
            self.id_col: pa.array(ids, batch.column(self.id_col).type),
            "entity_id": pa.array(qids, pa.string()),
            "main_begin": pa.array(mains, pa.int32()),
            "begin": pa.array(begins, pa.int32()),
            "end": pa.array(ends, pa.int32()),
            "kind": pa.array(kinds, pa.string()),
        })
