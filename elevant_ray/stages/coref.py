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

Direct speech (:50-91, :124-131, :164-178) IS ported, parser-free:
quote-span detection, the paragraph-boundary validity quirk, minimum
span length, first-person-singular→speaker resolution inside quotes,
and the skip-quoted-entities rule outside quotes all replicate the
reference's control flow.  Two spaCy-only signals are replaced by
documented lexical heuristics (``_HEURISTIC_VERBS`` + suffix test for
the dep-parse "has subject and verb" check; last capitalized
non-pronoun token for the ``nsubj`` speaker-candidate track).

The "problematic it" filter (:268-277 +
models/dependency_graph.py:186-202) IS ported as a parser-free
surface approximation (``is_problematic_it_surface``): the reference
drops an "it" that is the nsubj of a VB* head carrying a ccomp, or an
anticipatory-it frame (head + acomp with xcomp/ccomp below).  Without
a parse, the same frames surface as "it" + (optional adverb) +
verb-like token + a complementizer ("that"/"whether"/wh-word) or an
infinitival "to"+verb within the sentence window.  Parameterized
(``problematic_it=True`` default, matching the reference's behavior);
differential intuition tested on pronoun-heavy fixtures in
tests/test_coref.py.

The ``is_first_subj_in_paragraph`` neutral-paragraph-subject shortcut
(:110-121, :280-285) IS ported, parser-free (``get_paragraphs`` is a
verbatim port, quirks included: no ``\\n\\n`` → NO paragraphs, the
+1 start offset after each boundary; the ``nsubj``/``nsubjpass`` test
is the same subject-of-verb surface adjacency the problematic-it
filter uses): a NEUTRAL pronoun that is the subject in the first
sentence of its paragraph resolves directly to the title entity (the
mention at offset 0) when that entity is itself NEUTRAL-gendered
(``get_referenced_entity`` :160-161).  Parameterized
(``paragraph_subject=True`` default, matching the reference); the
docstring's "not ported" list is now empty.
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
    __slots__ = ("span", "entity_id", "gender", "types", "ds")

    def __init__(self, span, entity_id, gender, types, ds=None):
        self.span = span
        self.entity_id = entity_id
        self.gender = gender
        self.types = types
        self.ds = ds            # containing direct-speech span, if any


def _strip_punct(tok: str) -> str:
    """Our tokens keep trailing punctuation spaCy would split off."""
    return tok.rstrip(".,;:!?\"')")


QUOTATION_MARKS = ('"', "“")       # kb_coref_linker.py:22
DIRECT_SPEECH_MIN_TOKENS = 4            # kb_coref_linker.py:23

# Parser-free stand-in for the reference's "span has nsubj + VERB/AUX"
# validity check (:84-88): a closed auxiliary/reporting-verb set plus
# the -ed/-ing suffix test.  Over-accepts some noun phrases, never
# under-accepts a normal quoted sentence.
_HEURISTIC_VERBS = frozenset(
    "is am are was were be been being have has had do does did will "
    "would can could shall should may might must said say says go "
    "goes went think thinks thought know knows knew want wants "
    "seem seems appear appears remain remains become becomes".split())


def _looks_like_verb(core: str) -> bool:
    low = core.lower()
    return low in _HEURISTIC_VERBS or low.endswith(("ed", "ing"))


# complementizer cues that surface a clausal complement (the ccomp /
# xcomp arcs the reference's dependency graph walks)
_COMPLEMENTIZERS = frozenset(
    {"that", "whether", "how", "why", "what", "who", "if"})
_IT_SCAN_WINDOW = 6   # tokens after the verb to look for the cue


def subject_verb_index(text: str, tokens, ti: int, sent_flags) -> int:
    """Surface stand-in for "token ``ti`` is the nsubj/nsubjpass of a
    verb": the token is directly followed (one adverb may intervene,
    mirroring nsubj→head adjacency) by a verb-like token in the same
    sentence.  Returns the verb token's index, or -1.  Shared by the
    problematic-it filter and the paragraph-subject shortcut so the
    two dep-parse approximations cannot drift apart."""
    j = ti + 1
    n = len(tokens)

    def core_at(k):
        b, e = tokens[k]
        return _strip_punct(text[b:e]).lstrip("\"'(“")

    if j < n and not sent_flags[j] and core_at(j).lower().endswith("ly"):
        j += 1                     # "It really seems that …"
    if j >= n or sent_flags[j] or not _looks_like_verb(core_at(j)):
        return -1
    return j


def is_problematic_it_surface(text: str, tokens, ti: int,
                              sent_flags) -> bool:
    """Parser-free stand-in for the reference's ``is_problematic_it``
    (kb_coref_linker.py:268-277 → models/dependency_graph.py:186-202):
    an "it" that is the subject of a verb with a clausal complement
    ("It said that …"), or an anticipatory it ("It is clear that …",
    "It seems easy to win").  Surface signal: "it" directly followed
    (one adverb may intervene, mirroring nsubj→head adjacency) by a
    verb-like token, with a complementizer or an infinitival
    "to"+verb within the next ``_IT_SCAN_WINDOW`` tokens of the same
    sentence."""
    n = len(tokens)

    def core_at(k):
        b, e = tokens[k]
        return _strip_punct(text[b:e]).lstrip("\"'(“")

    j = subject_verb_index(text, tokens, ti, sent_flags)
    if j < 0:
        return False
    for k in range(j + 1, min(j + 1 + _IT_SCAN_WINDOW, n)):
        if sent_flags[k]:
            break                  # complement must stay in-sentence
        low = core_at(k).lower()
        if low in _COMPLEMENTIZERS:
            return True
        # anticipatory acomp+xcomp frame ("It seems easy to win"):
        # "to" with at least one token between it and the verb (the
        # adjectival complement).  "to" directly after the verb ("It
        # belongs to Alice") is a plain preposition — keep those.
        if low == "to" and k > j + 1 and k + 1 < n \
                and not sent_flags[k + 1]:
            return True
    return False


def get_paragraphs(text: str) -> List[Tuple[int, int]]:
    """Verbatim port of the reference's ``get_paragraphs``
    (kb_coref_linker.py:93-107), quirks included: an article with NO
    ``\\n\\n`` boundary yields an EMPTY list (so the paragraph-subject
    shortcut never fires on single-paragraph text), each span after
    the first starts one char past the boundary's end, and a trailing
    paragraph is appended only when a boundary matched."""
    import re

    paragraphs: List[Tuple[int, int]] = []
    start = 0
    match = None
    for match in re.finditer(r"\n\n", text):
        paragraphs.append((start, match.end()))
        start = match.end() + 1
    if match and match.end() < len(text):
        paragraphs.append((start, len(text)))
    return paragraphs


def is_first_subj_in_paragraph_surface(text: str, tokens, ti: int,
                                       sent_flags,
                                       paragraphs) -> bool:
    """Parser-free port of ``is_first_subj_in_paragraph``
    (kb_coref_linker.py:110-121): the token is a subject
    (``subject_verb_index`` — the same nsubj surface adjacency the
    problematic-it filter uses, replacing ``tok.dep_ in ('nsubj',
    'nsubjpass')``) AND lies inside the first sentence of its
    containing paragraph (the reference tests ``sent.end_char >
    tok.idx`` on the sentence at the paragraph start; with token-level
    sentence flags that is "no sentence boundary between the
    paragraph's first token and this one")."""
    if subject_verb_index(text, tokens, ti, sent_flags) < 0:
        return False
    b = tokens[ti][0]
    for ps, pe in paragraphs:
        if ps <= b < pe:
            # walk back to the paragraph's first token; any sentence
            # boundary on the way means ti is past the first sentence
            k = ti
            while k > 0 and tokens[k - 1][0] >= ps:
                if sent_flags[k]:
                    return False
                k -= 1
            return True
    return False


def direct_speech_spans(text: str, tokens) -> List[dict]:
    """Detect direct-speech spans + speaker candidates, parser-free
    (``get_direct_speeches``, kb_coref_linker.py:50-91).

    Control flow replicated: quote characters toggle open/close; a
    closed span is valid iff (a) it covers ≥ DIRECT_SPEECH_MIN_TOKENS-1
    tokens, (b) it "has a subject and a verb" (lexical heuristic — see
    ``_HEURISTIC_VERBS``; subject ≈ a pronoun or capitalized token
    inside the quote), and (c) the reference's paragraph condition,
    which — as written (:68-70, last element of two ≥-filtered boundary
    lists compared) — reduces to "a \\n\\n boundary exists at or after
    the quote's close"; replicated faithfully, quirk included.  The
    speaker candidate is the reference's running last-``nsubj``-token
    outside quotes, recast as the last capitalized non-pronoun token
    outside any quote pair.

    Returns [{"span": (s, e), "speaker": (b, e) | None}] with the span
    endpoints at the quote characters (containment test s ≤ off ≤ e,
    :124-131)."""
    import re

    qpos = [m.start() for m in re.finditer(r'["“]', text)]
    if len(qpos) < 2:
        return []
    boundaries = [m.start() for m in re.finditer(r"\n\n", text)]

    # quote pairs by toggling, exactly the reference's open/close state
    pairs = [(qpos[i], qpos[i + 1]) for i in range(0, len(qpos) - 1, 2)]

    def in_any_pair(off: int) -> bool:
        return any(s <= off <= e for s, e in pairs)

    # speaker-candidate track: capitalized non-pronoun tokens outside
    # every quote pair, in document order
    cands = []
    for b, e in tokens:
        core = _strip_punct(text[b:e]).lstrip("\"'(“")
        if (core and core[0].isupper()
                and core.lower() not in PRONOUN_GENDERS
                and not in_any_pair(b)):
            cands.append((b, b + len(core)))

    out: List[dict] = []
    for s, e in pairs:
        # quotes attach to neighboring tokens in our whitespace
        # tokenizer (spaCy splits them off), so a token starting AT the
        # opening quote or ending just past the closing quote is inside
        inside = [(b2, e2) for b2, e2 in tokens
                  if b2 >= s and e2 <= e + 1]
        if len(inside) < DIRECT_SPEECH_MIN_TOKENS - 1:
            continue
        subject = verb = False
        for b2, e2 in inside:
            core = _strip_punct(text[b2:e2]).lstrip("\"'(“")
            if not core:
                continue
            if core.lower() in PRONOUN_GENDERS or core[0].isupper():
                subject = True
            if _looks_like_verb(core):
                verb = True
        if not (subject and verb):
            continue
        if not any(b >= e for b in boundaries):
            continue    # the reference's single_paragraph quirk
        speaker = None
        for cb, ce in cands:
            if ce <= s:
                speaker = (cb, ce)
            else:
                break
        out.append({"span": (s, e), "speaker": speaker})
    return out


def _containing_ds(offset: int, ds_list: List[dict]) -> Optional[dict]:
    """kb_coref_linker.py:124-131."""
    for ds in ds_list:
        s, e = ds["span"]
        if s <= offset <= e:
            return ds
    return None


def _referenced_entity(span, preceding: List[_RefEntity],
                       max_distance: int, tok_text: str = "",
                       direct_speech: Optional[dict] = None,
                       neutral_paragraph_subject: bool = False,
                       title_entity: Optional[_RefEntity] = None,
                       ) -> Optional[_RefEntity]:
    """Reversed scan with distance cutoff (kb_coref_linker.py:159-186,
    depless degradation: most recent match in range).  Direct-speech
    rules ported: first-person-singular inside a quote resolves ONLY
    to the entity containing the speaker token (MALE/FEMALE, else
    nothing); references outside quotes skip entities registered
    inside quotes, extending the scan window by the skipped quote's
    length.  A neutral paragraph-subject pronoun short-circuits to the
    NEUTRAL-gendered title entity before the scan (:160-161)."""
    if neutral_paragraph_subject and title_entity is not None \
            and title_entity.gender == NEUTRAL:
        return title_entity
    referenced = None
    ds_len = 0
    first_considered = True
    for pre in reversed(preceding):
        if direct_speech is not None and is_first_person_singular(tok_text):
            if direct_speech["speaker"] is None:
                return None
            sp = direct_speech["speaker"][0]
            if pre.span[0] <= sp <= pre.span[1]:
                if pre.gender in (MALE, FEMALE):
                    return pre
                return None
            continue
        if direct_speech is None and pre.ds is not None:
            # skip quoted entities; their span still extends the window
            # (reference :174-178).  With no dependency parse the
            # "most recent" fallback moves to the first NON-skipped
            # candidate (the reference recovers skipped cases through
            # nsubj deps the engine doesn't have).
            ds_s, ds_e = pre.ds["span"]
            ds_len = ds_e - ds_s
            continue
        if pre.span[1] + max_distance + ds_len < span[0]:
            break
        if first_considered:
            referenced = pre
        first_considered = False
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
    direct_speech: bool = True,
    problematic_it: bool = True,
    paragraph_subject: bool = True,
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
    ds_list = direct_speech_spans(text, tokens) if direct_speech else []
    paragraphs = get_paragraphs(text) if paragraph_subject else []
    title_entity: Optional[_RefEntity] = None
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
        # leading quote/bracket chars attach to our whitespace tokens
        # (spaCy splits them off) — shift the core start past them
        lead = len(core) - len(core.lstrip("\"'(“"))
        core = core[lead:]
        cb = b + lead

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
            ref = _RefEntity((mb, me), qid, gender, types,
                             ds=_containing_ds(mb, ds_list))
            recent_per_sent[-1][(mb, me)] = ref
            if mb == 0:          # reference :252-253 title tracking
                title_entity = ref
            mention_idx += 1
            clusters[qid].append((mb, me))

        referenced = None
        span = None
        if is_pronoun(core):
            span = (cb, cb + len(core))
            tok_ds = _containing_ds(cb, ds_list)
            p_gender = PRONOUN_GENDERS[core.lower()]
            # don't cluster an "it" that doesn't refer to an object
            # (kb_coref_linker.py:266-277)
            problem = (problematic_it and core.lower() == "it"
                       and is_problematic_it_surface(text, tokens, ti,
                                                     sent_flags))
            if not problem and (p_gender != UNKNOWN
                                or is_first_person_singular(core)):
                # TODO mirrored from the reference (:280-281): the
                # shortcut could cover all paragraph-subject pronouns
                neutral_para_subj = (
                    paragraph_subject and p_gender == NEUTRAL
                    and is_first_subj_in_paragraph_surface(
                        text, tokens, ti, sent_flags, paragraphs))
                if neutral_para_subj and title_entity is not None \
                        and title_entity.gender == NEUTRAL:
                    # the shortcut returns before reading the scan
                    # list — skip building it (same condition as
                    # _referenced_entity's first line)
                    referenced = title_entity
                else:
                    preceding = _preceding_entities(recent_per_sent,
                                                    gender=p_gender)
                    referenced = _referenced_entity(
                        span, preceding, max_distance=200,
                        tok_text=core, direct_speech=tok_ds,
                        neutral_paragraph_subject=neutral_para_subj,
                        title_entity=title_entity)
        elif core in seen_types and prev_tok_text is not None \
                and prev_tok_text.lower() in COREF_PREFIXES:
            prev_b = tokens[ti - 1][0]
            span = (prev_b, cb + len(core))
            preceding = _preceding_entities(recent_per_sent,
                                            typ=core.lower())
            referenced = _referenced_entity(
                span, preceding, max_distance=300,
                direct_speech=_containing_ds(cb, ds_list))

        if referenced is not None:
            recent_per_sent[-1][(span[0], span[0])] = _RefEntity(
                span, referenced.entity_id, referenced.gender,
                referenced.types, ds=_containing_ds(span[0], ds_list))
            clusters[referenced.entity_id].append(span)

        prev_tok_text = core

    return [{"entity_id": qid, "main": spans[0], "mentions": spans}
            for qid, spans in clusters.items()]


class KBCorefStage:
    """Actor-pool stage: batches of (id, text, mentions list<struct>) →
    exploded coref-cluster mention rows.  Gender / type dims load once
    per actor from an object-store ref."""

    def __init__(self, dims_ref=None, id_col: str = "url",
                 text_col: str = "text", mentions_col: str = "mentions",
                 problematic_it: bool = True,
                 paragraph_subject: bool = True):
        import ray

        d = ray.get(dims_ref) if dims_ref is not None else {}
        self.gender_map = d.get("gender_map", {})
        self.coref_types = d.get("coref_types", {})
        self.type_qid_aliases = d.get("type_qid_aliases", {})
        self.id_col, self.text_col = id_col, text_col
        self.mentions_col = mentions_col
        self.problematic_it = problematic_it
        self.paragraph_subject = paragraph_subject

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, qids, mains, begins, ends, kinds = [], [], [], [], [], []
        for rid, text, ments in zip(
                batch.column(self.id_col).to_pylist(),
                batch.column(self.text_col).to_pylist(),
                batch.column(self.mentions_col).to_pylist()):
            linked = {(m["begin"], m["end"]) for m in ments or ()}
            for cl in kb_coref_clusters(
                    text, list(ments or ()),
                    self.gender_map, self.coref_types,
                    self.type_qid_aliases,
                    problematic_it=self.problematic_it,
                    paragraph_subject=self.paragraph_subject):
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
