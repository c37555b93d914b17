"""ELEVANT error-category labeling as a pure per-document kernel.

Re-expressed semantics of ``src/elevant/evaluation/errors.py:14-379``
(no code copied): each evaluation case (dict produced by
``stages/evaluation.evaluate_document``) is tagged with error labels per
evaluation mode — NER FN subtypes, disambiguation subtypes
(demonym/metonymy/partial-name/rare), candidate errors, multi-candidate,
hyperlink, wrong-span, coreference errors and the AVOIDED_* positives —
so the engine reproduces the reference's error-category breakdowns as an
associative aggregate.

Dimension inputs (``dims``): {"demonyms": set[str] | dict,
"types": {qid: [type qids]}, "most_popular": {alias: set[qid]}} — loaded
once per actor from broadcast refs (the reference's EntityDatabase).

Runs per case list of ONE document inside map_batches — embarrassingly
parallel across documents, sequential within (reference parity).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

from elevant_ray.functions.mention_types import (
    COREF_TYPES, ENTITY_NAMED, ENTITY_NON_NAMED, entity_mention_type,
    is_unknown_entity,
)

# settings.py:114-119
TYPE_PERSON = "Q215627"
TYPE_FICTIONAL_CHARACTER = "Q95074"
TYPE_LOCATION = "Q27096213"
TYPE_ETHNICITY = "Q33829"
TYPE_LANGUOID = "Q17376908"
DEMONYM_TYPES = {TYPE_LOCATION, TYPE_ETHNICITY, TYPE_LANGUOID}

# error label identifiers (case.py ErrorLabel, string-valued here)
NER_FN = "NER_FN"
NER_FN_LOWERCASED = "NER_FN_LOWERCASED"
NER_FN_PARTIALLY_INCLUDED = "NER_FN_PARTIALLY_INCLUDED"
NER_FN_PARTIAL_OVERLAP = "NER_FN_PARTIAL_OVERLAP"
NER_FN_OTHER = "NER_FN_OTHER"
NER_FP = "NER_FP"
NER_FP_LOWERCASED = "NER_FP_LOWERCASED"
NER_FP_GROUNDTRUTH_UNKNOWN = "NER_FP_GROUNDTRUTH_UNKNOWN"
NER_FP_OTHER = "NER_FP_OTHER"
NER_FP_WRONG_SPAN = "NER_FP_WRONG_SPAN"
DISAMBIGUATION_WRONG = "DISAMBIGUATION_WRONG"
DISAMBIGUATION_DEMONYM_WRONG = "DISAMBIGUATION_DEMONYM_WRONG"
DISAMBIGUATION_METONYMY_WRONG = "DISAMBIGUATION_METONYMY_WRONG"
DISAMBIGUATION_PARTIAL_NAME_WRONG = "DISAMBIGUATION_PARTIAL_NAME_WRONG"
DISAMBIGUATION_RARE_WRONG = "DISAMBIGUATION_RARE_WRONG"
DISAMBIGUATION_OTHER_WRONG = "DISAMBIGUATION_OTHER_WRONG"
DISAMBIGUATION_CORRECT = "DISAMBIGUATION_CORRECT"
DISAMBIGUATION_DEMONYM_CORRECT = "DISAMBIGUATION_DEMONYM_CORRECT"
DISAMBIGUATION_METONYMY_CORRECT = "DISAMBIGUATION_METONYMY_CORRECT"
DISAMBIGUATION_PARTIAL_NAME_CORRECT = "DISAMBIGUATION_PARTIAL_NAME_CORRECT"
DISAMBIGUATION_RARE_CORRECT = "DISAMBIGUATION_RARE_CORRECT"
DISAMBIGUATION_OTHER_CORRECT = "DISAMBIGUATION_OTHER_CORRECT"
DISAMBIGUATION_CANDIDATES_CORRECT = "DISAMBIGUATION_CANDIDATES_CORRECT"
DISAMBIGUATION_CANDIDATES_WRONG = "DISAMBIGUATION_CANDIDATES_WRONG"
DISAMBIGUATION_MULTI_CANDIDATES_CORRECT = "DISAMBIGUATION_MULTI_CANDIDATES_CORRECT"
DISAMBIGUATION_MULTI_CANDIDATES_WRONG = "DISAMBIGUATION_MULTI_CANDIDATES_WRONG"
HYPERLINK_CORRECT = "HYPERLINK_CORRECT"
HYPERLINK_WRONG = "HYPERLINK_WRONG"
COREFERENCE_FALSE_DETECTION = "COREFERENCE_FALSE_DETECTION"
COREFERENCE_UNDETECTED = "COREFERENCE_UNDETECTED"
COREFERENCE_REFERENCE_WRONGLY_DISAMBIGUATED = "COREFERENCE_REFERENCE_WRONGLY_DISAMBIGUATED"
COREFERENCE_WRONG_MENTION_REFERENCED = "COREFERENCE_WRONG_MENTION_REFERENCED"
AVOIDED_NER_FN = "AVOIDED_NER_FN"
AVOIDED_NER_FP_WRONG_SPAN = "AVOIDED_NER_FP_WRONG_SPAN"
AVOIDED_NER_FN_LOWERCASED = "AVOIDED_NER_FN_LOWERCASED"
AVOIDED_NER_FN_PARTIALLY_INCLUDED = "AVOIDED_NER_FN_PARTIALLY_INCLUDED"
AVOIDED_NER_FN_PARTIAL_OVERLAP = "AVOIDED_NER_FN_PARTIAL_OVERLAP"
AVOIDED_NER_FN_OTHER = "AVOIDED_NER_FN_OTHER"
AVOIDED_NER_FP_GROUNDTRUTH_UNKNOWN = "AVOIDED_NER_FP_GROUNDTRUTH_UNKNOWN"

Span = Tuple[int, int]
TP_, FP_, FN_ = "TP", "FP", "FN"


# --------------------------------------------------------------------------
# case predicate helpers over the engine's case dicts
# --------------------------------------------------------------------------

def _is_coref(case: dict) -> bool:
    return case["mention_type"] in COREF_TYPES


def _ner(case: dict, mode: str) -> List[str]:
    return case["ner_eval_types"][mode]


def _link(case: dict, mode: str) -> List[str]:
    return case["linking_eval_types"][mode]


def _gt_unknown(case: dict) -> bool:
    return case["has_gt"] and is_unknown_entity(case["gt_entity_id"])


def _gt_known_id(case: dict) -> bool:
    return case["has_gt"] and not is_unknown_entity(case["gt_entity_id"])


def _is_non_named(text: str) -> bool:
    return entity_mention_type(text) == ENTITY_NON_NAMED


def _overlaps(a: Span, b: Span) -> bool:
    return not (a[0] >= b[1] or b[0] >= a[1])


def _is_subspan(span: Span, sub: Span) -> bool:
    if span == sub:
        return False
    return span[0] <= sub[0] and span[1] >= sub[1]


# --------------------------------------------------------------------------
# dimension-backed predicates (errors.py:74-104, 183-228)
# --------------------------------------------------------------------------

def _most_popular(dims: dict, alias: str) -> Set[str]:
    return set(dims.get("most_popular", {}).get(alias, ()))


def _types(dims: dict, qid: Optional[str]) -> Set[str]:
    return set(dims.get("types", {}).get(qid, ()))


def _is_demonym(case: dict, dims: dict) -> bool:
    if case["text"] not in dims.get("demonyms", ()):
        return False
    return bool(_types(dims, case["gt_entity_id"]) & DEMONYM_TYPES)


def _is_partial_name(case: dict) -> bool:
    if not _gt_known_id(case):
        return False
    name = case.get("gt_name") or ""
    return " " in name and len(case["text"]) < len(name) and case["text"] in name


def _is_rare(case: dict, dims: dict) -> bool:
    pop = _most_popular(dims, case["text"])
    return bool(pop) and case["gt_entity_id"] not in pop


def _is_metonymy(case: dict, dims: dict) -> bool:
    if not _gt_known_id(case):
        return False
    tt = _types(dims, case["gt_entity_id"])
    if tt & {TYPE_LOCATION, TYPE_PERSON, TYPE_ETHNICITY, TYPE_FICTIONAL_CHARACTER}:
        return False
    pop = _most_popular(dims, case["text"])
    if not pop:
        return False
    pop_types: Set[str] = set()
    for c in pop:
        pop_types |= _types(dims, c)
    return TYPE_LOCATION in pop_types


def _is_metonymy_error(case: dict, dims: dict) -> bool:
    return _is_metonymy(case, dims) and \
        TYPE_LOCATION in _types(dims, case["pred_entity_id"])


# --------------------------------------------------------------------------
# labeling passes (errors.py:14-28 orchestration)
# --------------------------------------------------------------------------

def label_errors(cases: List[dict], dims: Optional[dict] = None,
                 hyperlink_spans: Optional[Set[Span]] = None,
                 mode: str = "IGNORED",
                 contains_unknowns: bool = True) -> None:
    """Adds ``case["error_labels"][mode] : set[str]`` in place.

    Root cases only, like the reference (errors.py:19 filters child
    labels before labeling)."""
    dims = dims or {}
    hyperlink_spans = hyperlink_spans or set()
    cases = [c for c in cases if not c["has_gt"] or c.get("gt_parent") is None]
    for c in cases:
        c.setdefault("error_labels", {}).setdefault(mode, set())

    def add(case, label):
        case["error_labels"][mode].add(label)

    fp_spans = [c["span"] for c in cases if FP_ in _ner(c, mode)]

    # undetected (NER FN subtypes)
    for c in cases:
        if not _is_coref(c) and FN_ in _ner(c, mode):
            add(c, NER_FN)
            if _is_non_named(c["text"]):
                add(c, NER_FN_LOWERCASED)
            elif any(_is_subspan(c["span"], s) for s in fp_spans):
                add(c, NER_FN_PARTIALLY_INCLUDED)
            elif any(_overlaps(c["span"], s) for s in fp_spans):
                add(c, NER_FN_PARTIAL_OVERLAP)
            else:
                add(c, NER_FN_OTHER)

    # disambiguation errors
    for c in cases:
        if not _is_coref(c) and FN_ in _link(c, mode) and FP_ in _link(c, mode):
            add(c, DISAMBIGUATION_WRONG)
            if _is_demonym(c, dims):
                add(c, DISAMBIGUATION_DEMONYM_WRONG)
            elif _is_metonymy_error(c, dims):
                add(c, DISAMBIGUATION_METONYMY_WRONG)
            elif _is_partial_name(c):
                add(c, DISAMBIGUATION_PARTIAL_NAME_WRONG)
            elif _is_rare(c, dims) and \
                    c["pred_entity_id"] in _most_popular(dims, c["text"]):
                add(c, DISAMBIGUATION_RARE_WRONG)
            else:
                add(c, DISAMBIGUATION_OTHER_WRONG)

    # false detections (NER FP subtypes)
    gt_spans_rel = [c["span"] for c in cases
                    if c["has_gt"] and (mode == "REQUIRED" or _gt_known_id(c)
                                        or c.get("gt_qty_dt"))]
    for c in cases:
        if not _is_coref(c) and FP_ in _ner(c, mode):
            add(c, NER_FP)
            overlap = any(_overlaps(c["span"], s) for s in gt_spans_rel)
            if not overlap and _is_non_named(c["text"]):
                add(c, NER_FP_LOWERCASED)
            elif not _is_non_named(c["text"]) and \
                    ((not overlap and not contains_unknowns) or _gt_unknown(c)):
                add(c, NER_FP_GROUNDTRUTH_UNKNOWN)
            else:
                add(c, NER_FP_OTHER)

    # candidate errors
    for c in cases:
        if not _is_coref(c) and TP_ in _ner(c, mode):
            true_is_cand = c["gt_entity_id"] in (c.get("candidates") or ())
            if TP_ in _link(c, mode) or true_is_cand:
                add(c, DISAMBIGUATION_CANDIDATES_CORRECT)
            elif FN_ in _link(c, mode) and FP_ in _link(c, mode) and not true_is_cand:
                add(c, DISAMBIGUATION_CANDIDATES_WRONG)

    # multi candidates
    for c in cases:
        if not _is_coref(c) and c["has_gt"] and \
                len(c.get("candidates") or ()) > 1 and \
                c["gt_entity_id"] in (c.get("candidates") or ()):
            if TP_ in _link(c, mode):
                add(c, DISAMBIGUATION_MULTI_CANDIDATES_CORRECT)
            elif FN_ in _link(c, mode) and FP_ in _link(c, mode):
                add(c, DISAMBIGUATION_MULTI_CANDIDATES_WRONG)

    # hyperlink errors
    for c in cases:
        if c["span"] in hyperlink_spans:
            if TP_ in _link(c, mode):
                add(c, HYPERLINK_CORRECT)
            elif FN_ in _link(c, mode) or FP_ in _link(c, mode):
                add(c, HYPERLINK_WRONG)

    # wrong-span FPs
    gt_by_span = {c["span"]: c for c in cases
                  if c["has_gt"] and (mode == "REQUIRED" or _gt_known_id(c)
                                      or c.get("gt_qty_dt"))}
    for c in cases:
        if FP_ in _ner(c, mode):
            for s, gt_case in gt_by_span.items():
                if s == c["span"]:
                    continue
                same_entity = c["pred_entity_id"] == gt_case["gt_entity_id"]
                true_qty_dt = bool(gt_case.get("gt_qty_dt")) and \
                    gt_case.get("gt_types") == c.get("pred_types")
                if _overlaps(c["span"], s) and (same_entity or true_qty_dt):
                    add(c, NER_FP_WRONG_SPAN)
                    break

    # coreference errors
    for i, c in enumerate(cases):
        if _is_coref(c):
            if FP_ in _ner(c, mode):
                add(c, COREFERENCE_FALSE_DETECTION)
            elif FN_ in _ner(c, mode):
                add(c, COREFERENCE_UNDETECTED)
            elif FN_ in _link(c, mode) and FP_ in _link(c, mode):
                ref = None
                for j in range(i - 1, -1, -1):
                    if cases[j]["mention_type"] == ENTITY_NAMED and \
                            cases[j]["has_gt"] and \
                            cases[j]["gt_entity_id"] == c["gt_entity_id"]:
                        ref = cases[j]
                        break
                if ref is not None:
                    if ref["pred_known"] and \
                            ref["pred_entity_id"] == c["pred_entity_id"]:
                        add(c, COREFERENCE_REFERENCE_WRONGLY_DISAMBIGUATED)
                    else:
                        add(c, COREFERENCE_WRONG_MENTION_REFERENCED)

    # correct / avoided labels
    for c in cases:
        if _is_coref(c):
            continue
        if TP_ in _link(c, mode):
            add(c, DISAMBIGUATION_CORRECT)
            if _is_demonym(c, dims):
                add(c, DISAMBIGUATION_DEMONYM_CORRECT)
            elif _is_metonymy(c, dims):
                add(c, DISAMBIGUATION_METONYMY_CORRECT)
            elif _is_partial_name(c):
                add(c, DISAMBIGUATION_PARTIAL_NAME_CORRECT)
            elif _is_rare(c, dims):
                add(c, DISAMBIGUATION_RARE_CORRECT)
            else:
                add(c, DISAMBIGUATION_OTHER_CORRECT)
        if TP_ in _ner(c, mode):
            add(c, AVOIDED_NER_FN)
        if (TP_ in _ner(c, mode) or FP_ in _ner(c, mode)) and \
                NER_FP_WRONG_SPAN not in c["error_labels"][mode]:
            add(c, AVOIDED_NER_FP_WRONG_SPAN)
        if _is_non_named(c["text"]):
            if TP_ in _ner(c, mode):
                add(c, AVOIDED_NER_FN_LOWERCASED)
        elif " " in c["text"]:
            if (TP_ in _ner(c, mode) or FN_ in _ner(c, mode)) and \
                    NER_FN_PARTIALLY_INCLUDED not in c["error_labels"][mode]:
                add(c, AVOIDED_NER_FN_PARTIALLY_INCLUDED)
        if not _is_non_named(c["text"]) and \
                (TP_ in _ner(c, mode) or FN_ in _ner(c, mode)):
            if NER_FN_PARTIAL_OVERLAP not in c["error_labels"][mode]:
                add(c, AVOIDED_NER_FN_PARTIAL_OVERLAP)
            if NER_FN_OTHER not in c["error_labels"][mode]:
                add(c, AVOIDED_NER_FN_OTHER)
        if not _is_non_named(c["text"]) and c["has_gt"] and _gt_unknown(c) \
                and FP_ not in _ner(c, mode):
            add(c, AVOIDED_NER_FP_GROUNDTRUTH_UNKNOWN)
