"""Mention-type classification (pure kernels).

Reproduces the reference's mention typing used in case generation:
``src/elevant/evaluation/mention_type.py:23-80`` and
``src/elevant/utils/pronoun_finder.py:7-33``.  Sentinel QIDs follow
``src/elevant/utils/knowledge_base_mapper.py:13-15``.
"""

from __future__ import annotations

from typing import Optional

NIL = "<NIL>"
NO_MAPPING = "<NO_MAPPING>"

# Pronoun inventory (pronoun_finder.py:8-19); genders are irrelevant for
# typing, only membership matters here.
PRONOUNS = frozenset(
    """i my me myself mine you your yourself yours he his him himself
    she her herself hers it its itself we us our ourselves ours
    yourselves they their them themselves theirs""".split()
)

_NOMINAL_PREFIXES = (
    "the ", "that ", "this ", "these ", "those ",
    "my ", "your ", "his ", "her ", "its ", "our ", "their ",
)

# MentionType values (mention_type.py:7-12) as plain strings — they flow
# into Arrow dictionary columns, no enum needed.
ENTITY_NAMED = "ENTITY_NAMED"
ENTITY_NON_NAMED = "ENTITY_NON_NAMED"
ENTITY_UNKNOWN = "ENTITY_UNKNOWN"
COREF_NOMINAL = "COREF_NOMINAL"
COREF_PRONOMINAL = "COREF_PRONOMINAL"

COREF_TYPES = frozenset({COREF_NOMINAL, COREF_PRONOMINAL})


def is_unknown_entity(entity_id: Optional[str]) -> bool:
    """knowledge_base_mapper.py:37-39."""
    return entity_id in (NIL, NO_MAPPING)


def is_pronoun(text: str) -> bool:
    """Match "I" but not acronyms like "US"/"IT" (pronoun_finder.py:21-24)."""
    return text.lower() in PRONOUNS and (not text.isupper() or text.lower() == "i")


def is_nominal(mention: str) -> bool:
    """"the X"/possessive prefixes with non-uppercase continuation
    (mention_type.py:31-37)."""
    lower = mention.lower()
    for prefix in _NOMINAL_PREFIXES:
        if lower.startswith(prefix) and len(mention) > len(prefix) \
                and not mention[len(prefix)].isupper():
            return True
    return False


def entity_mention_type(entity_name: str, entity_id: Optional[str] = None) -> str:
    """NAMED iff the first alphabetic char of the entity name is uppercase
    (mention_type.py:48-61)."""
    if (not entity_id and entity_name == "Unknown") or is_unknown_entity(entity_id):
        return ENTITY_UNKNOWN
    for ch in entity_name or "":
        if ch.isalpha():
            return ENTITY_NAMED if ch.isupper() else ENTITY_NON_NAMED
    return ENTITY_NON_NAMED


def mention_type(
    mention: str,
    gt_coref: Optional[bool],
    gt_name: Optional[str],
    gt_entity_id: Optional[str],
    pred_name: Optional[str],
    pred_entity_id: Optional[str],
) -> str:
    """Full typing rule (mention_type.py:64-80): an explicit ground-truth
    coref flag wins; otherwise infer from the mention text; otherwise from
    the entity name (gold first, else predicted)."""
    if gt_coref is not None:
        if gt_coref is False:
            return entity_mention_type(gt_name or "", gt_entity_id)
        return COREF_PRONOMINAL if is_pronoun(mention) else COREF_NOMINAL
    if is_pronoun(mention):
        return COREF_PRONOMINAL
    if is_nominal(mention):
        return COREF_NOMINAL
    if gt_name is not None or gt_entity_id is not None:
        return entity_mention_type(gt_name or "", gt_entity_id)
    return entity_mention_type(pred_name or "", pred_entity_id)
