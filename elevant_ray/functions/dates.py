"""Date-mention detection — parity with ``src/elevant/utils/dates.py:6-18``.

The baseline linker drops NER spans that parse as dates
(``baseline_linker.py:74``); same predicate here, used inside the scorer
stage.  ``dateutil`` is baked into the environment; gate anyway.
"""

from __future__ import annotations

import re

try:
    from dateutil.parser import parse as _parse_date
except ImportError:  # pragma: no cover
    _parse_date = None

MONTH_DATE_RE = re.compile(
    r"([0-9]{1,2} )?(January|February|March|April|May|June|July|August|"
    r"September|October|November|December)( [0-9]{1,4})?"
)


def is_date_by_re(text: str) -> bool:
    return bool(MONTH_DATE_RE.fullmatch(text))


def is_date(text: str) -> bool:
    if _parse_date is None:
        return is_date_by_re(text)
    try:
        _parse_date(text, ignoretz=True)
        return True
    except Exception:
        return False
