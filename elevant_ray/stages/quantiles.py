"""Exact distributed quantiles via value histograms.

Beyond-reference operator (SURVEY.md §2 extensions): large-scale
training-data pipelines threshold on quality-score / length
distributions, which needs exact percentiles over billions of rows.

The scalable shape: quantiles over a DISCRETE value domain (token
counts, score buckets) reduce to a value→count histogram — a two-phase
grouped count (per-batch Arrow partials, then a tiny combine;
stages/util.partial_group_agg) whose cardinality is the number of
DISTINCT values, independent of row count.  The cumulative scan over
the sorted histogram then runs on the driver in O(|domain|).  For
continuous domains, quantize first (the ``scale`` knob) — at 10^12 rows
an exact continuous quantile needs a distributed sort; a fixed-point
quantization to 10^-6 is exact enough for any thresholding use and
keeps this histogram shape.

``percentile_disc`` semantics (matches DuckDB/ANSI ``quantile_disc``):
the q-quantile of n sorted values is the element at 1-indexed position
``ceil(q*n)`` (clamped to ≥1) — no interpolation, always a value that
occurs in the data.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa


def quantiles_from_histogram(hist: Dict, qs: Sequence[float]) -> Dict[float, object]:
    """``hist``: value → count.  Returns q → percentile_disc value."""
    items = sorted(hist.items())
    n = sum(c for _, c in items)
    out = {}
    for q in qs:
        if n == 0:
            out[q] = None
            continue
        k = max(1, math.ceil(q * n))
        cum = 0
        for v, c in items:
            cum += c
            if cum >= k:
                out[q] = v
                break
    return out


def grouped_quantiles(ds, value_col: str, qs: Sequence[float],
                      group_cols: Optional[List[str]] = None):
    """Dataset → pyarrow.Table(*group_cols, q, <value_col>) of exact
    per-group percentile_disc quantiles.

    One histogram per (group, value) via the two-phase grouped count —
    the only exchange is the tiny histogram combine; no sort, no
    per-row shuffle.  Group × distinct-value cardinality must fit the
    driver (true for token counts / quality buckets at any row count).
    """
    from elevant_ray.stages.util import partial_group_agg

    group_cols = list(group_cols or [])
    keys = group_cols + [value_col]
    hist = partial_group_agg(ds, keys, count_alias="cnt", combine="driver")
    count_col = "cnt"

    # iterate the columns directly — itertuples() renames any column
    # that is not a valid Python identifier (keywords, spaces, leading
    # underscores), which would break the name lookups below
    gcols = [hist[c].to_numpy() for c in group_cols]
    vvals = hist[value_col].to_numpy()
    cnts = hist[count_col].to_numpy()
    per_group: Dict[Tuple, Dict] = {}
    for i in range(len(hist)):
        g = tuple(col[i] for col in gcols)
        per_group.setdefault(g, {})[vvals[i]] = cnts[i]

    cols: Dict[str, list] = {c: [] for c in group_cols}
    cols["q"] = []
    cols[value_col] = []
    for g in sorted(per_group):
        qvals = quantiles_from_histogram(per_group[g], qs)
        for q in qs:
            for c, gv in zip(group_cols, g):
                cols[c].append(gv)
            cols["q"].append(float(q))
            cols[value_col].append(qvals[q])
    return pa.table(cols)


def grouped_weighted_median(ds, value_col: str, weight_col: str,
                            group_cols: Optional[List[str]] = None):
    """Dataset → pyarrow.Table(*group_cols, <value_col>) of exact
    per-group LOWER WEIGHTED MEDIANS: the smallest value v whose
    cumulative weight reaches half the group's total weight
    (``2·cumw(v) ≥ totw`` over the value-ascending scan — the integer
    form of the classic weighted-median rule, exact when weights are
    integers).

    Same scalable shape as :func:`grouped_quantiles`: the only exchange
    is the (group, value) → Σweight histogram combine; no sort of the
    fact table.  Equal-weight input degenerates to percentile_disc(0.5).
    """
    from elevant_ray.stages.util import partial_group_agg

    group_cols = list(group_cols or [])
    hist = partial_group_agg(ds, group_cols + [value_col],
                             sum_cols=[weight_col], combine="driver")

    gcols = [hist[c].to_numpy() for c in group_cols]
    vvals = hist[value_col].to_numpy()
    wts = hist[weight_col].to_numpy()
    per_group: Dict[Tuple, Dict] = {}
    for i in range(len(hist)):
        g = tuple(col[i] for col in gcols)
        per_group.setdefault(g, {})[vvals[i]] = wts[i]

    cols: Dict[str, list] = {c: [] for c in group_cols}
    cols[value_col] = []
    for g in sorted(per_group):
        items = sorted(per_group[g].items())
        tot = sum(w for _, w in items)
        med = None
        cum = 0
        for v, w in items:
            cum += w
            if 2 * cum >= tot:
                med = v
                break
        for c, gv in zip(group_cols, g):
            cols[c].append(gv)
        cols[value_col].append(med)
    return pa.table(cols)
