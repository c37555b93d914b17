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

    # vectorized combine (the histogram can be large — e.g. prices in
    # cents — and a per-row Python loop here cost >1 s at sf0.1):
    # lexsort by (group, value), per-group cumulative weights via one
    # cumsum, first index satisfying 2·cum ≥ tot via minimum.reduceat.
    # partial_group_agg's driver combine already made (group, value)
    # unique, which the old dict-overwrite relied on too.
    import numpy as np
    import pandas as pd

    vvals = hist[value_col].to_numpy()
    wts = hist[weight_col].to_numpy()
    n = len(hist)
    if n == 0:
        return pa.table({c: [] for c in group_cols + [value_col]})
    if group_cols:
        if len(group_cols) == 1:
            gid, guniq = pd.factorize(hist[group_cols[0]], sort=True)
            gvals = [np.asarray(guniq)]
        else:
            mi = pd.MultiIndex.from_frame(hist[group_cols])
            gid, guniq = pd.factorize(mi, sort=True)
            gvals = [np.asarray([t[k] for t in guniq])
                     for k in range(len(group_cols))]
    else:
        gid = np.zeros(n, np.int64)
        gvals = []
    order = np.lexsort((vvals, gid))
    g_s, v_s, w_s = gid[order], vvals[order], wts[order]
    starts = np.flatnonzero(np.concatenate([[True],
                                            g_s[1:] != g_s[:-1]]))
    tot = np.add.reduceat(w_s, starts)
    cum = np.cumsum(w_s)
    base = np.concatenate([[0], cum[starts[1:] - 1]])
    grp_of = np.repeat(np.arange(len(starts)), np.diff(
        np.append(starts, n)))
    cumg = cum - base[grp_of]
    hitpos = np.where(2 * cumg >= tot[grp_of], np.arange(n), n)
    first = np.minimum.reduceat(hitpos, starts)
    # clamp to the group's OWN last row (float-weight rounding can
    # leave a group with no satisfying row; n-1 would silently take a
    # value from a different group)
    last = np.append(starts[1:], n) - 1
    meds = v_s[np.minimum(first, last)]
    # group ids in `starts` order are ascending (gid sorted), and
    # factorize(sort=True) made gid order == sorted-group order —
    # matching the old sorted(per_group) output order
    out_g = g_s[starts]
    cols = {c: pa.array(gv[out_g]) for c, gv in zip(group_cols, gvals)}
    cols[value_col] = pa.array(meds)
    return pa.table(cols)
