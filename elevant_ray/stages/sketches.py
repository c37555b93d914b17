"""Distributed cardinality sketches (HyperLogLog).

The exact count-distinct path (``events_distinct_users``) shuffles the
distinct key pairs; at 10^12 rows / 10^9 distinct users that exchange is
the bottleneck, so this module provides the classic sketch alternative:
per-batch HLL registers (Flajolet et al. 2007, + the small-range linear
counting correction) merged by element-wise max — a few KB per group
crosses the wire regardless of cardinality, and register merge is
associative + commutative, so the result is exact-deterministic under
any partitioning.

No reference counterpart (SURVEY §2.6: the reference keeps all counts
exact); this is the engine's beyond-reference scale addition, kept
rows-only in the driver contract (approximate ⇒ no value-hash oracle)
with a pytest asserting agreement with the exact path within the
sketch's standard error.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

_HLL_SEED = np.uint64(0x9E3779B97F4A7C15)


def _hash64(vals: np.ndarray) -> np.ndarray:
    """splitmix64 over int64/uint64 input values."""
    x = vals.astype(np.uint64) + _HLL_SEED
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def hll_registers(values: np.ndarray, p: int = 12) -> np.ndarray:
    """uint8[2^p] HLL registers for a value array (vectorized)."""
    if not 12 <= p <= 52:
        # the frexp/log2 rho trick below is exact only while the low
        # 64-p bits fit float53 — reject silently-biased configurations
        raise ValueError(f"hll_registers requires 12 <= p <= 52, got {p}")
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return reg
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h & np.uint64((1 << (64 - p)) - 1)
    # rho = position of the leftmost 1-bit in the low 64-p bits (1-based
    # from the top); rem == 0 → maximal rank
    nz = rem > 0
    rho = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    # floor(log2) via frexp is exact for ints < 2^53; 64-p <= 52 when
    # p >= 12 keeps rem inside float53
    rho[nz] = (64 - p - np.floor(np.log2(rem[nz].astype(np.float64)))
               ).astype(np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    """Cardinality estimate with the small-range correction."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def grouped_approx_distinct(ds, group_col: str, value_col: str,
                            p: int = 12, alias: str = "approx_distinct"):
    """→ Dataset(group_col, approx_distinct) — per-group HLL.

    Per-batch partial registers (one uint8[2^p] blob per group per
    batch) → groupby(group) → element-wise-max merge + estimate.  The
    shuffle moves O(groups × batches × 2^p) bytes, independent of the
    number of distinct values.  Assumes an integer value column (hash
    strings upstream)."""

    def partials(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.table({
                group_col: pa.array(
                    [], batch.schema.field(group_col).type),
                "_reg": pa.array([], pa.binary())})
        out_k, out_r = [], []
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        bounds = np.flatnonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))
        for s, e in zip(bounds, np.concatenate([bounds[1:], [len(keys)]])):
            out_k.append(keys[s])
            out_r.append(hll_registers(vals[s:e], p=p).tobytes())
        return pa.table({group_col: pa.array(out_k),
                         "_reg": pa.array(out_r, pa.binary())})

    parts = ds.map_batches(partials, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({group_col: [], alias: []})
        regs = np.stack([np.frombuffer(b, dtype=np.uint8)
                         for b in g["_reg"]])
        est = hll_estimate(regs.max(axis=0))
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             alias: [int(round(est))]})

    return parts.groupby(group_col).map_groups(merge, batch_format="pandas")


def _mg_compress(items: np.ndarray, weights: np.ndarray, capacity: int):
    """Misra-Gries compression: keep ≤ ``capacity`` counters by
    subtracting the (capacity+1)-th largest weight from all (the
    classic decrement step, batched).  Mergeable-summary property
    (Agarwal et al., PODS 2012): any item with true frequency
    > N/capacity survives, and every kept weight underestimates the true
    count by ≤ N/capacity."""
    if len(items) <= capacity:
        return items, weights
    thresh = np.partition(weights, len(weights) - capacity - 1)[
        len(weights) - capacity - 1]
    keep = weights > thresh
    return items[keep], weights[keep] - thresh


def heavy_hitters(ds, col: str, k: int = 10, capacity: int = 64):
    """→ pyarrow.Table(col, count) — approximate top-k via Misra-Gries.

    Two passes, zero shuffles: (1) per-batch exact ``np.unique`` counts
    compressed to a ``capacity``-sized MG summary, summaries merged on
    the driver (weight sum + one final compression — the standard
    mergeable-summaries combine); (2) a second scan counts the surviving
    candidates EXACTLY (per-batch masked bincount partials summed on the
    driver), so every returned count is exact and the top-k among
    candidates is reported.  Guarantee: contains every item with true
    frequency > N/capacity.  Beyond-reference sketch operator (the
    reference's counts are all exact, SURVEY.md §2.6); at 10^12-row
    scale pass 1 moves only O(batches × capacity) rows to the driver
    and pass 2 only O(batches × candidates)."""

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_numpy(zero_copy_only=False)
        u, c = np.unique(vals, return_counts=True)
        u, c = _mg_compress(u, c.astype(np.int64), capacity)
        # pin the value type: an empty batch's np.unique yields float64
        # which would conflict with non-empty blocks' schema
        return pa.table({col: pa.array(u, b.schema.field(col).type),
                         "w": pa.array(c, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({col: pa.array([], pa.int64()),
                         "count": pa.array([], pa.int64())})
    merged = parts.groupby(col, as_index=False)["w"].sum()
    items, weights = _mg_compress(merged[col].to_numpy(),
                                  merged["w"].to_numpy(), capacity)
    cand = np.sort(items)
    if len(cand) == 0:
        # all merged weights tied at the compression threshold — no
        # candidate clears it, so the exact-recount pass has nothing
        # to verify (every item has frequency ≤ N/capacity)
        return pa.table({col: pa.array([], pa.int64()),
                         "count": pa.array([], pa.int64())})

    def exact(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cand, vals)
        pos_c = np.minimum(pos, len(cand) - 1)
        hit = cand[pos_c] == vals
        cnt = np.bincount(pos_c[hit], minlength=len(cand))
        return pa.table({col: pa.array(cand), "c": pa.array(cnt, pa.int64())})

    ex = ds.map_batches(exact, batch_format="pyarrow").to_pandas()
    ex = ex.groupby(col, as_index=False)["c"].sum()
    ex = ex.sort_values(["c", col], ascending=[False, True],
                        kind="stable").head(k)
    return pa.table({col: pa.array(ex[col].to_numpy()),
                     "count": pa.array(ex["c"].to_numpy(), pa.int64())})


def approx_quantiles(ds, col: str, qs, group_cols=None,
                     sample_per_batch: int = 256):
    """→ pyarrow.Table(group_cols…, q, value) — mergeable one-pass
    approximate quantiles by rank-stratified subsampling.

    Per batch (and per group within the batch) the values are sorted
    and ``sample_per_batch`` rank-stratified representatives are kept,
    each weighted by its stratum size — a deterministic, RNG-free
    mergeable summary (rank error ≤ 1/(2·m) per batch before merging).
    Summaries stream to the driver (O(batches × groups × m) rows) where
    one weighted-quantile scan answers all q's.  Complements the EXACT
    two-phase histogram in stages/quantiles.py: use this when the value
    domain is unbounded/continuous and an ε-rank answer suffices."""
    group_cols = list(group_cols or [])

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(group_cols + [col]).to_pandas()
        out_g, out_v, out_w = [], [], []

        def summarize(key, vals):
            vals = np.sort(vals.to_numpy())
            n = len(vals)
            m = min(sample_per_batch, n)
            # stratum midpoints: ranks (i+0.5)·n/m
            idx = np.minimum(((np.arange(m) + 0.5) * n / m).astype(np.int64),
                             n - 1)
            w = np.full(m, n / m, dtype=np.float64)
            out_g.extend([key] * m)
            out_v.append(vals[idx])
            out_w.append(w)

        if group_cols:
            for key, g in df.groupby(group_cols[0] if len(group_cols) == 1
                                     else group_cols, sort=True):
                summarize(key, g[col])
        else:
            summarize((), df[col])
        if not out_v:
            # derive empty group-key types from the batch so an empty
            # block never disagrees with non-empty blocks' schema
            return pa.table({**{c: pa.Array.from_pandas(df[c].head(0))
                                for c in group_cols},
                             "v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        tbl = {"v": pa.array(np.concatenate(out_v), pa.float64()),
               "w": pa.array(np.concatenate(out_w), pa.float64())}
        for i, c in enumerate(group_cols):
            keys = [g if len(group_cols) == 1 else g[i] for g in out_g]
            tbl = {c: pa.array(keys), **tbl}
        return pa.table(tbl)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({**{c: pa.array([], pa.string())
                            for c in group_cols},
                         "q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})

    def weighted_q(g: pd.DataFrame):
        order = np.argsort(g["v"].to_numpy(), kind="stable")
        v = g["v"].to_numpy()[order]
        w = g["w"].to_numpy()[order]
        cum = np.cumsum(w)
        return [float(v[np.searchsorted(cum, q * cum[-1], "left")])
                for q in qs]

    rows = []
    if group_cols:
        for key, g in parts.groupby(group_cols, sort=True):
            key = key if isinstance(key, tuple) else (key,)
            for q, val in zip(qs, weighted_q(g)):
                rows.append((*key, float(q), val))
    else:
        for q, val in zip(qs, weighted_q(parts)):
            rows.append((float(q), val))
    names = group_cols + ["q", "value"]
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    return pa.table({n: pa.array(list(c)) for n, c in zip(names, cols)})


# ---------------------------------------------------------------------------
# Bloom filter (semi-join prefilter)
# ---------------------------------------------------------------------------

def bloom_bits(values: np.ndarray, m_bits: int, k: int = 4) -> np.ndarray:
    """Bloom-filter bitset (uint64 words) over int64 keys: k derived
    hashes from one splitmix64 pass (Kirsch-Mitzenmacher double
    hashing), m_bits a power of two.  Per-batch partials merge by
    bitwise OR — associative + commutative, so the build side never
    shuffles: each block contributes a fixed m/8-byte partial no matter
    how many rows it holds."""
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of 2"
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(values) == 0:
        return words
    h = _hash64(values)
    h1 = h & np.uint64(m_bits - 1)
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd ⇒ full-cycle stride
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) & np.uint64(m_bits - 1)
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    return words


def bloom_contains(words: np.ndarray, values: np.ndarray,
                   k: int = 4) -> np.ndarray:
    """Membership mask; no false negatives, FP rate ≈ (1-e^{-kn/m})^k."""
    m_bits = len(words) * 64
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    h = _hash64(values)
    h1 = h & np.uint64(m_bits - 1)
    h2 = (h >> np.uint64(33)) | np.uint64(1)
    mask = np.ones(len(values), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) & np.uint64(m_bits - 1)
        bit = (words[(idx >> np.uint64(6)).astype(np.int64)]
               >> (idx & np.uint64(63))) & np.uint64(1)
        mask &= bit.astype(bool)
    return mask


def bloom_from_dataset(ds, col: str, m_bits: int = 1 << 20,
                       k: int = 4) -> np.ndarray:
    """OR-merge of per-batch Bloom partials over ``ds[col]`` — the
    distributed build of a semi-join prefilter.  Each batch emits one
    fixed-size bitset row; the driver folds them with bitwise OR."""
    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_numpy(zero_copy_only=False)
        w = bloom_bits(vals.astype(np.int64), m_bits, k)
        return pa.table({"words": pa.array([w.tobytes()], pa.binary())})

    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for batch in (ds.map_batches(partial, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
        for buf in batch.column("words").to_pylist():
            words |= np.frombuffer(buf, dtype=np.uint64)
    return words


_CMS_MULTS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def _cms_buckets(keys: np.ndarray, width_bits: int, depth: int):
    """(depth, n) bucket indices for int64 keys: one multiply-xorshift
    mix per row (NO int64 modulo — scalar division; the width is a
    power of two so the bucket is the top ``width_bits`` of the mix,
    the same trick as the minhash remix)."""
    v = keys.astype(np.int64).view(np.uint64)
    out = np.empty((depth, len(v)), np.int64)
    for d in range(depth):
        h = v * _CMS_MULTS[d]
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
        out[d] = (h >> np.uint64(64 - width_bits)).astype(np.int64)
    return out


def count_min_matrix(ds, col: str, width_bits: int = 11,
                     depth: int = 4) -> np.ndarray:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over an int64
    column, built distributed: each batch bincounts its keys into the
    (depth × 2^width_bits) grid and emits (cell, cnt) partial rows;
    the cell space is fixed-size, so the merge is an ordinary bounded
    sum aggregate no matter the key cardinality.  Returns the dense
    matrix on the driver.  Guarantee: estimate ≥ true count, and
    overshoot ≤ e/width · N with probability 1 − e^−depth."""
    from .util import partial_group_agg

    width = 1 << width_bits
    depth = min(depth, len(_CMS_MULTS))

    def partials(b: pa.Table) -> pa.Table:
        keys = b.column(col).to_numpy(zero_copy_only=False)
        bk = _cms_buckets(keys, width_bits, depth)
        cells = (np.arange(depth, dtype=np.int64)[:, None] * width
                 + bk).ravel()
        u, c = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64))})

    agg = partial_group_agg(ds.map_batches(partials,
                                           batch_format="pyarrow"),
                            ["cell"], sum_cols=["cnt"], combine="driver")
    m = np.zeros(depth * width, np.int64)
    if not agg.empty:
        m[agg["cell"].to_numpy(np.int64)] = agg["cnt"].to_numpy(np.int64)
    return m.reshape(depth, width)


def count_min_estimate(matrix: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates for int64 keys: min over the depth rows."""
    depth, width = matrix.shape
    bk = _cms_buckets(keys, int(width).bit_length() - 1, depth)
    return np.min(matrix[np.arange(depth)[:, None], bk], axis=0)
