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
        regs = np.stack([np.frombuffer(b, dtype=np.uint8)
                         for b in g["_reg"]])
        est = hll_estimate(regs.max(axis=0))
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             alias: [int(round(est))]})

    return parts.groupby(group_col).map_groups(merge, batch_format="pandas")
