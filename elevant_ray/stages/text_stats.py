"""Text-analysis Dataset stages: token counts, quality features, language
ID, fingerprints, and the unigram word-count build.

The unigram build mirrors the reference's offline count job
(``scripts/count_unigrams.py:12-31``) as the canonical word-count
dataflow: vectorized per-batch partial Counters (map-side combine) →
small ``groupby(token).sum`` — NOT a row-explode + full shuffle of every
token occurrence, which would be the 100-TB bottleneck (SURVEY §2.6).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from elevant_ray.functions.tokens import (
    lang_guess, md5_fingerprint, quality_features, unigrams,
)


def doc_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append per-document stats columns (vectorized-over-rows kernel)."""
    texts = batch.column(text_col).to_pylist()
    feats = [quality_features(t) for t in texts]
    out = batch
    for name, typ in (
        ("n_chars", pa.int64()), ("n_tokens", pa.int64()),
        ("n_alpha", pa.int64()), ("n_digit", pa.int64()),
        ("stopword_count", pa.int64()), ("mean_token_len", pa.float64()),
    ):
        out = out.append_column(name, pa.array([f[name] for f in feats], typ))
    out = out.append_column(
        "lang_pred", pa.array([lang_guess(t) for t in texts], pa.string()))
    out = out.append_column(
        "fingerprint", pa.array([md5_fingerprint(t) for t in texts], pa.string()))
    return out


def _partial_unigram_counts(batch: pa.Table, text_col: str) -> pa.Table:
    counts: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        counts.update(unigrams(t))
    return pa.table({
        "token": pa.array(list(counts.keys()), pa.string()),
        "partial": pa.array(list(counts.values()), pa.int64()),
    })


def unigram_counts(ds, text_col: str = "text"):
    """token → global count, sorted by token (count_unigrams.py:29-30
    writes sorted output).  Partial-aggregate first: the shuffle moves at
    most (distinct tokens × blocks) rows instead of every occurrence."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: _partial_unigram_counts(b, text_col), batch_format="pyarrow")
    return (partials.groupby("token")
            .aggregate(Sum("partial", alias_name="count"))
            .sort("token"))


def _partial_bigram_counts(batch: pa.Table, text_col: str) -> pa.Table:
    counts: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        toks = unigrams(t)
        counts.update(zip(toks, toks[1:]))
    keys = list(counts.keys())
    return pa.table({
        "w1": pa.array([k[0] for k in keys], pa.string()),
        "w2": pa.array([k[1] for k in keys], pa.string()),
        "partial": pa.array(list(counts.values()), pa.int64()),
    })


def bigram_counts(ds, text_col: str = "text", sort: bool = True):
    """Adjacent-token-pair counts over the corpus — the n-gram language
    model build step.  Same two-phase shape as ``unigram_counts``
    (count_unigrams.py:12-31 generalized to order 2): per-batch partial
    Counters keep the shuffle at (distinct bigrams × blocks) rows, not
    one row per token occurrence.  ``sort=False`` skips the trailing
    range exchange when the caller orders the result itself."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: _partial_bigram_counts(b, text_col), batch_format="pyarrow")
    out = (partials.groupby(["w1", "w2"])
           .aggregate(Sum("partial", alias_name="count")))
    return out.sort(["w1", "w2"]) if sort else out
