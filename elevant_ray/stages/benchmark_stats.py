"""Benchmark statistics as an associative Ray Data aggregate.

Mirrors the reference's single-process counter loop
(``src/elevant/evaluation/benchmark_statistics.py:19-150``) — articles /
labels / token counts, per-mention-type counts, multi-word histogram,
capitalization tags, per-type counts — recast as a per-batch partial
``Counter`` followed by a tiny keyed groupby-sum (the same shape as the
TP/FP/FN counting stage, SURVEY.md §2.6: fully associative+commutative,
exact under any partitioning).  The reference's spaCy word/sentence
counts are replaced by the engine's whitespace tokenizer
(``functions/tokens.py``) — no model weights in the data plane.

Output: long-format Dataset(stat, key, value) — e.g.
(``mention_type``, ``NAMED``, 412), (``multi_word``, ``3``, 57) —
pivoted by the caller when a nested dict is wanted.
"""

from __future__ import annotations

from collections import Counter
from typing import List

import pyarrow as pa

from elevant_ray.functions.mention_types import mention_type
from elevant_ray.functions.tokens import token_count


def _label_counts(text: str, labels: List[dict], counter: Counter) -> None:
    counter[("text", "articles")] += 1
    counter[("text", "words")] += token_count(text)
    for lb in labels or []:
        counter[("text", "labels")] += 1
        mention = text[lb["begin"]:lb["end"]]
        mt = mention_type(mention, lb.get("coref"),
                          lb.get("name"), lb.get("entity_id"),
                          None, None)
        counter[("mention_type", mt)] += 1
        n_words = len(mention.split(" "))
        counter[("multi_word", str(min(n_words, 5)))] += 1
        if mention and mention[0].isupper():
            counter[("case", "capitalized")] += 1
        elif mention and mention[0].islower():
            counter[("case", "lowercased")] += 1
        else:
            counter[("case", "non_alpha")] += 1
        for t in (lb.get("type") or "OTHER").split("|"):
            counter[("entity_type", t)] += 1


def benchmark_statistics(articles, num_partitions: int = 8):
    """articles(text, labels[, …]) → Dataset(stat, key, value) of exact
    corpus statistics."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counter: Counter = Counter()
        labels_col = (batch.column("labels").to_pylist()
                      if "labels" in batch.column_names
                      else [[]] * batch.num_rows)
        for text, labels in zip(batch.column("text").to_pylist(), labels_col):
            _label_counts(text, labels, counter)
        stats = sorted(counter)
        return pa.table({
            "stat": pa.array([s for s, _ in stats], pa.string()),
            "key": pa.array([k for _, k in stats], pa.string()),
            "partial": pa.array([counter[sk] for sk in stats], pa.int64()),
        })

    out = (articles.map_batches(partial, batch_format="pyarrow")
           .groupby(["stat", "key"], num_partitions=num_partitions)
           .aggregate(Sum("partial", alias_name="value")))
    return out.sort(["stat", "key"])
