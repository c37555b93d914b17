"""Wikidata type-hierarchy mappings — the reference's two type scripts
as distributed operators:

- :func:`all_types_mapping` — per entity, every reachable superclass
  with its minimum depth (``scripts/create_all_types_mapping.py:15-49``):
  seeds = instance-of ∪ subclass-of at depth 0, supers transitively at
  increasing depth.  The subclass-of graph is the SMALL side (a type
  DAG, millions of edges at most, entity-count-independent) and ships
  once via ``ray.put``; the per-entity work memoizes CLASS closures per
  worker — a class's min-depth closure is entity-independent, so a
  10^9-entity corpus still computes each class closure once per worker
  instead of once per entity.  Depth merging is exact min-depth BFS;
  the reference's DFS-with-seen-set recursion agrees on min depth for
  DAGs (differential-tested), modulo its own set-iteration-order
  dependence on exotic graphs.

- :func:`coreference_types_from_lines` — the depth-pruned coref-type
  extraction (``scripts/create_coreference_types_mapping.py:12-50``),
  replicated line-exactly including its quirks: depth cutoff at
  ``min(max_level, 3)``, the coarse-type early stop, the
  ``highest_level - 2`` window that tracks max_level for entities with
  shallow hierarchies, and the fact that types are appended BEFORE the
  break check evaluates the next element.

The TSV format is the reference's: ``qid\\t0:Q5\\t1:Q215627…`` sorted by
(depth, qid).
"""

from __future__ import annotations

from typing import Dict, List, Set

import pyarrow as pa


def _class_closure(cls: str, subclass_of: Dict[str, Set[str]],
                   cache: Dict[str, Dict[str, int]]) -> Dict[str, int]:
    """Min-depth closure of one class: superclass → depth ≥ 1.
    Iterative BFS with per-worker memoization."""
    hit = cache.get(cls)
    if hit is not None:
        return hit
    out: Dict[str, int] = {}
    frontier = [cls]
    depth = 0
    seen = {cls}
    while frontier:
        depth += 1
        nxt: List[str] = []
        for c in frontier:
            for sup in subclass_of.get(c, ()):
                if sup not in out:
                    out[sup] = depth
                if sup not in seen:
                    seen.add(sup)
                    nxt.append(sup)
        frontier = nxt
    cache[cls] = out
    return out


def entity_all_types(seeds: Set[str],
                     subclass_of: Dict[str, Set[str]],
                     cache: Dict[str, Dict[str, int]]) -> Dict[str, int]:
    """One entity's {class → min depth}: seeds at 0, their closures
    offset by their own depth-1 start (create_all_types_mapping.py:
    38-49 semantics — `get_super_classes_with_depth(cls, set(), 1)`
    starts each seed's supers at depth 1)."""
    distinct: Dict[str, int] = {c: 0 for c in seeds}
    for seed in seeds:
        for sup, d in _class_closure(seed, subclass_of, cache).items():
            if sup not in distinct or d < distinct[sup]:
                distinct[sup] = d
    return distinct


def format_all_types_line(qid: str, distinct: Dict[str, int]) -> str:
    """Reference output line: qid then tab-separated depth:cls sorted
    by (depth, cls) (create_all_types_mapping.py:73-76)."""
    parts = [f"{d}:{c}" for c, d in
             sorted(distinct.items(), key=lambda kv: (kv[1], kv[0]))]
    return "\t".join([qid] + parts)


def all_types_mapping(instance_of, subclass_of_dict: Dict[str, Set[str]],
                      subclass_of=None):
    """instance_of: Dataset(key, qid) rows (one row per instance-of
    edge, `sources/entity_db.read_item_to_qid_set_tsv` shape) →
    Dataset(qid, line) with the reference's all-types TSV line per
    entity.  ``subclass_of_dict`` is the broadcast type DAG; pass
    ``subclass_of`` (same Dataset shape) to also union each entity's
    own subclass-of edges into its seeds (the reference does,
    :39-41)."""
    import ray

    from elevant_ray.stages.util import cogroup_join, pin_schema

    sub_ref = ray.put({k: set(v) for k, v in subclass_of_dict.items()})

    seeds = instance_of
    if subclass_of is not None:
        seeds = seeds.union(subclass_of)

    # collect each entity's seed set with one vectorized hash
    # aggregate (Unique), then map the closure per entity
    from ray.data.aggregate import Unique

    grouped = seeds.groupby("key").aggregate(
        Unique(on="qid", alias_name="seeds"))

    def closure_batch(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get

        if b.num_rows == 0 or "key" not in b.column_names:
            return pa.table({"qid": pa.array([], pa.string()),
                             "line": pa.array([], pa.string())})
        sub = cached_get(sub_ref)
        cache: Dict[str, Dict[str, int]] = _WORKER_CLOSURE_CACHE
        qids, lines = [], []
        for qid, seed_list in zip(b.column("key").to_pylist(),
                                  b.column("seeds").to_pylist()):
            distinct = entity_all_types(set(seed_list), sub, cache)
            qids.append(qid)
            lines.append(format_all_types_line(qid, distinct))
        return pa.table({"qid": pa.array(qids, pa.string()),
                         "line": pa.array(lines, pa.string())})

    out = grouped.map_batches(closure_batch, batch_format="pyarrow")
    return pin_schema(out, pa.schema([("qid", pa.string()),
                                      ("line", pa.string())]))


# per-worker-process memo of class closures (entity-independent)
_WORKER_CLOSURE_CACHE: Dict[str, Dict[str, int]] = {}


def extract_coref_types_line(line: str,
                             coarse_types: Set[str]) -> List[str]:
    """One all-types line → pruned coref type list — replicates
    ``extract_coreference_types`` (create_coreference_types_mapping.py:
    20-50) exactly, quirks included."""
    line = line.strip("\n")
    lst = line.split("\t")
    if len(lst) < 2:
        return []
    highest_level = int(lst[-1].split(":")[0])
    max_level = highest_level
    coarse_type_found = False
    types: List[str] = []
    for el in lst[1:]:
        test_lst = el.split(":")
        if len(test_lst) > 2:
            continue
        level_s, type_id = el.split(":")
        level = int(level_s)
        if level > min(max_level, 3):
            break
        if type_id in coarse_types:
            coarse_type_found = True
            max_level = level
        elif not coarse_type_found and level > highest_level - 2:
            max_level = level
        types.append(type_id)
    return types


def coreference_types_from_lines(lines_ds, coarse_types: Set[str]):
    """Dataset(line) or Dataset(qid, line) → Dataset(qid, types list),
    one map_batches over broadcast coarse types."""
    import ray

    coarse_ref = ray.put(set(coarse_types))

    def f(b: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get

        coarse = cached_get(coarse_ref)
        col = "line" if "line" in b.column_names else "text"
        qids, types = [], []
        for line in b.column(col).to_pylist():
            ts = extract_coref_types_line(line, coarse)
            if not ts:
                continue
            qids.append(line.split("\t", 1)[0])
            types.append(ts)
        return pa.table({"qid": pa.array(qids, pa.string()),
                         "types": pa.array(types,
                                           pa.list_(pa.string()))})

    return lines_ds.map_batches(f, batch_format="pyarrow")
