"""EntityDatabase dimension loaders — the reference's TSV/set file
formats (``src/elevant/helpers/entity_database_reader.py:16-316``) as
Ray-Data-native readers.

Round 1 synthesized these dims from the corpus; these loaders read the
REAL file formats so a user can point the engine at their Wikidata
exports.  Each loader is a line-parallel ``read_text`` →
``map_batches`` parse (stateless per line, so a sharded dims file
parallelizes for free), returning a typed Dataset; the ``*_dict``
helpers collapse small dimension tables to driver dicts for ``ray.put``
broadcast — dims are the small side by design (the 100 TB side is the
corpus, never these files).

Format quirks replicated exactly:
- gender labels are token-matched with "female" checked before "male"
  (:69-82), everything else → OTHER;
- demonyms auto-pluralize with a bare "+s" and map one demonym to MANY
  QIDs (:118-133);
- the languages file inverts to language→QID (:135-146);
- item→QID-set loaders keep only values starting with "Q" (Wikidata
  "unknown value" blank nodes are dropped, :201-213);
- whitelist types drop entries on the left side of a REPLACE_WITH
  adjustment (:26-66).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

import pyarrow as pa

from elevant_ray.stages.coref import FEMALE, MALE, OTHER


def _lines(path: str):
    import os

    import ray.data as rd

    # size-proportional block count (min 4, ~16 MB/block): Ray's
    # CPU-count default shatters small dim TSVs into dozens of blocks
    # whose task overhead dominates (same policy as the parquet
    # reader); directory inputs keep Ray's default.
    if os.path.isfile(path):
        nb = max(4, os.path.getsize(path) // (16 << 20))
        return rd.read_text(path, override_num_blocks=nb)
    return rd.read_text(path)


def _parse_stage(parse_row):
    """Wrap a per-line parser into a vectorized map_batches kernel."""
    def f(batch: pa.Table) -> pa.Table:
        rows: List[dict] = []
        for line in batch.column("text").to_pylist():
            out = parse_row(line)
            if out is not None:
                rows.append(out)
        if not rows:
            return pa.Table.from_pylist([])
        return pa.Table.from_pylist(rows)
    return f


def read_gender_tsv(path: str):
    """qid \\t gender-label → Dataset(qid, gender) with the engine's
    integer gender constants (get_gender_mapping, :69-82)."""
    def parse(line: str):
        if not line:
            return None
        qid, label = line.split("\t")
        toks = label.split()
        gender = FEMALE if "female" in toks else (
            MALE if "male" in toks else OTHER)
        return {"qid": qid, "gender": gender}

    return _lines(path).map_batches(_parse_stage(parse),
                                    batch_format="pyarrow")


def read_human_names_tsv(path: str):
    """qid \\t name → Dataset(qid, name) (read_human_names, :84-90)."""
    def parse(line: str):
        if not line:
            return None
        qid, name = line.split("\t")
        return {"qid": qid, "name": name}

    return _lines(path).map_batches(_parse_stage(parse),
                                    batch_format="pyarrow")


def read_coref_types_tsv(path: str):
    """qid \\t t1;t2;… → Dataset(qid, types list)
    (get_coreference_types_mapping, :92-101)."""
    def parse(line: str):
        if not line:
            return None
        qid, types = line.split("\t")
        return {"qid": qid, "types": types.split(";")}

    return _lines(path).map_batches(_parse_stage(parse),
                                    batch_format="pyarrow")


def read_languages_tsv(path: str):
    """qid \\t language → Dataset(language, qid) — INVERTED, exactly the
    reference's dict orientation (get_languages, :135-146)."""
    def parse(line: str):
        if not line:
            return None
        qid, language = line.split("\t")
        return {"language": language, "qid": qid}

    return _lines(path).map_batches(_parse_stage(parse),
                                    batch_format="pyarrow")


def read_demonyms_tsv(path: str):
    """qid \\t demonym → Dataset(demonym, qid) with the bare "+s"
    pluralization row added per input line (get_demonyms, :118-133);
    one demonym maps to many QIDs — group downstream or use
    ``demonyms_dict``."""
    def f(batch: pa.Table) -> pa.Table:
        dem, qids = [], []
        for line in batch.column("text").to_pylist():
            if not line:
                continue
            qid, demonym = line.split("\t")
            dem.extend([demonym, demonym + "s"])
            qids.extend([qid, qid])
        return pa.table({"demonym": pa.array(dem, pa.string()),
                         "qid": pa.array(qids, pa.string())})

    return _lines(path).map_batches(f, batch_format="pyarrow")


def read_set_file(path: str, column: str = "value"):
    """One item per line → Dataset(column) (read_into_set, :215-222;
    used for quantities / points-in-time / coarse types)."""
    def f(batch: pa.Table) -> pa.Table:
        vals = [v for v in batch.column("text").to_pylist() if v != ""]
        return pa.table({column: pa.array(vals, pa.string())})

    return _lines(path).map_batches(f, batch_format="pyarrow")


def read_item_to_qid_set_tsv(path: str):
    """key \\t qid → Dataset(key, qid), values not starting with "Q"
    dropped (read_item_to_qid_set_mapping, :201-213 — Wikidata
    "unknown value" blank nodes).  Set-valued downstream via groupby or
    ``item_to_qid_sets_dict``."""
    def parse(line: str):
        if not line:
            return None
        key, value = line.split("\t")
        if not value or value[0] != "Q":
            return None
        return {"key": key, "qid": value}

    return _lines(path).map_batches(_parse_stage(parse),
                                    batch_format="pyarrow")


def read_wikipedia_id_to_title_tsv(path: str):
    """wikipedia-id \\t title → Dataset(wikipedia_id int64, title)
    (get_wikipedia_id2wikipedia_title_mapping, :161-172)."""
    def parse(line: str):
        if not line:
            return None
        wid, title = line.split("\t")
        return {"wikipedia_id": int(wid), "title": title}

    return _lines(path).map_batches(_parse_stage(parse),
                                    batch_format="pyarrow")


def read_whitelist_types_tsv(path: str,
                             adjustments_path: Optional[str] = None):
    """type-qid \\t name → Dataset(type_qid, name); entries on the left
    side of a REPLACE_WITH adjustment are dropped (read_whitelist_types
    + read_whitelist_type_adjustments, :26-66).  The adjustments file is
    tiny and read on the driver (the reference does the same)."""
    replaced: Set[str] = set()
    if adjustments_path is not None:
        for raw in open(adjustments_path, encoding="utf8"):
            raw = raw.strip()
            if not raw:
                continue
            head = raw.split("#")[0].strip()
            parts = head.split()
            if len(parts) == 3 and parts[1] == "REPLACE_WITH":
                replaced.add(parts[0])

    def parse(line: str):
        line = line.strip("\n")
        if not line:
            return None
        lst = line.split("\t")
        entity_id = lst[0].strip()
        if entity_id in replaced:
            return None
        return {"type_qid": entity_id, "name": lst[1].strip()}

    return _lines(path).map_batches(_parse_stage(parse),
                                    batch_format="pyarrow")


# ---------------------------------------------------------------------------
# driver-dict collapses (for ray.put broadcast into actor stages)
# ---------------------------------------------------------------------------


def gender_dict(ds) -> Dict[str, int]:
    return {r["qid"]: r["gender"] for r in ds.take_all()}


def coref_types_dict(ds) -> Dict[str, List[str]]:
    return {r["qid"]: list(r["types"]) for r in ds.take_all()}


def languages_dict(ds) -> Dict[str, str]:
    return {r["language"]: r["qid"] for r in ds.take_all()}


def demonyms_dict(ds) -> Dict[str, List[str]]:
    out: Dict[str, List[str]] = {}
    for r in ds.take_all():
        out.setdefault(r["demonym"], []).append(r["qid"])
    return out


def item_to_qid_sets_dict(ds) -> Dict[str, Set[str]]:
    out: Dict[str, Set[str]] = {}
    for r in ds.take_all():
        out.setdefault(r["key"], set()).add(r["qid"])
    return out
