"""Type-hierarchy mappings (stages/type_mapping.py) —
differential-tested against the reference's two scripts
(create_all_types_mapping.py, create_coreference_types_mapping.py)
loaded as TEST-ONLY oracles with their import graphs stubbed."""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import pytest

from elevant_ray.stages.type_mapping import (
    entity_all_types, extract_coref_types_line, format_all_types_line)

FIX = Path(__file__).parent / "fixtures" / "entity_db"
REF_ALL = Path("/root/reference/scripts/create_all_types_mapping.py")
REF_COREF = Path("/root/reference/scripts/create_coreference_types_mapping.py")


def _stub_modules():
    saved = {}
    specs = {
        "elevant": {}, "elevant.utils": {}, "elevant.settings": {},
        "elevant.utils.log": {"setup_logger": lambda *a, **k: None},
        "elevant.helpers": {},
        "elevant.helpers.entity_database_reader": {
            "EntityDatabaseReader": object},
    }
    for name, attrs in specs.items():
        saved[name] = sys.modules.get(name)
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
    sys.modules["elevant.settings"].__getattr__ = \
        lambda name: f"/nonexistent/{name}"
    return saved


def _restore(saved):
    for name, old in saved.items():
        if old is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = old


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    # the scripts run main() under __main__ only; import is side-effect
    # free except the argparse/log guard at module bottom
    mod.__name__ = name
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mods():
    if not (REF_ALL.exists() and REF_COREF.exists()):
        pytest.skip("reference repo not available")
    saved = _stub_modules()
    all_mod = _load(REF_ALL, "_ref_all_types")
    coref_mod = _load(REF_COREF, "_ref_coref_types")
    # `logger` is created under the scripts' __main__ guard only
    silent = types.SimpleNamespace(info=lambda *a, **k: None,
                                   debug=lambda *a, **k: None)
    all_mod.logger = silent
    coref_mod.logger = silent
    yield all_mod, coref_mod
    _restore(saved)


GRAPHS = [
    # (instance_of, subclass_of) — tree, diamond, skip-level DAG, cycle
    ({"E1": {"Q5"}, "E2": {"Q43229"}},
     {"Q5": {"Q215627"}, "Q215627": {"Q35120"}, "Q43229": {"Q35120"}}),
    ({"E1": {"A"}},
     {"A": {"B", "C"}, "B": {"D"}, "C": {"D"}, "D": {"E"}}),
    ({"E1": {"A"}, "E2": {"B"}},
     {"A": {"B"}, "B": {"C"}, "A2": {"C"}, "C": {"D"}, "D": {"A"}}),
    ({"E1": {"A", "B"}},
     {"A": {"C"}, "B": {"C", "D"}, "C": {"E"}, "D": {"E"}, "E": {"F"}}),
]


def test_all_types_depths_match_reference(ref_mods):
    all_mod, _ = ref_mods
    for inst, sub in GRAPHS:
        creator = all_mod.AllTypesMappingCreator(
            {k: set(v) for k, v in inst.items()},
            {k: set(v) for k, v in sub.items()})
        want = {qid: dict(d) for qid, d in creator.all_types_iterator()}
        got = {}
        for qid, seeds in inst.items():
            s = set(seeds) | sub.get(qid, set())
            got[qid] = entity_all_types(s, {k: set(v) for k, v in
                                            sub.items()}, {})
        assert got == want, (inst, sub)


def test_all_types_line_format(ref_mods):
    # line ordering matches the reference's (depth, cls) sort
    d = {"Q5": 0, "Q215627": 1, "Q35120": 2, "Q1": 1}
    line = format_all_types_line("E1", d)
    assert line == "E1\t0:Q5\t1:Q1\t1:Q215627\t2:Q35120"


def test_coref_type_pruning_matches_reference(ref_mods, tmp_path):
    _, coref_mod = ref_mods
    lines = [
        "E1\t0:Q5\t1:Q215627\t2:Q35120\t3:Q99\t4:Q100",  # coarse at 1
        "E2\t0:QX\t1:QY\t2:QZ\t3:QW\t4:QV\t5:QU",        # no coarse
        "E3\t0:Q43229\t1:Q4830453",                       # coarse at 0
        "E4\t0:QA",                                       # single level
        "E5",                                             # no types
        "E6\t0:QB\t1:Q215627\t1:QC\t2:QD\t3:QE\t4:QF",
    ]
    coarse = {"Q215627", "Q43229", "Q17334923"}
    # reference reads from settings.QID_TO_ALL_TYPES_FILE
    p = tmp_path / "all_types.tsv"
    p.write_text("\n".join(lines) + "\n")
    sys.modules["elevant.settings"].QID_TO_ALL_TYPES_FILE = str(p)
    want = coref_mod.extract_coreference_types(coarse)
    got = {}
    for line in lines:
        ts = extract_coref_types_line(line, coarse)
        if ts:
            got[line.split("\t", 1)[0]] = ts
    assert got == want


def test_query_runs_and_is_deterministic(ray_session):
    import pandas as pd

    import __ray_entry__ as m

    d1 = m.queries()["coref_types_mapping"]("/root/testdata/sf0.001")
    d1 = d1.to_pandas() if not isinstance(d1, pd.DataFrame) else d1
    d2 = m.queries()["coref_types_mapping"]("/root/testdata/sf0.001")
    d2 = d2.to_pandas() if not isinstance(d2, pd.DataFrame) else d2
    assert len(d1) > 0
    assert d1.reset_index(drop=True).equals(d2.reset_index(drop=True))
    # fixture sanity: Q1 is instance-of Q5 whose super chain hits the
    # coarse type person (Q215627) at depth 1
    row = d1[d1["qid"] == "Q1"]
    assert len(row) == 1 and "Q5" in row["types"].iloc[0]
