"""TSV-family benchmark readers: IOB TSV span accumulation
(tsv_benchmark_reader.py:22-86) and PubTator abstracts
(pubtator_benchmark_reader.py:18-66)."""

from __future__ import annotations

from elevant_ray.sources.tsv import (parse_pubtator, parse_tsv,
                                     read_pubtator_benchmark,
                                     read_tsv_benchmark)

TSV = "\n".join([
    "The\tO\tO",
    "Eiffel\thttp://dbpedia.org/resource/Eiffel_Tower\tB",
    "Tower\thttp://dbpedia.org/resource/Eiffel_Tower\tI",
    "stands\tO\tO",
    "in\tO\tO",
    "Paris\thttp://dbpedia.org/resource/Paris\tB-LOC",
    "",
    "Second\tO\tO",
    "doc\tO\tO",
])


def test_parse_tsv_spans_and_text():
    arts = parse_tsv(TSV, {"http://dbpedia.org/resource/Eiffel_Tower": "Q243",
                           "http://dbpedia.org/resource/Paris": "Q90"})
    assert len(arts) == 2
    a = arts[0]
    assert a["text"] == "The Eiffel Tower stands in Paris"
    l0, l1 = a["labels"]
    # B opens at token start; I extends; span end excludes trailing space
    assert (l0["begin"], l0["end"]) == (4, 16)
    assert a["text"][l0["begin"]:l0["end"]] == "Eiffel Tower"
    assert l0["entity_id"] == "Q243"
    assert (l1["begin"], l1["end"]) == (27, 32)
    assert a["text"][l1["begin"]:l1["end"]] == "Paris"
    assert l1["entity_id"] == "Q90"
    assert arts[1]["text"] == "Second doc" and arts[1]["labels"] == []
    # doc ids dense from the offset
    assert [x["doc_id"] for x in arts] == [0, 1]


def test_parse_tsv_unmapped_reference_passthrough():
    arts = parse_tsv("X\tsome-ref\tB\n", None)
    assert arts[0]["labels"][0]["entity_id"] == "some-ref"


PUBTATOR = "\n".join([
    "123|t|A title here",
    "123|a|The abstract mentions anemia twice: anemia.",
    "123\t35\t41\tanemia\tDisease\tD000740",
    "123\t49\t55\tanemia\tDisease\tMESH:D000740",
    "",
    "456|t|Short",
    "456|a|Body text.",
    "",
])


def test_parse_pubtator():
    arts = parse_pubtator(PUBTATOR)
    assert len(arts) == 2
    a = arts[0]
    assert a["title"] == "A title here"
    assert a["text"] == "A title here\nThe abstract mentions anemia twice: anemia."
    l0, l1 = a["labels"]
    # MESH: prefix auto-added when missing (reference NCBI quirk)
    assert l0["entity_id"] == "MESH:D000740"
    assert l1["entity_id"] == "MESH:D000740"
    assert a["text"][l0["begin"]:l0["end"]] == "anemia"
    assert arts[1]["text"] == "Short\nBody text."


def test_readers_datasets(ray_session, tmp_path):
    p1 = tmp_path / "a.tsv"
    p1.write_text(TSV + "\n")
    ds = read_tsv_benchmark(str(p1), {"http://dbpedia.org/resource/Paris": "Q90"})
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [0, 1]
    assert rows[0]["labels"][1]["entity_id"] == "Q90"

    # directory of shards: doc_id offsets continue across sorted files
    d = tmp_path / "shards"
    d.mkdir()
    (d / "0.pubtator").write_text(PUBTATOR)
    (d / "1.pubtator").write_text(PUBTATOR)
    ds2 = read_pubtator_benchmark(str(d))
    rows2 = sorted(ds2.take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows2] == [0, 1, 2, 3]
    assert rows2[2]["title"] == "A title here"


def test_tsv_differential_vs_reference(reference_extractor, tmp_path):
    """Differential check of parse_tsv against the REFERENCE TsvBenchmarkReader
    semantics run directly (reader loaded stand-alone with stubbed deps)."""
    import importlib.util
    import sys
    import types
    from pathlib import Path

    ref = Path("/root/reference/src/elevant/benchmark_readers/tsv_benchmark_reader.py")
    # Stub the reference import graph: Article/GroundtruthLabel shims that
    # record exactly what the reader sets.
    class _Article:
        def __init__(self, id, title, text, labels):
            self.id, self.title, self.text, self.labels = id, title, text, labels

    class _Label:
        def __init__(self, label_id, span, entity_id, name):
            self.id, self.span, self.entity_id, self.name = \
                label_id, span, entity_id, name
            self.parent, self.children = None, []

    class _KBMapper:
        @staticmethod
        def get_wikidata_qid(ref_, db, verbose=False):
            return {"uriA": "Q1", "uriB": "Q2"}.get(ref_, ref_)

        @staticmethod
        def is_unknown_entity(x):
            return False

    class _Nested:
        @staticmethod
        def assign_parent_and_child_ids(labels):
            pass

    mods = {
        "elevant": types.ModuleType("elevant"),
        "elevant.benchmark_readers": types.ModuleType("elevant.benchmark_readers"),
        "elevant.benchmark_readers.abstract_benchmark_reader":
            types.ModuleType("elevant.benchmark_readers.abstract_benchmark_reader"),
        "elevant.evaluation": types.ModuleType("elevant.evaluation"),
        "elevant.evaluation.groundtruth_label":
            types.ModuleType("elevant.evaluation.groundtruth_label"),
        "elevant.models": types.ModuleType("elevant.models"),
        "elevant.models.article": types.ModuleType("elevant.models.article"),
        "elevant.models.entity_database":
            types.ModuleType("elevant.models.entity_database"),
        "elevant.utils": types.ModuleType("elevant.utils"),
        "elevant.utils.knowledge_base_mapper":
            types.ModuleType("elevant.utils.knowledge_base_mapper"),
        "elevant.utils.nested_groundtruth_handler":
            types.ModuleType("elevant.utils.nested_groundtruth_handler"),
    }
    mods["elevant.benchmark_readers.abstract_benchmark_reader"].AbstractBenchmarkReader = object
    mods["elevant.evaluation.groundtruth_label"].GroundtruthLabel = _Label
    mods["elevant.models.article"].Article = _Article
    mods["elevant.models.entity_database"].EntityDatabase = object
    mods["elevant.utils.knowledge_base_mapper"].KnowledgeBaseMapper = _KBMapper
    mods["elevant.utils.nested_groundtruth_handler"].NestedGroundtruthHandler = _Nested
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("_ref_tsv", ref)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        content = "\n".join([
            "Alpha\turiA\tB",
            "beta\turiA\tI",
            "gamma\tO\tO",
            "",
            "Delta\turiB\tB-x",
            "eps\tO\tO",
        ]) + "\n"
        f = tmp_path / "ref.tsv"
        f.write_text(content)
        reader = mod.TsvBenchmarkReader(None, str(f))
        ref_arts = list(reader.article_iterator())
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    ours = parse_tsv(content, {"uriA": "Q1", "uriB": "Q2"})
    assert len(ours) == len(ref_arts)
    for mine, theirs in zip(ours, ref_arts):
        assert mine["text"] == theirs.text
        assert [(l["begin"], l["end"], l["entity_id"]) for l in mine["labels"]] \
            == [(l.span[0], l.span[1], l.entity_id) for l in theirs.labels]
