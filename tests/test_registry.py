"""User-extension surface: stage registry, config loading, apply_stage
(engine analog of Linkers enums + linking_system factory + per-linker
configs — linkers.py:4-37, linking_system.py:62-216, settings.py:8-28)."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from elevant_ray import registry as reg


def test_builtins_registered():
    names = {(s.kind, s.name) for s in reg.list_stages()}
    assert ("linker", "baseline") in names
    assert ("linker", "pos-prior") in names
    assert ("linker", "popular-entities") in names
    assert ("coref", "kb-coref") in names
    assert ("reader", "jsonl") in names
    assert ("reader", "simple-jsonl") in names
    assert ("reader", "aida-conll") in names
    assert ("reader", "nif") in names
    assert ("prediction_format", "simple-jsonl") in names
    assert ("prediction_format", "nif") in names


def test_get_stage_by_kind_and_ambiguity():
    # "nif" exists as both reader and prediction_format → must pass kind.
    with pytest.raises(KeyError, match="ambiguous"):
        reg.get_stage("nif")
    assert reg.get_stage("nif", "reader").kind == "reader"
    with pytest.raises(KeyError, match="no registered"):
        reg.get_stage("no-such-stage")
    with pytest.raises(KeyError, match="no registered"):
        reg.get_stage("baseline", "coref")


def test_register_rejects_unknown_kind():
    with pytest.raises(ValueError, match="unknown stage kind"):
        reg.register_stage(reg.StageSpec("x", "not-a-kind", lambda c: None))


def test_config_loading(tmp_path):
    # Missing file → {} (linking_system.py:69-72 semantics).
    assert reg.read_stage_config("ghost", config_dir=str(tmp_path)) == {}
    p = tmp_path / "mylinker.config.json"
    p.write_text(json.dumps({"min_score": 3, "flag": True}))
    assert reg.read_stage_config("mylinker", config_dir=str(tmp_path)) == {
        "min_score": 3, "flag": True}
    # Explicit path wins over the directory convention.
    assert reg.read_stage_config("other", config_path=str(p))["min_score"] == 3
    # Global config: missing → {}.
    assert reg.read_global_config(str(tmp_path / "nope.json")) == {}
    g = tmp_path / "elevant.config.json"
    g.write_text(json.dumps({"data_directory": "/data"}))
    assert reg.read_global_config(str(g)) == {"data_directory": "/data"}


def test_defaults_merge_with_config():
    spec = reg.get_stage("popular-entities", "linker")
    captured = {}

    # Factory sees defaults overlaid by the explicit config.
    class FakeRef:
        pass

    plan = spec.build({"dims_ref": None, "batch_size": 7})
    _, map_kwargs, init_kwargs = reg._normalize_plan(plan)
    assert init_kwargs["min_score"] == 15          # default
    assert map_kwargs["batch_size"] == 7           # override
    plan2 = spec.build({"dims_ref": None, "min_score": 99})
    _, _, init2 = reg._normalize_plan(plan2)
    assert init2["min_score"] == 99


def test_custom_stateless_stage_applies(ray_session):
    ray = ray_session

    @reg.stage("shout", "scorer", "uppercase text (test stage)")
    def _shout(config):
        suffix = config.get("suffix", "")

        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            up = pc.utf8_upper(batch.column("text"))
            if suffix:
                up = pc.binary_join_element_wise(
                    up, pa.scalar(suffix), "")
            return batch.set_column(
                batch.schema.get_field_index("text"), "text", up)

        return fn

    ds = ray.data.from_arrow(pa.table({"text": ["ab", "cd", "ef"]}))
    out = reg.apply_stage(ds, "shout", config={"suffix": "!"})
    texts = sorted(r["text"] for r in out.take_all())
    assert texts == ["AB!", "CD!", "EF!"]


def test_custom_actor_stage_applies(ray_session):
    ray = ray_session

    class AddTagStage:
        def __init__(self, tag: str):
            self.tag = tag

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "tag", pa.array([self.tag] * batch.num_rows))

    @reg.stage("tagger", "scorer", "actor-pool tag stage (test)")
    def _tagger(config):
        return (AddTagStage, {"batch_size": 2,
                              "concurrency": (1, 2)},
                {"tag": config.get("tag", "t")})

    ds = ray.data.from_arrow(pa.table({"x": list(range(6))}))
    out = reg.apply_stage(ds, "tagger", config={"tag": "hello"})
    rows = out.take_all()
    assert len(rows) == 6 and all(r["tag"] == "hello" for r in rows)


def test_registry_linker_matches_direct_stage(ray_session, tmp_path):
    """popular-entities via the registry == calling the stage directly."""
    ray = ray_session
    from elevant_ray.stages.popular import PopularEntitiesStage

    dims = {
        "name_to_qids": {"Berlin": {"Q64"}, "Albert Einstein": {"Q937"}},
        "alias_to_qids": {"Einstein": {"Q937"}},
        "sitelinks": {"Q64": 200, "Q937": 300},
    }
    dims_ref = ray.put(dims)
    tbl = pa.table({
        "url": ["u1", "u2"],
        "text": ["Albert Einstein visited Berlin.",
                 "Einstein wrote to Berlin twice."],
    })

    via_registry = reg.apply_stage(
        ray.data.from_arrow(tbl), "popular-entities", kind="linker",
        config={"dims_ref": dims_ref}, concurrency=(1, 2))
    direct = ray.data.from_arrow(tbl).map_batches(
        PopularEntitiesStage, batch_format="pyarrow",
        concurrency=(1, 2), fn_constructor_kwargs={"dims_ref": dims_ref})

    key = lambda r: (r["url"], r["begin"], r["end"])
    a = sorted(via_registry.take_all(), key=key)
    b = sorted(direct.take_all(), key=key)
    assert a == b and len(a) > 0


def test_build_reader_simple_jsonl(tmp_path):
    p = tmp_path / "bench.jsonl"
    p.write_text(json.dumps({
        "text": "Berlin is big.",
        "labels": [{"start_char": 0, "end_char": 6,
                    "entity_reference":
                        "http://www.wikidata.org/entity/Q64"}]}) + "\n")
    read = reg.build_reader("simple-jsonl")
    ds = read(str(p))
    rows = ds.take_all()
    assert len(rows) == 1
    assert rows[0]["labels"][0]["entity_id"] == "Q64"


def test_transform_kinds_reject_reader_apply(ray_session):
    ray = ray_session
    ds = ray.data.from_arrow(pa.table({"x": [1]}))
    with pytest.raises(TypeError, match="not a batch"):
        reg.apply_stage(ds, "jsonl", kind="reader")
