"""The vendored trained NER model (elevant_ray/models/tiny_ner.py):
real-model CI evidence for the ModelNERStage real-loader branch —
deterministic training, learned generalization, the string-loader
plumbing, load-once-per-actor amortization, and the distributed
actor-pool run.
"""

from __future__ import annotations

import pyarrow as pa

from elevant_ray.stages.model_ner import ModelNERStage


def _mentions(model, text):
    return [text[m["begin"]:m["end"]] for m in model([text])[0]]


def test_training_is_deterministic():
    from elevant_ray.models.tiny_ner import _train

    w1 = _train().w
    w2 = _train().w
    assert w1 == w2
    assert sum(len(t) for t in w1.values()) > 50   # it actually learned


def test_learned_behavior_and_generalization():
    from elevant_ray.models.tiny_ner import loader

    model = loader()
    # in-lexicon entities
    assert _mentions(model, "reading about Kepler and Newton yesterday") \
        == ["Kepler", "Newton"]
    # multiword span
    assert _mentions(
        model, "Today the dog jumped over Grace Hopper quickly") \
        == ["Grace Hopper"]
    # GENERALIZATION: names never seen in training (shape features)
    assert _mentions(model, "the river near Zanzibar Fortress was quiet") \
        == ["Zanzibar Fortress"]
    # sentence-initial capitalization alone is NOT an entity
    assert _mentions(model, "The quick brown fox jumped") == []
    assert _mentions(model, "Yesterday it was raining near town") == []


def test_trains_once_per_process():
    """ModelNERStage calls the loader in __init__ (once per actor);
    the model must train once per process no matter how many stages
    or batches follow — the reference's process-global spaCy load
    (baseline_linker.py:34) recast."""
    from elevant_ray.models import tiny_ner

    s1 = ModelNERStage(
        model_loader="elevant_ray.models.tiny_ner:loader")
    n_after_first = tiny_ner.N_TRAINS
    assert n_after_first >= 1
    batch = pa.table({"url": ["u1"],
                      "text": ["visited Berlin with Ada Lovelace"]})
    s1(batch)
    s1(batch)
    s2 = ModelNERStage(
        model_loader="elevant_ray.models.tiny_ner:loader")
    s2(batch)
    assert tiny_ner.N_TRAINS == n_after_first   # cached, never retrained


def test_stage_contract_through_string_loader():
    stage = ModelNERStage(
        model_loader="elevant_ray.models.tiny_ner:loader")
    out = stage(pa.table({
        "url": ["u1", "u2"],
        "text": ["the fox saw Berlin before lunch",
                 "saw the Eiffel Tower at night"]}))
    rows = sorted(zip(out.column("url").to_pylist(),
                      out.column("mention").to_pylist()))
    assert ("u1", "Berlin") in rows
    # postprocess: leading article stripped from the predicted span
    assert any(u == "u2" and m.startswith("Eiffel") for u, m in rows)


def test_distributed_actor_pool_run(ray_session):
    """The real-loader branch under map_batches with an actor pool:
    deterministic output across two runs, spans index into the text."""
    import ray.data as rd

    texts = [f"doc {i} the fox met Ada Lovelace near Berlin today"
             for i in range(40)]
    ds = rd.from_arrow(pa.table({
        "url": pa.array([f"u{i}" for i in range(40)], pa.string()),
        "text": pa.array(texts, pa.string())}))

    def run():
        return sorted(
            ds.map_batches(
                ModelNERStage,
                fn_constructor_kwargs={
                    "model_loader":
                        "elevant_ray.models.tiny_ner:loader"},
                batch_format="pyarrow", concurrency=2,
                batch_size=8).take_all(),
            key=lambda r: (r["url"], r["begin"]))

    r1, r2 = run(), run()
    assert r1 == r2
    assert len(r1) >= 40
    by_url = {r["url"] for r in r1}
    assert len(by_url) == 40
    for r in r1[:10]:
        i = int(r["url"][1:])
        assert texts[i][r["begin"]:r["end"]] == r["mention"]
