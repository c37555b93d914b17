"""User-extension surface: stage registry + per-stage JSON config.

Mirrors the reference's extension points (§2.11 of SURVEY.md):

- the ``Linkers`` / ``CoreferenceLinkers`` / ``PredictionFormats`` enums
  plus the big if/elif factory (reference
  ``src/elevant/linkers/linkers.py:4-37`` and
  ``src/elevant/linkers/linking_system.py:84-216``), recast as a flat
  registry of :class:`StageSpec` entries keyed by ``(kind, name)``;
- the per-linker config convention ``configs/<name>.config.json`` with
  silent fallback to ``{}`` (``linking_system.py:62-79``) →
  :func:`read_stage_config`;
- the global config file with a ``data_directory`` key
  (``src/elevant/settings.py:8-28``) → :func:`read_global_config`
  (no ``exit(1)`` — a missing file is simply an empty config).

A registered stage is declarative: a factory that, given the merged
config dict, returns either

- a **batch-transform plan** ``(fn_or_class, map_batches_kwargs,
  init_kwargs)`` applied by :func:`apply_stage` via
  ``ds.map_batches(..., batch_format="pyarrow")`` (callable classes get
  ``concurrency`` so they run as actor pools — reference linkers hold
  tries/dicts per worker, ``link_text.py:83-87``), or
- for ``kind="reader"`` / ``kind="prediction_format"``, a **source
  callable** ``path -> Dataset`` returned as-is by :func:`build_reader`.

Custom user stages plug in with :func:`register_stage` (or the
``@stage(...)`` decorator) exactly like built-ins — the engine's analog
of subclassing ``AbstractEntityLinker.predict()``
(``linkers/abstract_entity_linker.py:15-40``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

KINDS = ("linker", "coref", "reader", "prediction_format", "blocker",
         "scorer", "sink")


@dataclass(frozen=True)
class StageSpec:
    """One pluggable pipeline stage (engine analog of a Linkers enum
    member + its factory branch in linking_system.py:84-216)."""

    name: str
    kind: str                       # one of KINDS
    factory: Callable[..., Any]     # (config: dict) -> plan | source fn
    description: str = ""
    defaults: Dict[str, Any] = field(default_factory=dict)

    def build(self, config: Optional[Dict[str, Any]] = None):
        merged = dict(self.defaults)
        merged.update(config or {})
        return self.factory(merged)


_REGISTRY: Dict[Tuple[str, str], StageSpec] = {}


def register_stage(spec: StageSpec) -> StageSpec:
    if spec.kind not in KINDS:
        raise ValueError(f"unknown stage kind {spec.kind!r}; "
                         f"expected one of {KINDS}")
    _REGISTRY[(spec.kind, spec.name)] = spec
    return spec


def stage(name: str, kind: str, description: str = "",
          defaults: Optional[Dict[str, Any]] = None):
    """Decorator form: ``@stage("my-linker", "linker")`` on a factory."""

    def wrap(factory):
        register_stage(StageSpec(name=name, kind=kind, factory=factory,
                                 description=description,
                                 defaults=dict(defaults or {})))
        return factory

    return wrap


def get_stage(name: str, kind: Optional[str] = None) -> StageSpec:
    if kind is not None:
        try:
            return _REGISTRY[(kind, name)]
        except KeyError:
            raise KeyError(f"no registered {kind} stage named {name!r}; "
                           f"known: {[n for k, n in _REGISTRY if k == kind]}")
    hits = [s for (k, n), s in _REGISTRY.items() if n == name]
    if not hits:
        raise KeyError(f"no registered stage named {name!r}")
    if len(hits) > 1:
        raise KeyError(f"stage name {name!r} is ambiguous across kinds "
                       f"{[s.kind for s in hits]}; pass kind=")
    return hits[0]


def list_stages(kind: Optional[str] = None) -> List[StageSpec]:
    return sorted((s for (k, _), s in _REGISTRY.items()
                   if kind is None or k == kind),
                  key=lambda s: (s.kind, s.name))


# ---------------------------------------------------------------------------
# Config loading (linking_system.py:62-79 / settings.py:8-28 semantics)
# ---------------------------------------------------------------------------

def read_stage_config(name: str, config_dir: str = "configs",
                      config_path: Optional[str] = None) -> Dict[str, Any]:
    """Load ``<config_dir>/<name>.config.json``; missing file → ``{}``
    (reference returns an empty config rather than failing,
    linking_system.py:69-72)."""
    if not config_path:
        config_path = os.path.join(config_dir, f"{name}.config.json")
    if not os.path.exists(config_path):
        return {}
    with open(config_path, "r", encoding="utf8") as f:
        return json.load(f)


def read_global_config(config_path: str = "configs/elevant.config.json",
                       ) -> Dict[str, Any]:
    """Global engine config (settings.py:8-14 shape, e.g.
    ``{"data_directory": ...}``); missing file → ``{}``."""
    if not os.path.exists(config_path):
        return {}
    with open(config_path, "r", encoding="utf8") as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# Applying stages to Datasets
# ---------------------------------------------------------------------------

def apply_stage(ds, name: str, kind: Optional[str] = None,
                config: Optional[Dict[str, Any]] = None, **overrides):
    """Resolve a registered transform stage and run it as
    ``ds.map_batches(..., batch_format="pyarrow")``.

    The spec's factory returns ``(fn_or_class, map_kwargs, init_kwargs)``.
    Callable classes run as actor pools (``concurrency`` defaulted to
    ``(2, 8)`` if the factory didn't set one); plain functions run as
    stateless tasks.  ``overrides`` patch the map_batches kwargs.
    """
    spec = get_stage(name, kind)
    if spec.kind in ("reader", "prediction_format", "sink"):
        raise TypeError(f"{spec.kind} stage {name!r} is not a batch "
                        "transform; use build_reader()/the sink directly")
    plan = spec.build(config)
    fn_or_class, map_kwargs, init_kwargs = _normalize_plan(plan)
    kwargs = dict(map_kwargs)
    kwargs.setdefault("batch_format", "pyarrow")
    if isinstance(fn_or_class, type):
        kwargs.setdefault("concurrency", (2, 8))
        kwargs["fn_constructor_kwargs"] = init_kwargs
    elif init_kwargs:
        kwargs["fn_kwargs"] = init_kwargs
    kwargs.update(overrides)
    return ds.map_batches(fn_or_class, **kwargs)


def _normalize_plan(plan):
    if callable(plan) and not isinstance(plan, tuple):
        return plan, {}, {}
    if len(plan) == 2:
        fn, map_kwargs = plan
        return fn, dict(map_kwargs), {}
    fn, map_kwargs, init_kwargs = plan
    return fn, dict(map_kwargs), dict(init_kwargs)


def build_reader(name: str, config: Optional[Dict[str, Any]] = None,
                 kind: str = "reader") -> Callable[[str], Any]:
    """Resolve a reader / prediction-format stage to a ``path -> Dataset``
    callable (engine analog of AbstractBenchmarkReader.article_iterator /
    AbstractPredictionReader, abstract_prediction_reader.py:24-58)."""
    spec = get_stage(name, kind)
    return spec.build(config)


# ---------------------------------------------------------------------------
# Built-in registrations (the engine's Linkers/CoreferenceLinkers/
# PredictionFormats population — linkers.py:4-37)
# ---------------------------------------------------------------------------

@stage("baseline", "linker",
       "Most-popular-candidate argmax over mention batches "
       "(baseline_linker.py:43-80)",
       defaults={"strategy": "wikidata"})
def _baseline_linker(config):
    from elevant_ray.stages.scoring import EntityScorer

    return (EntityScorer,
            {"batch_size": config.get("batch_size", 64)},
            {"alias_to_qids_ref": config["alias_to_qids_ref"],
             "popularity_ref": config["popularity_ref"],
             "strategy": config["strategy"],
             "drop_dates": config.get("drop_dates", True),
             "uppercase_only": config.get("uppercase_only", False)})


@stage("pos-prior", "linker",
       "Sliding-window link-frequency prior linker "
       "(prior_linker.py:80-196)")
def _prior_linker(config):
    from elevant_ray.stages.scoring import PriorLinkerStage

    return (PriorLinkerStage,
            {"batch_size": config.get("batch_size", 32)},
            {"link_freq_ref": config["link_freq_ref"],
             "aliases_ref": config.get("aliases_ref"),
             "id_col": config.get("id_col", "url"),
             "text_col": config.get("text_col", "text"),
             "uppercase": config.get("uppercase", False),
             "assume_nouns": config.get("assume_nouns", True)})


@stage("popular-entities", "linker",
       "Name-trie + sitelink-argmax linker "
       "(popular_entities_linker.py:55-260)",
       defaults={"min_score": 15})
def _popular_linker(config):
    from elevant_ray.stages.popular import PopularEntitiesStage

    return (PopularEntitiesStage,
            {"batch_size": config.get("batch_size", 32)},
            {"dims_ref": config["dims_ref"],
             "id_col": config.get("id_col", "url"),
             "text_col": config.get("text_col", "text"),
             "min_score": config["min_score"],
             "assume_nouns": config.get("assume_nouns", True)})


@stage("model-ner", "linker",
       "Pluggable model-NER actor stage: model loads once per actor "
       "via model_loader (spaCy-load parity, baseline_linker.py:34); "
       "batched inference contract, 'the '-strip postprocess "
       "(ner_postprocessing.py:12-30); deterministic fake model by "
       "default (no model libraries in this sandbox)")
def _model_ner(config):
    from elevant_ray.stages.model_ner import ModelNERStage

    return (ModelNERStage,
            {"batch_size": config.get("batch_size", 64)},
            {"model_loader": config.get("model_loader"),
             "id_col": config.get("id_col", "url"),
             "text_col": config.get("text_col", "text"),
             "postprocess": config.get("postprocess", True)})


@stage("kb-coref", "coref",
       "KB coreference: pronoun gender + 'the <type>' resolution "
       "(kb_coref_linker.py:201-315)")
def _kb_coref(config):
    from elevant_ray.stages.coref import KBCorefStage

    return (KBCorefStage,
            {"batch_size": config.get("batch_size", 32)},
            {"dims_ref": config.get("dims_ref"),
             "id_col": config.get("id_col", "url"),
             "text_col": config.get("text_col", "text"),
             "mentions_col": config.get("mentions_col", "mentions")})


@stage("jsonl", "reader",
       "Internal article-JSONL benchmark reader "
       "(our_jsonl_benchmark_reader.py:10-23)")
def _jsonl_reader(config):
    from elevant_ray.sources.jsonl import read_articles_jsonl

    return read_articles_jsonl


@stage("simple-jsonl", "reader",
       "{text, spans} JSONL reader with nested parent/child labels "
       "(simple_jsonl_benchmark_reader.py:18-86)")
def _simple_jsonl_reader(config):
    from elevant_ray.sources.jsonl import read_simple_jsonl

    def read(path):
        return read_simple_jsonl(path,
                                 title_to_qid=config.get("title_to_qid"))

    return read


@stage("aida-conll", "reader",
       "AIDA-CoNLL IOB TSV reader incl. train/dev/test splits "
       "(aida_conll_benchmark_reader.py:50-132)")
def _conll_reader(config):
    from elevant_ray.sources.conll import read_conll_benchmark

    def read(path):
        return read_conll_benchmark(path, split=config.get("split"))

    return read


@stage("nif", "reader",
       "NIF turtle-subset reader (nif_parser.py:27-80)")
def _nif_reader(config):
    from elevant_ray.sources.nif import read_nif

    return read_nif


@stage("tsv", "reader",
       "token/entity/IOB TSV reader (tsv_benchmark_reader.py:22-86)")
def _tsv_reader(config):
    from elevant_ray.sources.tsv import read_tsv_benchmark

    def read(path):
        return read_tsv_benchmark(path, uri_to_qid=config.get("uri_to_qid"))

    return read


@stage("pubtator", "reader",
       "PubTator abstract reader (pubtator_benchmark_reader.py:18-66)")
def _pubtator_reader(config):
    from elevant_ray.sources.tsv import read_pubtator_benchmark

    return read_pubtator_benchmark


@stage("simple-jsonl", "prediction_format",
       "Predictions in {text, spans} JSONL, joined to articles by "
       "doc_id/text prefix instead of order-zip "
       "(abstract_prediction_reader.py:40-153)")
def _simple_jsonl_predictions(config):
    from elevant_ray.sources.jsonl import read_simple_jsonl

    return read_simple_jsonl


@stage("nif", "prediction_format",
       "Predictions as NIF contexts (nif_prediction_reader)")
def _nif_predictions(config):
    from elevant_ray.sources.nif import read_nif

    return read_nif


def _external_prediction_format(fmt):
    def factory(config):
        from elevant_ray.sources.predictions import read_predictions

        def read(path):
            return read_predictions(
                path, fmt,
                title_to_qid=config.get("title_to_qid"),
                id_to_title=config.get("id_to_title"),
                redirects=config.get("redirects"),
                coref=config.get("coref", False),
                suffix=config.get("suffix"))

        return read

    return factory


register_stage(StageSpec(
    "ambiverse", "prediction_format", _external_prediction_format("ambiverse"),
    "Ambiverse JSON results, name-remap rule "
    "(ambiverse_prediction_reader.py:19-57)"))
register_stage(StageSpec(
    "wikifier", "prediction_format", _external_prediction_format("wikifier"),
    "Wikifier .full.xml results, ?-title page-id correction "
    "(wikifier_prediction_reader.py:20-95)"))
register_stage(StageSpec(
    "wexea", "prediction_format", _external_prediction_format("wexea"),
    "WEXEA [[target|text|type]] markup over rebuilt clean text "
    "(wexea_prediction_reader.py:23-58)"))


@stage("epgel", "prediction_format",
       "EPGEL paired input/output JSONL, top candidate wins "
       "(epgel_prediction_reader.py:15-46)")
def _epgel_predictions(config):
    from elevant_ray.sources.predictions import read_epgel_predictions

    def read(path):
        return read_epgel_predictions(path,
                                      input_path=config.get("input_path"))

    return read


@stage("oke", "reader",
       "OKE ttl reader: sameAs-resolved taIdentRefs "
       "(oke_benchmark_reader.py:19-97)")
def _oke_reader(config):
    from elevant_ray.sources.nif import read_oke

    def read(path):
        return read_oke(path, title_to_qid=config.get("title_to_qid"),
                        redirects=config.get("redirects"))

    return read


@stage("wikipedia", "reader",
       "Wikipedia pages: hyperlinks → gold labels with alpha-expanded "
       "spans (wikipedia_reader.py:11-36)")
def _wikipedia_reader(config):
    from elevant_ray.sources.xmlbench import hyperlinks_to_labels

    def read(pages_ds):
        return hyperlinks_to_labels(
            pages_ds, title_to_qid=config.get("title_to_qid"),
            redirects=config.get("redirects"))

    return read


@stage("xml", "reader",
       "ACE/MSNBC/AQUAINT XML benchmark reader "
       "(xml_benchmark_reader.py:27-133)")
def _xml_reader(config):
    from elevant_ray.sources.xmlbench import read_xml_benchmark

    def read(path):
        text_dir = config.get("text_dir")
        if text_dir is None:
            raise ValueError("xml reader needs config['text_dir']")
        return read_xml_benchmark(
            path, text_dir, title_to_qid=config.get("title_to_qid"),
            redirects=config.get("redirects"))

    return read


@stage("refined-jsonl", "reader",
       "ReFinED-JSONL benchmark reader "
       "(refined_jsonl_benchmark_reader.py:23-59)")
def _refined_reader(config):
    from elevant_ray.sources.xmlbench import read_refined_jsonl

    def read(path):
        return read_refined_jsonl(path,
                                  title_to_qid=config.get("title_to_qid"),
                                  redirects=config.get("redirects"))

    return read


@stage("newscrawl", "reader",
       "Newscrawl JSONL dump reader (newscrawl_dump_reader.py:19-32)")
def _newscrawl_reader(config):
    from elevant_ray.sources.xmlbench import read_newscrawl

    return read_newscrawl


@stage("tagme", "reader",
       "TagMe snippet+annotation benchmark reader "
       "(tagme_benchmark_reader.py:24-103)")
def _tagme_reader(config):
    from elevant_ray.sources.tsv import read_tagme_benchmark

    def read(path):
        # path = snippet file; annotation file from config or the
        # sibling naming convention
        ann = config.get("annotation_path")
        if ann is None:
            raise ValueError("tagme reader needs config['annotation_path']")
        return read_tagme_benchmark(
            path, ann, id_to_title=config.get("id_to_title"),
            title_to_qid=config.get("title_to_qid"),
            redirects=config.get("redirects"))

    return read
