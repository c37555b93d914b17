"""Pluggable model-based NER actor stage.

The reference's primary linkers all start from a spaCy NER model loaded
once per process (``src/elevant/linkers/baseline_linker.py:34``,
``prior_linker.py:21``); the engine's alias/trie matchers are the
spaCy-free recast, but a user bringing a transformer or spaCy model
needs a stage whose model loads ONCE per actor and scores whole
batches.  ``ModelNERStage`` is that hook:

- ``model_loader`` is either a callable returning the model, or an
  ``"import.path:attr"`` string resolved inside the actor — the loader
  runs in ``__init__`` (once per actor, never per batch), so weights /
  pipelines / vocabularies amortize exactly like the reference's
  process-global spaCy load.  For GPU models pass ``num_gpus=…`` (and a
  matching ``concurrency``) through ``map_batches``; the stage itself is
  device-agnostic.
- The model contract is batched: ``model(texts: List[str]) ->
  List[List[dict]]`` with per-text mention dicts ``{begin, end,
  label}``.  Batched inference is the scale contract — a per-text
  Python call would serialize the GPU.
- ``ner_postprocess`` replicates the reference's NER postprocessor
  ("the "-prefix stripping, ``src/elevant/ner/ner_postprocessing.py:
  12-30``): a leading ``the``/``The`` token inside a predicted span is
  stripped from the span before linking.

No model libraries ship in this container, so ``fake_ner_model`` is the
deterministic stand-in used by tests and the contract query: it tags
every k-th whitespace token (k=13) plus every capitalized-run — real
plumbing (schema, actor signature, batching, postprocess) with a fake
brain, as SURVEY's multimodal stages do for decode.

A real model plugs in without code changes:
``model_loader="spacy:en_core_web_lg"`` loads the named spaCy pipeline
once per actor and batches through ``nlp.pipe`` — the same
load-once-score-many shape as the reference's process-global model
(``baseline_linker.py:34``).  When spaCy (or the named pipeline) is
absent the actor raises at construction — opt-in paths fail loudly,
they never silently fall back to the fake.

In-CI real-model evidence: ``elevant_ray/models/tiny_ner.py`` vendors
a REAL trained model (averaged-perceptron BIO tagger, deterministic
in-process training) wired through the same string-loader branch
(``model_loader="elevant_ray.models.tiny_ner:loader"``), so the
load-once-per-actor property and the learned-inference path run in
every CI environment, not just where spaCy is installed.
"""

from __future__ import annotations

import importlib
from typing import Callable, List, Optional, Union

import pyarrow as pa

NER_MENTION_STRUCT = pa.struct([
    ("begin", pa.int32()),
    ("end", pa.int32()),
    ("label", pa.string()),
])


def fake_ner_model(texts: List[str]) -> List[List[dict]]:
    """Deterministic fake NER: every 13th whitespace token (aligned to
    the synthetic corpus's hyperlink cadence) and every maximal run of
    capitalized tokens becomes a mention.  Pure function of the text —
    stable across partitioning and retries."""
    out: List[List[dict]] = []
    for text in texts:
        ments: List[dict] = []
        pos = 0
        run_start = -1
        toks = text.split(" ")
        for i, tok in enumerate(toks):
            begin, end = pos, pos + len(tok)
            pos = end + 1
            word = tok.strip(".,;:!?\"'()")
            is_cap = bool(word) and word[0].isupper()
            if is_cap and run_start < 0:
                run_start = begin + tok.index(word[0])
            if not is_cap and run_start >= 0:
                prev_end = begin - 1
                ments.append({"begin": run_start, "end": prev_end,
                              "label": "ENT"})
                run_start = -1
            if i % 13 == 7 and word and not is_cap:
                b = begin + tok.index(word[0])
                ments.append({"begin": b, "end": b + len(word),
                              "label": "TOK"})
        if run_start >= 0:
            ments.append({"begin": run_start, "end": len(text),
                          "label": "ENT"})
        ments.sort(key=lambda m: (m["begin"], m["end"]))
        out.append(ments)
    return out


def spacy_ner_loader(pipeline_name: str,
                     batch_size: int = 64) -> Callable:
    """Loader factory for ``model_loader="spacy:<pipeline>"``: imports
    spaCy and loads the named pipeline ONCE (inside the actor's
    ``__init__`` via ModelNERStage), returning a batched callable on
    ``nlp.pipe`` — entity char spans map directly onto the stage's
    mention contract.  Raises ImportError/OSError when spaCy or the
    pipeline is unavailable (callers opt in explicitly; tests
    ``importorskip``)."""
    import spacy  # noqa: F401 — hard dependency of this opt-in path

    nlp = spacy.load(pipeline_name)

    def model(texts: List[str]) -> List[List[dict]]:
        out: List[List[dict]] = []
        for doc in nlp.pipe(texts, batch_size=batch_size):
            out.append([{"begin": ent.start_char, "end": ent.end_char,
                         "label": ent.label_} for ent in doc.ents])
        return out

    return model


def ner_postprocess(text: str, begin: int, end: int) -> tuple:
    """Strip a leading "the " / "The " from a predicted span —
    reference parity: ``src/elevant/ner/ner_postprocessing.py:12-30``
    shrinks the span to exclude a leading article before linking."""
    span_text = text[begin:end]
    for art in ("the ", "The ", "THE "):
        if span_text.startswith(art) and len(span_text) > len(art):
            return begin + len(art), end
    return begin, end


class ModelNERStage:
    """Actor-pool ``map_batches`` stage: pages → NER mention rows.

    State (the model) loads once per actor in ``__init__``; ``__call__``
    runs batched inference and explodes mention rows
    ``(id, begin, end, mention, label)``.  Output spans are
    postprocessed (leading-article strip) unless ``postprocess=False``.
    """

    def __init__(self, model_loader: Optional[Union[str, Callable]] = None,
                 id_col: str = "url", text_col: str = "text",
                 postprocess: bool = True):
        if model_loader is None:
            self.model = fake_ner_model
        elif isinstance(model_loader, str):
            if model_loader.startswith("spacy:"):
                self.model = spacy_ner_loader(
                    model_loader.split(":", 1)[1])
            else:
                mod, attr = model_loader.rsplit(":", 1)
                self.model = getattr(importlib.import_module(mod),
                                     attr)()
        else:
            self.model = model_loader()
        self.id_col = id_col
        self.text_col = text_col
        self.postprocess = postprocess

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        per_text = self.model(texts)
        out_ids, begins, ends, ments, labels = [], [], [], [], []
        for rid, text, mentions in zip(ids, texts, per_text):
            for m in mentions:
                b, e = int(m["begin"]), int(m["end"])
                if self.postprocess:
                    b, e = ner_postprocess(text, b, e)
                if e <= b:
                    continue
                out_ids.append(rid)
                begins.append(b)
                ends.append(e)
                ments.append(text[b:e])
                labels.append(str(m.get("label", "ENT")))
        id_type = batch.schema.field(self.id_col).type
        return pa.table({
            self.id_col: pa.array(out_ids, id_type),
            "begin": pa.array(begins, pa.int64()),
            "end": pa.array(ends, pa.int64()),
            "mention": pa.array(ments, pa.string()),
            "label": pa.array(labels, pa.string())})
