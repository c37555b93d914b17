"""A tiny REAL trained NER model for the model-NER stage's CI evidence.

The reference's linkers load a spaCy pipeline once per process
(``src/elevant/linkers/baseline_linker.py:34``); the engine's
``ModelNERStage`` (stages/model_ner.py) reproduces that shape as an
actor-pool stage whose ``model_loader`` runs once per actor.  This
sandbox has no spaCy and no network, so the real-loader branch used to
be exercised only by a stubbed module + an opt-in skip.  This module
closes that gap with an honest-to-goodness LEARNED model that trains
deterministically in-process in well under a second:

- an averaged-perceptron BIO tagger (Collins 2002 — the classic
  structured-perceptron recipe spaCy's own tagger descends from) over
  shape/affix/context features,
- trained on a deterministic synthetic corpus (fixed seed, entity
  lexicon + filler vocabulary) generated below — no data files, no
  downloads, bit-identical weights on every build,
- inference is greedy per-token decoding over whitespace tokens with
  char-offset tracking, batched to match the stage contract
  ``model(texts) -> List[List[{begin, end, label}]]``.

It is deliberately small (a few hundred feature weights), but it is a
real model: weights come from mistakes on training data, it
generalizes to capitalized names it never saw (shape features), and it
learns that sentence-initial capitalization alone is not an entity.
``loader`` is the ``model_loader="elevant_ray.models.tiny_ner:loader"``
hook; the module-level ``N_TRAINS`` counter lets tests assert the
train-once-per-process (= once per actor) amortization property.
"""

from __future__ import annotations

import random
from typing import Dict, List, Tuple

LABEL = "ENT"

# -- deterministic training corpus ----------------------------------

_ENTITY_WORDS = [
    "Berlin", "Paris", "Tokyo", "Ada", "Grace", "Alan", "Turing",
    "Hopper", "Lovelace", "Acme", "Widget", "Nile", "Congo", "Everest",
    "Mars", "Luna", "Kepler", "Newton", "Darwin", "Tesla",
]
_FILLER = [
    "the", "a", "quick", "brown", "fox", "jumped", "over", "lazy",
    "dog", "while", "reading", "about", "rivers", "and", "mountains",
    "yesterday", "morning", "with", "great", "interest", "before",
    "lunch", "it", "was", "raining", "heavily", "near", "town",
]
_SENT_STARTERS = ["The", "Today", "Yesterday", "Meanwhile", "Suddenly"]


def _training_sentences(n: int = 240,
                        seed: int = 13) -> List[Tuple[List[str], List[str]]]:
    """(words, BIO tags) pairs: filler runs with planted 1-3-word
    capitalized entities; half the sentences open with a capitalized
    non-entity starter so capitalization at position 0 is ambiguous
    and must be disambiguated by learned context features."""
    rng = random.Random(seed)
    out = []
    for k in range(n):
        words: List[str] = []
        tags: List[str] = []
        if k % 2 == 0:
            words.append(rng.choice(_SENT_STARTERS))
            tags.append("O")
        for _ in range(rng.randint(1, 3)):
            for _ in range(rng.randint(1, 4)):
                words.append(rng.choice(_FILLER))
                tags.append("O")
            ent = rng.sample(_ENTITY_WORDS, rng.randint(1, 3))
            words.extend(ent)
            tags.extend(["B"] + ["I"] * (len(ent) - 1))
        for _ in range(rng.randint(1, 3)):
            words.append(rng.choice(_FILLER))
            tags.append("O")
        words.append(".")
        tags.append("O")
        out.append((words, tags))
    return out


# -- features + averaged perceptron ---------------------------------

def _shape(w: str) -> str:
    if w.isupper():
        return "AA"
    if w[:1].isupper():
        return "Aa"
    if w.isdigit():
        return "00"
    return "aa"


def _features(words: List[str], i: int, prev_tag: str) -> List[str]:
    w = words[i]
    pw = words[i - 1] if i else "<s>"
    nw = words[i + 1] if i + 1 < len(words) else "</s>"
    return [
        "bias",
        f"w={w.lower()}",
        f"suf2={w[-2:].lower()}",
        f"shape={_shape(w)}",
        f"first={i == 0}",
        f"pshape={_shape(pw) if i else '<s>'}",
        f"nshape={_shape(nw) if i + 1 < len(words) else '</s>'}",
        f"pw={pw.lower()}",
        f"ptag={prev_tag}",
        f"shape+ptag={_shape(w)}|{prev_tag}",
        f"shape+first={_shape(w)}|{i == 0}",
    ]


_TAGS = ("O", "B", "I")


class _Perceptron:
    def __init__(self):
        self.w: Dict[str, Dict[str, float]] = {t: {} for t in _TAGS}

    def score(self, feats: List[str], tag: str) -> float:
        wt = self.w[tag]
        return sum(wt.get(f, 0.0) for f in feats)

    def predict(self, feats: List[str]) -> str:
        # deterministic argmax: score, then fixed tag order
        return max(_TAGS, key=lambda t: (self.score(feats, t),
                                         -_TAGS.index(t)))


def _train(epochs: int = 5) -> _Perceptron:
    """Averaged perceptron on gold-history features (MEMM-style
    training, greedy decoding at inference)."""
    data = _training_sentences()
    model = _Perceptron()
    totals: Dict[str, Dict[str, float]] = {t: {} for t in _TAGS}
    stamps: Dict[str, Dict[str, int]] = {t: {} for t in _TAGS}
    step = 0

    def bump(tag: str, feats: List[str], delta: float):
        wt, tot, st = model.w[tag], totals[tag], stamps[tag]
        for f in feats:
            tot[f] = tot.get(f, 0.0) \
                + (step - st.get(f, 0)) * wt.get(f, 0.0)
            st[f] = step
            wt[f] = wt.get(f, 0.0) + delta

    rng = random.Random(7)
    for _ in range(epochs):
        rng.shuffle(data)
        for words, tags in data:
            prev = "<t>"
            for i, gold in enumerate(tags):
                feats = _features(words, i, prev)
                pred = model.predict(feats)
                if pred != gold:
                    bump(gold, feats, 1.0)
                    bump(pred, feats, -1.0)
                step += 1
                prev = gold
    # average: final weight = accumulated total / steps
    for t in _TAGS:
        wt, tot, st = model.w[t], totals[t], stamps[t]
        for f, v in wt.items():
            wt[f] = (tot.get(f, 0.0) + (step - st.get(f, 0)) * v) / step
    return model


# -- inference -------------------------------------------------------

def _tokenize(text: str) -> List[Tuple[int, int]]:
    spans, pos = [], 0
    for tok in text.split(" "):
        if tok:
            spans.append((pos, pos + len(tok)))
        pos += len(tok) + 1
    return spans


def _tag_text(model: _Perceptron, text: str) -> List[dict]:
    spans = _tokenize(text)
    words = [text[b:e] for b, e in spans]
    ments: List[dict] = []
    prev = "<t>"
    cur = None          # (begin, end) of the open mention
    for i, (b, e) in enumerate(spans):
        tag = model.predict(_features(words, i, prev))
        if tag == "B":
            if cur:
                ments.append({"begin": cur[0], "end": cur[1],
                              "label": LABEL})
            cur = (b, e)
        elif tag == "I" and cur:
            cur = (cur[0], e)
        else:
            if cur:
                ments.append({"begin": cur[0], "end": cur[1],
                              "label": LABEL})
                cur = None
            tag = "O"   # stray I without an open mention degrades to O
        prev = tag
    if cur:
        ments.append({"begin": cur[0], "end": cur[1], "label": LABEL})
    return ments


_MODEL: _Perceptron = None
N_TRAINS = 0            # test hook: train-once-per-process property


def loader():
    """``model_loader="elevant_ray.models.tiny_ner:loader"`` — trains
    (once per process; ModelNERStage calls this in ``__init__``, so
    once per actor) and returns the batched model callable."""
    global _MODEL, N_TRAINS
    if _MODEL is None:
        _MODEL = _train()
        N_TRAINS += 1
    model = _MODEL

    def batched(texts: List[str]) -> List[List[dict]]:
        return [_tag_text(model, t) for t in texts]

    return batched
