"""Evaluation-kernel parity tests.

Factor-recursion scenarios are the reference's doctests
(``case_generator.py:218-286``) re-expressed on the engine's dict-based
labels; the oracle invariant (gold copied as predictions ⇒ P=R=F1=1)
mirrors ``evaluation-results/oracle/oracle.aida-conll-test.eval_results
.json`` (tp=4484, fp=0, fn=0) and ``oracle_linker.py:6-39``.
"""

from __future__ import annotations

from elevant_ray.stages.evaluation import (
    IGNORED, REQUIRED, count_cases, determine_factors, evaluate_document,
    f1_dict, results_from_counts,
)


def L(id, begin, end, entity_id, parent=None, children=None, **kw):
    return {"id": id, "begin": begin, "end": end, "entity_id": entity_id,
            "name": kw.pop("name", entity_id), "parent": parent,
            "children": children or [], "optional": kw.pop("optional", False),
            "type": kw.pop("type", "OTHER"), "coref": kw.pop("coref", None),
            "desc": kw.pop("desc", False)}


def P(begin, end, entity_id, candidates=None):
    return {"begin": begin, "end": end, "entity_id": entity_id,
            "candidates": candidates or [], "linked_by": "test"}


TEXT = "aa, bb, cc"


def _factors(labels, preds):
    pred_map = {(p["begin"], p["end"]): p for p in preds}
    return sorted(determine_factors(TEXT, labels, pred_map).items())


# --- the four reference doctest scenarios (case_generator.py:218-286) ---

def test_factor_child_detected():
    labels = [L(1, 0, 10, "Q1", children=[2]), L(2, 0, 2, "Q2", parent=1)]
    assert _factors(labels, [P(0, 2, "Q2")]) == [(1, 0), (2, 1)]


def test_factor_unknown_matches_unknown():
    labels = [L(1, 0, 10, "Q1", children=[2]), L(2, 0, 2, "<NIL>", parent=1)]
    assert _factors(labels, [P(0, 2, "<NIL>")]) == [(1, 0), (2, 1)]


def test_factor_nested_forest():
    labels = [
        L(1, 0, 10, "Q1", children=[2, 5]),
        L(2, 0, 2, "Q2", parent=1, children=[3]),
        L(3, 0, 2, "Q3", parent=2, children=[4]),
        L(4, 0, 2, "Q4", parent=3),
        L(5, 4, 10, "Q5", parent=1, children=[6, 7]),
        L(6, 4, 6, "Q6", parent=5, children=[8]),
        L(7, 8, 10, "Q7", parent=5),
        L(8, 4, 6, "Q8", parent=6),
    ]
    preds = [P(0, 2, "Q3"), P(4, 6, "Q8"), P(8, 10, "Q7")]
    assert _factors(labels, preds) == \
        [(1, 0), (2, 0), (3, 1), (5, 0), (6, 0), (7, 1), (8, 1)]


def test_factor_single_undetected_root():
    labels = [L(1, 0, 10, "Q1")]
    assert _factors(labels, []) == [(1, 1)]


# --- eval-type matrix / counting ---

def _counts(labels, preds, text=TEXT):
    cases = evaluate_document(text, labels, preds)
    return count_cases(cases), cases


def test_oracle_predictions_give_perfect_f1():
    text = "Berlin is big. Paris too, in 1990."
    labels = [L(1, 0, 6, "Q64", name="Berlin"),
              L(2, 15, 20, "Q90", name="Paris")]
    preds = [P(0, 6, "Q64"), P(15, 20, "Q90")]
    counts, _ = _counts(labels, preds, text)
    res = results_from_counts(counts)
    for mode in (IGNORED, REQUIRED):
        d = res[mode]["mention_types"]["all"]
        assert (d["precision"], d["recall"], d["f1"]) == (1, 1, 1), (mode, d)
        assert d["true_positives"] == 2


def test_wrong_entity_is_fn_plus_fp():
    text = "Berlin is big."
    labels = [L(1, 0, 6, "Q64", name="Berlin")]
    preds = [P(0, 6, "Q999")]
    counts, cases = _counts(labels, preds, text)
    assert cases[0]["linking_eval_types"][IGNORED] == ["FN", "FP"]
    assert cases[0]["ner_eval_types"][IGNORED] == ["TP"]
    assert counts[(IGNORED, "all", "fn")] == 1
    assert counts[(IGNORED, "all", "fp")] == 1
    assert counts[(IGNORED, "ner", "tp")] == 1


def test_false_detection_counts_fp():
    text = "Berlin is big."
    labels = []
    preds = [P(0, 6, "Q64")]
    counts, cases = _counts(labels, preds, text)
    assert counts[(IGNORED, "all", "fp")] == 1
    assert counts[(REQUIRED, "all", "fp")] == 1


def test_nil_false_detection_ignored_mode():
    # unk prediction with no gt: FP only in REQUIRED mode (case.py:147-152)
    text = "Berlin is big."
    counts, _ = _counts([], [P(0, 6, "<NIL>")], text)
    assert counts[(IGNORED, "all", "fp")] == 0
    assert counts[(REQUIRED, "all", "fp")] == 1


def test_undetected_unknown_gt():
    # unk gt, no prediction: FN only in REQUIRED (case.py:165-171)
    text = "Berlin is big."
    counts, _ = _counts([L(1, 0, 6, "<NIL>")], [], text)
    assert counts[(IGNORED, "all", "fn")] == 0
    assert counts[(REQUIRED, "all", "fn")] == 1


def test_unk_gt_unk_pred_is_tp_required():
    # unk / unk: TP in REQUIRED, nothing in IGNORED (case.py:217-222)
    text = "Berlin is big."
    counts, _ = _counts([L(1, 0, 6, "<NIL>")], [P(0, 6, "<NO_MAPPING>")], text)
    assert counts[(REQUIRED, "all", "tp")] == 1
    assert counts[(IGNORED, "all", "tp")] == 0


def test_optional_gt_no_prediction_no_case():
    text = "Berlin is big."
    counts, _ = _counts([L(1, 0, 6, "Q64", optional=True)], [], text)
    for mode in (IGNORED, REQUIRED):
        for kind in ("tp", "fp", "fn"):
            assert counts[(mode, "all", kind)] == 0


def test_optional_gt_wrong_prediction_is_fp():
    text = "Berlin is big."
    counts, _ = _counts([L(1, 0, 6, "Q64", optional=True)], [P(0, 6, "Q999")], text)
    assert counts[(IGNORED, "all", "fp")] == 1
    assert counts[(IGNORED, "all", "fn")] == 0


def test_quantity_gt_is_optional_and_type_match_ok():
    text = "He won 42 games."
    labels = [L(1, 7, 9, "Q_num", type="QUANTITY", name="42")]
    qm = {"quantities": {"Q_other_num"}}
    cases = evaluate_document(text, labels, [P(7, 9, "Q_other_num")], qid_meta=qm)
    # QUANTITY gt + QUANTITY pred: correct → no linking eval types
    assert cases[0]["linking_eval_types"][IGNORED] == []
    assert cases[0]["linking_eval_types"][REQUIRED] == []


def test_word_boundary_span_match():
    # prediction at (0,6) "Albert", gold at (0,8) "Albert's" — expanded
    # prediction span matches the gold span
    text = "Albert's birthplace is Ulm."
    labels = [L(1, 0, 8, "Q937", name="Albert")]
    counts, cases = _counts(labels, [P(0, 6, "Q937")], text)
    assert counts[(IGNORED, "all", "tp")] == 1


def test_evaluation_span_clips_fp():
    text = "Berlin is big. Paris too."
    cases = evaluate_document(text, [], [P(0, 6, "Q64"), P(15, 20, "Q90")],
                              evaluation_span=(0, 10))
    # only the first prediction lies inside the evaluation span
    assert len(cases) == 1 and cases[0]["span"] == (0, 6)


def test_child_fn_propagates_to_root():
    # root factor 0 via detected child; child FN propagates up on
    # re-evaluation (case_generator.py:162-210)
    text = "aa, bb, cc"
    labels = [L(1, 0, 10, "Q1", children=[2, 3]),
              L(2, 0, 2, "Q2", parent=1),
              L(3, 4, 6, "Q3", parent=1)]
    preds = [P(0, 2, "Q2"), P(4, 6, "Q999")]
    counts, cases = _counts(labels, preds, text)
    root = next(c for c in cases if c["label_id"] == 1)
    assert root["factor"] == 0
    assert root["linking_eval_types"][IGNORED] == ["FN"]
    # counting: root TP/FN counted (parent is None), children skipped
    assert counts[(IGNORED, "all", "fn")] == 1
    assert counts[(IGNORED, "all", "tp")] == 0


def test_all_children_correct_root_tp():
    text = "aa, bb, cc"
    labels = [L(1, 0, 10, "Q1", children=[2, 3]),
              L(2, 0, 2, "Q2", parent=1),
              L(3, 4, 6, "Q3", parent=1)]
    preds = [P(0, 2, "Q2"), P(4, 6, "Q3")]
    counts, cases = _counts(labels, preds, text)
    root = next(c for c in cases if c["label_id"] == 1)
    assert root["linking_eval_types"][IGNORED] == ["TP"]
    assert counts[(IGNORED, "all", "tp")] == 1


def test_mention_type_categories_counted():
    text = "He lives in Berlin."
    labels = [L(1, 0, 2, "Q937", name="Albert", coref=True),
              L(2, 12, 18, "Q64", name="Berlin")]
    preds = [P(0, 2, "Q937"), P(12, 18, "Q64")]
    counts, _ = _counts(labels, preds, text)
    assert counts[(IGNORED, "coref_pronominal", "tp")] == 1
    assert counts[(IGNORED, "entity_named", "tp")] == 1
    assert counts[(IGNORED, "coref", "tp")] == 1


def test_f1_dict_zero_guards():
    d = f1_dict(0, 0, 0)
    assert d["precision"] == 0 and d["recall"] == 0 and d["f1"] == 0


def test_query_real_span_geometry(ray_session):
    """Round-1 verdict item: `linking_eval_counts` must evaluate at the
    REAL mention spans from the extracted text, not fabricated ones.
    Predictions sit at the same real spans as the gold hyperlinks, so
    NER tp must equal the total scored-mention count from
    `entity_linking` (every predicted span matches a gold span in the
    real page text), and disambiguation must split into correct+wrong
    exactly covering the same total."""
    import pandas as pd

    import __ray_entry__ as m

    sf = "/root/testdata/sf0.001"
    df = m.queries()["linking_eval_counts"](sf)
    df = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
    linked = m.queries()["entity_linking"](sf)
    n_mentions = (len(linked) if isinstance(linked, pd.DataFrame)
                  else linked.num_rows)
    assert n_mentions > 0

    def val(mode, category, kind):
        r = df[(df["mode"] == mode) & (df["category"] == category)
               & (df["kind"] == kind)]
        return int(r["value"].iloc[0]) if len(r) else 0

    for mode in ("IGNORED", "REQUIRED"):
        assert val(mode, "ner", "tp") == n_mentions
        tp = val(mode, "all", "tp")
        fn = val(mode, "all", "fn")
        assert tp + fn == n_mentions  # every gold label is evaluated
        assert val(mode, "error:DISAMBIGUATION_CORRECT", "count") == tp
        assert val(mode, "error:DISAMBIGUATION_WRONG", "count") == fn


def test_query_label_shape_nested_and_boundary():
    """The exact label/prediction construction the contract query uses
    (assign_parent_child over span containment + evaluate_document on
    real text) handles nested labels and word-boundary-expanded spans:
    a child inside a correct-at-boundary parent is not double-counted,
    and a prediction at the unexpanded span still matches the
    boundary-expanded gold span."""
    from elevant_ray.functions.errors import label_errors
    from elevant_ray.sources.jsonl import assign_parent_child

    text = "The Albert Einstein Institute sits in Berlin."
    # gold: outer span over "Albert Einstein Institute", nested inner
    # over "Albert Einstein"; third gold at "Berli" (needs boundary
    # expansion to "Berlin." word edge to meet the prediction)
    labels = [
        {"id": 0, "begin": 4, "end": 29, "entity_id": "Q1",
         "name": "Q1", "parent": None, "children": [], "optional": False,
         "type": "OTHER", "coref": None, "desc": False},
        {"id": 1, "begin": 4, "end": 19, "entity_id": "Q937",
         "name": "Q937", "parent": None, "children": [], "optional": False,
         "type": "OTHER", "coref": None, "desc": False},
        {"id": 2, "begin": 38, "end": 43, "entity_id": "Q64",
         "name": "Q64", "parent": None, "children": [], "optional": False,
         "type": "OTHER", "coref": None, "desc": False},
    ]
    assign_parent_child(labels)
    assert labels[1]["parent"] == 0 and labels[0]["children"] == [1]
    preds = [
        {"begin": 4, "end": 29, "entity_id": "Q1", "candidates": ["Q1"],
         "linked_by": "test"},
        # prediction at the full word "Berlin" (38..44): matches gold
        # (38..43) only through word-boundary expansion on real text
        {"begin": 38, "end": 44, "entity_id": "Q64", "candidates": ["Q64"],
         "linked_by": "test"},
    ]
    cases = evaluate_document(text, labels, preds)
    for mode in ("IGNORED", "REQUIRED"):
        label_errors(cases, mode=mode)
    counts = count_cases(cases)
    # root correct + boundary-matched correct = 2 tp; nested child with
    # a correct parent contributes no fn (factor 0)
    assert counts[("REQUIRED", "all", "tp")] == 2
    assert ("REQUIRED", "all", "fn") not in counts
    assert ("REQUIRED", "all", "fp") not in counts
