"""Error-category labeling tests (functions/errors.py) — cases built
through the real evaluate_document kernel, labels checked against the
reference's rules (src/elevant/evaluation/errors.py semantics)."""

from __future__ import annotations

from elevant_ray.functions import errors as E
from elevant_ray.stages.evaluation import IGNORED, evaluate_document


def _label(id_, begin, end, qid, name=None, **kw):
    return {"id": id_, "begin": begin, "end": end, "entity_id": qid,
            "name": name or qid, "parent": kw.pop("parent", None),
            "children": kw.pop("children", []),
            "optional": kw.pop("optional", False),
            "type": kw.pop("type", "OTHER"),
            "coref": kw.pop("coref", None), "desc": False, **kw}


def _pred(begin, end, qid, candidates=()):
    return {"begin": begin, "end": end, "entity_id": qid,
            "candidates": list(candidates), "linked_by": "test"}


def _run(text, labels, preds, dims=None, hyperlinks=None, **kw):
    cases = evaluate_document(text, labels, preds)
    E.label_errors(cases, dims=dims, hyperlink_spans=hyperlinks,
                   mode=IGNORED, **kw)
    return cases


def labels_of(case):
    return case["error_labels"][IGNORED]


def test_correct_link_gets_correct_labels():
    text = "Berlin is big"
    cases = _run(text, [_label(0, 0, 6, "Q64", "Berlin")],
                 [_pred(0, 6, "Q64", ["Q64", "Q123"])])
    ls = labels_of(cases[0])
    assert E.DISAMBIGUATION_CORRECT in ls
    assert E.DISAMBIGUATION_OTHER_CORRECT in ls
    assert E.AVOIDED_NER_FN in ls
    assert E.DISAMBIGUATION_CANDIDATES_CORRECT in ls
    assert E.DISAMBIGUATION_MULTI_CANDIDATES_CORRECT in ls
    assert E.NER_FN not in ls and E.NER_FP not in ls


def test_wrong_disambiguation_and_rare():
    text = "Paris is nice"
    dims = {"most_popular": {"Paris": {"Q90"}}}
    # gt = the rare Paris; predicted the popular Paris, France.  The gt
    # name must not contain the mention, else partial-name wins (the
    # reference checks demonym -> metonymy -> partial-name -> rare).
    cases = _run(text, [_label(0, 0, 5, "Q830149", "Lamar county seat")],
                 [_pred(0, 5, "Q90", ["Q90", "Q830149"])], dims=dims)
    ls = labels_of(cases[0])
    assert E.DISAMBIGUATION_WRONG in ls
    assert E.DISAMBIGUATION_RARE_WRONG in ls
    assert E.DISAMBIGUATION_MULTI_CANDIDATES_WRONG in ls


def test_undetected_subtypes():
    text = "Berlin and cats here"
    cases = _run(text, [_label(0, 0, 6, "Q64", "Berlin"),
                        _label(1, 11, 15, "Q146", "cats")], [])
    by_text = {c["text"]: labels_of(c) for c in cases}
    assert {E.NER_FN, E.NER_FN_OTHER} <= by_text["Berlin"]
    assert {E.NER_FN, E.NER_FN_LOWERCASED} <= by_text["cats"]


def test_false_positive_subtypes():
    text = "nothing Berlin here"
    cases = _run(text, [], [_pred(8, 14, "Q64")], contains_unknowns=False)
    ls = labels_of(cases[0])
    # no gold at all + named mention + corpus without unknown labels
    assert {E.NER_FP, E.NER_FP_GROUNDTRUTH_UNKNOWN} <= ls


def test_wrong_span_fp():
    text = "New York City is big"
    # gt covers "New York City"; prediction covers only "New York" with
    # the same entity -> wrong span
    cases = _run(text, [_label(0, 0, 13, "Q60", "New York City")],
                 [_pred(0, 8, "Q60")])
    fp = [c for c in cases if not c["has_gt"]][0]
    assert E.NER_FP_WRONG_SPAN in labels_of(fp)


def test_hyperlink_labels():
    text = "Berlin is big"
    hl = {(0, 6)}
    ok = _run(text, [_label(0, 0, 6, "Q64", "Berlin")],
              [_pred(0, 6, "Q64")], hyperlinks=hl)
    assert E.HYPERLINK_CORRECT in labels_of(ok[0])
    bad = _run(text, [_label(0, 0, 6, "Q64", "Berlin")],
               [_pred(0, 6, "Q999")], hyperlinks=hl)
    assert E.HYPERLINK_WRONG in labels_of(bad[0])


def test_demonym_and_metonymy_and_partial_name():
    dims = {
        "demonyms": {"German"},
        "types": {"Q183": [E.TYPE_LOCATION], "Q64": [E.TYPE_LOCATION],
                  "Q5626": ["Q43229"]},   # org gt
        "most_popular": {"German": {"Q183"}, "Berlin": {"Q64"},
                         "Angela": {"Q567"}},
    }
    # demonym: mention in demonym list, gt type location
    c1 = _run("German things", [_label(0, 0, 6, "Q183", "Germany",
                                       type=E.TYPE_LOCATION)],
              [_pred(0, 6, "Q183")], dims=dims)
    assert E.DISAMBIGUATION_DEMONYM_CORRECT in labels_of(c1[0])
    # metonymy: most popular candidate is a location, gt is an org
    c2 = _run("Berlin decided", [_label(0, 0, 6, "Q5626", "Berlin Senate")],
              [_pred(0, 6, "Q5626")], dims=dims)
    assert E.DISAMBIGUATION_METONYMY_CORRECT in labels_of(c2[0])
    # partial name: mention is part of a multi-word gt name
    c3 = _run("Angela spoke", [_label(0, 0, 6, "Q567", "Angela Merkel")],
              [_pred(0, 6, "Q567")], dims=dims)
    assert E.DISAMBIGUATION_PARTIAL_NAME_CORRECT in labels_of(c3[0])


def test_coreference_error_labels():
    text = "Berlin is big . It grows"
    labels = [_label(0, 0, 6, "Q64", "Berlin"),
              _label(1, 16, 18, "Q64", "Berlin", coref=True)]
    # pronoun linked to the wrong entity; its named reference was linked
    # to the same wrong entity -> reference wrongly disambiguated
    cases = _run(text, labels, [_pred(0, 6, "Q999"), _pred(16, 18, "Q999")])
    coref = [c for c in cases if c["text"] == "It"][0]
    assert E.COREFERENCE_REFERENCE_WRONGLY_DISAMBIGUATED in labels_of(coref)

    # pronoun undetected
    cases2 = _run(text, labels, [_pred(0, 6, "Q64")])
    coref2 = [c for c in cases2 if c["text"] == "It"][0]
    assert E.COREFERENCE_UNDETECTED in labels_of(coref2)
