"""ELEVANT-style evaluation as Ray Data stages.

Per-document case generation is a pure Python kernel (inherently
sequential within a document, embarrassingly parallel across documents —
SURVEY §1.3); the global TP/FP/FN accounting is an associative counter
aggregate, exact under any partitioning.

Parity targets (ported semantics, re-expressed — no code copied):
- factor recursion over nested gold-label forests:
  ``src/elevant/evaluation/case_generator.py:212-343`` (doctest scenarios
  reproduced in tests/test_evaluation.py);
- span matching incl. word-boundary expansion:
  ``case_generator.py:65-160``;
- the two-mode (IGNORED/REQUIRED) linking + NER evaluation-type matrix:
  ``src/elevant/evaluation/case.py:121-311``;
- root re-evaluation from child eval types:
  ``case_generator.py:162-210``;
- counting rules (children excluded from TP/FN, factor-0 excluded from
  FP): ``src/elevant/evaluation/evaluator.py:151-204``;
- P/R/F1 assembly: ``evaluator.py:40-65, 206-352`` (subset).

Sentinels: ``<NIL>``/``<NO_MAPPING>`` (knowledge_base_mapper.py:13-15);
pseudo-types QUANTITY/DATETIME/OTHER (groundtruth_label.py:5-7).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Tuple

from elevant_ray.functions.mention_types import (
    COREF_TYPES, is_unknown_entity, mention_type,
)
from elevant_ray.functions.spans import word_boundary

IGNORED = "IGNORED"
REQUIRED = "REQUIRED"
MODES = (IGNORED, REQUIRED)
TP, FP, FN = "TP", "FP", "FN"

QUANTITY = "QUANTITY"
DATETIME = "DATETIME"
OTHER = "OTHER"

MENTION_CATEGORIES = ("entity_named", "entity_non_named", "entity_unknown",
                      "coref_nominal", "coref_pronominal")
EVALUATION_CATEGORIES = ("all", "ner", "entity", "coref") + MENTION_CATEGORIES


# ---------------------------------------------------------------------------
# label / entity helpers
# ---------------------------------------------------------------------------

def _label_types(label: dict) -> List[str]:
    return (label.get("type") or OTHER).split("|")


def _label_is_quantity(label: dict) -> bool:
    return QUANTITY in _label_types(label)


def _label_is_datetime(label: dict) -> bool:
    return DATETIME in _label_types(label)


def _label_is_optional(label: dict) -> bool:
    """optional flag OR quantity OR datetime OR desc
    (groundtruth_label.py:31-32)."""
    return bool(label.get("optional")) or _label_is_quantity(label) \
        or _label_is_datetime(label) or bool(label.get("desc"))


def _has_non_optional_child(label: dict, label_dict: Dict[int, dict]) -> bool:
    """groundtruth_label.py:69-86."""
    for child_id in label.get("children") or ():
        child = label_dict[child_id]
        if not _label_is_optional(child):
            return True
        if _has_non_optional_child(child, label_dict):
            return True
    return False


def entity_type_of(entity_id: Optional[str], qid_meta: dict) -> str:
    """determine_entity_type (case_generator.py:49-63): QUANTITY /
    DATETIME / pipe-joined whitelist types / OTHER."""
    if entity_id in qid_meta.get("quantities", ()):
        return QUANTITY
    if entity_id in qid_meta.get("datetimes", ()):
        return DATETIME
    types = qid_meta.get("types", {}).get(entity_id)
    return "|".join(types) if types else OTHER


# ---------------------------------------------------------------------------
# evaluation-type matrix (case.py:121-311)
# ---------------------------------------------------------------------------

def linking_eval_types(mode: str, st: dict) -> List[str]:
    if st["factor"] == 0:
        child = st.get("child_linking")
        if child is None:
            return []
        s = child[mode]
        if FN in s:
            return [FN]
        if TP in s and len(s) == 1:
            return [TP]
        return []
    if not st["has_gt"]:
        if st["has_pred"]:
            if mode == IGNORED and not st["pred_known"]:
                return []
            return [FP]
        return []
    if not st["has_pred"]:
        if st["optional"] and not st["has_nonopt_children"]:
            return []
        if mode == IGNORED and not st["gt_known"]:
            return []
        return [FN]
    if st["optional"]:
        if st["pred_known"]:
            if (st["gt_known"] and st["ids_equal"]) or st["true_qty_dt"]:
                return []
            return [FP]
        if (st["gt_known"] or st["gt_qty_dt"]) and mode == REQUIRED:
            return [FP]
        return []
    if st["gt_known"]:
        if st["pred_known"]:
            return [TP] if st["ids_equal"] else [FN, FP]
        return [FN] if mode == IGNORED else [FN, FP]
    if st["pred_known"]:
        return [FP] if mode == IGNORED else [FN, FP]
    return [] if mode == IGNORED else [TP]


def ner_eval_types(mode: str, st: dict) -> List[str]:
    if st["factor"] == 0:
        child = st.get("child_ner")
        if child is None:
            return []
        s = child[mode]
        if FN in s:
            return [FN]
        if TP in s and len(s) == 1:
            return [TP]
        return []
    if not st["has_gt"]:
        if st["has_pred"]:
            if mode == IGNORED and not st["pred_known"]:
                return []
            return [FP]
        return []
    if not st["has_pred"]:
        if st["optional"] and not st["has_nonopt_children"]:
            return []
        if mode == IGNORED and not st["gt_known"]:
            return []
        return [FN]
    if st["optional"]:
        if not (st["gt_known"] or st["gt_qty_dt"]) and st["pred_known"] \
                and mode == IGNORED:
            return [FP]
        return []
    if st["gt_known"]:
        if st["pred_known"]:
            return [TP]
        return [FN] if mode == IGNORED else [TP]
    if st["pred_known"]:
        return [FP] if mode == IGNORED else [TP]
    return [] if mode == IGNORED else [TP]


def _compute_case_types(case: dict) -> None:
    case["linking_eval_types"] = {m: linking_eval_types(m, case) for m in MODES}
    case["ner_eval_types"] = {m: ner_eval_types(m, case) for m in MODES}


# ---------------------------------------------------------------------------
# factor recursion (case_generator.py:212-343)
# ---------------------------------------------------------------------------

class _FactorState:
    def __init__(self, text: str, label_dict: Dict[int, dict],
                 predictions: Dict[Tuple[int, int], dict]):
        self.text = text
        self.label_dict = label_dict
        self.predictions = predictions
        self.factor_dict: Dict[int, int] = {}

    def _pred_entity_at(self, label: dict) -> Optional[str]:
        span = (label["begin"], label["end"])
        if span in self.predictions:
            return self.predictions[span]["entity_id"]
        expanded = word_boundary(span, self.text)
        if expanded in self.predictions:
            return self.predictions[expanded]["entity_id"]
        return None

    def factor(self, label_id: int, determining_siblings: bool = False) -> int:
        label = self.label_dict[label_id]
        pred_id = self._pred_entity_at(label)

        if pred_id and (label["entity_id"] == pred_id or
                        (is_unknown_entity(label["entity_id"]) and
                         is_unknown_entity(pred_id))):
            if not determining_siblings:
                self.factor_dict[label_id] = 1
            return 1

        biggest_child = 0
        for child_id in label.get("children") or ():
            biggest_child = max(biggest_child, self.factor(child_id))

        if label.get("parent") is None:
            f = 1 if biggest_child == 0 else 0
            if not determining_siblings:
                self.factor_dict[label_id] = f
            return f

        f = 0
        parent_span = (self.label_dict[label["parent"]]["begin"],
                       self.label_dict[label["parent"]]["end"])
        own_span = (label["begin"], label["end"])
        if pred_id and biggest_child == 0 and \
                word_boundary(parent_span, self.text) != word_boundary(own_span, self.text):
            f = 1
        elif not pred_id and not determining_siblings and biggest_child == 0:
            siblings = [s for s in self.label_dict[label["parent"]]["children"]
                        if s != label_id]
            for sib in siblings:
                if self.factor(sib, determining_siblings=True) > 0:
                    f = 1
                    break
        if not determining_siblings:
            self.factor_dict[label_id] = f
        return max(biggest_child, f)


def determine_factors(text: str, labels: List[dict],
                      predictions: Dict[Tuple[int, int], dict]) -> Dict[int, int]:
    """Factor (0/1) per label id; parity with the reference doctests."""
    label_dict = {lb["id"]: lb for lb in labels}
    state = _FactorState(text, label_dict, predictions)
    # only roots are entered; children never visited stay absent from the
    # dict and default to 0 at read time (case_generator.py:127, 212-217)
    for lb in sorted(labels, key=lambda x: x["id"]):
        if lb.get("parent") is None:
            state.factor(lb["id"])
    return state.factor_dict


# ---------------------------------------------------------------------------
# per-document case generation (case_generator.py:65-210)
# ---------------------------------------------------------------------------

def evaluate_document(
    text: str,
    labels: List[dict],
    predictions: List[dict],
    evaluation_span: Optional[Tuple[int, int]] = None,
    qid_meta: Optional[dict] = None,
) -> List[dict]:
    """Generate evaluation cases for one document.

    ``labels``: [{id, begin, end, entity_id, name, parent, children,
    optional, type, coref, desc}], ``predictions``: [{begin, end,
    entity_id, candidates, linked_by}].  Returns case dicts sorted by
    span, each carrying linking/ner eval types per mode, factor and
    mention type.
    """
    qid_meta = qid_meta or {}
    eval_span = evaluation_span or (0, len(text))

    preds: Dict[Tuple[int, int], dict] = {}
    for p in sorted(predictions, key=lambda x: (x["begin"], x["end"])):
        preds[(p["begin"], p["end"])] = p
    all_preds = dict(preds)
    all_preds.update({word_boundary(s, text): p for s, p in preds.items()})

    gt_spans = set()
    for lb in labels:
        s = (lb["begin"], lb["end"])
        gt_spans.add(s)
        gt_spans.add(word_boundary(s, text))

    label_dict = {lb["id"]: lb for lb in labels}
    # NB: factor recursion looks spans up in the *expanded* prediction map
    # (case_generator.py:73-75 builds all_predictions before :125)
    factors = determine_factors(text, labels, all_preds)

    def pred_names(qid):
        return qid_meta.get("names", {}).get(qid, "")

    cases: List[dict] = []
    gt_cases: Dict[int, dict] = {}
    roots = sorted((lb for lb in labels if lb.get("parent") is None),
                   key=lambda x: x["id"])
    children = sorted((lb for lb in labels if lb.get("parent") is not None),
                      key=lambda x: x["id"])
    for lb in roots + children:
        span = (lb["begin"], lb["end"])
        expanded = word_boundary(span, text)
        pred = all_preds.get(span) or all_preds.get(expanded)
        factor = factors.get(lb["id"], 0)
        gt_known = not is_unknown_entity(lb["entity_id"]) \
            and not _label_is_datetime(lb) and not _label_is_quantity(lb)
        pred_qid = pred["entity_id"] if pred else None
        pred_type = entity_type_of(pred_qid, qid_meta) if pred else None
        case = {
            "span": span,
            "text": text[span[0]:span[1]],
            "label_id": lb["id"],
            "gt_entity_id": lb["entity_id"],
            "gt_parent": lb.get("parent"),
            "gt_types": lb.get("type") or OTHER,
            "factor": factor,
            "has_gt": True,
            "has_pred": pred is not None,
            "optional": _label_is_optional(lb),
            "gt_known": gt_known,
            "gt_qty_dt": _label_is_quantity(lb) or _label_is_datetime(lb),
            "pred_known": pred is not None and not is_unknown_entity(pred_qid),
            "pred_entity_id": pred_qid,
            "pred_types": pred_type,
            "ids_equal": pred is not None and lb["entity_id"] == pred_qid,
            "true_qty_dt": (pred is not None and
                            (lb.get("type") or OTHER) == pred_type and
                            (_label_is_quantity(lb) or _label_is_datetime(lb))),
            "has_nonopt_children": False,
            "n_candidates": len(pred.get("candidates") or ()) if pred else 0,
            "candidates": sorted(pred.get("candidates") or ()) if pred else [],
            "gt_name": lb.get("name"),
            "child_linking": None,
            "child_ner": None,
            "mention_type": mention_type(
                text[span[0]:span[1]], lb.get("coref"), lb.get("name"),
                lb["entity_id"], pred_names(pred_qid), pred_qid),
        }
        _compute_case_types(case)
        cases.append(case)
        gt_cases[lb["id"]] = case

    # false-detection cases (case_generator.py:133-154)
    for span in sorted(preds):
        pred = preds[span]
        expanded = word_boundary(span, text)
        if span in gt_spans or expanded in gt_spans:
            continue
        if pred["entity_id"] is None:
            continue
        if not (span[0] >= eval_span[0] and span[1] <= eval_span[1]):
            continue
        case = {
            "span": span,
            "text": text[span[0]:span[1]],
            "label_id": None,
            "gt_entity_id": None,
            "gt_parent": None,
            "gt_types": None,
            "factor": 1,
            "has_gt": False,
            "has_pred": True,
            "optional": False,
            "gt_known": False,
            "gt_qty_dt": False,
            "pred_known": not is_unknown_entity(pred["entity_id"]),
            "pred_entity_id": pred["entity_id"],
            "pred_types": entity_type_of(pred["entity_id"], qid_meta),
            "ids_equal": False,
            "true_qty_dt": False,
            "has_nonopt_children": False,
            "n_candidates": len(pred.get("candidates") or ()),
            "candidates": sorted(pred.get("candidates") or ()),
            "gt_name": None,
            "child_linking": None,
            "child_ner": None,
            "mention_type": mention_type(
                text[span[0]:span[1]], None, None, None,
                pred_names(pred["entity_id"]), pred["entity_id"]),
        }
        _compute_case_types(case)
        cases.append(case)

    _reevaluate_roots(gt_cases, label_dict)
    return sorted(cases, key=lambda c: c["span"])


def _reevaluate_roots(gt_cases: Dict[int, dict],
                      label_dict: Dict[int, dict]) -> None:
    """case_generator.py:162-210."""
    for label_id, case in gt_cases.items():
        lb = label_dict[label_id]
        if lb.get("parent") is not None:
            continue
        if not lb.get("children"):
            continue
        if case["optional"]:
            case["has_nonopt_children"] = _has_non_optional_child(lb, label_dict)
            _compute_case_types(case)
        if case["factor"] == 0:
            link_et, ner_et = _relevant_child_eval_types(lb, label_dict, gt_cases)
            case["child_linking"] = link_et
            case["child_ner"] = ner_et
            _compute_case_types(case)


def _relevant_child_eval_types(lb: dict, label_dict: Dict[int, dict],
                               gt_cases: Dict[int, dict]):
    """case_generator.py:186-210: union of eval types over descendants
    whose factor != 0, per mode."""
    link = {m: set() for m in MODES}
    ner = {m: set() for m in MODES}
    for child_id in lb.get("children") or ():
        cl, cn = _relevant_child_eval_types(label_dict[child_id], label_dict, gt_cases)
        for m in MODES:
            link[m].update(cl[m])
            ner[m].update(cn[m])
        child_case = gt_cases[child_id]
        if child_case["factor"] != 0:
            for m in MODES:
                link[m].update(child_case["linking_eval_types"][m])
                ner[m].update(child_case["ner_eval_types"][m])
    return link, ner


# ---------------------------------------------------------------------------
# counting (evaluator.py:151-204) + results (evaluator.py:206-352 subset)
# ---------------------------------------------------------------------------

def count_cases(cases: List[dict]) -> Counter:
    """Counter keyed (mode, category, kind) — fully associative, safe to
    sum across any partitioning."""
    counts: Counter = Counter()
    for case in cases:
        is_coref = case["mention_type"] in COREF_TYPES
        key = case["mention_type"].lower()
        is_root = case["has_gt"] and case["gt_parent"] is None
        for mode in MODES:
            link = case["linking_eval_types"][mode]
            ner = case["ner_eval_types"][mode]
            if not is_coref:
                if TP in ner and is_root:
                    counts[(mode, "ner", "tp")] += 1
                if FN in ner and is_root:
                    counts[(mode, "ner", "fn")] += 1
                if FP in ner and case["factor"] != 0:
                    counts[(mode, "ner", "fp")] += 1
            if TP in link and is_root:
                counts[(mode, "all", "tp")] += 1
                counts[(mode, key, "tp")] += 1
                if is_coref:
                    counts[(mode, "coref", "tp")] += 1
                else:
                    for t in _type_ids(case["gt_types"]):
                        counts[(mode, "type:" + t, "tp")] += 1
            if FN in link and is_root:
                counts[(mode, "all", "fn")] += 1
                counts[(mode, key, "fn")] += 1
                if is_coref:
                    counts[(mode, "coref", "fn")] += 1
                else:
                    for t in _type_ids(case["gt_types"]):
                        counts[(mode, "type:" + t, "fn")] += 1
            if FP in link and case["factor"] != 0:
                counts[(mode, "all", "fp")] += 1
                counts[(mode, key, "fp")] += 1
                if is_coref:
                    counts[(mode, "coref", "fp")] += 1
                else:
                    for t in _type_ids(case["pred_types"]):
                        counts[(mode, "type:" + t, "fp")] += 1
            # error-category counts weighted by factor
            # (evaluator.py:196-204: error_counts[mode][label] += factor)
            for label in case.get("error_labels", {}).get(mode, ()):
                counts[(mode, "error:" + label, "count")] += case["factor"]
    return counts


def _type_ids(types: Optional[str]) -> List[str]:
    """evaluator.py:68-72: drop DATETIME/QUANTITY, default OTHER."""
    ids = [t for t in (types or OTHER).split("|") if t not in (DATETIME, QUANTITY)]
    return ids or [OTHER]


def f1_dict(tp: int, fp: int, fn: int) -> dict:
    """evaluator.py:48-61."""
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0
    ground_truth = tp + fn
    recall = tp / ground_truth if ground_truth > 0 else 0
    f1 = 2 * precision * recall / (precision + recall) \
        if (precision + recall) > 0 else 0
    return {"true_positives": tp, "false_positives": fp,
            "false_negatives": fn, "ground_truth": ground_truth,
            "precision": precision, "recall": recall, "f1": f1}


def results_from_counts(counts: Counter) -> dict:
    """Nested results dict per mode: mention-type categories + 'entity'
    rollup (sum of ENTITY_* — evaluator.py:209-214) + per-type metrics."""
    out: dict = {}
    for mode in MODES:
        mode_out = {"mention_types": {}, "entity_types": {}}
        entity_roll = {"tp": 0, "fp": 0, "fn": 0}
        for cat in EVALUATION_CATEGORIES:
            if cat == "entity":
                continue
            tp = counts[(mode, cat, "tp")]
            fp = counts[(mode, cat, "fp")]
            fn = counts[(mode, cat, "fn")]
            mode_out["mention_types"][cat] = f1_dict(tp, fp, fn)
            if cat.startswith("entity_"):
                entity_roll["tp"] += tp
                entity_roll["fp"] += fp
                entity_roll["fn"] += fn
        mode_out["mention_types"]["entity"] = f1_dict(**entity_roll)
        type_keys = sorted({k[1][5:] for k in counts
                            if k[0] == mode and k[1].startswith("type:")})
        for t in type_keys:
            mode_out["entity_types"][t] = f1_dict(
                counts[(mode, "type:" + t, "tp")],
                counts[(mode, "type:" + t, "fp")],
                counts[(mode, "type:" + t, "fn")])
        # error-category breakdown (evaluator.py:216-352 subset: raw
        # factor-weighted counts per error label)
        mode_out["error_categories"] = {
            k[1][6:]: counts[k] for k in sorted(counts)
            if k[0] == mode and k[1].startswith("error:")}
        out[mode] = mode_out
    return out


# ---------------------------------------------------------------------------
# Dataset stages
# ---------------------------------------------------------------------------

def evaluate_dataset(docs, qid_meta_ref=None):
    """docs(text, labels list<struct>, predictions list<struct>[, begin/
    end of evaluation span]) → (cases Dataset, counts Counter).

    Cases stream out as a flat table; counts are computed as per-batch
    partial counters reduced on the driver (tiny, associative).
    """
    import pyarrow as pa
    import ray

    def kernel(batch: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get
        meta = cached_get(qid_meta_ref) if qid_meta_ref is not None else {}
        rows = batch.to_pylist()
        out = []
        for row in rows:
            span = (row["eval_begin"], row["eval_end"]) \
                if "eval_begin" in row and row["eval_begin"] is not None else None
            cases = evaluate_document(row["text"], row["labels"] or [],
                                      row["predictions"] or [],
                                      evaluation_span=span, qid_meta=meta)
            for c in cases:
                out.append({
                    "doc_id": row.get("doc_id"),
                    "begin": c["span"][0], "end": c["span"][1],
                    "text": c["text"],
                    "gt_entity_id": c["gt_entity_id"],
                    "pred_entity_id": c["pred_entity_id"],
                    "factor": c["factor"],
                    "mention_type": c["mention_type"],
                    "optional": c["optional"],
                    "linking_ignored": sorted(c["linking_eval_types"][IGNORED]),
                    "linking_required": sorted(c["linking_eval_types"][REQUIRED]),
                    "ner_ignored": sorted(c["ner_eval_types"][IGNORED]),
                    "ner_required": sorted(c["ner_eval_types"][REQUIRED]),
                })
        if not out:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return pa.Table.from_pylist(out)

    return docs.map_batches(kernel, batch_format="pyarrow")


def aggregate_counts(docs, qid_meta_ref=None):
    """Distributed counter aggregation: per-batch partial counts → long
    rows (mode, category, kind, value) → groupby sum → Counter."""
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from elevant_ray.stages.util import cached_get
        meta = cached_get(qid_meta_ref) if qid_meta_ref is not None else {}
        counts: Counter = Counter()
        for row in batch.to_pylist():
            span = (row["eval_begin"], row["eval_end"]) \
                if "eval_begin" in row and row["eval_begin"] is not None else None
            cases = evaluate_document(row["text"], row["labels"] or [],
                                      row["predictions"] or [],
                                      evaluation_span=span, qid_meta=meta)
            from elevant_ray.functions.errors import label_errors

            hl = {(h["begin"], h["end"]) for h in row.get("hyperlinks") or ()}
            for mode in MODES:
                label_errors(cases, dims=meta, hyperlink_spans=hl, mode=mode)
            counts.update(count_cases(cases))
        keys = list(counts.keys())
        return pa.table({
            "mode": pa.array([k[0] for k in keys], pa.string()),
            "category": pa.array([k[1] for k in keys], pa.string()),
            "kind": pa.array([k[2] for k in keys], pa.string()),
            "partial": pa.array([counts[k] for k in keys], pa.int64()),
        })

    agg = (docs.map_batches(partial, batch_format="pyarrow")
           .groupby(["mode", "category", "kind"])
           .aggregate(Sum("partial", alias_name="value")))
    counts: Counter = Counter()
    for row in agg.to_pandas().itertuples(index=False):
        counts[(row.mode, row.category, row.kind)] = int(row.value)
    return counts


def pairwise_f1(pred_pairs, gold_pairs, num_partitions: int = 8) -> dict:
    """North-rule gate: pairwise F1 of predicted same-cluster pairs vs
    gold pairs.  Both inputs: Dataset(left, right) with left < right and
    DISTINCT pairs (the upstream contract — distinct_pairs /
    clusters_to_pairs).

    Under the broadcast cutoff both pair sets stream to one driver
    set-intersection (a multi-op full-outer join pipeline costs ~4 s of
    fixed exchange latency for what is a few-thousand-row overlap
    count); beyond it the full outer hash co-group join runs — the
    scale-path suite forces and re-checks that branch."""
    import pyarrow as pa

    from elevant_ray.stages.util import cogroup_join, pin_schema, scale_cutoff

    pair_schema = pa.schema([("left", pa.string()), ("right", pa.string())])

    pred_pairs = pred_pairs.select_columns(["left", "right"]).materialize()
    gold_pairs = gold_pairs.select_columns(["left", "right"]).materialize()
    if pred_pairs.size_bytes() + gold_pairs.size_bytes() \
            <= scale_cutoff(64 << 20):
        def pairset(ds):
            s = set()
            for b in ds.iter_batches(batch_format="pyarrow"):
                s.update(zip(b.column("left").to_pylist(),
                             b.column("right").to_pylist()))
            return s

        ps, gs = pairset(pred_pairs), pairset(gold_pairs)
        tp = len(ps & gs)
        return f1_dict(tp, len(ps) - tp, len(gs) - tp)

    def tag(ds, name):
        return ds.map_batches(
            lambda b, n=name: b.append_column(n, pa.array([True] * len(b), pa.bool_())),
            batch_format="pyarrow")

    p = tag(pin_schema(pred_pairs.select_columns(["left", "right"]),
                       pair_schema), "in_pred")
    g = tag(pin_schema(gold_pairs.select_columns(["left", "right"]),
                       pair_schema), "in_gold")
    # full-outer co-group, not Dataset.join: pair tables are sparse and
    # can carry empty blocks (util.cogroup_join)
    p_schema = pa.schema(list(pair_schema) + [pa.field("in_pred", pa.bool_())])
    g_schema = pa.schema(list(pair_schema) + [pa.field("in_gold", pa.bool_())])
    joined = cogroup_join(p, g, on=["left", "right"],
                          num_partitions=num_partitions,
                          left_schema=p_schema, right_schema=g_schema,
                          how="full_outer")

    def counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        in_p = pc.fill_null(batch.column("in_pred"), False)
        in_g = pc.fill_null(batch.column("in_gold"), False)
        tp = pc.sum(pc.cast(pc.and_(in_p, in_g), pa.int64())).as_py() or 0
        fp = pc.sum(pc.cast(pc.and_(in_p, pc.invert(in_g)), pa.int64())).as_py() or 0
        fn = pc.sum(pc.cast(pc.and_(in_g, pc.invert(in_p)), pa.int64())).as_py() or 0
        return pa.table({"tp": [tp], "fp": [fp], "fn": [fn]})

    agg = joined.map_batches(counts, batch_format="pyarrow").to_pandas().sum()
    return f1_dict(int(agg["tp"]), int(agg["fp"]), int(agg["fn"]))
