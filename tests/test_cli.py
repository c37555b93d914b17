"""CLI smoke tests: the link/evaluate/stats subcommands drive the same
stages the queries use, through the argparse surface (the engine analog
of running the reference's link_benchmark.py / evaluate.py scripts)."""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture()
def articles_jsonl(tmp_path):
    docs = [
        {"doc_id": 1, "url": "u1", "title": "A",
         "text": "graft spark table join data spark",
         "labels": [{"id": 0, "begin": 0, "end": 5, "entity_id": "Q1",
                     "name": "graft", "parent": None, "children": [],
                     "optional": False, "type": "OTHER", "coref": False,
                     "desc": False}]},
        {"doc_id": 2, "url": "u2", "title": "B",
         "text": "spark data row key value join", "labels": []},
    ]
    p = tmp_path / "articles.jsonl"
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    return str(p)


def test_cli_stats(ray_session, articles_jsonl, tmp_path, capsys):
    from elevant_ray.cli import main

    out = tmp_path / "stats.json"
    assert main(["stats", "--input", articles_jsonl, "--out", str(out)]) == 0
    payload = json.load(open(out))
    assert payload["text/articles"] == 2
    assert payload["text/labels"] == 1


def test_cli_link_pos_prior(ray_session, articles_jsonl, tmp_path):
    from elevant_ray.cli import main

    out_dir = tmp_path / "linked"
    assert main(["link", "--input", articles_jsonl,
                 "--linker", "pos-prior",
                 "--dims-from", "/root/testdata/sf0.001",
                 "--out-dir", str(out_dir)]) == 0
    meta = json.load(open(out_dir / "metadata.json"))
    assert meta["linker_name"] == "pos-prior"
    assert meta["linking_time"] > 0
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(str(out_dir / "mentions" / "*.parquet"))
    assert files
    cols = set()
    for f in files:
        cols |= set(pq.read_schema(f).names)
    assert {"url", "begin", "end", "pred_qid"} <= cols


def test_cli_evaluate_counts(ray_session, tmp_path):
    from elevant_ray.cli import main

    linked = [
        {"doc_id": 1, "text": "graft spark table",
         "labels": [{"id": 0, "begin": 0, "end": 5, "entity_id": "Q1",
                     "name": "graft", "parent": None, "children": [],
                     "optional": False, "type": "OTHER", "coref": False,
                     "desc": False}],
         "predictions": [{"begin": 0, "end": 5, "entity_id": "Q1",
                          "candidates": ["Q1"], "linked_by": "x"}]},
        {"doc_id": 2, "text": "spark data",
         "labels": [{"id": 0, "begin": 0, "end": 5, "entity_id": "Q2",
                     "name": "spark", "parent": None, "children": [],
                     "optional": False, "type": "OTHER", "coref": False,
                     "desc": False}],
         "predictions": []},
    ]
    src = tmp_path / "linked.jsonl"
    with open(src, "w") as f:
        for d in linked:
            f.write(json.dumps(d) + "\n")
    out_dir = tmp_path / "eval"
    assert main(["evaluate", "--input", str(src),
                 "--out-dir", str(out_dir)]) == 0
    results = json.load(open(out_dir / "results.json"))
    # one exact TP (doc 1) and one FN (doc 2), no FPs
    all_ = results["IGNORED"]["mention_types"]["all"]
    assert all_["true_positives"] == 1
    assert all_["false_negatives"] == 1
    assert all_["false_positives"] == 0
    assert os.path.isdir(out_dir / "cases")
