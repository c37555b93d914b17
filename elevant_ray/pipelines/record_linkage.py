"""Flagship pipeline: blocking + pairwise scoring + transitive clustering
over Common-Crawl-style pages (the north-star DAG).

    read pages ──extract──▶ dedup(url) ──▶ LSH+URL blocking ──▶
    candidate pairs ──scorer──▶ match edges ──hash-min CC──▶ clusters
                                            └─▶ pairwise F1 vs gold

Every wide step is keyed: dedup on ``url``; blocking groupbys on
``band_key``; pair verification joins hash-partitioned on the pair
endpoints; CC on ``node``.  Gold pairs come from the deterministic page
generator (pages born from the same source document are duplicates), so
the pairwise-F1 gate runs end-to-end with no external data.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from elevant_ray.functions.extract import extract_batch
from elevant_ray.functions.normalize import canonical_url
from elevant_ray.stages.clustering import clusters_to_pairs, connected_components
from elevant_ray.stages.dedup import dedup_first_by, lsh_candidate_pairs
from elevant_ray.stages.scoring import verify_pairs


def add_canon_column(batch: pa.Table) -> pa.Table:
    canon = [canonical_url(u) for u in batch.column("url").to_pylist()]
    return batch.append_column("canon", pa.array(canon, pa.string()))


def prepare_pages(pages, do_extract: bool = True):
    """pages(url, warc_ts, html, …) → extracted + canonicalized + deduped
    (one row per url, earliest warc_ts wins)."""
    # ONE schema probe, on the raw input (each ds.schema() call on a
    # longer lineage triggers its own sampling execution)
    _sch = pages.schema()
    raw_names = set(_sch.names) if _sch is not None else set()
    if do_extract and "html" in raw_names:
        pages = pages.map_batches(extract_batch, batch_format="pyarrow")
    pages = pages.map_batches(add_canon_column, batch_format="pyarrow")
    # keep scalar columns only: linkage needs (url, canon, text[, doc_id]);
    # nested annotation columns belong to the linking pipeline and don't
    # survive pandas map_groups anyway (ray guide: keep nested in Arrow)
    _types = {"url": pa.string(), "warc_ts": pa.timestamp("us"),
              "canon": pa.string(), "text": pa.string(),
              "lang": pa.string(), "doc_id": pa.int64()}
    keep = [c for c in _types if c in raw_names | {"canon", "text"}]
    pages = pages.select_columns(keep)
    # schema passed statically: ds.schema() on the full lineage would
    # trigger an extra sampling execution per call
    return dedup_first_by(pages, key="url", order_col="warc_ts",
                          schema=pa.schema([(c, _types[c]) for c in keep]))


def match_edges(pages, threshold: float = 0.75, num_partitions: int = 16):
    """Blocking (LSH bands + canonical-url key, fused into one explode +
    one groupby — see lsh_candidate_pairs) → verified match
    edges(left, right, lev_sim, …)."""
    # `pages` fans out to THREE consumers (blocking + both join sides of
    # verification); without pinning, each consumer re-executes the whole
    # extract+dedup lineage.  Materialize once here — at 10^12-doc scale
    # this is the per-partition Parquet checkpoint (state/checkpoint.py).
    pages = pages.materialize()
    pairs = lsh_candidate_pairs(pages, id_col="url", canon_col="canon",
                                num_partitions=num_partitions)
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    scored = verify_pairs(pairs, pages, id_col="url",
                          threshold=threshold, num_partitions=num_partitions,
                          score_parallelism=2 * cpus)
    return scored


def cluster_pages(pages, threshold: float = 0.75, num_partitions: int = 16):
    """Full DAG → (labels Dataset(node, label), scored pairs Dataset).

    Sub-cutoff corpora run the DAG in process with the SAME kernels
    (explode_keys_table → expand_pairs_frame → score_pair_batch →
    _local_contract): at bench scale every distributed pass costs a
    fixed exchange that dwarfs the data — the same rationale as
    connected_components' driver short-circuit.  Beyond the cutoff
    (any real corpus, the 570k-page scaling input included) the
    distributed path runs; the conformance suite forces it on small
    data via ELEVANT_RAY_BROADCAST_CUTOFF=0 and re-checks label
    equality and the F1 gates."""
    from elevant_ray.stages.util import scale_cutoff

    pages = pages.materialize()
    if pages.size_bytes() <= scale_cutoff(64 << 20):
        return _cluster_pages_inprocess(pages, threshold)
    scored = match_edges(pages, threshold, num_partitions)
    edges = scored.map_batches(
        lambda b: b.filter(b.column("is_match")).select(["left", "right"]),
        batch_format="pyarrow")
    labels = connected_components(edges, num_partitions=num_partitions)
    return labels, scored


def _cluster_pages_inprocess(pages, threshold: float):
    """Sub-cutoff flagship: identical kernels, zero exchanges."""
    import ray.data as rd

    from elevant_ray.stages.clustering import _local_contract
    from elevant_ray.stages.dedup import (add_minhash_columns,
                                          expand_pairs_frame,
                                          explode_keys_table)
    from elevant_ray.stages.scoring import score_pair_batch

    empty_pages = pa.schema([("url", pa.string()),
                             ("canon", pa.string()),
                             ("text", pa.string())]).empty_table()
    tbl = pa.concat_tables(
        [b.select(["url", "canon", "text"])
         for b in pages.iter_batches(batch_format="pyarrow")]
        or [empty_pages])
    keys_tbl = explode_keys_table(
        add_minhash_columns(tbl, text_col="text"), "url",
        canon_col="canon")
    cand = expand_pairs_frame(keys_tbl.to_pandas(), "url") \
        .drop_duplicates(ignore_index=True)
    if len(cand):
        urls = tbl.column("url").to_pylist()
        texts = dict(zip(urls, tbl.column("text").to_pylist()))
        canons = dict(zip(urls, tbl.column("canon").to_pylist()))
        lv = cand["left"].tolist()
        rv = cand["right"].tolist()
        scored_tbl = score_pair_batch(pa.table({
            "left": pa.array(lv, pa.string()),
            "right": pa.array(rv, pa.string()),
            "text_l": pa.array([texts[u] for u in lv], pa.string()),
            "text_r": pa.array([texts[u] for u in rv], pa.string()),
            "canon_l": pa.array([canons[u] for u in lv], pa.string()),
            "canon_r": pa.array([canons[u] for u in rv], pa.string()),
        }), threshold=threshold)
        edges_tbl = scored_tbl.filter(scored_tbl.column("is_match")) \
            .select(["left", "right"])
    else:
        scored_tbl = pa.schema(
            [("left", pa.string()), ("right", pa.string()),
             ("text_l", pa.string()), ("text_r", pa.string()),
             ("canon_l", pa.string()), ("canon_r", pa.string()),
             ("lev_sim", pa.float64()),
             ("shingle_jaccard", pa.float64()),
             ("url_equal", pa.bool_()),
             ("is_match", pa.bool_())]).empty_table()
        edges_tbl = scored_tbl.select(["left", "right"])
    labels_tbl = _local_contract(edges_tbl) \
        .rename_columns(["node", "label"])
    return rd.from_arrow(labels_tbl), rd.from_arrow(scored_tbl)


def gold_pairs_from_doc_ids(pages_with_doc_id):
    """Gold same-entity url pairs: pages generated from the same doc_id
    (the synthetic ground truth — mirrors + exact-dup urls)."""
    import numpy as np
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["doc_id", "url"]).sort_values(
            ["doc_id", "url"], kind="stable")
        urls = g["url"].to_numpy()
        sizes = g.groupby("doc_id", sort=False).size().to_numpy()
        offs = np.concatenate([[0], np.cumsum(sizes)])
        lefts, rights = [], []
        for s, e in zip(offs[:-1], offs[1:]):
            if e - s < 2:
                continue
            i, j = np.triu_indices(e - s, k=1)
            lefts.append(urls[s:e][i])
            rights.append(urls[s:e][j])
        if not lefts:
            return pd.DataFrame({"left": pd.Series([], dtype=object),
                                 "right": pd.Series([], dtype=object)})
        return pd.DataFrame({"left": np.concatenate(lefts),
                             "right": np.concatenate(rights)})

    return bucketed_group_apply(
        pages_with_doc_id.select_columns(["doc_id", "url"]),
        "doc_id", per_bucket)


def run_record_linkage(sf_dir: str, threshold: float = 0.75,
                       num_partitions: int = 16,
                       checkpoint_dir: Optional[str] = None,
                       pages_shards: int = 0):
    """End-to-end on synthesized pages; returns dict with labels dataset,
    pairwise-F1 dict, and row counts.  With `checkpoint_dir`, each stage
    checkpoints to Parquet and a rerun resumes (state/checkpoint.py).
    With `pages_shards=N > 0` the pages stage additionally checkpoints
    per doc-shard (partition-granular lineage): losing one shard's
    output re-runs only that shard on resume.  Safe because every
    synthesized url embeds its doc_id, so url-dedup inside a doc-shard
    equals global url-dedup (see sources/pages.synth_pages)."""
    from elevant_ray.sources.pages import synth_pages
    from elevant_ray.stages.evaluation import pairwise_f1

    rebuilt_shards = None
    if not (checkpoint_dir and pages_shards):
        pages_raw = synth_pages(sf_dir, include_doc_id=True)
        pages = prepare_pages(pages_raw)

    if checkpoint_dir:
        # every wide stage checkpoints: a rerun after a crash reads back
        # the finished stages' Parquet (+ manifest lineage) and re-runs
        # only what's missing
        from elevant_ray.state.checkpoint import (fingerprint_paths,
                                                  run_partitioned_stage,
                                                  run_stage)

        fp = fingerprint_paths(f"{sf_dir}/documents.parquet")
        if pages_shards:
            pages, rebuilt_shards = run_partitioned_stage(
                [(str(k), f"{fp}:{k}/{pages_shards}")
                 for k in range(pages_shards)],
                lambda k: prepare_pages(
                    synth_pages(sf_dir, include_doc_id=True,
                                shard=(int(k), pages_shards))),
                f"{checkpoint_dir}/pages", "prepare_pages")
        else:
            pages, _ = run_stage(lambda: pages, f"{checkpoint_dir}/pages",
                                 "prepare_pages", fp)
        scored, _ = run_stage(
            lambda: match_edges(pages, threshold, num_partitions),
            f"{checkpoint_dir}/edges", "match_edges", fp)
        labels, _ = run_stage(
            lambda: connected_components(
                scored.map_batches(
                    lambda b: b.filter(b.column("is_match"))
                    .select(["left", "right"]),
                    batch_format="pyarrow"),
                num_partitions=num_partitions),
            f"{checkpoint_dir}/labels", "connected_components", fp)
    else:
        labels, scored = cluster_pages(pages, threshold, num_partitions)
    pred_pairs = clusters_to_pairs(labels)
    # planted gold = pages born from the same source document; recall on
    # these must be 1.0.  Precision is measured against the brute-force
    # single-node oracle instead (pipelines/oracle.py, see tests) —
    # the corpus itself contains legitimate cross-document near-dups.
    gold = gold_pairs_from_doc_ids(pages)
    planted = pairwise_f1(pred_pairs, gold, num_partitions=num_partitions)
    out = {"labels": labels, "scored": scored, "planted_pairs": planted}
    if rebuilt_shards is not None:
        out["rebuilt_shards"] = rebuilt_shards
    return out
