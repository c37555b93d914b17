"""Dimension-table builds — the engine's version of the reference's
``make generate-wikipedia-mappings`` DAG (Makefile:212-226), recast as
Ray Data aggregations over the pages table.

- ``link_frequencies``: (anchor alias, target) → count over all
  hyperlinks (``scripts/get_link_frequencies.py:21-47``).  Map-side
  partial Counters → groupby sum: the shuffle carries distinct
  (alias, target) per block, not every link occurrence — this is the
  hot-key (Zipfian alias) mitigation the north rule requires; explicit
  key salting is unnecessary once partials collapse per-block
  duplicates, because the residual groupby is on pre-aggregated rows.
- ``most_popular_candidates``: alias → argmax-by-frequency target set
  (ties kept), per ``scripts/create_databases.py:107-126``.
- ``alias_to_qids`` / ``entity_popularity``: candidate and popularity
  dims (``entity_database.py:264-274, 379-384``).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List

import pandas as pd
import pyarrow as pa


def _partial_link_counts(batch: pa.Table) -> pa.Table:
    counts: Counter = Counter()
    texts = batch.column("text").to_pylist()
    links = batch.column("hyperlinks").to_pylist()
    for text, hls in zip(texts, links):
        for hl in hls or ():
            alias = text[hl["begin"]:hl["end"]]
            counts[(alias, hl["target"])] += 1
    aliases = [k[0] for k in counts]
    targets = [k[1] for k in counts]
    return pa.table({
        "alias": pa.array(aliases, pa.string()),
        "target": pa.array(targets, pa.string()),
        "partial": pa.array(list(counts.values()), pa.int64()),
    })


def link_frequencies(pages):
    """pages(text, hyperlinks) → link_freq(alias, target, freq)."""
    from ray.data.aggregate import Sum

    partials = pages.map_batches(_partial_link_counts, batch_format="pyarrow")
    return partials.groupby(["alias", "target"]).aggregate(
        Sum("partial", alias_name="freq"))


def most_popular_candidates(link_freq):
    """alias → targets with max freq (ties kept, sorted) + the min-target
    pick the wikipedia-strategy baseline uses (baseline_linker.py:77-80).

    Bucketed co-group (util.bucketed_group_apply): aliases are Zipfian
    and numerous, so the per-key logic runs vectorized over each hash
    bucket instead of one Python map_groups call per alias."""
    from elevant_ray.stages.util import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["alias", "freq", "target"],
                          ascending=[True, False, True], kind="stable")
        best = g.drop_duplicates("alias")[["alias", "target", "freq"]]
        ties = g.merge(best[["alias", "freq"]], on=["alias", "freq"])
        cands = ties.groupby("alias", as_index=False).agg(
            candidates=("target", list))
        out = best.merge(cands, on="alias")
        out = out.rename(columns={"target": "top_candidate"})
        return out[["alias", "candidates", "top_candidate", "freq"]]

    return bucketed_group_apply(link_freq, "alias", per_bucket)


def entity_popularity(link_freq):
    """target (entity) → summed link frequency (entity_database.py:379-384)."""
    from ray.data.aggregate import Sum

    return link_freq.groupby("target").aggregate(Sum("freq", alias_name="popularity"))


def alias_candidates(link_freq):
    """alias → sorted distinct candidate targets (entity_database.py:264-274)."""
    from elevant_ray.stages.util import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g[["alias", "target"]].drop_duplicates()
             .sort_values(["alias", "target"], kind="stable"))
        return g.groupby("alias", as_index=False).agg(qids=("target", list))

    return bucketed_group_apply(link_freq, "alias", per_bucket)


def _explode_synonyms(batch: pa.Table) -> pa.Table:
    syns: List[str] = []
    urls: List[str] = []
    for text, spans, url in zip(batch.column("text").to_pylist(),
                                batch.column("title_synonyms").to_pylist(),
                                batch.column("url").to_pylist()):
        for sp in spans or ():
            syns.append(text[sp["begin"]:sp["end"]])
            urls.append(url)
    return pa.table({
        "synonym": pa.array(syns, pa.string()),
        "url": pa.array(urls, pa.string()),
    })


def title_synonym_sets(pages):
    """Bold-span title synonym → sorted distinct page urls (group
    set-union, ``scripts/extract_title_synonyms.py:12-33`` semantics).
    Explode inside ``map_batches`` then a bucketed vectorized co-group;
    the list is emitted as a joined string plus a count so the result
    value-hashes against a SQL oracle."""
    from elevant_ray.stages.util import bucketed_group_apply

    pairs = pages.map_batches(_explode_synonyms, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = (g[["synonym", "url"]].drop_duplicates()
             .sort_values(["synonym", "url"], kind="stable"))
        out = d.groupby("synonym", as_index=False).agg(
            urls=("url", ",".join), n_urls=("url", "size"))
        out["n_urls"] = out["n_urls"].astype("int64")
        return out

    return bucketed_group_apply(pairs, "synonym", per_bucket)


def to_prior_dicts(link_freq) -> Dict[str, object]:
    """Materialize the prior-linker dims: nested link-frequency dict
    {alias: {qid: freq}} (entity_database.py:78-79 shape) and its
    inversion {qid: set(aliases)} (get_entity_aliases side).  Same
    small-dim materialization caveat as ``to_broadcast_dicts``."""
    pdf = link_freq.to_pandas()
    freqs: Dict[str, Dict[str, int]] = {}
    aliases: Dict[str, set] = {}
    if pdf.empty:  # empty corpus → empty dims (columns may be absent)
        return {"link_frequencies": freqs, "entity_aliases": aliases}
    for alias, target, freq in pdf[["alias", "target", "freq"]].itertuples(index=False):
        freqs.setdefault(alias, {})[target] = int(freq)
        aliases.setdefault(target, set()).add(alias)
    return {"link_frequencies": freqs, "entity_aliases": aliases}


def to_broadcast_dicts(link_freq) -> Dict[str, object]:
    """Materialize the (small) dim tables into plain dicts for actor-pool
    broadcast: {alias: [qids]}, {qid: popularity}.  Dim tables are by
    construction ≲10^7 rows (SURVEY §2.5) — the one intentional
    materialization in the pipeline."""
    pdf = link_freq.to_pandas()
    alias_to_qids: Dict[str, List[str]] = {}
    popularity: Counter = Counter()
    if pdf.empty:
        return {"alias_to_qids": alias_to_qids, "popularity": dict(popularity)}
    for alias, target, freq in pdf[["alias", "target", "freq"]].itertuples(index=False):
        alias_to_qids.setdefault(alias, []).append(target)
        popularity[target] += int(freq)
    for alias in alias_to_qids:
        alias_to_qids[alias] = sorted(set(alias_to_qids[alias]))
    return {"alias_to_qids": alias_to_qids, "popularity": dict(popularity)}


def abstracts_mapping(articles, title_to_qid, redirects=None,
                      title_col: str = "title", text_col: str = "text",
                      sections_col: str = "sections",
                      order_col: str = "url"):
    """QID → (title, abstract) mapping with duplicate accounting —
    the abstracts-mapping operator
    (``scripts/create_abstracts_mapping.py:14-50``).

    Per article: abstract = first-section text after the title block
    (functions/extract.abstract_span, parity with article.py:118-135),
    stripped and newlines→spaces; title maps through the
    redirect-chased title→QID dimension (knowledge_base_mapper
    semantics).  Unknown titles are dropped (the reference's
    ``mapping_errors`` path — compute the count upstream if needed).

    Per-QID reduction is ONE packed-min hash aggregate + Count: the
    winner is the FIRST article by ``order_col`` (the reference's
    in-memory dict keeps the LAST in file order — an order-dependent
    accident; a distributed engine needs a deterministic total order),
    and ``n_articles`` counts every article mapped to the QID, so
    ``n_articles - 1`` summed is the reference's
    ``multi_mapping_errors`` metric.  Scales as a combiner aggregate:
    no driver materialization, one keyed shuffle.

    Returns Dataset(qid, title, abstract, n_articles).
    """
    import base64
    import pickle

    from ray.data.aggregate import Count, Min

    from elevant_ray.functions.extract import abstract_span
    from elevant_ray.functions.normalize import NIL, NO_MAPPING, wikidata_qid

    redirects = redirects or {}

    def to_mapped(batch: pa.Table) -> pa.Table:
        qids, packed = [], []
        for row in batch.select(
                [title_col, text_col, sections_col, order_col]).to_pylist():
            qid = wikidata_qid(row[title_col], title_to_qid, redirects)
            if qid in (NIL, NO_MAPPING):
                continue
            text = row[text_col]
            b, e = abstract_span(text, row[sections_col])
            abstract = text[b:e].strip().replace("\n", " ")
            qids.append(qid)
            packed.append(str(row[order_col]) + "\x00" + base64.b64encode(
                pickle.dumps((row[title_col], abstract),
                             protocol=4)).decode())
        return pa.table({"qid": pa.array(qids, pa.string()),
                         "_packed": pa.array(packed, pa.string())})

    winners = articles.map_batches(to_mapped, batch_format="pyarrow") \
        .groupby("qid").aggregate(Min("_packed", alias_name="_packed"),
                                  Count(alias_name="n_articles"))

    def unpack(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        titles, abstracts = [], []
        for s in batch.column("_packed").to_pylist():
            title, abstract = pickle.loads(
                base64.b64decode(s.split("\x00", 1)[1]))
            titles.append(title)
            abstracts.append(abstract)
        return pa.table({
            "qid": batch.column("qid"),
            "title": pa.array(titles, pa.string()),
            "abstract": pa.array(abstracts, pa.string()),
            "n_articles": pc.cast(batch.column("n_articles"), pa.int64())})

    return winners.map_batches(unpack, batch_format="pyarrow")
