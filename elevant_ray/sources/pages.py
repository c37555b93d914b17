"""Deterministic `pages` synthesis — the engine's Common-Crawl-style input.

BASELINE.json's ``input_hint`` fixes the input schema:
``pages(url string, warc_ts timestamp[us], html binary, text string,
lang string)``.  No external data exists in this sandbox, so pages are
synthesized *deterministically* (pure function of ``doc_id`` and the
driver-provided ``documents`` table text — seed-free, partition-stable)
with every markup branch of the extractor represented (FIXTURES.md F1):

- ``<a href="Entity%20K">tok</a>`` hyperlinks at arithmetic positions;
- a ``<b>...</b>`` title synonym in the first paragraph;
- ``\\nSection::::Part j.\\n`` headers every ~120 tokens;
- a pseudo-tag ``< not a tag >`` on doc_id % 17 == 3;
- URL variants (scheme/www/utm/fragment/trailing-slash) for the
  canonicalization blocking key;
- near-duplicate mirror pages (doc_id % 10 == 7, one token perturbed)
  feeding MinHash dedup + clustering;
- exact-duplicate urls with later warc_ts (doc_id % 25 == 11) feeding
  dedup-first-by-ts.

The ``text`` column is filled with the extractor's own output; the
extractor itself is differential-tested byte-for-byte against the
reference (tests/test_extract.py), so this column is a valid per-row
oracle downstream.
"""

from __future__ import annotations

import datetime as _dt
from typing import List

import pyarrow as pa

from elevant_ray.functions.extract import extract_page

NUM_ENTITIES = 97
_TS0 = _dt.datetime(2025, 1, 1)

# knuth multiplicative constant for position mixing — keeps link placement
# deterministic but non-periodic relative to the section/paragraph grid
_MIX = 2654435761


def page_url(doc_id: int) -> str:
    """Raw (un-canonical) URL for a document; 5 deterministic variants."""
    base = f"example{doc_id % 50}.com/articles/{doc_id}"
    v = doc_id % 5
    if v == 0:
        return f"https://www.{base}"
    if v == 1:
        return f"http://{base}/"
    if v == 2:
        return f"https://{base}?utm_source=feed&id={doc_id}"
    if v == 3:
        return f"HTTPS://WWW.{base}"
    return f"https://{base}#section-2"


def canonical_expected(doc_id: int) -> str:
    """Closed-form canonical URL (mirrored in oracle SQL)."""
    v = doc_id % 5
    extra = f"?id={doc_id}" if v == 2 else ""
    return f"example{doc_id % 50}.com/articles/{doc_id}" + extra


def entity_title(k: int) -> str:
    return f"Entity {k}"


def build_markup(doc_id: int, text: str, perturb: bool = False) -> str:
    """WikiExtractor-style markup for one document (pure function)."""
    toks = text.split()
    if perturb and toks:
        mid = len(toks) // 2
        toks = toks[:mid] + ["variant"] + toks[mid + 1:]
    parts: List[str] = []
    for p, tok in enumerate(toks):
        if p == 0:
            parts.append(f"<b>{tok}</b>")
        elif (p * _MIX + doc_id) % 13 == 0:
            e = (doc_id + p) % NUM_ENTITIES
            parts.append(f'<a href="Entity%20{e}">{tok}</a>')
        else:
            parts.append(tok)
        if p == 5 and doc_id % 17 == 3:
            parts.append("< not a tag >")
        if p > 0 and p % 120 == 0:
            parts.append(f"\nSection::::Part {p // 120}.\n")
        elif p > 0 and p % 40 == 0:
            parts.append("\n\n")
    return " ".join(parts)


def synth_pages_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, ...) → pages rows (may emit more rows
    than input: mirrors + exact-dup urls).  Stateless map_batches kernel."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist() if "lang" in batch.column_names \
        else ["en"] * len(doc_ids)

    urls: List[str] = []
    tss: List[_dt.datetime] = []
    htmls: List[bytes] = []
    out_texts: List[str] = []
    out_langs: List[str] = []
    out_ids: List[int] = []

    def emit(doc_id: int, url: str, ts: _dt.datetime, markup: str, lang: str):
        urls.append(url)
        tss.append(ts)
        htmls.append(markup.encode("utf-8"))
        out_texts.append(extract_page(markup)[0])
        out_langs.append(lang)
        out_ids.append(doc_id)

    for doc_id, text, lang in zip(doc_ids, texts, langs):
        markup = build_markup(doc_id, text)
        ts = _TS0 + _dt.timedelta(seconds=int(doc_id))
        emit(doc_id, page_url(doc_id), ts, markup, lang or "en")
        if doc_id % 25 == 11:
            # exact-duplicate url, later crawl ts, same content
            emit(doc_id, page_url(doc_id), ts + _dt.timedelta(seconds=100),
                 markup, lang or "en")
        if doc_id % 10 == 7:
            # near-duplicate mirror under a different host
            m2 = build_markup(doc_id, text, perturb=True)
            emit(doc_id, f"https://mirror.example.com/copy/{doc_id}",
                 ts + _dt.timedelta(seconds=7), m2, lang or "en")

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(out_texts, pa.string()),
        "lang": pa.array(out_langs, pa.string()),
        "doc_id": pa.array(out_ids, pa.int64()),
    })


def synth_pages(sf_dir: str, include_doc_id: bool = False,
                shard=None, shard_invert: bool = False):
    """`documents.parquet` → streaming pages Dataset.

    ``doc_id`` is kept only when asked for (test joins); production
    pipelines key on ``url`` as the north rule intends.

    ``shard=(k, n)`` keeps only documents with ``doc_id % n == k`` —
    the unit of partition-granular checkpointing
    (state/checkpoint.run_partitioned_stage).  Every synthesized url
    embeds its doc_id (page_url / the mirror url), so a url never
    crosses shards and per-shard url-dedup equals global url-dedup;
    that is the partitioning assumption the resumable pages stage
    relies on.
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    if shard is not None:
        k, n = shard

        def keep(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            m = ids % n == k
            return b.filter(pa.array(~m if shard_invert else m))

        ds = ds.map_batches(keep, batch_format="pyarrow")
    # the testdata is ONE small parquet file (often one row group) → the
    # read yields one block and every downstream map would run on one
    # core.  Split to ~2×CPUs blocks so synth/extract parallelize.  At
    # production scale the input is thousands of files and this is a
    # near-no-op.
    n_blocks = max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
    pages = ds.repartition(n_blocks) \
        .map_batches(synth_pages_batch, batch_format="pyarrow")
    if not include_doc_id:
        pages = pages.drop_columns(["doc_id"])
    return pages
