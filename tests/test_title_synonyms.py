"""Unit coverage for the title-synonym set-union stage
(stages/dims.title_synonym_sets; reference dataflow
``scripts/extract_title_synonyms.py:12-33``): explode bold-span
synonyms from extracted pages, co-group into sorted distinct url sets.

The tricky synthesis edge: a ONE-token document's mirror page
(doc_id % 10 == 7) perturbs its only token — which is also the bold
first token — to ``variant``, so the mirror contributes a different
synonym than the primary page.  The SQL oracle special-cases this; the
Ray path must agree by construction (it reads the actual spans).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _pages_ds(doc_ids, texts):
    from elevant_ray.functions.extract import extract_batch
    from elevant_ray.sources.pages import synth_pages_batch

    docs = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(doc_ids), pa.string()),
    })
    return ray.data.from_arrow(extract_batch(synth_pages_batch(docs)))


def _sets(ds):
    df = ds.to_pandas()
    return {r.synonym: (r.urls, int(r.n_urls)) for r in df.itertuples()}


def test_single_token_mirror_contributes_variant_synonym(ray_session):
    from elevant_ray.stages.dims import title_synonym_sets

    # doc 17: %10==7 → mirrored; a single-token text puts the perturbed
    # token at position 0 (the bold span) on the mirror page
    out = _sets(title_synonym_sets(_pages_ds([17], ["Solo"])))
    assert set(out) == {"Solo", "variant"}
    assert out["Solo"][1] == 1                      # primary url only
    assert out["variant"] == ("https://mirror.example.com/copy/17", 1)


def test_shared_synonym_unions_urls_distinct_and_sorted(ray_session):
    from elevant_ray.sources.pages import page_url
    from elevant_ray.stages.dims import title_synonym_sets

    # docs 3 and 11 share the bold first token; 11 (%25==11) also emits
    # an exact-duplicate url row which must NOT double-count
    out = _sets(title_synonym_sets(
        _pages_ds([3, 11], ["Shared one two", "Shared three four"])))
    assert set(out) == {"Shared"}
    urls, n = out["Shared"]
    assert n == 2
    assert urls == ",".join(sorted([page_url(3), page_url(11)]))
