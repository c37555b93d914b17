"""Tests for the scale-addition operator families: SimHash pairs,
exact n-gram Jaccard, embedding near-dup/IVF ANN, multimodal stages.

Each distributed operator is checked against a single-process
brute-force oracle on the same inputs (the engine's standing test
pattern — SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _docs_table(texts):
    import ray.data as rd

    ids = [f"{i:06d}" for i in range(len(texts))]
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.string()),
        "text": pa.array(texts, pa.string()),
    })), ids


class TestSimhashPairs:
    def test_recall_and_precision_vs_bruteforce(self, ray_session):
        from elevant_ray.functions.minhash import hamming64, simhash64
        from elevant_ray.stages.dedup import simhash_candidate_pairs

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight").split()
        texts = []
        for i in range(30):
            toks = list(base)
            toks[i % len(toks)] = f"tok{i}"
            texts.append(" ".join(toks))
        texts += [texts[0], " ".join(base)]  # exact dup + near dup

        ds, ids = _docs_table(texts)
        got = {(r["left"], r["right"], r["hamming"]) for r in
               simhash_candidate_pairs(ds, id_col="id", max_hamming=3,
                                       num_partitions=4).take_all()}

        hashes = [simhash64(t) for t in texts]
        want = set()
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                h = hamming64(hashes[i], hashes[j])
                if h <= 3:
                    want.add((ids[i], ids[j], h))
        assert got == want          # exact: banding recall is 1.0
        assert any(h == 0 for _, _, h in got)   # the planted exact dup

    def test_empty_edges_cluster_to_singletons(self, ray_session):
        # texts far apart -> no pairs; dedup_simhash query must still
        # label every doc with its own id (left-outer join path)
        import __ray_entry__ as m

        out = m.queries()["dedup_simhash"](SF_DIR).to_pandas()
        assert len(out) > 0
        assert (out["cluster"] <= out["doc_id"]).all()


class TestNgramJaccard:
    def test_exact_vs_bruteforce(self, ray_session):
        from elevant_ray.functions.tokens import unigrams
        from elevant_ray.stages.dedup import ngram_jaccard_pairs

        texts = [
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",   # near dup
            "one two three four five six seven eight",
            "alpha beta gamma delta epsilon zeta eta theta",  # exact dup
            "tiny",                                           # < n tokens
            "tiny",                                           # dup of tiny
        ]
        ds, ids = _docs_table(texts)
        got = {(r["left"], r["right"]): r["jac"] for r in
               ngram_jaccard_pairs(ds, id_col="id", n=3, threshold=0.3,
                                   num_partitions=4).take_all()}

        def gramset(t):
            toks = unigrams(t)
            return ({" ".join(toks[i:i + 3])
                     for i in range(max(len(toks) - 2, 0))} or {""}) \
                if len(toks) >= 3 else {" ".join(toks)}

        want = {}
        gs = [gramset(t) for t in texts]
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                inter = len(gs[i] & gs[j])
                if not inter:
                    continue
                jac = inter / len(gs[i] | gs[j])
                if round(jac, 6) >= 0.3:
                    want[(ids[i], ids[j])] = round(jac, 6)
        assert got == pytest.approx(want)
        assert got[(ids[0], ids[3])] == 1.0       # exact dup
        assert got[(ids[4], ids[5])] == 1.0       # short-doc dup

        # join-side verification (the beyond-broadcast scale path) must
        # produce the identical pair set
        ds2, _ = _docs_table(texts)
        got_join = {(r["left"], r["right"]): r["jac"] for r in
                    ngram_jaccard_pairs(ds2, id_col="id", n=3, threshold=0.3,
                                        num_partitions=4,
                                        verify="join").take_all()}
        assert got_join == pytest.approx(got)


class TestEmbeddingNearDup:
    def test_pairs_vs_bruteforce(self, ray_session):
        import ray.data as rd

        from elevant_ray.stages.knn import cosine_neardup_pairs

        rng = np.random.RandomState(3)
        vecs = rng.randn(40, 16)
        vecs[7] = vecs[3] + 0.01 * rng.randn(16)   # planted near-dup
        vecs[25] = vecs[11]                        # exact dup
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }))
        got = {(r["left"], r["right"]) for r in
               cosine_neardup_pairs(ds, threshold=0.95).take_all()}

        norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = norm @ norm.T
        want = {(i, j) for i in range(40) for j in range(i + 1, 40)
                if sims[i, j] >= 0.95}
        assert got == want
        assert (3, 7) in got and (11, 25) in got

    def _rand_ds(self, n=400, dim=16, seed=5, planted=24, blocks=8):
        """Random near-orthogonal vectors + `planted` near-dup pairs."""
        import ray.data as rd

        rng = np.random.RandomState(seed)
        vecs = rng.randn(n, dim)
        for k in range(planted):
            a, b = 2 * k, 2 * k + 1
            vecs[b] = vecs[a] + 0.02 * rng.randn(dim)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        })).repartition(blocks)
        norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        return ds, norm @ norm.T

    def test_signlsh_recall_precision_multiblock(self, ray_session):
        """The distributed sign-LSH path (the 10^9-row fix from the
        round-1 verdict) on a multi-block dataset: precision must be
        exactly 1.0 (every pair re-verified), recall ≥ 0.95 vs the
        exact all-pairs oracle, sims bit-equal where both emit."""
        from elevant_ray.stages.knn import (
            cosine_neardup_pairs, signlsh_neardup_pairs)

        ds, sims = self._rand_ds()
        thr = 0.9
        exact = {(r["left"], r["right"]): r["sim"] for r in
                 cosine_neardup_pairs(ds, threshold=thr,
                                      method="exact").take_all()}
        lsh = {(r["left"], r["right"]): r["sim"] for r in
               signlsh_neardup_pairs(ds, threshold=thr).take_all()}
        assert exact  # the planted pairs are above threshold
        assert set(lsh) <= set(exact)              # precision 1.0
        assert len(lsh) >= 0.95 * len(exact)       # recall gate
        for k, v in lsh.items():
            assert v == pytest.approx(exact[k], abs=1e-12)

    def test_signlsh_join_verify_high_dim(self, ray_session):
        """carry_vectors auto-dispatch: at d=128 the vectors must NOT
        ride the band explode — the join-verify plan (slim explode →
        distinct candidates → vector attach joins → einsum) must agree
        with the exact path and with the carrying variant."""
        import ray.data as rd

        from elevant_ray.stages.knn import (cosine_neardup_pairs,
                                            signlsh_neardup_pairs)

        rng = np.random.RandomState(7)
        vecs = rng.randn(200, 128)
        for a, b in [(7, 3), (25, 11), (100, 101), (150, 149)]:
            vecs[a] = vecs[b] + 0.01 * rng.randn(128)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        })).repartition(5)
        exact = {(r["left"], r["right"]): r["sim"] for r in
                 cosine_neardup_pairs(ds, threshold=0.9,
                                      method="exact").take_all()}
        join = {(r["left"], r["right"]): r["sim"] for r in
                signlsh_neardup_pairs(ds, threshold=0.9).take_all()}
        carry = {(r["left"], r["right"]): r["sim"] for r in
                 signlsh_neardup_pairs(ds, threshold=0.9,
                                       carry_vectors=True).take_all()}
        assert set(join) <= set(exact)
        assert len(join) >= 0.95 * len(exact)
        assert set(join) == set(carry)
        for k, v in join.items():
            assert v == pytest.approx(exact[k], abs=1e-12)

    def test_signlsh_hot_bucket_star_chain(self, ray_session):
        """A mega-cluster of identical vectors overflows `max_block`:
        the bucket degrades to verified hub-star + adjacent-chain
        pairs — connectivity over the cluster must survive (the
        downstream-CC guarantee), precision stays 1.0."""
        import ray.data as rd

        from elevant_ray.stages.knn import signlsh_neardup_pairs

        rng = np.random.RandomState(11)
        base = rng.randn(16)
        n_clust, n_other = 120, 60
        vecs = [base + 0.001 * rng.randn(16) for _ in range(n_clust)]
        vecs += [rng.randn(16) for _ in range(n_other)]
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        })).repartition(4)
        pairs = signlsh_neardup_pairs(ds, threshold=0.99,
                                      max_block=16).take_all()
        # precision: every emitted pair really is ≥ threshold
        mat = np.asarray(vecs)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        parent = list(range(len(vecs)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs:
            a, b = r["left"], r["right"]
            assert float(mat[a] @ mat[b]) >= 0.99
            parent[find(a)] = find(b)
        roots = {find(i) for i in range(n_clust)}
        assert len(roots) == 1  # the whole cluster stays connected

    def test_auto_dispatch_scale_cutoff(self, ray_session, monkeypatch):
        """method='auto' beyond the broadcast cutoff must route to the
        LSH path and still find every planted near-dup here (recall at
        sim≈1 is 1 − (1−p^r)^bands ≈ 1)."""
        from elevant_ray.stages.knn import cosine_neardup_pairs

        ds, sims = self._rand_ds(n=120, planted=8, blocks=4)
        thr = 0.95
        exact = {(r["left"], r["right"]) for r in
                 cosine_neardup_pairs(ds, threshold=thr,
                                      method="exact").take_all()}
        monkeypatch.setenv("ELEVANT_RAY_BROADCAST_CUTOFF", "0")
        auto = {(r["left"], r["right"]) for r in
                cosine_neardup_pairs(ds, threshold=thr).take_all()}
        planted = {(2 * k, 2 * k + 1) for k in range(8)}
        assert planted <= auto
        assert auto <= exact

    def test_ivf_recall_vs_bruteforce(self, ray_session):
        import __ray_entry__ as m

        brute = m.queries()["knn_cosine"](SF_DIR).to_pandas()
        ivf = m.queries()["knn_ivf"](SF_DIR).to_pandas()
        b = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
        v = {(r.query_id, r.neighbor_id) for r in ivf.itertuples()}
        recall = len(b & v) / len(b)
        assert recall >= 0.5, f"IVF recall@5 {recall:.2f}"
        assert len(ivf) == len(brute)


class TestMultimodal:
    def test_media_schema_and_determinism(self, ray_session):
        from elevant_ray.stages.multimodal import synth_media_batch

        batch = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64())})
        m1, m2 = synth_media_batch(batch), synth_media_batch(batch)
        assert m1.equals(m2)                       # deterministic payloads
        kinds = set(m1.column("kind").to_pylist())
        assert kinds == {"image", "audio", "video"}
        for row in m1.to_pylist():
            if row["kind"] == "image":
                assert len(row["payload"]) == row["width"] * row["height"]

    def test_actor_pool_stages_end_to_end(self, ray_session):
        import ray.data as rd

        from elevant_ray.stages.multimodal import media_features

        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(30), pa.int64())}))
        images, audio, frames = media_features(docs, concurrency=2,
                                               batch_size=8)
        img = images.to_pandas()
        assert len(img) == 10                      # doc_id % 3 == 0
        assert all(len(v) == 16 for v in img["feature"])
        assert (img["px_mean"] > 0).all()

        aud = audio.to_pandas()
        assert len(aud) == 10
        assert all(len(e) == n for e, n in zip(aud["energy"],
                                               aud["n_windows"]))

        fr = frames.to_pandas()
        assert len(fr) > 0
        # every sampled frame is a full-frame byte slice
        assert set(fr["frame_idx"]) <= set(range(0, 8, 2))

    def test_feature_stage_deterministic_across_runs(self, ray_session):
        import __ray_entry__ as m

        a = m.queries()["multimodal_features"](SF_DIR).to_pandas()
        b = m.queries()["multimodal_features"](SF_DIR).to_pandas()
        assert a.equals(b)
        assert (a["dim"] == 16).all()


def test_pair_intersections_property():
    """_pair_intersections (the shared counter behind the containment
    and Jaccard twins) must agree with brute-force intersect1d on
    randomized gram multisets, including empty docs and all-shared
    grams."""
    import numpy as np

    from elevant_ray.stages.dedup import _pair_intersections

    rng = np.random.default_rng(7)
    for trial in range(60):
        n_docs = int(rng.integers(0, 12))
        vocab = int(rng.integers(1, 14))
        grams = []
        for _ in range(n_docs):
            k = int(rng.integers(0, vocab + 1))
            g = rng.choice(vocab, size=k, replace=False).astype(np.int64)
            grams.append(np.sort(g))
        keys, counts, sizes = _pair_intersections(grams)
        got = dict(zip(keys.tolist(), counts.tolist()))
        want = {}
        for i in range(n_docs):
            for j in range(i + 1, n_docs):
                inter = len(np.intersect1d(grams[i], grams[j],
                                           assume_unique=True))
                # singleton-gram shares are impossible by construction
                # of the counter's df>=2 floor — but a gram shared by
                # (i, j) has df >= 2 globally, so every nonzero
                # intersection must be reported exactly
                if inter:
                    want[i * n_docs + j] = inter
        assert got == want, (trial, got, want)
        assert sizes.tolist() == [len(g) for g in grams]


def test_pair_intersections_volume_bailout():
    import numpy as np
    import pytest

    from elevant_ray.stages.dedup import (_CooccurrenceVolume,
                                          _pair_intersections)

    grams = [np.array([1, 2, 3], np.int64)] * 10
    with pytest.raises(_CooccurrenceVolume):
        _pair_intersections(grams, max_volume=10)


class TestDedupDupkeyAutoFallback:
    """`dedup_first_by` must never broadcast a corpus-scale dup-key set:
    when the measured ≥2-count key set exceeds ELEVANT_RAY_DUPKEY_CUTOFF
    it switches to the plain packed-min groupby automatically."""

    def _adversarial(self):
        # all-duplicate corpus: EVERY key collides, so the dup-key set
        # is as large as the distinct-key set — the pathological case
        # the old comment told users to handle with prefilter=False
        import ray.data as rd

        keys = [f"k{i:04d}" for i in range(200)] * 3
        ts = list(range(len(keys)))
        return rd.from_arrow(pa.table({
            "url": pa.array(keys, pa.string()),
            "warc_ts": pa.array(ts, pa.int64()),
            "text": pa.array([f"t{v}" for v in ts], pa.string()),
        }))

    def _expect(self):
        # keep-first: min warc_ts per key = the first 200 rows
        return {f"k{i:04d}": (i, f"t{i}") for i in range(200)}

    def _check(self, ds):
        from elevant_ray.stages.dedup import dedup_first_by

        out = dedup_first_by(ds, key="url", order_col="warc_ts").to_pandas()
        got = {r.url: (r.warc_ts, r.text) for r in out.itertuples()}
        assert got == self._expect()

    def test_forced_fallback_matches(self, ray_session, monkeypatch):
        # force the distributed counting path AND a zero dup-key budget:
        # the auto-fallback packed-min route must produce identical rows
        monkeypatch.setenv("ELEVANT_RAY_BROADCAST_CUTOFF", "0")
        monkeypatch.setenv("ELEVANT_RAY_DUPKEY_CUTOFF", "0")
        self._check(self._adversarial())

    def test_broadcast_route_still_matches(self, ray_session, monkeypatch):
        # same corpus, ample dup-key budget: the routed broadcast path
        # (the conformance default under BROADCAST_CUTOFF=0) unchanged
        monkeypatch.setenv("ELEVANT_RAY_BROADCAST_CUTOFF", "0")
        monkeypatch.delenv("ELEVANT_RAY_DUPKEY_CUTOFF", raising=False)
        self._check(self._adversarial())
