"""Multimodal columns: image / audio / video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The decode libraries (PIL, ffmpeg, torchaudio, …) are NOT in this
container, so the decode step is STUBBED behind an import-try: when the
real library is absent each stage falls back to a clearly-marked
deterministic fake decoder.  Everything Ray-side is real and tested —
schema, actor-pool signature (state in ``__init__``, work in
``__call__``), batch sizing, zero-copy binary handling, output layout —
so swapping the stub for a real decoder is a one-function change.

Schema conventions (Arrow):
    media(doc_id int64, kind string, payload binary,
          width int32, height int32, sample_rate int32, n_frames int32)

Stages:
    - ImageFeatureStage: payload → fixed-size feature vector + stats
    - AudioFeatureStage: payload → frame energies (windowed mean)
    - frame_sample_batch: "video" payload → every k-th frame slice

Sizing note (100 TB path): binary payloads dominate block size — run
these stages with small ``batch_size`` (≤ 64) and let the object store
stream blocks; drop the payload column immediately after featurization.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, …) → deterministic fake media rows.

    Payload bytes are a pure function of doc_id (blake2b keystream), so
    every downstream feature is reproducible across runs/partitions."""
    ids = batch.column("doc_id").to_pylist()
    kinds, payloads, widths, heights, rates, frames = [], [], [], [], [], []
    for i in ids:
        kind = ("image", "audio", "video")[i % 3]
        w, h = 8 + (i % 5) * 4, 8 + (i % 3) * 4
        n_frames = 1 if kind == "image" else 4 + i % 4
        size = w * h * (n_frames if kind != "audio" else 1)
        if kind == "audio":
            size = 256 + (i % 7) * 32
        stream = bytearray()
        counter = 0
        while len(stream) < size:
            stream += hashlib.blake2b(
                f"{i}:{counter}".encode(), digest_size=32).digest()
            counter += 1
        kinds.append(kind)
        payloads.append(bytes(stream[:size]))
        widths.append(w)
        heights.append(h)
        rates.append(16000 if kind == "audio" else 0)
        frames.append(n_frames)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "sample_rate": pa.array(rates, pa.int32()),
        "n_frames": pa.array(frames, pa.int32()),
    })


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class ImageFeatureStage:
    """Actor-pool stage: decode images + emit a FEATURE_DIM vector.

    Use as::

        media.map_batches(ImageFeatureStage, concurrency=(2, 8),
                          batch_size=32, batch_format="pyarrow")

    ``__init__`` (once per actor) holds the decoder handle / model; the
    per-batch ``__call__`` only does vectorized work.  Without PIL the
    decode is a DETERMINISTIC STUB: the raw payload bytes are treated as
    the pixel buffer (documented fake — real decode is a drop-in)."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        self.pil = _try_import_pil()   # None in this container → stub

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.pil is not None:
            import io

            img = self.pil.open(io.BytesIO(payload)).convert("L")
            return np.asarray(img, dtype=np.float64)
        # STUB decode: payload bytes as row-major grayscale pixels
        buf = np.frombuffer(payload[: width * height], dtype=np.uint8)
        if len(buf) < width * height:
            buf = np.pad(buf, (0, width * height - len(buf)))
        return buf.reshape(height, width).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, means, stds = [], [], [], []
        for row in zip(batch.column("doc_id").to_pylist(),
                       batch.column("kind").to_pylist(),
                       batch.column("payload").to_pylist(),
                       batch.column("width").to_pylist(),
                       batch.column("height").to_pylist()):
            doc_id, kind, payload, w, h = row
            if kind != "image":
                continue
            px = self._decode(payload, w, h)
            # pooled grid features: resize-by-mean to a fixed 4×4 grid
            gh, gw = 4, self.feature_dim // 4
            ys = np.array_split(np.arange(px.shape[0]), gh)
            xs = np.array_split(np.arange(px.shape[1]), gw)
            vec = [float(px[np.ix_(y, x)].mean()) for y in ys for x in xs]
            ids.append(doc_id)
            feats.append(vec)
            means.append(float(px.mean()))
            stds.append(float(px.std()))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "feature": pa.array(feats, pa.list_(pa.float64())),
            "px_mean": pa.array(means, pa.float64()),
            "px_std": pa.array(stds, pa.float64()),
        })


class AudioFeatureStage:
    """Actor-pool stage: windowed energy features over audio payloads.

    STUB decode (no torchaudio/ffmpeg here): payload bytes are read as
    uint8 PCM-ish samples; real decode is a drop-in replacement in
    ``_decode``."""

    def __init__(self, window: int = 64):
        self.window = window

    def _decode(self, payload: bytes) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.uint8).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_windows, energies = [], [], []
        for doc_id, kind, payload in zip(batch.column("doc_id").to_pylist(),
                                         batch.column("kind").to_pylist(),
                                         batch.column("payload").to_pylist()):
            if kind != "audio":
                continue
            samples = self._decode(payload)
            nw = max(len(samples) // self.window, 1)
            wins = np.array_split(samples[: nw * self.window], nw)
            e = [float(np.sqrt((w ** 2).mean())) for w in wins]
            ids.append(doc_id)
            n_windows.append(nw)
            energies.append(e)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_windows": pa.array(n_windows, pa.int32()),
            "energy": pa.array(energies, pa.list_(pa.float64())),
        })


def frame_sample_batch(batch: pa.Table, every: int = 2) -> pa.Table:
    """"Video" payloads → every `every`-th frame as its own row
    (doc_id, frame_idx, frame binary).  Stateless; real frame extraction
    (ffmpeg) is a drop-in for the byte-slice stub."""
    ids, idxs, frames = [], [], []
    for doc_id, kind, payload, w, h, nf in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("n_frames").to_pylist()):
        if kind != "video":
            continue
        fsize = w * h
        for f in range(0, nf, every):
            ids.append(doc_id)
            idxs.append(f)
            frames.append(payload[f * fsize:(f + 1) * fsize])
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "frame_idx": pa.array(idxs, pa.int32()),
        "frame": pa.array(frames, pa.binary()),
    })


def media_features(documents, concurrency=(1, 4),
                   batch_size: Optional[int] = 64):
    """documents → media → per-kind feature tables (image, audio, video
    frame index).  The media Dataset is materialized once (three
    consumers)."""
    media = documents.map_batches(synth_media_batch,
                                  batch_format="pyarrow").materialize()
    images = media.map_batches(ImageFeatureStage, concurrency=concurrency,
                               batch_size=batch_size, batch_format="pyarrow")
    audio = media.map_batches(AudioFeatureStage, concurrency=concurrency,
                              batch_size=batch_size, batch_format="pyarrow")
    frames = media.map_batches(frame_sample_batch, batch_format="pyarrow")
    return images, audio, frames


VARIANT_ID_OFFSET = 1 << 40


def add_media_variants(batch: pa.Table, every: int = 8) -> pa.Table:
    """Append a near-duplicate variant row (one payload byte flipped)
    for every ``every``-th doc — the planted near-dups that a
    perceptual-hash dedup must recover.  Variant ids live at
    doc_id + VARIANT_ID_OFFSET so originals and variants stay
    distinguishable.  Stateless map_batches kernel."""
    cols = {c: batch.column(c).to_pylist() for c in batch.column_names}
    n = len(cols["doc_id"])
    out = {c: list(v) for c, v in cols.items()}
    for r in range(n):
        i = cols["doc_id"][r]
        if i % every != 5:
            continue
        p = bytearray(cols["payload"][r])
        if not p:
            continue
        p[len(p) // 2] ^= 0x01
        for c in batch.column_names:
            out[c].append(cols[c][r])
        out["doc_id"][-1] = i + VARIANT_ID_OFFSET
        out["payload"][-1] = bytes(p)
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "kind": pa.array(out["kind"], pa.string()),
        "payload": pa.array(out["payload"], pa.binary()),
        "width": pa.array(out["width"], pa.int32()),
        "height": pa.array(out["height"], pa.int32()),
        "sample_rate": pa.array(out["sample_rate"], pa.int32()),
        "n_frames": pa.array(out["n_frames"], pa.int32()),
    })


class PHashStage:
    """Actor-pool stage: payload → 64-bit block-mean perceptual hash.

    Real pHash (DCT over a decoded 32×32 grayscale image) is a drop-in
    for ``_hash_payload`` when PIL is present; without it the
    DETERMINISTIC STUB hashes the raw payload: split into 64 equal byte
    blocks, bit k = (mean of block k > 127.5), computed in exact
    integer arithmetic (2·sum > 255·len).  A single flipped payload
    byte moves at most one block mean slightly → Hamming distance ≤ 1,
    which is what gives the planted variants their near-dup
    signature."""

    def __init__(self):
        self.pil = _try_import_pil()

    @staticmethod
    def _hash_payload(payload: bytes) -> int:
        a = np.frombuffer(payload, dtype=np.uint8)
        blocks = np.array_split(a, 64)
        h = 0
        for k, b in enumerate(blocks):
            if len(b) and 2 * int(b.sum(dtype=np.int64)) > 255 * len(b):
                h |= 1 << k
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hs = [self._hash_payload(p)
              for p in batch.column("payload").to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "phash": pa.array(np.array(hs, dtype=np.uint64)
                              .astype(np.int64)),
        })


def phash_near_pairs(hashes, max_hamming: int = 3,
                     num_partitions: int = 16):
    """Exact Hamming-≤k pairs over 64-bit perceptual hashes via band
    LSH: 4 disjoint 16-bit bands — pigeonhole guarantees any pair with
    Hamming ≤ 3 agrees on ≥ 1 band, so recall is EXACTLY 1.0 (no
    probabilistic miss).  One band-key shuffle; within-bucket pairs are
    verified with a vectorized popcount.  Input: Dataset(doc_id int64,
    phash int64)."""
    import pandas as pd

    from elevant_ray.stages.util import bucketed_group_apply

    def explode_bands(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        ph = b.column("phash").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out_k, out_i, out_h = [], [], []
        for band in range(4):
            key = (ph >> (16 * band)) & np.int64(0xFFFF)
            out_k.append(key + np.int64(band << 16))
            out_i.append(ids)
            out_h.append(ph)
        return pa.table({
            "band": pa.array(np.concatenate(out_k), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_i), pa.int64()),
            "phash": pa.array(np.concatenate(out_h), pa.int64())})

    exploded = hashes.map_batches(explode_bands, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from elevant_ray.stages.graph import group_starts_sizes
        from elevant_ray.stages.util import within_group_pairs
        g = g.sort_values(["band", "doc_id"], kind="stable") \
            .drop_duplicates(["band", "doc_id"])
        ids = g["doc_id"].to_numpy(np.int64)
        ph = g["phash"].to_numpy(np.int64).view(np.uint64)
        starts, sizes = group_starts_sizes(g["band"].to_numpy(np.int64))
        i, j = within_group_pairs(starts, sizes)
        if len(i) == 0:
            return pd.DataFrame({"left": pd.Series([], dtype="int64"),
                                 "right": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        x = ph[i] ^ ph[j]
        ham = np.zeros(len(x), np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"left": ids[i][keep], "right": ids[j][keep],
                             "hamming": ham[keep]})

    pairs = bucketed_group_apply(exploded, "band", per_bucket)

    def dedupe(b: pa.Table) -> pa.Table:
        return b.group_by(["left", "right", "hamming"]).aggregate([])

    # a pair found by several bands carries the SAME hamming, so a
    # per-batch key-dedupe suffices structurally; the caller performs
    # the (tiny, ≤ 4× duplicated) global dedupe on the survivors
    return pairs.map_batches(dedupe, batch_format="pyarrow")
