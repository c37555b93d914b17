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
