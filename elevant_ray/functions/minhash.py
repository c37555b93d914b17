"""MinHash / SimHash sketches for near-duplicate blocking.

Vectorized (numpy) kernels used by ``stages/dedup.py`` and
``stages/blocking.py``.  All randomness is a fixed seeded permutation
table so sketches are deterministic across runs and across cluster sizes
(required for resumable, re-runnable blocking at 100 TB).

Standard constructions (Broder '97 minhash; Charikar '02 simhash;
Leskovec/Rajaraman/Ullman MMDS ch.3 banding) — public knowledge, no
reference counterpart (the reference has no near-dup machinery; this is
the engine's scale addition demanded by the north rule's "MinHash/LSH
blocking stage over text shingles").
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np

_MERSENNE = (1 << 61) - 1
_SEED = 0x5EED_E1EF


def _perm_table(num_perm: int) -> np.ndarray:
    """(num_perm, 2) int64 table of (a, b) pairs for h'(x) = (a*x+b) % p."""
    rng = np.random.RandomState(_SEED)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return np.stack([a, b], axis=1)


_PERMS_CACHE: dict = {}


def perms(num_perm: int) -> np.ndarray:
    if num_perm not in _PERMS_CACHE:
        _PERMS_CACHE[num_perm] = _perm_table(num_perm)
    return _PERMS_CACHE[num_perm]


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct hashed k-grams of unigram tokens (word shingles) as uint64."""
    from elevant_ray.functions.tokens import unigrams

    ws = unigrams(text)
    if not ws:
        return np.zeros(1, dtype=np.uint64)
    if len(ws) < k:
        grams = [" ".join(ws)]
    else:
        grams = [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
         for g in set(grams)),
        dtype=np.uint64, count=len(set(grams)),
    )
    return out


def minhash_signature(shingles: np.ndarray, num_perm: int = 128) -> np.ndarray:
    """(num_perm,) uint64 minhash signature of a shingle-hash set."""
    p = perms(num_perm)
    x = shingles.astype(np.int64)[:, None] & np.int64(0x7FFF_FFFF_FFFF_FFFF)
    # (n_shingles, num_perm) permuted values; min over shingles
    vals = (x * p[:, 0][None, :] + p[:, 1][None, :]) % _MERSENNE
    return vals.min(axis=0).astype(np.uint64)


def band_keys(sig: np.ndarray, bands: int = 16) -> List[str]:
    """LSH band keys "band:hash" — docs sharing any key are candidates."""
    rows = len(sig) // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * rows:(b + 1) * rows].tobytes()
        h = hashlib.blake2b(chunk, digest_size=8).hexdigest()
        keys.append(f"{b}:{h}")
    return keys


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def simhash64(text: str) -> int:
    """64-bit SimHash over unigram tokens (Charikar '02)."""
    from elevant_ray.functions.tokens import unigrams

    acc = np.zeros(64, dtype=np.int64)
    for w in unigrams(text):
        digest = hashlib.blake2b(w.encode(), digest_size=8).digest()
        bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8), bitorder="little")
        acc += bits.astype(np.int64) * 2 - 1
    packed = np.packbits(acc > 0, bitorder="little").tobytes()
    return int.from_bytes(packed, "little")


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
