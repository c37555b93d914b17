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


_TOKEN_CACHE: dict = {}
_TOKEN_CACHE_MAX = 1 << 20


def token_hashes(tokens: List[str]) -> np.ndarray:
    """uint64 blake2b hash per token, memoized per worker process —
    token frequency is Zipfian, so the cache absorbs almost every call
    after warmup (the blake2b itself, not the loop, was the hot cost)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    cache = _TOKEN_CACHE
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            if len(cache) < _TOKEN_CACHE_MAX:
                cache[t] = h
        out[i] = h
    return out


# fixed odd mixing constants: position-sensitive gram hash = Σ h_i·c_i
_MIX_RNG = np.random.RandomState(_SEED ^ 0xA5A5)
_MIX_COEF = (_MIX_RNG.randint(0, 1 << 62, size=64, dtype=np.int64)
             .astype(np.uint64) | np.uint64(1))


def _avalanche(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized — spreads the linear mix."""
    x = x.copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def shingle_hashes(text: str, k: int = 5, tokens: List[str] = None) -> np.ndarray:
    """Distinct hashed k-grams of unigram tokens (word shingles) as
    uint64 — vectorized: per-token memoized hashes combined over a
    sliding window with position constants + splitmix64 finalizer
    (wraparound uint64 arithmetic; order-sensitive, deterministic)."""
    from elevant_ray.functions.tokens import unigrams

    ws = unigrams(text) if tokens is None else tokens
    if not ws:
        return np.zeros(1, dtype=np.uint64)
    th = token_hashes(ws)
    kk = min(k, len(ws))
    windows = np.lib.stride_tricks.sliding_window_view(th, kk)
    grams = (windows * _MIX_COEF[:kk]).sum(axis=1, dtype=np.uint64)
    return np.unique(_avalanche(grams))


def _permuted(shingles: np.ndarray, num_perm: int) -> np.ndarray:
    """(n_shingles, num_perm) uint64 hash matrix via multiply–xorshift
    (Dietzfelbinger multiply-shift family + avalanche) — no integer
    division: int64 modulo is scalar-at-a-time on x86 and dominated the
    whole sketch cost."""
    a = perms(num_perm)[:, 0].astype(np.uint64) | np.uint64(1)
    b = perms(num_perm)[:, 1].astype(np.uint64)
    vals = shingles.astype(np.uint64)[:, None] * a[None, :] + b[None, :]
    vals ^= vals >> np.uint64(33)
    vals *= np.uint64(0xFF51AFD7ED558CCD)
    vals ^= vals >> np.uint64(29)
    return vals


_EMPTY_BIN = np.uint64(0xFFFFFFFFFFFFFFFF)
_DENSIFY_MIX = (_MIX_RNG.randint(0, 1 << 62, size=256, dtype=np.int64)
                .astype(np.uint64) | np.uint64(1))


def minhash_signature(shingles: np.ndarray, num_perm: int = 128) -> np.ndarray:
    """(num_perm,) uint64 minhash signature of a shingle-hash set."""
    return minhash_signatures_batch([shingles], num_perm=num_perm)[0]


def minhash_signatures_batch(shingle_sets: List[np.ndarray],
                             num_perm: int = 128) -> np.ndarray:
    """(n_docs, num_perm) signatures via ONE-PERMUTATION HASHING with
    densification (Li/Owen/Zhang NIPS'12; Shrivastava & Li ICML'14) —
    public constructions, like the k-permutation form they replace.

    Each (already avalanched) shingle hash is binned by its top
    log2(num_perm) bits and the per-(doc, bin) minimum is one
    ``np.minimum.at`` scatter — a single pass over the shingles where
    the k-permutation form paid num_perm multiply–xorshift applications
    per shingle (it dominated the whole blocking stage: 64× the work
    for the same banding recall).  Empty bins are densified by circular
    doubling-distance borrowing, then remixed with a bin-indexed odd
    constant so borrowed bins only collide when their source bins do.
    P(sig_a[j] == sig_b[j]) ≈ Jaccard(a, b) still holds bin-wise, so
    banding math is unchanged.  ``num_perm`` must be a power of two.
    Deterministic: no RNG at runtime, stable across runs/cluster sizes."""
    n = len(shingle_sets)
    if n == 0:
        return np.zeros((0, num_perm), dtype=np.uint64)
    if num_perm & (num_perm - 1):
        raise ValueError("num_perm must be a power of two")
    lens = np.fromiter((len(s) for s in shingle_sets), dtype=np.int64,
                       count=n)
    flat = (np.concatenate(shingle_sets) if n > 1
            else np.asarray(shingle_sets[0]))
    flat = flat.astype(np.uint64, copy=False)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    shift = np.uint64(64 - int(num_perm).bit_length() + 1)
    bins = (flat >> shift).astype(np.int64)
    sig = np.full(n * num_perm, _EMPTY_BIN, dtype=np.uint64)
    np.minimum.at(sig, doc_idx * num_perm + bins, flat)
    sig = sig.reshape(n, num_perm)
    empty = sig == _EMPTY_BIN
    if empty.any():
        orig_empty = empty
        filled = sig
        d = 1
        while empty.any() and d < num_perm:
            filled = np.where(empty, np.roll(filled, d, axis=1), filled)
            empty = filled == _EMPTY_BIN
            d <<= 1
        # bin-indexed remix so a borrowed value matches across docs only
        # when the borrowed-from bins match (plain copies would make all
        # empty bins of sparse docs collide pairwise)
        mix = _DENSIFY_MIX[:num_perm][None, :]
        sig = np.where(orig_empty, _avalanche(filled * mix), filled)
    return sig


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


def simhash64(text: str, tokens: List[str] = None) -> int:
    """64-bit SimHash over unigram tokens (Charikar '02) — vectorized:
    one unpackbits over the whole token-hash array per document."""
    from elevant_ray.functions.tokens import unigrams

    ws = unigrams(text) if tokens is None else tokens
    if not ws:
        return 0
    th = token_hashes(ws)
    bits = np.unpackbits(th.astype("<u8").view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little")
    acc = bits.sum(axis=0, dtype=np.int64) * 2 - len(ws)
    packed = np.packbits(acc > 0, bitorder="little").tobytes()
    return int.from_bytes(packed, "little")


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
