"""Dedup sketches: shingling, MinHash, SimHash, Jaccard.

Vectorized numpy implementations designed for per-batch use inside
``map_batches`` (sketch per row) with merge/groupby downstream — the
standard MinHash-LSH construction (Broder '97; Leskovec et al., MMDS
ch.3) and SimHash (Charikar '02).
"""

from __future__ import annotations

import hashlib
from typing import List, Set

import numpy as np

_MERSENNE = (1 << 61) - 1


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def shingles(text: str, k: int = 3) -> Set[int]:
    """Word k-gram shingle hash set (lowercased, whitespace tokens)."""
    words = (text or "").lower().split()
    if not words:
        return set()
    if len(words) < k:
        return {_stable_hash64(" ".join(words))}
    return {_stable_hash64(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)}


class MinHasher:
    """n_perm universal-hash MinHash over shingle sets. Deterministic
    (seeded coefficient matrix); construct once per actor."""

    def __init__(self, n_perm: int = 128, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm

    def signature(self, shingle_set: Set[int]) -> np.ndarray:
        if not shingle_set:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = np.fromiter(shingle_set, dtype=np.uint64, count=len(shingle_set))
        # (a*x + b) mod p, min over set — broadcast (n_shingles, n_perm)
        vals = (np.outer(x, self.a) + self.b) % _MERSENNE
        return vals.min(axis=0).astype(np.uint64)

    def band_keys(self, sig: np.ndarray, n_bands: int = 16) -> List[int]:
        """LSH band hashes: split the signature into n_bands rows-per-band
        groups; equal band hash => candidate pair."""
        rows = self.n_perm // n_bands
        keys = []
        for band in range(n_bands):
            chunk = sig[band * rows : (band + 1) * rows]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            keys.append(int.from_bytes(h, "big"))
        return keys


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (Charikar '02)."""
    words = (text or "").lower().split()
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w in words:
        h = _stable_hash64(w)
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
        acc += np.where(bits > 0, 1, -1)
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: Set[int], b: Set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
