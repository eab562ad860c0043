"""MinHash / LSH and SimHash kernels (vectorized numpy).

Used twice in the engine:

1. Document near-deduplication over the `documents` table
   (shingle → minhash → LSH band buckets → candidate pairs →
   verify Jaccard → connected components), the standard
   Broder (1997) / LSH construction.
2. Name blocking in the KG pipeline: LSH bands over character shingles
   of entity names as extra blocking keys (the north rule's
   "MinHash-LSH blocking via groupby shuffle on blocking keys").

All hashes are keyed blake2b → stable across processes and nodes.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Set

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_tokens(tokens: Sequence[str]) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out


def word_shingles(text: str, k: int = 3) -> List[str]:
    """k-word shingles of whitespace-tokenized lowercased text."""
    words = text.lower().split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def char_shingles(text: str, k: int = 3) -> List[str]:
    s = text.lower()
    if len(s) <= k:
        return [s] if s else []
    return [s[i : i + k] for i in range(len(s) - k + 1)]


class MinHasher:
    """num_perm universal-hash minhash signatures; picklable (ships to tasks).

    Permutations are a*x+b mod p with (a, b) drawn deterministically from
    the seed, so every task and every process computes identical
    signatures.
    """

    def __init__(self, num_perm: int = 128, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)

    def signature(self, tokens: Sequence[str]) -> np.ndarray:
        """(num_perm,) uint64 signature; all-max for empty input."""
        if not tokens:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        hv = _hash_tokens(tokens)  # (n,)
        # (num_perm, n) universal hash, min over tokens
        prod = (self.a[:, None] * hv[None, :] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1)

    def band_keys(self, sig: np.ndarray, num_bands: int) -> List[str]:
        """LSH band bucket keys: hash of each band's rows."""
        rows = self.num_perm // num_bands
        keys = []
        for band in range(num_bands):
            chunk = sig[band * rows : (band + 1) * rows].tobytes()
            digest = hashlib.blake2b(chunk, digest_size=8).hexdigest()
            keys.append(f"{band}:{digest}")
        return keys

    def band_keys_u64(self, sig: np.ndarray, num_bands: int) -> np.ndarray:
        """Vectorized int63 LSH band keys: FNV-1a folded over each
        band's signature rows, salted by band index — the same banding
        structure as ``band_keys`` (two docs collide in band t iff that
        band's rows are equal, modulo negligible 63-bit collisions)
        with no per-band digest call and an int64 shuffle key instead
        of a hex string."""
        rows = self.num_perm // num_bands
        M = sig[: rows * num_bands].reshape(num_bands, rows).astype(np.uint64)
        h = np.full(num_bands, 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for r in range(rows):
            h = (h ^ M[:, r]) * prime
        h ^= np.arange(num_bands, dtype=np.uint64) << np.uint64(53)
        return (h & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)


def jaccard(a: Sequence[str], b: Sequence[str]) -> float:
    sa: Set[str] = set(a)
    sb: Set[str] = set(b)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Estimated Jaccard from two minhash signatures."""
    return float(np.mean(sig_a == sig_b))


def simhash64(tokens: Sequence[str]) -> int:
    """64-bit SimHash (Charikar 2002) over the token sequence.

    Token hash = bytes [8:16] of md5, little-endian — exactly DuckDB's
    ``md5_number_lower(token)``, which makes the whole fingerprint
    SQL-expressible: the ``doc_fingerprint`` and ``doc_simhash_neardup``
    oracles in ``__ray_entry__.py`` recompute it per doc in DuckDB
    (round-3 VERDICT #1: oracle coverage for the rows-only entries).
    """
    if not tokens:
        return 0
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[8:], "little")
            for t in tokens
        ),
        dtype=np.uint64,
        count=len(tokens),
    )
    # one (n_tokens × 64) bit matrix instead of a per-token Python loop
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = np.where(bits.astype(bool), 1, -1).sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
