"""Mergeable sketches — the pre-aggregate pattern for all-to-all-free
approximate aggregation: each batch emits one small sketch, a tiny final
stage merges them (sketches are designed to be mergeable; ray_guide
"Aggregation at scale").

HyperLogLog (Flajolet et al. 2007) with 2^p registers, pure numpy.
Standard error ≈ 1.04 / sqrt(2^p) (≈1.6% at p=12).
"""

from __future__ import annotations

import zlib

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Add pre-hashed 64-bit values (vectorized)."""
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        ranks = np.zeros(len(h), dtype=np.uint8)
        probe = np.uint64(1) << np.uint64(63)
        live = np.ones(len(h), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            hit = live & ((rest & probe) != 0)
            ranks[hit] = r
            live &= ~hit
            if not live.any():
                break
            probe >>= np.uint64(1)
        np.maximum.at(self.registers, idx, ranks)

    def add_strings(self, values) -> None:
        hs = np.fromiter(
            (zlib.crc32(str(v).encode()) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF
             for v in values),
            dtype=np.uint64, count=len(values),
        )
        self.add_hashes(hs)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def cardinality(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # small-range correction
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


class BloomFilter:
    """Fixed-size Bloom filter over pre-hashed 64-bit values, pure numpy.

    The membership sketch for cross-dataset operations at scale: the
    small side (an eval set, a blocklist, yesterday's output) folds into
    ``2**bits_log2`` bits regardless of cardinality, and the big side
    streams through ``contains`` with zero shuffle — the alternative (a
    distributed semi-join) moves every key of both sides. No false
    negatives; false-positive rate ≈ (1 - exp(-k*n/m))**k, e.g. ~0.8%
    for n = m/16 keys at the default k=6.

    ``k`` probe positions derive from one input hash by splitmix-style
    remixing with distinct odd constants, so callers only supply a single
    well-mixed 64-bit hash per key (e.g. core.hashkernels.window_hashes
    output, already mix64-finalized).
    """

    def __init__(self, bits_log2: int = 27, k: int = 6):
        if not 10 <= bits_log2 <= 36:
            raise ValueError(f"bits_log2 must be in [10, 36], got {bits_log2}")
        self.bits_log2 = bits_log2
        self.k = k
        self.words = np.zeros(1 << max(bits_log2 - 6, 0), np.uint64)
        self._mask = np.uint64((1 << bits_log2) - 1)

    def _positions(self, hashes: np.ndarray, j: int) -> np.ndarray:
        h = hashes.astype(np.uint64) ^ np.uint64(
            (j * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        )
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        return h & self._mask

    def add_hashes(self, hashes: np.ndarray) -> None:
        for j in range(self.k):
            pos = self._positions(hashes, j)
            np.bitwise_or.at(
                self.words,
                (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """→ bool array; True may be a false positive, False is certain."""
        out = np.ones(len(hashes), bool)
        for j in range(self.k):
            pos = self._positions(hashes, j)
            word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
            if not out.any():
                break
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.bits_log2, self.k) == (other.bits_log2, other.k)
        out = BloomFilter(self.bits_log2, self.k)
        out.words = self.words | other.words
        return out

    def fill_ratio(self) -> float:
        return float(
            np.unpackbits(self.words.view(np.uint8)).mean()
        )
