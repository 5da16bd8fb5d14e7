"""Mergeable sketches — the pre-aggregate pattern for all-to-all-free
approximate aggregation: each batch emits one small sketch, a tiny final
stage merges them (sketches are designed to be mergeable; ray_guide
"Aggregation at scale").

HyperLogLog (Flajolet et al. 2007) with 2^p registers, pure numpy.
Standard error ≈ 1.04 / sqrt(2^p) (≈1.6% at p=12).
"""

from __future__ import annotations

import math

import numpy as np

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 (numpy<2 has no bitwise_count)."""
    return (
        _POP8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1).astype(np.uint64)
    )


def hll_rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per 64-bit hash: bucket = top ``p`` bits, rho = 1 +
    leading zeros of the remaining 64-p bits (capped at 64-p+1).
    clz via bit-smear + popcount — exact integer ops, no float log2
    (whose rounding near powers of two would mis-rank)."""
    h = h.astype(np.uint64, copy=False)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # uint64 wraparound: low bits, left-aligned
    x = rest.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    bits = popcount64(x)  # = 64 - clz(rest); 0 when rest == 0
    rho = np.where(
        rest == 0, np.uint64(64 - p + 1), np.uint64(65) - bits
    ).astype(np.uint64)
    return bucket, rho


def hll_registers(h: np.ndarray, p: int) -> np.ndarray:
    """Hashes → dense uint8[2**p] register array (max rho per bucket,
    sort-based segmented max: ufunc.at is ~20× slower, CLAUDE.md)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return regs
    bucket, rho = hll_rho(h, p)
    comb = (bucket.astype(np.uint64) << np.uint64(8)) | rho
    comb.sort()
    b = (comb >> np.uint64(8)).astype(np.int64)
    ends = np.flatnonzero(np.diff(b) != 0)
    last = np.concatenate([ends, [len(b) - 1]])
    regs[b[last]] = (comb[last] & np.uint64(0xFF)).astype(np.uint8)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """HLL estimate from a uint8 register array. Integer accumulation in
    units of 2**-64 (exact and order-independent — a float sum over the
    registers would be summation-order-dependent and unreplayable in
    SQL), then ONE double division; linear counting below 2.5m via libm
    log (math.log, which DuckDB's ln() also resolves to). 64-bit-hash
    variant: no large-range correction needed (Heule et al. 2013)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = 0
    for r in regs.tolist():
        s += 1 << (64 - r)
    est = alpha * m * m * 18446744073709551616.0 / float(s)
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def string_hashes64(values) -> np.ndarray:
    """Well-mixed 64-bit hashes of a string sequence / Arrow array,
    vectorized (whole-string rolling hash → splitmix64 finalizer; the
    raw polynomial hash has structured low bits, which HLL's rho reads)."""
    import pyarrow as pa

    from record_matcher_ray.core.hashkernels import column_hash64, mix64

    arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) else (
        pa.array([v if isinstance(v, str) else str(v) for v in values],
                 pa.string())
    )
    return mix64(column_hash64(arr))


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Add pre-hashed (well-mixed) 64-bit values, vectorized."""
        np.maximum(
            self.registers,
            hll_registers(np.asarray(hashes), self.p),
            out=self.registers,
        )

    def add_strings(self, values) -> None:
        self.add_hashes(string_hashes64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def cardinality(self) -> float:
        return hll_estimate(self.registers)

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
