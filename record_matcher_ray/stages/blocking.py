"""Blocking-key derivation (the engine's candidate generator — north_rule:
"normalized text n-gram/minhash keys over span text plus media_ref
hashes"). Each function maps one document row to MANY keys (doc→keys is
1-to-many, expanded via a map_batches row-replication, the Ray analogue of
flat_map); two docs sharing ANY key become candidates.

All hashing is crc32-based — deterministic across processes (no
PYTHONHASHSEED dependence), so retried tasks emit identical keys
(idempotent stages, SURVEY.md §4.2).

The reference's conjunctive ``columns_to_group`` equality (records.py:
106-132) is the degenerate case: ``exact_keys`` over the grouped column
tuple. Including it among the emitted keys guarantees blocking recall ⊇
reference candidates (SURVEY.md §7.4).
"""

from __future__ import annotations

import re
import zlib

import numpy as np

_NORM_RE = re.compile(r"[^a-z0-9]+")

_MERSENNE = (1 << 61) - 1


def normalize_text(s: str) -> str:
    return _NORM_RE.sub(" ", s.lower()).strip()


def _crc(s: str) -> int:
    return zlib.crc32(s.encode())


class MinHasher:
    """Seeded permutation state, built ONCE per actor/worker (stateful-stage
    pattern — construct in ``__init__`` of an actor-pool class, reuse per
    batch)."""

    def __init__(self, num_perm: int = 64, seed: int = 1):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) minhash signature of a set of shingle hashes."""
        if len(shingle_hashes) == 0:
            return np.zeros(self.num_perm, dtype=np.int64)
        m = (
            self.a[:, None] * shingle_hashes[None, :].astype(np.int64) + self.b[:, None]
        ) % _MERSENNE
        return m.min(axis=1)


def char_shingles(text: str, n: int = 4) -> np.ndarray:
    t = normalize_text(text)
    if len(t) < n:
        return np.array([_crc(t)], dtype=np.int64) if t else np.empty(0, np.int64)
    return np.unique(
        np.fromiter((_crc(t[i : i + n]) for i in range(len(t) - n + 1)),
                    dtype=np.int64, count=len(t) - n + 1)
    )


def minhash_band_keys(
    text: str, hasher: MinHasher, bands: int = 16, shingle: int = 4, prefix: str = "mh"
) -> list[str]:
    """LSH band keys: shingle → minhash → band buckets. Docs agreeing on any
    band are candidates; bands×rows tunes the Jaccard threshold curve."""
    sig = hasher.signature(char_shingles(text, shingle))
    rows = len(sig) // bands
    return [
        f"{prefix}{b}:{zlib.crc32(sig[b * rows : (b + 1) * rows].tobytes()):08x}"
        for b in range(bands)
    ]


def ngram_keys(text: str, n: int = 5, stride: int = 5, prefix: str = "ng") -> list[str]:
    """Strided character n-gram keys over normalized text (cheap, high
    recall for short fields)."""
    t = normalize_text(text)
    if not t:
        return []
    if len(t) <= n:
        return [f"{prefix}:{_crc(t):08x}"]
    return [
        f"{prefix}:{_crc(t[i : i + n]):08x}" for i in range(0, len(t) - n + 1, stride)
    ]


def media_keys(media_sig: str, prefix: str = "md") -> list[str]:
    """One key per media_ref hash (exact media co-occurrence blocking)."""
    return [f"{prefix}:{_crc(m):08x}" for m in media_sig.split("|") if m]


def exact_key(value: str, prefix: str = "eq") -> list[str]:
    """Exact normalized-value key — the reference-grouping degenerate case."""
    v = normalize_text(value)
    return [f"{prefix}:{_crc(v):08x}"] if v else []


def default_doc_keys(
    title: str, body: str, media_sig: str, hasher: MinHasher
) -> list[str]:
    """The flagship document blocking-key set: exact title key + title
    n-grams + body minhash bands + media hashes."""
    keys = exact_key(title, "tt")
    keys += ngram_keys(title, n=5, stride=3, prefix="tn")
    keys += minhash_band_keys(body, hasher, prefix="mh")
    keys += media_keys(media_sig, "md")
    return keys
