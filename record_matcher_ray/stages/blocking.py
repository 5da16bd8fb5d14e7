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
import pyarrow as pa

from record_matcher_ray.core.hashkernels import (
    batch_signatures,
    normalize_utf8,
    unique_per_doc,
    utf8_view,
    whole_hashes,
    window_hashes,
)
from record_matcher_ray.core.hashkernels import BASE as _HASH_BASE

_NORM_RE = re.compile(r"[^a-z0-9]+")

_MERSENNE = (1 << 61) - 1

# int64 blocking-key namespace tags (top bits) — keys of different types
# can never collide
KEY_TAG_EXACT = 1
KEY_TAG_NGRAM = 2
KEY_TAG_MINHASH = 3
KEY_TAG_MEDIA = 4


def normalize_text(s: str) -> str:
    return _NORM_RE.sub(" ", s.lower()).strip()


def _crc(s: str) -> int:
    return zlib.crc32(s.encode())


def tag_keys(h: np.ndarray, tag: int) -> np.ndarray:
    """uint64 hashes → positive int64 keys namespaced by ``tag``."""
    return (
        (h >> np.uint64(6)) | (np.uint64(tag) << np.uint64(58))
    ).astype(np.int64)


def batch_char_shingles(
    norm_arr: pa.Array, n: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Unique character-``n``-gram hashes for EVERY (already normalized)
    string in one vectorized pass: → (flat int64 hashes sorted per doc,
    count per doc). 61-bit rolling polynomial hashes — the batch engine of
    :func:`char_shingles`."""
    flat, starts, lens = utf8_view(norm_arr)
    h, n_win = window_hashes(flat, starts, lens, n, 1)
    return unique_per_doc((h >> np.uint64(3)).astype(np.int64), n_win)


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
        """(num_perm,) minhash signature of a set of shingle hashes —
        uint64 wraparound multiply-add with odd multipliers, min by
        unsigned value, stored by bit pattern (SAME arithmetic as
        hashkernels.batch_signatures; keep in lockstep)."""
        if len(shingle_hashes) == 0:
            return np.zeros(self.num_perm, dtype=np.int64)
        au = self.a.astype(np.uint64) | np.uint64(1)
        bu = self.b.astype(np.uint64)
        hu = (
            shingle_hashes.view(np.uint64)
            if shingle_hashes.dtype == np.int64
            else shingle_hashes.astype(np.uint64)
        )
        with np.errstate(over="ignore"):
            m = au[:, None] * hu[None, :] + bu[:, None]
        return m.min(axis=1).view(np.int64)


def char_shingles(text: str, n: int = 4) -> np.ndarray:
    """Single-doc wrapper over :func:`batch_char_shingles` (same hash
    domain everywhere — LSH candidates, verification and simhash agree by
    construction)."""
    t = normalize_text(text)
    if not t:
        return np.empty(0, np.int64)
    flat, _ = batch_char_shingles(pa.array([t], pa.string()), n)
    return flat


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


def batch_band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(ndocs, num_perm) minhash signatures → (ndocs, bands) int64 LSH band
    keys: polynomial fold of each band's rows mixed with the band index,
    namespaced with KEY_TAG_MINHASH."""
    n, num_perm = sig.shape
    rows = num_perm // bands
    sig3 = sig.astype(np.uint64).reshape(n, bands, rows)
    acc = np.zeros((n, bands), np.uint64)
    for k in range(rows):
        acc = acc * _HASH_BASE + sig3[:, :, k]
    acc = acc * _HASH_BASE + np.arange(bands, dtype=np.uint64)[None, :]
    return tag_keys(acc.reshape(-1), KEY_TAG_MINHASH).reshape(n, bands)


def default_doc_keys(
    title: str, body: str, media_sig: str, hasher: MinHasher
) -> list[str]:
    """The flagship document blocking-key set: exact title key + title
    n-grams + body minhash bands + media hashes. (Per-row string form for
    small/diagnostic use; the pipeline path is :func:`batch_doc_keys`.)"""
    keys = exact_key(title, "tt")
    keys += ngram_keys(title, n=5, stride=3, prefix="tn")
    keys += minhash_band_keys(body, hasher, prefix="mh")
    keys += media_keys(media_sig, "md")
    return keys


def batch_doc_keys(
    title_col: pa.ChunkedArray | pa.Array,
    body_col: pa.ChunkedArray | pa.Array,
    media_col: pa.ChunkedArray | pa.Array,
    hasher: MinHasher,
    *,
    bands: int = 16,
    ngram_n: int = 5,
    ngram_stride: int = 3,
    shingle: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized flagship blocking keys for a whole batch: → (int64 keys,
    int64 row index per key). Same FAMILIES as :func:`default_doc_keys`
    (exact title, strided title n-grams, body minhash bands, media-part
    hashes) but computed entirely from the batch's flat UTF-8 buffers —
    no per-row Python, no string key materialization. Deviation from the
    per-row form: docs with an EMPTY body emit no minhash keys (the
    per-row form emitted the all-zero-signature band keys, needlessly
    funnelling every empty doc into one hot block)."""
    import pyarrow.compute as pc

    keys_out: list[np.ndarray] = []
    rows_out: list[np.ndarray] = []

    norm_title = normalize_utf8(title_col)
    ft, st, lt = utf8_view(norm_title)
    n = len(lt)

    # exact title keys (skip empty titles)
    tt = whole_hashes(ft, st, lt)
    has_t = lt > 0
    keys_out.append(tag_keys(tt[has_t], KEY_TAG_EXACT))
    rows_out.append(np.nonzero(has_t)[0].astype(np.int64))

    # strided title n-grams
    tn_h, tn_n = window_hashes(ft, st, lt, ngram_n, ngram_stride)
    keys_out.append(tag_keys(tn_h, KEY_TAG_NGRAM))
    rows_out.append(np.repeat(np.arange(n, dtype=np.int64), tn_n))

    # body minhash band keys. Raw window hashes feed the signatures
    # directly — min-wise hashing is invariant to duplicates, so skipping
    # unique_per_doc's doc-major lexsort (the most expensive step of key
    # expansion at corpus scale) yields BIT-IDENTICAL signatures; the same
    # ``>> 3`` post-shift as batch_char_shingles keeps the hash domain
    # shared with the dedup/verify paths (which do need sorted uniques).
    norm_body = normalize_utf8(body_col)
    fb, sb, lb = utf8_view(norm_body)
    wh, sh_lens = window_hashes(fb, sb, lb, shingle, 1)
    sh_flat = (wh >> np.uint64(3)).astype(np.int64)
    sig = batch_signatures(sh_flat, sh_lens, hasher.a, hasher.b)
    band_k = batch_band_keys(sig, bands)
    has_b = sh_lens > 0
    keys_out.append(band_k[has_b].reshape(-1))
    rows_out.append(
        np.repeat(np.nonzero(has_b)[0].astype(np.int64), bands)
    )

    # media keys: one per non-empty '|'-separated part
    media = pc.fill_null(pc.cast(media_col, pa.string()), "")
    if isinstance(media, pa.ChunkedArray):
        media = media.combine_chunks()
    parts = pc.split_pattern(media, "|")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    part_counts = np.diff(parts.offsets.to_numpy().astype(np.int64))
    fp_, sp_, lp_ = utf8_view(parts.values)
    ph = whole_hashes(fp_, sp_, lp_)
    keep = lp_ > 0
    keys_out.append(tag_keys(ph[keep], KEY_TAG_MEDIA))
    rows_out.append(
        np.repeat(np.arange(n, dtype=np.int64), part_counts)[keep]
    )

    return np.concatenate(keys_out), np.concatenate(rows_out)
