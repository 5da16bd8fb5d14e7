"""Vectorized string-hashing kernels shared by blocking, dedup and
analysis: mod-2**64 polynomial window hashes computed over a batch's flat
UTF-8 buffer in one shot (no per-row or per-window Python).

The trick (also in pipelines/analysis.py fingerprints): with ``S`` the
wraparound cumsum of ``byte[g] * BASE_INV**g``, the hash of bytes
``[s, e]`` is ``(S[e+1] - S[s]) * BASE**e`` — absolute positions cancel,
so one flat pass serves every document at once. BASE is odd, hence
invertible mod 2**64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BASE = np.uint64(1000003)
BASE_INV = np.uint64(pow(1000003, -1, 1 << 64))


def mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constant scheme, Steele et al.,
    "Fast splittable pseudorandom number generators", OOPSLA 2014).
    Raw mod-2**64 polynomial window hashes are small, structured numbers
    (BASE ≈ 2**20, last byte weight BASE**0 = 1), so grams differing only
    in the final character collided after downstream bit-drops — measured
    980 distinct 4-grams → 539 distinct hashes on the sf0.01 documents
    table before this finalizer, ~10% undercount of per-doc distinct
    shingles. Mixing makes every output bit depend on every input bit."""
    h = h ^ (h >> np.uint64(30))
    h = h * np.uint64(0xBF58476D1CE4E5B9)
    h = h ^ (h >> np.uint64(27))
    h = h * np.uint64(0x94D049BB133111EB)
    h = h ^ (h >> np.uint64(31))
    return h


def utf8_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy (flat_bytes, starts, lens) view of a non-null
    ``pa.StringArray`` (honors slice offsets)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = arr.buffers()[2]
    flat = np.frombuffer(buf, np.uint8) if buf is not None else np.empty(0, np.uint8)
    return flat, offsets[:-1], np.diff(offsets)


def window_hashes(
    flat: np.ndarray,
    starts: np.ndarray,
    lens: np.ndarray,
    window: int,
    stride: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (hashes uint64, n_win int64): all ``stride``-spaced ``window``-byte
    hashes per document; a document shorter than ``window`` (but non-empty)
    yields ONE whole-document hash; empty documents yield none. Hashes are
    ordered doc-major, window-minor."""
    n = len(lens)
    total = len(flat)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    if total:
        inv_pow = np.cumprod(
            np.full(total, BASE_INV, np.uint64), dtype=np.uint64
        ) * BASE
        base_pow = np.cumprod(
            np.full(total, BASE, np.uint64), dtype=np.uint64
        ) * BASE_INV
        c = flat.astype(np.uint64) * inv_pow
        S = np.concatenate(([np.uint64(0)], np.cumsum(c, dtype=np.uint64)))
    else:
        S = np.zeros(1, np.uint64)
        base_pow = np.empty(0, np.uint64)
    eff_w = np.minimum(lens, window).astype(np.int64)
    n_win = np.where(lens > window, (lens - window) // stride + 1, 1)
    n_win = np.where(lens == 0, 0, n_win).astype(np.int64)
    W = int(n_win.sum())
    if W == 0:
        return np.empty(0, np.uint64), n_win
    win_starts = np.cumsum(n_win) - n_win
    within = np.arange(W, dtype=np.int64) - np.repeat(win_starts, n_win)
    s_pos = np.repeat(starts, n_win) + within * stride
    e_pos = s_pos + np.repeat(eff_w, n_win) - 1
    return mix64((S[e_pos + 1] - S[s_pos]) * base_pow[e_pos]), n_win


def whole_hashes(
    flat: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """One whole-string hash per entry (empty string → 0)."""
    h, n_win = window_hashes(flat, starts, lens, window=1 << 31)
    out = np.zeros(len(lens), np.uint64)
    out[n_win > 0] = h
    return out


def unique_per_doc(
    h: np.ndarray, n_win: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Sort + dedupe window hashes WITHIN each document: → (flat unique
    hashes doc-major-sorted, unique-count per doc)."""
    n = len(n_win)
    if len(h) == 0:
        return h, np.zeros(n, np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_win)
    order = np.lexsort((h, doc_idx))
    d_s, h_s = doc_idx[order], h[order]
    first = np.concatenate(
        ([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1]))
    )
    u_lens = np.bincount(d_s[first], minlength=n).astype(np.int64)
    return h_s[first], u_lens


def normalize_utf8(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized equivalent of blocking.normalize_text: lowercase,
    collapse non-[a-z0-9] runs to one space, trim. Null → ""."""
    s = pc.fill_null(pc.cast(col, pa.string()), "")
    s = pc.utf8_lower(s)
    s = pc.replace_substring_regex(s, "[^a-z0-9]+", " ")
    s = pc.utf8_trim(s, " ")
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    return s


_MERSENNE61 = np.int64((1 << 61) - 1)


def batch_signatures(
    flat: np.ndarray, u_lens: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signatures for all docs at once: → (ndocs, num_perm) int64.
    Per-permutation ``(a*h + b) % M61`` with int64 wraparound — the same
    arithmetic as blocking.MinHasher.signature — followed by a segmented
    min. Docs with no shingles get all-zero signatures (parity with
    MinHasher.signature on empty input)."""
    n = len(u_lens)
    num_perm = len(a)
    sig = np.zeros((n, num_perm), np.int64)
    nz = u_lens > 0
    if not nz.any():
        return sig
    nz_lens = u_lens[nz]
    starts = np.cumsum(nz_lens) - nz_lens
    h = flat.astype(np.int64)
    with np.errstate(over="ignore"):
        for j in range(num_perm):
            m = (a[j] * h + b[j]) % _MERSENNE61
            sig[nz, j] = np.minimum.reduceat(m, starts)
    return sig
