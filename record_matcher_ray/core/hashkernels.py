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


# ---- per-worker scratch arena ------------------------------------------
# The sandbox/microVM faults first-touch pages at ~20 MB/s (CLAUDE.md);
# glibc munmaps large numpy temporaries on free, so a kernel that
# allocates fresh multi-ten-MB arrays re-pays that fault cost on EVERY
# task — and the total grows with worker count, which is why key
# expansion stopped scaling with CPUs. These grow-on-demand buffers are
# faulted once per worker process and reused by every subsequent call.
# Ray workers run one task at a time, so per-process reuse is safe; do
# not call these kernels from concurrent threads in one process.
_SCRATCH: dict = {}


def _scratch(name: str, size: int, dtype=np.uint64) -> np.ndarray:
    key = (name, np.dtype(dtype).str)
    buf = _SCRATCH.get(key)
    if buf is None or buf.size < size:
        _SCRATCH[key] = buf = np.empty(max(int(size * 1.25), 1 << 16), dtype)
    return buf[:size]


def _iota(size: int) -> np.ndarray:
    buf = _SCRATCH.get("iota")
    if buf is None or buf.size < size:
        _SCRATCH["iota"] = buf = np.arange(
            max(int(size * 1.25), 1 << 16), dtype=np.int64
        )
    return buf[:size]


def _powers(total: int) -> tuple[np.ndarray, np.ndarray]:
    """Cached (BASE_INV**g * BASE, BASE**g * BASE_INV) prefix tables — the
    sequences are input-independent, the old per-call cumprod was both
    compute and two fresh T-sized allocations."""
    cached = _SCRATCH.get("pow")
    if cached is None or len(cached[0]) < total:
        size = max(int(total * 1.25), 1 << 16)
        inv = np.cumprod(np.full(size, BASE_INV, np.uint64), dtype=np.uint64)
        inv *= BASE
        base = np.cumprod(np.full(size, BASE, np.uint64), dtype=np.uint64)
        base *= BASE_INV
        _SCRATCH["pow"] = cached = (inv, base)
    return cached[0][:total], cached[1][:total]


def _mix64_inplace(h: np.ndarray, tmp: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer applied in place (same output as mix64)."""
    np.right_shift(h, np.uint64(30), out=tmp)
    h ^= tmp
    h *= np.uint64(0xBF58476D1CE4E5B9)
    np.right_shift(h, np.uint64(27), out=tmp)
    h ^= tmp
    h *= np.uint64(0x94D049BB133111EB)
    np.right_shift(h, np.uint64(31), out=tmp)
    h ^= tmp
    return h


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
    ordered doc-major, window-minor.

    All large intermediates live in the per-worker scratch arena (see
    above); only the returned hash array and two np.repeat temporaries
    are fresh allocations."""
    n = len(lens)
    total = len(flat)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    with np.errstate(over="ignore"):
        if total:
            inv_pow, base_pow = _powers(total)
            c = _scratch("wh_c", total)
            np.multiply(flat, inv_pow, out=c)
            S = _scratch("wh_S", total + 1)
            S[0] = 0
            np.cumsum(c, out=S[1:])
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
        # s_pos = iota*stride + repeat(starts - win_starts*stride):
        # per-window offsets collapse to one repeat of per-doc constants
        sp = _scratch("wh_sp", W, np.int64)
        np.multiply(_iota(W), stride, out=sp)
        sp += np.repeat(starts - win_starts * stride, n_win)
        ep = _scratch("wh_ep", W, np.int64)
        np.add(sp, np.repeat(eff_w, n_win), out=ep)  # = e_pos + 1
        h = np.empty(W, np.uint64)
        np.take(S, ep, out=h)  # S[e+1]
        tmp = _scratch("wh_tmp", W)
        np.take(S, sp, out=tmp)  # S[s]
        h -= tmp
        ep -= 1
        np.take(base_pow, ep, out=tmp)  # BASE**e * BASE_INV ... aligned
        h *= tmp
        return _mix64_inplace(h, tmp), n_win


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


def column_hash64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 hash per value, Arrow/numpy-native for
    int/string columns (pandas-siphash fallback otherwise — fixed default
    key, stable across processes/workers). BUCKET-use contract: equal
    values hash equal; null may collide with 0/"" (a superset partition —
    in-bucket equality decides). Shared by joins/dedup/sampling/table_ops
    bucket stages (r3: replaced their per-batch Arrow→pandas copies)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    with np.errstate(over="ignore"):
        if pa.types.is_integer(arr.type):
            v = pc.fill_null(pc.cast(arr, pa.int64()), 0).to_numpy()
            return mix64(v.view(np.uint64))
        if pa.types.is_string(arr.type):
            flat, starts, lens = utf8_view(pc.fill_null(arr, ""))
            return whole_hashes(flat, starts, lens)
    import pandas as pd

    return pd.util.hash_pandas_object(
        arr.to_pandas(), index=False
    ).to_numpy()


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


_SIG_CHUNK = 1 << 16  # shingles per cache-resident chunk (~512 KB)


def batch_signatures(
    flat: np.ndarray, u_lens: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signatures for all docs at once: → (ndocs, num_perm) int64.
    Per-permutation multiply-add hashing ``(a|1)*h + b`` in uint64
    wraparound arithmetic (same family as blocking.MinHasher.signature —
    keep the two in lockstep), followed by a segmented min; the min value
    is stored by bit pattern. Docs with no shingles get all-zero
    signatures (parity with MinHasher.signature on empty input).

    Perf shape (probed 2026-08-18 at the 690 k-doc flagship): the naive
    form made num_perm full passes over the flat shingle array with a
    ``% M61`` per element — ~600 GB of DRAM traffic per corpus, which is
    why key expansion stopped scaling past ~2× on one node. This form
    (a) drops the Mersenne modulo (integer division) for wraparound
    multiply-add — an equally well-mixed universal hash for min-wise
    use — and (b) chunks the shingle axis at doc boundaries so each
    ~512 KB chunk stays cache-resident across all num_perm passes,
    cutting DRAM traffic by ~num_perm×."""
    n = len(u_lens)
    num_perm = len(a)
    sig = np.zeros((n, num_perm), np.int64)
    nz = u_lens > 0
    if not nz.any():
        return sig
    nz_idx = np.nonzero(nz)[0]
    nz_lens = u_lens[nz]
    ends = np.cumsum(nz_lens)
    starts = ends - nz_lens
    h = flat.view(np.uint64) if flat.dtype == np.int64 else flat.astype(np.uint64)
    au = a.astype(np.uint64) | np.uint64(1)  # odd multipliers mix low bits
    bu = b.astype(np.uint64)
    nd = len(nz_lens)
    scratch = np.empty(_SIG_CHUNK + int(nz_lens.max()), np.uint64)
    d0 = 0
    with np.errstate(over="ignore"):
        while d0 < nd:
            d1 = int(np.searchsorted(ends, starts[d0] + _SIG_CHUNK, "left")) + 1
            d1 = min(max(d1, d0 + 1), nd)
            s, e = int(starts[d0]), int(ends[d1 - 1])
            hc = h[s:e]
            m = scratch[: e - s]
            rel = starts[d0:d1] - s
            rows = nz_idx[d0:d1]
            for j in range(num_perm):
                np.multiply(hc, au[j], out=m)
                np.add(m, bu[j], out=m)
                sig[rows, j] = np.minimum.reduceat(m, rel).view(np.int64)
            d0 = d1
    return sig
