"""Cross-dataset decontamination: flag corpus documents whose character
n-gram windows appear in a (small) reference set — the train/eval overlap
check every large-scale training-data pipeline needs before shipping a
corpus.

Scale shape
-----------
The REFERENCE side (an eval set, a benchmark suite, a blocklist) is the
small side by construction. It folds into either one sorted uint64 hash
array (``mode="exact"``, 8 B per distinct gram) or a fixed-size Bloom
filter (``mode="bloom"``, ~2 bits per gram at the defaults), broadcast
once via ``ray.put`` and read zero-copy by every task. The CORPUS side —
the 100 TB side — streams through one ``map_batches`` pass with no
shuffle, no join, and no materialization: per batch, all windows are
hashed in one vectorized sweep (core.hashkernels.window_hashes) and
membership is a searchsorted / Bloom probe. Nothing scales with corpus
size except the single read.

Semantics
---------
Text is normalized exactly like blocking (lowercase, non-[a-z0-9] runs →
single space, trim), then every ``stride``-spaced ``window``-byte window
is tested for membership in the reference's window set. Documents shorter
than ``window`` contribute their whole normalized text as one window;
empty-after-normalization documents are dropped (no windows to test).
``contained_frac`` is (windows found in the reference) / (total windows),
counting repeated windows each time they occur.

``mode="exact"`` matches content equality up to 64-bit hash collisions
(expected collisions ≈ n_corpus_windows * n_ref_grams / 2^64 — negligible
below ~10^9 windows per side) and is SQL-checkable; ``mode="bloom"`` adds
the filter's false-positive rate (no false negatives) in exchange for a
fixed memory budget, and is the 100-TB default when the reference set has
billions of grams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from record_matcher_ray.core.hashkernels import (
    normalize_utf8,
    utf8_view,
    window_hashes,
)
from record_matcher_ray.functions.sketches import BloomFilter

# reference sides above this many distinct grams refuse the exact path:
# the sorted-array broadcast would exceed ~8 GB and the caller should
# switch to mode="bloom" (fixed budget) instead of OOMing the driver
EXACT_REF_GRAM_CAP = 1_000_000_000


def _batch_window_hashes(
    col: pa.ChunkedArray | pa.Array, window: int, stride: int
) -> tuple[np.ndarray, np.ndarray]:
    """→ (hashes, n_win per doc) over the NORMALIZED text column."""
    flat, starts, lens = utf8_view(normalize_utf8(col))
    return window_hashes(flat, starts, lens, window, stride)


def reference_gram_hashes(
    ref: ray.data.Dataset,
    text_col: str = "text",
    *,
    window: int = 16,
    stride: int = 1,
) -> np.ndarray:
    """Collect the reference set's distinct window hashes to ONE sorted
    uint64 array on the driver (the broadcast small side).

    Per-batch windows are deduped before leaving the worker, collected via
    ``to_arrow_refs`` + one concat (driver ``iter_batches`` loops are ~80×
    slower in this sandbox — CLAUDE.md), then deduped once globally."""

    def grams(t: pa.Table) -> pa.Table:
        h, _ = _batch_window_hashes(t[text_col], window, stride)
        return pa.table({"g": pa.array(np.unique(h).view(np.int64))})

    tbls = [
        t
        for t in ray.get(
            ref.map_batches(grams, batch_format="pyarrow").to_arrow_refs()
        )
        if len(t)
    ]
    if not tbls:
        return np.empty(0, np.uint64)
    h = pa.concat_tables(tbls)["g"].to_numpy().view(np.uint64)
    h = np.unique(h)
    if len(h) > EXACT_REF_GRAM_CAP:
        raise ValueError(
            f"reference set has {len(h):,} distinct grams (> "
            f"{EXACT_REF_GRAM_CAP:,}); use mode='bloom' for a fixed "
            f"memory budget instead of an exact broadcast"
        )
    return h


def reference_bloom(
    ref: ray.data.Dataset,
    text_col: str = "text",
    *,
    window: int = 16,
    stride: int = 1,
    bits_log2: int = 30,
    k: int = 6,
) -> BloomFilter:
    """Fold the reference set's window hashes into one Bloom filter.

    Per-batch partial filters are OR-merged on the driver — each batch
    ships ``2**bits_log2 / 8`` bytes once, independent of gram count, so
    prefer fewer/larger batches for huge reference sets (or the exact
    path when it fits)."""

    def partial(t: pa.Table) -> pa.Table:
        h, _ = _batch_window_hashes(t[text_col], window, stride)
        bf = BloomFilter(bits_log2, k)
        bf.add_hashes(np.unique(h))
        return pa.table({"words": [bf.words.tobytes()]})

    out = BloomFilter(bits_log2, k)
    for t in ray.get(
        ref.map_batches(
            partial, batch_format="pyarrow", batch_size=65536
        ).to_arrow_refs()
    ):
        for buf in t["words"].to_pylist():
            out.words |= np.frombuffer(buf, np.uint64)
    return out


def contamination(
    corpus: ray.data.Dataset,
    ref: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    window: int = 16,
    stride: int = 1,
    mode: str = "exact",
    bloom_bits_log2: int = 30,
) -> ray.data.Dataset:
    """→ Dataset[id_col, n_windows, contained_frac] for every corpus doc
    with ≥1 window (empty-after-normalization docs drop out).

    One streaming pass over the corpus against the broadcast reference
    side; see module docstring for the scale contract."""
    if mode == "exact":
        lookup_ref = ray.put(
            reference_gram_hashes(ref, text_col, window=window, stride=stride)
        )

        def member(h: np.ndarray) -> np.ndarray:
            grams = ray.get(lookup_ref)
            idx = np.searchsorted(grams, h)
            ok = idx < len(grams)
            out = np.zeros(len(h), bool)
            out[ok] = grams[idx[ok]] == h[ok]
            return out

    elif mode == "bloom":
        bloom_ref = ray.put(
            reference_bloom(
                ref, text_col, window=window, stride=stride,
                bits_log2=bloom_bits_log2,
            )
        )

        def member(h: np.ndarray) -> np.ndarray:
            return ray.get(bloom_ref).contains(h)

    else:
        raise ValueError(f"mode must be 'exact' or 'bloom', got {mode!r}")

    def score(t: pa.Table) -> pa.Table:
        h, n_win = _batch_window_hashes(t[text_col], window, stride)
        nz = n_win > 0
        if not nz.any():
            return pa.schema(
                [(id_col, t.schema.field(id_col).type),
                 ("n_windows", pa.int64()),
                 ("contained_frac", pa.float64())]
            ).empty_table()
        hits = member(h).astype(np.float64)
        doc = np.repeat(np.arange(len(n_win), dtype=np.int64), n_win)
        contained = np.bincount(doc, weights=hits, minlength=len(n_win))
        # round HALF-AWAY (np.round is half-even): k/n with a power-of-2
        # denominator lands exactly on .xxxxxx5 and DuckDB's round()
        # (the oracle) goes away from zero — 21/128 = .1640625 must be
        # .164063, not .164062; frac is non-negative so floor(+0.5) is it
        frac = np.floor(contained[nz] / n_win[nz] * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                id_col: t[id_col].combine_chunks().take(
                    pa.array(np.nonzero(nz)[0])
                ),
                "n_windows": pa.array(n_win[nz]),
                "contained_frac": pa.array(frac),
            }
        )

    return corpus.map_batches(score, batch_format="pyarrow")


def decontaminate(
    corpus: ray.data.Dataset,
    ref: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_contained_frac: float = 0.2,
    **kw,
) -> ray.data.Dataset:
    """Drop corpus docs whose window overlap with ``ref`` exceeds
    ``max_contained_frac`` (all original columns preserved). Two streaming
    passes over the corpus (score, then filter by broadcast id set of the
    CONTAMINATED minority — assumed small; if most of the corpus is
    contaminated, dropping it is the cheap part)."""
    scored = contamination(corpus, ref, text_col, id_col, **kw)
    bad = scored.filter(
        expr=f"contained_frac > {float(max_contained_frac)!r}"
    )

    def collect_ids(t: pa.Table) -> pa.Table:
        return t.select([id_col])

    bad_ids = np.unique(
        pa.concat_tables(
            [t for t in ray.get(
                bad.map_batches(collect_ids, batch_format="pyarrow")
                .to_arrow_refs()
            ) if len(t)]
            or [pa.schema([(id_col, pa.int64())]).empty_table()]
        )[id_col].to_numpy()
    )
    bad_ref = ray.put(bad_ids)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        b = ray.get(bad_ref)
        idx = np.searchsorted(b, ids)
        ok = idx < len(b)
        hit = np.zeros(len(ids), bool)
        hit[ok] = b[idx[ok]] == ids[ok]
        return t.filter(pa.array(~hit))

    return corpus.map_batches(keep, batch_format="pyarrow")
