"""Sequence packing: group documents into fixed token-budget bins — the
step that turns a filtered corpus into dense training sequences.

Scale shape: packing is PARTITION-LOCAL (one ``map_batches`` pass, zero
shuffle). Each block packs its own docs; bin ids are globally unique via
the Ray task index. Global optimality is deliberately not attempted — at
100 TB a global bin-pack would be an all-to-all problem for a ~2-3% fill
improvement; per-block next-fit on arrival order keeps document order
(reproducible curricula) and reaches high fill whenever the token budget
is ≫ the median doc (the normal regime: 4k-32k budgets vs ~1k-token docs).

The next-fit recurrence ("start a new bin when the running sum would
overflow") is sequential per DOC but is computed here in O(bins) python
steps, each a single ``searchsorted`` over the token cumsum — not a
per-row loop: with a 8k budget and 1k-token docs that is ~8 docs of work
per python step."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _next_fit_bins(tokens: np.ndarray, max_tokens: int) -> np.ndarray:
    """→ bin index per doc (arrival order, next-fit). A doc with
    tokens > max_tokens gets a bin of its own (flagged by the caller)."""
    n = len(tokens)
    bins = np.empty(n, np.int64)
    if n == 0:
        return bins
    c = np.cumsum(tokens, dtype=np.int64)
    start = 0  # first doc of the current bin
    b = 0
    base = 0  # cumsum before the current bin
    while start < n:
        # last doc that still fits: cumsum - base <= max_tokens
        end = int(np.searchsorted(c, base + max_tokens, side="right"))
        if end == start:  # single oversize doc
            end = start + 1
        bins[start:end] = b
        b += 1
        base = c[end - 1]
        start = end
    return bins


def pack_sequences(
    ds: ray.data.Dataset,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    batch_size: int | None = None,
) -> ray.data.Dataset:
    """→ one row per packed bin: (bin_id, doc_ids list<int64>, n_docs,
    total_tokens, fill_frac, oversize).

    ``bin_id`` is each bin's FIRST doc id — globally unique without any
    cross-task coordination (every doc lands in exactly one bin), stable
    under re-partitioning of everything except the bin a doc joins. The
    ASSIGNMENT does depend on block boundaries — two runs with different
    parallelism pack differently (documented; ``repartition(1)`` first
    for a canonical packing of small data). ``oversize`` marks single-doc
    bins whose doc alone exceeds the budget — emitted, never dropped, so
    accounting stays exact and truncation is the caller's policy."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")

    def fn(t: pa.Table) -> pa.Table:
        toks = t[token_col].to_numpy().astype(np.int64)
        ids = t[id_col].to_numpy().astype(np.int64)
        if (toks < 0).any():
            raise ValueError(f"negative token counts in {token_col!r}")
        bins = _next_fit_bins(toks, max_tokens)
        n_bins = int(bins[-1]) + 1 if len(bins) else 0
        n_docs = np.bincount(bins, minlength=n_bins).astype(np.int64)
        total = np.bincount(bins, weights=toks, minlength=n_bins).astype(np.int64)
        offs = np.zeros(n_bins + 1, np.int32)
        offs[1:] = np.cumsum(n_docs)
        first_doc = ids[offs[:-1]] if n_bins else ids[:0]
        return pa.table(
            {
                "bin_id": pa.array(first_doc),
                "doc_ids": pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), pa.array(ids)
                ),
                "n_docs": pa.array(n_docs),
                "total_tokens": pa.array(total),
                "fill_frac": pa.array(
                    np.minimum(total / float(max_tokens), 1.0)
                ),
                "oversize": pa.array(total > max_tokens),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def packing_stats(packed: ray.data.Dataset, max_tokens: int) -> dict:
    """Aggregate fill report (small driver-side reduce over per-bin rows):
    {n_bins, n_docs, total_tokens, mean_fill, oversize_bins}."""
    import pyarrow.compute as pc

    n_bins = n_docs = total = oversize = 0
    fill_sum = 0.0
    for t in packed.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n_bins += len(t)
        n_docs += int(pc.sum(t["n_docs"]).as_py() or 0)
        total += int(pc.sum(t["total_tokens"]).as_py() or 0)
        oversize += int(pc.sum(pc.cast(t["oversize"], pa.int64())).as_py() or 0)
        fill_sum += float(pc.sum(t["fill_frac"]).as_py() or 0.0)
    return {
        "n_bins": n_bins,
        "n_docs": n_docs,
        "total_tokens": total,
        "mean_fill": fill_sum / n_bins if n_bins else 0.0,
        "oversize_bins": oversize,
    }
