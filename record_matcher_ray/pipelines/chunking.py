"""Document chunking: split each document into overlapping fixed-size
token windows — the retrieval/context-window prep step.

Scale shape: one zero-shuffle ``map_batches`` pass; output rows ≈ input
tokens × (1 + overlap/stride), streamed block by block. The whole
transform is Arrow kernels + numpy offset arithmetic over the flattened
token array — no per-row Python. Deterministic: chunk k of a doc covers
tokens [k·stride, k·stride + size) of the whitespace token sequence, so
re-chunking after a resume yields identical rows (chunk_id is stable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def chunk_documents(
    ds: ray.data.Dataset,
    size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """→ (id, chunk_id, n_tokens, chunk_text) rows, one per window.

    Tokens are the non-empty whitespace-split pieces. Window starts are
    0, stride, 2·stride, … while start < max(n_tokens - overlap, 1)
    (stride = size - overlap), so the tail never emits a window fully
    contained in the previous one; empty documents emit no rows.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        pieces = pc.split_pattern_regex(text, r"\s+").combine_chunks()
        flat = pieces.flatten()
        raw_off = pieces.offsets.to_numpy().astype(np.int64)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = flat.filter(pa.array(keep))
        kept_cum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        base = kept_cum[raw_off]  # kept-token offset per doc boundary
        n = base[1:] - base[:-1]  # kept tokens per doc

        n_chunks = np.where(n > 0, -(-np.maximum(n - overlap, 1) // stride), 0)
        doc_of = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
        total = int(n_chunks.sum())
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_chunks)[:-1]]), n_chunks
        )
        starts = chunk_id * stride
        ends = np.minimum(starts + size, n[doc_of])
        lens = ends - starts

        # gather flat token indices for every window in one take
        goff = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        idx = (
            np.arange(int(goff[-1]), dtype=np.int64)
            - np.repeat(goff[:-1], lens)
            + np.repeat(base[:-1][doc_of] + starts, lens)
        )
        gathered = toks.take(pa.array(idx))
        chunk_text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(goff, pa.int32()), gathered), " "
        )
        ids = batch[id_col].take(pa.array(doc_of))
        return pa.table(
            {
                id_col: ids,
                "chunk_id": pa.array(chunk_id),
                "n_tokens": pa.array(lens.astype(np.int64)),
                "chunk_text": chunk_text,
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def sql_chunk_documents(size: int = 64, overlap: int = 16,
                        table: str = "documents", text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`chunk_documents` (oracle contract)."""
    stride = size - overlap
    return f"""
        WITH t AS (
          SELECT {id_col},
                 list_filter(string_split_regex(coalesce({text_col}, ''),
                                                '\\s+'),
                             x -> x <> '') AS toks
          FROM {table}
        ), c AS (
          SELECT {id_col}, toks, len(toks) AS n,
                 unnest(generate_series(
                   0, greatest(len(toks) - {overlap}, 1) - 1, {stride})) AS s
          FROM t WHERE len(toks) > 0
        )
        SELECT {id_col}, s // {stride} AS chunk_id,
               least(s + {size}, n) - s AS n_tokens,
               array_to_string(toks[s + 1 : least(s + {size}, n)], ' ')
                 AS chunk_text
        FROM c
    """
