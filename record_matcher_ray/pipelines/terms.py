"""Corpus term statistics: global top-k terms (heavy hitters) with
occurrence and document frequencies.

Scale shape: the classic partial-aggregate pattern — each block reduces
its tokens to (term, n_occ, n_docs) partials via factorize+bincount (a
block's partial is bounded by its VOCABULARY, not its token count), then
one ``groupby(term)`` shuffle merges partials, and the final top-k is a
sort+limit over vocabulary-sized data. Raw tokens never cross the wire.
Document frequency is exact because a document is one row (never split
across blocks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum


def _normalize(text: pa.Array) -> pa.Array:
    """lower + collapse non-alphanumeric runs to single spaces (same
    normalization as analysis.repetition_metrics / its SQL oracle)."""
    t = pc.utf8_lower(pc.fill_null(pc.cast(text, pa.string()), ""))
    return pc.utf8_trim_whitespace(
        pc.replace_substring_regex(t, r"[^a-z0-9]+", " ")
    )


def top_terms(
    ds: ray.data.Dataset,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """→ top-k rows (term, n_occ, n_docs), ordered (n_occ desc, term asc)
    — ties at the cut are deterministic because term is unique."""

    def partial(batch: pa.Table) -> pa.Table:
        nt = _normalize(batch[text_col])
        pieces = pc.split_pattern(nt, " ").combine_chunks()
        flat = pieces.flatten()
        off = pieces.offsets.to_numpy().astype(np.int64)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = flat.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
        kept_cum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        n_per_doc = kept_cum[off[1:]] - kept_cum[off[:-1]]
        doc_idx = np.repeat(np.arange(len(n_per_doc), dtype=np.int64), n_per_doc)
        if len(toks) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "n_occ": pa.array([], pa.int64()),
                 "n_docs": pa.array([], pa.int64())}
            )
        codes, uniq = pd.factorize(toks)
        n_occ = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        # exact doc frequency: count distinct (code, doc) pairs per code
        order = np.lexsort((doc_idx, codes))
        cs, ds_ = codes[order], doc_idx[order]
        new = np.empty(len(cs), bool)
        new[0] = True
        new[1:] = (cs[1:] != cs[:-1]) | (ds_[1:] != ds_[:-1])
        n_docs = np.bincount(cs[new], minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"term": pa.array(uniq.astype(object), pa.string()),
             "n_occ": pa.array(n_occ), "n_docs": pa.array(n_docs)}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n_occ", alias_name="n_occ"),
                   Sum("n_docs", alias_name="n_docs"))
    )
    return agg.sort(["n_occ", "term"], descending=[True, False]).limit(k)
