"""Span flattening — interleaved-document front-end (SURVEY.md §1.4).

Documents arrive as ``(doc_id, spans: list<struct<kind,text,media_ref,
offset>>)``; the matcher core wants flat string match-columns. Flattening
derives them with Arrow list kernels (no per-row Python in the text path)
and computes a **span-sequence fingerprint** over (kind, text, media_ref,
order) so tests can assert the per-row invariant the north star requires:
span-sequence equality through the pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# polynomial base for the order-sensitive span-sequence hash (FNV prime);
# arithmetic is uint64 wraparound so the batched cumsum form below is exact
_SIG_P = np.uint64(1099511628211)


def span_signature(spans_cell: list[dict]) -> int:
    """Deterministic fingerprint of the (kind, text, media_ref, order)
    sequence of one document's spans: polynomial combine (base ``_SIG_P``,
    mod 2^64) of per-span siphashes — the scalar twin of the vectorized
    batch form in :func:`flatten_spans`."""
    strs = np.asarray(
        [f"{s['kind']}\x01{s['text']}\x01{s['media_ref']}" for s in spans_cell],
        dtype=object,
    )
    h = 0  # python ints + explicit mod: numpy scalar uint64 warns on wrap
    if len(strs):
        p = int(_SIG_P)
        for v in pd.util.hash_array(strs):
            h = (h * p + int(v)) & 0xFFFFFFFFFFFFFFFF
    return int(np.uint64(h).view(np.int64))


def flatten_spans(batch: pa.Table, keep_spans: bool = False) -> pa.Table:
    """doc → flat match columns.

    - ``title``: text of the first span when its kind is "title" else "";
    - ``body``: all span texts joined (list-kernel ``binary_join``);
    - ``media_sig``: sorted non-empty media_refs joined with "|";
    - ``span_sig``: sequence fingerprint (int64) for the invariant check;
    - ``n_spans``.
    """
    spans = batch["spans"].combine_chunks()
    n = len(spans)
    flat = spans.flatten()
    kinds = flat.field("kind")
    texts = flat.field("text")
    media = flat.field("media_ref")
    offsets = spans.offsets

    texts_list = pa.ListArray.from_arrays(offsets, texts)
    body = pc.binary_join(texts_list, " ")
    # digit signature: all numerals across spans in order (addresses,
    # phones) — a high-precision match column robust to word-level noise
    digits = pc.replace_substring_regex(body, r"\D+", "")

    off_np = offsets.to_numpy()
    starts = off_np[:-1]
    nonempty = off_np[1:] > starts
    first_idx = np.where(nonempty, starts, 0)
    first_kind = pc.take(kinds, pa.array(first_idx))
    first_text = pc.take(texts, pa.array(first_idx))
    title = pc.if_else(
        pc.and_(pa.array(nonempty), pc.equal(first_kind, "title")),
        first_text,
        "",
    )

    k = (off_np[1:] - starts).astype(np.int64)
    total = int(off_np[-1]) if len(off_np) else 0
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), k)

    # media_sig: sorted non-empty media_refs joined "|" — filter to media
    # spans, order by (doc, string) via factorize+rank (only UNIQUE refs
    # are compared as strings), then one Arrow binary_join per doc.
    m_mask = np.asarray(pc.not_equal(media, "").to_numpy(zero_copy_only=False))
    sel = np.nonzero(m_mask)[0]
    m_docs = doc_idx[sel]
    m_vals = media.take(pa.array(sel))
    codes, uniq = pd.factorize(m_vals.to_numpy(zero_copy_only=False))
    rank = np.empty(len(uniq), np.int64)
    rank[np.argsort(uniq, kind="stable")] = np.arange(len(uniq))
    order = np.lexsort((rank[codes], m_docs)) if len(sel) else sel
    m_off = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(m_docs, minlength=n), out=m_off[1:])
    media_sig = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(m_off, pa.int32()), m_vals.take(pa.array(order))
        ),
        "|",
    )

    # span_sig: order-sensitive polynomial hash over per-span siphashes,
    # H = sum h_j * P^(k-1-j) mod 2^64 — exact via uint64-wraparound
    # cumsum segments (scalar twin: span_signature above).
    span_str = pc.binary_join_element_wise(kinds, texts, media, "\x01")
    h = pd.util.hash_array(span_str.to_numpy(zero_copy_only=False))
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts.astype(np.int64), k)
    exp = np.repeat(k, k) - 1 - pos
    max_e = int(exp.max()) + 1 if total else 1
    ppow = np.empty(max_e, np.uint64)
    ppow[0] = np.uint64(1)
    with np.errstate(over="ignore"):  # uint64 wraparound is the semantics
        for i in range(1, max_e):
            ppow[i] = ppow[i - 1] * _SIG_P
    contrib = h.astype(np.uint64) * ppow[exp]
    cs = np.concatenate([[np.uint64(0)], np.cumsum(contrib)])
    span_sig = (cs[off_np[1:]] - cs[starts]).view(np.int64)

    cols = {
        "doc_id": batch["doc_id"],
        "title": title,
        "body": body,
        "digits": digits,
        "media_sig": media_sig,
        "span_sig": pa.array(span_sig, pa.int64()),
        "n_spans": pa.array(off_np[1:] - starts, pa.int32()),
    }
    if keep_spans:
        cols["spans"] = spans
    return pa.table(cols)


def add_int_ids(batch: pa.Table, id_from: str = "doc_id", out: str = "rid") -> pa.Table:
    """Derive a stable int64 row id from a string doc_id of the corpus form
    ``[xy]NNNNNNNN`` (digits after a 1-char prefix)."""
    ids = pc.cast(pc.utf8_slice_codeunits(batch[id_from], 1, 99), pa.int64())
    return batch.append_column(out, ids)
