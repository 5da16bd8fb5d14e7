"""Span flattening — interleaved-document front-end (SURVEY.md §1.4).

Documents arrive as ``(doc_id, spans: list<struct<kind,text,media_ref,
offset>>)``; the matcher core wants flat string match-columns. Flattening
derives them with Arrow list kernels (no per-row Python in the text path)
and computes a **span-sequence fingerprint** over (kind, text, media_ref,
order) so tests can assert the per-row invariant the north star requires:
span-sequence equality through the pipeline.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def span_signature(spans_cell: list[dict]) -> int:
    """Deterministic fingerprint of the (kind, text, media_ref, order)
    sequence of one document's spans."""
    h = 0
    for s in spans_cell:
        h = zlib.crc32(
            f"{s['kind']}\x01{s['text']}\x01{s['media_ref']}\x02".encode(), h
        )
    return h


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

    media_np = np.asarray(media.to_pylist(), dtype=object)
    kinds_np = None  # media_refs are "" on text spans; filter on value alone
    media_sig = np.empty(n, dtype=object)
    span_sig = np.empty(n, dtype=np.int64)
    kind_np = np.asarray(kinds.to_pylist(), dtype=object)
    text_np = np.asarray(texts.to_pylist(), dtype=object)
    for i in range(n):
        s, e = off_np[i], off_np[i + 1]
        refs = sorted(m for m in media_np[s:e] if m)
        media_sig[i] = "|".join(refs)
        h = 0
        for j in range(s, e):
            h = zlib.crc32(
                f"{kind_np[j]}\x01{text_np[j]}\x01{media_np[j]}\x02".encode(), h
            )
        span_sig[i] = h

    cols = {
        "doc_id": batch["doc_id"],
        "title": title,
        "body": body,
        "digits": digits,
        "media_sig": pa.array(media_sig, pa.string()),
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
