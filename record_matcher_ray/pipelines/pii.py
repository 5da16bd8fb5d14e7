"""PII detection and redaction over a text column — the scrub step a
training-data pipeline runs before anything leaves the raw zone.

Scale shape: both operators are ONE zero-shuffle ``map_batches`` pass of
Arrow RE2 kernels (`count_substring_regex` / `replace_substring_regex`)
— no Python in the row path, no state, embarrassingly parallel at any
corpus size. Patterns are RE2 (no backrefs/lookarounds) so the same
regexes run verbatim in DuckDB's RE2 for the oracle.

Pattern notes: these are the standard high-precision regex detectors
(emails, E.164-ish phones, IPv4, US-SSN shape); a model-based NER pass
would slot in as an actor-pool stage exactly like
``stages/multimodal.MediaFeaturizer``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Ordered: redaction applies in this order, so e.g. the digits of a phone
# number inside an email never get re-matched after the email is masked.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d\-\s().]{7,14}\d",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> ray.data.Dataset:
    """→ one row per doc: (id, n_<category>..., n_pii_total). Counts
    non-overlapping matches per category (RE2 leftmost-longest-free
    semantics, same as DuckDB ``regexp_extract_all``)."""
    pats = patterns or PII_PATTERNS

    def count(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        cols: dict[str, pa.Array] = {id_col: batch[id_col]}
        total = None
        for name, pat in pats.items():
            c = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
            cols[f"n_{name}"] = c
            total = c if total is None else pc.add(total, c)
        cols["n_pii_total"] = total
        return pa.table(cols)

    return ds.map_batches(count, batch_format="pyarrow")


def redact_pii(
    ds: ray.data.Dataset,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    replacement: str = "[PII]",
) -> ray.data.Dataset:
    """Rewrite ``text_col`` with every PII match replaced. Applies the
    patterns in dict order (documented contract: categories earlier in
    ``PII_PATTERNS`` win on overlapping spans)."""
    pats = patterns or PII_PATTERNS

    def scrub(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        for pat in pats.values():
            text = pc.replace_substring_regex(text, pat, replacement)
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, text)

    return ds.map_batches(scrub, batch_format="pyarrow")


def k_anonymity_audit(
    ds: "ray.data.Dataset",
    quasi_cols: list[str],
    *,
    k: int = 5,
) -> "pd.DataFrame":
    """k-anonymity audit over a quasi-identifier column set — the
    privacy screen a training-data release needs next to `pii_counts`:
    a row is AT RISK when its quasi-identifier combination occurs fewer
    than ``k`` times → one row
    (n_rows, n_groups, n_at_risk_rows, n_at_risk_groups, min_group).

    Null quasi-values count as a distinct value (the conservative
    reading — a null combo is still a fingerprint). All counts exact
    integers; the DuckDB GROUP BY replay is hash-exact.

    Scale shape: per-block combo-count partials through one hash
    aggregate (raw rows never shuffle); the audit readout folds the
    group-size histogram, never the groups themselves."""
    import pandas as pd

    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError("k must be >= 2")

    def partial(t: pa.Table) -> pa.Table:
        import pandas as _pd

        arrs = [
            pc.fill_null(
                pc.cast(t[c], pa.string()), "\x00null\x00"
            ).to_numpy(zero_copy_only=False)
            for c in quasi_cols
        ]
        codes, uniq = _pd.factorize(
            _pd.MultiIndex.from_arrays(arrs) if len(arrs) > 1
            else _pd.Index(arrs[0])
        )
        cnt = np.bincount(codes).astype(np.int64)
        if len(arrs) > 1:
            keys = np.array(["\x01".join(u) for u in uniq], dtype=object)
        else:
            keys = np.asarray(uniq, dtype=object)
        return pa.table({"__k__": pa.array(keys, pa.string()),
                         "__c__": pa.array(cnt)})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__k__")
        .sum("__c__")
        .to_pandas()
    )
    if counts.empty:
        return pd.DataFrame({"n_rows": [0], "n_groups": [0],
                             "n_at_risk_rows": [0],
                             "n_at_risk_groups": [0], "min_group": [0]})
    ccol = [c for c in counts.columns if c.startswith("sum")][0]
    sizes = counts[ccol].to_numpy(dtype=np.int64)
    risk = sizes < k
    return pd.DataFrame({
        "n_rows": [int(sizes.sum())],
        "n_groups": [int(len(sizes))],
        "n_at_risk_rows": [int(sizes[risk].sum())],
        "n_at_risk_groups": [int(risk.sum())],
        "min_group": [int(sizes.min())],
    })


def luhn_card_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Payment-card detection with CHECKSUM validation: count contiguous
    13-19-digit runs per document and how many pass the Luhn check
    (ISO/IEC 7812) — the standard precision upgrade over a bare digit
    regex, which false-positives on order ids and timestamps.
    → (id_col, n_candidates, n_luhn_valid).

    Zero shuffle, one pass. Candidate extraction is the RE2 kernel;
    the Luhn fold runs per CANDIDATE (a Python loop bounded by matches,
    not corpus text). Non-overlapping leftmost extraction and the
    digit-doubling checksum replay verbatim in the DuckDB oracle
    (regexp_extract_all + a per-position list_transform parity fold)."""
    import re

    pat = re.compile(r"[0-9]{13,19}")

    def luhn_ok(s: str) -> bool:
        tot = 0
        for i, ch in enumerate(reversed(s)):
            d = ord(ch) - 48
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            tot += d
        return tot % 10 == 0

    def count(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        n_cand = np.zeros(len(batch), np.int64)
        n_valid = np.zeros(len(batch), np.int64)
        for i, s in enumerate(text.to_pylist()):
            runs = pat.findall(s)
            n_cand[i] = len(runs)
            n_valid[i] = sum(1 for r in runs if luhn_ok(r))
        return pa.table({
            id_col: batch[id_col],
            "n_candidates": pa.array(n_cand),
            "n_luhn_valid": pa.array(n_valid),
        })

    return ds.map_batches(count, batch_format="pyarrow")
