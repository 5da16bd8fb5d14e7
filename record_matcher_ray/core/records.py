"""Pure dict-table utilities — semantic parity with the reference's
``records.py`` (/root/reference/record_matcher/records.py:33-153).

A "record table" is ``dict[int, dict[str, str]]``. These helpers are the
small/driver-side versions; the distributed equivalents over
``ray.data.Dataset`` live in :mod:`record_matcher_ray.pipelines.table_ops`.

Documented deviation (SURVEY.md §1.3): the reference's
``uniqueness_by_column`` and ``duplicated_by_column`` do unguarded
``row[column]`` and raise ``KeyError`` on ragged rows; here a missing column
is treated as blank (strictly more permissive — no behavior change on any
input the reference can process).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Generator, Iterable

Records = dict[int, dict[str, str]]


def column_names(records: Records) -> set[str]:
    """Schema inference: union of inner-dict keys (reference records.py:33-46)."""
    return {c for row in records.values() for c in row}


def uniqueness_by_column(records: Records, column: str) -> float:
    """Distinct-ratio of non-blank values; denominator counts ALL rows
    (reference records.py:49-67 — blanks excluded from the numerator only)."""
    if not records:
        return 0
    distinct = {row[column] for row in records.values() if row.get(column)}
    return len(distinct) / len(records)


def adjusted_uniqueness(
    selected_columns: Iterable[str],
    columns_uniqueness: list[tuple[str, float]] | None = None,
    records: Records | None = None,
) -> dict[str, float]:
    """Restrict the uniqueness vector to ``selected_columns`` and renormalize
    to sum 1 (reference records.py:70-103); empty/zero-sum → ``{}``."""
    if not columns_uniqueness:
        assert records
        columns_uniqueness = [
            (c, uniqueness_by_column(records, c)) for c in sorted(column_names(records))
        ]
    selected = [(c, u) for c, u in columns_uniqueness if c in set(selected_columns)]
    total = sum(u for _, u in selected)
    return {c: u / total for c, u in selected if total > 0}


def group_by(records: Records, column_map: dict[str, str]) -> Records:
    """Conjunctive equality filter: keep rows where ``row.get(col, "") ==
    value`` for every entry; empty map keeps everything (records.py:106-132).
    This is the reference's blocking primitive."""
    return {
        idx: row
        for idx, row in records.items()
        if all(row.get(col, "") == val for col, val in column_map.items())
    }


def duplicated_by_column(records: Records, column: str) -> Generator[dict[str, str]]:
    """Yield rows whose non-blank value in ``column`` occurs more than once
    (records.py:135-153)."""
    counts = Counter(row.get(column) for row in records.values() if row.get(column))
    return (row for row in records.values() if counts[row.get(column)] > 1)
