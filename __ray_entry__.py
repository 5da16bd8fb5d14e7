"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` maps one entry per implemented operator family from
SURVEY.md §2 (+ the engine's training-data additions) to callables over an
``sf_dir``; ``oracle_sql()`` holds the DuckDB-equivalent SQL where the
operator is SQL-expressible (non-SQL ops — LSH dedup, simhash, docmatch,
media featurization, compression — get rows-only checks).

The implementations live in per-family modules under
``record_matcher_ray/contract/`` (r4 split of the former 7.9k-line entry
file; VERDICT r3 item #7) — this file only re-exports the driver surface.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from record_matcher_ray.contract import all_oracle_sql, all_queries
from record_matcher_ray.contract.shared import SF001


def entry() -> Any:
    """Flagship pipeline smoke: the blocked exact match on sf0.001."""
    from record_matcher_ray.contract.match_ops import _match_exact_customer

    return _match_exact_customer(SF001)


def queries() -> dict[str, Callable[[str], Any]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle_sql()
