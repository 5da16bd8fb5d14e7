"""Driver-contract registry: per-family query/oracle modules.

``all_queries()`` / ``all_oracle_sql()`` union the per-family dicts —
__ray_entry__.py re-exports them unchanged (the r4 split of the
7.9k-line entry file; VERDICT r3 item #7)."""
from __future__ import annotations

from record_matcher_ray.contract import (
    analysis,
    dedup,
    docmatch,
    graph,
    itemsets,
    joins,
    linkage,
    match_ops,
    relational,
    sampling,
    similarity,
    sketches,
    stats,
    table_ops,
    terms,
)

MODULES = [
    analysis,
    dedup,
    docmatch,
    graph,
    itemsets,
    joins,
    linkage,
    match_ops,
    relational,
    sampling,
    similarity,
    sketches,
    stats,
    table_ops,
    terms,
]


def all_queries():
    out = {}
    for m in MODULES:
        d = m.queries()
        dup = set(out) & set(d)
        assert not dup, f"duplicate query names across modules: {dup}"
        out.update(d)
    return out


def all_oracle_sql():
    out = {}
    for m in MODULES:
        d = m.oracles()
        dup = set(out) & set(d)
        assert not dup, f"duplicate oracle names across modules: {dup}"
        out.update(d)
    return out
