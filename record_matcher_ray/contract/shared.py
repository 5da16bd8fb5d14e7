"""Shared constants + cross-family SQL helpers for the contract
modules (split out of __ray_entry__.py in round 4; driver contract
unchanged — __ray_entry__ re-exports queries()/oracle_sql())."""
from __future__ import annotations

import numpy as np  # noqa: F401  (helper bodies)

SF001 = "/root/testdata/sf0.001"

# oracle-SQL f-string fragments
STOP = ", ".join(f"'{w}'" for w in sorted(
    {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
     "on", "with", "as", "at", "by", "be"}))

BPE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"


def _sql_mulmod(x: str, c: int) -> str:
    """x*c mod 2**64 in DuckDB HUGEINT via 32-bit splitting."""
    lo = c % (1 << 32)
    return (f"(({x} % 4294967296) * {c} "
            f"+ (({x} // 4294967296) * {lo} % 4294967296) * 4294967296"
            f") % {_SQL_M}")


def _sql_xorshift(x: str, s: int) -> str:
    return f"xor(({x})::UBIGINT, ({x})::UBIGINT >> {s})::HUGEINT"



# module-level constants shared by contract helpers
_PR_OFF = 1_000_000  # supplier node-id offset in the bipartite graph

_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}

_BLOCKLIST = ["spark", "slow query", "vector", "forbidden phrase"]

_SQL_M = "18446744073709551616"

