"""Distributed statistics via exact integer moment partials.

Simple OLS regression (and Pearson r²) as a ONE-PASS zero-shuffle
aggregate: values are quantized once to integer cents (the kmeans /
approx_quantiles fixed-point recipe), every block emits exact integer moment
sums (n, Σx, Σy, Σxy, Σx², Σy²) as decimal128 partials, the driver merges
them in arbitrary-precision Python ints, and the closed-form solution is
a handful of pinned-order IEEE-double operations — so the result is
partitioning-invariant and bit-replayable by a DuckDB oracle (HUGEINT
sums, one double conversion per term, same association order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_CHUNK = 1024  # int64-safe partial-sum chunk (CLAUDE.md int64-safety bound)


def _exact_sum(a: np.ndarray) -> int:
    """Exact integer sum of an int64 array: int64 chunk sums (bounded by
    _CHUNK × max|value| < 2**63) merged in Python arbitrary precision."""
    tot = 0
    for i in range(0, len(a), _CHUNK):
        tot += int(a[i:i + _CHUNK].sum(dtype=np.int64))
    return tot


_QMAX = 30_000_000  # |cents| bound so v² ≤ 9e14 and 1024·v² < 2**63


def linear_fit(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    *,
    scale: float = 100.0,
    ndigits: int = 9,
) -> pd.DataFrame:
    """Simple OLS fit y ≈ slope·x + intercept over quantized values
    (``floor(v·scale + 0.5)`` integer units) → one row
    (n, slope, intercept, r2), slope/intercept/r2 in quantized units,
    rounded to ``ndigits``.

    Scale shape: one streaming pass; each block's partial is SIX numbers
    (decimal128 — per-block sums exceed int64 at ~10⁵ rows of cents²),
    merged by addition on the driver. No shuffle, no second pass;
    closed-form slope/intercept/r² from exact integer moments:

        num  = n·Σxy − Σx·Σy        denx = n·Σx² − (Σx)²
        deny = n·Σy² − (Σy)²        slope = num/denx
        intercept = (Σy − slope·Σx)/n    r² = num²/(denx·deny)

    (each term converted int→double once, operations in this exact
    order — the DuckDB oracle replays them bit-for-bit). Rows with null
    x or y are dropped.
    """

    def partial(t: pa.Table) -> pa.Table:
        xv = pc.cast(t[x_col], pa.float64())
        yv = pc.cast(t[y_col], pa.float64())
        ok = pc.and_(pc.is_valid(xv), pc.is_valid(yv))
        x = np.floor(xv.filter(ok).to_numpy() * scale + 0.5).astype(np.int64)
        y = np.floor(yv.filter(ok).to_numpy() * scale + 0.5).astype(np.int64)
        if len(x) and (np.abs(x).max() > _QMAX or np.abs(y).max() > _QMAX):
            raise ValueError(
                f"linear_fit quantized values exceed |{_QMAX}|; lower "
                f"`scale` so squared terms stay inside the int64-safe "
                f"chunk bound."
            )
        vals = [len(x), _exact_sum(x), _exact_sum(y),
                _exact_sum(x * y), _exact_sum(x * x), _exact_sum(y * y)]
        return pa.table(
            {k: pa.array([v], pa.decimal128(38, 0))
             for k, v in zip(["n", "sx", "sy", "sxy", "sxx", "syy"], vals)}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n, sx, sy, sxy, sxx, syy = (
        int(sum(int(v) for v in parts[c])) for c in
        ["n", "sx", "sy", "sxy", "sxx", "syy"]
    )
    if n < 2:
        return pd.DataFrame({"n": [n], "slope": [np.nan],
                             "intercept": [np.nan], "r2": [np.nan]})
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    if denx == 0 or deny == 0:
        return pd.DataFrame({"n": [n], "slope": [np.nan],
                             "intercept": [np.nan], "r2": [np.nan]})
    num_d, denx_d, deny_d = float(num), float(denx), float(deny)
    slope = num_d / denx_d
    intercept = (float(sy) - slope * float(sx)) / float(n)
    r2 = (num_d * num_d) / (denx_d * deny_d)
    return pd.DataFrame(
        {"n": [n], "slope": [round(slope, ndigits)],
         "intercept": [round(intercept, ndigits)],
         "r2": [round(r2, ndigits)]}
    )
