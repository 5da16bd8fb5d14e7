"""Iterative graph analytics over edge-list Datasets.

PageRank (Page et al. 1999) in EXACT fixed-point integer arithmetic —
the same technique that makes ``similarity.kmeans`` partition-invariant
and bit-replayable by a DuckDB oracle: all mass lives in integer units
of 2**-total_bits, per-node contributions are floor divisions, and the
damping update is integer multiply + floor divide, so the result is
identical under any block layout, worker count, or merge order (no
float summation anywhere).

Scale shape: the indexed edge list is materialized ONCE (CLAUDE.md
multi-consumer rule — each Lloyd-style iteration re-reads it); per
iteration the rank vector is broadcast (``ray.put``) and every block
emits a dense int64 inflow partial (length = node count) merged by
elementwise addition — exchange volume O(blocks × nodes × 8 B),
independent of edge count. The node table must fit the driver
(``max_broadcast_nodes`` guard with an actionable error); beyond it the
update becomes two bounded-bucket hash exchanges per iteration
(contribution join by src, aggregate by dst) — the classic BSP layout
`cluster.connected_components` already uses.

The reference engine has no graph surface; this is part of the engine's
beyond-reference family (transitive clustering's analytical sibling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def pagerank(
    ds: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    iters: int = 5,
    d_num: int = 85,
    d_den: int = 100,
    total_bits: int = 40,
    max_broadcast_nodes: int = 50_000_000,
) -> pd.DataFrame:
    """→ DataFrame (node:int64, pr:int64) — rank mass in integer units of
    2**-``total_bits`` after ``iters`` synchronous updates with damping
    ``d_num/d_den``:

        contrib(u) = pr(u) // outdeg(u)            (0 for dangling u)
        pr'(v) = ((d_den - d_num) * INIT) // d_den
                 + (d_num * Σ_{(u,v)∈E} contrib(u)) // d_den

    with ``INIT = 2**total_bits // N`` and parallel edges counted with
    multiplicity. Floors leak a little mass (standard for integer PR);
    ordering is unaffected. Dense per-block inflow partials are float64
    ``np.bincount`` sums, exact because total mass ≤ 2**total_bits < 2**53.
    """
    if total_bits > 52:
        raise ValueError("total_bits must be ≤ 52 so bincount sums stay "
                         "exact in float64")

    def deg_partial(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy()
        d = t[dst_col].to_numpy()
        us, cs = np.unique(s, return_counts=True)
        ud = np.unique(d)
        return pa.table(
            {"node": pa.array(np.concatenate([us, ud]).astype(np.int64)),
             "outd": pa.array(np.concatenate(
                 [cs, np.zeros(len(ud))]).astype(np.int64))}
        )

    parts = ds.map_batches(deg_partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"node": pd.array([], dtype=np.int64),
                             "pr": pd.array([], dtype=np.int64)})
    agg = parts.groupby("node")["outd"].sum().sort_index()
    nodes = agg.index.to_numpy(dtype=np.int64)
    outd = agg.to_numpy(dtype=np.int64)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": pd.array([], dtype=np.int64),
                             "pr": pd.array([], dtype=np.int64)})
    if n > max_broadcast_nodes:
        raise ValueError(
            f"pagerank broadcasts the node table and this graph has {n} "
            f"nodes (> max_broadcast_nodes={max_broadcast_nodes}); use the "
            f"BSP shuffle layout (join contributions by src, aggregate by "
            f"dst per iteration) at this scale."
        )
    nodes_ref = ray.put(nodes)

    def to_idx(t: pa.Table) -> pa.Table:
        nd = ray.get(nodes_ref)
        si = np.searchsorted(nd, t[src_col].to_numpy().astype(np.int64))
        di = np.searchsorted(nd, t[dst_col].to_numpy().astype(np.int64))
        return pa.table({"si": pa.array(si.astype(np.int64)),
                         "di": pa.array(di.astype(np.int64))})

    edges = ds.map_batches(to_idx, batch_format="pyarrow").materialize()

    init = (1 << total_bits) // n
    teleport = ((d_den - d_num) * init) // d_den
    pr = np.full(n, init, dtype=np.int64)
    outd_ref = ray.put(outd)

    for _ in range(iters):
        pr_ref = ray.put(pr)

        def inflow(t: pa.Table, pr_ref=pr_ref) -> pa.Table:
            prv = ray.get(pr_ref)
            od = ray.get(outd_ref)
            contrib = np.zeros(len(prv), dtype=np.int64)
            nz = od > 0
            contrib[nz] = prv[nz] // od[nz]
            s = np.bincount(
                t["di"].to_numpy(),
                weights=contrib[t["si"].to_numpy()].astype(np.float64),
                minlength=len(prv),
            )
            return pa.table({"v": pa.array([s.astype(np.int64)],
                                           pa.list_(pa.int64()))})

        total = np.zeros(n, dtype=np.int64)
        for b in edges.map_batches(
            inflow, batch_format="pyarrow"
        ).iter_batches(batch_size=256, batch_format="pyarrow"):
            for row in b["v"]:
                total += np.asarray(row.as_py(), dtype=np.int64)
        pr = teleport + (d_num * total) // d_den

    return pd.DataFrame({"node": nodes, "pr": pr})
