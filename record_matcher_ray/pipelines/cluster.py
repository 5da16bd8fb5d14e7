"""Transitive clustering — connected components over accepted match pairs
(engine addition per BASELINE.json north_rule; absent from the reference,
SURVEY.md §2.4 M6).

Two execution paths:
- **driver union-find** (default when the edge list is small): stream the
  two int64 edge columns to the driver, classic union-find with path
  compression. Exact, one pass.
- **BSP min-label propagation** (scale path): iterate
  ``labels(v) = min(labels(v), min over neighbors labels(u))`` as a
  hash_join + groupby-min per round until the label sum reaches a fixpoint.
  Convergence is monotone; rounds ≈ cluster diameter (entity clusters are
  shallow). Each round shuffles only (node, label) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min, Sum

from record_matcher_ray.pipelines.joins import hash_join


def _find(parent: dict[int, int], x: int) -> int:
    root = x
    while parent.get(root, root) != root:
        root = parent[root]
    while parent.get(x, x) != x:  # path compression
        parent[x], x = root, parent[x]
    return root


def connected_components_arrays(
    u: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components over int64 edge arrays →
    (nodes sorted asc, component id = min node id in the component).

    Min-label propagation with pointer jumping: each round relaxes every
    edge (scatter-min both directions) then collapses label chains
    (``label = label[label]``) to fixpoint. Rounds ≈ O(log n); for the
    star-shaped mention↔registry graphs docmatch emits, 2-3 rounds. All
    O(E) numpy — the per-edge Python union-find loop it replaces cost
    ~3 s per 600k edges on the driver."""
    if len(u) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    nodes, codes = np.unique(np.concatenate([u, v]), return_inverse=True)
    cu, cv = codes[: len(u)], codes[len(u):]
    label = np.arange(len(nodes), dtype=np.int64)
    # scatter-min via a ONE-TIME sort of the (static) edge incidence list +
    # per-round gather/reduceat — np.minimum.at's unbuffered scatter was
    # ~2 s per 600k edges, the sorted segmented form is ~20× faster
    inc = np.concatenate([cu, cv])
    order = np.argsort(inc, kind="stable")
    inc_s = inc[order]
    seg = np.nonzero(np.concatenate(([True], inc_s[1:] != inc_s[:-1])))[0]
    touched = inc_s[seg]
    while True:
        m = np.minimum(label[cu], label[cv])
        before = label.copy()
        mm = np.concatenate([m, m])[order]
        segmin = np.minimum.reduceat(mm, seg)
        label[touched] = np.minimum(label[touched], segmin)
        while True:
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(before, label):
            break
    # nodes is sorted, so code order == value order: label indexes map
    # straight back to min node ids
    return nodes, nodes[label]


def connected_components_star(
    u: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Connected components for the DEGREE-≤1 left side special case: every
    ``u`` value appears in at most one edge, so the graph is a forest of
    stars centered on ``v`` and a component is exactly one v-group. One
    sort + segmented min — no node-id ``np.unique``, no propagation
    rounds; ~⅓ the memory traffic of the general kernel, which matters on
    this host where a cold driver pays first-touch faults per fresh byte
    (CLAUDE.md). Same contract as ``connected_components_arrays``:
    (nodes sorted asc, component id = min node id in the component).
    Callers must guarantee u-uniqueness (docmatch's winner pairs are one
    row per x by construction of the per-x argmax reduce)."""
    if len(u) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.argsort(v, kind="stable")
    vs = v[order]
    us = u[order]
    seg = np.nonzero(np.concatenate(([True], vs[1:] != vs[:-1])))[0]
    v_uniq = vs[seg]
    comp_g = np.minimum(np.minimum.reduceat(us, seg), v_uniq)
    sizes = np.diff(np.concatenate((seg, [len(vs)])))
    nodes = np.concatenate([us, v_uniq])
    comps = np.concatenate([np.repeat(comp_g, sizes), comp_g])
    no = np.argsort(nodes, kind="stable")
    return nodes[no], comps[no]


def connected_components_local(edges) -> dict[int, int]:
    """Union-find over an iterable of (u, v); returns node → component root
    (the minimum node id in the component)."""
    parent: dict[int, int] = {}
    seen: set[int] = set()
    for u, v in edges:
        u, v = int(u), int(v)
        seen.add(u)
        seen.add(v)
        ru, rv = _find(parent, u), _find(parent, v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {n: _find(parent, n) for n in seen}


def connected_components(
    edges: ray.data.Dataset,
    u: str = "u",
    v: str = "v",
    driver_threshold: int = 2_000_000,
    max_iter: int = 30,
) -> ray.data.Dataset:
    """→ Dataset(node:int64, component:int64). Component id = min node id."""
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"node": pd.Series([], dtype="int64"),
                          "component": pd.Series([], dtype="int64")})
        )
    if n_edges <= driver_threshold:
        # zero-copy block pulls (driver iter_batches over big data is a
        # first-touch-fault trap, CLAUDE.md) + vectorized label propagation
        blocks = [
            t for t in ray.get(edges.materialize().to_arrow_refs()) if len(t)
        ]
        uu = np.concatenate([t[u].to_numpy() for t in blocks])
        vv = np.concatenate([t[v].to_numpy() for t in blocks])
        nodes, roots = connected_components_arrays(
            uu.astype(np.int64, copy=False), vv.astype(np.int64, copy=False)
        )
        return ray.data.from_arrow(
            pa.table({"node": pa.array(nodes), "component": pa.array(roots)})
        )
    return _connected_components_bsp(edges, u, v, max_iter)


def _connected_components_bsp(edges, u, v, max_iter) -> ray.data.Dataset:
    def fwd(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[u].combine_chunks().cast(pa.int64()),
                         "dst": t[v].combine_chunks().cast(pa.int64())})

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[v].combine_chunks().cast(pa.int64()),
                         "dst": t[u].combine_chunks().cast(pa.int64())})

    sym = edges.map_batches(fwd, batch_format="pyarrow").union(
        edges.map_batches(rev, batch_format="pyarrow")
    ).materialize()

    # label init: min(node, min neighbor)
    labels = (
        sym.groupby("src").aggregate(Min("dst", alias_name="nbr"))
        .map_batches(
            lambda t: pa.table(
                {"node": t["src"].combine_chunks(),
                 "label": pa.compute.min_element_wise(
                     t["src"].combine_chunks(), t["nbr"].combine_chunks())}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev_sum = labels.aggregate(Sum("label"))["sum(label)"]

    for _ in range(max_iter):
        msgs = hash_join(sym, labels, left_on="src", right_on="node").map_batches(
            lambda t: pa.table({"node": t["dst"].combine_chunks(),
                                "label": t["label"].combine_chunks()}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = labels.aggregate(Sum("label"))["sum(label)"]
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels.map_batches(
        lambda t: pa.table({"node": t["node"].combine_chunks(),
                            "component": t["label"].combine_chunks()}),
        batch_format="pyarrow",
    )
