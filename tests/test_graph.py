"""Fixed-point integer PageRank: partition invariance, local replay,
structural sanity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from record_matcher_ray.pipelines.graph import pagerank


def _local_pr(src, dst, iters=5, d_num=85, d_den=100, total_bits=40):
    """Pure-numpy replay of the integer recursion."""
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    n = len(nodes)
    outd = np.bincount(si, minlength=n).astype(np.int64)
    init = (1 << total_bits) // n
    tele = ((d_den - d_num) * init) // d_den
    pr = np.full(n, init, dtype=np.int64)
    for _ in range(iters):
        contrib = np.zeros(n, dtype=np.int64)
        nz = outd > 0
        contrib[nz] = pr[nz] // outd[nz]
        inflow = np.bincount(di, weights=contrib[si].astype(float),
                             minlength=n).astype(np.int64)
        pr = tele + (d_num * inflow) // d_den
    return pd.DataFrame({"node": nodes, "pr": pr})


def test_pagerank_matches_local_replay_any_partitioning(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(13)
    src = rng.randint(0, 200, size=5_000).astype(np.int64)
    dst = rng.randint(0, 200, size=5_000).astype(np.int64)
    df = pd.DataFrame({"src": src, "dst": dst})
    want = _local_pr(src, dst, iters=5)

    for parts in (1, 11):
        out = (
            pagerank(rd.from_pandas(df).repartition(parts), iters=5)
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, want)


def test_pagerank_star_hub_dominates(ray_session):
    import ray.data as rd

    # star: every leaf points at the hub and back
    leaves = np.arange(1, 50, dtype=np.int64)
    src = np.concatenate([leaves, np.zeros(len(leaves), np.int64)])
    dst = np.concatenate([np.zeros(len(leaves), np.int64), leaves])
    out = pagerank(
        rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})), iters=8
    )
    hub = int(out.loc[out["node"] == 0, "pr"].iloc[0])
    leaf = int(out.loc[out["node"] == 1, "pr"].iloc[0])
    assert hub > 10 * leaf
    # mass bounded by the fixed-point total (floors only lose mass)
    assert out["pr"].sum() <= (1 << 40)
    assert (out["pr"] > 0).all()


def test_pagerank_dangling_and_empty(ray_session):
    import ray.data as rd

    # 1 → 2, 2 dangling: node 2 keeps only its teleport share growth
    out = pagerank(
        rd.from_pandas(pd.DataFrame({"src": [1], "dst": [2]})), iters=3
    )
    assert set(out["node"]) == {1, 2}
    pr1 = int(out.loc[out["node"] == 1, "pr"].iloc[0])
    pr2 = int(out.loc[out["node"] == 2, "pr"].iloc[0])
    assert pr2 > pr1  # 2 receives 1's mass, 1 only teleports

    empty = pagerank(
        rd.from_pandas(pd.DataFrame({"src": pd.array([], dtype=np.int64),
                                     "dst": pd.array([], dtype=np.int64)})),
        iters=2,
    )
    assert len(empty) == 0

    with pytest.raises(ValueError):
        pagerank(
            rd.from_pandas(pd.DataFrame({"src": [1], "dst": [2]})),
            total_bits=60,
        )


class TestTriangleCount:
    def _brute(self, edges):
        import itertools

        adj = {}
        for u, v in edges:
            if u == v:
                continue
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        tri = 0
        for a, b, c in itertools.combinations(sorted(adj), 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                tri += 1
        n_edges = len({(min(u, v), max(u, v)) for u, v in edges if u != v})
        return len(adj), n_edges, tri

    def _run(self, edges, **kw):
        import ray.data

        from record_matcher_ray.pipelines.graph import triangle_count

        ds = ray.data.from_items(
            [{"src": u, "dst": v} for u, v in edges], override_num_blocks=5
        )
        out = triangle_count(ds, **kw)
        return (
            int(out["n_nodes"][0]),
            int(out["n_edges"][0]),
            int(out["n_triangles"][0]),
        )

    def test_known_shapes(self, ray_session):
        # K4 has 4 triangles; duplicates / reversals / self-loops ignored
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        noisy = k4 + [(1, 0), (2, 2), (0, 1), (3, 1)]
        assert self._run(noisy) == (4, 6, 4)
        # star graph: no triangles
        star = [(0, i) for i in range(1, 8)]
        assert self._run(star) == (8, 7, 0)

    def test_random_vs_brute(self, ray_session):
        import numpy as np

        rng = np.random.RandomState(7)
        edges = [
            (int(a), int(b))
            for a, b in rng.randint(0, 40, size=(400, 2))
        ]
        assert self._run(edges) == self._brute(edges)

    def test_empty(self, ray_session):
        assert self._run([(3, 3)]) == (0, 0, 0)


def test_label_propagation(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.graph import label_propagation

    # two cliques {0,1,2} and {10,11,12} joined by one weak bridge
    cl1 = [(0, 1), (1, 2), (0, 2)]
    cl2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(2, 10)]
    und = cl1 + cl2 + bridge
    src = np.array([a for a, b in und] + [b for a, b in und],
                   dtype=np.int64)
    dst = np.array([b for a, b in und] + [a for a, b in und],
                   dtype=np.int64)
    df = pd.DataFrame({"src": src, "dst": dst})
    out = label_propagation(
        rd.from_pandas(df).repartition(3), iters=4
    ).set_index("node")["label"]

    # python mirror: synchronous LPA, most-frequent in-label, min ties
    import collections
    lab = {v: v for v in sorted(set(src) | set(dst))}
    for _ in range(4):
        nxt = dict(lab)
        inb = collections.defaultdict(list)
        for s, d in zip(src, dst):
            inb[d].append(lab[s])
        for v, labs in inb.items():
            c = collections.Counter(labs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = min(l for l in c if c[l] == best[1])
        lab = nxt
    for v, want in lab.items():
        assert out.loc[v] == want
    # the two cliques end in different communities
    assert len({out.loc[0], out.loc[1], out.loc[2]}) == 1
    assert len({out.loc[10], out.loc[11], out.loc[12]}) == 1
    assert out.loc[0] != out.loc[10]

    empty = df.iloc[:0]
    out2 = label_propagation(rd.from_pandas(empty))
    assert len(out2) == 0


def test_label_propagation_partition_invariant(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.graph import label_propagation

    rng = np.random.RandomState(3)
    src = rng.randint(0, 60, size=400).astype(np.int64)
    dst = rng.randint(0, 60, size=400).astype(np.int64)
    df = pd.DataFrame({"src": src, "dst": dst})
    a = label_propagation(rd.from_pandas(df).repartition(2), iters=3)
    b = label_propagation(rd.from_pandas(df).repartition(11), iters=3)
    pd.testing.assert_frame_equal(
        a.sort_values("node").reset_index(drop=True),
        b.sort_values("node").reset_index(drop=True),
    )


def test_personalized_pagerank(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.graph import pagerank

    # star around 0 plus a far pair 10-11; restart at {0}
    und = [(0, 1), (0, 2), (0, 3), (10, 11)]
    src = np.array([a for a, b in und] + [b for a, b in und],
                   dtype=np.int64)
    dst = np.array([b for a, b in und] + [a for a, b in und],
                   dtype=np.int64)
    df = pd.DataFrame({"src": src, "dst": dst})
    out = pagerank(rd.from_pandas(df), iters=4,
                   seeds=np.array([0], dtype=np.int64)
                   ).set_index("node")["pr"]
    # python mirror (integer PPR)
    nodes = sorted(set(src) | set(dst))
    idx = {v: i for i, v in enumerate(nodes)}
    outd = {v: 0 for v in nodes}
    for s in src:
        outd[s] += 1
    total = 1 << 40
    init = total // 1
    pr = {v: (init if v == 0 else 0) for v in nodes}
    for _ in range(4):
        inflow = {v: 0 for v in nodes}
        for s, d in zip(src, dst):
            inflow[d] += pr[s] // outd[s]
        pr = {v: ((15 * init) // 100 if v == 0 else 0)
              + (85 * inflow[v]) // 100 for v in nodes}
    for v in nodes:
        assert out.loc[v] == pr[v]
    # all mass near the seed; the detached pair gets none
    assert out.loc[10] == 0 and out.loc[11] == 0
    assert out.loc[0] > out.loc[1] > 0

    with pytest.raises(ValueError, match="no seed id"):
        pagerank(rd.from_pandas(df), seeds=np.array([99], dtype=np.int64))


def test_transitivity_audit(ray_session):
    import math

    import ray.data as rd

    from record_matcher_ray.pipelines.graph import transitivity_audit

    rng = np.random.default_rng(41)
    # random graph with duplicate + reversed + self-loop noise
    e = rng.integers(0, 40, size=(400, 2))
    df = pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})
    out = transitivity_audit(rd.from_pandas(df).repartition(5))
    # brute force on the simple graph
    edges = {tuple(sorted(p)) for p in e if p[0] != p[1]}
    import collections

    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tri = 0
    nodes = sorted(deg)
    es = set(edges)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes:
                if c > b and (a, c) in es and (b, c) in es:
                    tri += 1
    assert out["n_wedges"].iloc[0] == wedges
    assert out["n_triangles"].iloc[0] == tri
    assert out["n_edges"].iloc[0] == len(edges)
    want = math.floor(3.0 * tri / wedges * 1e6 + 0.5) / 1e6
    assert out["transitivity"].iloc[0] == want
    # triangle-free star: transitivity 0
    star = pd.DataFrame({"src": [0] * 5, "dst": [1, 2, 3, 4, 5]})
    z = transitivity_audit(rd.from_pandas(star))
    assert z["transitivity"].iloc[0] == 0.0 and z["n_wedges"].iloc[0] == 10
