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
