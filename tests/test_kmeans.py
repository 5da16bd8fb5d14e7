"""Distributed fixed-point k-means (pipelines/similarity.kmeans)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _blob_ds(rd, n_per=200, d=8, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.randn(4, d) * 5
    rows = []
    vid = 0
    truth = []
    for ci, c in enumerate(centers):
        for _ in range(n_per):
            rows.append(c + rng.randn(d) * 0.3)
            truth.append(ci)
            vid += 1
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(rows), dtype=np.int64),
            "embedding": [r.astype(np.float32) for r in rows],
            "truth": np.array(truth),
        }
    )
    return rd.from_pandas(df), df


def test_kmeans_partition_invariant_and_separates_blobs(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.similarity import kmeans

    ds, df = _blob_ds(rd)
    cents_a, assign_a = kmeans(ds, k=4, iters=8, seed=0)
    a = assign_a.to_pandas().sort_values("vec_id").reset_index(drop=True)

    cents_b, assign_b = kmeans(
        rd.from_pandas(df).repartition(11), k=4, iters=8, seed=0
    )
    b = assign_b.to_pandas().sort_values("vec_id").reset_index(drop=True)

    # exact integer math → identical centroids AND assignments under any
    # partitioning (the whole point of the fixed-point design)
    assert np.array_equal(cents_a, cents_b)
    assert list(a["cluster"]) == list(b["cluster"])

    # well-separated blobs: each found cluster maps to one true blob
    merged = a.merge(df[["vec_id", "truth"]], on="vec_id")
    purity = (
        merged.groupby("cluster")["truth"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s))
        .min()
    )
    assert purity > 0.99


def test_kmeans_seed_changes_init_and_guard(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.similarity import kmeans

    ds, df = _blob_ds(rd, n_per=50)
    c0, _ = kmeans(ds, k=4, iters=0, seed=0)
    c1, _ = kmeans(rd.from_pandas(df), k=4, iters=0, seed=9)
    assert not np.array_equal(c0, c1)  # init rows differ by seed

    big = rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(4, dtype=np.int64),
                "embedding": [
                    np.full(4, 1e6, dtype=np.float32) for _ in range(4)
                ],
            }
        )
    )
    with pytest.raises(Exception, match="overflow guard"):
        kmeans(big, k=2, iters=1)  # materialize inside raises eagerly


def test_semantic_decontam_finds_paraphrase_leak(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.similarity import semantic_decontam

    rng = np.random.RandomState(5)
    base = rng.randn(50, 16).astype(np.float32)
    train = pd.DataFrame(
        {
            "vec_id": np.arange(50, dtype=np.int64),
            "embedding": list(base),
        }
    )
    # eval: two vectors — one a tiny perturbation of train row 7 (leak),
    # one orthogonal-ish fresh vector (clean)
    leak = base[7] + rng.randn(16).astype(np.float32) * 0.01
    clean = rng.randn(16).astype(np.float32) * 10
    ev = pd.DataFrame(
        {"vec_id": np.array([100, 101], dtype=np.int64),
         "embedding": [leak, clean]}
    )
    out = semantic_decontam(
        rd.from_pandas(train).repartition(4), rd.from_pandas(ev),
        threshold=0.98,
    ).to_pandas()
    assert (7, 100) in set(zip(out["train_id"], out["eval_id"]))
    assert 101 not in set(out["eval_id"])


def test_davies_bouldin_mirror_and_invariance(ray_session):
    import math

    import ray.data as rd

    from record_matcher_ray.pipelines.similarity import (
        davies_bouldin,
        kmeans,
    )

    rng = np.random.RandomState(5)
    vecs = np.concatenate(
        [c + 0.1 * rng.randn(30, 8) for c in rng.randn(3, 8) * 3]
    )
    ids = np.arange(len(vecs), dtype=np.int64)
    mk = lambda p: rd.from_arrow(pa.table(
        {"vec_id": ids,
         "embedding": pa.array([list(v) for v in vecs],
                               pa.list_(pa.float32()))})).repartition(p)
    out = davies_bouldin(mk(3), k=3, iters=4)
    out2 = davies_bouldin(mk(7), k=3, iters=4)
    pd.testing.assert_frame_equal(out, out2)  # partitioning-invariant

    # brute mirror from the kmeans outputs
    cents, asg = kmeans(mk(3), k=3, iters=4)
    lab = {r["vec_id"]: r["cluster"] for r in asg.take_all()}
    q = np.floor(np.asarray(vecs, np.float32).astype(np.float64)
                 * (1 << 20) + 0.5).astype(np.int64)
    agg = {}
    for i in ids:
        c = lab[int(i)]
        d = q[i].astype(object) - cents[c].astype(object)
        agg.setdefault(c, [0, 0])
        agg[c][0] += 1
        agg[c][1] += int((d * d).sum())
    s = {c: math.sqrt(float(v[1]) / float(v[0])) for c, v in agg.items()}
    for _, row in out.iterrows():
        c = int(row["cluster"])
        assert row["n_members"] == agg[c][0]
        assert row["s"] == math.floor(s[c] * 1e9 + 0.5) / 1e9
    # db equals mean of d_i
    tot = 0.0
    for c in sorted(agg):
        tot = tot + out.set_index("cluster").loc[c, "d_i"]
    # note: d_i in the frame is rounded; recompute from unrounded s
    ds_of = {}
    for i in sorted(agg):
        best, got = 0.0, False
        for j in sorted(agg):
            if i == j:
                continue
            diff = cents[i].astype(object) - cents[j].astype(object)
            m2 = int((diff * diff).sum())
            if m2 == 0:
                continue
            r = (s[i] + s[j]) / math.sqrt(float(m2))
            if not got or r > best:
                best, got = r, True
        ds_of[i] = best if got else 0.0
    tot2 = 0.0
    for c in sorted(agg):
        tot2 = tot2 + ds_of[c]
    db = tot2 / float(len(agg))
    assert (out["db"] == math.floor(db * 1e9 + 0.5) / 1e9).all()


def test_semantic_dedup(ray_session):
    """SemDeDup composition: within-bucket near-dup groups elect the min
    id; distinct directions never merge; every input row is present
    exactly once with rep consistency."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from record_matcher_ray.pipelines.similarity import semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(6, 16).astype(np.float64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, ids = [], []
    nid = 0
    for g in range(6):
        for rep_i in range(3):  # 3 near-copies per direction
            v = base[g] + 0.01 * rng.randn(16)
            vecs.append(v / np.linalg.norm(v))
            ids.append(nid)
            nid += 1
    df = pd.DataFrame({"vec_id": np.int64(ids),
                       "embedding": [list(map(float, v)) for v in vecs]})
    out = semantic_dedup(rd.from_pandas(df), k=3, iters=4, threshold=0.95)
    assert sorted(out.vec_id) == ids
    # each triple of near-copies shares one rep == its min id (they are
    # ~identical so they land in the same kmeans bucket)
    for g in range(6):
        grp = out[out.vec_id.isin([3 * g, 3 * g + 1, 3 * g + 2])]
        assert grp.rep.nunique() == 1
        assert grp.rep.iloc[0] == 3 * g
        assert list(grp.sort_values("vec_id").is_dup) == [False, True, True]
    # reps are real members of their own cluster
    m = out.set_index("vec_id")
    for _, r in out.iterrows():
        assert m.loc[r.rep, "cluster"] == r.cluster
        assert not m.loc[r.rep, "is_dup"]


def test_semantic_dedup_guards(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from record_matcher_ray.pipelines.similarity import semantic_dedup

    df = pd.DataFrame({"vec_id": np.int64([1, 2, 3]),
                       "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]})
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        semantic_dedup(rd.from_pandas(df), k=2, max_broadcast_rows=2)
