"""pipelines/linkage.py: edit-distance similarity join, Fellegi-Sunter
probabilistic linkage, meta-blocking WEP — brute-force and DuckDB
cross-checks plus the edge cases the bucketed paths must survive."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from record_matcher_ray.pipelines.linkage import (
    edit_distance_self_join,
    fellegi_sunter_link,
    fellegi_sunter_weights,
    metablock_wep_pairs,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _ds(rows: dict):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


# ---------------------------------------------------------------------------
# edit_distance_self_join
# ---------------------------------------------------------------------------


def _brute_edjoin(ids, texts, k):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = _lev(texts[i], texts[j])
            if d <= k:
                lo, hi = sorted((ids[i], ids[j]))
                out.add((lo, hi, d))
    return out


@pytest.mark.parametrize("k", [0, 1, 2])
def test_edjoin_matches_bruteforce(ray_session, k):
    rng = np.random.RandomState(7 + k)
    vocab = ["red", "blue", "green", "gray", "grey", "bolt", "bolts",
             "nut", "nuts", "gear", "gears", "a", "ab", "", "x" * 70]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(1, 3)))
        for _ in range(120)
    ]
    ids = list(range(120))
    ds = _ds({"id": ids, "txt": texts})
    got = {
        (r["x_id"], r["y_id"], r["dist"])
        for r in edit_distance_self_join(
            ds, "txt", "id", max_dist=k, q=2
        ).take_all()
    }
    assert got == _brute_edjoin(ids, texts, k)


def test_edjoin_short_strings_complete(ray_session):
    # every string below the q*(k+1) gram-guarantee cut: the length-band
    # path alone must find all pairs (including the empty string)
    texts = ["", "a", "b", "ab", "ba", "abc", "xy", "abcd"]
    ids = list(range(len(texts)))
    ds = _ds({"id": ids, "txt": texts})
    got = {
        (r["x_id"], r["y_id"], r["dist"])
        for r in edit_distance_self_join(
            ds, "txt", "id", max_dist=2, q=2
        ).take_all()
    }
    assert got == _brute_edjoin(ids, texts, 2)


def test_edjoin_long_strings_use_fallback_kernel(ray_session):
    # > 64 chars exercises the classic-DP pair kernel behind the Myers cap
    base = "q" * 70
    texts = [base, base + "z", base[:-1], "unrelatedstringofsimilarlen" * 3]
    ids = [10, 20, 30, 40]
    ds = _ds({"id": ids, "txt": texts})
    got = {
        (r["x_id"], r["y_id"], r["dist"])
        for r in edit_distance_self_join(
            ds, "txt", "id", max_dist=2, q=2
        ).take_all()
    }
    assert got == _brute_edjoin(ids, texts, 2)


def test_edjoin_duplicate_groups_expand(ray_session):
    # 3 ids share one string, 2 share a string one edit away: expect all
    # intra-group dist-0 pairs plus all 3x2 cross pairs at dist 1
    ds = _ds({"id": [1, 2, 3, 4, 5], "txt": ["gear", "gear", "gear",
                                             "gears", "gears"]})
    got = {
        (r["x_id"], r["y_id"], r["dist"])
        for r in edit_distance_self_join(
            ds, "txt", "id", max_dist=1, q=2
        ).take_all()
    }
    expect = {(1, 2, 0), (1, 3, 0), (2, 3, 0), (4, 5, 0)} | {
        (a, b, 1) for a in (1, 2, 3) for b in (4, 5)
    }
    assert got == expect


def test_edjoin_empty_input(ray_session):
    ds = _ds({"id": pa.array([], pa.int64()),
              "txt": pa.array([], pa.string())})
    assert edit_distance_self_join(ds, "txt", "id").take_all() == []


def test_edjoin_gram_freq_cap_undercounts_counted(ray_session):
    # a stop-gram cap may only DROP pairs, never invent or corrupt them
    texts = ["shared prefix alpha", "shared prefix beta",
             "shared prefix alpha"]
    ds = _ds({"id": [1, 2, 3], "txt": texts})
    full = {
        (r["x_id"], r["y_id"], r["dist"])
        for r in edit_distance_self_join(
            ds, "txt", "id", max_dist=2, q=2
        ).take_all()
    }
    capped = {
        (r["x_id"], r["y_id"], r["dist"])
        for r in edit_distance_self_join(
            ds, "txt", "id", max_dist=2, q=2, max_gram_freq=1
        ).take_all()
    }
    assert capped <= full
    # exact-dup pairs bypass candidate generation, so they survive any cap
    assert (1, 3, 0) in capped


# ---------------------------------------------------------------------------
# fellegi_sunter_link
# ---------------------------------------------------------------------------


def test_fs_weights_exact_u(ray_session):
    # field values: a,a,a,b  → u = (9 + 1) / 16
    ds = _ds({"f": ["a", "a", "a", "b"]})
    wa, wd = fellegi_sunter_weights(ds, ["f"], [0.9])
    u = 10 / 16
    assert wa[0] == pytest.approx(math.log(0.9) - math.log(u), abs=0)
    assert wd[0] == pytest.approx(
        math.log(1.0 - 0.9) - math.log(1.0 - u), abs=0
    )


def test_fs_weights_null_excluded(ray_session):
    # nulls drop from the ssq numerator but stay in N
    ds = _ds({"f": pa.array(["a", "a", None, None], pa.string())})
    wa, _ = fellegi_sunter_weights(ds, ["f"], [0.9])
    assert wa[0] == math.log(0.9) - math.log(4 / 16)


def test_fs_link_bruteforce(ray_session):
    rng = np.random.RandomState(11)
    n = 200
    blk = rng.randint(0, 8, n)
    f1 = rng.choice(["x", "y", "z"], n)
    f2 = rng.randint(0, 5, n).astype(np.int64)
    ds = _ds({"id": np.arange(n, dtype=np.int64), "blk": blk,
              "f1": f1, "f2": f2})
    got = {
        (r["x_id"], r["y_id"]): (r["score"], r["decision"])
        for r in fellegi_sunter_link(
            ds, "id", "blk", ["f1", "f2"], t_upper=3.0, t_lower=0.0
        ).take_all()
    }
    # mirror weights
    u1 = sum(int(c) ** 2 for c in np.bincount(
        np.unique(f1, return_inverse=True)[1])) / (n * n)
    u2 = sum(int(c) ** 2 for c in np.bincount(f2)) / (n * n)
    wa = [math.log(0.9) - math.log(u1), math.log(0.9) - math.log(u2)]
    wd = [math.log(0.1) - math.log(1.0 - u1),
          math.log(0.1) - math.log(1.0 - u2)]
    expect = {}
    for i in range(n):
        for j in range(i + 1, n):
            if blk[i] != blk[j]:
                continue
            s = (wa[0] if f1[i] == f1[j] else wd[0]) + (
                wa[1] if f2[i] == f2[j] else wd[1]
            )
            dec = ("match" if s >= 3.0 else
                   "possible" if s >= 0.0 else "nonmatch")
            r6 = math.floor(s * 1e6 + 0.5) / 1e6 if s >= 0 else (
                -math.floor(-s * 1e6 + 0.5) / 1e6)
            expect[(i, j)] = (r6, dec)
    assert got == expect


def test_fs_link_null_blocks_drop(ray_session):
    ds = _ds({"id": [1, 2, 3, 4],
              "blk": pa.array([None, None, 5, 5], pa.int64()),
              "f": ["a", "a", "a", "b"]})
    rows = fellegi_sunter_link(ds, "id", "blk", ["f"]).take_all()
    assert {(r["x_id"], r["y_id"]) for r in rows} == {(3, 4)}


def test_fs_link_string_block_keys(ray_session):
    ds = _ds({"id": [1, 2, 3], "blk": ["east", "east", "west"],
              "f": ["a", "a", "b"]})
    rows = fellegi_sunter_link(ds, "id", "blk", ["f"]).take_all()
    assert {(r["x_id"], r["y_id"]) for r in rows} == {(1, 2)}
    assert rows[0]["decision"] == "match" or rows[0]["score"] < 4.0


def test_fs_link_max_block_cap(ray_session):
    ds = _ds({"id": list(range(10)), "blk": [0] * 10,
              "f": ["a", "b"] * 5})
    assert len(fellegi_sunter_link(
        ds, "id", "blk", ["f"], max_block=5
    ).take_all()) == 0


def test_fs_weights_degenerate_field_raises(ray_session):
    ds = _ds({"f": ["a", "a"]})
    with pytest.raises(ValueError, match="degenerate"):
        fellegi_sunter_weights(ds, ["f"], [0.9])


# ---------------------------------------------------------------------------
# metablock_wep_pairs
# ---------------------------------------------------------------------------


def _brute_wep(ids, attr_rows):
    toks = [
        {t for t in " ".join(a).lower().split(" ") if t}
        for a in attr_rows
    ]
    edges = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            w = len(toks[i] & toks[j])
            if w:
                edges[(min(ids[i], ids[j]), max(ids[i], ids[j]))] = w
    if not edges:
        return {}
    mean = float(sum(edges.values())) / float(len(edges))
    return {k: w for k, w in edges.items() if float(w) > mean}


def test_metablock_bruteforce(ray_session):
    rng = np.random.RandomState(3)
    vocab = ["red", "blue", "bolt", "nut", "gear", "acme", "corp"]
    rows = [
        (" ".join(rng.choice(vocab, 2)), " ".join(rng.choice(vocab, 2)))
        for _ in range(60)
    ]
    ids = list(range(60))
    ds = _ds({"id": ids, "a1": [r[0] for r in rows],
              "a2": [r[1] for r in rows]})
    got = {
        (r["x_id"], r["y_id"]): r["weight"]
        for r in metablock_wep_pairs(ds, "id", ["a1", "a2"]).take_all()
    }
    assert got == _brute_wep(ids, rows)


def test_metablock_empty_and_no_edges(ray_session):
    ds = _ds({"id": [1, 2], "a": ["aaa", "bbb"]})
    assert metablock_wep_pairs(ds, "id", ["a"]).take_all() == []
    empty = _ds({"id": pa.array([], pa.int64()),
                 "a": pa.array([], pa.string())})
    assert metablock_wep_pairs(empty, "id", ["a"]).take_all() == []


def test_metablock_null_attrs_are_empty(ray_session):
    ds = _ds({"id": [1, 2, 3],
              "a": pa.array(["x y", None, "y z"], pa.string())})
    got = {
        (r["x_id"], r["y_id"]): r["weight"]
        for r in metablock_wep_pairs(ds, "id", ["a"]).take_all()
    }
    assert got == _brute_wep([1, 2, 3], [("x y",), ("",), ("y z",)])


# ---------------------------------------------------------------------------
# mutual_nearest_neighbors (similarity.py — the embedding-ER seed pairs)
# ---------------------------------------------------------------------------


def _brute_mutual(ids, vecs, qscale=1 << 20):
    q = np.floor(np.asarray(vecs, np.float64) * float(qscale) + 0.5)
    nrm = (q * q).sum(axis=1)
    n = len(ids)
    best = {}
    for i in range(n):
        if nrm[i] == 0:
            continue
        cand = []
        for j in range(n):
            if i == j or nrm[j] == 0:
                continue
            cs = (q[i] @ q[j]) / (math.sqrt(nrm[i]) * math.sqrt(nrm[j]))
            cand.append((-cs, ids[j]))
        if cand:
            cand.sort()
            best[ids[i]] = (cand[0][1], -cand[0][0])
    out = {}
    for a, (b, cs) in best.items():
        if best.get(b, (None,))[0] == a and a < b:
            r6 = math.floor(cs * 1e6 + 0.5) / 1e6 if cs >= 0 else (
                -math.floor(-cs * 1e6 + 0.5) / 1e6)
            out[(a, b)] = r6
    return out


def test_mutual_nn_bruteforce(ray_session):
    from record_matcher_ray.pipelines.similarity import (
        mutual_nearest_neighbors,
    )

    rng = np.random.RandomState(5)
    n, d = 80, 8
    vecs = rng.randn(n, d).astype(np.float32)
    vecs[7] = 0.0  # zero vector pairs with nothing
    ids = np.arange(n, dtype=np.int64)
    ds = _ds({"vec_id": ids,
              "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    got = {
        (r["x_id"], r["y_id"]): r["cos_sim"]
        for r in mutual_nearest_neighbors(ds).take_all()
    }
    expect = _brute_mutual(ids, vecs.astype(np.float64))
    assert got == expect
    assert not any(7 in k for k in got)


def test_mutual_nn_tie_breaks_to_smaller_id(ray_session):
    from record_matcher_ray.pipelines.similarity import (
        mutual_nearest_neighbors,
    )

    # 3 identical vectors: best-of-each is the smallest OTHER id →
    # only (1, 2) is reciprocal
    v = [1.0, 2.0]
    ds = _ds({"vec_id": [1, 2, 3],
              "embedding": pa.array([v, v, v], pa.list_(pa.float32()))})
    got = {(r["x_id"], r["y_id"]) for r in
           mutual_nearest_neighbors(ds).take_all()}
    assert got == {(1, 2)}


def test_mutual_nn_broadcast_cap(ray_session):
    from record_matcher_ray.pipelines.similarity import (
        mutual_nearest_neighbors,
    )

    ds = _ds({"vec_id": [1, 2, 3],
              "embedding": pa.array([[1.0], [2.0], [3.0]],
                                    pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        mutual_nearest_neighbors(ds, max_broadcast_rows=2)


# ---------------------------------------------------------------------------
# band_self_join
# ---------------------------------------------------------------------------


def _brute_band(ids, vals, eps):
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = abs(vals[i] - vals[j])
            if d <= eps:
                lo, hi = sorted((ids[i], ids[j]))
                out[(lo, hi)] = d
    return out


def test_band_join_bruteforce(ray_session):
    from record_matcher_ray.pipelines.linkage import band_self_join

    rng = np.random.RandomState(2)
    vals = np.round(rng.uniform(-50, 50, 300), 2)
    ids = np.arange(300, dtype=np.int64)
    ds = _ds({"id": ids, "v": vals})
    got = {
        (r["x_id"], r["y_id"]): r["diff"]
        for r in band_self_join(ds, "v", "id", 1.5).take_all()
    }
    assert got == _brute_band(ids, vals, 1.5)


def test_band_join_boundary_inclusive_and_nulls(ray_session):
    from record_matcher_ray.pipelines.linkage import band_self_join

    ds = _ds({"id": [1, 2, 3, 4],
              "v": pa.array([0.0, 1.0, 2.0 + 1e-12, None], pa.float64())})
    got = {(r["x_id"], r["y_id"]) for r in
           band_self_join(ds, "v", "id", 1.0).take_all()}
    # |0-1| = 1.0 inclusive; |1 - 2.000...| just over; null never pairs
    assert got == {(1, 2)}


def test_band_join_cell_cap_counted(ray_session):
    from record_matcher_ray.pipelines.linkage import band_self_join

    ds = _ds({"id": list(range(20)), "v": [5.0] * 20})
    full = band_self_join(ds, "v", "id", 1.0).take_all()
    capped = band_self_join(ds, "v", "id", 1.0, max_cell=5).take_all()
    assert len(full) == 190 and len(capped) < len(full)


# ---------------------------------------------------------------------------
# heavy_hitters / grouped_corr
# ---------------------------------------------------------------------------


def test_heavy_hitters_exact(ray_session):
    from record_matcher_ray.pipelines.sketches import heavy_hitters

    rng = np.random.RandomState(9)
    # zipf-ish: value v appears ~1000/v times
    vals = np.concatenate(
        [np.full(1000 // v, v, np.int64) for v in range(1, 60)]
    )
    rng.shuffle(vals)
    ds = _ds({"v": vals}).repartition(8)
    n = len(vals)
    for k in (10, 50, 200):
        got = {
            r["value"]: r["cnt"]
            for r in heavy_hitters(ds, "v", k).take_all()
        }
        cnts = {v: int((vals == v).sum()) for v in np.unique(vals)}
        expect = {v: c for v, c in cnts.items() if c * k > n}
        assert got == expect


def test_heavy_hitters_nulls_and_strings(ray_session):
    from record_matcher_ray.pipelines.sketches import heavy_hitters

    ds = _ds({"v": pa.array(["a"] * 6 + ["b"] * 2 + [None] * 4,
                            pa.string())})
    got = {r["value"]: r["cnt"]
           for r in heavy_hitters(ds, "v", 3).take_all()}
    assert got == {"a": 6}  # threshold 12/3 = 4; nulls are not values


def test_grouped_corr_exact(ray_session):
    from record_matcher_ray.pipelines.stats import grouped_corr

    rng = np.random.RandomState(4)
    n = 500
    g = rng.choice(["p", "q", "r"], n)
    x = np.round(rng.uniform(0, 100, n), 2)
    y = np.round(3.0 * x + rng.normal(0, 5, n), 2)
    ds = _ds({"g": g, "x": x, "y": y}).repartition(6)
    out = grouped_corr(ds, "g", "x", "y")
    assert sorted(out["grp"]) == ["p", "q", "r"]
    for _, row in out.iterrows():
        m = g == row["grp"]
        qx = np.floor(x[m] * 100.0 + 0.5).astype(np.int64)
        qy = np.floor(y[m] * 100.0 + 0.5).astype(np.int64)
        nn = int(m.sum())
        num = nn * int((qx.astype(object) * qy).sum()) - int(qx.sum()) * int(qy.sum())
        denx = nn * int((qx.astype(object) ** 2).sum()) - int(qx.sum()) ** 2
        deny = nn * int((qy.astype(object) ** 2).sum()) - int(qy.sum()) ** 2
        expect = round(
            float(num) / (math.sqrt(float(denx)) * math.sqrt(float(deny))), 9
        )
        assert row["n"] == nn and row["corr"] == expect


def test_grouped_corr_degenerate_groups(ray_session):
    from record_matcher_ray.pipelines.stats import grouped_corr

    ds = _ds({"g": ["a", "a", "b"], "x": [1.0, 1.0, 2.0],
              "y": [3.0, 4.0, 5.0]})
    out = grouped_corr(ds, "g", "x", "y").set_index("grp")
    assert np.isnan(out.loc["a", "corr"])  # zero x-variance
    assert np.isnan(out.loc["b", "corr"])  # n = 1


# ---------------------------------------------------------------------------
# survivorship / blocking_quality
# ---------------------------------------------------------------------------


def test_survivorship_rules(ray_session):
    from record_matcher_ray.pipelines.linkage import survivorship

    ds = _ds({
        "cl": [1, 1, 1, 2, 2, 3],
        "brand": ["b", "a", "a", "z", None, None],
        "price": [5.0, 9.0, 1.0, 2.0, 7.0, 3.0],
        "name": ["xx", "yyy", "z", "aa", "bb", "c"],
    })
    rows = {r["cluster"]: r for r in survivorship(
        ds, "cl",
        [("brand", "mode"), ("price", "max"), ("name", "longest")],
    ).take_all()}
    assert rows[1]["n_members"] == 3
    assert rows[1]["brand"] == "a"          # mode 2-of-3
    assert rows[1]["price"] == 9.0          # max
    assert rows[1]["name"] == "yyy"         # longest
    assert rows[2]["brand"] == "z"          # null never beats a value
    assert rows[3]["brand"] is None         # all-null cluster keeps null
    assert rows[3]["n_members"] == 1


def test_survivorship_mode_tie_smallest_value(ray_session):
    from record_matcher_ray.pipelines.linkage import survivorship

    ds = _ds({"cl": [1, 1, 1, 1], "v": ["beta", "beta", "alfa", "alfa"]})
    rows = survivorship(ds, "cl", [("v", "mode")]).take_all()
    assert rows[0]["v"] == "alfa"


def test_survivorship_min_shortest_and_bad_rule(ray_session):
    from record_matcher_ray.pipelines.linkage import survivorship

    ds = _ds({"cl": ["g", "g"], "n": [4, 2], "s": ["aaa", "zz"]})
    rows = survivorship(
        ds, "cl", [("n", "min"), ("s", "shortest")]
    ).take_all()
    assert rows[0]["n"] == 2 and rows[0]["s"] == "zz"
    with pytest.raises(ValueError, match="must be one of"):
        survivorship(ds, "cl", [("n", "median")])


def test_blocking_quality_exact(ray_session):
    from record_matcher_ray.pipelines.linkage import blocking_quality

    cand = _ds({"x_id": [1, 1, 2, 3], "y_id": [2, 3, 4, 9]})
    truth = _ds({"x_id": [1, 2, 5], "y_id": [2, 4, 6]})
    out = blocking_quality(cand, truth, 10)
    r = out.iloc[0]
    assert (r["n_cand"], r["n_truth"], r["n_hit"]) == (4, 3, 2)
    assert r["reduction_ratio"] == math.floor(
        (1.0 - 4.0 / 45.0) * 1e6 + 0.5) / 1e6
    assert r["pairs_completeness"] == math.floor(
        (2.0 / 3.0) * 1e6 + 0.5) / 1e6
    assert r["pairs_quality"] == 0.5


def test_blocking_quality_empty_sides(ray_session):
    from record_matcher_ray.pipelines.linkage import blocking_quality

    cand = _ds({"x_id": [1], "y_id": [2]})
    empty = _ds({"x_id": pa.array([], pa.int64()),
                 "y_id": pa.array([], pa.int64())})
    r = blocking_quality(cand, empty, 5).iloc[0]
    assert r["n_truth"] == 0 and np.isnan(r["pairs_completeness"])
    r2 = blocking_quality(empty, cand, 5).iloc[0]
    assert r2["n_cand"] == 0 and np.isnan(r2["pairs_quality"])


# ---------------------------------------------------------------------------
# grouped_entropy (stats.py)
# ---------------------------------------------------------------------------


def test_grouped_entropy_exact(ray_session):
    from record_matcher_ray.pipelines.stats import grouped_entropy

    ds = _ds({"g": ["a"] * 4 + ["b"] * 3,
              "v": ["x", "x", "y", None, "z", "z", "z"]})
    out = grouped_entropy(ds, "g", "v").set_index("grp")
    # group a: counts {x:2, y:1} over n=3 (null dropped)
    s = 2.0 * math.log(2.0) + 1.0 * math.log(1.0)
    expect = math.floor((math.log(3.0) - s / 3.0) * 1e6 + 0.5) / 1e6
    assert out.loc["a", "n"] == 3 and out.loc["a", "entropy"] == expect
    # single-value group: zero entropy (up to the pinned-float identity)
    assert out.loc["b", "entropy"] == 0.0


def test_grouped_entropy_cell_guard(ray_session):
    from record_matcher_ray.pipelines.stats import grouped_entropy

    ds = _ds({"g": list(range(30)), "v": list(range(30))})
    with pytest.raises(ValueError, match="max_cells"):
        grouped_entropy(ds, "g", "v", max_cells=10)
    # r5: the error names the widest offending groups (actionable at
    # scale — which key blew the budget, not just that one did)
    ds2 = _ds({"g": ["fat"] * 20 + ["thin"], "v": list(range(21))})
    with pytest.raises(ValueError, match="Widest groups: 'fat'×20"):
        grouped_entropy(ds2, "g", "v", max_cells=10)


def test_token_sort_pairs(ray_session):
    from record_matcher_ray.pipelines.linkage import (
        token_sort_similarity_pairs,
    )

    ds = _ds({"t": ["red widget", "widget red", "red bolt",
                    "red widget", "blue gear"]})
    got = {(r["name_a"], r["name_b"]): r["ts_sim"] for r in
           token_sort_similarity_pairs(ds, "t").take_all()}
    # word order scores 100; duplicates collapse to one distinct pair
    assert got[("red widget", "widget red")] == 100.0
    assert ("red bolt", "red widget") in got
    assert ("blue gear",) not in [k[:1] for k in got] or True
    assert all(a < b for a, b in got)
    # no token shared with "blue gear" → it pairs with nothing
    assert not any("blue gear" in k for k in got)


# ---------------------------------------------------------------------------
# bfs_hops (graph.py) / compare_vectors
# ---------------------------------------------------------------------------


def test_bfs_hops_bruteforce(ray_session):
    from record_matcher_ray.pipelines.graph import bfs_hops

    rng = np.random.RandomState(6)
    n = 40
    src = rng.randint(0, n, 120).astype(np.int64)
    dst = rng.randint(0, n, 120).astype(np.int64)
    ds = _ds({"src": src, "dst": dst})
    got = {r["node"]: r["hops"] for r in
           bfs_hops(ds, 0, max_hops=12).take_all()}
    # brute BFS
    import collections
    adj = collections.defaultdict(list)
    for a, b in zip(src, dst):
        adj[int(a)].append(int(b))
    dist = {0: 0}
    q = collections.deque([0])
    while q:
        x = q.popleft()
        for y in adj[x]:
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    assert got == {k: v for k, v in dist.items() if v <= 12}


def test_bfs_hops_bound_and_empty(ray_session):
    from record_matcher_ray.pipelines.graph import bfs_hops

    ds = _ds({"src": [0, 1, 2], "dst": [1, 2, 3]})
    got = {r["node"]: r["hops"] for r in
           bfs_hops(ds, 0, max_hops=2).take_all()}
    assert got == {0: 0, 1: 1, 2: 2}  # node 3 at depth 3 is cut
    empty = _ds({"src": pa.array([], pa.int64()),
                 "dst": pa.array([], pa.int64())})
    assert bfs_hops(empty, 5).take_all() == [{"node": 5, "hops": 0}]


def test_compare_vectors_features(ray_session):
    from record_matcher_ray.pipelines.linkage import compare_vectors

    ds = _ds({"id": [1, 2, 3], "blk": [0, 0, 0],
              "name": ["gear", "gears", "bolt"],
              "seg": ["A", "A", "B"],
              "bal": [10.0, 12.5, 10.0]})
    rows = {(r["x_id"], r["y_id"]): r for r in compare_vectors(
        ds, "id", "blk",
        [("name", "lev"), ("seg", "exact"), ("bal", "absdiff")],
    ).take_all()}
    r12 = rows[(1, 2)]
    assert r12["name_lev"] == 80.0       # 1 edit over max len 5
    assert r12["seg_exact"] == 1
    assert r12["bal_absdiff"] == 2.5
    assert rows[(1, 3)]["seg_exact"] == 0
    with pytest.raises(ValueError, match="must be one of"):
        compare_vectors(ds, "id", "blk", [("name", "cosine")])


def test_window_dedupe(ray_session):
    from record_matcher_ray.pipelines.table_ops import window_dedupe

    ds = _ds({
        "id": [1, 2, 3, 4, 5],
        "k": ["u", "u", "u", "v", "u"],
        "ts": pa.array([100, 150, 4000, 100, 90], pa.int64()),
    })
    out = window_dedupe(ds, ["k"], "ts", "id", 1).take_all()
    # window_s=1 → 1e6 us windows: all of u's ts<1e6 in win 0 → keep id 5
    got = {(r["k"], r["win"]): r["id"] for r in out}
    assert got == {("u", 0): 5, ("v", 0): 4}


def test_jw_prefix_join(ray_session):
    from record_matcher_ray.pipelines.linkage import jw_prefix_join
    from record_matcher_ray.functions.scorers import jaro_winkler

    names = ["martha", "marhta", "market", "zebra", "m"]
    ds = _ds({"t": names * 2})  # duplicates collapse
    got = {(r["name_a"], r["name_b"]): r["jw_sim"] for r in
           jw_prefix_join(ds, "t", threshold=75.0).take_all()}
    expect = {}
    import itertools
    for a, b in itertools.combinations(sorted(set(names)), 2):
        if len(a) >= 2 and len(b) >= 2 and a[:2] == b[:2]:
            s = round(jaro_winkler(a, b), 6)
            if s >= 75.0:
                expect[(a, b)] = s
    assert got == expect
    assert ("marhta", "martha") in got  # the classic JW pair


def test_cube_aggregate_levels(ray_session):
    from record_matcher_ray.pipelines.relational import cube_aggregate

    ds = _ds({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
              "v": [1.0, 2.0, 4.0]})
    out = cube_aggregate(ds, ["a", "b"], "v").to_pandas()
    rows = {(r["a"], r["b"]): (r["n"], r["sum_val"])
            for _, r in out.iterrows()}
    assert rows[("ALL", "ALL")] == (3, 7.0)
    assert rows[("x", "ALL")] == (2, 3.0)
    assert rows[("ALL", "p")] == (2, 5.0)   # the non-rollup subset
    assert rows[("y", "p")] == (1, 4.0)
    assert len(rows) == 3 + 2 + 2 + 1  # finest + a-only + b-only + grand


def test_grouped_linear_fit_exact(ray_session):
    from record_matcher_ray.pipelines.stats import grouped_linear_fit

    rng = np.random.RandomState(6)
    n = 600
    g = rng.choice(["p", "q", "r"], n)
    x = np.round(rng.uniform(0, 50, n), 2)
    y = np.round(2.5 * x - 7.0 + rng.normal(0, 3, n), 2)
    ds = _ds({"g": g, "x": x, "y": y}).repartition(5)
    out = grouped_linear_fit(ds, "g", "x", "y").set_index("grp")
    assert sorted(out.index) == ["p", "q", "r"]
    for grp in ["p", "q", "r"]:
        m = g == grp
        qx = np.floor(x[m] * 100.0 + 0.5).astype(np.int64).astype(object)
        qy = np.floor(y[m] * 100.0 + 0.5).astype(np.int64).astype(object)
        nn = int(m.sum())
        sx, sy = int(qx.sum()), int(qy.sum())
        sxy, sxx = int((qx * qy).sum()), int((qx * qx).sum())
        syy = int((qy * qy).sum())
        num, denx, deny = nn * sxy - sx * sy, nn * sxx - sx * sx, nn * syy - sy * sy
        slope = float(num) / float(denx)
        row = out.loc[grp]
        assert row["n"] == nn
        assert row["slope"] == round(slope, 9)
        assert row["intercept"] == round(
            (float(sy) - slope * float(sx)) / float(nn), 9
        )
        assert row["r2"] == round(
            (float(num) * float(num)) / (float(denx) * float(deny)), 9
        )
        # sanity: quantized-unit slope recovers the generating slope
        assert abs(row["slope"] - 2.5) < 0.1


def test_grouped_linear_fit_degenerate(ray_session):
    from record_matcher_ray.pipelines.stats import grouped_linear_fit

    ds = _ds({"g": ["a", "a", "b", "c", "c"],
              "x": [1.0, 1.0, 2.0, 1.0, 2.0],
              "y": [3.0, 4.0, 5.0, 1.0, 1.0]})
    out = grouped_linear_fit(ds, "g", "x", "y").set_index("grp")
    assert np.isnan(out.loc["a", "slope"])       # zero x-variance
    assert np.isnan(out.loc["b", "slope"])       # n = 1
    # zero y-variance: slope/intercept defined, r2 NaN (deny == 0)
    assert out.loc["c", "slope"] == 0.0
    assert out.loc["c", "intercept"] == 100.0    # quantized units
    assert np.isnan(out.loc["c", "r2"])


# ---------------------------------------------------------------------------
# em_fellegi_sunter
# ---------------------------------------------------------------------------


def _em_mirror(pat_counts, k, n_iter=15, init_m=0.9, init_u=0.1,
               init_lambda=0.1):
    """In-test mirror of the pinned EM recipe over (pattern, count)."""
    pats = sorted(pat_counts)
    cnts = [pat_counts[p] for p in pats]
    n_total = sum(cnts)
    LO, HI = 1e-9, 1.0 - 1e-9
    lam, m, u = init_lambda, [init_m] * k, [init_u] * k

    def resp():
        out = []
        for p in pats:
            am, au = lam, 1.0 - lam
            for f in range(k):
                if (p >> f) & 1:
                    am, au = am * m[f], au * u[f]
                else:
                    am, au = am * (1.0 - m[f]), au * (1.0 - u[f])
            out.append(am / (am + au))
        return out

    for _ in range(n_iter):
        r = resp()
        S = 0.0
        T = 0.0
        for cp, rp in zip(cnts, r):
            S = S + float(cp) * rp
            T = T + float(cp) * (1.0 - rp)
        for f in range(k):
            sm = su = 0.0
            for p, cp, rp in zip(pats, cnts, r):
                if (p >> f) & 1:
                    sm = sm + float(cp) * rp
                    su = su + float(cp) * (1.0 - rp)
            m[f] = min(max(sm / S, LO), HI)
            u[f] = min(max(su / T, LO), HI)
        lam = min(max(S / float(n_total), LO), HI)
    return pats, cnts, resp()


def _em_corpus(n_ent=150, dups=2, seed=13):
    rng = np.random.RandomState(seed)
    rows = []
    rid = 0
    for e in range(n_ent):
        name = f"name{e:04d}"
        city = f"city{e % 12}"
        blk = e % 10
        for d in range(1 + (e % dups)):
            # duplicates agree on both fields; add noise rows later
            rows.append({"id": rid, "blk": blk, "f_name": name,
                         "f_city": city})
            rid += 1
    # noise: unrelated rows sharing a block but nothing else
    for j in range(200):
        rows.append({"id": rid, "blk": int(rng.randint(10)),
                     "f_name": f"noise{rid}", "f_city": f"city{rng.randint(12)}"})
        rid += 1
    return pd.DataFrame(rows)


def _brute_patterns(df, k_fields):
    counts = {}
    for _, grp in df.groupby("blk"):
        g = grp.sort_values("id").reset_index(drop=True)
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                pat = 0
                for fi, f in enumerate(k_fields):
                    a, b = g.loc[i, f], g.loc[j, f]
                    if a is not None and a == b:
                        pat |= 1 << fi
                counts[pat] = counts.get(pat, 0) + 1
    return counts


def test_em_fellegi_sunter_exact_and_invariant(ray_session):
    from record_matcher_ray.pipelines.linkage import em_fellegi_sunter

    df = _em_corpus()
    want_counts = _brute_patterns(df, ["f_name", "f_city"])
    pats_w, cnts_w, post_w = _em_mirror(want_counts, 2)

    for parts in (3, 11):
        ds = _ds(df.to_dict("list")).repartition(parts)
        out = em_fellegi_sunter(
            ds, "id", "blk", ["f_name", "f_city"]
        )
        assert out["pattern"].tolist() == pats_w
        assert out["n_pairs"].tolist() == cnts_w
        np.testing.assert_array_equal(
            out["posterior"].to_numpy(),
            np.floor(np.asarray(post_w) * 1e9 + 0.5) / 1e9,
        )
    # both-agree pairs (the planted duplicates) must look like matches,
    # no-agreement pairs like nonmatches
    by_pat = dict(zip(out["pattern"], out["posterior"]))
    assert by_pat[3] > 0.9
    assert by_pat[0] < 0.1
    assert by_pat[3] > by_pat.get(1, 0.0) and by_pat[3] > by_pat.get(2, 0.0)


def test_em_fellegi_sunter_validation(ray_session):
    from record_matcher_ray.pipelines.linkage import em_fellegi_sunter

    ds = _ds({"id": [1], "blk": [None], "f": ["x"]})
    with pytest.raises(ValueError):
        em_fellegi_sunter(ds, "id", "blk", ["f"])
    with pytest.raises(ValueError):
        em_fellegi_sunter(ds, "id", "blk", [])


# ---------------------------------------------------------------------------
# dbscan_embeddings
# ---------------------------------------------------------------------------


def _brute_dbscan(ids, vecs, eps, min_pts, qscale=1 << 20):
    q = np.floor(np.asarray(vecs, np.float64) * float(qscale) + 0.5)
    nrm = (q * q).sum(axis=1)
    n = len(ids)
    nbrs = {int(i): set() for i in ids}
    for i in range(n):
        for j in range(i + 1, n):
            if nrm[i] == 0 or nrm[j] == 0:
                continue
            cs = (q[i] @ q[j]) / (math.sqrt(nrm[i]) * math.sqrt(nrm[j]))
            if cs >= eps:
                nbrs[int(ids[i])].add(int(ids[j]))
                nbrs[int(ids[j])].add(int(ids[i]))
    core = {i for i, s in nbrs.items() if len(s) + 1 >= min_pts}
    # CC over core-core edges, min-id labels
    label = {i: i for i in core}

    def find(x):
        while label[x] != x:
            label[x] = label[label[x]]
            x = label[x]
        return x

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    label[max(ri, rj)] = min(ri, rj)
    out = {}
    for i in ids:
        i = int(i)
        if i in core:
            out[i] = (find(i), True)
        else:
            cand = [find(j) for j in nbrs[i] if j in core]
            out[i] = (min(cand) if cand else -1, False)
    return out


def test_dbscan_embeddings_bruteforce(ray_session):
    from record_matcher_ray.pipelines.similarity import dbscan_embeddings

    rng = np.random.RandomState(8)
    # three tight direction clusters + uniform noise + a zero vector
    centers = rng.randn(3, 8)
    rows = []
    for c in centers:
        for _ in range(15):
            rows.append(c + 0.05 * rng.randn(8))
    for _ in range(25):
        rows.append(rng.randn(8))
    rows.append(np.zeros(8))
    vecs = np.asarray(rows, np.float64)
    ids = np.arange(len(vecs), dtype=np.int64)
    rng.shuffle(ids)  # ids not in row order
    ds = _ds({"vec_id": ids,
              "embedding": pa.array([list(v) for v in vecs],
                                    pa.list_(pa.float32()))})
    got = dbscan_embeddings(ds.repartition(4), eps_sim=0.95, min_pts=4)
    expect = _brute_dbscan(
        ids, np.asarray(vecs, np.float32).astype(np.float64), 0.95, 4
    )
    assert got["vec_id"].tolist() == sorted(int(i) for i in ids)
    for r in got.itertuples():
        lab, is_core = expect[int(r.vec_id)]
        assert (int(r.label), bool(r.is_core)) == (lab, is_core), r.vec_id
    # the three planted clusters exist and the zero vector is noise
    zero_id = int(ids[-1])
    assert int(got.set_index("vec_id").loc[zero_id, "label"]) == -1
    assert (got["label"] >= 0).sum() >= 45


def test_dbscan_embeddings_partition_invariance(ray_session):
    from record_matcher_ray.pipelines.similarity import dbscan_embeddings

    rng = np.random.RandomState(2)
    vecs = rng.randn(60, 6)
    ids = np.arange(60, dtype=np.int64)
    mk = lambda p: _ds(
        {"vec_id": ids,
         "embedding": pa.array([list(v) for v in vecs],
                               pa.list_(pa.float32()))}
    ).repartition(p)
    a = dbscan_embeddings(mk(2), eps_sim=0.8, min_pts=3)
    b = dbscan_embeddings(mk(9), eps_sim=0.8, min_pts=3)
    pd.testing.assert_frame_equal(a, b)

    with pytest.raises(ValueError):
        dbscan_embeddings(mk(2), min_pts=0)


# ---------------------------------------------------------------------------
# pairwise_eval
# ---------------------------------------------------------------------------


def test_pairwise_eval_exact(ray_session):
    from record_matcher_ray.pipelines.linkage import pairwise_eval

    # truth: 6 pairs; pred: 5 pairs, 3 correct (one reversed, one
    # duplicated, one self-pair that must drop)
    truth = _ds({"a": [1, 2, 3, 4, 5, 6], "b": [10, 20, 30, 40, 50, 60]})
    pred = _ds({"a": [10, 2, 3, 7, 8, 3, 9],
                "b": [1, 20, 30, 70, 8, 30, 90]})
    out = pairwise_eval(pred, truth)
    assert (int(out.tp[0]), int(out.fp[0]), int(out.fn[0])) == (3, 2, 3)
    p, r = 3.0 / 5.0, 3.0 / 6.0
    assert out.precision[0] == math.floor(p * 1e9 + 0.5) / 1e9
    assert out.recall[0] == 0.5
    assert out.f1[0] == math.floor(
        (2.0 * p * r) / (p + r) * 1e9 + 0.5) / 1e9

    # empty prediction: zero division reports 0.0
    none = _ds({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    out2 = pairwise_eval(none, truth)
    assert (int(out2.tp[0]), int(out2.fp[0]), int(out2.fn[0])) == (0, 0, 6)
    assert out2.precision[0] == 0.0 and out2.f1[0] == 0.0

    # partition invariance
    out3 = pairwise_eval(pred.repartition(5), truth.repartition(3))
    pd.testing.assert_frame_equal(out, out3)


def test_pairwise_eval_empty_both(ray_session):
    from record_matcher_ray.pipelines.linkage import pairwise_eval

    e = _ds({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    out = pairwise_eval(e, e)
    assert (int(out.tp[0]), int(out.fp[0]), int(out.fn[0])) == (0, 0, 0)
    assert out.f1[0] == 0.0


# ---------------------------------------------------------------------------
# exact_cosine_topk / rrf_fuse
# ---------------------------------------------------------------------------


def test_exact_cosine_topk_bruteforce(ray_session):
    from record_matcher_ray.pipelines.similarity import exact_cosine_topk

    rng = np.random.RandomState(3)
    vecs = rng.randn(50, 6)
    vecs[7] = 0.0
    ids = np.arange(50, dtype=np.int64)
    ds = _ds({"vec_id": ids,
              "embedding": pa.array([list(v) for v in vecs],
                                    pa.list_(pa.float32()))}).repartition(4)
    out = exact_cosine_topk(ds, query_id=3, k=5)
    q = np.floor(np.asarray(vecs, np.float32).astype(np.float64)
                 * (1 << 20) + 0.5)
    qn = np.sqrt((q * q).sum(axis=1))
    cs = {}
    for i in range(50):
        if i == 3 or qn[i] == 0:
            continue
        cs[i] = (q[i] @ q[3]) / (qn[i] * qn[3])
    want = sorted(cs.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert out["id"].tolist() == [i for i, _ in want]
    np.testing.assert_array_equal(out["cos_sim"].to_numpy(),
                                  np.asarray([v for _, v in want]))
    assert 7 not in set(out["id"])

    with pytest.raises(ValueError):
        exact_cosine_topk(ds, query_id=7)     # zero-norm query
    with pytest.raises(ValueError):
        exact_cosine_topk(ds, query_id=999)   # absent id


def test_rrf_fuse_pinned(ray_session):
    from record_matcher_ray.pipelines.similarity import rrf_fuse

    lex = pd.DataFrame({"id": [10, 20, 30]})
    sem = pd.DataFrame({"id": [20, 40]})
    out = rrf_fuse([lex, sem], k=60)
    want = {
        10: 1.0 / 61.0,
        20: 1.0 / 62.0 + 1.0 / 61.0,
        30: 1.0 / 63.0,
        40: 1.0 / 62.0,
    }
    got = dict(zip(out["id"], out["rrf"]))
    for i, s in want.items():
        assert got[i] == np.floor(s * 1e9 + 0.5) / 1e9
    assert out["id"].tolist()[0] == 20           # highest fused score
    assert out["rank"].tolist() == [1, 2, 3, 4]
    assert len(rrf_fuse([pd.DataFrame({"id": []})])) == 0


def test_fs_link_tf_bruteforce(ray_session):
    from record_matcher_ray.pipelines.linkage import fellegi_sunter_link_tf

    rng = np.random.RandomState(17)
    n = 150
    blk = rng.randint(0, 6, n)
    f1 = rng.choice(["x", "y", "z", "rare"], n, p=[0.5, 0.3, 0.19, 0.01])
    f2 = rng.randint(0, 4, n).astype(np.int64)
    ds = _ds({"id": np.arange(n, dtype=np.int64), "blk": blk,
              "f1": f1, "f2": f2}).repartition(4)
    got = {
        (r["x_id"], r["y_id"]): (r["score"], r["decision"])
        for r in fellegi_sunter_link_tf(
            ds, "id", "blk", ["f1", "f2"], t_upper=4.0, t_lower=0.0
        ).take_all()
    }
    # mirror: per-value counts (string-cast), global u for disagreement
    import collections
    c1 = collections.Counter(f1)
    c2 = collections.Counter(str(v) for v in f2)
    u1 = sum(c * c for c in c1.values()) / (n * n)
    u2 = sum(c * c for c in c2.values()) / (n * n)
    wd = [math.log(0.1) - math.log(1.0 - u1),
          math.log(0.1) - math.log(1.0 - u2)]
    expect = {}
    for i in range(n):
        for j in range(i + 1, n):
            if blk[i] != blk[j]:
                continue
            s = 0.0
            for fi, (vals, cnt) in enumerate(
                [(f1, c1), ([str(v) for v in f2], c2)]
            ):
                if vals[i] == vals[j]:
                    s = s + (math.log(0.9)
                             - 2.0 * math.log(cnt[vals[i]] / float(n)))
                else:
                    s = s + wd[fi]
            dec = ("match" if s >= 4.0 else
                   "possible" if s >= 0.0 else "nonmatch")
            r6 = math.floor(s * 1e6 + 0.5) / 1e6 if s >= 0 else (
                -math.floor(-s * 1e6 + 0.5) / 1e6)
            expect[(i, j)] = (r6, dec)
    assert got == expect
    # rare-value agreements outscore common ones (the point of TF adj)
    rare_w = math.log(0.9) - 2.0 * math.log(c1["rare"] / n)
    common_w = math.log(0.9) - 2.0 * math.log(c1["x"] / n)
    assert rare_w > common_w


# ---------------------------------------------------------------------------
# monge_elkan_join
# ---------------------------------------------------------------------------


def _me_brute(ids, blks, texts, threshold, cap=16):
    import re as _re

    from record_matcher_ray.functions.scorers import jaro_winkler

    def toks(s):
        return [w for w in _re.sub(r"[^a-z0-9]+", " ",
                                   (s or "").lower()).split()][:cap]

    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if blks[i] != blks[j] or blks[i] is None:
                continue
            ta, tb = toks(texts[i]), toks(texts[j])
            if not ta or not tb:
                continue
            jw = [[math.floor(jaro_winkler(x, y) * 1e6 + 0.5) / 1e6
                   for y in tb] for x in ta]
            s_a = 0.0
            for row in jw:
                s_a = s_a + max(row)
            s_b = 0.0
            for c in range(len(tb)):
                s_b = s_b + max(jw[r][c] for r in range(len(ta)))
            sym = (s_a / float(len(ta)) + s_b / float(len(tb))) / 2.0
            sym = math.floor(sym * 1e6 + 0.5) / 1e6 if sym >= 0 else sym
            if sym >= threshold:
                out[(ids[i], ids[j])] = sym
    return out


def test_monge_elkan_bruteforce(ray_session):
    from record_matcher_ray.pipelines.linkage import monge_elkan_join

    rng = np.random.RandomState(21)
    words = ["smith", "smyth", "jones", "sons", "and", "co", "llc",
             "john", "jon", "trading", "global"]
    texts = [" ".join(rng.choice(words, size=rng.randint(1, 5)))
             for _ in range(100)]
    texts[7] = ""          # token-less pairs with nothing
    texts[8] = "Smith & Sons"     # normalization: & drops, case folds
    texts[9] = "smith sons"
    blks = list(rng.randint(0, 5, 100))
    blks[8] = blks[9] = 1
    ids = list(range(100))
    ds = _ds({"id": np.asarray(ids, np.int64),
              "blk": np.asarray(blks, np.int64),
              "nm": texts}).repartition(4)
    got = {
        (r["x_id"], r["y_id"]): r["me_sim"]
        for r in monge_elkan_join(
            ds, "nm", "id", "blk", threshold=70.0
        ).take_all()
    }
    assert got == _me_brute(ids, blks, texts, 70.0)
    assert got[(8, 9)] == 100.0  # token-order/punctuation invariance


def test_merge_conflict_report(ray_session):
    from record_matcher_ray.pipelines.linkage import merge_conflict_report

    ds = _ds({
        "cl": pa.array([1, 1, 1, 2, 2, None], pa.int64()),
        "brand": ["a", "a", "b", "c", "c", "x"],
        "size": pa.array([5, 5, 5, 7, None, 1], pa.int64()),
    })
    rows = {r["cluster"]: r for r in merge_conflict_report(
        ds, "cl", ["brand", "size"]).take_all()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_members"] == 3
    assert rows[1]["nd_brand"] == 2 and rows[1]["nd_size"] == 1
    assert rows[1]["n_conflict_cols"] == 1
    assert rows[2]["nd_brand"] == 1 and rows[2]["nd_size"] == 1
    assert rows[2]["n_conflict_cols"] == 0


def test_greedy_max_matching(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.linkage import greedy_max_matching

    # path graph a-b-c-d with scores: b-c best, so round1 = {b-c};
    # round2 then matches nothing (a-b, c-d both gone? no: a-b and c-d
    # survive since only b,c taken -> a-b dropped (b taken), c-d dropped)
    pairs = pd.DataFrame(
        {"a": ["a", "b", "c"], "b": ["b", "c", "d"],
         "s": [5.0, 9.0, 5.0]}
    )
    out = greedy_max_matching(
        rd.from_pandas(pairs).repartition(2), "a", "b", "s", rounds=3
    ).sort_values(["a"]).reset_index(drop=True)
    assert out["a"].tolist() == ["b"]
    assert out["b"].tolist() == ["c"]
    assert out["rnd"].tolist() == [1]

    # two disjoint edges both match in round 1; a chain where the
    # second-best pair matches in round 2
    pairs2 = pd.DataFrame(
        {"a": ["a", "b", "x"], "b": ["b", "c", "y"],
         "s": [9.0, 5.0, 7.0]}
    )
    out2 = greedy_max_matching(
        rd.from_pandas(pairs2), "a", "b", "s", rounds=3
    ).sort_values(["a"]).reset_index(drop=True)
    assert out2["a"].tolist() == ["a", "x"]
    assert out2["rnd"].tolist() == [1, 1]

    # chain needing round 2: c-d matches after b taken by a
    pairs3 = pd.DataFrame(
        {"a": ["a", "b", "c"], "b": ["b", "c", "d"],
         "s": [9.0, 7.0, 5.0]}
    )
    out3 = greedy_max_matching(
        rd.from_pandas(pairs3), "a", "b", "s", rounds=3
    ).sort_values(["a"]).reset_index(drop=True)
    assert out3["a"].tolist() == ["a", "c"]
    assert out3["b"].tolist() == ["b", "d"]
    assert out3["rnd"].tolist() == [1, 2]

    # tie scores: partner-asc tie-break picks the smaller partner
    pairs4 = pd.DataFrame(
        {"a": ["m", "m"], "b": ["n", "p"], "s": [5.0, 5.0]}
    )
    out4 = greedy_max_matching(rd.from_pandas(pairs4), "a", "b", "s")
    assert out4["b"].tolist() == ["n"]

    empty = pairs.iloc[:0]
    out5 = greedy_max_matching(rd.from_pandas(empty), "a", "b", "s")
    assert len(out5) == 0 and set(out5.columns) == {"a", "b", "s", "rnd"}


def test_canopy_clusters(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.linkage import canopy_clusters

    names = ["red apple pie", "green apple pie", "red plum tart",
             "green plum tart", "blue cheese", "red apple pie"]
    df = pd.DataFrame({"t": names})
    out = canopy_clusters(
        rd.from_pandas(df).repartition(3), "t",
        t_loose=0.34, t_tight=0.75,
    )
    got = set(zip(out["value"], out["center"]))
    # python mirror of the greedy
    uniq = sorted(set(names))
    sets = {s: set(s.split(" ")) for s in uniq}
    rem = list(uniq)
    want = set()
    while rem:
        c = rem[0]
        nxt = []
        for e in rem:
            j = len(sets[c] & sets[e]) / len(sets[c] | sets[e])
            if j >= 0.34:
                want.add((e, c))
            if j < 0.75:
                nxt.append(e)
        rem = nxt
    assert got == want
    # every distinct value appears in at least one canopy
    assert set(out["value"]) == set(uniq)

    empty = df.iloc[:0]
    z = canopy_clusters(rd.from_pandas(empty), "t")
    assert len(z) == 0

    # threshold validation (ADVICE r3: t_tight > 1 never retires a
    # center -> infinite loop; inverted thresholds flip semantics)
    import pytest as _pt
    for bad in [{"t_tight": 1.5}, {"t_loose": 0.9, "t_tight": 0.5},
                {"t_loose": 0.0}, {"t_loose": -0.1}]:
        with _pt.raises(ValueError, match="canopy thresholds"):
            canopy_clusters(rd.from_pandas(df), "t", **bad)


def test_lockstep_fold_paths():
    # both layouts (lockstep sweep vs per-segment accumulate) must give
    # bit-identical ordered folds; force each by segment-shape choice
    from record_matcher_ray.pipelines.linkage import _lockstep_fold

    rng = np.random.default_rng(7)

    def brute(seg, vals, n):
        out = np.zeros(n)
        for s, v in zip(seg, vals):
            out[s] = out[s] + v
        return out

    # few wide segments -> accumulate path
    seg = np.repeat(np.arange(3), [500, 700, 1])
    vals = rng.standard_normal(len(seg)) * 1e3
    got = _lockstep_fold(seg, vals, 3)
    assert np.array_equal(got, brute(seg, vals, 3))
    # many narrow segments -> lockstep path
    seg2 = np.repeat(np.arange(400), rng.integers(1, 4, 400))
    vals2 = rng.standard_normal(len(seg2))
    got2 = _lockstep_fold(seg2, vals2, 400)
    assert np.array_equal(got2, brute(seg2, vals2, 400))


def test_soft_tfidf_join(ray_session):
    import math

    import ray.data as rd

    from record_matcher_ray.pipelines.linkage import soft_tfidf_join

    # 4 distinct names in one prefix block ('ac'); "corp" is filler
    names = ["acme corp", "acme corpp", "acero corp", "acme widgets",
             "acme corp"]  # dup row collapses
    df = pd.DataFrame({"t": names})
    out = (
        soft_tfidf_join(rd.from_pandas(df).repartition(3), "t",
                        theta=90.0, threshold=1.0, prefix_len=2)
        .to_pandas().set_index(["name_a", "name_b"])["st_sim"]
    )

    # python mirror
    from record_matcher_ray.functions.scorers import (
        jaro_winkler_elementwise,
    )

    uniq = sorted(set(names))
    toks = {s: sorted(set(w for w in s.split(" ") if w)) for s in uniq}
    n = float(len(uniq))
    df_c: dict = {}
    for s in uniq:
        for w in toks[s]:
            df_c[w] = df_c.get(w, 0) + 1
    idf = {w: math.log(1.0 + n / float(c)) for w, c in df_c.items()}

    def nrm(s):
        t = 0.0
        for w in toks[s]:
            t = t + idf[w] * idf[w]
        return math.sqrt(t)

    def jw(a, b):
        return round(float(jaro_winkler_elementwise(
            np.array([a], object), np.array([b], object))[0]), 6)

    import itertools
    for a, b in itertools.combinations(uniq, 2):
        s = 0.0
        for w in toks[a]:
            cand = sorted(toks[b], key=lambda u: (-jw(w, u), u))
            u = cand[0]
            j = jw(w, u)
            if j >= 90.0:
                s = s + idf[w] / nrm(a) * (idf[u] / nrm(b)) * (j / 100.0)
        st = (math.floor(s * 100.0 * 1e6 + 0.5) / 1e6
              if s >= 0 else None)
        if st is not None and st >= 1.0:
            assert out.loc[(a, b)] == st, (a, b)
        else:
            assert (a, b) not in out.index
    # rare-token pairs outscore filler-only overlap
    assert out.loc[("acme corp", "acme corpp")] > \
        out.loc[("acero corp", "acme corp")]

    empty = df.iloc[:0]
    z = soft_tfidf_join(rd.from_pandas(empty), "t").to_pandas()
    assert len(z) == 0


def test_sorted_neighborhood_pairs(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.linkage import (
        sorted_neighborhood_pairs,
    )

    rng = np.random.default_rng(13)
    names = [f"name{int(v):03d}" for v in rng.integers(0, 60, 200)]
    df = pd.DataFrame({"nm": names, "rid": np.arange(200, dtype=np.int64)})
    w = 5
    out = sorted_neighborhood_pairs(
        rd.from_pandas(df).repartition(7), ["nm"], "rid", window=w
    ).to_pandas()
    # brute force: global sort, all pairs within window
    order = sorted(range(200), key=lambda i: (names[i], i))
    want = set()
    for a in range(200):
        for b in range(a + 1, min(a + w, 200)):
            want.add((order[a], order[b], b - a))
    got = set(zip(out["x_id"], out["y_id"], out["gap"]))
    assert got == want
    assert len(out) == len(want)  # no duplicate emissions

    import pytest as _pt
    with _pt.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(rd.from_pandas(df), ["nm"], "rid",
                                  window=1)


def test_auc_score(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.linkage import auc_score

    rng = np.random.default_rng(17)
    n = 3000
    lab = (rng.random(n) < 0.3).astype(np.int64)
    # separable-ish scores with heavy ties (quantization stress)
    score = np.round(rng.normal(lab * 1.2, 1.0), 1)
    df = pd.DataFrame({"s": score, "lab": lab})
    out = auc_score(rd.from_pandas(df).repartition(6), "s", "lab")
    # mirror: pairwise count with half credit for ties over quantized q
    q = np.floor(score * 100 + 0.5).astype(np.int64)
    pos_q = q[lab == 1]
    neg_q = q[lab == 0]
    num2 = 0
    for pq in pos_q:
        num2 += 2 * int((neg_q < pq).sum()) + int((neg_q == pq).sum())
    import math

    want = math.floor(
        num2 / (2 * len(pos_q) * len(neg_q)) * 1e6 + 0.5
    ) / 1e6
    assert out["auc"].iloc[0] == want
    assert out["n"].iloc[0] == n
    assert out["n_pos"].iloc[0] == int(lab.sum())

    # degenerate: single-class input -> null auc
    one = pd.DataFrame({"s": [1.0, 2.0], "lab": [1, 1]})
    z = auc_score(rd.from_pandas(one), "s", "lab")
    assert z["auc"].iloc[0] is None or pd.isna(z["auc"].iloc[0])
    # empty input
    z2 = auc_score(rd.from_pandas(df.iloc[:0]), "s", "lab")
    assert z2["n"].iloc[0] == 0


def test_bcubed_eval(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.linkage import bcubed_eval

    rng = np.random.default_rng(23)
    n = 800
    truth = rng.integers(0, 12, n)
    pred = truth.copy()
    flip = rng.random(n) < 0.25      # 25% of records mis-clustered
    pred[flip] = rng.integers(0, 12, flip.sum())
    df = pd.DataFrame({"pred": pred, "truth": truth})
    out = bcubed_eval(rd.from_pandas(df).repartition(5), "pred", "truth")
    # brute-force per-record mirror
    import collections
    import math

    cell = collections.Counter(zip(pred, truth))
    n_p = collections.Counter(pred)
    n_t = collections.Counter(truth)
    P = sum(cell[(p, t)] ** 2 / n_p[p] for p, t in cell) / n
    R = sum(cell[(p, t)] ** 2 / n_t[t] for p, t in cell) / n
    assert abs(out["b3_precision"].iloc[0] - P) < 1e-5
    assert abs(out["b3_recall"].iloc[0] - R) < 1e-5
    F = 2 * P * R / (P + R)
    assert abs(out["b3_f1"].iloc[0] - F) < 1e-5
    assert out["n"].iloc[0] == n
    # perfect clustering scores 1.0 everywhere
    perfect = bcubed_eval(
        rd.from_pandas(pd.DataFrame({"pred": truth, "truth": truth})),
        "pred", "truth",
    )
    assert perfect["b3_f1"].iloc[0] == 1.0
    z = bcubed_eval(rd.from_pandas(df.iloc[:0]), "pred", "truth")
    assert z["n"].iloc[0] == 0


def test_snm_fuzz_vs_bruteforce(ray_session):
    """Property fuzz: arbitrary key distributions / windows / partition
    layouts — SNM must equal the brute-force sliding window exactly."""
    import ray.data as rd

    from record_matcher_ray.pipelines.linkage import (
        sorted_neighborhood_pairs,
    )

    rng = np.random.default_rng(59)
    for trial in range(6):
        n = int(rng.integers(3, 120))
        w = int(rng.integers(2, 9))
        parts = int(rng.integers(1, 7))
        keys = rng.integers(0, max(2, n // 3), n)
        df = pd.DataFrame({
            "k": [f"v{int(x):04d}" for x in keys],
            "rid": np.arange(n, dtype=np.int64),
        })
        out = sorted_neighborhood_pairs(
            rd.from_pandas(df).repartition(parts), ["k"], "rid", window=w
        ).to_pandas()
        order = sorted(range(n), key=lambda i: (df["k"][i], i))
        want = {
            (order[a], order[b], b - a)
            for a in range(n)
            for b in range(a + 1, min(a + w, n))
        }
        got = set(zip(out["x_id"], out["y_id"], out["gap"]))
        assert got == want, (trial, n, w, parts)


def test_auc_fuzz_extremes(ray_session):
    """AUC sanity under extremes: perfect separation -> 1.0; inverted ->
    0.0; all-tied scores -> 0.5."""
    import ray.data as rd

    from record_matcher_ray.pipelines.linkage import auc_score

    n = 400
    lab = np.array([0] * (n // 2) + [1] * (n // 2), np.int64)
    perfect = pd.DataFrame({"s": lab * 10.0 + 1.0, "lab": lab})
    assert auc_score(rd.from_pandas(perfect), "s", "lab")["auc"].iloc[0] == 1.0
    inverted = pd.DataFrame({"s": (1 - lab) * 10.0, "lab": lab})
    assert auc_score(rd.from_pandas(inverted), "s", "lab")["auc"].iloc[0] == 0.0
    tied = pd.DataFrame({"s": np.full(n, 3.3), "lab": lab})
    assert auc_score(rd.from_pandas(tied), "s", "lab")["auc"].iloc[0] == 0.5


def test_blocking_scheme_sweep(ray_session):
    """Scheme metrics vs hand counts on a tiny table."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from record_matcher_ray.pipelines.linkage import blocking_scheme_sweep

    df = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "a": np.int64([1, 1, 1, 2, 2, 3]),     # blocks 3+2+1
        "b": ["x", "x", "y", "y", "y", "y"],   # blocks 2+4
    })
    truth = pd.DataFrame({"x_id": np.int64([0, 2, 4]),
                          "y_id": np.int64([1, 3, 5])})
    out = blocking_scheme_sweep(
        rd.from_pandas(df).repartition(3),
        {"a": ["a"], "b": ["b"], "ab": ["a", "b"]},
        rd.from_pandas(truth), "id",
    ).set_index("scheme")
    # a: C(3,2)+C(2,2)=4 cand; truth hits: (0,1) same a; (2,3) diff;
    # (4,5) diff -> 1
    assert out.loc["a", "n_cand"] == 4 and out.loc["a", "n_hit"] == 1
    # b: C(2,2)+C(4,2)=7; hits: (0,1) x=x; (2,3) y=y; (4,5) y=y -> 3
    assert out.loc["b", "n_cand"] == 7 and out.loc["b", "n_hit"] == 3
    # ab blocks: (1,x)*2, (1,y), (2,y)*2, (3,y) -> C2: 1+0+1+0 = 2;
    # hits: (0,1) both (1,x); (2,3) (1,y)vs(2,y) no; (4,5) (2,y)vs(3,y) no
    assert out.loc["ab", "n_cand"] == 2 and out.loc["ab", "n_hit"] == 1
    assert (out["n_truth"] == 3).all()
    # reduction ratio uses C(6,2)=15
    assert out.loc["a", "reduction_ratio"] == round(1 - 4 / 15, 6)
    assert out.loc["b", "pairs_completeness"] == 1.0
    assert out.loc["b", "pairs_quality"] == round(3 / 7, 6)


def test_uncertainty_sample(ray_session):
    """Top-k closest-to-threshold selection with deterministic ties and
    the per-block prune leaving results partition-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from record_matcher_ray.pipelines.linkage import uncertainty_sample

    rng = np.random.RandomState(2)
    n = 500
    df = pd.DataFrame({
        "x_id": np.arange(n, dtype=np.int64),
        "y_id": np.arange(n, dtype=np.int64) + 1000,
        "score": np.round(rng.uniform(-10, 10, n), 6),
    })
    out = uncertainty_sample(
        rd.from_pandas(df).repartition(8), k=25, threshold=4.0
    ).to_pandas()
    gaps = np.floor(np.abs(df.score - 4.0) * 1e6 + 0.5) / 1e6
    want = (df.assign(gap=gaps)
            .sort_values(["gap", "x_id", "y_id"]).head(25)
            .reset_index(drop=True))
    assert list(out.x_id) == list(want.x_id)
    assert np.allclose(out.gap, want.gap)
    out2 = uncertainty_sample(
        rd.from_pandas(df).repartition(2), k=25, threshold=4.0
    ).to_pandas()
    assert list(out2.x_id) == list(out.x_id)
