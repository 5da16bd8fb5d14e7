"""basket_pairs: exact pair support counts over (basket, item) rows."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from record_matcher_ray.pipelines.itemsets import basket_pairs


def _brute(df: pd.DataFrame, min_support: int, max_basket: int):
    sub = df.dropna().drop_duplicates()
    sizes = sub.groupby("bk")["it"].nunique()
    kept = sub[sub["bk"].isin(sizes[sizes <= max_basket].index)]
    counts: dict[tuple[int, int], int] = {}
    for _, grp in kept.groupby("bk"):
        for a, b in itertools.combinations(sorted(grp["it"]), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return {p: c for p, c in counts.items() if c >= min_support}


def test_basket_pairs_exact_counts(ray_session):
    rng = np.random.RandomState(11)
    rows = []
    for bk in range(200):
        items = rng.choice(40, size=rng.randint(1, 8), replace=True)
        rows += [(bk, int(i)) for i in items]
    # duplicate (basket, item) rows must not inflate support
    rows += rows[:50]
    df = pd.DataFrame(rows, columns=["bk", "it"])
    ds = ray.data.from_pandas(df).repartition(7)
    out = basket_pairs(ds, "bk", "it", min_support=2).to_pandas()
    got = {
        (int(r.item_a), int(r.item_b)): int(r.support)
        for r in out.itertuples()
    }
    assert got == _brute(df, 2, 256)
    assert (out["item_a"] < out["item_b"]).all()


def test_basket_pairs_oversized_and_nulls(ray_session):
    # basket 0 has 5 distinct items > max_basket=4 -> dropped entirely
    df = pd.DataFrame(
        {
            "bk": [0] * 5 + [1, 1, 1, 2, 2, None],
            "it": [10, 11, 12, 13, 14, 10, 11, None, 10, 11, 10],
        }
    )
    ds = ray.data.from_pandas(df)
    out = basket_pairs(ds, "bk", "it", min_support=2, max_basket=4)
    got = {
        (int(r["item_a"]), int(r["item_b"])): int(r["support"])
        for r in out.take_all()
    }
    assert got == {(10, 11): 2}


def test_basket_pairs_validation(ray_session):
    ds = ray.data.from_items([{"bk": 1, "it": 2}])
    with pytest.raises(ValueError):
        basket_pairs(ds, "bk", "it", min_support=0)
    with pytest.raises(ValueError):
        basket_pairs(ds, "bk", "it", max_basket=1)


def test_basket_pairs_empty(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"bk": pa.array([], pa.int64()),
                  "it": pa.array([], pa.int64())})
    )
    assert basket_pairs(ds, "bk", "it").count() == 0


def test_item_cooccurrence_similarity_exact(ray_session):
    from record_matcher_ray.pipelines.itemsets import (
        item_cooccurrence_similarity,
    )

    rng = np.random.RandomState(3)
    rows = []
    for bk in range(300):
        for i in rng.choice(30, size=rng.randint(1, 6), replace=True):
            rows.append((bk, int(i)))
    df = pd.DataFrame(rows, columns=["bk", "it"])
    ds = ray.data.from_pandas(df).repartition(5)
    out = item_cooccurrence_similarity(ds, "bk", "it", min_support=2
                                       ).to_pandas()

    pair_want = _brute(df, 2, 256)
    kept = df.drop_duplicates()
    isupp = kept.groupby("it")["bk"].nunique()
    nb = kept["bk"].nunique()
    got = {(int(r.item_a), int(r.item_b)):
           (int(r.support), r.cosine, r.lift) for r in out.itertuples()}
    assert set(got) == set(pair_want)
    for (a, b), (s, cosv, liftv) in got.items():
        assert s == pair_want[(a, b)]
        sa, sb = int(isupp[a]), int(isupp[b])
        cos_e = float(s) / (np.sqrt(float(sa)) * np.sqrt(float(sb)))
        lift_e = float(s * nb) / float(sa * sb)
        assert cosv == np.floor(cos_e * 1e9 + 0.5) / 1e9
        assert liftv == np.floor(lift_e * 1e9 + 0.5) / 1e9
    # sanity: cosine bounded, independent items have lift ~ anything > 0
    assert (out["cosine"] <= 1.0).all() and (out["cosine"] > 0).all()


def test_item_cooccurrence_negative_ids_rejected(ray_session):
    from record_matcher_ray.pipelines.itemsets import (
        item_cooccurrence_similarity,
    )

    ds = ray.data.from_items(
        [{"bk": 1, "it": -5}, {"bk": 1, "it": 2}]
    )
    with pytest.raises(Exception):
        item_cooccurrence_similarity(ds, "bk", "it").to_pandas()


def test_item_cooccurrence_empty(ray_session):
    from record_matcher_ray.pipelines.itemsets import (
        item_cooccurrence_similarity,
    )

    ds = ray.data.from_arrow(
        pa.table({"bk": pa.array([], pa.int64()),
                  "it": pa.array([], pa.int64())})
    )
    assert item_cooccurrence_similarity(ds, "bk", "it").count() == 0


def test_adamic_adar_items(ray_session):
    import math

    import ray.data as rd

    from record_matcher_ray.pipelines.itemsets import adamic_adar_items

    # baskets: 10:{1,2,3} 11:{1,2} 12:{1,2} 13:{4,5} (support 1 -> cut)
    df = pd.DataFrame(
        {"bk": np.array([10, 10, 10, 11, 11, 12, 12, 13, 13, 10],
                        dtype=np.int64),  # dup (10,1) row collapses
         "it": np.array([1, 2, 3, 1, 2, 1, 2, 4, 5, 1],
                        dtype=np.int64)}
    )
    out = (
        adamic_adar_items(rd.from_pandas(df).repartition(4), "bk", "it",
                          min_support=2)
        .to_pandas().sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    w3 = math.floor(1e9 / math.log(3.0) + 0.5)
    w2 = math.floor(1e9 / math.log(2.0) + 0.5)
    # only (1,2) has support >= 2: baskets 10 (size 3), 11, 12 (size 2)
    assert out["item_a"].tolist() == [1]
    assert out["item_b"].tolist() == [2]
    assert out["support"].tolist() == [3]
    units = w3 + w2 + w2
    want = np.floor(units / 1e9 * 1e6 + 0.5) / 1e6
    assert out["aa"].tolist() == [want]


def test_adamic_adar_caps_and_empty(ray_session):
    import ray.data as rd

    from record_matcher_ray.pipelines.itemsets import adamic_adar_items

    # an oversized basket (> max_basket) drops entirely
    big = pd.DataFrame(
        {"bk": np.zeros(10, dtype=np.int64),
         "it": np.arange(10, dtype=np.int64)}
    )
    out = adamic_adar_items(
        rd.from_pandas(big), "bk", "it", min_support=1, max_basket=5
    ).to_pandas()
    assert len(out) == 0

    empty = big.iloc[:0]
    out2 = adamic_adar_items(rd.from_pandas(empty), "bk", "it").to_pandas()
    assert len(out2) == 0
