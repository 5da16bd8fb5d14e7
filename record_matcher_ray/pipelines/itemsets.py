"""Market-basket co-occurrence: frequent item PAIRS with exact support.

The level-2 Apriori primitive (Agrawal & Srikant, VLDB 1994): for every
pair of items that appear together in at least ``min_support`` baskets,
report the exact basket count. In a training-data pipeline this is the
co-occurrence signal behind "documents that cite both A and B",
tag-affinity mining, and template detection over shingle pairs.

Scale shape: baskets hash-bucket by basket id (≤ ``n_buckets`` groups
ride the first exchange — the CLAUDE.md per-group rule), each bucket
vectorizes per-basket pair enumeration (sorted-distinct items, so pairs
are emitted once per basket with item_a < item_b) and pre-aggregates its
pair counts locally; one ``groupby(item_a, item_b).sum`` merges the
bucket partials. Oversized baskets (> ``max_basket`` distinct items, the
quadratic-blowup guard) are dropped deterministically — the SQL oracle
applies the identical HAVING filter. Pair volume is Σ m·(m−1)/2 over
KEPT baskets only, so the cap bounds the exchange at
``n_baskets · max_basket²/2`` regardless of skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from record_matcher_ray.core.hashkernels import column_hash64


def basket_pairs(
    ds: ray.data.Dataset,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    max_basket: int = 256,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """→ rows (item_a, item_b, support): exact number of distinct
    baskets containing BOTH items, for pairs with support ≥
    ``min_support``; item_a < item_b. Null basket/item rows drop."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if max_basket < 2:
        raise ValueError(f"max_basket must be >= 2, got {max_basket}")

    def project(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t[basket_col]), pc.is_valid(t[item_col]))
        sub = t.filter(ok)
        b = column_hash64(sub[basket_col]) % np.uint64(n_buckets)
        return pa.table(
            {"__b__": pa.array(b.astype(np.int64)),
             "bk": sub[basket_col], "it": sub[item_col]}
        )

    def gen_pairs(t: pa.Table) -> pa.Table:
        bk = t["bk"].to_numpy(zero_copy_only=False)
        it = t["it"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"item_a": pa.array([], pa.int64()),
             "item_b": pa.array([], pa.int64()),
             "support": pa.array([], pa.int64())}
        )
        if len(bk) == 0:
            return empty
        # sorted-distinct (basket, item): one lexsort, consecutive dedupe
        order = np.lexsort((it, bk))
        bs, is_ = bk[order], it[order]
        keep = np.empty(len(bs), bool)
        keep[0] = True
        keep[1:] = (bs[1:] != bs[:-1]) | (is_[1:] != is_[:-1])
        bs, is_ = bs[keep], is_[keep]
        # per-basket segment sizes; drop oversized baskets (oracle: HAVING)
        new_b = np.empty(len(bs), bool)
        new_b[0] = True
        new_b[1:] = bs[1:] != bs[:-1]
        seg_id = np.cumsum(new_b) - 1
        m = np.bincount(seg_id).astype(np.int64)
        good = m <= max_basket
        elem_keep = good[seg_id]
        is_ = is_[elem_keep]
        seg_id = seg_id[elem_keep]
        if len(is_) == 0:
            return empty
        # re-compact segment ids and sizes
        _, seg_id = np.unique(seg_id, return_inverse=True)
        m = np.bincount(seg_id).astype(np.int64)
        # pair enumeration: element k of an m-item basket pairs with the
        # m-1-k items after it (items are sorted ⇒ item_a < item_b)
        starts = np.concatenate(([0], np.cumsum(m)))[:-1]
        within = np.arange(len(is_), dtype=np.int64) - starts[seg_id]
        counts = m[seg_id] - 1 - within
        tot = int(counts.sum())
        if tot == 0:
            return empty
        first = np.repeat(np.arange(len(is_), dtype=np.int64), counts)
        cstart = np.concatenate(([0], np.cumsum(counts)))
        j_off = np.arange(tot, dtype=np.int64) - cstart[first] + 1
        a = is_[first].astype(np.int64)
        b = is_[first + j_off].astype(np.int64)
        # local pre-aggregation: count duplicate pairs inside the bucket
        po = np.lexsort((b, a))
        a, b = a[po], b[po]
        newp = np.empty(len(a), bool)
        newp[0] = True
        newp[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        pid = np.cumsum(newp) - 1
        cnt = np.bincount(pid).astype(np.int64)
        return pa.table(
            {"item_a": pa.array(a[newp]), "item_b": pa.array(b[newp]),
             "support": pa.array(cnt)}
        )

    pairs = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__b__")
        .map_groups(gen_pairs, batch_format="pyarrow")
        .groupby(["item_a", "item_b"])
        .aggregate(Sum("support", alias_name="support"))
    )
    ms = int(min_support)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["support"], ms))

    return pairs.map_batches(keep, batch_format="pyarrow")
