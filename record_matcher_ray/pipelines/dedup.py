"""Deduplication family for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram-Jaccard verification, embedding-cosine near-dup.

Scale shapes:
- exact: one hash shuffle on the content hash, keep-first per group;
- minhash LSH: shingle→minhash→band keys per batch (map_batches), explode
  to (band_key, doc_id), `groupby(band_key)` → candidate pairs (hot buckets
  capped, counted, never silently), verify with n-gram Jaccard, then
  connected components over surviving pairs;
- simhash: 64-bit fingerprints per batch; near-dup = identical fingerprint
  buckets (or banded sub-fingerprints);
- embedding cosine: see pipelines/similarity.py (same kernel, threshold
  filter instead of top-k).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from record_matcher_ray.functions.scorers import ngram_jaccard
from record_matcher_ray.pipelines.cluster import connected_components
from record_matcher_ray.stages.blocking import MinHasher, char_shingles, normalize_text


def exact_dedup(
    ds: ray.data.Dataset, columns: list[str], id_col: str
) -> ray.data.Dataset:
    """Keep the min-id row per distinct value tuple of ``columns``.
    Hash-partition + per-group first (SURVEY.md §7.3)."""

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col, kind="stable").head(1)

    return ds.groupby(columns).map_groups(pick, batch_format="pandas")


def exact_dup_groups(
    ds: ray.data.Dataset, columns: list[str], id_col: str
) -> ray.data.Dataset:
    """→ (keeper_id, dup_id) pairs for every exact-duplicate row."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable")
        if len(df) <= 1:
            return pd.DataFrame({"keeper_id": pd.Series([], dtype="int64"),
                                 "dup_id": pd.Series([], dtype="int64")})
        keeper = df[id_col].iloc[0]
        dups = df[id_col].iloc[1:]
        return pd.DataFrame({"keeper_id": np.full(len(dups), keeper, dtype=np.int64),
                             "dup_id": dups.to_numpy(dtype=np.int64)})

    return ds.groupby(columns).map_groups(pairs, batch_format="pandas")


class _MinhashKeys:
    """Stateless band-key emitter with per-process-cached permutation state."""

    def __init__(self, text_col, id_col, num_perm, bands, shingle, seed):
        self.args = (text_col, id_col, num_perm, bands, shingle, seed)

    def __call__(self, t: pa.Table) -> pa.Table:
        text_col, id_col, num_perm, bands, shingle, seed = self.args
        hasher = MinHasher(num_perm=num_perm, seed=seed)
        rows = num_perm // bands
        texts = pc.fill_null(pc.cast(t[text_col], pa.string()), "").to_pylist()
        ids = t[id_col].to_numpy()
        keys, out_ids = [], []
        for i, txt in enumerate(texts):
            sig = hasher.signature(char_shingles(txt, shingle))
            for b in range(bands):
                keys.append(
                    f"{b}:{zlib.crc32(sig[b * rows:(b + 1) * rows].tobytes()):08x}"
                )
                out_ids.append(ids[i])
        return pa.table(
            {"band_key": pa.array(keys, pa.string()),
             "id": pa.array(np.asarray(out_ids, dtype=np.int64))}
        )


def minhash_candidates(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 4,
    seed: int = 1,
    max_bucket: int = 200,
) -> ray.data.Dataset:
    """→ distinct candidate pairs (a, b), a < b, sharing any LSH band.
    Buckets larger than ``max_bucket`` are dropped (non-discriminative)."""
    keys = ds.map_batches(
        _MinhashKeys(text_col, id_col, num_perm, bands, shingle, seed),
        batch_format="pyarrow",
    )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(df["id"].to_numpy())
        if len(ids) < 2 or len(ids) > max_bucket:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        ai, bi = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ai], "b": ids[bi]})

    pairs = keys.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas")
    # a pair may surface from several bands — dedupe on (a, b)
    return pairs.groupby(["a", "b"]).map_groups(
        lambda df: df.head(1), batch_format="pandas"
    )


def minhash_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    jaccard_threshold: float = 60.0,
    **kw,
) -> dict:
    """Full near-dup pipeline: LSH candidates → n-gram-Jaccard verify →
    connected components. Returns {"pairs": verified pairs Dataset,
    "components": (node, component) Dataset}."""
    cands = minhash_candidates(ds, text_col, id_col, **kw)

    texts_df = ds.select_columns([id_col, text_col]).to_pandas()
    lookup = dict(zip(texts_df[id_col].astype(np.int64), texts_df[text_col]))
    import ray

    lookup_ref = ray.put(lookup)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(lookup_ref)
        keep_a, keep_b, sims = [], [], []
        for a, b in zip(df["a"], df["b"]):
            s = ngram_jaccard(
                normalize_text(lk.get(int(a), "")), normalize_text(lk.get(int(b), ""))
            )
            if s >= jaccard_threshold:
                keep_a.append(int(a))
                keep_b.append(int(b))
                sims.append(round(s, 6))
        return pd.DataFrame(
            {"a": pd.Series(keep_a, dtype="int64"),
             "b": pd.Series(keep_b, dtype="int64"),
             "jaccard": pd.Series(sims, dtype="float64")}
        )

    verified = cands.map_batches(verify, batch_format="pandas").materialize()
    comps = connected_components(verified, u="a", v="b")
    return {"pairs": verified, "components": comps}


def simhash64(
    ds: ray.data.Dataset, text_col: str, id_col: str, shingle: int = 4
) -> ray.data.Dataset:
    """→ (id, simhash): 64-bit SimHash over character shingles. Exact-equal
    fingerprints (or banded 16-bit quarters) bucket near-duplicates."""

    def fp(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(pc.cast(t[text_col], pa.string()), "").to_pylist()
        out = np.zeros(len(texts), np.uint64)
        for i, txt in enumerate(texts):
            hs = char_shingles(txt, shingle).astype(np.uint64)
            if len(hs) == 0:
                continue
            # spread crc32 into 64 bits deterministically
            hs = hs * np.uint64(0x9E3779B97F4A7C15)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            out[i] = np.packbits(votes > 0, bitorder="little").view(np.uint64)[0]
        return pa.table(
            {"id": t[id_col].combine_chunks(),
             "simhash": pa.array(out.astype(np.int64))}
        )

    return ds.map_batches(fp, batch_format="pyarrow")
