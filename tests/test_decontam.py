"""Decontamination family: BloomFilter sketch invariants + the
contamination / decontaminate pipelines over planted overlaps."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from record_matcher_ray.functions.sketches import BloomFilter
from record_matcher_ray.pipelines.decontam import (
    contamination,
    decontaminate,
    reference_bloom,
    reference_gram_hashes,
)


def _docs_table():
    """12 corpus docs: 0-3 verbatim copies of ref docs, 4-7 half-copied
    (contaminated prefix + fresh suffix), 8-11 fresh text."""
    ref_texts = [
        "the quick brown fox jumps over the lazy dog every single day",
        "pack my box with five dozen liquor jugs before the night ends",
        "how vexingly quick daft zebras jump across the wide open field",
        "sphinx of black quartz judge my vow said the ancient stone now",
    ]
    fresh = [
        "completely unrelated sentence about database systems and rays",
        "another novel line of text with no overlap to the reference",
        "streaming execution with backpressure keeps the memory bounded",
        "partitioned parquet output makes the whole run resumable later",
    ]
    half = [r[: len(r) // 2] + " " + f[: len(f) // 2] for r, f in zip(ref_texts, fresh)]
    corpus = ref_texts + half + fresh
    return (
        pa.table({"doc_id": list(range(len(corpus))), "text": corpus}),
        pa.table({"doc_id": list(range(100, 100 + len(ref_texts))),
                  "text": ref_texts}),
    )


class TestBloomFilter:
    def test_no_false_negatives(self):
        rng = np.random.default_rng(7)
        keys = rng.integers(0, 2**63, 200_000, dtype=np.int64).astype(np.uint64)
        bf = BloomFilter(bits_log2=22, k=6)
        bf.add_hashes(keys)
        assert bf.contains(keys).all()

    def test_fp_rate_bound(self):
        rng = np.random.default_rng(8)
        keys = rng.integers(0, 2**63, 100_000, dtype=np.int64).astype(np.uint64)
        bf = BloomFilter(bits_log2=22, k=6)  # m/n = 42 bits/key
        bf.add_hashes(keys)
        probe = rng.integers(0, 2**63, 200_000, dtype=np.int64).astype(np.uint64)
        fill = bf.fill_ratio()
        fp = bf.contains(probe).mean()
        # theory: fp ≈ fill**k; allow 3x slack
        assert fp <= max(3 * fill**6, 1e-6)

    def test_merge_is_union(self):
        rng = np.random.default_rng(9)
        k1 = rng.integers(0, 2**63, 10_000, dtype=np.int64).astype(np.uint64)
        k2 = rng.integers(0, 2**63, 10_000, dtype=np.int64).astype(np.uint64)
        a = BloomFilter(20, 4)
        b = BloomFilter(20, 4)
        a.add_hashes(k1)
        b.add_hashes(k2)
        m = a.merge(b)
        assert m.contains(k1).all() and m.contains(k2).all()

    def test_bits_log2_validation(self):
        with pytest.raises(ValueError):
            BloomFilter(bits_log2=5)


class TestContamination:
    def test_planted_overlap(self, ray_session):
        corpus_t, ref_t = _docs_table()
        corpus = ray.data.from_arrow(corpus_t)
        ref = ray.data.from_arrow(ref_t)
        out = (
            contamination(corpus, ref, window=16, mode="exact")
            .to_pandas().set_index("doc_id")["contained_frac"]
        )
        for i in range(4):  # verbatim copies
            assert out[i] == 1.0
        for i in range(4, 8):  # half-copied
            assert 0.2 < out[i] < 0.9, (i, out[i])
        for i in range(8, 12):  # fresh
            assert out[i] < 0.1, (i, out[i])

    def test_bloom_mode_matches_exact_on_planted(self, ray_session):
        """At these sizes the Bloom FP rate is ~0, so the modes agree."""
        corpus_t, ref_t = _docs_table()
        corpus = ray.data.from_arrow(corpus_t)
        ref = ray.data.from_arrow(ref_t)
        ex = (
            contamination(corpus, ref, mode="exact")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        bl = (
            contamination(corpus, ref, mode="bloom", bloom_bits_log2=22)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert (ex["contained_frac"] >= 0).all()
        assert np.allclose(ex["contained_frac"], bl["contained_frac"])

    def test_bloom_never_underreports(self, ray_session):
        """Bloom has no false negatives: contained_frac_bloom >= exact."""
        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        )
        ref = docs.limit(25).materialize()
        ex = (
            contamination(docs, ref, mode="exact")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        bl = (
            contamination(docs, ref, mode="bloom", bloom_bits_log2=24)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert (bl["contained_frac"] >= ex["contained_frac"] - 1e-9).all()

    def test_decontaminate_drops_contaminated(self, ray_session):
        corpus_t, ref_t = _docs_table()
        corpus = ray.data.from_arrow(corpus_t)
        ref = ray.data.from_arrow(ref_t)
        kept = decontaminate(
            corpus, ref, max_contained_frac=0.15, mode="exact"
        ).to_pandas()
        kept_ids = set(kept["doc_id"])
        assert kept_ids.isdisjoint(range(8))  # copies + half-copies gone
        assert kept_ids == set(range(8, 12))
        assert set(kept.columns) == {"doc_id", "text"}  # columns preserved

    def test_short_and_empty_docs(self, ray_session):
        corpus = ray.data.from_arrow(
            pa.table({"doc_id": [0, 1, 2],
                      "text": ["", "tiny", "the quick brown fox jumps"]})
        )
        ref = ray.data.from_arrow(
            pa.table({"doc_id": [9], "text": ["tiny"]})
        )
        out = contamination(corpus, ref, window=16).to_pandas()
        # empty doc dropped; "tiny" is one whole-doc window, fully contained
        assert set(out["doc_id"]) == {1, 2}
        row = out.set_index("doc_id")
        assert row.loc[1, "contained_frac"] == 1.0
        assert row.loc[1, "n_windows"] == 1
        assert row.loc[2, "contained_frac"] == 0.0

    def test_exact_cap_guard(self, ray_session):
        import record_matcher_ray.pipelines.decontam as dc

        docs = ray.data.from_arrow(
            pa.table({"doc_id": [0], "text": ["some reference text here"]})
        )
        old = dc.EXACT_REF_GRAM_CAP
        dc.EXACT_REF_GRAM_CAP = 1
        try:
            with pytest.raises(ValueError, match="bloom"):
                reference_gram_hashes(docs)
        finally:
            dc.EXACT_REF_GRAM_CAP = old

    def test_reference_bloom_roundtrip(self, ray_session):
        _, ref_t = _docs_table()
        ref = ray.data.from_arrow(ref_t)
        bf = reference_bloom(ref, bits_log2=20)
        grams = reference_gram_hashes(ref)
        assert bf.contains(grams).all()
