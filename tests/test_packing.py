"""Sequence packing: next-fit token bins, partition-local, exact accounting."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from record_matcher_ray.pipelines.packing import (
    _next_fit_bins,
    pack_sequences,
    packing_stats,
)


def _ref_next_fit(tokens, budget):
    """Independent per-doc reference of the next-fit recurrence."""
    bins, b, run = [], -1, None
    for t in tokens:
        if run is None or run + t > budget:
            b, run = b + 1, t
        else:
            run += t
        bins.append(b)
    return bins


class TestNextFitBins:
    def test_empty(self):
        assert _next_fit_bins(np.array([], np.int64), 10).tolist() == []

    def test_matches_scalar_reference(self):
        rng = np.random.default_rng(7)
        for budget in (8, 64, 512):
            toks = rng.integers(0, budget * 2, 500).astype(np.int64)
            got = _next_fit_bins(toks, budget).tolist()
            assert got == _ref_next_fit(toks.tolist(), budget)

    def test_oversize_doc_alone(self):
        toks = np.array([3, 100, 3, 3], np.int64)
        assert _next_fit_bins(toks, 10).tolist() == [0, 1, 2, 2]

    def test_exact_fit_stays(self):
        toks = np.array([5, 5, 1], np.int64)
        assert _next_fit_bins(toks, 10).tolist() == [0, 0, 1]

    def test_zero_token_docs(self):
        toks = np.array([0, 0, 10, 0, 11, 0], np.int64)
        # zeros ride along; a zero AFTER an oversize bin opens a new bin
        assert _next_fit_bins(toks, 10).tolist() == _ref_next_fit(
            toks.tolist(), 10
        )


class TestPackSequences:
    def _ds(self, toks):
        n = len(toks)
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": np.arange(100, 100 + n, dtype=np.int64),
                    "n_tokens": np.asarray(toks, np.int64),
                }
            )
        )

    def test_basic_bins(self, ray_session):
        out = (
            pack_sequences(self._ds([4, 4, 4, 9, 20, 1]), 10)
            .to_pandas()
            .sort_values("bin_id")
            .reset_index(drop=True)
        )
        # budget 10 → bins [4,4] [4] [9] [20 oversize] [1]
        assert out["bin_id"].tolist() == [100, 102, 103, 104, 105]
        assert out["n_docs"].tolist() == [2, 1, 1, 1, 1]
        assert out["total_tokens"].tolist() == [8, 4, 9, 20, 1]
        assert out["oversize"].tolist() == [False, False, False, True, False]
        assert out["doc_ids"].iloc[0].tolist() == [100, 101]
        np.testing.assert_allclose(
            out["fill_frac"], [0.8, 0.4, 0.9, 1.0, 0.1]
        )

    def test_accounting_exact(self, ray_session):
        rng = np.random.default_rng(3)
        toks = rng.integers(1, 900, 5_000).astype(np.int64)
        ds = self._ds(toks)
        packed = pack_sequences(ds, 512, batch_size=1000)
        stats = packing_stats(packed, 512)
        # every doc lands in exactly one bin, tokens conserved
        assert stats["n_docs"] == 5_000
        assert stats["total_tokens"] == int(toks.sum())
        df = packed.to_pandas()
        all_ids = np.sort(np.concatenate(df["doc_ids"].to_numpy()))
        assert all_ids.tolist() == list(range(100, 5_100))
        # bin_id = first doc id → unique
        assert df["bin_id"].is_unique

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            pack_sequences(self._ds([1]), 0)
        bad = pack_sequences(self._ds([-1, 2]), 10)
        with pytest.raises(Exception):
            bad.materialize()
