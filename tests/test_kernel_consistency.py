"""Cross-kernel consistency: the three scoring kernels (block, pair-stream,
flat-pair) must agree on scores, candidates and optimal thresholds for the
same inputs — they are three physical layouts of one semantic."""

import numpy as np
import pytest

from record_matcher_ray.core.config import MatchConfigBuilder
from record_matcher_ray.core.kernel import score_block, score_pairs, score_pairs_flat


@pytest.fixture
def setup():
    b = MatchConfigBuilder(
        x_columns={"fn", "ln"}, y_columns={"fn", "ln", "tag"}
    )
    b.match("fn", ["fn"], scorer="jaro_winkler")
    b.match("ln", ["ln"], scorer="levenshtein", threshold=60.0, cutoff=True)
    cfg = b.build()
    x_cols = {
        "fn": np.array(["alice", "bob", "", "carol"], dtype=object),
        "ln": np.array(["smith", "jones", "lee", ""], dtype=object),
    }
    y_cols = {
        "fn": np.array(["alice", "bobby", "karol"], dtype=object),
        "ln": np.array(["smith", "jonez", "leigh"], dtype=object),
        "tag": np.array(["A", "B", "C"], dtype=object),
    }
    uniq = {"fn": 0.75, "ln": 0.75}
    x_ids = np.array([10, 11, 12, 13], dtype=np.int64)
    y_ids = np.array([20, 21, 22], dtype=np.int64)
    return cfg, x_cols, y_cols, x_ids, y_ids, uniq


def test_pairs_vs_flat_consistency(setup):
    cfg, x_cols, y_cols, x_ids, y_ids, uniq = setup
    pairs = score_pairs(x_cols, y_cols, x_ids, y_ids, cfg, uniq)
    nx, ny = len(x_ids), len(y_ids)
    xi = np.repeat(np.arange(nx), ny)
    yi = np.tile(np.arange(ny), nx)
    score, cand, optimal = score_pairs_flat(x_cols, y_cols, xi, yi, cfg, uniq)

    flat_map = {
        (int(x_ids[xi[k]]), int(y_ids[yi[k]])): (score[k], optimal[xi[k]])
        for k in range(len(xi))
        if cand[k]
    }
    pair_map = {
        (int(a), int(b)): (s, o)
        for a, b, s, o in zip(
            pairs["x_id"], pairs["y_id"], pairs["score"], pairs["optimal"]
        )
    }
    assert set(flat_map) == set(pair_map)
    for k in pair_map:
        assert flat_map[k][0] == pytest.approx(pair_map[k][0])
        assert flat_map[k][1] == pytest.approx(pair_map[k][1])


def test_block_argmax_matches_pair_stream(setup):
    cfg, x_cols, y_cols, x_ids, y_ids, uniq = setup
    res, _ = score_block(x_cols, y_cols, x_ids, y_ids, cfg, uniq)
    pairs = score_pairs(x_cols, y_cols, x_ids, y_ids, cfg, uniq)
    for i, xid in enumerate(x_ids):
        mask = pairs["x_id"] == xid
        if not mask.any():
            assert res["pre_status"][i] == "unmatched"
            continue
        mx = pairs["score"][mask].max()
        if res["winner_y_id"][i] != -1:
            winner_mask = mask & (pairs["y_id"] == res["winner_y_id"][i])
            assert pairs["score"][winner_mask].max() == pytest.approx(mx)
            assert res["winner_score"][i] == pytest.approx(mx)
