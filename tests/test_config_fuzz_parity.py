"""Config-fuzzed parity: random match configurations (columns, scorers,
thresholds, cutoffs, grouping, copy-over) on random tables, engine vs the
in-process reference. The widest net for semantic drift in the core."""

import copy
import random

import pytest

from record_matcher_ray.api import RecordMatcher
from record_matcher_ray.functions.scorers import difflib_ratio

COLS = ["c1", "c2", "c3", "c4"]
VALS = ["red", "blue", "green", "rex", "ruby", "blot", "", "gren"]


def _random_case(seed):
    rng = random.Random(seed)
    ny = rng.randrange(5, 25)
    nx = rng.randrange(5, 30)
    y = {
        j + 100: {c: rng.choice(VALS) for c in COLS} | {"tag": f"T{j}"}
        for j in range(ny)
    }
    x = {i: {c: rng.choice(VALS) for c in COLS} for i in range(nx)}

    match_cols = rng.sample(COLS, rng.randrange(1, len(COLS) + 1))
    scorers = {c: rng.choice(["exact_match", "difflib_ratio"]) for c in match_cols}
    thresholds = {c: rng.choice([0.0, 40.0, 75.0, 100.0]) for c in match_cols}
    cutoffs = {c: rng.random() < 0.4 for c in match_cols}
    group = rng.random() < 0.5
    get = rng.random() < 0.7

    def setup(c):
        for col in match_cols:
            c.columns_to_match[col] = col
            c.scorers_by_column[col] = scorers[col]
            c.thresholds_by_column[col] = thresholds[col]
            c.cutoffs_by_column[col] = cutoffs[col]
        if group:
            c.columns_to_group[COLS[0]] = COLS[0]
        if get:
            c.columns_to_get["tag"] = "gotten"

    return x, y, setup


@pytest.mark.parametrize("seed", list(range(40)))
def test_config_fuzz_parity(reference, seed):
    x, y, setup = _random_case(seed)

    _, ref_matcher = reference
    import record_matcher.config as ref_config

    ref_config.ScorersByColumn.SCORERS["difflib_ratio"] = difflib_ratio
    m = ref_matcher.RecordMatcher()
    m.x_records = copy.deepcopy(x)
    m.y_records = copy.deepcopy(y)
    setup(m.config)
    want, want_summary = m.match()

    e = RecordMatcher()
    e.x_records = copy.deepcopy(x)
    e.y_records = copy.deepcopy(y)
    setup(e.config)
    got, got_summary = e.match()

    assert set(got) == set(want), seed
    for idx in want:
        g, w = got[idx], want[idx]
        assert set(g) == set(w), (seed, idx)
        for col in w:
            gv, wv = g[col], w[col]
            if col == "match_score" and wv:
                gs = [float(s) for s in gv.split(", ")] if gv else []
                ws = [float(s) for s in wv.split(", ")]
                assert gs == pytest.approx(ws, abs=1e-6), (seed, idx)
            elif col == "row(s)_matched" and wv and ", " in wv:
                # ambiguous tie lists: compare as sets (insertion-order
                # reproduction is tested elsewhere; fuzz configs can create
                # degenerate equal-weight orderings)
                assert set(gv.split(", ")) == set(wv.split(", ")), (seed, idx)
            else:
                assert gv == wv, (seed, idx, col, gv, wv)
    assert dict(got_summary) == dict(want_summary), seed
