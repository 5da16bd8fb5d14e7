"""Config validation parity (SURVEY.md §2.3 C2-C7, modeled on the
reference's tests/test_config.py accept/reject tables)."""

import pytest

from record_matcher_ray.core.config import MatchConfigBuilder
from record_matcher_ray.errors import (
    TBConfigColumnNotFound,
    TBConfigColumnToMatchLock,
    TBConfigOverwriteError,
    TBConfigScorerNotFound,
    TBConfigXUniqueConstraint,
)


@pytest.fixture
def builder():
    return MatchConfigBuilder(
        x_columns={"fn", "ln", "city"}, y_columns={"first", "last", "town", "yid"}
    )


def test_match_assignment_defaults(builder):
    builder.columns_to_match["fn"] = ["first", "last"]
    assert builder.columns_to_match["fn"] == ["first", "last"]
    assert builder.scorers_by_column["fn"] == "exact_match"
    assert builder.thresholds_by_column["fn"] == 75.0
    assert builder.cutoffs_by_column["fn"] is False


def test_match_unknown_x_raises_via_scorer_cascade(builder):
    # the reference's __missing__ returns a detached list, but the
    # auto-populate cascade into scorers_by_column raises ColumnNotFound
    # for an unknown x (verified by probe against /root/reference)
    with pytest.raises(TBConfigColumnNotFound):
        builder.columns_to_match["nope"] = ["first"]
    assert "nope" not in builder.columns_to_match


def test_match_unknown_y_silently_dropped(builder):
    builder.columns_to_match["fn"] = ["first", "bogus"]
    assert builder.columns_to_match["fn"] == ["first"]


def test_match_delete_cascades(builder):
    builder.columns_to_match["fn"] = ["first"]
    del builder.columns_to_match["fn"]
    assert "fn" not in builder.scorers_by_column
    assert "fn" not in builder.thresholds_by_column
    assert "fn" not in builder.cutoffs_by_column


def test_get_unknown_y_silent(builder):
    builder.columns_to_get["bogus"] = "out"
    assert "bogus" not in builder.columns_to_get


def test_get_unique_constraint(builder):
    builder.columns_to_get["yid"] = "out"
    with pytest.raises(TBConfigXUniqueConstraint):
        builder.columns_to_get["first"] = "out"


def test_get_overwrite_gate(builder):
    with pytest.raises(TBConfigOverwriteError):
        builder.columns_to_get["yid"] = "fn"
    builder.columns_to_get.allow_overwrite = True
    builder.columns_to_get["yid"] = "fn"
    assert builder.columns_to_get["yid"] == "fn"


def test_group_unknown_raises(builder):
    with pytest.raises(TBConfigColumnNotFound):
        builder.columns_to_group["bogus"] = "fn"
    with pytest.raises(TBConfigColumnNotFound):
        builder.columns_to_group["first"] = "bogus"
    builder.columns_to_group["first"] = "fn"
    assert builder.columns_to_group["first"] == "fn"


def test_scorer_unknown_raises(builder):
    with pytest.raises(TBConfigScorerNotFound):
        builder.scorers_by_column["fn"] = "no_such_scorer"
    with pytest.raises(TBConfigColumnNotFound):
        builder.scorers_by_column["bogus"] = "exact_match"


def test_scorer_delete_lock(builder):
    builder.columns_to_match["fn"] = ["first"]
    with pytest.raises(TBConfigColumnToMatchLock):
        del builder.scorers_by_column["fn"]
    with pytest.raises(TBConfigColumnToMatchLock):
        del builder.thresholds_by_column["fn"]
    with pytest.raises(TBConfigColumnToMatchLock):
        del builder.cutoffs_by_column["fn"]


def test_threshold_and_cutoff_type_checks(builder):
    with pytest.raises(ValueError):
        builder.thresholds_by_column["fn"] = "high"
    with pytest.raises(ValueError):
        builder.cutoffs_by_column["fn"] = 1
    builder.thresholds_by_column["fn"] = 80
    builder.cutoffs_by_column["fn"] = True
    assert builder.thresholds_by_column["fn"] == 80.0
    assert builder.cutoffs_by_column["fn"] is True


def test_reset_on_schema_change(builder):
    builder.columns_to_match["fn"] = ["first"]
    builder.set_x_columns({"completely", "different"})
    assert not builder.columns_to_match
    assert not builder.scorers_by_column


def test_populate_intersection():
    b = MatchConfigBuilder(x_columns={"a", "b", "c"}, y_columns={"b", "c", "d"})
    b.populate()
    assert set(b.columns_to_match) == {"b", "c"}
    assert b.columns_to_match["b"] == ["b"]


def test_build_roundtrip(builder):
    builder.match("fn", ["first"], scorer="levenshtein", threshold=80, cutoff=True)
    builder.group("town", "city").get("yid", "matched_id")
    cfg = builder.build(required_threshold=70)
    assert cfg.match_map() == {"fn": ("first",)}
    assert cfg.scorer_of("fn") == "levenshtein"
    assert cfg.threshold_of("fn") == 80.0
    assert cfg.cutoff_of("fn") is True
    assert cfg.group_map() == {"town": "city"}
    assert cfg.get_map() == {"yid": "matched_id"}
    assert cfg.required_threshold == 70
    import pickle

    assert pickle.loads(pickle.dumps(cfg)) == cfg
