"""Parity of the pure dict-table utilities with the reference's records.py
(on inputs the reference can process — ragged-missing-column handling is a
documented superset, SURVEY.md §1.3)."""

import pytest

from record_matcher_ray.core import records as rec

TABLE = {
    0: {"firstname": "Reuben", "lastname": "Miller", "country": "USA"},
    1: {"firstname": "Alicia", "lastname": "Thornton", "country": "UK"},
    2: {"firstname": "Jane", "lastname": "van Doe", "country": "USA"},
    3: {"firstname": "", "lastname": "Miller", "country": "UK"},
}


def test_column_names_union_ragged():
    records = {0: {"a": 1, "b": 2}, 1: {"a": 3, "b": 4, "c": 5}}
    assert rec.column_names(records) == {"a", "b", "c"}


def test_uniqueness_by_column(reference):
    ref_records, _ = reference
    for col in ["firstname", "lastname", "country"]:
        assert rec.uniqueness_by_column(TABLE, col) == ref_records.uniqueness_by_column(
            TABLE, col
        )
    # blanks excluded from numerator, all rows in denominator
    assert rec.uniqueness_by_column(TABLE, "firstname") == 3 / 4
    assert rec.uniqueness_by_column({}, "x") == 0


def test_uniqueness_missing_column_is_blank():
    # documented deviation: reference raises KeyError here
    assert rec.uniqueness_by_column({0: {"a": 1}, 1: {"b": 2}}, "a") == 1 / 2


def test_adjusted_uniqueness(reference):
    ref_records, _ = reference
    got = rec.adjusted_uniqueness(["firstname", "country"], records=TABLE)
    want = ref_records.adjusted_uniqueness(["firstname", "country"], records=TABLE)
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k])
    assert sum(got.values()) == pytest.approx(1.0)
    assert rec.adjusted_uniqueness([], records=TABLE) == {}


def test_group_by(reference):
    ref_records, _ = reference
    for column_map in [
        {"country": "USA"},
        {"country": "UK", "lastname": "Miller"},
        {},
        {"country": "nowhere"},
    ]:
        assert rec.group_by(TABLE, column_map) == ref_records.group_by(TABLE, column_map)
    # missing column treated as "" (reference uses .get(col, ""))
    assert rec.group_by({0: {"a": 1}}, {"b": ""}) == {0: {"a": 1}}


def test_duplicated_by_column(reference):
    ref_records, _ = reference
    got = list(rec.duplicated_by_column(TABLE, "lastname"))
    want = list(ref_records.duplicated_by_column(TABLE, "lastname"))
    assert got == want
    assert len(got) == 2  # the two Millers; blank lastname never counts
    assert list(rec.duplicated_by_column(TABLE, "firstname")) == []
