"""Algorithms 1/2: equi-join semantics incl. diacritics and the
middle-name Some/None asymmetry (reference mod.rs:2601-2602, 2713)."""

from __future__ import annotations

from datetime import date

import pytest

from name_matcher_spark.operators.exact import match_algo1, match_algo2
from name_matcher_spark.operators.prepare import prepare_persons

SCHEMA = "id long, uuid string, first_name string, middle_name string, last_name string, birthdate date, hh_id string"


def _persons(spark, rows):
    return prepare_persons(spark.createDataFrame(rows, SCHEMA))


@pytest.fixture(scope="module")
def tables(spark):
    bd = date(1990, 1, 1)
    other = date(1985, 5, 5)
    t1 = _persons(
        spark,
        [
            (1, "u1", "José", None, "García", bd, None),
            (2, "u2", "Ann", "Q", "Lee", bd, None),
            (3, "u3", "Bob", None, "Stone", other, None),
            (4, "u4", "Pat", "X", "Day", bd, None),
        ],
    )
    t2 = _persons(
        spark,
        [
            (11, "v1", "Jose", None, "Garcia", bd, None),   # diacritic variant
            (12, "v2", "Ann", "Q", "Lee", bd, None),        # exact incl. middle
            (13, "v3", "Bob", None, "Stone", bd, None),     # birthdate differs from t1
            (14, "v4", "Pat", None, "Day", bd, None),       # middle Some vs None
        ],
    )
    return t1, t2


def test_algo1_matches_across_diacritics(tables):
    t1, t2 = tables
    got = {(r.id_1, r.id_2) for r in match_algo1(t1, t2).collect()}
    assert got == {(1, 11), (2, 12), (4, 14)}


def test_algo2_middle_asymmetry(tables):
    t1, t2 = tables
    got = {(r.id_1, r.id_2) for r in match_algo2(t1, t2).collect()}
    # (2,12): middle Q == Q passes. (1,11): None == None passes.
    # (4,14): Some("X") vs None FAILS.
    assert got == {(1, 11), (2, 12)}


def test_algo1_confidence_and_case(tables):
    t1, t2 = tables
    rows = match_algo1(t1, t2).collect()
    assert all(r.confidence == 1.0 and r.match_case == "ALGO1" for r in rows)


def test_algo2_control_char_middle_does_not_match_missing(spark):
    """A corrupt middle name containing a control byte must NOT match a
    record with NO middle name — the old '\\x00' sentinel collided with
    exactly such data; the null-safe join cannot."""
    bd = date(1980, 5, 5)
    p1 = prepare_persons(spark.createDataFrame(
        [(1, "u", "Ann", "\x00", "Lee", bd, None)],
        "id long, uuid string, first_name string, middle_name string, "
        "last_name string, birthdate date, hh_id string",
    ))
    p2 = prepare_persons(spark.createDataFrame(
        [(2, "v", "Ann", None, "Lee", bd, None)],
        "id long, uuid string, first_name string, middle_name string, "
        "last_name string, birthdate date, hh_id string",
    ))
    assert match_algo2(p1, p2).count() == 0
    # and the plan is still a hash join (EqualNullSafe is an equi-key)
    plan = match_algo2(p1, p2)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
