"""Algorithm 7 (deprecated in the reference, shipped for surface
completeness): ±1-year banded blocking + composite 0.7·name + 0.3·date
scoring (mod.rs:1116-1221)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from name_matcher_spark.operators.fuzzy_join import candidates_algo7, match_algo7
from name_matcher_spark.operators.prepare import prepare_persons


def _persons(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["id", "first_name", "middle_name", "last_name", "birthdate"]
    )
    pdf["uuid"] = pdf["id"].map(lambda i: f"u{i}")
    pdf["hh_id"] = None
    return prepare_persons(spark.createDataFrame(pdf), include_middle=False)


def test_candidates_algo7_branches(spark):
    d = dt.date
    p1 = _persons(spark, [
        (1, "John", None, "Smith", d(1980, 5, 1)),     # exact + ±1yr
        (2, "Zara", None, "Quinn", d(1990, 1, 1)),     # only '?' fallback
        (3, "Mike", None, "Brown", d(1970, 2, 2)),     # only coarse sx
        (4, "Lone", None, "Nobody", d(1950, 3, 3)),    # no match at all
    ])
    p2 = _persons(spark, [
        (10, "John", None, "Smith", d(1980, 7, 7)),    # same year block
        (11, "Jon", None, "Smith", d(1981, 5, 1)),     # +1 year block
        (12, "123", None, "Quinn", d(1990, 9, 9)),     # no-alpha first -> '?'
        (13, "Mike", None, "Bruin", d(1970, 2, 2)),    # B650 vs Brown B650? see below
    ])
    got = {(r.l_id, r.r_id) for r in candidates_algo7(p1, p2).collect()}
    # probe 1: exact BKey match to 10, and banded ±1-year match to 11.
    assert (1, 10) in got and (1, 11) in got
    # probe 2: exact empty (no Quinn born 1990 w/ alpha Z first) -> '?'
    assert (2, 12) in got
    # probe 4 matches nothing.
    assert not any(l == 4 for l, _ in got)


def test_candidates_algo7_coarse_branch(spark):
    d = dt.date
    # Probe soundex S530 -> coarse S500; build row whose FULL soundex is
    # S500 ("Shaw": S, h/a/w ignored -> S000? craft instead with 2-digit
    # code): "Sno" -> S500. Only the coarse branch can pair them.
    p1 = _persons(spark, [(1, "Ann", None, "Sand", d(1960, 1, 1))])   # S530
    p2 = _persons(spark, [(20, "Amy", None, "Sno", d(1960, 2, 2))])   # S500
    got = {(r.l_id, r.r_id) for r in candidates_algo7(p1, p2).collect()}
    assert got == {(1, 20)}


def test_match_algo7_composite_score(spark):
    """Every emitted pair's score must equal 0.7·(scalar-mirror name
    score) + 0.3·(date ladder) recomputed in pure Python."""
    from name_matcher_spark.fixtures.persons import make_dirty
    from name_matcher_spark.functions.fuzzy import fuzzy_compare_py
    from name_matcher_spark.functions.normalize import strip_diacritics_lower_trim

    a_pd, b_pd, _ = make_dirty(300, seed=13)
    # Seed one guaranteed ±1-year twin so the banded branch is exercised
    # (the fixture's error ops perturb names/dates but rarely the year).
    a_pd = pd.concat([a_pd, pd.DataFrame([{
        "id": 900001, "first_name": "Helena", "middle_name": None,
        "last_name": "Vargas", "birthdate": dt.date(1955, 4, 9),
        "uuid": "u900001", "hh_id": None,
    }])], ignore_index=True)
    b_pd = pd.concat([b_pd, pd.DataFrame([{
        "id": 900002, "first_name": "Helena", "middle_name": None,
        "last_name": "Vargas", "birthdate": dt.date(1956, 4, 9),
        "uuid": "u900002", "hh_id": None,
    }])], ignore_index=True)
    pa = _persons_from_fixture(spark, a_pd)
    pb = _persons_from_fixture(spark, b_pd)
    rows = match_algo7(pa, pb).collect()
    assert rows, "expected some algo7 pairs on the dirty fixture"

    def bd_py(a, b):
        if a == b:
            return 100.0
        if abs((a - b).days) == 1:
            return 90.0
        if a.year == b.year:
            try:
                sw_a = dt.date(a.year, a.day, a.month)
            except ValueError:
                sw_a = None
            try:
                sw_b = dt.date(b.year, b.day, b.month)
            except ValueError:
                sw_b = None
            if (sw_a is not None and sw_a == b) or (sw_b is not None and sw_b == a):
                return 85.0
            if a.month == b.month:
                return 70.0
            return 50.0
        if abs(a.year - b.year) == 1:
            return 40.0
        return 0.0

    n_pm_year = 0
    for r in rows:
        f1 = strip_diacritics_lower_trim(r.first_name_1)
        l1 = strip_diacritics_lower_trim(r.last_name_1)
        f2 = strip_diacritics_lower_trim(r.first_name_2)
        l2 = strip_diacritics_lower_trim(r.last_name_2)
        res = fuzzy_compare_py(f1, None, l1, f2, None, l2, False)
        assert res is not None, (r.id_1, r.id_2)
        bd2 = next(
            x.birthdate for x in b_pd.itertuples() if x.id == r.id_2
        )
        expected = 0.7 * res[0] + 0.3 * bd_py(r.birthdate, bd2)
        assert r.score == pytest.approx(expected), (r.id_1, r.id_2)
        assert r.match_case.startswith("fuzzy7,")
        if r.birthdate.year != bd2.year:
            n_pm_year += 1
    # the banded range join actually contributes cross-year pairs
    assert n_pm_year > 0


def _persons_from_fixture(spark, pdf):
    return prepare_persons(spark.createDataFrame(pdf), include_middle=False)
