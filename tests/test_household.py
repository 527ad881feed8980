"""Household aggregation golden scenario (FIXTURES.md §3 /
tests/option5_households_hhid.rs:52-88)."""

from __future__ import annotations

from name_matcher_spark.fixtures.households import make_household_scenario
from name_matcher_spark.operators.fuzzy_join import match_fuzzy
from name_matcher_spark.operators.household import (
    households_option5,
    households_option6,
)
from name_matcher_spark.operators.prepare import prepare_persons


def _run(spark):
    t1_pd, t2_pd, expected = make_household_scenario()
    t1 = spark.createDataFrame(t1_pd)
    t2 = spark.createDataFrame(t2_pd)
    p1 = prepare_persons(t1, include_middle=False)
    p2 = prepare_persons(t2, include_middle=False)
    pairs = match_fuzzy(p1, p2, include_middle=False)
    return t1, t2, pairs, expected


def test_option5_golden(spark):
    t1, _, pairs, expected = _run(spark)
    out = households_option5(pairs, t1, threshold=0.95).collect()
    got = {(r.uuid, r.hh_id) for r in out}
    assert got == expected
    # strict >50 on every emitted row, deterministic row_id 1..N in
    # (uuid, hh_id) order
    assert all(r.match_percentage > 50.0 for r in out)
    assert [r.row_id for r in out] == list(range(1, len(out) + 1))
    ordered = sorted(out, key=lambda r: (r.uuid, r.hh_id))
    assert [r.row_id for r in ordered] == list(range(1, len(out) + 1))


def test_option5_percentages(spark):
    t1, _, pairs, _ = _run(spark)
    out = {(r.uuid, r.hh_id): r.match_percentage for r in households_option5(pairs, t1).collect()}
    assert abs(out[("A-UUID", "100")] - 200 / 3) < 1e-4
    assert out[("B-UUID", "101")] == 100.0
    assert out[("D-UUID", "104")] == 100.0


def test_option6_golden(spark):
    _, t2, pairs, _ = _run(spark)
    out = households_option6(pairs, t2, threshold=0.95).collect()
    got = {(r.uuid, r.hh_id) for r in out}
    # Role-swapped: denominators are T2 household sizes and the tie
    # rule is across different T1 UUIDS per T2 person (mod.rs:92-93) —
    # T2's two Ivan rows are separate persons, each with a single uuid
    # candidate, so no tie fires: hh105 = {Ivan,Jon} both matched to
    # E-UUID (2/2), hh106 = {Ivan} (1/1). Every T2 household here is
    # fully matched -> all kept at 100%.
    assert got == {
        ("A-UUID", "100"),
        ("A-UUID", "102"),
        ("B-UUID", "101"),
        ("C-UUID", "103"),
        ("D-UUID", "104"),
        ("E-UUID", "105"),
        ("E-UUID", "106"),
    }
