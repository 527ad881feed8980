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


def test_row_id_fails_loudly_on_checkpoint_block_loss(spark):
    """Worker-loss resilience for the row_id path: the offset map is
    measured on a localCheckpoint-pinned partitioning. If those
    checkpoint blocks vanish (executor loss), Spark must fail LOUDLY —
    lineage is truncated, so a silent re-run of the nondeterministic
    range partitioning (which could mismatch the offset map and corrupt
    row_ids) is impossible by construction. Simulates the loss by
    dropping the checkpointed RDD's blocks from the block manager."""
    import pytest

    from name_matcher_spark.operators.household import _with_row_id

    df = spark.createDataFrame(
        [(f"U{i}", f"H{i % 7}", 80.0 + i) for i in range(100)],
        "uuid string, hh_id string, match_percentage double",
    )
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    res = _with_row_id(df)
    assert res.count() == 100  # healthy path first

    new_ids = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    assert new_ids, "localCheckpoint should register a pinned RDD"
    bmm = jsc.sc().env().blockManager().master()
    for rid in new_ids:
        bmm.removeRdd(int(rid), True)  # the simulated executor loss

    with pytest.raises(Exception) as ei:
        res.count()
    msg = str(ei.value)
    assert "heckpoint block" in msg or "rdd_" in msg or "block" in msg.lower()
