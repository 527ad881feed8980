"""Export sinks, partition strategies, Algo-7 date ladder."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from name_matcher_spark.functions.dates import birthdate_similarity_pct
from name_matcher_spark.operators.partition_strategies import (
    birthyear5_key,
    last_initial_key,
    write_partitioned,
)
from name_matcher_spark.sources.export import (
    algo_overlap_stats,
    clamp_threshold,
    export_pairs_csv,
    run_summary,
)


def test_clamp_threshold():
    assert clamp_threshold(0.3) == 0.6
    assert clamp_threshold(1.5) == 1.0
    assert clamp_threshold(0.8) == 0.8


def test_export_pairs_csv_threshold(spark, tmp_path):
    pairs = spark.createDataFrame(
        [(1, 2, 0.99, "CASE 1"), (3, 4, 0.90, "CASE 2")],
        "id_1 long, id_2 long, confidence double, match_case string",
    )
    out = str(tmp_path / "pairs")
    export_pairs_csv(pairs, out, fuzzy_min_confidence=0.95)
    got = spark.read.option("header", True).csv(out)
    assert got.count() == 1
    assert got.collect()[0]["id_1"] == "1"


def test_run_summary(spark):
    t1 = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    t2 = spark.createDataFrame([(9,), (8,)], "id long")
    pairs = spark.createDataFrame(
        [(1, 9, 1.0, "DIRECT MATCH"), (2, 9, 0.96, "CASE 1"), (3, 8, 0.5, "CASE 2")],
        "id_1 long, id_2 long, confidence double, match_case string",
    )
    m = {r.metric: r.value for r in run_summary(t1, t2, pairs).collect()}
    assert m["matched_pairs"] == 2
    assert m["matched_persons_t1"] == 2
    assert m["matched_persons_t2"] == 1
    assert m["unmatched_t2"] == 1
    assert m["case_direct_match"] == 1


def test_algo_overlap_stats(spark):
    a = spark.createDataFrame([(1, 2), (3, 4)], "id_1 long, id_2 long")
    b = spark.createDataFrame([(1, 2), (5, 6)], "id_1 long, id_2 long")
    got = {r.bucket: r.n_pairs for r in algo_overlap_stats(a, b).collect()}
    assert got == {"both": 1, "only_first": 1, "only_second": 1}


def test_partition_keys(spark):
    df = spark.createDataFrame(
        [("Smith", date(1987, 3, 1)), ("  özil", date(1950, 1, 1)), (None, None)],
        "last_name string, birthdate date",
    )
    got = df.select(
        last_initial_key(F.col("last_name")).alias("li"),
        birthyear5_key(F.col("birthdate")).alias("by"),
    ).collect()
    assert [r.li for r in got] == ["S", "other", "other"]
    assert [r.by for r in got] == ["1985_1989", "1950_1954", "unknown"]


def test_write_partitioned_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "Smith", date(1987, 3, 1)), (2, "Brown", date(1988, 1, 1))],
        "id long, last_name string, birthdate date",
    )
    out = str(tmp_path / "parts")
    write_partitioned(df, out, "last_initial")
    pruned = spark.read.parquet(out).filter(F.col("part_key") == "S")
    assert pruned.count() == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part_key" in plan


@pytest.mark.parametrize(
    ("a", "b", "pct"),
    [
        (date(1990, 5, 10), date(1990, 5, 10), 100.0),
        (date(1990, 5, 10), date(1990, 5, 11), 90.0),
        (date(1990, 5, 10), date(1990, 10, 5), 85.0),  # day/month swap
        (date(1990, 5, 10), date(1990, 5, 20), 70.0),
        (date(1990, 5, 10), date(1990, 7, 1), 50.0),
        (date(1990, 5, 10), date(1991, 8, 2), 40.0),
        (date(1990, 5, 10), date(1995, 5, 10), 0.0),
        # invalid swap (day 31 cannot be a month) falls through to 70/50
        (date(1990, 1, 31), date(1990, 1, 5), 70.0),
    ],
)
def test_birthdate_similarity_ladder(spark, a, b, pct):
    df = spark.createDataFrame([(a, b)], "a date, b date")
    got = df.select(birthdate_similarity_pct(F.col("a"), F.col("b"))).collect()[0][0]
    assert got == pct


def test_salted_count_matches_plain(spark):
    """Skew-safe two-phase count equals the plain groupBy count, and
    the salt actually spreads the hot key across partitions."""
    import pyspark.sql.functions as F

    from name_matcher_spark.operators.partition_strategies import (
        salted_count,
        salted_repartition,
    )

    # 10k rows of one hot key + a long tail
    hot = spark.range(10_000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(500).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("payload"),
    )
    df = hot.unionByName(tail)
    got = {r["k"]: r["count"] for r in salted_count(df, "k", 16).collect()}
    want = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want

    # the hot key spreads over many salt buckets (at toy scale AQE
    # coalesces the shuffle itself, so assert the semantic property:
    # distinct (k, salt) shuffle keys, which at real volume map to
    # distinct tasks)
    salts = (
        salted_repartition(df, "k", 16)
        .filter(F.col("k") == "HOT")
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 16

    # determinism: same input -> same salt assignment
    a = salted_repartition(df, "k", 16).select("k", "payload", "_salt")
    b = salted_repartition(df, "k", 16).select("k", "payload", "_salt")
    assert a.exceptAll(b).count() == 0


def test_salted_repartition_discriminator_spreads_duplicates(spark):
    """Byte-identical duplicate rows hash to ONE content salt; a
    row-unique discriminator column must spread them."""
    from name_matcher_spark.operators.partition_strategies import (
        salted_repartition,
    )

    df = spark.range(256).select(
        F.lit("hot").alias("k"), F.lit("same").alias("payload"),
        F.col("id").alias("rowid"),
    )
    content = salted_repartition(df.drop("rowid"), "k", 16)
    assert content.select("_salt").distinct().count() == 1
    spread = salted_repartition(df, "k", 16, discriminator_cols=["rowid"])
    assert spread.select("_salt").distinct().count() > 8
