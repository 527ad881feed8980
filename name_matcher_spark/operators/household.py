"""Household aggregation — Options 5/6 (reference src/matching/mod.rs:
264-426 and 431-560).

Option 5: person pairs (FuzzyNoMiddle, exact birthdate) filtered at the
household threshold; per T1 person keep the single best (uuid, hh)
assignment by confidence, DROPPING the person entirely when the top
confidence ties (f32 epsilon) across different T2 households
(mod.rs:369-387); count distinct matched members per (uuid, hh); match
percentage = members / T1-household-size * 100, kept iff strictly
> 50; deterministic (uuid, hh_id) sort. T2's household key falls back
to its row id when hh_id is null (mod.rs:375).

Option 6 is the role-swapped variant: best T1-household per T2 person,
denominator = T2 household size by hh_id (same id fallback).

Divergence (documented): the reference assigns row_id while iterating
an unordered HashMap and sorts afterwards (mod.rs:396-423), making the
row_id column order-random; this engine assigns row_id AFTER the total
sort so output is fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# f32::EPSILON — confidences are f32 in the reference (MatchPair.confidence).
F32_EPSILON = 1.1920929e-07


def _with_row_id(out: DataFrame) -> DataFrame:
    """Deterministic global row_id over (uuid, hh_id) order WITHOUT a
    single-task global window.

    `Window.orderBy` with no partitionBy funnels every row through one
    task — fine at thousands of households, a choke at crawl scale.
    Instead: repartitionByRange gives a total order across ascending
    partition ids, row_number ranks within each partition, and a tiny
    driver-side count map supplies the per-partition offsets (the map
    is O(partitions), never O(rows)).

    localCheckpoint (not persist) pins the EXACT partitioning the
    offsets were measured on: lineage is truncated, so an executor loss
    can never silently re-run the (sampled, nondeterministic) range
    partitioning and mismatch the offset map — it fails loudly instead.
    It also leaves no CacheManager entry behind (a persist here leaked
    one cache entry per call; checkpoint blocks are GC-reclaimed with
    the DataFrame).

    r06: the report subtree is checkpointed BEFORE repartitionByRange —
    the range partitioner SAMPLES its child, so unmaterialized it
    executed the entire upstream (match join + aggregations) twice
    (measured ~0.6 s of a 1.7 s option-5 wall at sf0.1). The
    materialized count also sizes the range-partition count from the
    DATA (~1M report rows per task, clamped by the session parallelism)
    instead of a flat defaultParallelism that made 32 near-empty
    partitions out of hundreds of rows."""
    out = out.localCheckpoint(eager=True)
    n_rows = out.count()  # metadata-cheap: already materialized
    n_parts = max(
        1,
        min(
            out.sparkSession.sparkContext.defaultParallelism,
            -(-n_rows // 1_000_000),
        ),
    )
    ranged = (
        out.repartitionByRange(n_parts, "uuid", "hh_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = (
        F.coalesce(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
                F.col("_pid")
            ],
            F.lit(0),
        )
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_pid").orderBy("uuid", "hh_id")
    return ranged.withColumn(
        "row_id", (F.row_number().over(w) + off_expr).cast("int")
    ).select("row_id", "uuid", "hh_id", "match_percentage")


def _best_assignment(
    pairs: DataFrame, person_col: str, group_col: str, cand_col: str
) -> DataFrame:
    """Per person: the single best candidate household, ties-at-top
    across different households -> person dropped."""
    conf32 = F.col("confidence").cast("float")
    w = Window.partitionBy(person_col)
    with_best = pairs.withColumn("_best", F.max(conf32).over(w)).filter(
        (F.col("_best") - conf32) < F32_EPSILON
    )
    per_person = with_best.groupBy(person_col).agg(
        F.first(group_col).alias(group_col),
        F.countDistinct(cand_col).alias("_n_hh"),
        F.first(cand_col).alias(cand_col),
    )
    return per_person.filter(F.col("_n_hh") == 1).drop("_n_hh")


def _household_candidates(pairs: DataFrame, threshold: float) -> DataFrame:
    """Shared candidate filter for both household options: confidence
    threshold, a T1 household key (uuid), and the T2 household key with
    per-person fallback. One definition so the threshold / fallback
    semantics cannot drift between options 5 and 6."""
    return (
        pairs.filter(F.col("confidence") >= threshold)
        .filter(F.col("uuid_1").isNotNull())
        .withColumn(
            "hh_key", F.coalesce(F.col("hh_id_2"), F.col("id_2").cast("string"))
        )
    )


def _household_report(
    members: DataFrame, totals: DataFrame, join_cond
) -> DataFrame:
    """Shared tail: percentage vs household total, the >50% rule, the
    report projection, and deterministic row ids."""
    out = (
        members.join(totals, join_cond, "inner")
        .withColumn("match_percentage", F.col("members") / F.col("total") * 100.0)
        .filter(F.col("match_percentage") > 50.0)
        .select(
            F.col("uuid_1").alias("uuid"),
            F.col("hh_key").alias("hh_id"),
            F.col("match_percentage"),
        )
    )
    return _with_row_id(out)


def households_option5(
    pairs: DataFrame, t1: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """pairs: output of match_fuzzy(include_middle=False) between T1
    (uuid = household key) and T2 (hh_id); t1: the FULL T1 table (for
    household totals). Returns (row_id, uuid, hh_id, match_percentage).
    """
    cand = _household_candidates(pairs, threshold)
    assigned = _best_assignment(cand, "id_1", "uuid_1", "hh_key")
    members = assigned.groupBy("uuid_1", "hh_key").agg(
        F.countDistinct("id_1").alias("members")
    )
    totals = (
        t1.filter(F.col("uuid").isNotNull())
        .groupBy("uuid")
        .agg(F.count("*").alias("total"))
    )
    return _household_report(
        members, totals, members["uuid_1"] == totals["uuid"]
    )


def households_option6(
    pairs: DataFrame, t2: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Role-swapped: denominator is the T2 household size (hh_id with
    id fallback); best T1 uuid per T2 person, same tie-drop rule."""
    cand = _household_candidates(pairs, threshold)
    assigned = _best_assignment(cand, "id_2", "hh_key", "uuid_1")
    members = assigned.groupBy("uuid_1", "hh_key").agg(
        F.countDistinct("id_2").alias("members")
    )
    totals = t2.withColumn(
        "hh_key_t", F.coalesce(F.col("hh_id"), F.col("id").cast("string"))
    ).groupBy("hh_key_t").agg(F.count("*").alias("total"))
    return _household_report(
        members, totals, members["hh_key"] == totals["hh_key_t"]
    )
