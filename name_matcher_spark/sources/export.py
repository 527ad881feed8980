"""Export sinks — the reference's CSV/summary surface (SURVEY §2.1).

* ``export_pairs_csv``     — match pairs with the fuzzy threshold
  applied AT WRITE time (csv_export.rs:80-83; default 0.95, clamped to
  [0.6, 1.0] like main.rs:281-291).
* ``export_households_csv``— the 7-column household aggregate layout
  (csv_export.rs:114-136).
* ``run_summary``          — the run-level KPI key/value report
  (csv_export.rs:155-227) as a DataFrame: totals, match counts,
  unmatched rates, per-case counts. Emitted as a metrics table rather
  than an XLSX sheet (the reference's XLSX artifact is a reporting
  concern, out of engine scope — SURVEY §2.1).

Parquet remains the primary interchange format (stage checkpoints);
CSV here is the reference-compatible export path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clamp_threshold(value: float, lo: float = 0.6, hi: float = 1.0) -> float:
    """Reference env-threshold clamping (main.rs:286-291)."""
    return max(lo, min(hi, value))


def export_pairs_csv(
    pairs: DataFrame, path: str, fuzzy_min_confidence: float = 0.95
) -> None:
    thr = clamp_threshold(fuzzy_min_confidence)
    (
        pairs.filter(F.col("confidence") >= thr)
        .orderBy("id_1", "id_2")
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def export_households_csv(households: DataFrame, path: str) -> None:
    """7-column layout: row_id, uuid, hh_id, match_percentage + the
    three optional passthrough columns (null here, as in the reference
    when the source lacks them — mod.rs:412-414)."""
    (
        households.select(
            "row_id",
            "uuid",
            "hh_id",
            "match_percentage",
            F.lit(None).cast("string").alias("region_code"),
            F.lit(None).cast("double").alias("poor_hat_0"),
            F.lit(None).cast("double").alias("poor_hat_10"),
        )
        .orderBy("row_id")
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def run_summary(
    t1: DataFrame,
    t2: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.95,
) -> DataFrame:
    """KPI table (metric, value) mirroring the reference summary:
    table totals, matched-pair count, distinct matched persons per
    side, unmatched counts/rates, per-case breakdown.

    Fully distributed and LAZY — no driver-side collect anywhere (the
    round-1 version triggered five full upstream jobs). The scalar
    KPIs are one aggregate per input crossed into a single row, melted
    to (metric, value) via stack; the per-case breakdown unions in."""
    kept = pairs.filter(F.col("confidence") >= threshold)
    stats = kept.agg(
        F.count("*").cast("double").alias("n_pairs"),
        F.countDistinct("id_1").cast("double").alias("m1"),
        F.countDistinct("id_2").cast("double").alias("m2"),
    )
    n1 = t1.agg(F.count("*").cast("double").alias("n1"))
    n2 = t2.agg(F.count("*").cast("double").alias("n2"))
    one = n1.crossJoin(n2).crossJoin(stats)
    scalar = one.select(
        F.expr(
            "stack(9,"
            " 'table1_rows', n1,"
            " 'table2_rows', n2,"
            " 'matched_pairs', n_pairs,"
            " 'matched_persons_t1', m1,"
            " 'matched_persons_t2', m2,"
            " 'unmatched_t1', n1 - m1,"
            " 'unmatched_t2', n2 - m2,"
            " 'unmatched_rate_t1', CASE WHEN n1 > 0 THEN round(1.0 - m1 / n1, 6) ELSE 0.0 END,"
            " 'unmatched_rate_t2', CASE WHEN n2 > 0 THEN round(1.0 - m2 / n2, 6) ELSE 0.0 END"
            ") AS (metric, value)"
        )
    )
    per_case = kept.groupBy("match_case").count().select(
        F.concat(
            F.lit("case_"), F.lower(F.regexp_replace("match_case", " ", "_"))
        ).alias("metric"),
        F.col("count").cast("double").alias("value"),
    )
    return scalar.unionByName(per_case)


def algo_overlap_stats(pairs_a: DataFrame, pairs_b: DataFrame) -> DataFrame:
    """A1∩A2-style overlap: pairs in both / only-first / only-second
    (main.rs:599-605, the XLSX summary's set intersection).

    One lazy plan — full-outer join on the distinct pair keys with
    presence flags, a single aggregate, stack-melted to rows (same
    discipline as run_summary). The old intersect/exceptAll form
    triggered ~5 driver actions, each re-running both upstream pair
    pipelines unless the caller had checkpointed."""
    ka = pairs_a.select("id_1", "id_2").distinct().withColumn("in_a", F.lit(1))
    kb = pairs_b.select("id_1", "id_2").distinct().withColumn("in_b", F.lit(1))
    flags = ka.join(kb, ["id_1", "id_2"], "full_outer")
    agg = flags.agg(
        F.coalesce(
            F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")),
            F.lit(0),
        ).alias("both"),
        F.coalesce(
            F.sum((F.col("in_b").isNull()).cast("long")), F.lit(0)
        ).alias("only_first"),
        F.coalesce(
            F.sum((F.col("in_a").isNull()).cast("long")), F.lit(0)
        ).alias("only_second"),
    )
    return agg.select(
        F.expr(
            "stack(3, 'both', both, 'only_first', only_first,"
            " 'only_second', only_second) AS (bucket, n_pairs)"
        )
    )
