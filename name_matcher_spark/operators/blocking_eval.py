"""Blocking-key quality evaluation — recall and reduction metrics for
a blocking strategy against a labeled truth pair set.

The north rule frames parity "on labeled pairs at the same blocking
key"; this operator makes that measurable for ANY strategy: how many
candidate pairs does the blocking generate (cost), and what fraction
of the truth pairs does it retain (recall)? The reference has no such
tool (its blocking is fixed, mod.rs:1045); at crawl scale choosing a
blocking key is a measured decision, so the engine ships the
measurement.

All metrics are single-row aggregates per strategy (lazy, no collect);
candidate generation reuses the engine's own key columns so the
numbers describe exactly what the matcher would see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_prefix_key(prefix: str) -> F.Column:
    """Composite normalized-token-prefix key (north-star blocking
    family): birth year + first 2 chars of the normalized last name +
    first 1 of the normalized first name. Coarser than initials+soundex
    (more recall, more candidates) — exactly the trade blocking_quality
    exists to measure.

    NULL birth_year nulls the WHOLE key (F.concat null-propagates, vs
    concat_ws which silently skips NULLs): a record with no birthdate
    must not block-match every other dateless record on 'll|f' alone.
    This mirrors the DuckDB oracle, where the equi-join on
    year(birthdate) drops NULLs."""
    return F.concat(
        F.col(f"{prefix}birth_year").cast("string"),
        F.lit("|"),
        F.substring(F.coalesce(F.col(f"{prefix}norm_last"), F.lit("")), 1, 2),
        F.lit("|"),
        F.substring(F.coalesce(F.col(f"{prefix}norm_first"), F.lit("")), 1, 1),
    )


# Each side is projected to side-unique column names BEFORE the join:
# dataset-id disambiguation of df["col"] refs breaks down on a true
# self-join (p1 is p2 — Spark sees the two key expressions as the same
# column tree, warns "trivially true predicate", then fails the
# ambiguity check), and evaluating a strategy against the SAME table
# on both sides is a legitimate dedup use of this tool.
_KEY_COLS = ["birthdate", "birth_year", "first_initial", "last_initial", "block_key"]


def _candidates_for(p1: DataFrame, p2: DataFrame, strategy: str) -> DataFrame:
    extra = ["norm_first", "norm_last"] if strategy == "token_prefix" else []
    l = p1.select(
        F.col("id").alias("id_1"),
        *[F.col(c).alias(f"l_{c}") for c in _KEY_COLS + extra],
    )
    r = p2.select(
        F.col("id").alias("id_2"),
        *[F.col(c).alias(f"r_{c}") for c in _KEY_COLS + extra],
    )
    if strategy == "birthdate":
        cond = [F.col("l_birthdate") == F.col("r_birthdate")]
    elif strategy == "year_initials":
        cond = [
            F.col("l_birth_year") == F.col("r_birth_year"),
            F.col("l_first_initial") == F.col("r_first_initial"),
            F.col("l_last_initial") == F.col("r_last_initial"),
        ]
    elif strategy == "bkey_exact":
        cond = [F.col("l_block_key") == F.col("r_block_key")]
    elif strategy == "token_prefix":
        cond = [_token_prefix_key("l_") == _token_prefix_key("r_")]
    else:
        raise ValueError(f"unknown blocking strategy: {strategy}")
    return l.join(r, cond).select("id_1", "id_2")


def blocking_quality(
    p1: DataFrame,
    p2: DataFrame,
    truth: DataFrame,
    strategies: tuple = ("birthdate", "year_initials", "bkey_exact"),
) -> DataFrame:
    """One row per strategy:
    (strategy, n_candidates, n_truth, n_covered, recall, reduction).

    ``truth`` must carry (id_1, id_2). recall = covered truth pairs /
    truth pairs; reduction = 1 - candidates / (|p1| * |p2|) — the
    fraction of the cross product the blocking avoids scoring.
    """
    t = truth.select("id_1", "id_2")
    n1 = p1.select(F.count("*").cast("double").alias("n1"))
    n2 = p2.select(F.count("*").cast("double").alias("n2"))
    per_strategy = []
    for s in strategies:
        cands = _candidates_for(p1, p2, s)
        stats = cands.agg(
            F.count("*").cast("long").alias("n_candidates")
        ).crossJoin(
            t.join(cands, ["id_1", "id_2"], "left_semi").agg(
                F.count("*").cast("long").alias("n_covered")
            )
        ).crossJoin(t.agg(F.count("*").cast("long").alias("n_truth")))
        per_strategy.append(
            stats.select(
                F.lit(s).alias("strategy"),
                "n_candidates",
                "n_truth",
                "n_covered",
                F.round(
                    F.when(F.col("n_truth") > 0,
                           F.col("n_covered") / F.col("n_truth"))
                    .otherwise(F.lit(1.0)), 6
                ).alias("recall"),
            )
        )
    out = per_strategy[0]
    for df in per_strategy[1:]:
        out = out.unionByName(df)
    return out.crossJoin(n1).crossJoin(n2).select(
        "strategy", "n_candidates", "n_truth", "n_covered", "recall",
        F.round(
            # guard like recall's n_truth guard: an empty side makes
            # the cross-product 0 (NaN, or DIVIDE_BY_ZERO under ANSI);
            # with no possible pairs the reduction is definitionally 1
            F.when(
                F.col("n1") * F.col("n2") > 0,
                1.0 - F.col("n_candidates") / (F.col("n1") * F.col("n2")),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("reduction"),
    )
