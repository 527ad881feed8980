"""Deterministic Algorithms 1/2 as equi-joins.

Reference semantics (src/matching/mod.rs:873-907):
  Algo 1 — match iff norm(first)==, norm(last)==, birthdate== (all
           fields present on both sides; a missing field disqualifies).
  Algo 2 — Algo 1 plus middle-name equality where (None, None) PASSES
           and (Some, None) FAILS.

In Spark these are inner equi-joins on the normalized key columns.
SQL null semantics (null != null) implement the "missing field
disqualifies" rule for first/last/birthdate for free; the Some/None
asymmetry of the middle name is a NULL-SAFE equality (eqNullSafe /
IS NOT DISTINCT FROM): two nulls compare equal, null never equals a
real value. (A sentinel string would collide with a middle name that
CONTAINS the sentinel — normalize_text passes control chars through —
and silently upgrade a Some/None miss into a confidence-1.0 match.)

The reference hash-joins on a composite string key "last\\x1Ffirst\\x1F
{bd}" (mod.rs:2865-2895) and then re-verifies each candidate — in
Spark the multi-column equi-join IS that hash join, verification
included; AQE picks broadcast vs shuffle by observed size (replacing
the reference's count-both-tables build-side heuristic,
mod.rs:3400-3403).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _pair_projection(joined: DataFrame, match_case: str) -> DataFrame:
    return joined.select(
        F.col("l_id").alias("id_1"),
        F.col("l_uuid").alias("uuid_1"),
        F.col("l_first_name").alias("first_name_1"),
        F.col("l_middle_name").alias("middle_name_1"),
        F.col("l_last_name").alias("last_name_1"),
        F.col("l_birthdate").alias("birthdate"),
        F.col("r_id").alias("id_2"),
        F.col("r_uuid").alias("uuid_2"),
        F.col("r_first_name").alias("first_name_2"),
        F.col("r_middle_name").alias("middle_name_2"),
        F.col("r_last_name").alias("last_name_2"),
        F.lit(1.0).alias("confidence"),
        F.lit(match_case).alias("match_case"),
    )


def match_algo1(p1: DataFrame, p2: DataFrame) -> DataFrame:
    """Inner equi-join on (norm_first, norm_last, birthdate).

    Inputs are ``prepare_persons`` outputs. Output is the flat pair
    schema (ids + original fields + confidence 1.0).
    """
    left = p1.select(
        F.col("id").alias("l_id"),
        F.col("uuid").alias("l_uuid"),
        F.col("first_name").alias("l_first_name"),
        F.col("middle_name").alias("l_middle_name"),
        F.col("last_name").alias("l_last_name"),
        F.col("birthdate").alias("l_birthdate"),
        F.col("norm_first").alias("k_first"),
        F.col("norm_last").alias("k_last"),
        F.col("birthdate").alias("k_bd"),
    )
    right = p2.select(
        F.col("id").alias("r_id"),
        F.col("uuid").alias("r_uuid"),
        F.col("first_name").alias("r_first_name"),
        F.col("middle_name").alias("r_middle_name"),
        F.col("last_name").alias("r_last_name"),
        F.col("norm_first").alias("k_first"),
        F.col("norm_last").alias("k_last"),
        F.col("birthdate").alias("k_bd"),
    )
    joined = left.join(right, on=["k_first", "k_last", "k_bd"], how="inner")
    return _pair_projection(joined, "ALGO1")


def match_algo2(p1: DataFrame, p2: DataFrame) -> DataFrame:
    """Algo 1 plus NULL-SAFE middle-name equality ((None, None) passes,
    (Some, None) fails). EqualNullSafe is an equi-join key to Catalyst,
    so this still plans as a hash join, never a nested loop."""
    left = p1.select(
        F.col("id").alias("l_id"),
        F.col("uuid").alias("l_uuid"),
        F.col("first_name").alias("l_first_name"),
        F.col("middle_name").alias("l_middle_name"),
        F.col("last_name").alias("l_last_name"),
        F.col("birthdate").alias("l_birthdate"),
        F.col("norm_first").alias("l_kf"),
        F.col("norm_last").alias("l_kl"),
        F.col("birthdate").alias("l_kbd"),
        F.col("norm_middle").alias("l_km"),
    )
    right = p2.select(
        F.col("id").alias("r_id"),
        F.col("uuid").alias("r_uuid"),
        F.col("first_name").alias("r_first_name"),
        F.col("middle_name").alias("r_middle_name"),
        F.col("last_name").alias("r_last_name"),
        F.col("norm_first").alias("r_kf"),
        F.col("norm_last").alias("r_kl"),
        F.col("birthdate").alias("r_kbd"),
        F.col("norm_middle").alias("r_km"),
    )
    joined = left.join(
        right,
        (F.col("l_kf") == F.col("r_kf"))
        & (F.col("l_kl") == F.col("r_kl"))
        & (F.col("l_kbd") == F.col("r_kbd"))
        & F.col("l_km").eqNullSafe(F.col("r_km")),
        "inner",
    )
    return _pair_projection(joined, "ALGO2")
