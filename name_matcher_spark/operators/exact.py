"""Deterministic Algorithms 1/2 as equi-joins.

Reference semantics (src/matching/mod.rs:873-907):
  Algo 1 — match iff norm(first)==, norm(last)==, birthdate== (all
           fields present on both sides; a missing field disqualifies).
  Algo 2 — Algo 1 plus middle-name equality where (None, None) PASSES
           and (Some, None) FAILS.

In Spark these are inner equi-joins on the normalized key columns.
SQL null semantics (null != null) implement the "missing field
disqualifies" rule for first/last/birthdate for free; the Some/None
asymmetry of the middle name needs a null sentinel so that two nulls
compare equal but null never equals a real value.

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

# Sentinel for "middle name absent" — \x00 cannot appear in normalized
# names, so (None, None) join-matches and (Some, None) never does.
MIDDLE_NULL_SENTINEL = "\x00"

PAIR_COLUMNS = [
    "id_1", "uuid_1", "first_name_1", "middle_name_1", "last_name_1",
    "birthdate", "id_2", "uuid_2", "first_name_2", "middle_name_2",
    "last_name_2", "confidence", "match_case",
]


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
    """Algo 1 plus middle-name key with null-sentinel Some/None semantics."""
    mid_key = F.coalesce(F.col("norm_middle"), F.lit(MIDDLE_NULL_SENTINEL))
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
        mid_key.alias("k_mid"),
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
        mid_key.alias("k_mid"),
    )
    joined = left.join(right, on=["k_first", "k_last", "k_bd", "k_mid"], how="inner")
    return _pair_projection(joined, "ALGO2")
