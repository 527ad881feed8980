"""Blocked fuzzy join — Algorithms 3/4 candidate generation + scoring.

Two blocking strategies, both from the reference:

* ``birthdate`` — candidates are all pairs sharing an exact birthdate
  (the in-memory nested loop's birthdate gate, mod.rs:972-1008, and the
  partitioned-streaming by_date blocking, mod.rs:3945-3951). Exact
  recall: the ladder requires birthdate equality anyway, so this
  blocking loses nothing.
* ``bkey_cascade`` — the blocked-CPU path (mod.rs:1033-1113): block on
  BKey(birth_year, first_initial, last_initial, soundex4(last)) with a
  per-probe-row fallback cascade tried only when the previous block is
  EMPTY:
     1. exact key
     2. (year, '?', last_initial, soundex)   — build rows with no
        alphabetic first name
     3. (year, first_initial, last_initial, soundex with digits 3-4
        zeroed) — build rows with a short/coarse soundex
  In Spark the cascade is a union of three prioritized join branches,
  each restricted (left_anti on probe ids) to probes the earlier
  branches produced NO candidates for. Candidate-emptiness is judged
  BEFORE the birthdate filter, exactly like the reference (the cascade
  checks `set.is_empty()` before `compare_persons` runs).

Skew: hot blocks (common birthdate + initials) are the scale risk.
AQE skew-join splitting handles the shuffle; `max_block_rows` further
refines any build-side block bigger than the cap by extending the key
with soundex4(first_name) on BOTH sides — deterministic, recall-safe
for names whose first token survives coarse phonetics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.fuzzy import score_candidate_pairs
from .prepare import soundex4_udf

_SIDE_COLS = [
    "id", "uuid", "first_name", "middle_name", "last_name", "birthdate",
    "hh_id", "simple_first", "simple_middle", "simple_last", "full",
    "dmeta", "birth_year", "first_initial", "last_initial", "sx_last",
    "block_key",
]


def _side(df: DataFrame, prefix: str) -> DataFrame:
    cols = [c for c in _SIDE_COLS if c in df.columns]
    return df.select(*[F.col(c).alias(f"{prefix}{c}") for c in cols])


def _pair_output(scored: DataFrame) -> DataFrame:
    return scored.select(
        F.col("l_id").alias("id_1"),
        F.col("l_uuid").alias("uuid_1"),
        F.col("l_first_name").alias("first_name_1"),
        F.col("l_middle_name").alias("middle_name_1"),
        F.col("l_last_name").alias("last_name_1"),
        F.col("l_birthdate").alias("birthdate"),
        F.col("r_id").alias("id_2"),
        F.col("r_uuid").alias("uuid_2"),
        *([F.col("r_hh_id").alias("hh_id_2")] if "r_hh_id" in scored.columns else []),
        F.col("r_first_name").alias("first_name_2"),
        F.col("r_middle_name").alias("middle_name_2"),
        F.col("r_last_name").alias("last_name_2"),
        F.col("score"),
        F.col("confidence"),
        F.col("match_case"),
    )


def candidates_birthdate(p1: DataFrame, p2: DataFrame) -> DataFrame:
    """Equi-join on exact birthdate (null birthdates drop out)."""
    left = _side(p1, "l_").withColumnRenamed("l_birthdate", "k_bd")
    right = _side(p2, "r_").withColumnRenamed("r_birthdate", "k_bd")
    joined = left.join(right, on="k_bd", how="inner")
    return (
        joined.withColumn("l_birthdate", F.col("k_bd"))
        .withColumn("r_birthdate", F.col("k_bd"))
        .drop("k_bd")
    )


def candidates_bkey_cascade(
    p1: DataFrame, p2: DataFrame, max_block_rows: int | None = None
) -> DataFrame:
    """Union of the three prioritized block-join branches.

    Each branch only sees probe rows for which every higher-priority
    branch produced zero candidates (left_anti on l_id), mirroring the
    sequential `if set.is_empty()` cascade of mod.rs:1086-1095.
    """
    left = _side(p1, "l_")
    right = _side(p2, "r_")
    if max_block_rows:
        left, right = _refine_hot_blocks(left, right, max_block_rows)

    # Branch 1: exact BKey.
    b1 = left.join(
        right,
        on=(F.col("l_block_key") == F.col("r_block_key")),
        how="inner",
    )

    probes_hit1 = b1.select("l_id").distinct()
    left2 = left.join(probes_hit1, on="l_id", how="left_anti")

    # Branch 2: probe key with first_initial '?' — matches build rows
    # whose first name has no alphabetic char.
    b2 = left2.join(
        right.filter(F.col("r_first_initial") == "?"),
        on=(
            (F.col("l_birth_year") == F.col("r_birth_year"))
            & (F.col("l_last_initial") == F.col("r_last_initial"))
            & (F.col("l_sx_last") == F.col("r_sx_last"))
        ),
        how="inner",
    )

    probes_hit2 = b2.select("l_id").distinct()
    left3 = left2.join(probes_hit2, on="l_id", how="left_anti")

    # Branch 3: coarse soundex — probe's soundex with digits 3-4 zeroed
    # must equal the build row's FULL soundex.
    coarse = F.concat(F.substring(F.col("l_sx_last"), 1, 2), F.lit("00"))
    b3 = left3.join(
        right,
        on=(
            (F.col("l_birth_year") == F.col("r_birth_year"))
            & (F.col("l_first_initial") == F.col("r_first_initial"))
            & (F.col("l_last_initial") == F.col("r_last_initial"))
            & (coarse == F.col("r_sx_last"))
        ),
        how="inner",
    )

    common = [c for c in b1.columns if c in b2.columns and c in b3.columns]
    return (
        b1.select(*common)
        .unionByName(b2.select(*common))
        .unionByName(b3.select(*common))
    )


def _refine_hot_blocks(
    left: DataFrame, right: DataFrame, max_block_rows: int
) -> tuple[DataFrame, DataFrame]:
    """Extend block_key with soundex4(first) inside oversized blocks.

    Build-side blocks with more than ``max_block_rows`` rows get the
    extra component on BOTH sides (deterministic; both sides agree on
    which keys are hot because hotness is judged on the build side
    only). Bounds the per-block pair count without dropping data; the
    residual skew is AQE's job.
    """
    hot = (
        right.groupBy("r_block_key")
        .count()
        .filter(F.col("count") > max_block_rows)
        .select(F.col("r_block_key").alias("hot_key"))
    )
    hot_b = F.broadcast(hot)

    right = (
        right.join(hot_b, right["r_block_key"] == hot_b["hot_key"], "left")
        .withColumn(
            "r_block_key",
            F.when(
                F.col("hot_key").isNotNull(),
                F.concat_ws("|", "r_block_key", soundex4_udf(F.col("r_first_name"))),
            ).otherwise(F.col("r_block_key")),
        )
        .drop("hot_key")
    )
    left = (
        left.join(hot_b, left["l_block_key"] == hot_b["hot_key"], "left")
        .withColumn(
            "l_block_key",
            F.when(
                F.col("hot_key").isNotNull(),
                F.concat_ws("|", "l_block_key", soundex4_udf(F.col("l_first_name"))),
            ).otherwise(F.col("l_block_key")),
        )
        .drop("hot_key")
    )
    return left, right


def match_fuzzy(
    p1: DataFrame,
    p2: DataFrame,
    include_middle: bool,
    blocking: str = "bkey_cascade",
    max_block_rows: int | None = None,
) -> DataFrame:
    """Algorithm 3 (include_middle=True) / 4 (False): candidates ->
    birthdate gate -> fuzzy ladder -> matched pairs with confidence.

    ``prepare_persons`` must have been called with the SAME
    include_middle (it decides the `full`/`dmeta` variant).
    """
    if blocking == "birthdate":
        cands = candidates_birthdate(p1, p2)
    elif blocking == "bkey_cascade":
        cands = candidates_bkey_cascade(p1, p2, max_block_rows)
    else:
        raise ValueError(f"unknown blocking strategy: {blocking}")

    # Exact-birthdate gate (mod.rs:144-153): null disqualifies; applied
    # BEFORE scoring so the JW UDF only sees real candidates.
    gated = cands.filter(
        F.col("l_birthdate").isNotNull()
        & (F.col("l_birthdate") == F.col("r_birthdate"))
    )
    scored = score_candidate_pairs(gated, include_middle=include_middle)
    return _pair_output(scored)
