"""JDBC person ingest — source parity with the reference's actual
deployment (MySQL via sqlx: src/db/connection.rs, src/db/schema.rs:72-102).

The engine's canonical sources are lakehouse tables/paths
(sources/tables.py); this adapter exists for users migrating off the
reference's MySQL directly, without a prior export step. It is a thin
composition of Spark's partitioned JDBC source and the existing
``apply_column_mapping`` (operators/extract.py — the reference's
ColumnMapping + NULL-backfill semantics), so everything downstream of
ingest is identical for both source families.

Scale posture:
* **Parallel scan**: ``partition_column``/``num_partitions`` map to
  Spark's stride-partitioned JDBC reads — the Spark-native analog of
  the reference's keyset-paginated ``fetch_person_rows_chunk``
  (db/schema.rs:116-135: ``WHERE id > last_id LIMIT chunk``). Bounds
  are probed with one 1-row MIN/MAX pushdown query when not given.
* **Pruning pushes to the database**: the column-mapping projection is
  applied on the Spark side, and Catalyst pushes the resulting column
  list and any caller filters into the generated JDBC SELECT — the
  database never ships columns the pipeline drops.
* ``fetch_size`` tunes the driver cursor (MySQL/Postgres default to
  tiny row batches).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import (
    OPTIONAL_COLUMNS,
    REQUIRED_COLUMNS,
    apply_column_mapping,
)

_IDENT = re.compile(r"[A-Za-z0-9_.]+")


def _mapped_case_insensitive(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """apply_column_mapping with physical names resolved
    case-insensitively against the JDBC result schema — databases
    disagree on identifier case folding (Derby/Oracle uppercase
    unquoted names, MySQL preserves, Postgres lowercases), and SQL
    column resolution is case-insensitive, so the mapping should be
    too."""
    by_fold = {c.lower(): c for c in df.columns}
    resolved = {}
    for logical in REQUIRED_COLUMNS + OPTIONAL_COLUMNS:
        physical = mapping.get(logical, logical)
        hit = by_fold.get(physical.lower())
        if hit is not None:
            resolved[logical] = hit
        elif logical in mapping:
            # keep the CALLER's unresolvable entry so
            # apply_column_mapping raises on the typo; identity misses
            # stay unmapped so optional columns NULL-backfill
            resolved[logical] = physical
    return apply_column_mapping(df, resolved)


def read_persons_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    mapping: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
    fetch_size: int = 10_000,
) -> DataFrame:
    """Read a person table over JDBC, parallelized on a numeric key,
    projected to the engine's logical schema.

    ``mapping`` is logical -> physical like ``apply_column_mapping``
    (identity for unmapped names; required columns must resolve,
    optional ones NULL-backfill). ``partition_column`` is the PHYSICAL
    numeric column to stride on — defaults to the physical name of
    ``id``. With no explicit bounds, MIN/MAX are probed via one
    pushed-down aggregate row.
    """
    mapping = mapping or {}
    if not _IDENT.fullmatch(table):
        raise ValueError(f"invalid table identifier: {table!r}")
    part_col = partition_column or mapping.get("id", "id")
    if not _IDENT.fullmatch(part_col):
        raise ValueError(f"invalid partition column: {part_col!r}")

    opts = dict(properties or {})
    if driver:
        opts["driver"] = driver
    opts.setdefault("fetchsize", str(fetch_size))

    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**opts)
    )

    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    if n_parts > 1:
        if lower_bound is None or upper_bound is None:
            bounds_df = (
                spark.read.format("jdbc")
                .option("url", url)
                .option(
                    "dbtable",
                    f"(SELECT MIN({part_col}) AS lo, MAX({part_col}) AS hi "
                    f"FROM {table}) nms_bounds",
                )
                .options(**opts)
                .load()
            )
            row = bounds_df.first()
            lo = row["LO"] if "LO" in bounds_df.columns else row["lo"]
            hi = row["HI"] if "HI" in bounds_df.columns else row["hi"]
            if lo is None or hi is None:
                # empty table: a plain single-partition read is correct
                return _mapped_case_insensitive(reader.load(), mapping)
            # Honor a one-sided explicit bound: the probe fills ONLY the
            # missing side, so a caller pinning lower_bound to the live
            # id range keeps their stride concentration. Clamp the
            # PROBED side toward the explicit one — Spark requires
            # lowerBound <= upperBound, and bounds never filter rows,
            # so a degenerate equal-bounds window is safe.
            if lower_bound is None:
                lower_bound = (
                    int(lo) if upper_bound is None else min(int(lo), upper_bound)
                )
            if upper_bound is None:
                upper_bound = max(int(hi), lower_bound)
        reader = (
            reader.option("partitionColumn", part_col)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(n_parts))
        )

    return _mapped_case_insensitive(reader.load(), mapping)
