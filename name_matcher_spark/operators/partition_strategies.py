"""Partition strategies — the reference's shard predicates as columns.

The reference splits work into sequential shards with SQL predicates
(src/util/partition.rs): 26 last-initial shards + an "other" bucket,
or 5-year birth ranges 1900-2030. In Spark a "partition strategy" is
just a column the shuffle hashes on — no query loop — but the SAME
keys matter for (a) writing partitioned output a resumable run can
skip per-partition, and (b) per-partition lineage in manifests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_initial_key(last_name: Column) -> Column:
    """A-Z shard of the (normalized) last name; non-alpha -> 'other'
    (partition.rs:18-39)."""
    initial = F.upper(F.substring(F.trim(last_name), 1, 1))
    return F.when(initial.rlike("^[A-Z]$"), initial).otherwise(F.lit("other"))


def birthyear5_key(birthdate: Column) -> Column:
    """5-year birth buckets, '1950_1954' style (partition.rs:48-65);
    null birthdate -> 'unknown'."""
    year = F.year(birthdate)
    lo = (F.floor(year / 5) * 5).cast("int")
    return F.when(
        birthdate.isNull(), F.lit("unknown")
    ).otherwise(F.concat_ws("_", lo.cast("string"), (lo + 4).cast("string")))


def with_partition_key(
    df: DataFrame, strategy: str = "last_initial", col_name: str = "part_key"
) -> DataFrame:
    if strategy == "last_initial":
        key = last_initial_key(F.col("norm_last") if "norm_last" in df.columns else F.col("last_name"))
    elif strategy == "birthyear5":
        key = birthyear5_key(F.col("birthdate"))
    else:
        raise ValueError(f"unknown strategy: {strategy}")
    return df.withColumn(col_name, key)


def write_partitioned(df: DataFrame, path: str, strategy: str = "last_initial") -> None:
    """Partition-pruned, per-shard-resumable output layout."""
    with_partition_key(df, strategy).write.mode("overwrite").partitionBy(
        "part_key"
    ).parquet(path)
