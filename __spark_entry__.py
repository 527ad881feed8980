"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship linkage pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator registry from
``name_matcher_spark.harness`` (one entry per operator family in
SURVEY.md §2, plus the training-data-pipeline operators).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from name_matcher_spark import harness  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the north-star web pipeline at sf0.001 — synthesize
    Common-Crawl-style pages(url, warc_ts, html, text, lang), extract
    entities, blocked fuzzy matching, transitive clustering; returns
    per-cluster summary rows."""
    from pyspark.sql import functions as F

    from name_matcher_spark.operators.clustering import cluster_pairs
    from name_matcher_spark.operators.extract import extract_entities
    from name_matcher_spark.operators.fuzzy_join import match_fuzzy
    from name_matcher_spark.operators.prepare import prepare_persons

    sf_dir = "/root/testdata/sf0.001"
    ea = extract_entities(
        harness._persons_to_pages(harness.persons_a(spark, sf_dir), "a")
    ).withColumnRenamed("url", "uuid")
    eb = extract_entities(
        harness._persons_to_pages(harness.persons_b(spark, sf_dir), "b")
    ).withColumnRenamed("url", "uuid")
    pa = prepare_persons(ea, include_middle=False)
    pb = prepare_persons(eb, include_middle=False)
    pairs = match_fuzzy(pa, pb, include_middle=False)
    clusters = cluster_pairs(pairs, threshold=0.95)
    return (
        clusters.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(F.when(F.col("side") == "a", 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("side") == "b", 1).otherwise(0)).alias("n_b"),
        )
        .orderBy("cluster_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(harness.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(harness.ORACLES)
