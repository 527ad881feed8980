"""Structured Streaming pipelines.

The reference's "streaming" is bounded chunked batch (SURVEY.md §2.9)
and maps to plain Spark batch; these are the genuinely-unbounded
counterparts a crawl-scale deployment needs:

* ``hourly_event_counts`` — tumbling-window aggregation with a
  watermark for late data (the streaming mirror of
  harness.q_events_hourly; the batch query doubles as its oracle).
* ``streaming_entity_extract`` — pages arriving as files -> entity
  extraction (stateless, so watermarking is not required) -> Parquet
  sink with checkpointed exactly-once file tracking.

Both run with availableNow triggers in tests (bounded drain), and as
continuous micro-batch jobs in production with the same code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.extract import extract_entities


def hourly_event_counts(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windows, late rows beyond the watermark dropped.

    Watermarks require TIMESTAMP (tz-aware); parquet sources often carry
    TIMESTAMP_NTZ — cast up front (session TZ is pinned to UTC in
    session.py, so this is deterministic).
    """
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_entity_extract(pages_stream: DataFrame) -> DataFrame:
    """Stateless page -> entity extraction over a file stream."""
    return extract_entities(pages_stream)


def run_file_stream(
    df: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Drain the stream with availableNow (bounded) into Parquet; the
    checkpoint directory makes restarts exactly-once."""
    return (
        df.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
