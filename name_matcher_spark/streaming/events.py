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


def streaming_sessionize(
    events_stream: DataFrame, gap_sec: int = 1800
) -> DataFrame:
    """Custom stateful operator: per-user session counting over an
    unbounded stream via ``applyInPandasWithState`` (the batch mirror
    is harness.q_events_sessions, which is DuckDB-oracle-checked —
    a bounded drain of this stream must agree with it).

    State per user: (last event epoch, sessions so far, events so
    far). Each micro-batch's rows are sorted and diffed VECTORIZED
    (numpy) — the Arrow batch is the unit of Python work, never the
    row. Emits one updated row per user per batch ("update" mode)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_sessions long, n_events long"
    state_schema = "last_ts double, n_sessions long, n_events long"

    def update(key, pdfs, state: GroupState):
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        # A group's rows arrive as MULTIPLE Arrow chunks (bounded by
        # arrow.maxRecordsPerBatch) in no guaranteed time order, so the
        # gap diff must run over the concatenation sorted ONCE — sorting
        # per-chunk and chaining through last_ts undercounts sessions
        # whenever a later chunk holds earlier timestamps.
        chunks = [
            pdf["ts"].astype("int64").to_numpy() for pdf in pdfs if len(pdf)
        ]
        if chunks:
            ts = np.sort(np.concatenate(chunks)) / 1e9
            first_new = 1 if last_ts is None or ts[0] - last_ts > gap_sec else 0
            n_sessions += first_new + int((np.diff(ts) > gap_sec).sum())
            n_events += len(ts)
            last_ts = float(ts[-1])
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


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
