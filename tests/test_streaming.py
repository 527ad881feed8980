"""Structured Streaming: windowed aggregation parity with the batch
query, and exactly-once file-stream extraction with restart."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_matcher_spark.fixtures.pages import make_pages
from name_matcher_spark.fixtures.persons import make_dirty
from name_matcher_spark.streaming.events import (
    hourly_event_counts,
    run_file_stream,
    streaming_entity_extract,
    streaming_sessionize,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """The applyInPandasWithState sessionizer over a one-batch drain
    must agree with the DuckDB-oracle-checked batch query."""
    from name_matcher_spark import harness

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "se")
    events.coalesce(1).write.parquet(src)  # one file -> one micro-batch

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT user_id, max(n_sessions) AS n_sessions, max(n_events) AS n_events "
        "FROM sess_parity GROUP BY user_id"
    )
    expected = harness.q_events_sessions(spark, SF_DIR)
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert diff == 0 and expected.count() > 0


def test_streaming_sessionize_state_across_restarts(spark, tmp_path):
    """State survives a checkpointed restart: a later event for the
    same user past the gap opens a NEW session on the second drain."""
    from datetime import datetime

    rows1 = [(1, 101, datetime(2024, 1, 1, 0, 0, 0), "c", 1.0),
             (1, 102, datetime(2024, 1, 1, 0, 5, 0), "c", 1.0)]
    rows2 = [(1, 103, datetime(2024, 1, 1, 6, 0, 0), "c", 1.0)]
    schema = "user_id long, event_id long, ts timestamp, event_type string, value double"
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    spark.createDataFrame(rows1, schema).write.parquet(src)

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)

        def write_batch(df, _epoch):
            df.write.mode("append").parquet(out)

        q = (
            streaming_sessionize(stream)
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return tuple(
            spark.read.parquet(out)
            .selectExpr("max(n_sessions)", "max(n_events)")
            .collect()[0]
        )

    assert drain() == (1, 2)
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    assert drain() == (2, 3)


def test_hourly_stream_matches_batch(spark, tmp_path):
    """Stream the events parquet as a file source, drain with
    availableNow, compare against the equivalent batch aggregation."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = hourly_event_counts(stream)
    out_dir = str(tmp_path / "out")
    q = run_file_stream(agg, out_dir, str(tmp_path / "ck"), output_mode="append")
    q.awaitTermination()

    got = (
        spark.read.parquet(out_dir)
        .groupBy("hour", "event_type")
        .agg(F.sum("n_events").alias("n_events"))
    )
    # Append mode emits a window only once the watermark passes its
    # end, so the trailing windows (within the 2h watermark of max ts)
    # are withheld — exclude them from the batch expectation.
    max_ts = events.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    expected = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .filter(
            F.col("hour") + F.expr("INTERVAL 1 HOUR")
            <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
        )
    )
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert diff == 0
    assert expected.count() > 0


def test_streaming_extract_exactly_once_restart(spark, tmp_path):
    a_pd, _, _ = make_dirty(200)
    pages = spark.createDataFrame(make_pages(a_pd, "a")).drop("expected_entity")
    src = str(tmp_path / "pages")
    pages.write.parquet(src)

    schema = pages.schema
    out_dir = str(tmp_path / "entities")
    ck = str(tmp_path / "ck")

    stream = spark.readStream.schema(schema).parquet(src)
    q = run_file_stream(streaming_entity_extract(stream), out_dir, ck)
    q.awaitTermination()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 200

    # Restart with the same checkpoint: no new input -> no duplicates.
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = run_file_stream(streaming_entity_extract(stream2), out_dir, ck)
    q2.awaitTermination()
    assert spark.read.parquet(out_dir).count() == 200

    # New files arriving ARE picked up incrementally.
    b_pd, _, _ = make_dirty(100)
    b_pd = b_pd.assign(id=b_pd["id"] + 10000)
    more = spark.createDataFrame(make_pages(b_pd, "a")).drop("expected_entity")
    more.write.mode("append").parquet(src)
    stream3 = spark.readStream.schema(schema).parquet(src)
    q3 = run_file_stream(streaming_entity_extract(stream3), out_dir, ck)
    q3.awaitTermination()
    assert spark.read.parquet(out_dir).count() == 300


def test_sessionize_multi_chunk_group_any_order(spark, tmp_path):
    """applyInPandasWithState hands a group to the UDF as MULTIPLE
    Arrow chunks (bounded by arrow.maxRecordsPerBatch) with no time
    ordering across chunks. 250 events for one user written in
    DESCENDING time order with a 100-row chunk cap: diffing each chunk
    against the carried last_ts would see the early-day chunk as a
    negative gap and count 1 session; sorting the concatenation once
    counts the true 2."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 2, 12, 0, 0)
    early = datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, i, base + timedelta(seconds=i), "c", 1.0) for i in range(200)]
    rows += [
        (1, 1000 + i, early + timedelta(seconds=i), "c", 1.0) for i in range(50)
    ]
    rows.sort(key=lambda r: r[2], reverse=True)
    schema = (
        "user_id long, event_id long, ts timestamp, "
        "event_type string, value double"
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "100")
    try:
        q = (
            streaming_sessionize(
                spark.readStream.schema(schema).parquet(src)
            )
            .writeStream.format("memory")
            .queryName("sess_chunks")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, old)
    got = spark.sql(
        "SELECT max(n_sessions) AS s, max(n_events) AS e FROM sess_chunks"
    ).first()
    assert (got.s, got.e) == (2, 250)
