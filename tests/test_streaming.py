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
)

SF_DIR = "/root/testdata/sf0.001"


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
