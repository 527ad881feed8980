"""Incremental streaming linkage: micro-batched pages fuzzy-matched
against a pinned reference corpus must reproduce the batch pipeline's
pairs exactly, resume from its checkpoint, and not leak cache entries
across batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from name_matcher_spark.fixtures.pages import make_pages
from name_matcher_spark.fixtures.persons import make_dirty
from name_matcher_spark.operators.extract import extract_entities
from name_matcher_spark.operators.fuzzy_join import match_fuzzy
from name_matcher_spark.operators.prepare import prepare_persons
from name_matcher_spark.streaming.linkage import incremental_linkage


def _storage_entries(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_incremental_linkage_matches_batch_and_resumes(spark, tmp_path):
    # Shared session: earlier tests may have left pinned tables
    # (match_fuzzy auto-persists) and localCheckpoint RDDs (clustering
    # iterations), which catalog.clearCache() does NOT remove — so the
    # hygiene check below measures the DELTA this test adds, not an
    # absolute count.
    spark.catalog.clearCache()
    n_storage_before = _storage_entries(spark)
    a_pd, b_pd, _ = make_dirty(400, seed=9)
    ref = prepare_persons(spark.createDataFrame(b_pd), include_middle=False)

    pages = spark.createDataFrame(make_pages(a_pd, "a")).drop("expected_entity")
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))

    # Wave 1: first half of the crawl.
    half = pages.filter(F.col("url").substr(-1, 1).isin(*"02468"))
    rest = pages.exceptAll(half)
    half.write.parquet(src)

    q = incremental_linkage(
        spark.readStream.schema(pages.schema).parquet(src), ref, out, ck
    )
    q.awaitTermination()
    n_wave1 = spark.read.parquet(out).count()

    # Wave 2 arrives; resume from the same checkpoint only sees new files.
    rest.write.mode("append").parquet(src)
    q2 = incremental_linkage(
        spark.readStream.schema(pages.schema).parquet(src), ref, out, ck
    )
    q2.awaitTermination()

    got = spark.read.parquet(out)
    assert got.select("batch_id").distinct().count() >= 2
    assert got.count() > n_wave1 > 0

    # Parity with the one-shot batch pipeline over the full crawl.
    prepared_all = prepare_persons(
        extract_entities(pages).withColumnRenamed("url", "uuid"), False
    )
    expected = match_fuzzy(prepared_all, ref, include_middle=False)
    cols = ["id_1", "id_2", "match_case"]
    diff = (
        got.select(cols).exceptAll(expected.select(cols)).count()
        + expected.select(cols).exceptAll(got.select(cols)).count()
    )
    assert diff == 0 and expected.count() > 0

    # Cache hygiene: per-batch pins were released — only the pinned
    # reference corpus (and whatever the batch comparison just pinned)
    # may remain, not one key-table set per micro-batch.
    assert _storage_entries(spark) - n_storage_before <= 6
    spark.catalog.clearCache()


def test_streaming_pipeline_pages_to_clusters(spark, tmp_path):
    """The full incremental north-star path chained: page stream ->
    incremental_linkage (pairs parquet) -> incremental_clusters (label
    store), drained per wave. Final clusters must equal the one-shot
    batch pipeline (match_fuzzy + cluster_pairs) over all pages."""
    from name_matcher_spark.operators.clustering import cluster_pairs
    from name_matcher_spark.streaming.clustering import (
        incremental_clusters,
        read_clusters,
    )

    spark.catalog.clearCache()
    a_pd, b_pd, _ = make_dirty(400, seed=41)
    ref = prepare_persons(spark.createDataFrame(b_pd), include_middle=False)
    pages = spark.createDataFrame(make_pages(a_pd, "a")).drop("expected_entity")
    src, pairs_dir, labels, ck1, ck2 = (
        str(tmp_path / d) for d in ("src", "pairs", "labels", "ck1", "ck2")
    )
    pair_schema = "id_1 long, id_2 long, confidence double"

    half = pages.filter(F.col("url").substr(-1, 1).isin(*"13579"))
    rest = pages.exceptAll(half)

    def drain_wave():
        q = incremental_linkage(
            spark.readStream.schema(pages.schema).parquet(src),
            ref, pairs_dir, ck1,
        )
        q.awaitTermination()
        # chain: the pairs sink is itself the clustering stream's source
        q2 = incremental_clusters(
            spark.readStream.schema(pair_schema)
            .parquet(pairs_dir),
            labels, ck2,
        )
        q2.awaitTermination()

    half.write.parquet(src)
    drain_wave()
    rest.write.mode("append").parquet(src)
    drain_wave()

    got = read_clusters(spark, labels)
    prepared_all = prepare_persons(
        extract_entities(pages).withColumnRenamed("url", "uuid"), False
    )
    expected = cluster_pairs(
        match_fuzzy(prepared_all, ref, include_middle=False), threshold=0.95
    )
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert diff == 0 and expected.count() > 0


def test_forever_mode_both_queries_concurrent(spark, tmp_path):
    """Long-lived (--stream-forever) topology: the cluster label store
    must keep updating WHILE the linkage query runs. The deploy path
    folds clustering into the linkage foreachBatch (the partitioned
    pairs sink cannot double as a file-stream source that starts before
    the first batch exists); this drives that single-query topology and
    checks the store materializes mid-flight. Regression for the
    submit-job bug where clustering was only started after awaiting the
    never-terminating linkage query."""
    import os
    import time

    from name_matcher_spark.streaming.clustering import read_clusters

    spark.catalog.clearCache()
    a_pd, b_pd, _ = make_dirty(200, seed=43)
    ref = prepare_persons(spark.createDataFrame(b_pd), include_middle=False)
    pages = spark.createDataFrame(make_pages(a_pd, "a")).drop("expected_entity")
    src, pairs_dir, labels, ck1 = (
        str(tmp_path / d) for d in ("src", "pairs", "labels", "ck1")
    )
    pages.write.parquet(src)

    q1 = incremental_linkage(
        spark.readStream.schema(pages.schema).parquet(src),
        ref, pairs_dir, ck1, available_now=False,
        cluster_labels_dir=labels,
    )
    try:
        deadline = time.time() + 120
        n = 0
        while time.time() < deadline:
            if os.path.exists(labels):
                try:
                    n = read_clusters(spark, labels).count()
                except Exception:  # noqa: BLE001 - store mid-replace
                    n = 0
                if n > 0:
                    break
            time.sleep(2)
        assert n > 0, "cluster store never updated while linkage query ran"
        assert q1.isActive
        # the pairs sink is written too (both outputs from one query)
        assert spark.read.parquet(pairs_dir).count() > 0
    finally:
        q1.stop()


def test_zero_match_first_batch_with_cluster_store(spark, tmp_path):
    """A first micro-batch that extracts entities but matches NOTHING
    must still commit: the dynamic-overwrite write of an empty
    partitioned DataFrame leaves no data files, so the cluster-fold
    read-back needs an explicit schema or the batch dies with
    UNABLE_TO_INFER_SCHEMA and the checkpoint retries forever."""
    import os

    a_pd, b_pd, _ = make_dirty(60, seed=21)
    pages = spark.createDataFrame(make_pages(a_pd, "a")).drop("expected_entity")
    # reference with disjoint gibberish names AND shifted birthdates:
    # no block key overlaps, zero pairs guaranteed
    ref_src = (
        spark.createDataFrame(b_pd)
        .withColumn("first_name", F.concat(F.lit("Qqx"), F.col("id").cast("string")))
        .withColumn("last_name", F.concat(F.lit("Vzw"), F.col("id").cast("string")))
        .withColumn("middle_name", F.lit(None).cast("string"))
        .withColumn("birthdate", F.date_add("birthdate", 40000))
    )
    ref = prepare_persons(ref_src, include_middle=False)
    src, out, ck, labels = (
        str(tmp_path / d) for d in ("src", "out", "ck", "labels")
    )
    pages.write.parquet(src)
    q = incremental_linkage(
        spark.readStream.schema(pages.schema).parquet(src),
        ref,
        out,
        ck,
        cluster_labels_dir=labels,
    )
    q.awaitTermination()  # raises StreamingQueryException if the batch wedged
    assert os.path.exists(out)
    # no pairs -> the label store is never materialized (empty fold is a no-op)
    assert not os.path.exists(labels)
