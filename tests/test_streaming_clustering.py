"""Incremental clustering: label store maintained across micro-batches
must equal from-scratch batch clustering, including cross-wave cluster
merges that relabel previously-settled members."""

from __future__ import annotations

from pyspark.sql import functions as F

from name_matcher_spark.streaming.clustering import (
    incremental_clusters,
    read_clusters,
)

SCHEMA = "id_1 long, id_2 long, confidence double"


def _drain(spark, src, labels, ck):
    q = incremental_clusters(
        spark.readStream.schema(SCHEMA).parquet(src), labels, ck
    )
    q.awaitTermination()


def test_cross_wave_merge_relabels_old_members(spark, tmp_path):
    src, labels, ck = (str(tmp_path / d) for d in ("src", "labels", "ck"))
    # Wave 1: {5a-6b} and {1a-2b} as separate clusters.
    spark.createDataFrame(
        [(5, 6, 1.0), (1, 2, 1.0)], SCHEMA
    ).write.parquet(src)
    _drain(spark, src, labels, ck)
    c1 = {(r.side, r.id): r.cluster_id for r in read_clusters(spark, labels).collect()}
    assert c1[("a", 5)] == c1[("b", 6)] == 10   # min(10, 13)
    assert c1[("a", 1)] == c1[("b", 2)] == 2    # min(2, 5)

    # Wave 2 bridges them: 1a-6b. Everything must drop to label 2,
    # including node 5a which was settled in wave 1.
    spark.createDataFrame([(1, 6, 1.0)], SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, labels, ck)
    c2 = {(r.side, r.id): r.cluster_id for r in read_clusters(spark, labels).collect()}
    assert set(c2.values()) == {2}
    assert c2[("a", 5)] == 2

    # Low-confidence pairs are ignored.
    spark.createDataFrame([(100, 200, 0.5)], SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, labels, ck)
    c3 = read_clusters(spark, labels)
    assert c3.filter(F.col("id") == 100).count() == 0


def test_incremental_equals_batch_on_fixture(spark, tmp_path):
    from name_matcher_spark import harness
    from name_matcher_spark.operators.clustering import cluster_pairs
    from name_matcher_spark.operators.exact import match_algo1
    from name_matcher_spark.operators.prepare import prepare_persons

    sf = "/root/testdata/sf0.001"
    pa = prepare_persons(harness.persons_a(spark, sf))
    pb = prepare_persons(harness.persons_b(spark, sf))
    pairs = match_algo1(pa, pb).select("id_1", "id_2", "confidence").persist()

    src, labels, ck = (str(tmp_path / d) for d in ("src", "labels", "ck"))
    wave1 = pairs.filter(F.col("id_1") % 2 == 0)
    pairs.exceptAll(wave1).write.parquet(src)
    _drain(spark, src, labels, ck)
    wave1.write.mode("append").parquet(src)
    _drain(spark, src, labels, ck)

    got = read_clusters(spark, labels)
    expected = cluster_pairs(pairs, threshold=0.95)
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert diff == 0 and expected.count() > 0
    pairs.unpersist()


def test_crash_between_renames_recovers_from_old(spark, tmp_path):
    """A crash after rename(labels, labels.old) but before
    rename(labels.next, labels) must not lose the store: recover_store
    restores the last complete store, and the next drain continues
    from it (checkpoint retry semantics)."""
    import os

    from name_matcher_spark.streaming.clustering import recover_store

    src, labels, ck = (str(tmp_path / d) for d in ("src", "labels", "ck"))
    spark.createDataFrame([(1, 2, 1.0)], SCHEMA).write.parquet(src)
    _drain(spark, src, labels, ck)
    before = {(r.side, r.id): r.cluster_id for r in read_clusters(spark, labels).collect()}

    # simulate the torn state
    os.rename(labels, f"{labels}.old")
    assert not os.path.exists(labels)
    recover_store(labels)
    after = {(r.side, r.id): r.cluster_id for r in read_clusters(spark, labels).collect()}
    assert after == before

    # and the next wave still merges on top of the recovered store
    spark.createDataFrame([(1, 9, 1.0)], SCHEMA).write.parquet(
        src, mode="append"
    )
    os.rename(labels, f"{labels}.old")  # tear it again right before the drain
    _drain(spark, src, labels, ck)
    final = {(r.side, r.id): r.cluster_id for r in read_clusters(spark, labels).collect()}
    assert (("b", 9) in final) and final[("b", 9)] == final[("a", 1)]
