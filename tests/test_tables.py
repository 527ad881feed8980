"""Catalog-table I/O layer: table-ref routing, table-backed stage
checkpoints with manifest ROWS, and run_linkage over them — the north
rule's "over Iceberg tables / checkpoint each stage to Iceberg" shape
exercised against the session catalog (same code path; an Iceberg
catalog is pure session config, sources/tables.py docstring)."""

from __future__ import annotations

import json
import uuid

import pytest
from pyspark.sql import functions as F

from name_matcher_spark.fixtures.pages import make_pages
from name_matcher_spark.fixtures.persons import make_dirty
from name_matcher_spark.plans.pipeline import LinkageConfig, run_linkage
from name_matcher_spark.sources.checkpoint import TableStageCheckpoint
from name_matcher_spark.sources.tables import (
    ensure_namespace,
    is_table_ref,
    read_table,
    write_table,
)


@pytest.fixture()
def ns(spark):
    """A unique namespace per test run; dropped afterwards so repeated
    runs against the shared warehouse dir never collide."""
    name = f"nmsck_{uuid.uuid4().hex[:8]}"
    yield name
    spark.sql(f"DROP NAMESPACE IF EXISTS {name} CASCADE")


def test_is_table_ref_grammar():
    assert is_table_ref("pages")
    assert is_table_ref("crawl.pages")
    assert is_table_ref("ice.crawl.pages")
    assert not is_table_ref("a.b.c.d")  # too many parts
    assert not is_table_ref("/tmp/pages.parquet")
    assert not is_table_ref("s3://bucket/pages")
    assert not is_table_ref("./rel/path")
    assert not is_table_ref("pages parquet")
    assert not is_table_ref("")


def test_write_read_roundtrip_table_and_path(spark, ns, tmp_path):
    df = spark.range(25).withColumn("v", F.col("id") * 2)
    # path route
    p = str(tmp_path / "t.parquet")
    write_table(df, p)
    assert read_table(spark, p).count() == 25
    # catalog route (+ append)
    ref = f"{ns}.roundtrip"
    ensure_namespace(spark, ref)
    write_table(df, ref)
    assert read_table(spark, ref).count() == 25
    write_table(df.limit(5), ref, mode="append")
    assert read_table(spark, ref).count() == 30
    # overwrite replaces, not appends
    write_table(df.limit(3), ref)
    assert read_table(spark, ref).count() == 3


def test_table_checkpoint_resume_and_manifest_rows(spark, ns):
    ckpt = TableStageCheckpoint(spark, f"{ns}.run1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).withColumn("confidence", F.lit(0.97))

    fp = {"src": {"row_count": 10}}
    out1 = ckpt.run_stage("stage_x", build, score_col="confidence",
                          inputs=["src"], input_fingerprints=fp)
    assert out1.count() == 10 and calls["n"] == 1

    # Second run: served from the stage TABLE, build not invoked.
    out2 = ckpt.run_stage("stage_x", build, inputs=["src"],
                          input_fingerprints=fp)
    assert out2.count() == 10 and calls["n"] == 1
    assert spark.catalog.tableExists(f"{ns}.run1_stage_x")

    # Manifest is a ROW in {prefix}_manifest carrying lineage + the
    # score histogram the north rule requires.
    m = ckpt.manifest("stage_x")
    assert m["row_count"] == 10
    assert m["input_fingerprints"]["src"] == {"row_count": 10}
    assert m["score_histogram"] == {"0.9": 10}

    # Changed upstream fingerprint -> stale -> rebuild; the manifest
    # table now holds BOTH rows (audit trail), latest wins.
    ckpt.run_stage("stage_x", build, inputs=["src"],
                   input_fingerprints={"src": {"row_count": 11}})
    assert calls["n"] == 2
    mrows = spark.table(f"{ns}.run1_manifest").where(
        F.col("stage") == "stage_x"
    )
    assert mrows.count() == 2
    assert ckpt.manifest("stage_x")["input_fingerprints"]["src"] == {
        "row_count": 11
    }
    # Manifest rows are JSON-parseable
    for r in mrows.collect():
        json.loads(r["manifest"])


def test_manifest_chaining_across_table_stages(spark, ns):
    """A downstream stage fingerprints its upstream stage from the
    manifest TABLE, and an upstream rebuild invalidates it."""
    ckpt = TableStageCheckpoint(spark, f"{ns}.chain")
    ckpt.run_stage("up", lambda: spark.range(7))
    calls = {"down": 0}

    def build_down():
        calls["down"] += 1
        return ckpt.read("up").withColumn("y", F.col("id") + 1)

    ckpt.run_stage("down", build_down, inputs=["up"])
    ckpt.run_stage("down", build_down, inputs=["up"])
    assert calls["down"] == 1  # served
    # upstream changes content -> digest differs -> downstream rebuilds
    ckpt.write("up", spark.range(7).withColumn("id", F.col("id") + 100))
    ckpt.run_stage("down", build_down, inputs=["up"])
    assert calls["down"] == 2


def test_run_linkage_with_table_checkpoints(spark, ns, tmp_path):
    """Full pipeline over catalog-table checkpoints == directory-backed
    run, stage tables land in the catalog, resume serves them."""
    a_pd, b_pd, _ = make_dirty(200)
    pages_a = spark.createDataFrame(make_pages(a_pd, "a")).drop("expected_entity")
    pages_b = spark.createDataFrame(make_pages(b_pd, "b")).drop("expected_entity")
    cfg = LinkageConfig(stages=("pairs_fuzzy", "clusters"))

    tckpt = TableStageCheckpoint(spark, f"{ns}.lk")
    out_t = run_linkage(spark, str(tmp_path / "ignored"), pages_a=pages_a,
                        pages_b=pages_b, config=cfg, checkpoint=tckpt)
    out_d = run_linkage(spark, str(tmp_path / "wd"), pages_a=pages_a,
                        pages_b=pages_b, config=cfg)

    def key_sorted(df):
        return sorted(tuple(r) for r in df.collect())

    assert key_sorted(out_t["pairs_fuzzy"]) == key_sorted(out_d["pairs_fuzzy"])
    assert key_sorted(out_t["clusters"]) == key_sorted(out_d["clusters"])
    for stage in ("extract_a", "prepare_a", "pairs_fuzzy", "clusters"):
        assert spark.catalog.tableExists(f"{ns}.lk_{stage}"), stage
    assert tckpt.manifest("pairs_fuzzy")["score_histogram"]

    # Resume: identical output, no new manifest rows (all served).
    n_manifest = spark.table(f"{ns}.lk_manifest").count()
    out_r = run_linkage(spark, str(tmp_path / "ignored"), pages_a=pages_a,
                        pages_b=pages_b, config=cfg, checkpoint=tckpt)
    assert key_sorted(out_r["pairs_fuzzy"]) == key_sorted(out_t["pairs_fuzzy"])
    assert spark.table(f"{ns}.lk_manifest").count() == n_manifest


def test_table_checkpoint_rejects_path_prefix(spark):
    with pytest.raises(ValueError):
        TableStageCheckpoint(spark, "/tmp/not/a/table")


def test_is_table_ref_rejects_data_filenames():
    """A bare relative filename like persons.parquet is a PATH even
    though it parses as a 2-part identifier — submit_job inputs must
    not get routed into the catalog."""
    assert not is_table_ref("persons.parquet")
    assert not is_table_ref("out.CSV")
    assert not is_table_ref("d.jsonl")
    assert is_table_ref("nmsck.deploy")  # not a file extension


def test_overwrite_recovers_from_stale_warehouse_location(spark, ns):
    """An in-memory catalog does not outlive the JVM but the warehouse
    dir does: a rebuild against a leftover managed location must clean
    it and succeed instead of dying with LOCATION_ALREADY_EXISTS."""
    import os
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    stale = os.path.join(wh, f"{ns}.db", "stale_t")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("not parquet")
    ref = f"{ns}.stale_t"
    ensure_namespace(spark, ref)
    assert not spark.catalog.tableExists(ref)
    write_table(spark.range(7), ref)
    assert spark.table(ref).count() == 7


def test_table_checkpoint_rejects_manifest_stage(spark, ns):
    ckpt = TableStageCheckpoint(spark, f"{ns}.r")
    with pytest.raises(ValueError):
        ckpt.run_stage("manifest", lambda: spark.range(1))


def test_table_checkpoint_rejects_invalid_stage_name_before_build(spark, ns):
    """A stage name that breaks the table-ref grammar must fail FAST —
    before the (possibly expensive) build runs and before write_table
    could mistake the ref for a filesystem path."""
    ckpt = TableStageCheckpoint(spark, f"{ns}.r")
    ran = []

    def build():
        ran.append(1)
        return spark.range(1)

    with pytest.raises(ValueError, match="identifier segment"):
        ckpt.run_stage("pairs-fuzzy", build)
    # dotted names PARSE as 2-part refs but route into a database that
    # was never created — must be rejected just as early
    with pytest.raises(ValueError, match="identifier segment"):
        ckpt.run_stage("pairs.fuzzy", build)
    assert not ran


def test_stale_cleanup_respects_current_database(spark, ns):
    """A 1-part ref resolves against the session's CURRENT database;
    the stale-location cleanup must target that database's layout and
    must NOT touch default.<t>'s live files."""
    import os
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    ensure_namespace(spark, f"{ns}.x")
    # live managed table in default, same short name
    write_table(spark.range(3), "cur_db_t")
    default_loc = os.path.join(wh, "cur_db_t")
    assert os.path.isdir(default_loc)
    # stale leftovers under the OTHER database's layout
    stale = os.path.join(wh, f"{ns}.db", "cur_db_t")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("not parquet")
    spark.catalog.setCurrentDatabase(ns)
    try:
        write_table(spark.range(7), "cur_db_t")
        assert spark.table(f"{ns}.cur_db_t").count() == 7
    finally:
        spark.catalog.setCurrentDatabase("default")
    # the default table's data survived the other-db rebuild
    assert spark.table("default.cur_db_t").count() == 3
    spark.sql("DROP TABLE IF EXISTS default.cur_db_t")
