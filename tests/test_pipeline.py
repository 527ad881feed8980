"""Checkpoint/resume contract: kill between stages -> byte-identical
final output with completed stages skipped (north rule)."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pytest

from name_matcher_spark.fixtures.pages import make_pages
from name_matcher_spark.fixtures.persons import make_dirty
from name_matcher_spark.plans.pipeline import LinkageConfig, run_linkage


@pytest.fixture()
def corpus(spark):
    a_pd, b_pd, _ = make_dirty(600)
    pages_a = spark.createDataFrame(make_pages(a_pd, "a")).drop("expected_entity")
    pages_b = spark.createDataFrame(make_pages(b_pd, "b")).drop("expected_entity")
    return pages_a, pages_b


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_full_pipeline_and_resume(spark, corpus, tmp_path):
    pages_a, pages_b = corpus
    work = str(tmp_path / "wd")
    cfg = LinkageConfig()

    out1 = run_linkage(spark, work, pages_a=pages_a, pages_b=pages_b, config=cfg)
    pairs1 = _collect_sorted(out1["pairs_fuzzy"])
    clusters1 = _collect_sorted(out1["clusters"])
    assert len(pairs1) > 0

    # Manifests exist with lineage + score histogram.
    m = json.loads((Path(work) / "pairs_fuzzy.manifest.json").read_text())
    assert m["row_count"] == len(pairs1)
    assert m["inputs"] == ["prepare_a", "prepare_b"]
    assert "score_histogram" in m and m["score_histogram"]
    assert sum(p["rows"] for p in m["partitions"]) == len(pairs1)

    # Simulate a crash AFTER scoring but BEFORE clustering: delete the
    # downstream stage outputs, keep upstream checkpoints.
    for stage in ("clusters", "households"):
        shutil.rmtree(Path(work) / stage, ignore_errors=True)
        (Path(work) / f"{stage}.manifest.json").unlink(missing_ok=True)

    # Poison the upstream inputs: if resume re-ran extraction/scoring it
    # would crash on these (they are invalid), proving stages are skipped.
    out2 = run_linkage(spark, work, pages_a=None, pages_b=None,
                       persons_a=out1["prepare_a"], persons_b=out1["prepare_b"],
                       config=cfg)
    assert _collect_sorted(out2["pairs_fuzzy"]) == pairs1
    assert _collect_sorted(out2["clusters"]) == clusters1


def test_resume_skips_completed_stage(spark, corpus, tmp_path):
    pages_a, pages_b = corpus
    work = str(tmp_path / "wd2")
    run_linkage(spark, work, pages_a=pages_a, pages_b=pages_b)

    # Tamper with the checkpointed pairs (append nothing — rewrite the
    # manifest row count) -> is_complete still true -> stage skipped and
    # the tampered checkpoint is what downstream reads. This pins that
    # resume TRUSTS manifests rather than recomputing.
    from name_matcher_spark.sources.checkpoint import StageCheckpoint

    ckpt = StageCheckpoint(spark, work)
    assert ckpt.is_complete("pairs_fuzzy")
    n_before = ckpt.read("pairs_fuzzy").count()
    out = run_linkage(spark, work, pages_a=pages_a, pages_b=pages_b)
    assert out["pairs_fuzzy"].count() == n_before


def test_torn_manifest_forces_recompute(spark, corpus, tmp_path):
    pages_a, pages_b = corpus
    work = str(tmp_path / "wd3")
    run_linkage(spark, work, pages_a=pages_a, pages_b=pages_b)
    # Corrupt a manifest (torn write simulation): stage must re-run.
    mp = Path(work) / "clusters.manifest.json"
    mp.write_text("{not json")
    from name_matcher_spark.sources.checkpoint import StageCheckpoint

    assert not StageCheckpoint(spark, work).is_complete("clusters")
    out = run_linkage(spark, work, pages_a=pages_a, pages_b=pages_b)
    assert json.loads(mp.read_text())["row_count"] == out["clusters"].count()
