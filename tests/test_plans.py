"""Physical-plan quality gates: the properties that make the engine
viable at 100 TB, asserted on the actual executed plans.

- filters reach the parquet scan (PushedFilters)
- column pruning reaches the scan (ReadSchema carries only used cols)
- exact joins and dedup/text paths contain ZERO Python nodes
- the fuzzy scoring plan evaluates the JW kernel exactly once
- whole-stage codegen wraps the relational sections
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # pruned


def test_exact_join_no_python(spark):
    """Algo-1/2 are pure JVM once the prepare columns exist: the join
    itself must not re-enter Python."""
    from name_matcher_spark import harness
    from name_matcher_spark.operators.exact import match_algo1

    pa = harness.persons_a(spark, SF)
    pb = harness.persons_b(spark, SF)
    # emulate checkpointed prepare outputs (as the pipeline produces)
    pa = pa.withColumn("norm_first", F.lower("first_name")).withColumn(
        "norm_last", F.lower("last_name")
    )
    pb = pb.withColumn("norm_first", F.lower("first_name")).withColumn(
        "norm_last", F.lower("last_name")
    )
    plan = _plan(match_algo1(pa, pb))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # a real hash-based equi-join on the composite key, not a loop
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_dedup_and_text_paths_jvm_only(spark):
    from name_matcher_spark.operators.dedup import (
        minhash_lsh_candidates,
        simhash64,
    )
    from name_matcher_spark.operators.text import lang_id, quality_metrics

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (
        minhash_lsh_candidates(docs),
        simhash64(docs),
        lang_id(docs),
        quality_metrics(docs),
    ):
        plan = _plan(df)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_fuzzy_scoring_single_kernel_eval(spark):
    """The Generate barrier keeps the JW kernel at exactly one
    evaluation per row (CollapseProject would otherwise inline it into
    every ladder predicate — observed 5x before the fix)."""
    from name_matcher_spark import harness
    from name_matcher_spark.operators.fuzzy_join import match_fuzzy
    from name_matcher_spark.operators.prepare import prepare_persons

    from name_matcher_spark.functions import similarity

    pa = prepare_persons(harness.persons_a(spark, SF), include_middle=False)
    pb = prepare_persons(harness.persons_b(spark, SF), include_middle=False)
    plan = _plan(match_fuzzy(pa, pb, include_middle=False))
    # Assert on whichever kernel is ACTIVE — a jar build failure must
    # not green-wash the barrier via a vacuous 0-count.
    if similarity.JVM_JW_ENABLED:
        assert plan.count("nms_jw_pct") == 1
    else:
        assert plan.count("_jaro_winkler_pct_udf") == 1
    assert "Generate explode" in plan


def test_registered_ngram_variant_is_capped(spark):
    """The REGISTERED dd_ngram_jaccard must run the stop-gram cut: its
    plan carries the LeftSemi gram filter ahead of the gram self-join
    (uncapped, the self-join goes quadratic on stop-grams at scale)."""
    from name_matcher_spark import harness

    plan = _plan(harness.dd_ngram_jaccard(spark, SF))
    assert "LeftSemi" in plan


def test_ngram_candidate_filter_below_aggregate(spark):
    """With LSH candidates supplied, the candidate semi join must run on
    the exploded gram-pair stream BELOW the intersection aggregate —
    Catalyst won't push a semi join through an aggregation, so placing
    it above would still generate and aggregate the full quadratic
    stream only to throw it away."""
    from name_matcher_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared text") for i in range(20)],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long"
    )
    plan = (
        ngram_jaccard_pairs(docs, candidates=cand)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # In the tree string the inter-count Aggregate (grouping id_a, id_b)
    # prints before (above) its children; every LeftSemi must appear
    # below it, none above.
    agg_pos = plan.index("Aggregate [id_a")
    semi_pos = plan.index("LeftSemi")
    assert agg_pos < semi_pos, "candidate semi join sits above the aggregate"


def test_overlap_stats_single_lazy_plan(spark):
    """algo_overlap_stats must be ONE lazy plan (no driver actions
    inside): building the DataFrame must run zero Spark jobs."""
    from name_matcher_spark.sources.export import algo_overlap_stats

    a = spark.createDataFrame([(1, 2), (3, 4)], "id_1 long, id_2 long")
    b = spark.createDataFrame([(1, 2), (5, 6)], "id_1 long, id_2 long")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = algo_overlap_stats(a, b)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "algo_overlap_stats triggered driver actions eagerly"
    rows = {r.bucket: r.n_pairs for r in out.collect()}
    assert rows == {"both": 1, "only_first": 1, "only_second": 1}


def test_broadcast_for_small_dimension(spark):
    """Small dims broadcast (no shuffle of the fact side)."""
    n = spark.read.parquet(f"{SF}/nation.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    q = c.join(n, c["c_nationkey"] == n["n_nationkey"]).groupBy("n_name").count()
    # AQE decides at runtime; materialize then check the final plan.
    q.collect()
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan


def test_prepare_chain_zero_python(spark):
    """With the compiled normalize/soundex/metaphone kernels
    registered, the per-record prepare chain contains ZERO Python nodes
    — the Arrow channel is the documented scaling ceiling, and the
    whole per-record path (and with the Java JW, the per-pair path too)
    now runs JVM-side."""
    from name_matcher_spark import harness
    from name_matcher_spark.functions import normalize, phonetic
    from name_matcher_spark.operators.prepare import prepare_persons

    if not (
        normalize.JVM_NORM_ENABLED
        and phonetic.JVM_SX_ENABLED
        and phonetic.JVM_DMETA_ENABLED
    ):
        import pytest as _pytest

        _pytest.skip("JVM kernels not registered (jar build unavailable)")

    plan = _plan(prepare_persons(harness.persons_a(spark, SF)))
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "nms_normalize_text" in plan and "nms_soundex4" in plan
    assert "nms_dmeta" in plan


def test_new_round3_operators_plan_quality(spark):
    """dd_pipeline and the URL canonicalizer must stay JVM-only (no
    Python nodes) and never form a cartesian product — the plan
    properties that make them viable at crawl scale."""
    from name_matcher_spark import harness

    for q in (harness.dd_pipeline, harness.wp_url_canon):
        plan = _plan(q(spark, SF))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_wp_crawl_e2e_plan_quality(spark):
    """The crawl-composition chain (URL dedup -> html_to_text ->
    tiered dedup -> extract -> algo1 -> clusters) must keep the
    crawl-scale plan properties: no Python nodes with the kernels
    registered, and no cartesian/nested-loop join anywhere."""
    import pytest as _pytest

    from name_matcher_spark import harness
    from name_matcher_spark.functions import normalize, phonetic

    if not (
        normalize.JVM_NORM_ENABLED
        and phonetic.JVM_SX_ENABLED
        and phonetic.JVM_DMETA_ENABLED
    ):
        _pytest.skip("JVM kernels not registered (jar build unavailable)")
    plan = _plan(harness.wp_crawl_e2e(spark, "/root/testdata/sf0.001"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_session_keeps_compute_dense_shuffles_wide(spark):
    """Regression for the AQE bytes-blind-coalescing fix: this
    engine's rows are short texts whose downstream stages fan out
    ~100 grams x several hash calls per row, so the session must set
    coalescePartitions.minPartitionSize low (64k) or AQE squeezes a
    few-MB survivor shuffle to 1-2 partitions and the dedup tiers run
    serially regardless of task slots (measured: 58 s of an 89 s
    crawl-e2e wall)."""
    assert spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    ) == "64k"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_new_round4_text_operators_plan_quality(spark):
    """The round-4 text/dedup additions (repetition signals, line
    dedup, the composed quality filter) must stay JVM-only and never
    form a cartesian/nested-loop join — same crawl-scale gate as the
    round-3 operators."""
    from name_matcher_spark import harness

    for q in (
        harness.txt_quality,
        harness.dd_line_dedup,
        harness.txt_filter_pipeline,
        harness.txt_corpus_e2e,
    ):
        plan = _plan(q(spark, SF))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, q
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q
