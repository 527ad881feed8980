"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Timing excludes SparkSession startup (cluster amortized cost) but
includes full query execution to a materialized count. A warmup query
primes the JVM/Arrow paths so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from name_matcher_spark import harness  # noqa: E402
from name_matcher_spark.operators.clustering import cluster_pairs  # noqa: E402
from name_matcher_spark.operators.dedup import ngram_jaccard_pairs  # noqa: E402
from name_matcher_spark.operators.fuzzy_join import match_fuzzy  # noqa: E402
from name_matcher_spark.operators.prepare import prepare_persons  # noqa: E402
from name_matcher_spark.session import get_spark  # noqa: E402


def linkage_e2e(spark, sf_dir: str):
    """Flagship: derive persons -> prepare -> blocked fuzzy match ->
    transitive clustering. Returns the cluster assignment DataFrame.
    Prepared columns are cached — candidates and payload share them."""
    pa = prepare_persons(harness.persons_a(spark, sf_dir), include_middle=False).persist()
    pb = prepare_persons(harness.persons_b(spark, sf_dir), include_middle=False).persist()
    pairs = match_fuzzy(pa, pb, include_middle=False)
    return cluster_pairs(pairs, threshold=0.95)


def wp_linkage_e2e(spark, sf_dir: str):
    """North-star path: pages(url, warc_ts, html, text, lang) ->
    extract_entities -> prepare -> blocked fuzzy match -> clustering."""
    from name_matcher_spark.operators.extract import extract_entities

    ea = extract_entities(
        harness._persons_to_pages(harness.persons_a(spark, sf_dir), "a")
    ).withColumnRenamed("url", "uuid")
    eb = extract_entities(
        harness._persons_to_pages(harness.persons_b(spark, sf_dir), "b")
    ).withColumnRenamed("url", "uuid")
    pa = prepare_persons(ea, include_middle=False).persist()
    pb = prepare_persons(eb, include_middle=False).persist()
    pairs = match_fuzzy(pa, pb, include_middle=False)
    return cluster_pairs(pairs, threshold=0.95)


BENCH_QUERIES = {
    "linkage_e2e": linkage_e2e,
    "wp_linkage_e2e": wp_linkage_e2e,
    "lk_algo1_pairs": harness.lk_algo1_pairs,
    "lk_fuzzy_pairs": harness.lk_fuzzy_pairs,
    "lk_household_pct": harness.lk_household_pct,
    "q_pricing_summary": harness.q_pricing_summary,
    "q_events_sessions": harness.q_events_sessions,
    "dd_minhash_bands": harness.dd_minhash_bands,
    # Bench variant: long shingles + doc-frequency cap (the oracle
    # registry runs the same capped scale path, mirrored in its SQL).
    "dd_ngram_jaccard": lambda spark, sf_dir: ngram_jaccard_pairs(
        harness._docs(spark, sf_dir), k=12, threshold=0.5, max_doc_freq=250
    ),
    "txt_quality": harness.txt_quality,
    "sim_cosine_topk": harness.sim_cosine_topk,
    # Round-3 additions: the tiered dedup pipeline (exact -> LSH ->
    # ngram verify -> clusters -> keep-one, one lazy plan) and the
    # crawl URL-canonicalization dedup pass.
    "dd_pipeline": harness.dd_pipeline,
    "wp_url_canon": harness.wp_url_canon,
    # Round-4 addition: the full crawl composition — URL dedup (latest-
    # crawl survivor) -> html_to_text -> tiered dedup -> extract ->
    # algo1 linkage -> clusters, one lazy plan (the north-star demo).
    "wp_crawl_e2e": harness.wp_crawl_e2e,
    # Round-4 text-pipeline additions: CCNet line dedup and the
    # composed C4/Gopher quality filter (quality + repetition + langid
    # verdicts in one lazy plan).
    "dd_line_dedup": harness.dd_line_dedup,
    "txt_filter_pipeline": harness.txt_filter_pipeline,
    # ... and their composition: boilerplate strip -> quality filter on
    # cleaned text -> exact dedup of the keepers, one lazy plan.
    "txt_corpus_e2e": harness.txt_corpus_e2e,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0
    except ValueError:
        sf = -1.0  # suffixed dir names (sf0.1-old) must not kill the bench

    spark = get_spark(
        app_name="nms-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    # Warmup: JVM JIT + Arrow + Python worker pool. The UDF stage
    # cold-starts one interpreter per task slot (~0.5s each, all at
    # once on the first UDF stage); a long-lived cluster amortizes
    # this, so the timed region should reflect steady state.
    harness.persons_a(spark, sf_dir).count()
    harness._docs(spark, sf_dir).count()
    # The phonetic oracle sidecar is correctness-gate support (DuckDB-
    # side inputs), not engine work — write it once here so the timed
    # region measures the linkage pipeline only.
    harness.ensure_phonetic_sidecar(spark, sf_dir)
    from name_matcher_spark.functions.similarity import jaro_winkler_pct_udf

    warm = spark.range(0, cpus * 8, 1, cpus * 8).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("s")
    )
    warm.select(jaro_winkler_pct_udf("s", "s").alias("x")).agg(F.sum("x")).collect()
    # JIT the whole-stage-codegen'd ladder + Java kernel + cascade plan
    # shapes on a tiny corpus so the first timed e2e isn't a compiler
    # benchmark (~8 s of C2 on the first heavy query otherwise).
    from name_matcher_spark.fixtures.persons import make_dirty

    wa, wb, _ = make_dirty(500)
    wpa = prepare_persons(spark.createDataFrame(wa), include_middle=False)
    wpb = prepare_persons(spark.createDataFrame(wb), include_middle=False)
    cluster_pairs(match_fuzzy(wpa, wpb, include_middle=False)).count()
    spark.catalog.clearCache()

    # min-of-k per query: the sandbox host shows bursty steal time
    # (observed 15s..56s on IDENTICAL e2e runs in one session); the min
    # is the least-noise estimate. The two e2e pipelines get an extra
    # pass — they're the headline numbers and the longest exposure to a
    # steal burst. Each pass is timed standalone — caches a query
    # pinned are dropped before the next (left in place, the e2e
    # pipelines' persisted tables inflate every later query via
    # executor memory pressure).
    times: dict[str, float] = {}
    n_rows: dict[str, int] = {}
    for name, fn in BENCH_QUERIES.items():
        # wp_crawl_e2e runs ~7 internally-materialized stages (~90 s
        # at sf0.1) — one pass: steal-noise amortizes across its many
        # jobs, and 3 passes would dominate the whole bench wall.
        if name == "wp_crawl_e2e":
            passes = 1
        else:
            passes = 3 if name.endswith("e2e") else 2
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            n_rows[name] = fn(spark, sf_dir).count()
            best = min(best, round(time.time() - t0, 3))
            spark.catalog.clearCache()
        times[name] = best

    # Throughput: pages (person records, the engine's input unit)
    # through the full blocking->scoring->clustering path per second.
    n_input = harness.persons_a(spark, sf_dir).count() + harness.persons_b(
        spark, sf_dir
    ).count()
    pages_per_sec = round(n_input / times["linkage_e2e"], 1)

    out = {
        "metric": "total_bench_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "rows": n_rows,
        "linkage_pages_per_sec": pages_per_sec,
        # html-in -> clusters-out (includes page synthesis + extraction)
        "wp_pages_per_sec": round(n_input / times["wp_linkage_e2e"], 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
