"""Round-6 stage-level timing probe (guide §1): split the expensive
bench pipelines at their internal stage boundaries and time each piece
to a noop sink, so optimization effort lands where the time actually
goes. Measurement-only — never run by the driver bench.

Usage: python tools/stage_probe_r06.py [crawl|linkage|dedup|corpus|ngram|all]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from name_matcher_spark import harness  # noqa: E402
from name_matcher_spark.operators.prepare import prepare_persons  # noqa: E402
from name_matcher_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

T: dict[str, float] = {}


def timed(name: str, df: DataFrame) -> DataFrame:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    T[name] = round(time.time() - t0, 3)
    print(f"  {name}: {T[name]}s", file=sys.stderr)
    return df


def probe_crawl(spark):
    from name_matcher_spark.operators import web as web_mod
    from name_matcher_spark.operators.clustering import cluster_pairs
    from name_matcher_spark.operators.dedup import dedup_pipeline
    from name_matcher_spark.operators.extract import extract_entities
    from name_matcher_spark.operators.exact import match_algo1
    from name_matcher_spark.operators.web import url_dedup_groups

    t_all0 = time.time()
    fetches = harness._crawl_fetches(spark, SF_DIR)
    timed("crawl.fetches", fetches)
    groups = url_dedup_groups(fetches, ts_col="warc_ts", min_group=1)
    timed("crawl.url_groups", groups)
    t0 = time.time()
    pages = groups.join(
        fetches.select(F.col("url").alias("keep_url"), "warc_ts", "html"),
        "keep_url",
    ).select(
        harness._crawl_doc_id(F.col("canonical")).alias("doc_id"),
        "canonical",
        "n_urls",
        F.unix_timestamp("warc_ts").alias("kept_ts"),
        web_mod.utf8_text(F.col("html")).alias("page_html"),
    ).repartition(spark.sparkContext.defaultParallelism).localCheckpoint()
    T["crawl.pages_ckpt"] = round(time.time() - t0, 3)
    print(f"  crawl.pages_ckpt: {T['crawl.pages_ckpt']}s", file=sys.stderr)

    t0 = time.time()
    ents = extract_entities(
        pages.select(
            F.col("canonical").alias("url"),
            F.col("kept_ts").alias("warc_ts"),
            F.lit("en").alias("lang"),
            F.col("page_html").alias("text"),
        )
    ).select(
        harness._crawl_doc_id(F.col("url")).alias("id"),
        F.col("url").alias("uuid"),
        "entity_text",
        "first_name", "middle_name", "last_name", "birthdate", "hh_id",
    ).localCheckpoint()
    T["crawl.ents_ckpt"] = round(time.time() - t0, 3)
    print(f"  crawl.ents_ckpt: {T['crawl.ents_ckpt']}s", file=sys.stderr)

    t0 = time.time()
    dedup_pins: list[DataFrame] = []
    disp = dedup_pipeline(
        ents.select(F.col("id").alias("doc_id"), F.col("entity_text").alias("text")),
        shingle_k=13, verify_k=13, verify_threshold=0.8,
        max_doc_freq=None, minhash_hash_fn="md5", pins=dedup_pins,
        verify_mode="sets",
    ).localCheckpoint()
    for df in dedup_pins:
        df.unpersist()
    T["crawl.dedup_ckpt"] = round(time.time() - t0, 3)
    print(f"  crawl.dedup_ckpt: {T['crawl.dedup_ckpt']}s", file=sys.stderr)

    t0 = time.time()
    kept_ids = disp.filter(F.col("status") == "kept").select(F.col("doc_id").alias("id"))
    la = prepare_persons(ents.drop("entity_text").join(kept_ids, "id", "leftsemi"))
    lb = prepare_persons(harness.persons_b(spark, SF_DIR))
    pairs = (
        match_algo1(la, lb)
        .select("id_1", "id_2", "confidence")
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    T["crawl.pairs_ckpt"] = round(time.time() - t0, 3)
    print(f"  crawl.pairs_ckpt: {T['crawl.pairs_ckpt']}s", file=sys.stderr)

    t0 = time.time()
    counts = pairs.groupBy(F.col("id_1").alias("doc_id")).agg(F.count("*").alias("n_pair"))
    clus = (
        cluster_pairs(pairs, threshold=0.95)
        .filter(F.col("side") == "a")
        .select(F.col("id").alias("doc_id"), "cluster_id")
    )
    final = (
        pages.select("doc_id", "canonical", "n_urls", "kept_ts")
        .join(disp, "doc_id")
        .join(counts, "doc_id", "left")
        .join(clus, "doc_id", "left")
        .select(
            "doc_id", "canonical", "n_urls", "kept_ts", "status", "canonical_id",
            F.when(F.col("status") == "kept", F.coalesce("n_pair", F.lit(0)))
            .cast("long").alias("n_matches"),
            "cluster_id",
        )
    )
    timed("crawl.cluster_final", final)
    T["crawl.TOTAL"] = round(time.time() - t_all0, 3)


def probe_linkage(spark):
    from name_matcher_spark.operators.clustering import cluster_pairs
    from name_matcher_spark.operators.fuzzy_join import (
        candidates_bkey_cascade, match_fuzzy,
    )

    t_all0 = time.time()
    pa = prepare_persons(harness.persons_a(spark, SF_DIR), include_middle=False).persist()
    pb = prepare_persons(harness.persons_b(spark, SF_DIR), include_middle=False).persist()
    t0 = time.time()
    pa.count(); pb.count()
    T["linkage.prepare_persist"] = round(time.time() - t0, 3)
    print(f"  linkage.prepare_persist: {T['linkage.prepare_persist']}s", file=sys.stderr)
    timed("linkage.candidates", candidates_bkey_cascade(pa, pb, 10_000))
    pairs = match_fuzzy(pa, pb, include_middle=False)
    timed("linkage.match_fuzzy", pairs)
    timed("linkage.cluster", cluster_pairs(pairs, threshold=0.95))
    T["linkage.TOTAL"] = round(time.time() - t_all0, 3)
    spark.catalog.clearCache()


def probe_dedup(spark):
    from name_matcher_spark.operators.dedup import (
        dedup_pipeline, minhash_lsh_candidates, minhash_signatures,
        ngram_jaccard_pairs, shingles,
    )

    d = harness._docs(spark, SF_DIR).select("doc_id", "text")
    dup = d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    corpus = d.unionByName(dup)
    t_all0 = time.time()
    timed("dedup.shingles_k5", shingles(corpus, k=5))
    timed("dedup.sigs_md5", minhash_signatures(shingles(corpus, k=5), hash_fn="md5"))
    timed(
        "dedup.sigs_xxh",
        minhash_signatures(shingles(corpus, k=5), hash_fn="xxhash64"),
    )
    cands = minhash_lsh_candidates(corpus, hash_fn="md5")
    timed("dedup.lsh_cands", cands)
    timed(
        "dedup.verify",
        ngram_jaccard_pairs(corpus, candidates=cands, k=3, threshold=0.62, max_doc_freq=100),
    )
    timed("dedup.pipeline_full", dedup_pipeline(corpus, minhash_hash_fn="md5"))
    T["dedup.TOTAL"] = round(time.time() - t_all0, 3)


def probe_corpus(spark):
    from name_matcher_spark.operators.dedup import exact_duplicates, line_dedup
    from name_matcher_spark.operators.text import text_filter_pipeline

    extra = spark.createDataFrame(
        harness.LINEDEDUP_EXTRA_DOCS + harness.FILTER_EXTRA_DOCS + harness.CORPUS_EXTRA_DOCS,
        "doc_id long, text string",
    )
    corpus = harness._docs(spark, SF_DIR).select("doc_id", "text").unionByName(extra)
    t_all0 = time.time()
    cleaned = line_dedup(corpus, min_docs=harness._CORPUS_MIN_DOCS, hash_fn="md5")
    timed("corpus.line_dedup", cleaned)
    cdocs = cleaned.select("doc_id", F.col("clean_text").alias("text"))
    timed("corpus.filter", text_filter_pipeline(cdocs))
    timed("corpus.filter_alone", text_filter_pipeline(corpus))
    timed("corpus.exact_alone", exact_duplicates(corpus))
    timed("corpus.full", harness.txt_corpus_e2e(spark, SF_DIR))
    T["corpus.TOTAL"] = round(time.time() - t_all0, 3)


def probe_ngram(spark):
    from name_matcher_spark.operators.dedup import ngram_jaccard_pairs, shingles

    d = harness._docs(spark, SF_DIR)
    t_all0 = time.time()
    timed("ngram.shingles_k12", shingles(d, k=12))
    timed(
        "ngram.bench_variant",
        ngram_jaccard_pairs(d, k=12, threshold=0.5, max_doc_freq=250),
    )
    T["ngram.TOTAL"] = round(time.time() - t_all0, 3)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(
        app_name="nms-stage-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    # Warmup (bench.py parity)
    harness.persons_a(spark, SF_DIR).count()
    harness._docs(spark, SF_DIR).count()
    harness.ensure_phonetic_sidecar(spark, SF_DIR)
    from name_matcher_spark.fixtures.persons import make_dirty
    from name_matcher_spark.operators.clustering import cluster_pairs
    from name_matcher_spark.operators.fuzzy_join import match_fuzzy

    wa, wb, _ = make_dirty(500)
    wpa = prepare_persons(spark.createDataFrame(wa), include_middle=False)
    wpb = prepare_persons(spark.createDataFrame(wb), include_middle=False)
    cluster_pairs(match_fuzzy(wpa, wpb, include_middle=False)).count()
    spark.catalog.clearCache()

    probes = {
        "crawl": probe_crawl,
        "linkage": probe_linkage,
        "dedup": probe_dedup,
        "corpus": probe_corpus,
        "ngram": probe_ngram,
    }
    for name, fn in probes.items():
        if which in (name, "all"):
            print(f"== {name} ==", file=sys.stderr)
            fn(spark)
            spark.catalog.clearCache()
    print(json.dumps(T))


if __name__ == "__main__":
    main()
