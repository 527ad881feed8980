"""Round-6 probe #2: decompose the crawl dedup tier and the linkage
clustering loop — the places probe #1 showed the time hides (plan-
construction driver actions + the 14s crawl dedup checkpoint).
Measurement-only."""

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


def tnoop(name, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    T[name] = round(time.time() - t0, 3)
    print(f"  {name}: {T[name]}s", file=sys.stderr)
    return df


def crawl_entities(spark):
    from name_matcher_spark.operators import web as web_mod
    from name_matcher_spark.operators.extract import extract_entities
    from name_matcher_spark.operators.web import url_dedup_groups

    fetches = harness._crawl_fetches(spark, SF_DIR)
    groups = url_dedup_groups(fetches, ts_col="warc_ts", min_group=1)
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
    return ents


def probe_crawl_dedup(spark):
    from name_matcher_spark.operators.dedup import (
        _norm_text, band_buckets, minhash_lsh_candidates, minhash_signatures,
        ngram_jaccard_pairs, shingles,
    )

    ents = crawl_entities(spark)
    docs = ents.select(F.col("id").alias("doc_id"), F.col("entity_text").alias("text"))
    docs = docs.localCheckpoint()  # isolate the tier itself

    # exact tier
    hashed = docs.select(
        "doc_id",
        F.coalesce(
            F.md5(F.encode(_norm_text(F.col("text")), "UTF-8")),
            F.concat(F.lit("__null__"), F.col("doc_id").cast("string")),
        ).alias("_h"),
    )
    canon = hashed.groupBy("_h").agg(F.min("doc_id").alias("_exact_canon"))
    assigned = hashed.join(canon, "_h").select("doc_id", "_exact_canon")
    surv = docs.join(
        assigned.filter(F.col("doc_id") == F.col("_exact_canon")).select("doc_id"),
        "doc_id", "leftsemi",
    )
    tnoop("cd.exact_surv", surv)
    surv = surv.localCheckpoint()
    print(f"  n_surv={surv.count()}", file=sys.stderr)

    tnoop("cd.shingles13", shingles(surv, k=13))
    tnoop("cd.sigs_md5", minhash_signatures(shingles(surv, k=13), hash_fn="md5"))
    tnoop("cd.buckets", band_buckets(surv, k=13, hash_fn="md5"))
    cands = minhash_lsh_candidates(surv, k=13, hash_fn="md5")
    tnoop("cd.lsh_cands", cands)
    n_cands = cands.count()
    print(f"  n_cands={n_cands}", file=sys.stderr)
    cands_ck = cands.localCheckpoint()
    tnoop(
        "cd.verify_sets",
        ngram_jaccard_pairs(
            surv, candidates=cands_ck, k=13, threshold=0.8,
            max_doc_freq=None, mode="sets",
        ),
    )
    tnoop(
        "cd.verify_join",
        ngram_jaccard_pairs(
            surv, candidates=cands_ck, k=13, threshold=0.8,
            max_doc_freq=None, mode="join",
        ),
    )
    verified = ngram_jaccard_pairs(
        surv, candidates=cands_ck, k=13, threshold=0.8,
        max_doc_freq=None, mode="sets",
    ).select("id_a", "id_b").localCheckpoint()
    print(f"  n_verified={verified.count()}", file=sys.stderr)

    from name_matcher_spark.operators.clustering import connected_components

    t0 = time.time()
    comp = connected_components(
        verified.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    T["cd.cc_construct"] = round(time.time() - t0, 3)
    print(f"  cd.cc_construct: {T['cd.cc_construct']}s", file=sys.stderr)
    tnoop("cd.cc_final", comp)


def probe_linkage_detail(spark):
    from name_matcher_spark.operators.clustering import (
        cluster_pairs, encode_edges,
    )
    from name_matcher_spark.operators.fuzzy_join import match_fuzzy

    t0 = time.time()
    pa = prepare_persons(harness.persons_a(spark, SF_DIR), include_middle=False).persist()
    pb = prepare_persons(harness.persons_b(spark, SF_DIR), include_middle=False).persist()
    pa.count(); pb.count()
    T["lk.prepare"] = round(time.time() - t0, 3)
    print(f"  lk.prepare: {T['lk.prepare']}s", file=sys.stderr)

    t0 = time.time()
    pairs = match_fuzzy(pa, pb, include_middle=False)
    T["lk.match_construct"] = round(time.time() - t0, 3)
    print(f"  lk.match_construct: {T['lk.match_construct']}s (driver actions in cascade)", file=sys.stderr)
    tnoop("lk.pairs_noop", pairs)
    pairs_ck = pairs.localCheckpoint()

    t0 = time.time()
    clus = cluster_pairs(pairs_ck, threshold=0.95)
    T["lk.cluster_construct"] = round(time.time() - t0, 3)
    print(f"  lk.cluster_construct: {T['lk.cluster_construct']}s (CC loop jobs)", file=sys.stderr)
    tnoop("lk.cluster_final", clus)

    # how many rounds does the propagate loop run?
    edges = encode_edges(pairs_ck, 0.95)
    e = edges.select(F.col("src"), F.col("dst"))
    bidir = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    labels = bidir.select(F.col("src").alias("node")).distinct().withColumn(
        "cluster_id", F.col("node")
    ).localCheckpoint(eager=False)
    bidir = bidir.localCheckpoint(eager=False)
    rounds = 0
    for _ in range(25):
        t0 = time.time()
        neighbor_labels = bidir.join(labels, bidir["dst"] == labels["node"], "inner").select(
            F.col("src").alias("node"), F.col("cluster_id"), F.lit(False).alias("is_self")
        )
        merged = neighbor_labels.union(
            labels.select("node", "cluster_id", F.lit(True).alias("is_self"))
        )
        new_labels = (
            merged.groupBy("node")
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                (F.min("cluster_id") < F.min(F.when(F.col("is_self"), F.col("cluster_id")))).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        rounds += 1
        print(f"    round {rounds}: changed={changed} dt={time.time()-t0:.3f}s", file=sys.stderr)
        if changed == 0:
            break
    T["lk.cc_rounds"] = rounds
    spark.catalog.clearCache()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(
        app_name="nms-probe2", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
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

    if which in ("crawl", "all"):
        print("== crawl dedup tier ==", file=sys.stderr)
        probe_crawl_dedup(spark)
        spark.catalog.clearCache()
    if which in ("linkage", "all"):
        print("== linkage detail ==", file=sys.stderr)
        probe_linkage_detail(spark)
    print(json.dumps(T))


if __name__ == "__main__":
    main()
