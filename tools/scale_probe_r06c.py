"""Round-6 final-tree scale spot-check (guide §1 / round brief:
"optimizations must hold at both sizes"). Re-runs the two scale probes
from the mid-round report on the FINAL tree — the text filter at a 10×
shifted-union corpus (now including the §12 langid barrier) and the
full linkage path (prepare → match → cluster) at 4× person tables —
noop-sink timed, min of 3. Measurement-only; never run by the driver.

Usage: python tools/scale_probe_r06c.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from name_matcher_spark import harness  # noqa: E402
from name_matcher_spark.operators.clustering import cluster_pairs  # noqa: E402
from name_matcher_spark.operators.fuzzy_join import match_fuzzy  # noqa: E402
from name_matcher_spark.operators.prepare import prepare_persons  # noqa: E402
from name_matcher_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def docs_x(spark, mult: int) -> DataFrame:
    d = harness._docs(spark, SF_DIR).select("doc_id", "text")
    parts = [
        d.select((F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"), "text")
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()


def persons_x(spark, mult: int):
    pa = harness.persons_a(spark, SF_DIR)
    pb = harness.persons_b(spark, SF_DIR)

    def shift(df, i):
        return df.select(
            (F.col("id") + F.lit(i * 10_000_000)).alias("id"),
            F.concat(F.col("uuid"), F.lit(f"_{i}")).alias("uuid"),
            "first_name", "middle_name", "last_name", "birthdate", "hh_id",
        )

    def rep(df):
        parts = [shift(df, i) for i in range(mult)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint()

    return rep(pa), rep(pb)


def main() -> None:
    spark = get_spark(
        app_name="nms-scale-probe-r06c",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    sc = spark.sparkContext
    harness.persons_a(spark, SF_DIR).count()

    # --- text filter 10x (includes the §12 langid barrier) ---
    from name_matcher_spark.operators.text import text_filter_pipeline

    corpus10 = docs_x(spark, 10)
    n = corpus10.count()
    print(f"corpus10 docs: {n}", file=sys.stderr)
    walls = []
    for i in range(3):
        sc.setJobDescription(f"scale: text_filter 10x pass{i}")
        t0 = time.time()
        text_filter_pipeline(corpus10).write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
        print(f"  text_filter 10x pass{i}: {walls[-1]}s", file=sys.stderr)
    print(f"text_filter_10x walls={walls} min={min(walls)}")

    # --- full linkage 4x ---
    pa4, pb4 = persons_x(spark, 4)
    na, nb = pa4.count(), pb4.count()
    print(f"persons 4x: a={na} b={nb}", file=sys.stderr)
    walls = []
    for i in range(3):
        sc.setJobDescription(f"scale: linkage 4x pass{i}")
        t0 = time.time()
        pp_a = prepare_persons(pa4, include_middle=False).persist()
        pp_b = prepare_persons(pb4, include_middle=False).persist()
        pairs = match_fuzzy(pp_a, pp_b, include_middle=False)
        nclus = cluster_pairs(pairs, threshold=0.95).count()
        walls.append(round(time.time() - t0, 3))
        print(f"  linkage 4x pass{i}: {walls[-1]}s rows={nclus}", file=sys.stderr)
        spark.catalog.clearCache()
    print(f"linkage_4x walls={walls} min={min(walls)}")


if __name__ == "__main__":
    main()
