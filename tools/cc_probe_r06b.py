"""Round-6 probe #3: the connected-components loop's per-round plan.

Question (guide §2.4): does each propagation round re-shuffle (or
re-broadcast) the EDGE table, and would co-partitioning bidir by dst
once — so the per-round join finds both sides already hash(dst/node)
partitioned — remove a per-round exchange? Alternating A/B on the
sf0.1 linkage edge set; also prints the executed plan of one round.
Measurement-only — never run by the driver bench.

Usage: python tools/cc_probe_r06b.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from name_matcher_spark import harness  # noqa: E402
from name_matcher_spark.operators.clustering import encode_edges  # noqa: E402
from name_matcher_spark.operators.fuzzy_join import match_fuzzy  # noqa: E402
from name_matcher_spark.operators.prepare import prepare_persons  # noqa: E402
from name_matcher_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_edges(spark) -> DataFrame:
    pa = prepare_persons(harness.persons_a(spark, SF_DIR), include_middle=False).persist()
    pb = prepare_persons(harness.persons_b(spark, SF_DIR), include_middle=False).persist()
    pairs = match_fuzzy(pa, pb, include_middle=False)
    e = encode_edges(pairs, 0.95).localCheckpoint()
    n = e.count()
    print(f"edges: {n}", file=sys.stderr)
    pa.unpersist(); pb.unpersist()
    spark.catalog.clearCache()
    return e


def run_loop(e: DataFrame, copartition: bool, explain_round: int = -1) -> float:
    """Copy of connected_components' propagate loop with an optional
    dst-co-partitioned bidir. Returns wall seconds (loop only)."""
    spark = e.sparkSession
    bidir = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = bidir.count()
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(1, min(int(old_parts), -(-n_edges // 250_000)))
    t0 = time.time()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        if copartition:
            bidir = (
                bidir.repartition(loop_parts, "dst")
                .sortWithinPartitions("dst")
                .localCheckpoint(eager=True)
            )
        labels = (
            bidir.groupBy(F.col("src").alias("node"))
            .agg(F.min("dst").alias("_mn"))
            .select("node", F.least(F.col("_mn"), F.col("node")).alias("cluster_id"))
            .localCheckpoint(eager=False)
        )
        rounds = 0
        for i in range(25):
            tr = time.time()
            neighbor_labels = bidir.join(
                labels, bidir["dst"] == labels["node"], "inner"
            ).select(
                F.col("src").alias("node"),
                F.col("cluster_id"),
                F.lit(False).alias("is_self"),
            )
            merged = neighbor_labels.union(
                labels.select("node", "cluster_id", F.lit(True).alias("is_self"))
            )
            new_labels = (
                merged.groupBy("node")
                .agg(
                    F.min("cluster_id").alias("cluster_id"),
                    (
                        F.min("cluster_id")
                        < F.min(F.when(F.col("is_self"), F.col("cluster_id")))
                    ).alias("_changed"),
                )
                .localCheckpoint(eager=False)
            )
            any_changed = new_labels.filter(F.col("_changed")).count() > 0
            rounds += 1
            print(f"    round {i}: {time.time()-tr:.3f}s", file=sys.stderr)
            labels = new_labels.drop("_changed")
            if not any_changed:
                break
        wall = time.time() - t0
        lab_hash = (
            labels.agg(
                F.sum(F.hash("node", "cluster_id").cast("long")).alias("h"),
                F.count("*").alias("n"),
            ).collect()[0]
        )
        print(
            f"  copart={copartition} rounds={rounds} wall={wall:.3f}s "
            f"labels n={lab_hash['n']} h={lab_hash['h']}",
            file=sys.stderr,
        )
        return wall
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def show_plan(e: DataFrame, copartition: bool) -> None:
    """Print the FINAL executed plan of round 1's new_labels."""
    spark = e.sparkSession
    bidir = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = bidir.count()
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(1, min(int(old_parts), -(-n_edges // 250_000)))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        if copartition:
            bidir = (
                bidir.repartition(loop_parts, "dst")
                .sortWithinPartitions("dst")
                .localCheckpoint(eager=True)
            )
        labels = (
            bidir.groupBy(F.col("src").alias("node"))
            .agg(F.min("dst").alias("_mn"))
            .select("node", F.least(F.col("_mn"), F.col("node")).alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        neighbor_labels = bidir.join(
            labels, bidir["dst"] == labels["node"], "inner"
        ).select(
            F.col("src").alias("node"),
            F.col("cluster_id"),
            F.lit(False).alias("is_self"),
        )
        merged = neighbor_labels.union(
            labels.select("node", "cluster_id", F.lit(True).alias("is_self"))
        )
        new_labels = merged.groupBy("node").agg(
            F.min("cluster_id").alias("cluster_id")
        )
        new_labels.write.format("noop").mode("overwrite").save()
        print(f"=== round-1 executed plan (copart={copartition}) ===")
        print(new_labels._jdf.queryExecution().executedPlan().toString()[:4000])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def main() -> None:
    spark = get_spark(
        app_name="nms-cc-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    harness.persons_a(spark, SF_DIR).count()
    e = build_edges(spark)
    show_plan(e, copartition=False)
    show_plan(e, copartition=True)
    walls: dict[str, list[float]] = {"base": [], "copart": []}
    for rnd in range(4):
        for label, cp in (("base", False), ("copart", True)):
            walls[label].append(run_loop(e, cp))
    print({k: [round(x, 3) for x in v] for k, v in walls.items()})
    print(
        {k: round(min(v), 3) for k, v in walls.items()}, "(min of alternating)",
    )


if __name__ == "__main__":
    main()
