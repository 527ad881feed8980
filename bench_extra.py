"""Round-6 optimization measurement harness (guide §1).

NOT the frozen driver bench — bench.py stays untouched. This tool:

* times each registered bench query to a noop sink (guide §1.4: every
  column of every row computed, no count()-pruning, no output cost),
  min-of-k, labeled jobs;
* captures .explain("formatted") for each query into plans/r06/;
* can run a single query repeatedly for focused A/Bs.

Usage:
  python bench_extra.py                 # all queries, noop-timed
  python bench_extra.py linkage_e2e 5   # one query, 5 passes
  python bench_extra.py --plans         # only write explain files
  PLAN_TAG=after python bench_extra.py --plans  # suffix _after.txt
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
from name_matcher_spark.session import get_spark  # noqa: E402


def _bench_queries():
    import bench

    return bench.BENCH_QUERIES


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plans_only = "--plans" in sys.argv
    tag = os.environ.get("PLAN_TAG", "before")

    spark = get_spark(
        app_name="nms-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    queries = _bench_queries()
    if args and args[0] in queries:
        passes = int(args[1]) if len(args) > 1 else 3
        queries = {args[0]: queries[args[0]]}
    else:
        passes = int(args[1]) if len(args) > 1 else 2

    # Warmup mirrors bench.py: JVM JIT + Arrow + Python worker pool.
    harness.persons_a(spark, sf_dir).count()
    harness._docs(spark, sf_dir).count()
    harness.ensure_phonetic_sidecar(spark, sf_dir)
    from name_matcher_spark.functions.similarity import jaro_winkler_pct_udf

    warm = spark.range(0, cpus * 8, 1, cpus * 8).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("s")
    )
    warm.select(jaro_winkler_pct_udf("s", "s").alias("x")).agg(F.sum("x")).collect()
    from name_matcher_spark.fixtures.persons import make_dirty
    from name_matcher_spark.operators.clustering import cluster_pairs
    from name_matcher_spark.operators.fuzzy_join import match_fuzzy
    from name_matcher_spark.operators.prepare import prepare_persons

    wa, wb, _ = make_dirty(500)
    wpa = prepare_persons(spark.createDataFrame(wa), include_middle=False)
    wpb = prepare_persons(spark.createDataFrame(wb), include_middle=False)
    cluster_pairs(match_fuzzy(wpa, wpb, include_middle=False)).count()
    spark.catalog.clearCache()

    plan_dir = Path(__file__).resolve().parent / "plans" / "r06"
    plan_dir.mkdir(parents=True, exist_ok=True)

    if plans_only:
        import contextlib
        import io

        for name, fn in queries.items():
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (plan_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
            spark.catalog.clearCache()
            print(f"wrote {name}_{tag}.txt", file=sys.stderr)
        return

    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name, fn in queries.items():
        best = float("inf")
        samples[name] = []
        for i in range(passes):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            _noop(fn(spark, sf_dir))
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            best = min(best, dt)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        times[name] = best
    print(
        json.dumps(
            {
                "metric": "noop_bench",
                "value": round(sum(times.values()), 3),
                "queries": times,
                "samples": samples,
                "sf_dir": sf_dir,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
