"""A/B: does pinning fan-out on the LSH candidate set (repartition
before the verify join) fix the 1-task verify stage? Measurement-only."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from name_matcher_spark import harness  # noqa: E402
from name_matcher_spark.session import get_spark  # noqa: E402
from tools.stage_probe2_r06 import crawl_entities  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    spark = get_spark(
        app_name="nms-ab-verify", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    harness.persons_a(spark, SF_DIR).count()
    from name_matcher_spark.operators.dedup import (
        minhash_lsh_candidates, ngram_jaccard_pairs,
    )

    ents = crawl_entities(spark)
    docs = ents.select(
        F.col("id").alias("doc_id"), F.col("entity_text").alias("text")
    ).localCheckpoint()
    surv = docs  # skip exact tier; it's not the variable here
    cands = minhash_lsh_candidates(surv, k=13, hash_fn="md5").localCheckpoint()
    print("n_cands", cands.count(), "parts", cands.rdd.getNumPartitions(), file=sys.stderr)

    for label, c in [
        ("as-is", cands),
        ("repart32", cands.repartition(spark.sparkContext.defaultParallelism)),
    ]:
        for i in range(3):
            t0 = time.time()
            ngram_jaccard_pairs(
                surv, candidates=c, k=13, threshold=0.8,
                max_doc_freq=None, mode="sets",
            ).write.format("noop").mode("overwrite").save()
            print(f"{label} pass{i}: {time.time()-t0:.3f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
