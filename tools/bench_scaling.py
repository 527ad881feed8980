"""Scaling-efficiency evidence (BASELINE.json: throughput efficiency
>= 0.8 from N to 4N executors, proxied in this sandbox as local[8] vs
local[32] on IDENTICAL input per the driver's instructions).

Runs the full linkage pipeline (prepare -> blocked fuzzy match ->
transitive clustering) over a seeded 100k x 100k dirty person corpus
(FIXTURES.md §6 bench scale point) at both parallelism levels in
separate processes, then reports throughput at each and the
efficiency ratio. Results go to BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [size] [--runs N]
Child mode (internal): python tools/bench_scaling.py --child CPUS DIR SIZE
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CACHE = REPO / ".bench_cache"


def ensure_fixture(size: int) -> Path:
    out = CACHE / f"dirty_{size}"
    if (out / "a.parquet").exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    from name_matcher_spark.fixtures.persons import make_dirty

    a, b, pairs = make_dirty(size)
    a.to_parquet(out / "a.parquet", index=False)
    b.to_parquet(out / "b.parquet", index=False)
    pairs.to_parquet(out / "pairs.parquet", index=False)
    return out


def child(cpus: int, data_dir: str, size: int) -> None:
    from name_matcher_spark.operators.clustering import cluster_pairs
    from name_matcher_spark.operators.fuzzy_join import match_fuzzy
    from name_matcher_spark.operators.prepare import prepare_persons
    from name_matcher_spark.session import get_spark

    # Cluster-size simulation: the PLAN (partition counts) is held
    # IDENTICAL across parallelism levels — exactly like running the
    # same job on N vs 4N executors — only the number of concurrent
    # task slots differs.
    partitions = 64
    spark = get_spark(
        app_name=f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=partitions,
    )
    # Ingest fan-out (single-file source -> one scan partition would
    # serialize the UDF projection; see harness.persons_a note).
    a = spark.read.parquet(f"{data_dir}/a.parquet").repartition(partitions)
    b = spark.read.parquet(f"{data_dir}/b.parquet").repartition(partitions)
    # Warmup: materialize inputs AND cold-start the Python worker pool
    # across every task slot (each worker pays interpreter + pandas
    # import on first use — ~0.5s each, and N of them start at once on
    # the first UDF stage). A long-lived cluster amortizes this; the
    # timed region should reflect steady state.
    a.count(), b.count()
    from name_matcher_spark.functions.similarity import jaro_winkler_pct_udf
    import pyspark.sql.functions as F
    warm = spark.range(0, cpus * 8, 1, cpus * 8).select(
        F.concat(F.lit("warm"), F.col("id").cast("string")).alias("s")
    )
    warm.select(jaro_winkler_pct_udf("s", "s").alias("x")).agg(F.sum("x")).collect()

    # The sandbox host has visible steal time (noisy neighbors); a
    # single run is not a measurement. Three repeats in one session
    # (steady-state: workers warm, code JIT'd), min taken as the
    # least-noise estimate.
    walls = []
    n_clustered = 0
    for _ in range(3):
        t0 = time.time()
        pa = prepare_persons(a, include_middle=False).persist()
        pb = prepare_persons(b, include_middle=False).persist()
        pairs = match_fuzzy(pa, pb, include_middle=False, max_block_rows=2000)
        clusters = cluster_pairs(pairs, threshold=0.95)
        n_clustered = clusters.count()
        walls.append(round(time.time() - t0, 2))
        pa.unpersist(), pb.unpersist()
        spark.catalog.clearCache()
    wall = min(walls)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_sec": wall,
                "walls": walls,
                "rows_in": 2 * size,
                "pages_per_sec": round(2 * size / wall, 1),
                "n_clustered": n_clustered,
            }
        )
    )


def run_child(
    cpus: int, data_dir: Path, size: int, via_submit: bool = False
) -> dict:
    """Run one parallelism level in its own process. ``via_submit``
    launches it through REAL ``spark-submit --py-files nms.zip --jars
    nms-udfs.jar --master local[N]`` — the literal deploy contract of
    the north rule — instead of a plain Python child; the measured
    pipeline is identical."""
    env = dict(os.environ)
    if via_submit:
        from pathlib import Path as _P

        import pyspark

        from tools.make_pyfiles_zip import build as build_zip

        submit = str(_P(pyspark.__file__).parent / "bin" / "spark-submit")
        zip_path = str(build_zip("nms.zip"))
        jar = str(REPO / "name_matcher_spark" / "javaudf" / "nms-udfs.jar")
        # NMS_MASTER tells the child get_spark call the master is set
        # by spark-submit; the child still pins shuffle partitions.
        cmd = [
            submit, "--master", f"local[{cpus}]",
            # spark-submit starts the JVM itself, so get_spark's
            # spark.driver.memory config cannot apply — pass it here or
            # the child runs on the 1g default and dies at bench scale.
            "--driver-memory", os.environ.get("NMS_DRIVER_MEM", "8g"),
            "--py-files", zip_path, "--jars", jar,
            __file__, "--child", str(cpus), str(data_dir), str(size),
        ]
    else:
        cmd = [
            sys.executable, __file__,
            "--child", str(cpus), str(data_dir), str(size),
        ]
    proc = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        env=env,
        check=False,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child failed: {proc.stdout[-500:]}\n{proc.stderr[-2000:]}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--kernel-child":
        kernel_child(int(sys.argv[2]), sys.argv[3])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--longlev-child":
        longlev_child(int(sys.argv[2]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--longlev":
        run_longlev()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--crawl-child":
        crawl_child(int(sys.argv[2]), sys.argv[3])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--corpus-child":
        corpus_child(int(sys.argv[2]), sys.argv[3])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--corpus":
        levels = (4, 16)
        if "--levels" in sys.argv:
            i = sys.argv.index("--levels")
            levels = tuple(int(x) for x in sys.argv[i + 1].split(","))
        inflate = 0
        if "--inflate" in sys.argv:
            inflate = int(sys.argv[sys.argv.index("--inflate") + 1])
        run_corpus(levels, inflate)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--crawl":
        levels = (4, 16)
        if "--levels" in sys.argv:
            i = sys.argv.index("--levels")
            levels = tuple(int(x) for x in sys.argv[i + 1].split(","))
        inflate = 0
        if "--inflate" in sys.argv:
            inflate = int(sys.argv[sys.argv.index("--inflate") + 1])
        run_crawl(levels, inflate, via_submit="--via-submit" in sys.argv)
        return
    argv = list(sys.argv[1:])
    levels = (8, 32)
    if "--levels" in argv:
        i = argv.index("--levels")
        levels = tuple(int(x) for x in argv[i + 1].split(","))
        del argv[i : i + 2]
    via_submit = "--via-submit" in argv
    if via_submit:
        argv.remove("--via-submit")
    size = int(argv[0]) if argv else 500_000
    lo, hi = levels
    factor = hi / lo
    data_dir = ensure_fixture(size)
    print(f"fixture ready: {data_dir} ({size} rows/side), levels {lo}->{hi}")

    cand_dir = ensure_candidates(size)
    print(f"candidates ready: {cand_dir}")

    results = {}
    for cpus in levels:
        results[cpus] = run_child(cpus, data_dir, size, via_submit=via_submit)
        print(cpus, "->", results[cpus])

    kresults = {}
    for cpus in levels:
        kenv = dict(os.environ)
        # The persisted candidate table grows with `size` and the scoring
        # working set with task slots; the 8g get_spark default OOMs the
        # 105.9M-pair kernel at 32 threads (GCLocker alloc storms).
        # Scale the child heap with input size AND slot count (both
        # drive the working set) unless the caller pinned it.
        kenv.setdefault(
            "NMS_DRIVER_MEM",
            "24g" if size >= 1_000_000 or cpus >= 32 else "8g",
        )
        proc = subprocess.run(
            [sys.executable, __file__, "--kernel-child", str(cpus), str(cand_dir)],
            capture_output=True, text=True, check=False, timeout=3600, env=kenv,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                kresults[cpus] = json.loads(line)
        if cpus not in kresults:
            # tolerated (the e2e rows still publish) but NEVER silent:
            # a benchmark record missing its kernel_* keys must say why
            print(
                f"kernel {cpus} -> FAILED (no JSON line); stderr tail: "
                f"{proc.stderr[-500:]}",
                file=sys.stderr,
            )
        else:
            print("kernel", cpus, "->", kresults.get(cpus))

    host = host_calibration(levels)
    print("host calibration:", host)

    tlo, thi = results[lo]["wall_sec"], results[hi]["wall_sec"]
    speedup = tlo / thi
    tag = f"{lo}_to_{hi}"
    summary = {
        "input": f"dirty {size}x{size} persons (seeded, FIXTURES.md §6)",
        f"local{lo}": results[lo],
        f"local{hi}": results[hi],
        f"speedup_{tag}": round(speedup, 3),
        "scaling_efficiency": round(speedup / factor, 3),
        f"host_calibration_mp_speedup_{tag}": host["speedup"],
    }
    # A kernel child can fail (e.g. heap exhaustion at the 100M-pair
    # point without NMS_DRIVER_MEM=24g); keep the e2e results anyway.
    if lo in kresults and hi in kresults:
        kspeed = kresults[lo]["wall_sec"] / kresults[hi]["wall_sec"]
        summary.update({
            f"kernel_local{lo}": kresults[lo],
            f"kernel_local{hi}": kresults[hi],
            f"kernel_speedup_{tag}": round(kspeed, 3),
            "kernel_scaling_efficiency": round(kspeed / factor, 3),
            "kernel_efficiency_vs_host_ceiling": round(kspeed / host["speedup"], 3),
        })
    print(json.dumps(summary, indent=2))
    out = REPO / "BENCH"
    out.mkdir(exist_ok=True)
    # Merge, don't clobber: --longlev results and other level pairs
    # live in the same file (non-default level pairs are namespaced).
    path = out / "scaling_latest.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    if via_submit:
        summary["deploy"] = "spark-submit --py-files nms.zip --jars nms-udfs.jar"
        data[f"via_submit_{tag}"] = summary
    elif levels == (8, 32):
        data.update(summary)
    else:
        data[f"levels_{tag}"] = summary
    path.write_text(json.dumps(data, indent=2))




# ---------------------------------------------------------------------------
# Kernel-level scaling: the scoring stage alone on pre-materialized
# candidate pairs (the engine's core compute — the analogue of the
# reference's own matching-throughput benchmark).
# ---------------------------------------------------------------------------


def ensure_candidates(size: int) -> Path:
    out = CACHE / f"cands_{size}"
    if (out / "_SUCCESS").exists():
        return out
    from name_matcher_spark.operators.fuzzy_join import (
        _PAYLOAD_COLS,
        _prefixed,
        candidates_bkey_cascade,
    )
    from name_matcher_spark.operators.prepare import prepare_persons
    from name_matcher_spark.session import get_spark

    data_dir = ensure_fixture(size)
    spark = get_spark(app_name="cand-gen", master="local[32]", shuffle_partitions=64)
    a = spark.read.parquet(f"{data_dir}/a.parquet").repartition(64)
    b = spark.read.parquet(f"{data_dir}/b.parquet").repartition(64)
    pa = prepare_persons(a, include_middle=False).persist()
    pb = prepare_persons(b, include_middle=False).persist()
    cands = candidates_bkey_cascade(pa, pb, 2000)
    from pyspark.sql import functions as F

    # PRE-birthdate-gate candidates: the kernel bench measures scoring
    # throughput, and the ungated set is ~25x larger — enough parallel
    # work to measure scaling above fixed overheads.
    pairs = (
        cands.join(_prefixed(pa, "l_", _PAYLOAD_COLS), "l_id")
        .join(_prefixed(pb, "r_", _PAYLOAD_COLS), "r_id")
    )
    pairs.write.mode("overwrite").parquet(str(out))
    spark.stop()
    return out


def kernel_child(cpus: int, cand_dir: str) -> None:
    import pyspark.sql.functions as F

    from name_matcher_spark.functions.fuzzy import score_candidate_pairs
    from name_matcher_spark.session import get_spark

    partitions = 128
    spark = get_spark(
        app_name=f"kernel-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=partitions,
    )
    pairs = spark.read.parquet(cand_dir).repartition(partitions).persist()
    n_in = pairs.count()
    walls = []
    n_out = 0
    for _ in range(3):
        t0 = time.time()
        n_out = (
            score_candidate_pairs(pairs, include_middle=False)
            .agg(F.sum("score"))
            .collect()
        )
        walls.append(round(time.time() - t0, 2))
    wall = min(walls)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_sec": wall,
                "walls": walls,
                "pairs_in": n_in,
                "pairs_per_sec": round(n_in / wall, 1),
            }
        )
    )


def longlev_child(cpus: int) -> None:
    """High compute-per-byte engine stage: the exact lev_pct_col kernel
    (similarity.py) over deterministic ~300-char strings. Levenshtein is
    O(n^2) compute on O(n) bytes, so per-task work stays cache-resident
    and the stage exposes the CPU scaling the short-string profiles
    can't (they saturate this box's memory subsystem by 8 threads)."""
    import pyspark.sql.functions as F

    from name_matcher_spark.functions.similarity import lev_pct_col
    from name_matcher_spark.session import get_spark

    spark = get_spark(
        app_name=f"longlev-{cpus}", master=f"local[{cpus}]", shuffle_partitions=64
    )
    rows, reps = 250_000, 33  # ~300-char strings
    df = (
        spark.range(0, rows, 1, 64)
        .select(
            F.repeat(
                F.concat(F.lit("abcdefgh"), (F.col("id") % 7).cast("string")), reps
            ).alias("a"),
            F.concat(
                F.repeat(
                    F.concat(F.lit("abcdefgh"), (F.col("id") % 5).cast("string")), reps
                ),
                (F.col("id") % 13).cast("string"),
            ).alias("b"),
        )
        .persist()
    )
    df.count()
    walls = []
    for _ in range(5):
        t0 = time.time()
        df.select(lev_pct_col(F.col("a"), F.col("b")).alias("p")).agg(
            F.sum("p")
        ).collect()
        walls.append(round(time.time() - t0, 2))
    wall = min(walls)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_sec": wall,
                "walls": walls,
                "rows": rows,
                "rows_per_sec": round(rows / wall, 1),
            }
        )
    )


def run_longlev() -> dict:
    """Run the long-string kernel at both N->4N pairs (4->16 and
    8->32); merge into BENCH/scaling_latest.json (additive — the
    full-pipeline rows are expensive and measured separately).

    The 4->16 pair is the cleaner cluster analogue on this box: at 32
    threads the VM shares its memory subsystem with noisy neighbors,
    while 4->16 leaves headroom — exactly like executors that don't
    oversubscribe their host."""
    res = {}
    for cpus in (4, 16, 8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--longlev-child", str(cpus)],
            capture_output=True, text=True, check=False, timeout=1200,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                res[cpus] = json.loads(line)
        if cpus not in res:
            raise RuntimeError(f"longlev child failed: {proc.stderr[-1500:]}")
        print("longlev", cpus, "->", res[cpus])
    merged = {}
    for lo, hi in ((4, 16), (8, 32)):
        speed = res[lo]["wall_sec"] / res[hi]["wall_sec"]
        merged[f"longlev_local{lo}"] = res[lo]
        merged[f"longlev_local{hi}"] = res[hi]
        merged[f"longlev_speedup_{lo}_to_{hi}"] = round(speed, 3)
        merged[f"longlev_scaling_efficiency_{lo}_to_{hi}"] = round(speed / 4.0, 3)
    path = REPO / "BENCH" / "scaling_latest.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    data.update(merged)
    path.write_text(json.dumps(data, indent=2))
    print(json.dumps(merged, indent=2))
    return merged


def crawl_child(cpus: int, sf_dir: str) -> None:
    """The crawl-composition query (harness.wp_crawl_e2e: URL dedup ->
    extract -> tiered dedup -> linkage -> clusters) at one parallelism
    level. Shuffle partitions are pinned (64) so the PLAN is identical
    across levels — only the concurrent task slots differ, the local-
    mode proxy for N vs 4N executors. min-of-2 after a warmup pass
    (the chain JITs ~7 distinct stage shapes; the first pass is a
    compiler benchmark)."""
    from name_matcher_spark import harness
    from name_matcher_spark.session import get_spark

    spark = get_spark(
        app_name=f"crawl-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
    )
    harness.persons_a(spark, sf_dir).count()
    passes = int(os.environ.get("NMS_CRAWL_PASSES", "3"))
    walls, docs = [], 0
    for _ in range(passes):
        t0 = time.time()
        docs = harness.wp_crawl_e2e(spark, sf_dir).count()
        walls.append(round(time.time() - t0, 2))
    wall = min(walls[1:])  # drop the JIT-dominated first pass
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_sec": wall,
                "walls": walls,
                "docs": docs,
                "docs_per_sec": round(docs / wall, 1),
            }
        )
    )


def corpus_child(cpus: int, sf_dir: str) -> None:
    """The text-corpus composition (harness.txt_corpus_e2e: CCNet line
    dedup -> quality filter on cleaned text -> exact dedup) at one
    parallelism level; shuffle partitions pinned (64) so only the
    task-slot count differs between levels. min-of-rest after a warmup
    pass, same protocol as crawl_child."""
    from name_matcher_spark import harness
    from name_matcher_spark.session import get_spark

    spark = get_spark(
        app_name=f"corpus-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
    )
    harness._docs(spark, sf_dir).count()
    passes = int(os.environ.get("NMS_CORPUS_PASSES", "3"))
    walls, docs = [], 0
    for _ in range(passes):
        t0 = time.time()
        docs = harness.txt_corpus_e2e(spark, sf_dir).count()
        walls.append(round(time.time() - t0, 2))
    wall = min(walls[1:])
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_sec": wall,
                "walls": walls,
                "docs": docs,
                "docs_per_sec": round(docs / wall, 1),
            }
        )
    )


def inflate_corpus_input(sf_dir: str, k: int) -> str:
    """K id-shifted copies of documents into a cached temp dir, each
    copy's text carrying a per-copy suffix token. The suffix matters:
    EXACT copies would make every line appear in K >= min_docs
    documents, the line-dedup tier would classify the whole corpus as
    boilerplate, and the downstream stages would measure nothing. With
    per-copy variation every stage does full work on K x the rows."""
    import pandas as pd

    out = CACHE / f"corpus_{Path(sf_dir).name}_x{k}"
    if (out / "documents.parquet").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pd.concat(
        [
            docs.assign(
                doc_id=docs["doc_id"] + i * 1_000_000,
                text=docs["text"] + f" copyvariant{i}",
            )
            for i in range(k)
        ],
        ignore_index=True,
    ).to_parquet(out / "documents.parquet", index=False)
    return str(out)


def run_corpus(
    levels: tuple[int, int] = (4, 16), inflate: int = 0
) -> dict:
    """Text-corpus-composition scaling at N->4N; merges into
    BENCH/scaling_latest.json under corpus_* keys."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag_suffix = ""
    if inflate:
        sf_dir = inflate_corpus_input(sf_dir, inflate)
        tag_suffix = f"_x{inflate}"
    res = {}
    for cpus in levels:
        proc = subprocess.run(
            [sys.executable, __file__, "--corpus-child", str(cpus), sf_dir],
            capture_output=True, text=True, check=False, timeout=3600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                res[cpus] = json.loads(line)
        if cpus not in res:
            raise RuntimeError(f"corpus child failed: {proc.stderr[-1500:]}")
        print("corpus", cpus, "->", res[cpus])
    lo, hi = levels
    factor = hi / lo
    speed = res[lo]["wall_sec"] / res[hi]["wall_sec"]
    host = host_calibration(levels)
    tag = f"{lo}_to_{hi}{tag_suffix}"
    merged = {
        f"corpus_local{lo}{tag_suffix}": res[lo],
        f"corpus_local{hi}{tag_suffix}": res[hi],
        f"corpus_speedup_{tag}": round(speed, 3),
        f"corpus_scaling_efficiency_{tag}": round(speed / factor, 3),
        f"corpus_host_calibration_mp_speedup_{tag}": host["speedup"],
        f"corpus_efficiency_vs_host_ceiling_{tag}": round(
            speed / host["speedup"], 3
        ),
        f"corpus_input{tag_suffix}": sf_dir,
    }
    path = REPO / "BENCH" / "scaling_latest.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    data.update(merged)
    path.write_text(json.dumps(data, indent=2))
    print(json.dumps(merged, indent=2))
    return merged


def inflate_crawl_input(sf_dir: str, k: int) -> str:
    """K id-shifted copies of customer+orders into a cached temp sf
    dir: the SAME wp_crawl_e2e job over a K× input. Person derivations
    are pure functions of the integer id, so shifted copies stay
    self-consistent (every order still links to its shifted customer)
    while names/hosts/dates redistribute. Needed because at sf0.1 the
    composition is scheduler-latency-bound (18.5k docs across ~7
    staged jobs); the scaling question is about the data-sized
    stages."""
    import pandas as pd

    out = CACHE / f"crawl_{Path(sf_dir).name}_x{k}"
    if (out / "customer.parquet").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    pd.concat(
        [cust.assign(c_custkey=cust["c_custkey"] + i * 1_000_000) for i in range(k)],
        ignore_index=True,
    ).to_parquet(out / "customer.parquet", index=False)
    pd.concat(
        [
            orders.assign(
                o_orderkey=orders["o_orderkey"] + i * 10_000_000,
                o_custkey=orders["o_custkey"] + i * 1_000_000,
            )
            for i in range(k)
        ],
        ignore_index=True,
    ).to_parquet(out / "orders.parquet", index=False)
    return str(out)


def run_crawl(
    levels: tuple[int, int] = (4, 16),
    inflate: int = 0,
    via_submit: bool = False,
) -> dict:
    """Crawl-composition scaling at N->4N (default 4->16 — the pair
    with multiprocessing-ceiling headroom on this box, see
    run_longlev). Merges into BENCH/scaling_latest.json.
    ``via_submit`` launches each level through real ``spark-submit
    --py-files nms.zip --jars nms-udfs.jar`` — the deploy-literal
    contract, same as the linkage bench's --via-submit."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag_suffix = ""
    if inflate:
        sf_dir = inflate_crawl_input(sf_dir, inflate)
        tag_suffix = f"_x{inflate}"
    if via_submit:
        tag_suffix += "_via_submit"
    res = {}
    for cpus in levels:
        child_args = ["--crawl-child", str(cpus), sf_dir]
        if via_submit:
            from pathlib import Path as _P

            import pyspark

            from tools.make_pyfiles_zip import build as build_zip

            submit = str(_P(pyspark.__file__).parent / "bin" / "spark-submit")
            cmd = [
                submit, "--master", f"local[{cpus}]",
                "--driver-memory", os.environ.get("NMS_DRIVER_MEM", "8g"),
                "--py-files", str(build_zip("nms.zip")),
                "--jars", str(REPO / "name_matcher_spark" / "javaudf" / "nms-udfs.jar"),
                __file__, *child_args,
            ]
        else:
            cmd = [sys.executable, __file__, *child_args]
        proc = subprocess.run(
            cmd, capture_output=True, text=True, check=False, timeout=3600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                res[cpus] = json.loads(line)
        if cpus not in res:
            raise RuntimeError(f"crawl child failed: {proc.stderr[-1500:]}")
        print("crawl", cpus, "->", res[cpus])
    lo, hi = levels
    factor = hi / lo
    speed = res[lo]["wall_sec"] / res[hi]["wall_sec"]
    host = host_calibration(levels)
    tag = f"{lo}_to_{hi}{tag_suffix}"
    merged = {
        f"crawl_local{lo}{tag_suffix}": res[lo],
        f"crawl_local{hi}{tag_suffix}": res[hi],
        f"crawl_speedup_{tag}": round(speed, 3),
        f"crawl_scaling_efficiency_{tag}": round(speed / factor, 3),
        f"crawl_host_calibration_mp_speedup_{tag}": host["speedup"],
        f"crawl_efficiency_vs_host_ceiling_{tag}": round(
            speed / host["speedup"], 3
        ),
        f"crawl_input{tag_suffix}": sf_dir,
    }
    path = REPO / "BENCH" / "scaling_latest.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    data.update(merged)
    path.write_text(json.dumps(data, indent=2))
    print(json.dumps(merged, indent=2))
    return merged


def _burn(_seed: int) -> int:
    t0 = time.time()
    n = 0
    x = 1.0
    while time.time() - t0 < 3.0:
        x = (x * 1.000001 + 1.0) % 97.0
        n += 1
    return n


def host_calibration(levels: tuple[int, int] = (8, 32)) -> dict:
    """The box's own scaling ceiling: identical CPU-bound work in plain
    multiprocessing at N vs 4N workers (no Spark anywhere)."""
    import multiprocessing as mp

    burn = _burn
    out = {}
    for procs in levels:
        with mp.Pool(procs) as pool:
            t0 = time.time()
            r = pool.map(burn, range(procs))
            el = time.time() - t0
        out[procs] = round(sum(r) / el / 1e6, 2)
    out["speedup"] = round(out[levels[1]] / out[levels[0]], 3)
    return out


if __name__ == "__main__":
    main()
