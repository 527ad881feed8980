"""Similarity search over embedding columns (array<float>).

Two paths:

* ``cosine_topk``       — brute-force exact top-k: broadcast the query
  set, JVM-side dot products via zip_with/aggregate (no Python, no
  shuffle of the corpus). Baseline + ground truth.
* ``lsh_cosine_topk``   — random-hyperplane LSH: L independent tables
  of b-bit signatures; candidates = corpus rows sharing a signature
  with the query in ANY table; exact re-rank of candidates only.
  The scale path: the corpus-side join is an equi-join on (table,
  signature) — no cross join anywhere.

Dot products are computed in double (cast from float) so results are
stable and oracle-comparable after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def drop_zero_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Exclude zero/empty/null embeddings from similarity operators: a
    zero vector has no direction, and unguarded it is not merely a bad
    answer — ONE such row (a padding/failed-encode artifact, routine in
    real embedding exports) fails the entire job with DIVIDE_BY_ZERO
    under Spark 4's default ANSI mode."""
    return df.filter(_norm(F.col(vec_col)) > 0)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine; deterministic tiebreak on corpus id.

    queries is expected to be small (it is broadcast); the corpus is
    streamed through the broadcast-nested-loop in one pass with no
    corpus shuffle until the final per-query top-k (a tiny aggregate).
    """
    # Norms are per-ROW facts: compute them once in each side's
    # projection, not per PAIR inside the nested-loop condition (r06,
    # guide §1.2 "per-task work"). The higher-order _norm fold is
    # interpreted (no codegen), so hoisting it out of the |Q|x|C| pair
    # stream drops two of the three array folds per pair — identical
    # doubles, identical rounding.
    q = drop_zero_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    c = drop_zero_vectors(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("corpus_id")).select(
        "query_id",
        "corpus_id",
        F.round(
            _dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn")),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def lsh_hyperplanes(
    dim: int, bits: int = 8, tables: int = 4, seed: int = 42
) -> list[list[list[float]]]:
    """planes[table][bit] = dim-length hyperplane. Deterministic LCG
    from seed; every component is an exact binary fraction (k/2^48), so
    the repr round-trips and the SAME literal planes can be embedded in
    the DuckDB oracle SQL — the whole LSH path is then hash-checkable."""
    state = seed & 0xFFFFFFFFFFFFFFFF

    def nxt() -> float:
        nonlocal state
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFFFFFFFFFF
        return (state >> 16) / float(1 << 48) - 0.5

    return [
        [[nxt() for _ in range(dim)] for _ in range(bits)] for _ in range(tables)
    ]


def hyperplane_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(id, table, sig) — sign patterns against seeded pseudo-random
    hyperplanes. Planes are deterministic (lsh_hyperplanes) and built
    driver-side as literal arrays; signature computation is JVM-only.
    """
    planes = lsh_hyperplanes(dim, bits, tables, seed)
    # Loud length check folded into the table column (assert_true is
    # NULL on success; coalesce keeps it from being pruned): a vector
    # whose length != dim would otherwise NULL every projection and
    # collapse into the all-zeros signature — one degenerate bucket
    # holding every malformed row, i.e. a silent all-pairs join.
    guard = F.assert_true(
        F.size(F.col(vec_col)) == F.lit(dim),
        F.concat(
            F.lit("hyperplane_signatures: vector length != dim: "),
            F.coalesce(F.size(F.col(vec_col)).cast("string"), F.lit("NULL")),
        ),
    )
    sig_cols = []
    for t in range(tables):
        bit_exprs = []
        for b in range(bits):
            proj = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(p) for p in planes[t][b]]),
                    lambda x, p: x.cast("double") * p,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bit_exprs.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        sig_cols.append(
            F.struct(
                F.coalesce(guard.cast("int"), F.lit(t)).alias("table"),
                F.concat(*bit_exprs).alias("sig"),
            )
        )
    return df.select(
        F.col(id_col), F.explode(F.array(*sig_cols)).alias("s")
    ).select(id_col, F.col("s.table").alias("table"), F.col("s.sig").alias("sig"))


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int = 37,
    nprobe: int = 4,
    k: int = 5,
) -> DataFrame:
    """IVF-style ANN: coarse quantizer -> inverted lists -> probe ->
    exact re-rank. The scale path when LSH bucket sizes are unruly.

    Centroids are a deterministic sample of the corpus itself
    (vec_id % centroid_stride == 1) — no iterative k-means, no RNG, so
    the whole operator is oracle-expressible. Assignment is a
    broadcast join (centroid set is tiny) + min_by struct argmin;
    queries probe their nprobe nearest lists; candidates re-rank with
    exact cosine. Corpus is scanned once for assignment and never
    shuffled except by inverted-list id."""
    corpus = drop_zero_vectors(corpus, vec_col)
    queries = drop_zero_vectors(queries, vec_col)
    # Norms hoisted to per-ROW projections on both sides (r06): the
    # interpreted fold runs once per vector / centroid, not once per
    # (row x centroid) pair — identical doubles.
    cent = corpus.filter((F.col(id_col) % centroid_stride) == 1).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("_cn"),
    )

    def scored_vs_centroids(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias("v"),
            _norm(F.col(vec_col)).alias("_vn"),
        ).join(F.broadcast(cent), how="cross").select(
            out_id,
            "cid",
            (
                F.lit(1.0)
                - _dot(F.col("v"), F.col("cvec"))
                / (F.col("_vn") * F.col("_cn"))
            ).alias("dist"),
        )

    # Corpus assignment: min(struct) aggregation, NOT a window — the
    # partial agg combines map-side so the xC expansion never crosses
    # the shuffle (a window would shuffle corpus x C rows).
    lists = (
        scored_vs_centroids(corpus, "corpus_id")
        .groupBy("corpus_id")
        .agg(F.min(F.struct("dist", "cid")).alias("m"))
        .select("corpus_id", F.col("m.cid").alias("cid"))
    )
    # Query probes: tiny side, window top-nprobe is fine.
    qs = scored_vs_centroids(queries, "query_id")
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("cid"))
    probes = (
        qs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "cid")
    )
    cand = (
        lists.join(probes, "cid")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("_cn2"),
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "corpus_id")
        .select(
            "query_id",
            "corpus_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn2")),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: signature equi-join for candidates, exact
    cosine re-rank of candidates only."""
    corpus = drop_zero_vectors(corpus, vec_col)
    queries = drop_zero_vectors(queries, vec_col)
    csig = hyperplane_signatures(corpus, id_col, vec_col, dim, bits, tables, seed)
    qsig = hyperplane_signatures(queries, id_col, vec_col, dim, bits, tables, seed)
    cand = (
        csig.select(F.col(id_col).alias("corpus_id"), "table", "sig")
        .join(
            qsig.select(F.col(id_col).alias("query_id"), "table", "sig"),
            ["table", "sig"],
        )
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "corpus_id")
        .select(
            "query_id",
            "corpus_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn")),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
