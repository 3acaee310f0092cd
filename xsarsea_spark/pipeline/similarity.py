"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine top-k — the correctness baseline.
  The dot product is a sequential JVM-side fold (``aggregate`` over
  ``zip_with``), no Python UDF. Queries x corpus is a broadcast join of
  the (small) query set against the corpus — at 100 TB the corpus side
  streams, only the query block is broadcast.
- ``lsh_ann``: the scale path — random-hyperplane LSH bucket join.
  Hyperplanes are deterministic arithmetic (no RNG state), signatures
  are built in one projection, candidates come from a bucket
  ``groupBy`` join, and only candidates get exact cosine. Never
  all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_norm", "cosine_topk", "lsh_ann"]

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn(
        "__norm", F.expr(f"sqrt({_DOT.format(a=vec_col, b=vec_col)})")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, rank, neighbor_id, cosine). Excludes self-match.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
    )
    dot = _DOT.format(a="__qv", b="__cv")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(f"({dot}) / (__qn * __cn)"))
    )
    from pyspark.sql.window import Window

    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _hyperplane_sql(dim: int, n_planes: int) -> str:
    """Deterministic pseudo-random hyperplane component: plane p,
    component i -> ((p*9973 + i*277) % 2003 - 1001) / 1001."""
    return "(((p * 9973 + i * 277) % 2003) - 1001) / 1001e0"


def lsh_ann(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature bucket join, then
    exact cosine within buckets only.

    A vector's signature is the n_planes-bit sign pattern of its
    projections; candidates share the full signature. Recall can be
    raised by lowering n_planes or adding multi-probe — this is the
    bucketed scale path, not the exactness baseline.
    """
    spark = queries.sparkSession
    dim = len(queries.select(vec_col).first()[0])
    planes = spark.range(n_planes).select(
        F.col("id").cast("int").alias("p")
    ).crossJoin(
        spark.range(dim).select(F.col("id").cast("int").alias("i"))
    ).withColumn("h", F.expr(_hyperplane_sql(dim, n_planes)))

    def signature(df: DataFrame, ident: str) -> DataFrame:
        comp = (
            df.select(F.col(id_col).alias(ident), F.col(vec_col).alias("v"))
            .select(ident, F.posexplode("v").alias("i", "x"))
            .join(F.broadcast(planes), on="i")
            .groupBy(ident, "p")
            .agg(F.sum(F.expr("CAST(x AS DOUBLE) * h")).alias("proj"))
            .groupBy(ident)
            .agg(
                F.sum(
                    F.expr("CASE WHEN proj > 0 THEN CAST(POW(2, p) AS BIGINT)"
                           " ELSE 0L END")
                ).alias("sig")
            )
        )
        return comp

    qs = signature(queries, "query_id")
    cs = signature(corpus, "neighbor_id")
    cand = qs.join(cs, on="sig").filter(
        F.col("query_id") != F.col("neighbor_id")
    )

    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"))
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"))
    dot = _DOT.format(a="__qv", b="__cv")
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn("cosine", F.expr(f"({dot}) / (__qn * __cn)"))
    )
    from pyspark.sql.window import Window

    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
