"""Embedding clustering for corpus curation (SemDeDup-style k-means).

Lloyd's algorithm with deterministic, engine-replicable arithmetic:

- init: the ``k`` lowest-id vectors are the starting centroids;
- assignment: squared L2 distance folded LEFT-TO-RIGHT over the vector
  index (``aggregate(zip_with(...))`` — the same op sequence DuckDB's
  ``list_reduce(list_transform(...))`` produces), ties to the lowest
  cluster id;
- update: per-(cluster, dim) mean whose sum folds left-to-right in
  ascending ``vec_id`` order (sorted-struct fold — the repo's
  order-fixed summation pattern), so every round is bit-reproducible
  in any engine without decimal quantization.

Driver state is the k x dim centroid matrix per round — the canonical
Lloyd's layout (what MLlib's KMeans keeps on the driver too); all
per-vector work stays distributed. The sorted-struct fold in the
update is exact but collects each (cluster, dim) group's values; at
100 TB swap it for the order-independent DECIMAL sum (operators/
exactsum.py) and accept a documented 1e-s quantization of the
centroid sums — the assignment stage is unchanged.

Parity: reference has no clustering pillar; engine-brief extension
(embedding curation). Cluster sizes + inertia per round make this the
standard SemDeDup pre-pass (cluster then near-dup within clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_embeddings"]


def _dist_expr(vec_col: str, centroid: list[float]) -> str:
    # NOTE: a flat unrolled (x-c)^2 sum was tried here — it ~4x'd
    # embedding_semdedup (the assignment subplan appears on both
    # sides of the pair self-join, and duplicated 256-term codegen
    # methods overwhelm the JIT), while barely moving plain k-means.
    # The lambda fold stays.
    lits = ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in centroid)
    return (
        f"aggregate(zip_with({vec_col}, array({lits}),"
        f" (x, c) -> (x - c) * (x - c)),"
        f" CAST(0 AS DOUBLE), (a, y) -> a + y)"
    )


def kmeans_embeddings(
    vecs: DataFrame,
    k: int = 4,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Returns (vec_id, cluster, dist2) after ``rounds`` Lloyd steps."""
    base = vecs.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
        .alias("__v"),
    )
    init = base.orderBy(id_col).limit(k).collect()
    centroids: dict[int, list[float]] = {
        i: list(r["__v"]) for i, r in enumerate(init)
    }

    assigned = None
    for rnd in range(rounds):
        ids = sorted(centroids)
        work = base
        for c in ids:
            work = work.withColumn(
                f"__d{c}", F.expr(_dist_expr("__v", centroids[c]))
            )
        mincol = F.least(*[F.col(f"__d{c}") for c in ids])
        cl = None
        for c in ids:
            cond = F.col(f"__d{c}") == mincol
            cl = F.when(cond, F.lit(c)) if cl is None else cl.when(
                cond, F.lit(c))
        assigned = work.withColumn("cluster", cl).withColumn(
            "dist2", mincol)
        if rnd == rounds - 1:
            break  # output is the final assignment; no wasted update
        upd = (
            assigned.select(
                "cluster", F.col(id_col).alias("__id"),
                F.posexplode("__v").alias("__d", "__x"))
            .groupBy("cluster", "__d")
            .agg(
                F.expr(
                    "aggregate(array_sort(collect_list("
                    "  struct(__id, __x))),"
                    " CAST(0 AS DOUBLE), (a, s) -> a + s.__x)"
                    " / COUNT(__x)"
                ).alias("__c"))
            .groupBy("cluster")
            .agg(F.expr(
                "transform(array_sort(collect_list(struct(__d, __c))),"
                " s -> s.__c)").alias("__cent"))
            .collect()
        )
        centroids = {r["cluster"]: list(r["__cent"]) for r in upd}

    return assigned.select(id_col, "cluster", "dist2")
