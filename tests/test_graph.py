"""triangle_counts: planted-graph checks (the sf near-dup graphs are
too sparse to pin clique arithmetic)."""

from __future__ import annotations


def test_triangle_counts_k4_plus_pendant(spark):
    from xsarsea_spark.operators.pagerank import triangle_counts

    # K4 on {1,2,3,4} (oriented src < dst) plus pendant edge (4,5)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src long, dst long",
    )
    rows = {r["node"]: r for r in triangle_counts(edges).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # every K4 node sits in C(3,2) = 3 triangles
    for n in (1, 2, 3):
        assert rows[n]["degree"] == 3
        assert rows[n]["triangles"] == 3
        assert rows[n]["clustering_coeff"] == 1.0
    # node 4 gains the pendant edge: degree 4, still 3 triangles
    assert rows[4]["degree"] == 4 and rows[4]["triangles"] == 3
    assert rows[4]["clustering_coeff"] == 0.5
    # pendant node: no wedge possible -> NULL coefficient
    assert rows[5]["degree"] == 1 and rows[5]["triangles"] == 0
    assert rows[5]["clustering_coeff"] is None


def test_triangle_counts_triangle_free(spark):
    from xsarsea_spark.operators.pagerank import triangle_counts

    # path graph 1-2-3-4: wedges exist, no triangle closes
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long")
    rows = {r["node"]: r for r in triangle_counts(edges).collect()}
    assert all(r["triangles"] == 0 for r in rows.values())
    assert rows[2]["degree"] == 2
    assert rows[2]["clustering_coeff"] == 0.0


def test_skyline2d_ties_and_duplicates(spark):
    from xsarsea_spark.operators.skyline import skyline2d

    rows = [
        (1, 1.0, 5),   # frontier
        (2, 1.0, 5),   # exact duplicate -> both survive
        (3, 1.0, 4),   # same price, smaller size -> dominated
        (4, 2.0, 7),   # frontier
        (5, 2.0, 7),   # duplicate frontier point
        (6, 3.0, 7),   # dominated by 4/5 (same size, higher price)
        (7, 3.0, 9),   # frontier
        (8, 4.0, 9),   # dominated by 7
        (9, 0.5, 1),   # frontier (cheapest overall)
    ]
    df = spark.createDataFrame(
        rows, "id long, price double, size int").repartition(4)
    got = sorted(r["id"] for r in
                 skyline2d(df, "price", "size").collect())
    assert got == [1, 2, 4, 5, 7, 9]


def test_kcore_rounds_converged(spark):
    """_KCORE_R is a fixed unroll shared with the oracle; assert
    peeling has actually converged by then on the fixture corpus
    (one extra round changes nothing), so the fixed-round semantics
    equal true k-core here."""
    from pyspark.sql import functions as F

    import xsarsea_spark.suite.pipeline_suite as ps
    from .conftest import SF_DIR

    pairs = ps._setsim_pairs(spark, SF_DIR).select("id_a", "id_b")
    edges = (pairs.selectExpr("id_a AS src", "id_b AS dst")
             .unionAll(pairs.selectExpr("id_b AS src", "id_a AS dst"))
             ).localCheckpoint()

    def peel(rounds):
        alive = edges.select("src").distinct()
        for _ in range(rounds):
            deg = (edges.join(alive.withColumnRenamed("src", "__x"),
                              edges.src == F.col("__x")).drop("__x")
                   .join(alive.withColumnRenamed("src", "__y"),
                         F.col("dst") == F.col("__y"))
                   .groupBy("src").agg(F.count(F.lit(1)).alias("n")))
            alive = deg.filter(
                F.col("n") >= ps._KCORE_K).select("src").localCheckpoint()
        return {r.src for r in alive.collect()}

    assert peel(ps._KCORE_R) == peel(ps._KCORE_R + 1)
