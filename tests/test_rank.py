"""Distributed exact rank / ntile (`operators/rank.py`) must be
value-identical to the single-partition window functions they
replace, for any partition count — and never plan a corpus-wide
unpartitioned window."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xsarsea_spark.operators.rank import (global_rank, ntile_distributed,
                                          prefix_max)


def _frame(spark, n=997):
    # heavy ties on the score column; id is the tie-break
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).cast("double").alias("score"))


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_global_rank_matches_row_number(spark, parts):
    df = _frame(spark)
    order = [F.col("score").desc(), F.col("id").asc()]
    got = {r["id"]: r["__rank"]
           for r in global_rank(df, order, partitions=parts).collect()}
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    want = {r["id"]: r["rn"]
            for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    assert got == want


@pytest.mark.parametrize("n,nrows", [(4, 997), (4, 3), (7, 1000),
                                     (5, 5), (3, 1001)])
def test_ntile_matches_window_ntile(spark, n, nrows):
    df = _frame(spark, nrows)
    order = [F.col("score").desc(), F.col("id").asc()]
    got = {r["id"]: r["bin"]
           for r in ntile_distributed(df, n, order,
                                      partitions=5).collect()}
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    want = {r["id"]: r["nt"]
            for r in df.withColumn("nt", F.ntile(n).over(w)).collect()}
    assert got == want


def test_rank_plan_has_no_unpartitioned_corpus_window(spark):
    """Every Window node in the rank plan must either carry a
    partition spec or sit above an aggregation (the cluster-sized
    offsets frame) — never sort the input corpus on one task."""
    df = _frame(spark)
    out = global_rank(df, [F.col("score").asc(), F.col("id").asc()],
                      partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert win_lines, "expected window nodes in the rank plan"
    for ln in win_lines:
        # local rank partitions by __pid; the offsets window orders
        # by __pid over the cluster-sized counts frame — any Window
        # without __pid would be a corpus-wide single-task sort
        assert "__pid" in ln, f"corpus-wide window in plan: {ln}"


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_prefix_max_matches_exclusive_window(spark, parts):
    """Two-pass exclusive running max == the single-partition
    max OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING TO -1) window,
    including the NULL for the globally-first row."""
    df = spark.range(499).select(
        F.col("id"),
        # non-monotone values so the running max actually plateaus
        ((F.col("id") * 37) % 101).cast("double").alias("v"))
    got = {r["id"]: r["pm"]
           for r in prefix_max(df, [F.col("id").asc()], "v", "pm",
                               partitions=parts).collect()}
    w = (Window.orderBy(F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    want = {r["id"]: r["pm"] for r in df.withColumn(
        "pm", F.max("v").over(w)).collect()}
    assert got == want
    assert want[0] is None


def test_prefix_max_plan_has_no_unpartitioned_corpus_window(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 9).cast("double").alias("v"))
    out = prefix_max(df, [F.col("id").asc()], "v", "pm", partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert win_lines
    for ln in win_lines:
        assert "__pid" in ln, f"corpus-wide window in plan: {ln}"


@pytest.mark.parametrize("parts", [1, 4, 16])
def test_global_rank_running_sums_match_window(spark, parts):
    """Exact (DECIMAL/integer) running totals from the two-pass rank
    must equal the single-partition cumulative window."""
    df = spark.range(501).select(
        F.col("id"),
        (F.col("id") % 13).cast("double").alias("score"),
        F.expr("CAST(id * 37 % 1000 AS DECIMAL(38,6))").alias("d"),
        (F.col("id") % 97).cast("long").alias("v"))
    order = [F.col("score").desc(), F.col("id").asc()]
    got = {r["id"]: (r["cd"], r["cv"])
           for r in global_rank(df, order, partitions=parts,
                                running_sums={"cd": "d", "cv": "v"})
           .collect()}
    w = (Window.orderBy(F.col("score").desc(), F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    want = {r["id"]: (r["cd"], r["cv"])
            for r in df.select(
                "id", F.sum("d").over(w).alias("cd"),
                F.sum("v").over(w).alias("cv")).collect()}
    assert got == want


def test_prefix_max_debug_check_rejects_duplicate_keys(spark):
    """spark.xsarsea.debug.checks=true turns the documented
    unique-keys contract into a loud failure: ties straddling a
    range-partition boundary would corrupt the exclusive frame, so a
    caller with duplicate keys must not get silent wrong maxima."""
    dup = spark.range(200).select(
        (F.col("id") % 50).alias("k"),
        F.col("id").cast("double").alias("v"))
    uniq = spark.range(200).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v"))
    spark.conf.set("spark.xsarsea.debug.checks", "true")
    try:
        with pytest.raises(ValueError, match="not unique"):
            prefix_max(dup, [F.col("k")], "v", "pm", partitions=8)
        out = prefix_max(uniq, [F.col("k")], "v", "pm", partitions=8)
        assert out.count() == 200
    finally:
        spark.conf.set("spark.xsarsea.debug.checks", "false")


@pytest.mark.parametrize("n,nrows,ngroups", [(3, 500, 5), (4, 97, 3),
                                             (7, 60, 11), (3, 6, 2)])
def test_ntile_grouped_matches_partitioned_window(spark, n, nrows,
                                                  ngroups):
    """ntile_grouped == NTILE(n) OVER (PARTITION BY g ORDER BY ...),
    including groups smaller than n (every row in a big bucket)."""
    from xsarsea_spark.operators.rank import ntile_grouped

    df = _frame(spark, nrows).withColumn(
        "g", (F.col("id") % ngroups).cast("int"))
    order = [F.col("score").desc(), F.col("id").asc()]
    got = {r["id"]: r["bin"]
           for r in ntile_grouped(df, n, ["g"], order,
                                  partitions=5).collect()}
    w = Window.partitionBy("g").orderBy(
        F.col("score").desc(), F.col("id").asc())
    want = {r["id"]: r["nt"]
            for r in df.withColumn("nt", F.ntile(n).over(w)).collect()}
    assert got == want


def test_ntile_grouped_null_group_guard(spark):
    """NULL group keys would be silently dropped by the offsets
    join; the debug conf turns the documented non-null contract into
    a loud failure."""
    from xsarsea_spark.operators.rank import ntile_grouped

    df = spark.range(10).selectExpr(
        "CASE WHEN id < 2 THEN NULL ELSE CAST(id % 3 AS INT) END"
        " AS g", "CAST(id AS DOUBLE) AS score", "id")
    spark.conf.set("spark.xsarsea.debug.checks", "true")
    try:
        with pytest.raises(ValueError, match="NULL group key"):
            ntile_grouped(df, 3, ["g"],
                          [F.col("score").asc(), F.col("id").asc()])
    finally:
        spark.conf.set("spark.xsarsea.debug.checks", "false")
