"""Grouped time-series gap-fill with linear interpolation.

The classic warehouse resample: a sparse per-(series, bucket) table is
densified onto the full integer bucket grid of each series, and
missing buckets are linearly interpolated between their nearest
observed neighbours (xarray ``interpolate_na`` / pandas
``interpolate('linear')`` semantics on a regular grid).

Implementation is the grouped-carry trick — no IGNORE NULLS window
syntax (which Spark and DuckDB spell differently): a running
``COUNT(value)`` increments exactly at observed rows, so partitioning
by that running count puts every gap row in a group whose single
non-null row is its previous (forward pass) / next (backward pass)
neighbour. All carries are integer window aggregates; the only
floating op is the final interpolation ratio, written with one
explicit cast order so Spark and DuckDB produce bit-identical doubles.

Scale: one shuffle on (keys, time) for the grid join, then windows
partitioned by the series key — per-series sorts, never a global
order. The grid side is generated (``sequence``), so the dense
expansion happens executor-side; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["gapfill_linear"]


def gapfill_linear(df: DataFrame, keys: list, time_col: str,
                   value_col: str) -> DataFrame:
    """Densify ``df`` (one row per observed (keys, time_col) integer
    bucket) onto each series' [min, max] bucket range and linearly
    interpolate ``value_col`` across the gaps.

    Returns (keys..., time_col, ``<value_col>_filled`` DOUBLE,
    ``interpolated`` INT). Series endpoints are observed by
    construction, so every gap is interior and the interpolation is
    always defined.
    """
    bounds = df.groupBy(*keys).agg(
        F.min(time_col).alias("__mn"), F.max(time_col).alias("__mx"))
    grid = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("__mn"), F.col("__mx")))
        .alias(time_col))
    g = grid.join(df, on=[*keys, time_col], how="left")

    fwd = Window.partitionBy(*keys).orderBy(time_col)
    bwd = Window.partitionBy(*keys).orderBy(F.desc(time_col))
    g = (
        g.withColumn("__gf", F.count(value_col).over(
            fwd.rowsBetween(Window.unboundedPreceding,
                            Window.currentRow)))
        .withColumn("__gb", F.count(value_col).over(
            bwd.rowsBetween(Window.unboundedPreceding,
                            Window.currentRow)))
    )
    pw = Window.partitionBy(*keys, "__gf")
    nw = Window.partitionBy(*keys, "__gb")
    g = (
        g.withColumn("__pv", F.max(value_col).over(pw))
        .withColumn("__pt", F.min(time_col).over(pw))
        .withColumn("__nv", F.max(value_col).over(nw))
        .withColumn("__nt", F.max(time_col).over(nw))
    )
    filled = (
        f"CASE WHEN {value_col} IS NOT NULL"
        f" THEN CAST({value_col} AS DOUBLE)"
        f" ELSE CAST(__pv AS DOUBLE)"
        f" + CAST(__nv - __pv AS DOUBLE)"
        f" * CAST({time_col} - __pt AS DOUBLE)"
        f" / CAST(__nt - __pt AS DOUBLE) END"
    )
    return g.selectExpr(
        *keys, time_col,
        f"{filled} AS {value_col}_filled",
        f"CAST(CASE WHEN {value_col} IS NULL THEN 1 ELSE 0 END"
        f" AS INT) AS interpolated")
