"""Dataset sinks for scale: partitioned and bucketed Parquet.

At 100 TB the difference between a flat parquet dump and a
partitioned/bucketed layout is whether downstream queries prune and
whether the big fact joins shuffle:

- ``write_partitioned``: directory partitioning on low-cardinality
  predicate columns -> partition pruning at scan time (Catalyst
  eliminates whole directories for `WHERE pol = 'VV'`-style filters).
- ``write_bucketed``: hash-bucketed, optionally sorted, saved as a
  table -> two tables bucketed on the same key join WITHOUT a shuffle
  (bucket-join); the scene/LUT and fact/fact joins this engine runs
  are exactly that shape.
- ``write_scene_tiled``: raster-specific layout — pixels partitioned
  by tile id so stencil passes read only the tiles they touch and the
  halo shuffle is bounded per tile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_partitioned", "write_bucketed", "write_scene_tiled"]


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str]) -> None:
    (df.write.mode("overwrite")
       .partitionBy(*partition_cols)
       .parquet(path))


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32,
                   sort_col: str | None = None) -> None:
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_scene_tiled(px: DataFrame, path: str, tile: int = 512,
                      line_col: str = "line",
                      sample_col: str = "sample") -> None:
    (px.withColumn("tile_line",
                   F.floor(F.col(line_col) / tile).cast("int"))
       .withColumn("tile_sample",
                   F.floor(F.col(sample_col) / tile).cast("int"))
       .write.mode("overwrite")
       .partitionBy("tile_line", "tile_sample")
       .parquet(path))


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """Z-order (Morton) key as a pure-SQL bit interleave — identical
    text works in Spark and DuckDB (shiftleft spelled with operators).

    Bit i of column j lands at position i * n_cols + j, so
    lexicographic order on the key is the space-filling Z-curve:
    range-partitioning or sorting files by it co-locates rows that are
    close in ALL key dimensions at once, which turns parquet min/max
    column statistics into multi-dimensional data-skipping — the
    standard Delta/Iceberg OPTIMIZE ZORDER layout trick, here as a
    plain deterministic expression.
    """
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"(((CAST({c} AS BIGINT) >> {i}) & 1)"
                f" << {i * n + j})")
    return " | ".join(terms)


def write_zordered(df: DataFrame, path: str, zcols: list[str],
                   bits: int = 16, n_files: int = 200,
                   mode: str = "overwrite") -> None:
    """Cluster files along the Z-curve of ``zcols``: range-partition
    on the interleaved key (sampled split points, no global sort),
    sort within partitions, drop the key. Each output file then covers
    a tight hyper-rectangle of the key space -> min/max skipping on
    every z column. ``mode='append'`` adds a new z-clustered batch to
    an existing table (per-batch clustering, the OPTIMIZE-per-ingest
    maintenance shape)."""
    keyed = df.withColumn("__z", F.expr(zorder_sql(zcols, bits)))
    (keyed.repartitionByRange(n_files, "__z")
          .sortWithinPartitions("__z")
          .drop("__z")
          .write.mode(mode).parquet(path))
