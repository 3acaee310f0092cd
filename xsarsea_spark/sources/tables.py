"""Parquet table loaders for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
an ``sf_dir``.

At 100 TB these would be partitioned/bucketed datasets; the loaders
keep the access path identical (``spark.read.parquet`` benefits from
predicate pushdown, column pruning and partition pruning either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor
# (O(1) row counts). customer/supplier/part/orders grow with sf and
# must NOT be force-broadcast — AQE picks broadcast when actually small.
BROADCAST_TABLES = {"region", "nation"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(name)
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS); Spark reads it only
        # as raw nanosecond BIGINT via this legacy conf. All event-time
        # math downstream is integer microseconds (ts DIV 1000).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (for spark.sql entry points)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
