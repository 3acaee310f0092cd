"""Deterministic distinct-count sketch: KMV (k minimum values).

Sketches are normally excluded from exact cross-engine checking
(HLL++ implementations differ per engine), but KMV built on the
repo's stable 40-bit md5 hash is fully deterministic: the sketch of a
group is its k smallest distinct hash values, and the estimator
``(k-1) * 2^40 / h_k`` is plain IEEE arithmetic — so the whole
operator is value-exact in any engine, while still being a real
mergeable sketch (union two sketches = keep the k smallest of the
union).

Scale: the distinct + per-group top-k is one shuffle on the group
key; the sketch per group is k rows regardless of group size, so
downstream merges move O(groups x k), not O(distinct values) — the
point of a sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xsarsea_spark.pipeline.text import HASH40_SQL

__all__ = ["kmv_sketch", "kmv_estimate", "kmv_merge"]

_HSPACE = float(1 << 40)


def kmv_sketch(df: DataFrame, group_cols: list, value_sql: str,
               k: int = 64) -> DataFrame:
    """Per-group KMV sketch rows: the up-to-k smallest distinct
    40-bit hashes of ``value_sql`` -> (group_cols..., h, rk)."""
    from pyspark.sql import Window

    h = HASH40_SQL.format(x=f"({value_sql})")
    d = df.selectExpr(*group_cols, f"{h} AS h").distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def kmv_merge(sketch_a: DataFrame, sketch_b: DataFrame,
              group_cols: list, k: int = 64) -> DataFrame:
    """Union two sketches: keep the k smallest distinct hashes per
    group — the defining mergeability property of KMV."""
    from pyspark.sql import Window

    u = (
        sketch_a.select(*group_cols, "h")
        .unionByName(sketch_b.select(*group_cols, "h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        u.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def kmv_estimate(sketch: DataFrame, group_cols: list,
                 k: int = 64) -> DataFrame:
    """Finalize: exact count when the group holds < k distinct hashes,
    else (k-1) * 2^40 / h_k. All-integer inputs to one IEEE division,
    so the estimate is engine-exact."""
    return (
        sketch.groupBy(*group_cols)
        .agg(
            F.max(F.when(F.col("rk") == k, F.col("h"))).alias("__hk"),
            F.max("rk").alias("__n"),
        )
        .withColumn(
            "kmv_estimate",
            F.expr(
                f"CASE WHEN __n < {k} THEN CAST(__n AS DOUBLE)"
                f" ELSE {k - 1} * {_HSPACE!r} / __hk END"
            ),
        )
        .select(*group_cols, "kmv_estimate")
    )


# ----------------------------------------------------------------------
# Count-min: deterministic frequency sketch
# ----------------------------------------------------------------------

def _cm_hash(value_sql: str, row: int, width: int) -> str:
    """Row-salted 40-bit md5 hash folded to a bucket — identical text
    in both engines modulo the md5->int spelling (HASH40_SQL)."""
    h = HASH40_SQL.format(x=f"('{row}#' || ({value_sql}))")
    return f"(({h}) % {width})"


def countmin_sketch(df: DataFrame, value_sql: str, depth: int = 4,
                    width: int = 64) -> DataFrame:
    """Count-min sketch table (row, bucket, counter).

    ``depth`` salted hash rows x ``width`` buckets of exact counters:
    fixed O(depth*width) memory per (sub)stream no matter the
    cardinality, mergeable by summing counters bucket-wise. Fully
    deterministic (md5 bucketing, integer counters), so estimates are
    value-exact cross-engine — unlike library sketches with
    engine-specific hashing.

    Scale: built as ONE pass — each input row explodes to ``depth``
    (row, bucket) pairs of integers (map-side combined), the shuffle
    carries at most depth*width counter rows per partition.
    """
    buckets = ", ".join(
        _cm_hash(value_sql, j, width) for j in range(depth))
    return (
        df.selectExpr(
            f"posexplode(array({buckets})) AS (rw, bucket)")
        .groupBy("rw", "bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def countmin_estimate(items: DataFrame, sketch: DataFrame,
                      value_sql: str, depth: int = 4,
                      width: int = 64) -> DataFrame:
    """Point-frequency estimates: min over the sketch's depth rows of
    the item's bucket counter (>= true count, with the classic
    eps = e/width overestimate bound). ``items`` keeps its columns,
    gaining ``cm_count``."""
    probes = items.selectExpr(
        "*",
        f"posexplode(array({', '.join(_cm_hash(value_sql, j, width) for j in range(depth))}))"
        " AS (rw, bucket)")
    return (
        probes.join(sketch, on=["rw", "bucket"], how="left")
        .na.fill({"counter": 0})
        .groupBy(*items.columns)
        .agg(F.min("counter").alias("cm_count"))
    )


# ----------------------------------------------------------------------
# Bloom filter: deterministic semi-join prefilter
# ----------------------------------------------------------------------

def _bloom_pos(value_sql: str, j: int, m_bits: int) -> str:
    h = HASH40_SQL.format(x=f"('B{j}#' || ({value_sql}))")
    return f"(({h}) % {m_bits})"


def bloom_build(keys: DataFrame, value_sql: str, m_bits: int = 4096,
                k: int = 3) -> DataFrame:
    """Bloom filter as a (word, bits) table: k md5-salted bit
    positions per key, OR-folded into 63-bit words with ``bit_or``
    (63 so no position ever shifts into the BIGINT sign bit — the
    same spelling works in any engine).

    The build is one exploded pass + one tiny hash agg; the result is
    O(m_bits/63) rows however many keys went in — broadcastable at
    any scale, which is the point: it rides ahead of a join as a
    cheap prefilter the way Spark's own runtime row-level filters do.
    """
    poss = ", ".join(_bloom_pos(value_sql, j, m_bits)
                     for j in range(k))
    return (
        keys.selectExpr(f"explode(array({poss})) AS p")
        .selectExpr("CAST(p DIV 63 AS INT) AS word",
                    "CAST(1 AS BIGINT) << CAST(p % 63 AS INT) AS b")
        .groupBy("word")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )


def bloom_filter(df: DataFrame, bloom: DataFrame, value_sql: str,
                 m_bits: int = 4096, k: int = 3) -> DataFrame:
    """Keep rows whose key passes every one of the k bit probes
    (possible false positives, never false negatives). The bloom side
    is broadcast; each probe is an equi-join on the word index plus a
    mask test — the fact side never shuffles."""
    out = df
    for j in range(k):
        p = _bloom_pos(value_sql, j, m_bits)
        probe = (
            bloom.withColumnRenamed("word", f"__w{j}")
            .withColumnRenamed("bits", f"__bits{j}")
        )
        out = (
            out.withColumn(f"__p{j}", F.expr(p))
            .join(F.broadcast(probe),
                  F.expr(f"CAST(__p{j} DIV 63 AS INT) = __w{j}"),
                  "left")
            .filter(F.expr(
                f"(coalesce(__bits{j}, 0L)"
                f" & (CAST(1 AS BIGINT) << CAST(__p{j} % 63 AS INT)))"
                " != 0"))
            .drop(f"__p{j}", f"__w{j}", f"__bits{j}")
        )
    return out
