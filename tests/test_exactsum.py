"""exact_sum_agg must be bit-identical to the DSUM/DAVG DECIMAL path
(the representation every DuckDB oracle uses) — including negatives,
NaN guarding, and sum+avg sharing one accumulator slot."""

from __future__ import annotations

from pyspark.sql import functions as F

from xsarsea_spark.operators.exactsum import ExactSumSpec, exact_sum_agg
from xsarsea_spark.suite.base import DAVG, DSUM

from .conftest import SF_DIR


def _ref(df, keys, exprs_sum, exprs_avg):
    aggs = [F.expr(DSUM(e)).alias(f"s{i}")
            for i, e in enumerate(exprs_sum)]
    aggs += [F.expr(DAVG(e)).alias(f"m{i}")
             for i, e in enumerate(exprs_avg)]
    return df.groupBy(*keys).agg(*aggs)


def test_exactsum_matches_dsum_lineitem(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exprs = ["l_quantity", "l_extendedprice * (1e0 - l_discount)"]
    got = exact_sum_agg(
        li, ["l_returnflag"],
        [ExactSumSpec("s0", exprs[0]), ExactSumSpec("s1", exprs[1]),
         ExactSumSpec("m0", exprs[0], avg=True)],
    ).toPandas().set_index("l_returnflag").sort_index()
    want = _ref(li, ["l_returnflag"], exprs, [exprs[0]]) \
        .toPandas().set_index("l_returnflag").sort_index()
    assert (got["s0"] == want["s0"]).all()
    assert (got["s1"] == want["s1"]).all()
    assert (got["m0"] == want["m0"]).all()


def test_exactsum_negative_and_nan(spark):
    # signed values exercise the floor-split on negatives; injected
    # NaNs exercise the guard (skipped, like DSUM)
    df = spark.range(10000).select(
        (F.col("id") % 7).alias("k"),
        F.expr("CASE WHEN id % 97 = 0 THEN double('NaN') "
               "ELSE (id - 5000) * 0.000123 END").alias("x"),
    )
    got = exact_sum_agg(
        df, ["k"], [ExactSumSpec("s", "x"),
                    ExactSumSpec("m", "x", avg=True)]
    ).toPandas().set_index("k").sort_index()
    want = df.groupBy("k").agg(
        F.expr(DSUM("x")).alias("s"), F.expr(DAVG("x")).alias("m")
    ).toPandas().set_index("k").sort_index()
    assert (got["s"] == want["s"]).all()
    assert (got["m"] == want["m"]).all()


def test_exactsum_all_nan_group_is_null(spark):
    df = spark.range(4).select(
        F.lit(1).alias("k"), F.expr("double('NaN')").alias("x"))
    out = exact_sum_agg(df, ["k"], [ExactSumSpec("s", "x")]).collect()
    assert out[0]["s"] is None
