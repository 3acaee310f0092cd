"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``xsarsea_spark.suite.*`` as (Spark, oracle-SQL)
pairs registered in ``xsarsea_spark.suite.base.REGISTRY``; this module
just re-exports them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xsarsea_spark.suite import REGISTRY


def _pin_runtime_confs(spark: SparkSession) -> None:
    """Runtime-settable confs the oracle parity depends on, pinned
    here so results don't depend on the caller's session defaults."""
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _pin_runtime_confs(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    _pin_runtime_confs(spark)
    return REGISTRY["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return {name: _wrap(qs.spark) for name, qs in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL for every SQL-expressible query.

    Queries whose semantics are not SQL-expressible (streaming,
    iterative kernels) register ``oracle=None`` and are omitted here;
    the driver records a rows-only check for those.
    """
    return {
        name: qs.oracle for name, qs in REGISTRY.items() if qs.oracle is not None
    }
