"""Structured Streaming surface over the ``events`` table.

Batch/stream parity design: each streaming query has identical
semantics to a batch query in suite/events_suite.py, so the SAME
DuckDB oracle validates both. Streams run with
``trigger(availableNow=True)`` against the parquet directory
(pathGlobFilter selects the events file), writing to an in-memory sink.

At scale this is the real shape: ``readStream`` on an object-store
prefix, watermarked event-time aggregation, checkpointed sink; the
in-memory sink and availableNow trigger are the test harness, not the
design.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["events_stream", "stream_hourly_counts",
           "stream_minute_dedup", "stream_sessionize"]

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),   # raw nanos (nanosAsLong)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (nanos-as-long ts +
    a derived proper event-time column for watermarking)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn(
        "event_time", F.expr("timestamp_micros(ts DIV 1000)")
    )


def _run_to_memory(stream_df: DataFrame, output_mode: str,
                   state_partitions: int | None = 8) -> DataFrame:
    """Run an availableNow stream into a memory sink.

    Stateful operators allocate one state-store instance per shuffle
    partition, and instance setup dominates when per-partition state
    is small — at the session default of 32 partitions the three
    suite streams spend 2.6-11 s on state plumbing vs ~1-2 s at 8.
    ``state_partitions`` sizes that explicitly for the run (state
    sizing is a deliberate per-stream choice at scale, not something
    to inherit from the batch session); pass None to keep the session
    setting. The session value is restored afterwards."""
    spark = stream_df.sparkSession
    name = "mem_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(state_partitions))
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-hour aggregation (complete mode so every
    window is emitted — deterministic, batch-equivalent output)."""
    ev = events_stream(spark, sf_dir).withWatermark("event_time", "1 hour")
    agg = (
        ev.groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)"
            ).alias("sum_value"),
        )
        .select(
            F.expr("(unix_micros(w.start)) DIV 3600000000")
            .alias("hour_bucket"),
            "event_type", "n_events", "sum_value",
        )
    )
    return _run_to_memory(agg, "complete")


def stream_minute_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful stream dedup on (user_id, event_type, minute) within a
    watermark — emits each key once; output is the key set, so it is
    deterministic regardless of which physical row wins."""
    ev = events_stream(spark, sf_dir).withWatermark("event_time", "30 minutes")
    keyed = ev.select(
        "user_id", "event_type",
        F.expr("(ts DIV 1000) DIV 60000000").alias("minute_bucket"),
        "event_time",
    )
    dedup = keyed.dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "minute_bucket"]
    ).select("user_id", "event_type", "minute_bucket")
    return _run_to_memory(dedup, "append")


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` sessionization (30-min inactivity gap)
    — Spark's built-in merging session state, batch-equivalent output.

    The memory-sink result carries (user_id, window, n_events,
    sum_value); session ordinals and start/end are derived from the
    window bounds afterwards (window.end is last-event + gap, so
    session_end = window.end - gap). Boundary semantics: session_window
    splits at gap >= G while the batch lag-formulation splits at
    gap > G — identical whenever no inter-event gap equals G exactly
    (asserted for the driver tables; a tie would need a nanosecond-
    exact 30-minute spacing).
    """
    ev = events_stream(spark, sf_dir).withWatermark("event_time", "1 hour")
    agg = (
        ev.groupBy(
            F.session_window("event_time", "30 minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)"
            ).alias("sum_value"),
        )
    )
    tbl = _run_to_memory(agg, "complete")
    from pyspark.sql.window import Window

    win = Window.partitionBy("user_id").orderBy("session_start")
    return (
        tbl.select(
            "user_id",
            F.expr("unix_micros(w.start)").alias("session_start"),
            F.expr("unix_micros(w.end) - 1800000000").alias("session_end"),
            "n_events", "sum_value",
        )
        .withColumn("session_id", F.row_number().over(win))
        .select("user_id", "session_id", "session_start", "session_end",
                "n_events", "sum_value")
    )
